"""CLI: ``python -m bricolage_spark.cli`` — the two reference entry
points (bin/bricolage, bin/bricolage-jobnet; SURVEY.md §3.1-3.2).

    # single job (ad-hoc):
    python -m bricolage_spark.cli job subsys/myjob.sql.job \
        --home test/home -v data_date=2024-01-01 [--dry-run|--explain]

    # jobnet:
    python -m bricolage_spark.cli jobnet subsys/net1.jobnet \
        --home test/home [--dry-run] [--clear-queue]
"""

from __future__ import annotations

import argparse
import os
import sys

from bricolage_spark.context import Context
from bricolage_spark.engine import SparkEngine
from bricolage_spark.exception import ApplicationError
from bricolage_spark.jobs import JobResult
from bricolage_spark.runner import JobNetRunner, run_single_job
from bricolage_spark.session import get_spark


def _parse_vars(pairs: list[str]) -> dict[str, str]:
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise ApplicationError(f"-v expects name=value, got: {pair}")
        k, v = pair.split("=", 1)
        out[k] = v
    return out


def build_context(args) -> Context:
    spark = get_spark("bricolage_spark.cli")
    engine = SparkEngine(spark, args.warehouse)
    engine.register_all()
    return Context(engine, home=args.home, env=args.env)


def _job_path(home: str, path: str) -> str:
    return path if os.path.exists(path) else os.path.join(home, path)


def _run_list_mode(args) -> int:
    """The reference's --list-declarations / --list-variables /
    --list-global-variables modes (application.rb:51-66, 139-152) as
    subcommands; output formats mirror the Ruby ones (`name` or
    `name\\t= default` for declarations, `name=value` repr otherwise)."""
    ctx = Context(None, home=args.home, env=args.env)
    if args.command == "list-global-variables":
        from bricolage_spark.sqltext import Variables

        for name, value in Variables(ctx.global_variables).resolve().items():
            print(f"{name}={value!r}")
        return 0
    if args.command == "list-declarations":
        from bricolage_spark.sqltext import auto_declarations, load_job_file

        values, sql = load_job_file(_job_path(ctx.home, args.path))
        for name, default in auto_declarations(sql or "", values).items():
            if default is not None:
                print(f"{name}\t= {default!r}")
            else:
                print(name)
        return 0
    # list-variables: compile (not run) the job, print every resolved var.
    from bricolage_spark.jobs import Job

    job = Job.load(
        None,
        _job_path(ctx.home, args.path),
        global_variables=ctx.global_variables,
        cmd_variables=_parse_vars(args.variable),
    ).compile()
    for name, value in job.variables.items():
        print(f"{name}={value!r}")
    return 0


def _log_path_from_args(args):
    """Common-option precedence (application.rb:240-268): --log-dir beats
    --log-path beats the environment defaults."""
    from bricolage_spark.loglocator import LogFilePath

    if getattr(args, "log_dir", None):
        return LogFilePath(f"{args.log_dir}/%{{std}}.log")
    if getattr(args, "log_path", None):
        return LogFilePath(args.log_path)
    return LogFilePath.default()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bricolage-spark")
    p.add_argument("--home", default=os.environ.get("BRICOLAGE_SPARK_HOME", "."))
    p.add_argument("--env", default=os.environ.get("BRICOLAGE_ENV", "development"))
    p.add_argument(
        "--warehouse",
        default=os.environ.get("BRICOLAGE_SPARK_WAREHOUSE", "./warehouse"),
    )
    sub = p.add_subparsers(dest="command", required=True)

    p.add_argument(
        "--version", action="version",
        version=f"%(prog)s {__import__('bricolage_spark').__version__}",
    )

    pj = sub.add_parser("job", help="run a single job file")
    pj.add_argument("path")
    pj.add_argument("-v", "--variable", action="append", default=[])
    pj.add_argument("--dry-run", action="store_true")
    pj.add_argument("--explain", action="store_true")
    pj.add_argument(
        "-c", "--check-only", action="store_true",
        help="check job parameters and quit without executing "
        "(application.rb -c)",
    )
    pj.add_argument(
        "-L", "--log-dir", default=None,
        help="per-job log file prefix (application.rb -L; "
        "env BRICOLAGE_LOG_DIR)",
    )
    pj.add_argument(
        "--log-path", default=None,
        help="per-job log path template (application.rb --log-path; "
        "env BRICOLAGE_LOG_PATH)",
    )

    pn = sub.add_parser("jobnet", help="run a jobnet")
    pn.add_argument("path")
    pn.add_argument("-v", "--variable", action="append", default=[])
    pn.add_argument("--dry-run", action="store_true")
    pn.add_argument("--clear-queue", action="store_true")
    pn.add_argument(
        "-c", "--check-only", action="store_true",
        help="load + pre-compile every job in the net and quit "
        "(jobnetrunner.rb -c)",
    )
    pn.add_argument(
        "-l", "--list-jobs", action="store_true",
        help="list target jobs in execution order without running "
        "(jobnetrunner.rb -l)",
    )
    pn.add_argument(
        "--queue", choices=["file", "db"], default="file",
        help="task-queue backend: resumable JSON file or job-state DB",
    )
    pn.add_argument(
        "--queue-path", default=None,
        help="explicit file-queue path (implies --queue file)",
    )
    pn.add_argument(
        "--db-name", default=None, metavar="DSN",
        help="job-state DB: SQLite path or postgresql:// DSN "
        "(implies --queue db; shared-state multi-host parity)",
    )
    pn.add_argument(
        "--local-state-dir", default=None,
        help="directory for queue/state files (default: <home>/.queue)",
    )
    pn.add_argument(
        "--isolate", action="store_true",
        help="fork isolate-safe (non-Spark) jobs so a crashing job is "
        "recorded as failed instead of killing the runner",
    )
    pn.add_argument(
        "--parallel", type=int, default=1, metavar="N",
        help="run up to N independent DAG branches concurrently "
        "(Spark-first extension: one SparkSession schedules actions "
        "from many threads; per-job logs capture via a per-thread "
        "stream router, so direct-fd writers like exec subprocesses "
        "stay on the runner's stdout; not combinable with --isolate "
        "or the DB queue)",
    )
    pn.add_argument(
        "-L", "--log-dir", default=None,
        help="per-job log file prefix: each job's stdout/stderr goes to "
        "<dir>/%%{std}.log (application.rb -L; env BRICOLAGE_LOG_DIR)",
    )
    pn.add_argument(
        "--log-path", default=None,
        help="per-job log path template with %%{jobnet}/%%{subsystem}/"
        "%%{job}/%%{job_start_time}... variables (application.rb "
        "--log-path; env BRICOLAGE_LOG_PATH)",
    )

    sub.add_parser(
        "list-job-class", help="list registered job class names"
    )

    pl = sub.add_parser("list-declarations", help="list variables a job uses")
    pl.add_argument("path")

    plv = sub.add_parser(
        "list-variables", help="list a compiled job's resolved variables"
    )
    plv.add_argument("path")
    plv.add_argument("-v", "--variable", action="append", default=[])

    sub.add_parser(
        "list-global-variables", help="list resolved global variables"
    )

    args = p.parse_args(argv)
    try:
        # list-* modes are metadata-only (application.rb:311-369): no Spark
        # session, no warehouse registration.
        if args.command in ("list-declarations", "list-variables", "list-global-variables"):
            return _run_list_mode(args)
        if args.command == "list-job-class":
            # registry-only (application.rb:336-341): no Spark session
            from bricolage_spark.jobs import JOB_CLASSES, builtin  # noqa: F401
            from bricolage_spark.streaming import streaming_load  # noqa: F401

            for name in sorted(JOB_CLASSES):
                print(name)
            return 0
        if args.command == "job" and args.check_only:
            # compile-only: no Spark session (application.rb -c)
            from bricolage_spark.jobs import Job

            ctx = Context(None, home=args.home, env=args.env)
            Job.load(
                None,
                _job_path(ctx.home, args.path),
                global_variables=ctx.global_variables,
                cmd_variables=_parse_vars(args.variable),
            ).compile()
            print("OK")
            return 0
        if args.command == "jobnet" and (args.check_only or args.list_jobs):
            # compile-only modes: no Spark session, no warehouse
            ctx = Context(None, home=args.home, env=args.env)
            runner = JobNetRunner(ctx, queue_type=args.queue)
            _net, order, jobs = runner.compile_net(
                os.path.join(ctx.home, args.path)
                if not os.path.exists(args.path)
                else args.path,
                cmd_variables=_parse_vars(args.variable),
            )
            if args.list_jobs:
                for ref in order:
                    print(ref)
            else:
                print(f"OK: {len(jobs)} jobs compiled")
            return 0
        ctx = build_context(args)
        if args.command == "job":
            from datetime import datetime

            from bricolage_spark.loglocator import LogLocator

            jpath = _job_path(ctx.home, args.path)
            # common-option parity (application.rb:224-268): the single-job
            # binary honors the same log flags/env as the jobnet runner;
            # dry-run/explain output stays on the console
            log_path = _log_path_from_args(args)
            locator = LogLocator(None)
            if log_path is not None and not (args.dry_run or args.explain):
                # %{job} must match the jobnet runner's naming (Ref.name:
                # extension-less), so x.sql.job logs as 'x' on BOTH paths
                jname = os.path.basename(jpath).split(".")[0]
                subsys = os.path.basename(os.path.dirname(jpath)) or "job"
                now = datetime.now()
                locator = LogLocator(
                    log_path.format(
                        subsystem=subsys,
                        job=jname,
                        jobnet_id=f"{subsys}/{jname}",
                        job_start_time=now,
                        jobnet_start_time=now,
                    )
                )
            with locator.redirect_stdouts():
                result = run_single_job(
                    ctx,
                    jpath,
                    cmd_variables=_parse_vars(args.variable),
                    dry_run=args.dry_run,
                    explain=args.explain,
                )
            if isinstance(result, JobResult):
                print(f"{result.status}: {result.message}")
                return 0 if result.success else 3
            print(result)
            return 0
        if args.command == "jobnet":
            log_path = _log_path_from_args(args)
            runner = JobNetRunner(
                ctx,
                queue_dir=args.local_state_dir,
                queue_type=args.queue,
                isolate=args.isolate,
                queue_path=args.queue_path,
                db_dsn=args.db_name,
                log_path=log_path,
            )
            report = runner.run(
                os.path.join(ctx.home, args.path)
                if not os.path.exists(args.path)
                else args.path,
                cmd_variables=_parse_vars(args.variable),
                dry_run=args.dry_run,
                clear_queue=args.clear_queue,
                parallel=args.parallel,
            )
            print(
                f"succeeded={len(report.succeeded)} failed={len(report.failed)} "
                f"skipped={len(report.skipped)}"
            )
            return 0 if report.success else 3
    except ApplicationError as err:
        print(f"error: {err}", file=sys.stderr)
        return err.exit_status
    except Exception as err:  # Spark/Py4J errors: concise line, no JVM dump
        from bricolage_spark.exception import concise_error

        print(f"error: {concise_error(err)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
