"""Jobnet runner: the bricolage-jobnet main path (SURVEY.md §3.1).

Flow parity with lib/bricolage/jobnetrunner.rb:25-93:
1. load jobnet (+ subnets) → DAG → topo order,
2. pre-compile every job (validation before any execution, :150-154),
3. restore an unfinished queue if present, else enqueue the topo order,
4. consume sequentially; each job's result persisted after it runs;
   a failure stops the net; re-running resumes from the failed job.

The reference forks a child process per job (job.rb:157-196) because psql
holds global state; a SparkSession is shareable, so jobs run in-process
under try/except with the same observable contract (status recorded,
failure stops, resume skips succeeded jobs).

``isolate=True`` restores the reference's fork-per-job crash containment
for the job classes that can take it: classes registered
``isolate_safe=True`` (exec, wait-file, noop, s3-put, custom Python that
never touches the engine) run in a forked child, so a segfaulting or
hard-exiting job is recorded as failed instead of killing the runner.
Spark-touching classes always stay in-process — a fork must not inherit
live Py4J/JVM sockets it could corrupt.
"""

from __future__ import annotations

import contextlib
import json
import os
from dataclasses import dataclass

from datetime import datetime

from bricolage_spark.context import Context
from bricolage_spark.exception import ApplicationError, JobFailure
from bricolage_spark.jobnet import Ref, RootJobNet
from bricolage_spark.jobs import ISOLATE_SAFE, Job, JobResult
from bricolage_spark.loglocator import LogFilePath, LogLocator
from bricolage_spark.taskqueue import FileTaskQueue, MemoryTaskQueue


def execute_isolated(job: Job) -> tuple[bool, str]:
    """Run ``job.execute()`` in a forked child (job.rb:157-196 parity).

    Returns (success, message). The child reports through a pipe and
    leaves via ``os._exit`` (never the interpreter's normal teardown —
    inherited descriptors/atexit hooks must stay untouched). A child that
    dies without reporting (segfault, ``os._exit`` inside the job, OOM
    kill) becomes a recorded failure, not a dead runner.
    """
    r, w = os.pipe()
    pid = os.fork()
    if pid == 0:  # child
        ok, msg = True, ""
        try:
            os.close(r)
            result = job.execute()
            ok, msg = result.success, result.message
        except BaseException as err:  # noqa: BLE001 — report, then _exit
            ok, msg = False, f"{type(err).__name__}: {err}"
        try:
            with os.fdopen(w, "w") as f:
                json.dump({"ok": ok, "message": msg}, f)
        finally:
            os._exit(0)
    os.close(w)
    with os.fdopen(r) as f:
        data = f.read()
    _, wstatus = os.waitpid(pid, 0)
    if data:
        d = json.loads(data)
        return d["ok"], d["message"]
    if os.WIFSIGNALED(wstatus):
        return False, f"job child killed by signal {os.WTERMSIG(wstatus)}"
    return False, f"job child exited rc={os.WEXITSTATUS(wstatus)} without result"


@dataclass
class RunReport:
    succeeded: list[str]
    failed: list[str]
    skipped: list[str]

    @property
    def success(self) -> bool:
        return not self.failed


class JobNetRunner:
    def __init__(
        self,
        context: Context,
        queue_dir: str | None = None,
        queue_type: str = "file",
        isolate: bool = False,
        queue_path: str | None = None,
        db_dsn: str | None = None,
        log_path: LogFilePath | None = None,
        log_upload=None,
    ):
        """``queue_path`` pins the file queue to an explicit path
        (--queue-path, jobnetrunner.rb:289-291); ``db_dsn`` enables the
        DB queue on an explicit SQLite path or postgresql:// DSN
        (--db-name, jobnetrunner.rb:292-294 — the reference names a
        datasource, we take the DSN directly). Either implies its queue
        type. ``log_path`` is a per-job log-file template (loglocator
        parity; defaults to $BRICOLAGE_LOG_DIR / $BRICOLAGE_LOG_PATH);
        ``log_upload`` optionally ships each closed log file to durable
        storage (the reference's --s3-log slot)."""
        self.ctx = context
        self.queue_dir = queue_dir or os.path.join(context.home, ".queue")
        if db_dsn is not None:
            queue_type = "db"
        elif queue_path is not None:
            queue_type = "file"
        if queue_type not in ("file", "db"):
            raise ApplicationError(f"unknown queue type: {queue_type}")
        self.queue_type = queue_type
        self.isolate = isolate
        self._queue_path_override = queue_path
        self._db_dsn = db_dsn
        self.log_path = log_path if log_path is not None else LogFilePath.default()
        self._log_upload = log_upload

    def queue_path(self, net_ref: Ref) -> str:
        if self._queue_path_override:
            return self._queue_path_override
        return os.path.join(
            self.queue_dir, f"{net_ref.subsystem}__{net_ref.name}.json"
        )

    def _make_queue(self, net_ref: Ref, clear: bool):
        if self.queue_type == "db":
            from bricolage_spark.taskqueue import DatabaseTaskQueue

            db = self._db_dsn or os.path.join(self.queue_dir, "state.db")
            if clear and not db.startswith(("postgresql://", "postgres://")):
                if os.path.exists(db):
                    os.remove(db)
            queue = DatabaseTaskQueue(
                db, jobnet_name=f"{net_ref.subsystem}/{net_ref.name}"
            )
            if clear and db.startswith(("postgresql://", "postgres://")):
                queue.unlink()  # clear rows, keep the shared database
            return queue
        qpath = self.queue_path(net_ref)
        if clear and os.path.exists(qpath):
            os.remove(qpath)
        return FileTaskQueue.restore_if_exists(qpath)

    def _log_locator(
        self, net_ref: Ref, job: str, jobnet_start_time: datetime
    ) -> LogLocator:
        """Per-job log destination (jobnetrunner.rb:180,189-196): the
        template is expanded per job with both start times; no template
        means a no-op locator (everything stays on the runner's own
        stdout/stderr, the pre-round-5 behavior)."""
        if self.log_path is None:
            return LogLocator(None)
        ref = Ref.parse(job)
        path = self.log_path.format(
            subsystem=ref.subsystem,
            job=ref.name,
            jobnet_id=f"{net_ref.subsystem}/{net_ref.name}",
            job_start_time=datetime.now(),
            jobnet_start_time=jobnet_start_time,
        )
        return LogLocator(path, upload=self._log_upload)

    def compile_net(
        self, jobnet_path: str, cmd_variables: dict | None = None
    ) -> tuple[RootJobNet, list[Ref], dict[str, Job]]:
        """Load, validate, and pre-compile a whole net without running it —
        the shared front half of run()/--check-only/--list-jobs
        (jobnetrunner.rb:150-154, 299-304)."""
        net = RootJobNet.load(self.ctx.home, jobnet_path)
        order = net.sequential_jobs()
        missing = net.check_jobs()
        if missing:
            raise ApplicationError(f"undefined jobs in jobnet: {', '.join(missing)}")
        jobs: dict[str, Job] = {}
        for ref in order:
            job = self.ctx.load_job(net.job_path(ref), cmd_variables)
            job.compile()
            jobs[str(ref)] = job
        return net, order, jobs

    def run(
        self,
        jobnet_path: str,
        cmd_variables: dict | None = None,
        dry_run: bool = False,
        clear_queue: bool = False,
        parallel: int = 1,
    ) -> RunReport:
        """``parallel > 1`` runs independent DAG branches concurrently
        (Spark-first extension — the reference is sequential-only): a
        SparkSession accepts actions from many threads, so a jobnet of
        independent table builds should saturate the cluster instead of
        serializing on the driver. Jobs launch when every REAL
        dependency (pseudo nodes collapsed — jobnet.real_job_dependencies)
        has succeeded; the first failure stops NEW launches, in-flight
        jobs finish, and unreached jobs stay ``waiting`` so a re-run
        resumes exactly like the sequential path. Per-job log capture
        works concurrently via a Python-level per-thread stream router
        (loglocator.thread_stream_routing) instead of the sequential
        path's process-global dup2 — the one capture difference is that
        direct-fd writers (an exec job's subprocess, C extensions) stay
        on the runner's stdout under --parallel. Not combinable with
        fork isolation (fork from a threaded runner can deadlock the
        child) or the DB queue (per-transition writes are
        connection-bound).
        """
        # pre-compile everything (check_jobs parity: fail before running)
        net, order, jobs = self.compile_net(jobnet_path, cmd_variables)

        if dry_run:
            for ref in order:
                print(f"== {ref}\n{jobs[str(ref)].dry_run()}")
            return RunReport(succeeded=[], failed=[], skipped=[str(r) for r in order])

        # validate the (static) log-path template ONCE, before any queue
        # state exists: a bad %{var} must be an upfront ParameterError,
        # not a mid-queue crash that leaves tasks untransitioned
        if self.log_path is not None:
            probe = datetime.now()
            self.log_path.format(
                subsystem="probe",
                job="probe",
                jobnet_id="probe/probe",
                job_start_time=probe,
                jobnet_start_time=probe,
            )

        if parallel > 1:
            if self.isolate:
                raise ApplicationError(
                    "--parallel cannot be combined with --isolate: forking "
                    "from a threaded runner can deadlock the child"
                )
            if self.queue_type == "db":
                raise ApplicationError(
                    "--parallel requires the file or memory queue "
                    "(DB-queue writes are connection-bound)"
                )

        queue = self._make_queue(net.root.ref, clear_queue)
        restored = bool(queue.tasks)
        if not restored:
            for ref in order:
                queue.enqueue(str(ref))
        else:
            # jobnet drift, both directions: jobs ADDED since the queue
            # was saved get tasks spliced in at their topological slot
            # (so predecessors still run first); tasks whose job was
            # REMOVED from the net keep their position at the end and
            # still run (the sequential consumer reloads them by path).
            tasks_by_job = {t.job: t for t in queue.tasks}
            order_names = [str(r) for r in order]
            from bricolage_spark.taskqueue import Task

            merged = [
                tasks_by_job.get(name) or Task(job=name) for name in order_names
            ]
            merged += [t for t in queue.tasks if t.job not in set(order_names)]
            queue.tasks[:] = merged
            queue.save()

        if parallel > 1:
            return self._run_parallel(net, order, jobs, queue, parallel, cmd_variables)

        queue.lock()
        succeeded: list[str] = []
        failed: list[str] = []
        skipped = [t.job for t in queue.tasks if t.status == "succeeded"]
        jobnet_start_time = datetime.now()
        try:
            for task in queue.consume_each():
                job = jobs.get(task.job)
                if job is None:  # jobnet changed since the queue was saved
                    job = self.ctx.load_job(
                        net.job_path(Ref.parse(task.job)), cmd_variables
                    )
                    job.compile()
                self.ctx.hooks.fire("before_job", job=job, ref=task.job)
                locator = self._log_locator(
                    net.root.ref, task.job, jobnet_start_time
                )
                if self.isolate and job.class_name in ISOLATE_SAFE:
                    try:
                        with locator.redirect_stdouts():
                            ok, message = execute_isolated(job)
                    except OSError as err:  # log-file or job I/O —
                        # a recorded failure, never a runner crash
                        ok, message = False, f"OSError: {err}"
                    task.transition("succeeded" if ok else "failed", message)
                    (succeeded if ok else failed).append(task.job)
                else:
                    try:
                        with locator.redirect_stdouts():
                            result = job.execute()
                        task.transition("succeeded", result.message)
                        succeeded.append(task.job)
                    except (JobFailure, ApplicationError) as err:
                        task.transition("failed", str(err))
                        failed.append(task.job)
                    except OSError as err:  # log-file or job I/O —
                        # a recorded failure, never a runner crash
                        task.transition("failed", f"OSError: {err}")
                        failed.append(task.job)
                self.ctx.hooks.fire(
                    "after_job", job=job, ref=task.job, status=task.status
                )
        finally:
            queue.unlock()
            self.ctx.hooks.fire("after_all", report=None)
        if not queue.unfinished:
            queue.unlink()  # complete: next run starts fresh
        return RunReport(succeeded=succeeded, failed=failed, skipped=skipped)

    def _run_parallel(
        self, net, order, jobs, queue, parallel, cmd_variables=None
    ) -> RunReport:
        """Dependency-aware concurrent queue consumption (see run()).

        Schedules over the QUEUE's tasks (which run() has already merged
        with the current net, both drift directions): tasks for jobs no
        longer in the net carry no dependencies and are loaded by path
        on demand, exactly like the sequential consumer.
        """
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        deps = {
            str(ref): {str(d) for d in dset}
            for ref, dset in net.real_job_dependencies().items()
        }
        order_s = [t.job for t in queue.tasks]
        for name in order_s:
            deps.setdefault(name, set())  # stale task: no ordering info left
        queue.lock()
        state = _ParallelState(queue, deps)
        skipped = sorted(state.done)

        def get_job(job_name: str):
            job = jobs.get(job_name)
            if job is None:  # jobnet changed since the queue was saved
                job = self.ctx.load_job(
                    net.job_path(Ref.parse(job_name)), cmd_variables
                )
                job.compile()
                jobs[job_name] = job
            return job

        jobnet_start_time = datetime.now()

        def run_one(job_name: str) -> None:
            job = get_job(job_name)
            self.ctx.hooks.fire("before_job", job=job, ref=job_name)
            try:
                locator = self._log_locator(
                    net.root.ref, job_name, jobnet_start_time
                )
                with locator.redirect_thread_stdouts():
                    result = job.execute()
                ok, message = True, result.message
            except (JobFailure, ApplicationError, OSError) as err:
                ok, message = False, str(err)
            state.mark(job_name, ok, message)
            self.ctx.hooks.fire(
                "after_job",
                job=job,
                ref=job_name,
                status="succeeded" if ok else "failed",
            )

        from bricolage_spark.loglocator import thread_stream_routing

        stack = contextlib.ExitStack()
        if self.log_path is not None:
            # install the per-thread router ONCE around the whole loop;
            # each worker registers its job's file for its own thread
            stack.enter_context(thread_stream_routing())
        try:
            with stack, ThreadPoolExecutor(
                max_workers=max(1, min(parallel, len(order_s) or 1)),
                thread_name_prefix="jobnet",
            ) as pool:
                futures = {}
                while True:
                    with state.lock:
                        # mark launching inside the lock so ready_jobs
                        # never double-schedules
                        launch = state.ready_jobs(order_s)
                        for job_name in launch:
                            state.running.add(job_name)
                            task = next(
                                t for t in queue.tasks if t.job == job_name
                            )
                            task.transition("running")
                        if launch:
                            queue.save()
                    for job_name in launch:
                        futures[pool.submit(run_one, job_name)] = job_name
                    if not futures:
                        break
                    done_f, _pending = wait(
                        list(futures), return_when=FIRST_COMPLETED
                    )
                    for f in done_f:
                        futures.pop(f)
                        f.result()  # re-raise unexpected worker errors
        finally:
            queue.unlock()
            self.ctx.hooks.fire("after_all", report=None)
        if not queue.unfinished:
            queue.unlink()
        return RunReport(
            succeeded=state.succeeded, failed=state.failed, skipped=skipped
        )




class _ParallelState:
    """Shared parallel-scheduling state; every mutation holds the lock."""

    def __init__(self, queue, deps: dict[str, set[str]]):
        import threading

        self.lock = threading.Lock()
        self.queue = queue
        self.deps = deps
        self.done: set[str] = {
            t.job for t in queue.tasks if t.status == "succeeded"
        }
        self.failed: list[str] = []
        self.succeeded: list[str] = []
        self.running: set[str] = set()

    def ready_jobs(self, order: list[str]) -> list[str]:
        """Launchable now: waiting, deps satisfied, nothing failed."""
        if self.failed:
            return []
        out = []
        for job in order:
            if job in self.done or job in self.running:
                continue
            if self.deps[job] <= self.done:
                out.append(job)
        return out

    def mark(self, job: str, ok: bool, message: str) -> None:
        with self.lock:
            task = next(t for t in self.queue.tasks if t.job == job)
            task.transition("succeeded" if ok else "failed", message)
            self.queue.save()
            self.running.discard(job)
            if ok:
                self.done.add(job)
                self.succeeded.append(job)
            else:
                self.failed.append(job)


def run_single_job(
    context: Context,
    path: str,
    cmd_variables: dict | None = None,
    dry_run: bool = False,
    explain: bool = False,
) -> JobResult | str:
    """The ``bricolage`` single-job entry point (application.rb §3.2)."""
    job = context.load_job(path, cmd_variables)
    job.compile()
    if dry_run:
        return job.dry_run()
    if explain:
        if job.sql is None:
            raise ApplicationError("--explain requires a SQL job")
        from bricolage_spark.engine import split_statements

        texts = []
        for stmt in split_statements(job.sql):
            df = job.engine.sql(stmt) if stmt.lower().startswith("select") else None
            if df is not None:
                texts.append(job.engine.explain(df))
        return "\n".join(texts) or "(no SELECT statements)"
    return job.execute()
