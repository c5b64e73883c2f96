"""Data-quality gate job classes (Spark-first extension).

The reference has no table-assertion verb — quality gates in its world
are hand-written SQL jobs whose failure semantics are implicit. These
classes make the contract explicit so a jobnet can gate downstream
stages on data quality (the dbt-test / Great-Expectations role, scoped
to what a warehouse jobnet needs):

    load -> quality_filter -> ASSERT no_empty_docs -> dedup -> ...

A failing assertion raises JobFailure, which stops the net exactly like
any failed job and leaves the queue resumable at the assertion.
"""

from __future__ import annotations

from bricolage_spark.exception import JobFailure, ParameterError
from bricolage_spark.jobs import Job, JobResult, jobclass
from bricolage_spark.parameters import EnumParam, ParamSchema, StringParam


@jobclass(
    "assert",
    schema=ParamSchema(
        [
            EnumParam(
                "mode",
                values=("fail-if-rows", "fail-if-empty"),
                optional=True,
                default="fail-if-rows",
            ),
            StringParam("max-violations", optional=True),
            StringParam("message", optional=True),
        ]
    ),
)
def assert_job(job: Job) -> JobResult:
    """Run a violations query; fail the job when the data breaks the
    contract.

    - ``fail-if-rows`` (default): the SQL SELECTs VIOLATIONS — any
      returned row past ``max-violations`` (default 0) fails. The first
      few offending rows are quoted in the failure message so the
      operator sees what broke without re-running anything.
    - ``fail-if-empty``: the SQL must return at least one row
      (existence checks: "the snapshot actually loaded something").

    Scale note: violations are counted via a LIMIT'd collect
    (``max-violations + sample + 1`` rows driver-side, never the full
    violation set), so an assertion over a 100 TB table ships only a
    bounded head to the driver.
    """
    df = job.engine.execute_script(job.read_sql_param())
    if df is None:
        raise ParameterError("assert job SQL must end with a SELECT")
    mode = str(job.param("mode", "fail-if-rows"))
    max_v = int(job.param("max-violations", 0))
    message = job.param("message") or "data-quality assertion failed"
    sample_n = 3
    head = df.limit(max_v + sample_n + 1).collect()
    if mode == "fail-if-empty":
        if not head:
            raise JobFailure(f"{message}: query returned no rows")
        return JobResult(message=f"assert ok (non-empty, {len(head)}+ rows)")
    n = len(head)
    if n > max_v:
        shown = "; ".join(str(tuple(r)) for r in head[:sample_n])
        more = f" (showing {sample_n})" if n > sample_n else ""
        raise JobFailure(
            f"{message}: {'>' if n > max_v + sample_n else ''}{n} violation "
            f"row(s), max {max_v}{more}: {shown}"
        )
    return JobResult(
        message=f"assert ok ({n} violation row(s) within max {max_v})"
    )
