"""Job classes: the user-facing operator set (SURVEY.md §2.1).

A job class is a named Python callable operating on a compiled
:class:`Job`. Custom job classes register with the same decorator the
built-ins use (parity with the reference's user jobclass search path,
lib/bricolage/jobclass.rb:20-49 / rubyjobclass.rb).

Compilation (parity with lib/bricolage/job.rb:88-126): merge variable
layers low→high —

    SQL header defaults < global variables < params (dest_table, src
    aliases) < job-file ``vars:`` < command-line ``-v`` vars

— resolve recursively (cycle/undefined errors), then bind ``$var``
references in every string parameter and in the SQL text.
"""

from __future__ import annotations

import fnmatch
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from bricolage_spark.engine import SparkEngine
from bricolage_spark.exception import JobError, JobFailure, ParameterError
from bricolage_spark.sqltext import (
    Variables,
    auto_declarations,
    load_job_file,
    normalize_var_name,
)

JOB_CLASSES: dict[str, Callable[["Job"], "JobResult"]] = {}
PARAM_SCHEMAS: dict[str, "object"] = {}  # class name -> ParamSchema
# Classes that never touch the shared SparkSession/JVM and may therefore
# run in a forked child under the runner's --isolate flag (job.rb:157-196
# forks EVERY job; we can only fork the non-Spark ones — a fork must not
# inherit live Py4J/JVM state it could corrupt on exit).
ISOLATE_SAFE: set[str] = set()


def jobclass(
    name: str, schema: "object | None" = None, isolate_safe: bool = False
) -> Callable:
    def wrap(fn: Callable[["Job"], "JobResult"]) -> Callable:
        JOB_CLASSES[name] = fn
        if schema is not None:
            PARAM_SCHEMAS[name] = schema
        if isolate_safe:
            ISOLATE_SAFE.add(name)
        return fn

    return wrap


def get_jobclass(name: str) -> Callable[["Job"], "JobResult"]:
    # built-ins first, then lazily import the builtin module (avoids
    # import cycles); unknown names error like jobclass.rb:37-49
    if name not in JOB_CLASSES:
        from bricolage_spark.jobs import builtin  # noqa: F401
    if name not in JOB_CLASSES:
        from bricolage_spark.jobs import curation  # noqa: F401
    if name not in JOB_CLASSES:
        from bricolage_spark.jobs import checks  # noqa: F401
    if name not in JOB_CLASSES:
        from bricolage_spark.streaming import streaming_load  # noqa: F401
    if name not in JOB_CLASSES:
        raise ParameterError(f"no such job class: {name}")
    return JOB_CLASSES[name]


@dataclass
class JobResult:
    success: bool = True
    message: str = ""
    rows: int | None = None

    @property
    def status(self) -> str:
        return "succeeded" if self.success else "failed"


@dataclass
class Job:
    """A compiled, runnable job."""

    engine: SparkEngine
    class_name: str
    values: dict[str, Any]
    sql_text: str | None = None
    path: str | None = None
    global_variables: dict[str, Any] = field(default_factory=dict)
    cmd_variables: dict[str, Any] = field(default_factory=dict)
    # filled by compile():
    variables: Any = None
    sql: str | None = None
    typed: dict[str, Any] | None = None

    @classmethod
    def load(
        cls,
        engine: SparkEngine,
        path: str,
        global_variables: dict | None = None,
        cmd_variables: dict | None = None,
    ) -> "Job":
        values, sql = load_job_file(path)
        class_name = values.pop("class", None)
        if not class_name:
            raise ParameterError(f"missing job class: {path}")
        return cls(
            engine=engine,
            class_name=str(class_name),
            values=values,
            sql_text=sql,
            path=path,
            global_variables=global_variables or {},
            cmd_variables=cmd_variables or {},
        )

    # -- compile -----------------------------------------------------------

    def compile(self) -> "Job":
        # external sql-file: load it now so its --key: header metadata
        # (dest-table/src-tables/params — sqlstatement.rb:242-300) merges
        # in as the LOWEST-precedence value layer
        if self.sql_text is None and self.values.get("sql-file"):
            from bricolage_spark.sqltext import parse_sql_metadata, render_template

            p = self.resolve_path(str(self.values["sql-file"]))
            with open(p) as f:
                text = f.read()
            base = os.path.dirname(os.path.abspath(p))
            text = render_template(
                text, base_dir=base, app_home=os.path.dirname(base)
            )
            for k, v in parse_sql_metadata(text, p).items():
                self.values.setdefault(k, v)
            self.sql_text = text
        sql = self.sql_text or ""
        defaults = auto_declarations(sql, self.values) if sql else {}
        param_vars: dict[str, Any] = {}
        if self.values.get("dest-table") is not None:
            param_vars["dest_table"] = self.values["dest-table"]
        srcs = self.values.get("src-tables")
        if isinstance(srcs, str):
            param_vars[srcs] = srcs
        elif isinstance(srcs, dict):
            param_vars.update(srcs)
        elif isinstance(srcs, list):
            param_vars.update({s: s for s in srcs})
        layers = Variables.union(
            {k: v for k, v in defaults.items() if v is not None},
            self.global_variables,
            param_vars,
            self.values.get("vars") or {},
            self.cmd_variables,
        )
        self.variables = layers.resolve()
        self.sql = self.variables.expand(sql) if sql else None
        # typed validation at compile time (parameters.rb parity): jobs
        # with a declared schema fail BEFORE the jobnet starts running
        schema = PARAM_SCHEMAS.get(self.class_name)
        if schema is None:
            get_jobclass(self.class_name)  # importing builtins registers schemas
            schema = PARAM_SCHEMAS.get(self.class_name)
        if schema is not None:
            self.typed = schema.parse(
                {p.name: self.param(p.name) for p in schema.params}, ctx=self
            )
        return self

    # -- param access ------------------------------------------------------

    def param(self, name: str, default: Any = None) -> Any:
        """Parameter value with $vars bound (string params only)."""
        v = self.values.get(name, default)
        if isinstance(v, str) and self.variables is not None:
            return self.variables.expand(v)
        return v

    def require(self, name: str) -> Any:
        v = self.param(name)
        if v is None:
            raise ParameterError(
                f"missing required parameter '{name}' for class {self.class_name}"
            )
        return v

    def bool_param(self, name: str, default: bool = False) -> bool:
        v = self.values.get(name, default)
        if isinstance(v, str):
            return v.strip().lower() in ("true", "yes", "on", "1")
        return bool(v)

    def resolve_path(self, rel: str) -> str:
        base = os.path.dirname(self.path) if self.path else "."
        return rel if os.path.isabs(rel) else os.path.join(base, rel)

    def read_sql_param(self, name: str = "sql-file") -> str:
        """Bound SQL text (embedded body or external sql-file — both are
        loaded and variable-expanded by compile())."""
        if self.sql is not None:
            return self.sql
        raise ParameterError(
            f"job class {self.class_name} requires SQL (embedded or '{name}')"
        )

    # -- run ---------------------------------------------------------------

    def execute(self) -> JobResult:
        if self.variables is None:
            self.compile()
        fn = get_jobclass(self.class_name)
        try:
            result = fn(self)
            return result if isinstance(result, JobResult) else JobResult()
        except (JobFailure, ParameterError):
            raise
        except Exception as err:  # unexpected → JobError (job.rb taxonomy)
            from bricolage_spark.exception import concise_error

            raise JobError(
                f"job {self.path or self.class_name} failed: {concise_error(err)}"
            )

    def dry_run(self) -> str:
        """--dry-run: the fully bound SQL / action description."""
        if self.variables is None:
            self.compile()
        if self.sql is not None:
            return self.sql
        return f"[{self.class_name}] {self.values!r}"


def expand_glob(pattern: str) -> list[str]:
    """Glob helper for file params (s3-put, load src-file)."""
    d, pat = os.path.split(pattern)
    d = d or "."
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if fnmatch.fnmatch(f, pat)
    )
