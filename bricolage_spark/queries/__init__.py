"""Declared query inventory (SURVEY.md §2.3 Q01–Q30 + §2.7 extensions).

Each query is registered with:
- a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` written
  DataFrame-first (Catalyst plans the physical execution), and
- an equivalent ANSI-SQL ``oracle`` string DuckDB runs on the same parquet
  tables (driver correctness gate), or ``None`` for ops whose semantics are
  not SQL-expressible (driver then records a rows-only check).

Column names/aliases are kept identical between the Spark result and the
oracle; computed integers are cast to BIGINT on both sides and unstable
float aggregates are rounded identically, because the driver hash-compares
values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the inventory."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills QUERIES).

    Core relational SQL registers FIRST so a time-truncated driver run
    clips the exotic tail (LLM ops), never q01–q30.
    """
    from bricolage_spark.queries import relational  # noqa: F401  (q01–q30)
    from bricolage_spark.queries import patterns  # noqa: F401  (q43–q47)
    from bricolage_spark.queries import llm_ops  # noqa: F401  (q31–q42, q48–q49)

    return QUERIES
