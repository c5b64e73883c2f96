"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship TPC-H Q1 pricing summary; ``queries`` exposes
the full implemented inventory (SURVEY.md §2.3 Q01–Q30 + §2.7 LLM ops);
``oracle_sql`` gives the DuckDB-equivalent SQL for each (queries whose
semantics are approximate/engine-specific omit the oracle and get the
driver's rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the repo importable even when this module is loaded by path from
# a different working directory
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from bricolage_spark.queries import load_all  # noqa: E402

_SPECS = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return _SPECS["q05_tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _SPECS.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _SPECS.items() if spec.oracle is not None
    }
