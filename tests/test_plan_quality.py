"""Plan-quality gate: every registered query's PHYSICAL plan is audited
for the scale red flags the whole engine design is built to avoid.

This is the automated version of the per-operator `.explain` review:
a query can be value-correct at sf0.01 and still carry a plan that dies
at 100 TB. Asserting on the plan text keeps regressions (an accidental
row-wise UDF, a join that degenerated to a cartesian product) out.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from bricolage_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

# Queries whose plan legitimately contains a cartesian product:
# q10 IS the cross/theta-join demonstration (bounded: 25x15 dims).
CARTESIAN_OK = {"q10_cross_theta_join"}


@pytest.fixture(scope="module")
def plans(spark):
    """name -> formatted physical plan for every registered query."""
    out = {}
    for name, spec in sorted(load_all().items()):
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out[name] = buf.getvalue()
    return out


def test_no_row_wise_python_udf_on_any_path(plans):
    """Python on a data path must be Arrow-batched (ArrowEvalPython /
    MapInPandas), never row-at-a-time BatchEvalPython."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-wise Python UDF in: {offenders}"


def test_no_unintended_cartesian_product(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "CartesianProduct" in p and n not in CARTESIAN_OK
    ]
    assert not offenders, f"cartesian product in: {offenders}"


def test_scan_level_filter_pushdown(plans):
    """Spot-check: the selective-filter queries must reach the parquet
    scan with pushed predicates (a non-empty PushedFilters list)."""
    for name in ["q02_filter_predicates", "q05_tpch_q1", "q11_tpch_q3"]:
        assert re.search(r"PushedFilters: \[[^\]]", plans[name]), (
            f"{name}: no non-empty PushedFilters on any scan"
        )


def test_column_pruning_on_projection(plans):
    """q01 projects a few columns of a 16-column table: the scan schema
    must not contain columns the query never touches."""
    p = plans["q01_scan_projection"]
    assert "l_comment" not in p, "q01 scan reads an untouched column"


def test_broadcast_join_for_small_dims(plans):
    """The dim-join queries must broadcast the small side, not shuffle
    both sides of an SMJ."""
    for name in ["q07_broadcast_join", "q11_tpch_q3"]:
        assert "BroadcastHashJoin" in plans[name], (
            f"{name}: expected a broadcast hash join"
        )
