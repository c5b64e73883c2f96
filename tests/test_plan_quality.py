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
def plan_pairs(spark):
    """name -> (formatted, simple) physical plan for every registered
    query. ``simple`` is the executedPlan tree with inline arguments —
    the form whose indentation encodes the operator tree, which the
    single-partition-window gate walks."""
    out = {}
    for name, spec in sorted(load_all().items()):
        df = spec.fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        simple = df._jdf.queryExecution().executedPlan().toString()
        out[name] = (buf.getvalue(), simple)
    return out


@pytest.fixture(scope="module")
def plans(plan_pairs):
    """name -> formatted physical plan for every registered query."""
    return {n: p[0] for n, p in plan_pairs.items()}


@pytest.fixture(scope="module")
def simple_plans(plan_pairs):
    return {n: p[1] for n, p in plan_pairs.items()}


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


# -- single-partition-window gate (SCALE.md claim #4) -----------------------

_WSPEC_RE = re.compile(r"windowspecdefinition\(")
_BOUNDED_NODES = ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit")


def _indent(line: str) -> int:
    """Tree depth of a simple-plan line (the +-/:-/space gutter width)."""
    return len(re.match(r"^[\s+:|-]*", line).group(0))


def _spec_args(line: str) -> list[str]:
    """Top-level args of the first windowspecdefinition(...) on the line,
    split depth-aware (partition exprs may contain commas in parens)."""
    m = _WSPEC_RE.search(line)
    start = m.end()
    depth, args, cur = 1, [], []
    for ch in line[start:]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                break
        if ch == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def _is_unpartitioned(line: str) -> bool:
    """True iff the window spec has NO partition expressions: every arg
    before the frame is an ordering expr (carries ASC/DESC). A window
    like ``count() over (partition by k)`` has a bare column arg and is
    fine; ``row_number() over (order by x)`` has only ordered args and
    funnels ALL rows through one task."""
    exprs = [
        a
        for a in _spec_args(line)
        if not a.startswith("specifiedwindowframe")
    ]
    return all(" ASC " in a or " DESC " in a for a in exprs)


def _window_input_is_bounded(lines: list[str], i: int) -> bool:
    """True iff the window node at ``lines[i]`` sits over a bounded
    input: a limit node (TakeOrderedAndProject / GlobalLimit /
    CollectLimit) on its FIRST-CHILD SPINE. The walk follows only the
    chain of first children (indent strictly increasing) and STOPS at
    any multi-input node (join/union): a limit inside one branch of a
    join bounds that branch, not the window's input."""
    prev = _indent(lines[i])
    for sub in lines[i + 1 :]:
        if not sub.strip():
            continue
        ind = _indent(sub)
        if ind <= prev:
            return False  # sibling branch: left the first-child spine
        if any(b in sub for b in _BOUNDED_NODES):
            return True
        if any(m in sub for m in ("Join", "Union", "CartesianProduct")):
            return False  # multi-input: a limit below bounds one branch only
        prev = ind
    return False


def test_no_unbounded_single_partition_window(simple_plans):
    """No Window without PARTITION BY over unbounded input, anywhere in
    the inventory (no allowlist): such a window funnels the full input
    through a single task — the one plan shape that cannot survive a
    100x scale-up. A single-partition window is acceptable ONLY when its
    INPUT SPINE contains a limit (see ``_window_input_is_bounded``),
    i.e. the head was taken distributed first and the window ranks a
    bounded row set (q81's shape)."""
    offenders = []
    for name, plan in simple_plans.items():
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Window " not in ln or not _WSPEC_RE.search(ln):
                continue
            if not _is_unpartitioned(ln):
                continue
            if not _window_input_is_bounded(lines, i):
                offenders.append((name, ln.strip()[:120]))
    assert not offenders, f"unbounded single-partition window in: {offenders}"


def test_window_bound_walk_stays_on_first_child_spine():
    """Regression (round-7 advice): a limit in ONE branch of a join
    below the window must NOT count as bounding the window's input —
    the walk stops at the first multi-input node. A limit ON the spine
    (above the join, or in a join-free chain) does bound it."""
    limited_join_branch = [
        "Window [row_number() windowspecdefinition(x ASC NULLS FIRST)]",
        "+- SortMergeJoin [a], [b], Inner",
        "   :- GlobalLimit 10",
        "   :  +- Exchange",
        "   +- Scan parquet",
    ]
    assert not _window_input_is_bounded(limited_join_branch, 0)
    limit_on_spine = [
        "Window [row_number() windowspecdefinition(x ASC NULLS FIRST)]",
        "+- TakeOrderedAndProject(limit=100)",
        "   +- SortMergeJoin [a], [b], Inner",
    ]
    assert _window_input_is_bounded(limit_on_spine, 0)
    sibling_not_descendant = [
        "Union",
        ":- Window [row_number() windowspecdefinition(x ASC NULLS FIRST)]",
        ":  +- Exchange SinglePartition",
        "+- GlobalLimit 10",
    ]
    assert not _window_input_is_bounded(sibling_not_descendant, 1)
