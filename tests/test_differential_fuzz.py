"""Seeded differential fuzzing: Spark vs DuckDB on identical generated SQL.

The fixed 118-query inventory checks the semantics its authors thought
to check; `tools/diff_fuzz.py` generates random relational queries
(FK-walk joins, typed predicates, aggregates, HAVING) and requires both
engines to agree on the SAME SQL text.  The pytest wrapper runs a fixed
seed block so CI is deterministic; the tool's CLI runs open-ended
sweeps (400 seeds at sf0.01 recorded green in PLANS_r13.md).

Seeds here are FROZEN: a failure is a real cross-engine divergence (or
a generator-determinism regression), never fuzz noise.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import diff_fuzz  # noqa: E402

N_SEEDS = 40


@pytest.fixture(scope="module")
def fuzz_env(spark, sf_dir):
    spark, con = diff_fuzz.setup(sf_dir, spark=spark)
    return spark, con


def test_generator_is_deterministic(fuzz_env):
    # same seed -> same SQL text, independent of process history (given
    # the same sf_dir stats); the pinned-seed suite below is
    # meaningless without this
    a = [diff_fuzz.gen_query(s)["sql"] for s in range(N_SEEDS)]
    b = [diff_fuzz.gen_query(s)["sql"] for s in range(N_SEEDS)]
    assert a == b


def test_grammar_covers_the_interesting_shapes(fuzz_env):
    cases = [diff_fuzz.gen_query(s) for s in range(200)]
    sqls = [c["sql"] for c in cases]
    assert any("LEFT JOIN" in s for s in sqls)
    assert any(s.count("JOIN") >= 2 for s in sqls)
    assert any("HAVING" in s for s in sqls)
    assert any("COUNT(DISTINCT" in s for s in sqls)
    assert any(" OR " in s for s in sqls)
    assert any(c["mode"] == "project" for c in cases)
    assert any(c["group_cols"] and len(c["group_cols"]) == 2 for c in cases)
    assert any(c["mode"] == "window" for c in cases)
    assert any(c["mode"] == "setop" for c in cases)
    assert any("NULLIF" in s for s in sqls)
    assert any("ROW_NUMBER() OVER" in s for s in sqls)
    assert any("INTERSECT" in s or "EXCEPT" in s for s in sqls)


# 333/389: LEFT JOIN NULL-int regression seeds — pandas surfaces the
# unmatched side's ints as float64 NaN, which the comparator must
# canonicalize to None in an object column (nan != nan, and a float64
# column silently coerces None straight back to NaN).
# 2446: the timestamp twin — NULL timestamps surface as pd.NaT, and
# NaTType passes isinstance(_, datetime.datetime), so the NaT check
# must precede the datetime branch in _canon_cell.
# 17/29/35/48: events.ts seeds — the column joined the grammar in r14
# after setup() started probing the parquet unit (timestamp[us] reads
# identically in both engines; a NANOS generation is re-excluded).
# 18/70: correlated-EXISTS seeds (the r14 grammar extension; a
# different decorrelation path in both planners than IN-subqueries).
@pytest.mark.parametrize("seed", [*range(N_SEEDS), 333, 389, 2446, 17, 29, 35, 48, 18, 70])
def test_engines_agree(fuzz_env, seed):
    spark, con = fuzz_env
    case, diff = diff_fuzz.run_case(spark, con, seed)
    assert diff is None, f"{diff}\nSQL: {case['sql']}"


# ---------------------------------------------------------------------------
# comparator unit tests (r13 ADVICE fix): alignment must come from EXACT
# columns only.  The old comparator sorted on floats rounded to 6 dp while
# judging float equality at 1e-8 relative tolerance, so rows whose float
# values tied at 6 dp (the stable sort then kept each engine's own input
# order) zip-compared mismatched partners — a spurious divergence.
# ---------------------------------------------------------------------------


def _pd(rows, cols):
    import pandas as pd

    return pd.DataFrame(rows, columns=cols)


def test_compare_aligns_on_exact_columns_only():
    """Two rows, same exact key, float values that tie at 6 dp but differ
    by 3e-7 (>> 1e-8 tol), listed in OPPOSITE input order per engine:
    the old sort-key logic misaligned them; multiset matching must not."""
    case = {"float_cols": ["v"]}
    a = _pd([("k", 1.0000001), ("k", 1.0000004)], ["g", "v"])
    b = _pd([("k", 1.0000004), ("k", 1.0000001)], ["g", "v"])
    assert diff_fuzz.compare(a, b, case) is None


def test_compare_rounding_boundary_does_not_misalign():
    """Float sort keys straddling a 6-dp rounding boundary between engines
    (values within 1e-8 of each other) must still align."""
    case = {"float_cols": ["v"]}
    a = _pd([("k", 1.0000004999), ("k", 2.0)], ["g", "v"])
    b = _pd([("k", 1.0000005001), ("k", 2.0)], ["g", "v"])
    assert diff_fuzz.compare(a, b, case) is None


def test_compare_still_catches_real_float_divergence():
    case = {"float_cols": ["v"]}
    a = _pd([("k", 1.0), ("k", 2.0)], ["g", "v"])
    b = _pd([("k", 1.0), ("k", 2.5)], ["g", "v"])
    assert diff_fuzz.compare(a, b, case) is not None


def test_compare_still_catches_exact_key_divergence():
    case = {"float_cols": ["v"]}
    a = _pd([("k1", 1.0)], ["g", "v"])
    b = _pd([("k2", 1.0)], ["g", "v"])
    msg = diff_fuzz.compare(a, b, case)
    assert msg is not None and "exact-key" in msg


def test_compare_group_multiplicity_divergence():
    """Same key set but different per-key multiplicities must diverge."""
    case = {"float_cols": []}
    a = _pd([("k1",), ("k1",), ("k2",)], ["g"])
    b = _pd([("k1",), ("k2",), ("k2",)], ["g"])
    assert diff_fuzz.compare(a, b, case) is not None


def test_compare_overlapping_tolerance_windows_use_maximal_matching():
    """r14 ADVICE: a1 within tol of b1 AND b2, a2 within tol of b1 only —
    greedy first-fit consumes b1 for a1 and strands a2, reporting a
    spurious divergence though a perfect matching (a1-b2, a2-b1) exists.
    In ONE float column the deterministic repr-sort happens to rescue
    greedy (the tolerance graph is an interval graph), so this is the
    genuinely adversarial TWO-column construction where sort order
    (x-major) conflicts with the match structure (decided by y):
    a1=(1.0, 1.0) sorts first and tries b1=(1.0, 1.000000008) first,
    but b1 is the ONLY partner of a2=(1.000000005, 1.000000012)."""
    case = {"float_cols": ["x", "y"]}
    a = _pd(
        [("k", 1.0, 1.0), ("k", 1.000000005, 1.000000012)], ["g", "x", "y"]
    )
    b = _pd(
        [("k", 1.0, 1.000000008), ("k", 1.000000005, 1.0)], ["g", "x", "y"]
    )
    # adjacency sanity for the scenario: a2-b2 differ by 1.2e-8 in y,
    # above the ~1e-8 relative tolerance; every other pair is within it
    assert not diff_fuzz._tol_eq(1.000000012, 1.0)
    assert diff_fuzz._tol_eq(1.0, 1.000000008)
    assert diff_fuzz.compare(a, b, case) is None
    # sanity: a genuinely unmatchable remainder still diverges
    c = _pd(
        [("k", 1.0, 1.000000008), ("k", 1.000000005, 2.0)], ["g", "x", "y"]
    )
    assert diff_fuzz.compare(a, c, case) is not None


def test_compare_exact_key_folds_integral_floats():
    """r14 ADVICE: a nullable integer column materializing as float64 in
    one engine (1.0) and int in the other (1) must key to the SAME exact
    group (the old value-equality comparator matched 1 == 1.0)."""
    case = {"float_cols": []}
    a = _pd([(1, "x")], ["n", "s"])
    b = _pd([(1.0, "x")], ["n", "s"])
    assert b["n"].dtype.kind == "f"  # the dtype split actually happened
    assert diff_fuzz.compare(a, b, case) is None
    # non-integral floats must NOT fold onto ints
    c = _pd([(1.5, "x")], ["n", "s"])
    msg = diff_fuzz.compare(a, c, case)
    assert msg is not None and "exact-key" in msg


def test_compare_null_floats_match_only_nulls():
    import numpy as np

    case = {"float_cols": ["v"]}
    a = _pd([("k", np.nan), ("k", 1.0)], ["g", "v"])
    b = _pd([("k", 1.0), ("k", np.nan)], ["g", "v"])
    assert diff_fuzz.compare(a, b, case) is None
    c = _pd([("k", np.nan), ("k", np.nan)], ["g", "v"])
    assert diff_fuzz.compare(a, c, case) is not None


def test_events_ts_probe_included_on_us_data(fuzz_env, sf_dir):
    """The driver's current testdata generation is timestamp[us] in every
    SF, so setup() must have admitted events.ts to the grammar; if this
    fails after a testdata regeneration, the NANOS exclusion documented
    in the module docstring has (correctly) re-engaged and the pinned
    ts seeds above need re-freezing."""
    import pyarrow.parquet as pq

    unit = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    assert ("ts" in diff_fuzz.TABLES["events"]) == (unit == "timestamp[us]")
