"""Seeded differential fuzzing: Spark vs DuckDB on identical generated SQL.

The fixed 117-query inventory checks the semantics its authors thought
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
@pytest.mark.parametrize("seed", [*range(N_SEEDS), 333, 389, 2446])
def test_engines_agree(fuzz_env, seed):
    spark, con = fuzz_env
    case, diff = diff_fuzz.run_case(spark, con, seed)
    assert diff is None, f"{diff}\nSQL: {case['sql']}"
