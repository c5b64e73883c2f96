"""Unit tests for bench.py's host-normalized regression detector."""

from __future__ import annotations

import importlib.util
import json
import os


def _bench():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _baseline(tmp_path, queries, duckdb_total=10.0, sf=0.1):
    p = tmp_path / "BASELINE.json"
    p.write_text(
        json.dumps({"sf": sf, "queries": queries, "duckdb_total": duckdb_total})
        + "\n"
    )
    return str(p)


def test_flags_genuine_regression_and_ignores_jitter(tmp_path):
    b = _bench()
    base = _baseline(tmp_path, {"q1": 0.5, "q2": 0.4, "q3": 2.0})
    times = {
        "q1": 5.0,   # 10x: a real plan regression
        "q2": 0.55,  # 1.4x sub-second jitter: under the 1.5x line
        "q3": 2.1,   # basically unchanged
    }
    out = b.baseline_regressions(times, 0.1, duckdb_total=10.0, base_path=base)
    assert out == {"q1": [0.5, 5.0]}


def test_host_inflation_is_normalized_out(tmp_path):
    """A uniformly 1.8x-slower host (duckdb side inflated identically)
    must flag nothing, while the same times with a FAST duckdb run (no
    host excuse) flag everything eligible."""
    b = _bench()
    queries = {"q1": 0.5, "q2": 1.0}
    base = _baseline(tmp_path, queries, duckdb_total=10.0)
    inflated = {"q1": 0.9, "q2": 1.8}
    assert (
        b.baseline_regressions(inflated, 0.1, duckdb_total=18.0, base_path=base)
        == {}
    )
    flagged = b.baseline_regressions(
        inflated, 0.1, duckdb_total=10.0, base_path=base
    )
    assert set(flagged) == {"q1", "q2"}


def test_absolute_excess_floor_and_sf_mismatch(tmp_path):
    b = _bench()
    base = _baseline(tmp_path, {"q1": 0.21})
    # 1.67x relative but only 0.14s excess: under the 0.2s absolute floor
    assert (
        b.baseline_regressions({"q1": 0.35}, 0.1, duckdb_total=10.0, base_path=base)
        == {}
    )
    # sf mismatch: not comparable, never flags
    assert (
        b.baseline_regressions({"q1": 9.9}, 0.01, duckdb_total=10.0, base_path=base)
        == {}
    )
    # missing baseline file: silent no-op
    assert (
        b.baseline_regressions({"q1": 9.9}, 0.1, base_path=str(tmp_path / "nope"))
        == {}
    )
