"""Benchmark harness: run the declared query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query executes fully via the no-op sink (write.format("noop")) so
timing covers the whole plan — scan, shuffle, agg — without collect/
serialization overhead polluting the measurement. One warm-up pass of the
flagship query amortizes JVM/codegen spin-up out of the numbers.

Pass --duckdb to also time the DuckDB oracles on the same tables (the
BASELINE.md reference numbers).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bricolage_spark.queries import load_all
from bricolage_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def run_spark(specs, sf_dir: str) -> dict[str, float]:
    # AQE is the engine default (runtime re-planning pays off on real
    # shuffle volumes), but at bench scale (sub-second queries) its stage
    # materialization adds ~40% fixed latency — so the bench harness runs
    # with it off unless SPARK_GRAFT_AQE overrides. A cluster deployment
    # at 100 TB keeps it on.
    # Post-shuffle data at bench SF is a few MB, so 32 reduce tasks are
    # pure scheduling overhead; 8 measured fastest (sp=4/8/16 within
    # noise, sp=32 ~15% slower). At real scale AQE coalescing picks the
    # partition count at runtime — this knob is the static equivalent for
    # the AQE-off bench, not an engine default (which stays 32/AQE-on).
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_SHUFFLE_PARTITIONS", "8"
            ),
        },
    )
    # warm-up: JVM, codegen, parquet footer caches
    specs["q05_tpch_q1"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Per-query: best of N runs (default 3). Run 1 pays whole-stage-codegen
    # compilation (~1-3 s of Janino per distinct query shape) — a fixed
    # cost that amortizes to nothing at production scale, so steady-state
    # throughput is what the number should mean (BASELINE.md methodology:
    # warm session). SPARK_GRAFT_BENCH_RUNS=1 gives cold timings.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    times: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    return times


def run_duckdb(specs, sf_dir: str) -> dict[str, float]:
    import duckdb

    from bricolage_spark.catalog import TESTDATA_TABLES, table_path

    con = duckdb.connect()
    con.sql(f"SET threads TO {os.cpu_count()}")
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{table_path(sf_dir, t)}')"
        )
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    times: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        if spec.oracle is None:
            continue
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            con.sql(spec.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    return times


def main() -> None:
    specs = load_all()
    with_duckdb = "--duckdb" in sys.argv
    times = run_spark(specs, SF_DIR)
    total = round(sum(times.values()), 3)
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    out = {
        "metric": f"sum of per-query best-of-{n_runs} wall sec, full query "
        "inventory (noop sink, warm session)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_of(SF_DIR),
    }
    if with_duckdb:
        out["duckdb_queries"] = run_duckdb(specs, SF_DIR)
        # sum of per-query bests — the SAME statistic as the Spark total,
        # so the ratio compares like with like (the old wall-clock-of-loop
        # total double-counted every extra run).
        out["duckdb_total"] = round(sum(out["duckdb_queries"].values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
