"""Micro-bench a few named queries: best-of-N noop-sink wall seconds
under the engine-default session — the bench.py statistic, isolated so a
single change can be A/B'd quickly (run from an old checkout vs the
working tree on the same host, back to back).

Usage: python tools/micro_bench.py [--runs N] [--sf DIR] q109 q30 ...
Prints one JSON line {query: sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n_runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            n_runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            out_names.append(args[i]); i += 1

    from bricolage_spark.queries import llm_ops, load_all
    from bricolage_spark.session import get_spark

    specs = load_all()
    spark = get_spark("micro_bench")
    llm_ops.release_caches()
    # same warm-up + staging as bench.py
    specs["q05_tpch_q1"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    llm_ops.stage_artifacts(spark, sf_dir)
    times = {}
    for short in out_names:
        name = next(
            (n for n in specs if n == short or n.split("_", 1)[0] == short), None
        )
        if name is None:
            print(f"unknown query: {short}", file=sys.stderr)
            continue
        spec = specs[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
