"""Round-13 skew stress (r12 verdict ask #3): measure the skew toolkit
under ACTUAL skew — q46/q47 are oracle-correct on uniform testdata, and
the 64x probe corpus is key-balanced, so SCALE.md's salting claims were
the last design-argument-only section.

Fixture: a zipfian orders fact at 16x/64x sf0.1 (2.4M/9.6M rows) where
ONE customer key owns ~30% of all rows (hash-routed, deterministic),
joined/grouped exactly like q47/q46. The dim is made non-broadcastable
(autoBroadcastJoinThreshold=-1) to model the 100 TB case — a
broadcastable dim makes join skew moot, which is itself the first line
of the guidance.

Probes (each (probe, scale) in its own subprocess — own session, own
conf, clean task metrics; the octave harness lesson):

- join_plain_noaqe — SMJ, AQE skew-join OFF: the raw straggler.
- join_plain_aqe   — SMJ, AQE skew-join ON (engine default): does the
  runtime splitter tame it without any rewrite?
- join_salted      — salted_join with the hot key pinned: the static
  recipe for layouts AQE can't touch.
- agg_plain / agg_salted — algebraic aggs (sum/count/max) plain vs
  salted_aggregate: expected result is parity-or-worse for salting,
  because map-side partial aggregation already defuses algebraic group
  skew — measuring the NON-case is the point (the guidance must say
  when NOT to salt).
- agg_collect_plain / agg_collect_salted — collect_set: the holistic
  family, where the hot group's whole value set lands on one reduce
  task unless salted.

Metrics per probe: best-of-N wall seconds + task-duration straggler
ratio (max task / p50 task of the worst stage, from the UI REST API —
the probe runs with spark.ui.enabled=true).

Usage:
    python tools/skew_probe.py [--scales 16,64] [--runs 2]
    python tools/skew_probe.py --single <probe> <scale> <runs>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(REPO, ".scale_probe")
HOT_KEY = 7  # the one customer owning ~30% of fact rows
HOT_SHARE = 3  # pmod(hash, 10) < 3  ->  ~30%
N_SALTS = 16

PROBES = (
    "join_plain_noaqe",
    "join_plain_aqe",
    "join_salted",
    "agg_plain",
    "agg_salted",
    "agg_collect_plain",
    "agg_collect_salted",
    # r13 late addition: the repaired right-join full-replication path
    # (marker + key anti-join) measured under the same zipfian fixture —
    # the repair's scale shape (distinct on the bare key = map-side
    # combine) should be measured, not argued
    "rjoin_plain",
    "rjoin_salted",
)


def fact_path(scale: int) -> str:
    return os.path.join(PROBE_DIR, f"skew_orders_{scale}x.parquet")


def build_fact(scale: int) -> str:
    """Zipfian fact: sf0.1 orders replicated ``scale``x, ~30% of rows
    re-keyed to HOT_KEY (hash-routed so retries are deterministic)."""
    out = fact_path(scale)
    if os.path.isdir(out):
        return out
    from pyspark.sql import functions as F

    from bricolage_spark.session import get_spark

    spark = get_spark("skew-build")
    orders = spark.read.parquet(os.path.join(BASE_SF, "orders.parquet"))
    parts = []
    for i in range(scale):
        off = F.lit(i * 10_000_000)
        parts.append(
            orders.select(
                (F.col("o_orderkey") + off).alias("o_orderkey"),
                F.col("o_custkey"),
                F.col("o_totalprice"),
                # realistic fact width: without a payload the 30% key is
                # ~20 MB at 16x — UNDER AQE's partition-size advisory, so
                # there is no straggler to mitigate (the first probe run
                # measured ratio 1.1 and taught exactly that; kept in
                # SCALE.md as guidance). ~320 high-ENTROPY bytes per row
                # (shuffle sizes are compressed — a repeated constant
                # would vanish) make the hot partition hundreds of MB at
                # 64x, the shape that actually pins a task.
                F.concat(
                    *[
                        F.md5(
                            F.concat(
                                F.col("o_orderkey").cast("string"),
                                F.lit(f"_{j}"),
                            )
                        )
                        for j in range(10)
                    ]
                ).alias("o_payload"),
            )
        )
    fact = parts[0]
    for p in parts[1:]:
        fact = fact.unionAll(p)
    fact = fact.select(
        "o_orderkey",
        F.when(
            F.pmod(F.hash("o_orderkey"), F.lit(10)) < F.lit(HOT_SHARE),
            F.lit(HOT_KEY),
        )
        .otherwise(F.col("o_custkey"))
        .cast("long")
        .alias("c_custkey"),
        "o_totalprice",
        "o_payload",
    )
    fact.repartition(32).write.mode("overwrite").parquet(out)
    return out


def best_of(runs: int, fn) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


# --- task-metric capture via the UI REST API -------------------------------
def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications"
                                f"/{spark.sparkContext.applicationId}{path}") as r:
        return json.loads(r.read())


def _max_stage_id(spark) -> int:
    stages = _api(spark, "/stages")
    return max((s["stageId"] for s in stages), default=-1)


def straggler_ratio(spark, since_stage: int) -> dict:
    """max/p50 task duration of the heaviest post-watermark stage."""
    worst = {"ratio": 0.0, "max_task_sec": 0.0, "p50_task_sec": 0.0}
    for s in _api(spark, "/stages?status=complete"):
        if s["stageId"] <= since_stage or s["numCompleteTasks"] < 2:
            continue
        try:
            q = _api(
                spark,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        p50, mx = (x / 1000.0 for x in q["duration"])
        if mx > worst["max_task_sec"]:
            worst = {
                "ratio": round(mx / max(p50, 0.001), 1),
                "max_task_sec": round(mx, 2),
                "p50_task_sec": round(p50, 3),
            }
    return worst


def run_single(probe: str, scale: int, runs: int) -> dict:
    from pyspark.sql import functions as F

    from bricolage_spark.operators.skew import salted_aggregate, salted_join
    from bricolage_spark.session import get_spark

    conf = {
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "500",
    }
    if probe.startswith(("join", "rjoin")):
        # model the 100 TB big-dim case: no broadcast escape hatch
        conf["spark.sql.autoBroadcastJoinThreshold"] = "-1"
        conf["spark.sql.adaptive.autoBroadcastJoinThreshold"] = "-1"
    if probe == "join_plain_noaqe":
        conf["spark.sql.adaptive.skewJoin.enabled"] = "false"
    spark = get_spark(f"skew-{probe}", extra_conf=conf)

    fact = spark.read.parquet(fact_path(scale))
    dim = (
        spark.read.parquet(os.path.join(BASE_SF, "customer.parquet"))
        .select("c_custkey", "c_mktsegment")
    )
    # warm codegen/scan outside the timings
    fact.agg(F.count(F.lit(1))).collect()
    dim.agg(F.count(F.lit(1))).collect()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    if probe.startswith("join"):
        if probe == "join_salted":
            def q():
                _noop(
                    salted_join(
                        fact, dim, key="c_custkey", salt_from="o_orderkey",
                        n_salts=N_SALTS, hot=[HOT_KEY],
                    )
                    .groupBy("c_mktsegment")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("o_totalprice").alias("s"),
                        # consume the payload so column pruning cannot
                        # strip it from the join shuffle (the skew IS
                        # the wide rows)
                        F.sum(F.length("o_payload")).alias("pb"),
                    )
                )
        else:
            def q():
                _noop(
                    fact.join(dim, "c_custkey")
                    .groupBy("c_mktsegment")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("o_totalprice").alias("s"),
                        # consume the payload so column pruning cannot
                        # strip it from the join shuffle (the skew IS
                        # the wide rows)
                        F.sum(F.length("o_payload")).alias("pb"),
                    )
                )
    elif probe in ("rjoin_plain", "rjoin_salted"):
        # right outer join fact->dim: keeps every dim row (incl. the
        # unmatched ones the r13 repair re-derives via the key
        # anti-join); same agg sink as the inner probes
        def _sink(j):
            _noop(
                j.groupBy("c_mktsegment").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("o_totalprice").alias("s"),
                    F.sum(F.length("o_payload")).alias("pb"),
                )
            )

        if probe == "rjoin_salted":
            def q():
                _sink(
                    salted_join(
                        fact, dim, key="c_custkey", salt_from="o_orderkey",
                        n_salts=N_SALTS, how="right", hot=[HOT_KEY],
                    )
                )
        else:
            def q():
                _sink(fact.join(dim, "c_custkey", "right"))
    elif probe in ("agg_plain", "agg_salted"):
        if probe == "agg_salted":
            def q():
                _noop(
                    salted_aggregate(
                        fact, ["c_custkey"],
                        {"o_totalprice": "sum", "o_orderkey": "count"},
                        salt_from="o_orderkey", n_salts=N_SALTS,
                    )
                )
        else:
            def q():
                _noop(
                    fact.groupBy("c_custkey").agg(
                        F.sum("o_totalprice").alias("sum_o_totalprice"),
                        F.count("o_orderkey").alias("count_o_orderkey"),
                    )
                )
    else:  # agg_collect_*
        if probe == "agg_collect_salted":
            def q():
                _noop(
                    salted_aggregate(
                        fact, ["c_custkey"], {"o_orderkey": "collect_set"},
                        salt_from="o_orderkey", n_salts=N_SALTS,
                    ).select(
                        "c_custkey",
                        F.size("collect_set_o_orderkey").alias("n"),
                    )
                )
        else:
            def q():
                _noop(
                    fact.groupBy("c_custkey")
                    .agg(F.collect_set("o_orderkey").alias("v"))
                    .select("c_custkey", F.size("v").alias("n"))
                )

    q()  # one untimed run: codegen + AQE warm; metrics watermark after
    mark = _max_stage_id(spark)
    out = {"sec": best_of(runs, q)}
    out.update(straggler_ratio(spark, mark))
    return out


def main() -> None:
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        probe, scale, runs = (
            sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3]),
        )
        print(json.dumps(run_single(probe, scale, runs)))
        return

    def _arg(flag: str, default: str) -> str:
        return (
            sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default
        )

    scales = [int(x) for x in _arg("--scales", "16,64").split(",")]
    runs = int(_arg("--runs", "2"))

    from bricolage_spark.session import stop_spark

    for k in scales:
        build_fact(k)
    stop_spark()

    only = _arg("--probes", "")
    probes = tuple(only.split(",")) if only else PROBES

    out: dict = {
        "fixture": f"sf0.1 orders x scale, key {HOT_KEY} owns ~{HOT_SHARE}0% "
        f"of rows; dim=customer (non-broadcastable for join probes); "
        f"n_salts={N_SALTS}",
        "scales": scales,
        "probes": {},
    }
    for probe in probes:
        for k in scales:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 probe, str(k), str(runs)],
                capture_output=True, text=True, cwd=REPO,
            )
            tag = f"{k}x"
            if r.returncode != 0:
                out["probes"].setdefault(probe, {})[tag] = (
                    "FAILED: " + r.stderr.strip()[-400:]
                )
                continue
            out["probes"].setdefault(probe, {})[tag] = json.loads(
                r.stdout.strip().splitlines()[-1]
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
