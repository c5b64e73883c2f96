"""Round-12 64x octave for the ITERATIVE operators the standard probe
set covers only at serve time (r11 verdict ask #3): q97 PageRank (does
the fixed 5-round join+agg loop with lineage truncation hold at 64x?),
q50 connected components (does propagation depth stay flat as the
corpus grows — cold build AND isolated CC over a prebuilt pair table),
and the q95 BPE trainer's DISTRIBUTED tier (does the distributed-argmax
loop engage and converge at 64x, and does it still produce the exact
merges the driver tier produces?).

These need a dedicated harness rather than scale_probe's PROBE_QUERIES
loop, for two reasons found the hard way:

- cache semantics: q50 serves from the staged cluster-assignment
  artifact (a second timed run would measure a localCheckpoint read),
  and q95's distributed tier never engages naturally at probe vocab
  sizes (the 64x corpus adds only the per-copy suffix tokens to the
  vocabulary), so it must be forced with driver_vocab_max=0 exactly as
  the cross-tier property test does;
- process isolation: the first combined-session run of this octave
  exhausted the 8 GiB unified memory pool at 64x — NOT in any single
  probe's plan (q50 standalone completes in ~168 s with zero memory
  warnings) but across sequential heavy probes, as localCheckpoint
  blocks from earlier probes sat in storage until a JVM GC let
  ContextCleaner reclaim them while the next probe's sorts fought for
  the remainder. release_caches() now nudges that reclamation chain
  (llm_ops.release_caches), and this harness additionally runs each
  (probe, scale) in its OWN subprocess — which is also the honest
  production model: separate pipeline jobs, separate executors.

Usage:
    python tools/octave_iterative.py [--scales 1,64] [--runs 2]
    python tools/octave_iterative.py --single <probe> <sf_dir> <runs>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBES = (
    "q97_pagerank",
    "q50_cold_build",
    "q50_cc_only",
    "q95_bpe_distributed",
)


def best_of(runs: int, fn) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_single(probe: str, sf_dir: str, runs: int) -> dict:
    """One probe at one scale, in THIS process (spawned per probe)."""
    from bricolage_spark.catalog import read_table
    from bricolage_spark.operators.graph import connected_components
    from bricolage_spark.operators.textual import bpe_learn_merges
    from bricolage_spark.queries import llm_ops, load_all
    from bricolage_spark.session import get_spark

    specs = load_all()
    spark = get_spark(f"octave-{probe}")
    # warm the JVM/codegen once outside the timings
    specs["q31_dedup_exact"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict = {}

    if probe == "q97_pagerank":
        out["sec"] = best_of(
            runs,
            lambda: specs["q97_host_pagerank"].fn(spark, sf_dir)
            .write.format("noop").mode("overwrite").save(),
        )
    elif probe == "q50_cold_build":
        # caches released per run: every timed run pays shingles ->
        # signatures -> capped LSH -> Jaccard verify -> propagation
        def cold():
            llm_ops.release_caches()
            specs["q50_dedup_clusters"].fn(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()

        out["sec"] = best_of(runs, cold)
    elif probe == "q50_cc_only":
        # propagation only, over a prebuilt (checkpointed) pair table —
        # the depth-vs-data claim in isolation
        pairs = llm_ops._verified_pairs(spark, sf_dir)
        out["pairs_rows"] = pairs.count()
        out["sec"] = best_of(
            runs,
            lambda: connected_components(pairs, "id_a", "id_b")
            .write.format("noop").mode("overwrite").save(),
        )
    elif probe == "q95_bpe_distributed":
        docs = read_table(spark, sf_dir, "documents")
        dist: list = []

        def induce():
            dist.clear()
            dist.extend(
                bpe_learn_merges(
                    docs, "doc_id", "text", n_merges=30, driver_vocab_max=0
                )
            )

        out["sec"] = best_of(runs, induce)
        local = bpe_learn_merges(docs, "doc_id", "text", n_merges=30)
        out["converged_30"] = len(dist) == 30
        out["tiers_agree"] = dist == local
    else:
        raise SystemExit(f"unknown probe: {probe}")
    return out


def main() -> None:
    from tools.scale_probe import _arg

    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        probe, sf_dir, runs = sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3])
        print(json.dumps(run_single(probe, sf_dir, runs)))
        return

    scales = [int(x) for x in _arg("--scales", "1,64").split(",")]
    runs = int(_arg("--runs", "2"))

    # materialize the scaled corpora once, in a throwaway session
    from bricolage_spark.session import get_spark, stop_spark
    from tools.scale_probe import BASE_SF, build_scaled

    dirs = {}
    spark = get_spark("octave-build")
    for k in scales:
        dirs[k] = BASE_SF if k == 1 else build_scaled(spark, k)
    stop_spark()

    out: dict = {"base": BASE_SF, "scales": scales, "queries": {}}
    for probe in PROBES:
        for k in scales:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single",
                 probe, dirs[k], str(runs)],
                capture_output=True, text=True, cwd=REPO,
            )
            tag = f"{k}x"
            if r.returncode != 0:
                out["queries"].setdefault(probe, {})[tag] = (
                    "FAILED: " + r.stderr.strip()[-400:]
                )
                continue
            res = json.loads(r.stdout.strip().splitlines()[-1])
            row = out["queries"].setdefault(probe, {})
            row[tag] = res.pop("sec")
            for key, v in res.items():
                out["queries"].setdefault(f"{probe}.{key}", {})[tag] = v
        row = out["queries"][probe]
        lo, hi = f"{scales[0]}x", f"{scales[-1]}x"
        if isinstance(row.get(lo), float) and isinstance(row.get(hi), float):
            row["growth"] = round(row[hi] / row[lo], 2)
    out["note"] = (
        f"growth = t({scales[-1]}x)/t({scales[0]}x); linear is "
        f"{scales[-1] // scales[0]}; each (probe, scale) runs in its own "
        "process (fresh JVM, warm-up outside timings)"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
