"""Round-12 64x octave for the ITERATIVE operators the standard probe
set covers only at serve time (r11 verdict ask #3): q97 PageRank (does
the fixed 5-round join+agg loop with lineage truncation hold at 64x?),
q50 connected components (does propagation depth stay flat as the
corpus grows — cold build AND isolated CC over a prebuilt pair table),
and the q95 BPE trainer's DISTRIBUTED tier (does the distributed-argmax
loop engage and converge at 64x, and does it still produce the exact
merges the driver tier produces?).

These need a dedicated harness rather than scale_probe's PROBE_QUERIES
loop because their cost structure is cache-coupled: q50 serves from the
staged cluster-assignment artifact (a second timed run would measure a
localCheckpoint read), and q95's distributed tier never engages
naturally at probe vocab sizes (the 64x corpus adds only the per-copy
suffix tokens to the vocabulary), so it must be forced with
driver_vocab_max=0 exactly as the cross-tier property test does.

Usage:
    python tools/octave_iterative.py [--scales 1,64] [--runs 2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bricolage_spark.session import get_spark


def best_of(runs: int, fn) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from tools.scale_probe import BASE_SF, build_scaled, _arg

    scales = [int(x) for x in _arg("--scales", "1,64").split(",")]
    runs = int(_arg("--runs", "2"))

    from bricolage_spark.operators.graph import connected_components
    from bricolage_spark.operators.textual import bpe_learn_merges
    from bricolage_spark.queries import llm_ops, load_all
    from bricolage_spark.catalog import read_table

    specs = load_all()
    spark = get_spark("octave-iterative")
    out: dict = {"base": BASE_SF, "scales": scales, "queries": {}}

    for k in scales:
        sf_dir = BASE_SF if k == 1 else build_scaled(spark, k)
        tag = f"{k}x"
        llm_ops.release_caches()
        # warm the JVM/codegen once per scale outside the timings
        specs["q31_dedup_exact"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

        # q97 PageRank: cold, no cache — the full edge build + 5 rounds
        out["queries"].setdefault("q97_host_pagerank", {})[tag] = best_of(
            runs,
            lambda: specs["q97_host_pagerank"].fn(spark, sf_dir)
            .write.format("noop").mode("overwrite").save(),
        )

        # q50 cold: shingle -> signatures -> capped LSH -> Jaccard verify
        # -> min-label propagation, caches released per run so every
        # timed run pays the full build
        def q50_cold():
            llm_ops.release_caches()
            specs["q50_dedup_clusters"].fn(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()

        out["queries"].setdefault("q50_cold_build", {})[tag] = best_of(
            runs, q50_cold
        )

        # q50 isolated CC: propagation only, over a prebuilt
        # (checkpointed) verified-pair table — the depth-vs-data claim
        llm_ops.release_caches()
        pairs = llm_ops._verified_pairs(spark, sf_dir)  # checkpointed
        n_pairs = pairs.count()
        out["queries"].setdefault("q50_pairs_rows", {})[tag] = n_pairs
        out["queries"].setdefault("q50_cc_only", {})[tag] = best_of(
            runs,
            lambda: connected_components(pairs, "id_a", "id_b")
            .write.format("noop").mode("overwrite").save(),
        )

        # q95 distributed tier: forced (driver_vocab_max=0), full
        # 30-merge induction; convergence = 30 merges returned and
        # EXACTLY the driver tier's merges on the same corpus
        docs = read_table(spark, sf_dir, "documents")
        dist_merges: list = []

        def q95_dist():
            dist_merges.clear()
            dist_merges.extend(
                bpe_learn_merges(
                    docs, "doc_id", "text", n_merges=30, driver_vocab_max=0
                )
            )

        out["queries"].setdefault("q95_bpe_distributed_tier", {})[tag] = (
            best_of(runs, q95_dist)
        )
        local_merges = bpe_learn_merges(docs, "doc_id", "text", n_merges=30)
        out["queries"].setdefault("q95_converged_30", {})[tag] = (
            len(dist_merges) == 30
        )
        out["queries"].setdefault("q95_tiers_agree", {})[tag] = (
            dist_merges == local_merges
        )

    for name in ("q97_host_pagerank", "q50_cold_build", "q50_cc_only",
                 "q95_bpe_distributed_tier"):
        row = out["queries"][name]
        lo, hi = f"{scales[0]}x", f"{scales[-1]}x"
        if row.get(lo) and row.get(hi):
            row["growth"] = round(row[hi] / row[lo], 2)
    out["note"] = (
        f"growth = t({scales[-1]}x)/t({scales[0]}x); linear is "
        f"{scales[-1] // scales[0]}"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
