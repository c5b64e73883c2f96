"""Runtime-scaling probe: measure how the headline operators' wall time
grows as the corpus grows 1x -> 4x -> 16x, on the same host.

The per-round bench (bench.py) proves correctness-adjacent throughput at
one scale; this probe provides the evidence for the OTHER claim SCALE.md
makes — that the chosen plans are linear-ish in corpus size (bucketed
joins with caps, map-side-combinable aggs), with no hidden quadratic
blowup waiting at 100 TB.

Method: materialize k perturbed copies of sf0.1's documents (doc_id
offset by k * 10^7; a per-copy suffix token breaks exact cross-copy
duplication so dedup structure stays realistic instead of every anchor
blowing through its df cap), write them as parquet under
.scale_probe/sfX/, then time a representative query set at each scale
(best-of-2, noop sink, fresh caches per scale). Output: one JSON line
with per-query times per scale plus the 16x/1x ratio — linear scaling
shows as ratio ~16 or less (sub-linear when a fixed scheduling floor
amortizes); quadratic shows as ~256.

Usage:
    python tools/scale_probe.py [--scales 1,4,16] [--runs 2]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bricolage_spark.catalog import TESTDATA_TABLES, table_path
from bricolage_spark.queries import load_all
from bricolage_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
PROBE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_probe")

# Representative set: row-local text ops, digest dedup, the shingle/LSH
# path, positional-anchor spans, winnowing, PMI (the data-proportional
# agg), BM25, and the embedding ops (embeddings scale with the corpus
# here too).
PROBE_QUERIES = (
    "q31_dedup_exact",
    "q37_language_id",
    "q39_quality_score",
    "q33_minhash_lsh_pairs",
    "q74_duplicate_spans",
    "q79_winnowing_fingerprints",
    "q73_pmi_collocations",
    "q60_bm25_retrieval",
    "q42_embedding_neardup",
    # round-7 additions with data-proportional terms:
    "q82_incremental_neardup",
    "q83_hashed_ngram_classifier",
    "q86_sentence_dedup",
    "q88_oov_rate",
    "q90_decontamination_apply",
    "q92_boilerplate_removal",
    # post-r7-window additions (first driver row r8):
    "q95_bpe_merges",
    "q96_semantic_decontamination",
    "q97_host_pagerank",
    "q98_dsir_importance",
    "q99_snapshot_drift",
    "q100_salient_terms",
    "q101_semantic_neardup_history",
    # round-8 additions (apply stages; both data-proportional):
    "q102_bpe_encode",
    "q103_span_removal",
    # round-9 additions: encode+agg composition, span-pair contamination,
    # row-local split assignment, pair-table split joins
    "q104_tokenizer_fertility",
    "q105_span_contamination",
    "q106_eval_split",
    "q107_split_leakage",
    # round-9 post-window additions: corpus agg -> metadata plan; two
    # row-local metric projections joined doc-keyed + tiny agg
    "q108_epoch_plan",
    "q109_classifier_calibration",
    "q110_span_registry_probe",
    # round-10 post-window additions: water-filling over |sources| rows;
    # sampled banding audit (pair volume is data-proportional, like q33)
    "q111_unimax_plan",
    "q112_lsh_banding_audit",
    # round-12 addition: the exact-digest registry anti-join, SMJ-pinned
    # this round (the q82/q101/q110 family's fourth member was never in
    # the probe set)
    "q67_incremental_dedup",
)


def _emb_dims(emb) -> int:
    return len(emb.select("embedding").first()["embedding"])


def build_scaled(
    spark, k: int, clique_block: int = 0, jitter_eps: float = 0.15
) -> str:
    """Write a k-times corpus under .scale_probe/sf{k}x… (idempotent).

    EMBEDDINGS are JITTERED by default (r13 verdict ask #6): copy 0 is
    the base corpus verbatim, copy i>0 adds xxhash64-derived
    per-component noise — u uniform in [-1, 1] has variance eps²/3, so
    E[cos(v, v')] = 1/sqrt(1+eps²/3) (measured 0.9963 at the 0.15
    default on the 4x fixture) — the honest near-twin fixture
    `tools/recall_dial.py` introduced. Verbatim replication (``jitter_eps=0``) made every
    scaled vector an EXACT copy sharing its source's SRP bucket/IVF
    cell by construction, which turned q85's 64x recall column into a
    fixture artifact (the disclosed r13 note) and understated pairwise
    load spread. Document-side construction is unchanged, so lexical
    octave history stays comparable.

    ``clique_block`` bounds the NEAR-DUP CLIQUE SIZE: the per-copy
    suffix token breaks only EXACT duplication, so all k copies of a
    document stay mutual near-duplicates — fine up to 64x, but at 256
    copies every clique sits exactly at the banding path's 256-member
    bucket cap and candidate-pair volume grows quadratically BY FIXTURE
    CONSTRUCTION (the r13 stretch run span >60 GB of shuffle spill into
    ENOSPC — measuring the fixture's clique densification, not
    corpus-size scaling; a real k-times corpus does not densify its
    duplicate clusters). With ``clique_block=B``, copies are grouped in
    blocks of B and each block's words are STRIDE-DEALT by a
    block-specific prime (w[0], w[s], w[2s], …, w[1], w[s+1], …): word
    statistics are preserved exactly, but nearly every ADJACENCY — and
    therefore nearly every w-shingle — changes, so cross-block Jaccard
    collapses and cliques stay at B while the corpus keeps growing. (A
    plain rotation was tried first and failed the sanity check at 0.67
    Jaccard — a cyclic shift preserves all non-seam adjacencies.)"""
    suffix = f"_deal{clique_block}" if clique_block else ""
    if jitter_eps:
        suffix += f"_jit{jitter_eps}"  # recipe in the cache key: a stale
        # verbatim-replica fixture must never satisfy a jittered request
    out = os.path.join(PROBE_DIR, f"sf{k}x{suffix}")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(table_path(BASE_SF, "documents"))
    emb = spark.read.parquet(table_path(BASE_SF, "embeddings"))
    dims = _emb_dims(emb) if jitter_eps else 0
    parts_d = []
    parts_e = []
    for i in range(k):
        off = F.lit(i * 10_000_000)
        text = F.col("text")
        if clique_block and i // clique_block:
            stride = [7, 11, 13, 17, 19, 23][(i // clique_block - 1) % 6]
            w = F.split(F.col("text"), " ")
            n = F.size(w)
            dealt = F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), n - 1),
                    lambda j: F.struct(
                        (j % stride).alias("r"), j.alias("i")
                    ),
                )
            )
            text = F.array_join(
                F.transform(dealt, lambda x: F.element_at(w, x["i"] + 1)),
                " ",
            )
        parts_d.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                # per-copy suffix token: kills exact cross-copy dup spans
                # without changing per-copy text statistics
                F.concat(text, F.lit(f" copytag{i}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" copytag{i}"))).alias("n_chars"),
            )
        )
        if jitter_eps and i:
            # recall_dial.py's near-twin recipe: per-component noise
            # eps·u·‖v‖/√dims with u = xxhash64-uniform in [-1, 1] —
            # Var[u] = eps²/3, so E[cos(v, v')] ≈ 1/sqrt(1+eps²/3)
            # (~0.9963 at eps=0.15; matches the docstring derivation
            # above and recall_dial.py), SRP signatures differ by
            # a few low-margin bits (a REAL near-duplicate, not a copy)
            v = F.col("embedding").cast("array<double>")
            nrm = F.sqrt(
                F.aggregate(
                    F.zip_with(v, v, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            scl = F.lit(jitter_eps) / F.lit(float(dims) ** 0.5) * nrm
            vec = F.transform(
                v,
                lambda x, j: x
                + scl
                * (
                    (
                        F.abs(
                            F.xxhash64(
                                F.col("vec_id"), F.lit(i), j, F.lit("jit")
                            )
                        )
                        % 2_000_001
                    ).cast("double")
                    / F.lit(1_000_000.0)
                    - F.lit(1.0)
                ),
            ).cast("array<float>")
        else:
            vec = F.col("embedding")
        parts_e.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                vec.alias("embedding"),
                # labels model a PRECOMPUTED coarse-quantizer cell id
                # (q42's contract); a 16x corpus retrains with ~16x
                # cells to hold cell size constant (q77 trains its own,
                # _SEM_CELLS), so the probe's copies get fresh cell ids.
                # Keeping |labels| fixed instead showed exactly the
                # expected pathology: q42 grew 62x at 16x data.
                (F.col("label") + F.lit(i * 10_000)).alias("label"),
            )
        )
    d = parts_d[0]
    e = parts_e[0]
    for p in parts_d[1:]:
        d = d.unionAll(p)
    for p in parts_e[1:]:
        e = e.unionAll(p)
    d.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    # remaining tables: symlink to the base (probe queries don't touch
    # them, but read_table must be able to resolve any of them)
    for t in TESTDATA_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(table_path(BASE_SF, t), dst)
    open(marker, "w").close()
    return out


def main() -> None:
    scales = [int(x) for x in _arg("--scales", "1,4,16").split(",")]
    runs = int(_arg("--runs", "2"))
    clique_block = int(_arg("--clique-block", "0"))
    only = _arg("--queries", "")
    probe_queries = (
        [q.strip() for q in only.split(",") if q.strip()]
        if only
        else list(PROBE_QUERIES)
    )
    specs = load_all()
    spark = get_spark("scale-probe")
    out: dict = {"base": BASE_SF, "scales": scales, "queries": {}}
    for k in scales:
        sf_dir = BASE_SF if k == 1 else build_scaled(spark, k, clique_block)
        from bricolage_spark.queries import llm_ops

        llm_ops.release_caches()
        # warm the JVM/codegen once per scale outside the timings
        specs["q31_dedup_exact"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        for name in probe_queries:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            out["queries"].setdefault(name, {})[f"{k}x"] = round(best, 3)
    for name, row in out["queries"].items():
        lo, hi = f"{scales[0]}x", f"{scales[-1]}x"
        if row.get(lo) and row.get(hi):
            row["growth"] = round(row[hi] / row[lo], 2)
    out["note"] = (
        f"growth = t({scales[-1]}x)/t({scales[0]}x); linear-or-better is "
        f"<= {scales[-1] // scales[0]} (sub-linear when the per-job "
        "scheduling floor amortizes); quadratic would be "
        f"~{(scales[-1] // scales[0]) ** 2}"
    )
    print(json.dumps(out))


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


if __name__ == "__main__":
    main()
