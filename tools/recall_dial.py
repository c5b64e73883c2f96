"""Round-13 recall-dial measurement for the SRP ANN family.

SCALE.md's q85 note priced recall as "a parameter decision (fewer
planes / multi-probe / band-OR)" without measuring it.  This tool
measures the two non-reindexing-vs-reindexing dials against each other
on the real axis that matters at 100 TB — RECALL vs SCANNED FRACTION:

- **fewer planes** (re-index): halving bucket count doubles the scanned
  fraction of EVERY query, and changing it means rewriting the
  bucket-partitioned corpus layout;
- **multi-probe** (``lsh_multiprobe_topk``, q113): the corpus layout is
  untouched; each query additionally probes the buckets reached by
  flipping its lowest-|margin| planes, so scanned fraction grows
  linearly in (1 + n_flip)/2^n_planes and the dial is a QUERY-TIME
  knob.

Part 1 — the 1x dial (sf0.1, 2000 vectors, 64 probe queries): mean
recall@5 vs the exact baseline, plus measured candidates/query, for
single-probe n_planes in {4,5,6,8} and multi-probe (6, t) / (8, t).
Equal-scan comparisons: single n_planes=4 scans 4/64 of the corpus,
exactly like multi-probe (6, t=3) — the table shows which spends those
candidates better.

Part 2 — the dial at scale on an honest fixture: the standard
``build_scaled`` corpus REPLICATES vectors, which is why q85's 64x
recall read 1.0 (disclosed as an artifact in SCALE.md).  Here a 16x
JITTERED corpus is built instead: copy i of a vector gets deterministic
per-component noise (xxhash64-derived, zero Python on the data path)
sized so cosine(original, copy) ≈ 0.98–0.99 — each query's true
neighbors are near-twins that may legitimately land across a bucket
boundary, which is precisely the failure mode multi-probe exists to
repair.  Recall measured on this fixture is an index-quality number,
not a fixture echo.

Candidate counts are exact (engine-independent aggregates); wall
clocks are single-session indicative, not octave-grade — the octave
harness (octave_vector.py) owns wall measurement for this family.

Usage: python tools/recall_dial.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bricolage_spark.operators import similarity as S  # noqa: E402
from bricolage_spark.session import get_spark  # noqa: E402

PROBE_DIR = os.path.join(REPO, ".scale_probe")
N_QUERIES = 64
K = 5


def build_jittered(spark, sf_dir: str, copies: int, eps: float = 0.15) -> str:
    """Write a jittered x{copies} embedding corpus (idempotent).

    Copy 0 is the base corpus verbatim; copy i>0 adds per-component
    noise eps * u * ||v|| / sqrt(dims) with u = xxhash64-uniform in
    [-1, 1]; u's variance is eps^2/3, so E[cosine(v, v')] =
    1/sqrt(1+eps^2/3) (measured 0.9963 at 0.15 — the r13 text's
    "~0.989" used unit-variance u). Every base vector gains (copies-1)
    true near-twins whose SRP signatures differ by a few low-margin
    bits.
    """
    out = os.path.join(PROBE_DIR, f"jitter{copies}x_eps{eps}")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dims = len(emb.select("embedding").first()["embedding"])
    parts = []
    for i in range(copies):
        off = F.lit(i * 10_000_000)
        if i == 0:
            parts.append(
                emb.select((F.col("vec_id") + off).alias("vec_id"), "embedding")
            )
            continue
        v = F.col("embedding").cast("array<double>")
        nrm = F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        scale = F.lit(eps) / F.lit(float(dims) ** 0.5) * nrm
        jittered = F.transform(
            v,
            lambda x, j: x
            + scale
            * (
                (
                    F.abs(
                        F.xxhash64(F.col("vec_id"), F.lit(i), j, F.lit("jit"))
                    )
                    % 2_000_001
                ).cast("double")
                / F.lit(1_000_000.0)
                - F.lit(1.0)
            ),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                jittered.cast("array<float>").alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionAll(p)
    df.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def measure(spark, emb, queries, n_corpus: int, configs) -> list[dict]:
    exact = S.brute_force_cosine_topk(emb, queries, k=K)
    exact.persist().count()
    rows = []
    for label, n_planes, n_flip in configs:
        t0 = time.perf_counter()
        approx = S.lsh_multiprobe_topk(
            emb, queries, k=K, n_planes=n_planes, n_flip=n_flip
        )
        rec = (
            S.ann_recall(exact, approx, K)
            .agg(F.round(F.avg("recall"), 4).alias("r"))
            .collect()[0]["r"]
        )
        wall = time.perf_counter() - t0
        # exact candidate count: corpus bucket sizes summed over each
        # query's probe set (the join's pre-rank row volume)
        c = emb.select(S.srp_bucket("embedding", n_planes).alias("bucket"))
        q0 = queries.select(
            S.srp_bucket("embedding", n_planes).alias("_b"),
            S.srp_margins("embedding", n_planes).alias("_m"),
        )
        q = q0.select(
            F.explode(
                F.expr(
                    f"concat(array(_b), transform(slice(_m, 1, {n_flip}), "
                    "s -> _b ^ shiftleft(CAST(1 AS BIGINT), s.p)))"
                )
            ).alias("bucket")
        )
        n_cand = c.join(q, "bucket").count()
        cand_per_q = n_cand / N_QUERIES
        rows.append(
            {
                "config": label,
                "n_planes": n_planes,
                "n_flip": n_flip,
                "recall_at_5": rec,
                "cand_per_query": round(cand_per_q, 1),
                "scanned_frac": round(cand_per_q / n_corpus, 4),
                "wall_s": round(wall, 2),
            }
        )
        print(
            f"  {label:22s} recall@5={rec:<7} cand/q={cand_per_q:8.1f} "
            f"frac={cand_per_q / n_corpus:.4f} wall={wall:.2f}s",
            flush=True,
        )
    exact.unpersist()
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark("recall_dial")
    out: dict = {"sf_dir": args.sf_dir, "k": K, "n_queries": N_QUERIES}

    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    print(f"== part 1: 1x dial ({n} vectors) ==", flush=True)
    configs = [
        ("single np=4", 4, 0),
        ("single np=5", 5, 0),
        ("single np=6", 6, 0),
        ("single np=8", 8, 0),
        ("multi  np=6 t=1", 6, 1),
        ("multi  np=6 t=2", 6, 2),
        ("multi  np=6 t=3", 6, 3),
        ("multi  np=6 t=6", 6, 6),
        ("multi  np=8 t=2", 8, 2),
        ("multi  np=8 t=4", 8, 4),
        ("multi  np=8 t=8", 8, 8),
    ]
    out["dial_1x"] = measure(spark, emb, queries, n, configs)

    print(f"== part 2: jittered {args.copies}x fixture ==", flush=True)
    jdir = build_jittered(spark, args.sf_dir, args.copies)
    jemb = spark.read.parquet(os.path.join(jdir, "embeddings.parquet"))
    jn = jemb.count()
    jqueries = jemb.filter(F.col("vec_id") < N_QUERIES)  # base copies only
    print(f"   corpus {jn} vectors ({jdir})", flush=True)
    jconfigs = [
        ("single np=6", 6, 0),
        ("single np=8", 8, 0),
        ("multi  np=8 t=2", 8, 2),
        ("multi  np=8 t=4", 8, 4),
        ("multi  np=8 t=8", 8, 8),
    ]
    out["dial_jittered"] = {"copies": args.copies, "n_corpus": jn}
    out["dial_jittered"]["rows"] = measure(spark, jemb, jqueries, jn, jconfigs)

    suffix = "" if args.copies == 16 else f"_{args.copies}x"
    path = os.path.join(REPO, "tools", f"recall_dial_r13{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
