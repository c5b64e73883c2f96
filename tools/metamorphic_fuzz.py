"""Metamorphic fuzzing of the §2.7 documents/embeddings operator surface.

`tools/diff_fuzz.py` randomizes the RELATIONAL core (Spark vs DuckDB on
identical SQL), but no randomized probe touched the curation operators —
the r13 verdict's ask #4. SQL differential testing doesn't fit here (the
operators are compositions, not single statements), so this tool checks
METAMORPHIC properties instead: algebraic identities that must hold for
every input, evaluated on seeded random corpora with controlled duplicate
structure (exact-duplicate groups, word-edit near-duplicates, NULL text
and NULL id rows).

Properties (each checks the operator family behind specific inventory
rows — the round-14 rotation clips those rows' driver slots against
exactly this new independent surface):

- P1 dedup idempotence (q31/q67 family, operators/dedup.py): running
  ``incremental_dedup`` on its own novel output against its own digest
  registry admits NOTHING, and re-deduping the novel set from scratch
  returns it unchanged.
- P2 permutation invariance (q31/q61/q70/q106 families): shuffling input
  row order (content-hash sort + repartition) changes no result SET —
  exact_dedup groups, LSH candidate pairs, per-doc split assignment,
  length histogram.
- P3 near-dedup idempotence (q50/q61 family): after keeping one
  representative per LSH-verified connected component, re-running the
  WHOLE pipeline (shingle → MinHash → banding → exact-Jaccard verify)
  on the survivors finds zero verified pairs. Holds because the
  pipeline is deterministic on content: any surviving pair that would
  verify now would have verified before and shared a component.
- P4 split content-keying + subset stability (q106 family,
  operators/curation.py): byte-identical texts never straddle splits,
  and a doc's split is unchanged when the rest of the corpus is
  dropped (pure row-local hash — no corpus-composition dependence).
- P5 registry order invariance (q67 family): the novel set of a batch
  against a registry is invariant to row order of BOTH sides, and
  batch-internal duplicates resolve to the min-id representative
  regardless of order.
- P10-P13 (round 15) extend the surface to the ANN/similarity family —
  the one §2.7 family with no randomized probe through r14 (r14 verdict
  ask #4): SRP bucket/margins as content functions, multi-probe
  determinism + n_flip=0 degeneracy + probe monotonicity (q113/q114),
  exhaustive-probe equivalence to the exact brute force (at n_planes=2
  the 1+2+1 probe set covers ALL buckets, so the candidate set is the
  whole corpus and the top-k must EQUAL q35's), and IVF assignment
  invariance at fixed centroids (q49/q68).
- P14-P15 (round 15) cover the last two §2.7 families with no
  randomized probe: the graph kernel (connected_components on random
  graphs with KNOWN group structure — exact labeling, edge order +
  direction invariance, star-implementation agreement, and a
  45-node-path group whose diameter forces the max_iter star-fallback
  handover every seed) and the BPE trainer/encoder (merge-sequence
  corpus-order invariance, driver-tier == distributed-tier merges,
  encode as a content function, merge-prefix token-count monotonicity).

Usage:
    python tools/metamorphic_fuzz.py [--n 40] [--seed0 0]
Exit code 1 if any (seed, property) fails; each failure prints the seed,
the property, and the divergence. Pinned regression seeds run in
tests/test_metamorphic_fuzz.py.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_WORDS = (
    "data spark engine corpus token shard batch query plan join filter "
    "window stream graph vector bucket probe margin sketch sample split "
    "quality language source digest anchor span band hash merge scan"
).split()
_LANGS = ["en", "es", "de", "fr"]
_SOURCES = ["web", "wiki", "code", "news"]


def gen_corpus(seed: int) -> list[tuple]:
    """Seeded corpus with controlled duplicate structure.

    ~60 unique base docs; ~15 exact-duplicate clones (same text, new id);
    ~15 near-duplicate clones (1-2 word edits); 2 NULL-text rows and one
    NULL-id row (the incremental_dedup contract drops both explicitly).
    Returns rows (doc_id, text, lang, source).
    """
    rng = random.Random(seed)
    rows: list[tuple] = []
    next_id = 0

    def add(text, lang=None, source=None):
        nonlocal next_id
        rows.append(
            (
                next_id,
                text,
                lang or rng.choice(_LANGS),
                source or rng.choice(_SOURCES),
            )
        )
        next_id += 1

    base = []
    for _ in range(60):
        n = rng.randint(6, 30)
        text = " ".join(rng.choice(_WORDS) for _ in range(n))
        base.append(text)
        add(text)
    for _ in range(15):  # exact duplicates
        add(rng.choice(base))
    for _ in range(15):  # near duplicates: edit 1-2 words
        words = rng.choice(base).split()
        for _ in range(rng.randint(1, 2)):
            words[rng.randrange(len(words))] = rng.choice(_WORDS)
        add(" ".join(words))
    add(None)
    add(None)
    rows.append((None, " ".join(rng.choice(_WORDS) for _ in range(8)),
                 rng.choice(_LANGS), rng.choice(_SOURCES)))
    rng.shuffle(rows)
    return rows


def make_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def shuffled(df: DataFrame, seed: int, key: str = "doc_id") -> DataFrame:
    """Same rows, different physical order and partitioning."""
    return (
        df.withColumn("_o", F.xxhash64(F.col(key), F.lit(seed)))
        .orderBy("_o")
        .drop("_o")
        .repartition(7)
    )


def rowset(df: DataFrame) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


# --------------------------------------------------------------------------
# properties: fn(spark, seed) -> None (pass) | str (failure message)
# --------------------------------------------------------------------------


def p1_dedup_idempotence(spark: SparkSession, seed: int) -> str | None:
    from bricolage_spark.operators.dedup import incremental_dedup

    df = make_df(spark, gen_corpus(seed))
    novel, digests = incremental_dedup(df, None, "doc_id", "text")
    novel = novel.localCheckpoint(eager=True)
    again, _ = incremental_dedup(novel, digests, "doc_id", "text")
    n = again.count()
    if n:
        return f"P1: re-dedup vs own registry admitted {n} rows (want 0)"
    fresh, _ = incremental_dedup(novel, None, "doc_id", "text")
    a, b = rowset(novel), rowset(fresh)
    if a != b:
        return f"P1: novel set not a fixpoint: {len(a ^ b)} rows differ"
    return None


def p2_permutation_invariance(spark: SparkSession, seed: int) -> str | None:
    from bricolage_spark.operators.curation import assign_eval_split
    from bricolage_spark.operators.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from bricolage_spark.operators.textual import length_histogram

    df = make_df(spark, gen_corpus(seed))
    alt = shuffled(df, seed)
    checks = []
    checks.append(
        ("exact_dedup", exact_dedup(df, "doc_id", "text"),
         exact_dedup(alt, "doc_id", "text"))
    )
    nn = df.filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
    an = alt.filter(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
    sig = minhash_signatures(word_shingles(nn, "doc_id", "text"), "doc_id")
    sig2 = minhash_signatures(word_shingles(an, "doc_id", "text"), "doc_id")
    checks.append(
        ("lsh_pairs",
         lsh_candidate_pairs(sig, "doc_id", bands=8, rows_per_band=2),
         lsh_candidate_pairs(sig2, "doc_id", bands=8, rows_per_band=2))
    )
    checks.append(
        ("eval_split",
         assign_eval_split(nn, "text").select("doc_id", "split", "split_bucket"),
         assign_eval_split(an, "text").select("doc_id", "split", "split_bucket"))
    )
    est = F.ceil(F.length("text") / 4.0).cast("bigint")
    checks.append(
        ("length_histogram", length_histogram(nn, est, "lang"),
         length_histogram(an, est, "lang"))
    )
    for name, x, y in checks:
        a, b = rowset(x), rowset(y)
        if a != b:
            return f"P2: {name} not order-invariant: {len(a ^ b)} rows differ"
    return None


def _verified(sh: DataFrame) -> DataFrame:
    from bricolage_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    sigs = minhash_signatures(sh, "doc_id", num_hashes=16)
    cand = lsh_candidate_pairs(sigs, "doc_id", bands=8, rows_per_band=2)
    return ngram_jaccard_pairs(sh, cand, id_col="doc_id").filter(
        F.col("jaccard") >= 0.5
    )


def p3_neardup_idempotence(spark: SparkSession, seed: int) -> str | None:
    from bricolage_spark.operators.dedup import word_shingles
    from bricolage_spark.operators.graph import connected_components

    df = make_df(spark, gen_corpus(seed)).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    sh = word_shingles(df, "doc_id", "text")
    pairs = _verified(sh).localCheckpoint(eager=True)
    if not pairs.take(1):
        return None  # no near-dups generated this seed; vacuous pass
    cc = connected_components(pairs, "id_a", "id_b")
    keep = cc.groupBy("component").agg(F.min("id").alias("doc_id"))
    drop = cc.join(keep, cc["id"] == keep["doc_id"], "left_anti").select(
        F.col("id").alias("doc_id")
    )
    survivors = df.join(drop, "doc_id", "left_anti")
    pairs2 = _verified(word_shingles(survivors, "doc_id", "text"))
    bad = pairs2.take(3)
    if bad:
        return f"P3: {len(bad)}+ verified pairs survive near-dedup: {bad}"
    return None


def p4_split_stability(spark: SparkSession, seed: int) -> str | None:
    from bricolage_spark.operators.curation import assign_eval_split

    # doc_id NULLs excluded: the subset check aligns rows BY id (a NULL id
    # passes the pmod filter but can never survive the semi-join — a
    # harness alignment artifact found at sweep seed 0, not an operator
    # property; content keying itself is id-agnostic)
    df = make_df(spark, gen_corpus(seed)).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    full = assign_eval_split(df, "text")
    straddle = (
        full.groupBy("text")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if straddle:
        return f"P4: {straddle} identical texts straddle splits"
    sub = df.filter(F.pmod(F.xxhash64("doc_id", F.lit(seed)), F.lit(3)) == 0)
    a = rowset(full.join(sub.select("doc_id"), "doc_id", "left_semi")
               .select("doc_id", "split"))
    b = rowset(assign_eval_split(sub, "text").select("doc_id", "split"))
    if a != b:
        return f"P4: split changed under corpus subsetting: {len(a ^ b)} rows"
    return None


def p5_registry_order_invariance(spark: SparkSession, seed: int) -> str | None:
    from bricolage_spark.operators.dedup import incremental_dedup

    rows = gen_corpus(seed)
    half = len(rows) // 2
    hist, batch = make_df(spark, rows[:half]), make_df(spark, rows[half:])
    _, registry = incremental_dedup(hist, None, "doc_id", "text")
    registry = registry.localCheckpoint(eager=True)
    a, _ = incremental_dedup(batch, registry, "doc_id", "text")
    b, _ = incremental_dedup(
        shuffled(batch, seed),
        shuffled(registry, seed, key="content_hash"),
        "doc_id",
        "text",
    )
    sa, sb = rowset(a), rowset(b)
    if sa != sb:
        return f"P5: novel set order-dependent: {len(sa ^ sb)} rows differ"
    return None


def p6_span_pipeline_order_invariance(spark: SparkSession, seed: int) -> str | None:
    """q74/q103 family: span DETECTION (duplicate_spans) and REMOVAL
    (remove_duplicate_spans) are content functions — both result sets
    must be invariant to input row order/partitioning. Toy-corpus
    params (anchor_len=4, min_span=6) so the 6-30-word docs and their
    clones actually produce spans (non-vacuity asserted)."""
    from bricolage_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    df = make_df(spark, gen_corpus(seed)).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    alt = shuffled(df, seed)
    kw = dict(anchor_len=4, min_span=6)
    s1 = duplicate_spans(df, "doc_id", "text", **kw)
    s2 = duplicate_spans(alt, "doc_id", "text", **kw)
    a, b = rowset(s1), rowset(s2)
    if a != b:
        return f"P6: duplicate_spans not order-invariant: {len(a ^ b)} rows"
    if not a:
        return "P6: vacuous — no spans detected (fixture should produce clones)"
    r1 = rowset(remove_duplicate_spans(df, s1, "doc_id", "text"))
    r2 = rowset(remove_duplicate_spans(alt, s2, "doc_id", "text"))
    if r1 != r2:
        return f"P6: remove_duplicate_spans not order-invariant: {len(r1 ^ r2)} rows"
    if not any(t[2] > 0 for t in r1):  # (id, n_words, n_removed, clean_text)
        return "P6: vacuous — removal stripped nothing despite detected spans"
    return None


def p7_simhash_content_function(spark: SparkSession, seed: int) -> str | None:
    """q34 family: simhash is a pure content function — byte-identical
    texts carry identical fingerprints, and the (id, simhash) set is
    row-order invariant (the +1/-1 per-bit sums are commutative)."""
    from bricolage_spark.operators.dedup import simhash

    df = make_df(spark, gen_corpus(seed)).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    sh = simhash(df, "doc_id", "text").localCheckpoint(eager=True)
    n = (
        df.select("doc_id", "text")
        .join(sh, "doc_id")
        .groupBy("text")
        .agg(F.countDistinct("simhash").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if n:
        return f"P7: {n} identical texts carry different simhashes"
    alt = rowset(simhash(shuffled(df, seed), "doc_id", "text"))
    if rowset(sh) != alt:
        return "P7: simhash set not order-invariant"
    return None


def p8_span_registry_probe_order_invariance(
    spark: SparkSession, seed: int
) -> str | None:
    """q110 family: the span-registry probe's flagged spans are a
    function of (batch content, registry content) — invariant to row
    order of BOTH sides. History = first half of the corpus, batch =
    second half (clone structure guarantees cross-half hits;
    non-vacuity asserted)."""
    from bricolage_spark.operators.dedup import (
        positional_anchor_keys,
        span_registry_probe,
    )

    rows = [
        r for r in gen_corpus(seed) if r[0] is not None and r[1] is not None
    ]
    half = len(rows) // 2
    hist, batch = make_df(spark, rows[:half]), make_df(spark, rows[half:])
    k = 4
    reg = (
        positional_anchor_keys(hist, "doc_id", "text", k=k)
        .select("ahash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ba = positional_anchor_keys(batch, "doc_id", "text", k=k)
    a = rowset(span_registry_probe(ba, reg, "doc_id", anchor_len=k, min_span=6))
    ba2 = positional_anchor_keys(shuffled(batch, seed), "doc_id", "text", k=k)
    b = rowset(
        span_registry_probe(
            ba2, shuffled(reg, seed, key="ahash"), "doc_id",
            anchor_len=k, min_span=6,
        )
    )
    if a != b:
        return f"P8: probe not order-invariant: {len(a ^ b)} rows differ"
    if not a:
        return "P8: vacuous — no cross-half spans (fixture should produce clones)"
    return None


def p9_stream_batch_equivalence(spark: SparkSession, seed: int) -> str | None:
    """Structured Streaming's batch/stream unification, fuzzed (§2.3
    streaming rows): tumbling-window counts over a random OUT-OF-ORDER
    event stream, executed as a REAL file-source stream (availableNow
    micro-batches, complete-mode memory sink), must equal the batch
    groupBy over the same rows — and be invariant to how the rows are
    SPLIT into files (micro-batch boundaries are an execution detail,
    never a semantics knob). Values are multiples of 0.25 so float sums
    are exact in any accumulation order."""
    import json as _json
    import shutil
    import tempfile

    from bricolage_spark.streaming import windows as W

    rng = random.Random(seed * 31 + 7)
    rows = [
        {
            "event_id": i,
            "ts": f"2024-01-01T{rng.randint(0, 3):02d}:{rng.randint(0, 59):02d}:00",
            "user_id": rng.randint(1, 5),
            "event_type": rng.choice(["click", "view", "buy"]),
            "value": rng.randint(0, 40) * 0.25,
        }
        for i in range(rng.randint(40, 120))
    ]
    rng.shuffle(rows)  # out-of-order event time across micro-batches

    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    batch = spark.createDataFrame(
        [(r["event_id"], r["ts"].replace("T", " "), r["user_id"],
          r["event_type"], r["value"]) for r in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    expect = rowset(W.tumbling_counts(batch))

    def run_stream(n_files: int, tag: str) -> set:
        d = tempfile.mkdtemp(prefix=f"p9_{seed}_{tag}_")
        try:
            per = max(1, len(rows) // n_files)
            for fi in range(0, len(rows), per):
                with open(f"{d}/b{fi}.json", "w") as f:
                    for r in rows[fi : fi + per]:
                        f.write(_json.dumps(r) + "\n")
            name = f"p9_sink_{seed}_{tag}"
            q = (
                W.tumbling_counts(W.read_event_stream(spark, d, schema))
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", f"{d}/_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return rowset(spark.table(name))
        finally:
            shutil.rmtree(d, ignore_errors=True)

    one = run_stream(1, "one")
    if one != expect:
        return f"P9: single-file stream != batch: {len(one ^ expect)} rows"
    many = run_stream(4, "many")
    if many != expect:
        return f"P9: 4-file stream != batch: {len(many ^ expect)} rows"
    return None


_VEC_DIMS = 8  # small width: planes/centroids stay readable, runs stay fast


def gen_vectors(seed: int) -> list[tuple]:
    """Seeded embedding corpus: 40 unique gaussian vectors + 10 exact
    duplicates (same vector, new id), rounded to 6 dp so the duplicate
    structure survives any engine round-trip. Returns (vec_id, embedding).
    NULL embeddings are deliberately excluded — the NULL contract
    (bucket 0, score 0.0 guarded cosine) is pinned by dedicated unit
    tests and would break the P12 brute-force equivalence (explode drops
    a NULL probe row; the cross join keeps it)."""
    rng = random.Random(seed * 1_000_003 + 17)
    rows: list[tuple] = []
    base: list[list[float]] = []
    for i in range(40):
        v = [round(rng.gauss(0.0, 1.0), 6) for _ in range(_VEC_DIMS)]
        base.append(v)
        rows.append((i, v))
    for j in range(10):
        rows.append((40 + j, list(rng.choice(base))))
    rng.shuffle(rows)
    return rows


def make_vec_df(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _vec_queries(df: DataFrame) -> DataFrame:
    return df.filter(F.col("vec_id") % 5 == 0)


def p10_srp_content_function(spark: SparkSession, seed: int) -> str | None:
    """q36/q113 family: srp_bucket and srp_margins are pure content
    functions — byte-identical vectors carry identical buckets AND
    identical margin sequences, and the (id, bucket) set is row-order
    invariant."""
    from bricolage_spark.operators.similarity import srp_bucket, srp_margins

    df = make_vec_df(spark, gen_vectors(seed))
    lab = df.select(
        "vec_id",
        "embedding",
        srp_bucket("embedding", 6, _VEC_DIMS).alias("bucket"),
        srp_margins("embedding", 6, _VEC_DIMS).cast("string").alias("margins"),
    ).localCheckpoint(eager=True)
    n = (
        lab.groupBy("embedding")
        .agg(
            F.countDistinct("bucket").alias("nb"),
            F.countDistinct("margins").alias("nm"),
        )
        .filter((F.col("nb") > 1) | (F.col("nm") > 1))
        .count()
    )
    if n:
        return f"P10: {n} identical vectors got different buckets/margins"
    a = rowset(lab.select("vec_id", "bucket"))
    b = rowset(
        shuffled(df, seed, key="vec_id").select(
            "vec_id", srp_bucket("embedding", 6, _VEC_DIMS).alias("bucket")
        )
    )
    if a != b:
        return f"P10: bucket set not order-invariant: {len(a ^ b)} rows differ"
    return None


def p11_multiprobe_determinism(spark: SparkSession, seed: int) -> str | None:
    """q113/q114 family: (a) n_flip=0 degenerates EXACTLY to the
    single-probe operator; (b) the multi-probe result (pair probes on)
    is invariant to row order of corpus AND queries; (c) probe
    monotonicity — growing the probe set (0,0)->(2,0)->(2,2)->(6,6)
    only ever improves the rank-i similarity per query (candidates are
    supersets, and the shared top-k tail ranks identically)."""
    from bricolage_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
    )

    df = make_vec_df(spark, gen_vectors(seed))
    q = _vec_queries(df)
    kw = dict(k=5, n_planes=6, dims=_VEC_DIMS)
    base = rowset(lsh_bucketed_topk(df, q, **kw))
    degen = rowset(lsh_multiprobe_topk(df, q, n_flip=0, **kw))
    if base != degen:
        return f"P11: n_flip=0 != single-probe: {len(base ^ degen)} rows differ"
    full = lsh_multiprobe_topk(df, q, n_flip=2, n_flip2=2, **kw)
    alt = lsh_multiprobe_topk(
        shuffled(df, seed, key="vec_id"),
        shuffled(q, seed + 1, key="vec_id"),
        n_flip=2,
        n_flip2=2,
        **kw,
    )
    a, b = rowset(full), rowset(alt)
    if a != b:
        return f"P11: multiprobe not order-invariant: {len(a ^ b)} rows differ"
    ladder = [(0, 0), (2, 0), (2, 2), (6, 6)]
    prev: dict[tuple, float] = {}
    for f1, f2 in ladder:
        cur = {
            (r["query_id"], r["rank"]): r["cos_sim"]
            for r in lsh_multiprobe_topk(
                df, q, n_flip=f1, n_flip2=f2, **kw
            ).collect()
        }
        for key, sim in prev.items():
            if key in cur and cur[key] < sim - 1e-9:
                return (
                    f"P11: rank-{key[1]} sim for query {key[0]} DROPPED "
                    f"{sim} -> {cur[key]} when probes grew to {(f1, f2)}"
                )
            if key not in cur:
                return (
                    f"P11: (query {key[0]}, rank {key[1]}) vanished when "
                    f"probes grew to {(f1, f2)}"
                )
        prev = cur
    return None


def p12_exhaustive_probe_equals_brute_force(
    spark: SparkSession, seed: int
) -> str | None:
    """q35 vs q113/q114: at n_planes=2 the probe set 1 base + 2 single
    flips + 1 pair flip covers ALL 4 buckets, so every corpus vector is
    a candidate for every query and the multi-probe top-k must EQUAL
    the exact brute-force top-k row for row (both rank through the
    shared rounded-sim + id-tiebreak tail)."""
    from bricolage_spark.operators.similarity import (
        brute_force_cosine_topk,
        lsh_multiprobe_topk,
    )

    df = make_vec_df(spark, gen_vectors(seed))
    q = _vec_queries(df)
    exact = rowset(brute_force_cosine_topk(df, q, k=5))
    probed = rowset(
        lsh_multiprobe_topk(
            df, q, k=5, n_planes=2, n_flip=2, n_flip2=1, dims=_VEC_DIMS
        )
    )
    if exact != probed:
        return (
            f"P12: exhaustive probing != brute force: "
            f"{len(exact ^ probed)} rows differ"
        )
    if not exact:
        return "P12: vacuous — brute force returned no rows"
    return None


def p13_ivf_assignment_invariance(spark: SparkSession, seed: int) -> str | None:
    """q49/q68 family: at FIXED centroids, cell assignment is a pure
    row-local content function — invariant to corpus row order,
    identical for identical vectors, and the head of the nprobe
    sequence IS the assigned cell."""
    from bricolage_spark.operators.similarity import (
        ivf_cell,
        ivf_centroids,
        ivf_probe_cells,
    )

    df = make_vec_df(spark, gen_vectors(seed))
    cents = ivf_centroids(df, "vec_id", "embedding", k_cells=4)
    lab = df.select(
        "vec_id",
        "embedding",
        ivf_cell("embedding", cents).alias("cell"),
        F.element_at(ivf_probe_cells("embedding", cents, 2), 1).alias("head"),
    ).localCheckpoint(eager=True)
    n = (
        lab.groupBy("embedding")
        .agg(F.countDistinct("cell").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if n:
        return f"P13: {n} identical vectors assigned to different cells"
    bad = lab.filter(F.col("cell") != F.col("head")).count()
    if bad:
        return f"P13: {bad} rows where probe head != assigned cell"
    a = rowset(lab.select("vec_id", "cell"))
    b = rowset(
        shuffled(df, seed, key="vec_id").select(
            "vec_id", ivf_cell("embedding", cents).alias("cell")
        )
    )
    if a != b:
        return f"P13: assignment not order-invariant: {len(a ^ b)} rows differ"
    return None


def gen_graph(seed: int) -> tuple[list[tuple[int, int]], dict[int, int]]:
    """Seeded random graph with KNOWN components: ~6 disjoint groups
    (random spanning tree + extra intra-group edges, occasional
    self-loops and duplicate edges), one of them a LONG PATH (~45
    nodes) that exceeds connected_components' default max_iter=20 and
    so exercises the star-fallback handover. Node ids are drawn
    non-contiguously and the edge list shuffled. Returns
    (edges, expected: node_id -> min id of its group)."""
    rng = random.Random(seed * 7_777_777 + 3)
    ids = rng.sample(range(1, 100_000), 120)
    random.Random(seed).shuffle(ids)
    edges: list[tuple[int, int]] = []
    expected: dict[int, int] = {}
    cursor = 0

    def take(n: int) -> list[int]:
        nonlocal cursor
        grp = ids[cursor : cursor + n]
        cursor += n
        return grp

    groups = [take(rng.randint(2, 12)) for _ in range(5)]
    groups.append(take(45))  # the long path: diameter 44 > max_iter 20
    for gi, grp in enumerate(groups):
        lo = min(grp)
        for node in grp:
            expected[node] = lo
        if gi == len(groups) - 1:
            edges.extend(zip(grp, grp[1:]))  # pure path, no shortcuts
        else:
            for i, node in enumerate(grp[1:], 1):
                edges.append((node, grp[rng.randrange(i)]))  # spanning tree
            for _ in range(rng.randint(0, 4)):  # extra edges + noise
                a, b = rng.choice(grp), rng.choice(grp)
                edges.append((a, b))  # may be a self-loop or duplicate
    rng.shuffle(edges)
    return edges, expected


def p14_connected_components(spark: SparkSession, seed: int) -> str | None:
    """q50/q93 family graph kernel: connected_components on a random
    graph with KNOWN structure must (a) return exactly the expected
    (node, min-group-id) labeling — including through the star-fallback
    path the long-diameter group forces; (b) be invariant to edge-list
    row order AND per-edge direction flips; (c) agree with the
    independent O(log n) star implementation on the same edges."""
    from bricolage_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges, expected = gen_graph(seed)
    edf = spark.createDataFrame(edges, "id_a long, id_b long")
    got = rowset(connected_components(edf, "id_a", "id_b"))
    want = set(expected.items())
    if got != want:
        return f"P14: labeling wrong: {len(got ^ want)} rows differ"
    rng = random.Random(seed + 99)
    flipped = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]
    rng.shuffle(flipped)
    fdf = spark.createDataFrame(flipped, "id_a long, id_b long").repartition(5)
    if rowset(connected_components(fdf, "id_a", "id_b")) != want:
        return "P14: not invariant to edge order/direction"
    star = rowset(connected_components_star(edf, "id_a", "id_b"))
    if star != want:
        return f"P14: star implementation disagrees: {len(star ^ want)} rows"
    return None


def p15_bpe_trainer_encoder(spark: SparkSession, seed: int) -> str | None:
    """q95/q102/q104 family: (a) the learned merge sequence is invariant
    to corpus row order (word counts are commutative aggregates) and
    identical between the driver-tier and DISTRIBUTED trainer loops on
    the same corpus; (b) encode is a content function — identical texts
    carry identical (n_symbols, n_tokens, token_preview); (c) merge
    monotonicity — encoding with a PREFIX of the merge list never
    yields fewer tokens than the full list, n_tokens <= n_symbols, and
    n_merged >= 0 everywhere."""
    from bricolage_spark.operators.textual import bpe_encode, bpe_learn_merges

    df = make_df(spark, gen_corpus(seed)).filter(
        F.col("text").isNotNull() & F.col("doc_id").isNotNull()
    )
    kw = dict(n_merges=10)
    merges = bpe_learn_merges(df, "doc_id", "text", **kw)
    if bpe_learn_merges(shuffled(df, seed), "doc_id", "text", **kw) != merges:
        return "P15: merges depend on corpus row order"
    dist = bpe_learn_merges(df, "doc_id", "text", driver_vocab_max=0, **kw)
    if dist != merges:
        return (
            f"P15: distributed trainer diverges from driver tier: "
            f"{[m for m in merges if m not in dist][:3]}"
        )
    pairs = [(a, b) for (_, a, b, _) in merges]
    enc = bpe_encode(df, "doc_id", "text", pairs).localCheckpoint(eager=True)
    n = (
        df.select("doc_id", "text")
        .join(enc, "doc_id")
        .groupBy("text")
        .agg(
            F.countDistinct("n_tokens").alias("nt"),
            F.countDistinct("token_preview").alias("np"),
        )
        .filter((F.col("nt") > 1) | (F.col("np") > 1))
        .count()
    )
    if n:
        return f"P15: {n} identical texts encode differently"
    bad = enc.filter(
        (F.col("n_tokens") > F.col("n_symbols")) | (F.col("n_merged") < 0)
    ).count()
    if bad:
        return f"P15: {bad} rows violate n_tokens <= n_symbols"
    half = bpe_encode(df, "doc_id", "text", pairs[: len(pairs) // 2]).select(
        "doc_id", F.col("n_tokens").alias("half_tokens")
    )
    worse = (
        enc.join(half, "doc_id")
        .filter(F.col("half_tokens") < F.col("n_tokens"))
        .count()
    )
    if worse:
        return f"P15: {worse} rows got FEWER tokens from a merge prefix"
    return None


PROPERTIES = [
    p1_dedup_idempotence,
    p2_permutation_invariance,
    p3_neardup_idempotence,
    p4_split_stability,
    p5_registry_order_invariance,
    p6_span_pipeline_order_invariance,
    p7_simhash_content_function,
    p8_span_registry_probe_order_invariance,
    p9_stream_batch_equivalence,
    p10_srp_content_function,
    p11_multiprobe_determinism,
    p12_exhaustive_probe_equals_brute_force,
    p13_ivf_assignment_invariance,
    p14_connected_components,
    p15_bpe_trainer_encoder,
]


def run_seed(spark: SparkSession, seed: int, props=None) -> list[str]:
    fails = []
    for prop in props or PROPERTIES:
        msg = prop(spark, seed)
        if msg:
            fails.append(f"seed={seed} {prop.__name__}: {msg}")
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument(
        "--props",
        default="",
        help="comma-separated property-name prefixes to run (e.g. "
        "'p10,p11,p12,p13'); default: all",
    )
    args = ap.parse_args()
    props = PROPERTIES
    if args.props:
        want = [w.strip() for w in args.props.split(",") if w.strip()]
        props = [
            p for p in PROPERTIES
            if any(p.__name__.startswith(w) for w in want)
        ]
        if not props:
            ap.error(f"no property matches {args.props!r}")

    from bricolage_spark.session import get_spark

    spark = get_spark("metamorphic_fuzz")
    n_fail = 0
    for seed in range(args.seed0, args.seed0 + args.n):
        fails = run_seed(spark, seed, props)
        n_fail += len(fails)
        for msg in fails:
            print(f"FAIL {msg}")
        if not fails:
            print(f"ok seed {seed}", flush=True)
    print(f"{args.n} seeds x {len(props)} properties, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
