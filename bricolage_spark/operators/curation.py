"""Corpus-curation composites: pick the best document per near-dup
cluster, and cap per-domain document counts.

These are the decision stages that sit after dedup/quality scoring in a
training-data pipeline: clustering says *which docs are the same*,
quality says *which are good* — these operators turn that into the
keep/drop verdicts a 100 TB curation run actually writes out.

Both are window-over-small-groups shapes: near-dup clusters are a few
docs each, and a per-domain cap only needs ranks up to the cap. One
shuffle each, partitioned by the group key; no corpus-wide window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cluster_representatives(
    components: DataFrame,
    quality: DataFrame,
    *,
    id_col: str = "id",
    comp_col: str = "component",
    quality_id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """Per near-dup cluster, keep the highest-quality member.

    ``components``: (id, component) as produced by
    :func:`bricolage_spark.operators.graph.connected_components`.
    ``quality``: per-doc scores, e.g. ``textual.quality_score`` output.

    Returns (component, n_members, keep_id, best_quality, n_dropped).
    Deterministic: quality desc, then doc_id asc breaks ties. The join is
    id-to-id (hash join on the doc key); the window partitions by
    component — cluster sizes are small quasi-cliques, so no skewed
    partition at scale.
    """
    joined = components.select(
        F.col(id_col).alias("_id"), F.col(comp_col).alias("component")
    ).join(
        quality.select(
            F.col(quality_id_col).alias("_id"),
            F.col(quality_col).alias("_q"),
        ),
        "_id",
    )
    wp = Window.partitionBy("component")
    wr = wp.orderBy(F.desc("_q"), F.asc("_id"))
    return (
        joined.withColumn("rn", F.row_number().over(wr))
        .withColumn("n_members", F.count(F.lit(1)).over(wp))
        .filter(F.col("rn") == 1)
        .select(
            F.col("component").cast("bigint").alias("component"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("_id").cast("bigint").alias("keep_id"),
            F.col("_q").alias("best_quality"),
            (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
        )
    )


def domain_cap(
    docs_with_quality: DataFrame,
    *,
    group_col: str,
    id_col: str,
    quality_col: str = "quality",
    cap: int = 20,
) -> DataFrame:
    """Cap documents per domain/source, keeping the best ``cap`` by quality.

    Returns every input doc with its within-group rank and a keep verdict:
    (id, group, quality, rank_in_group, kept). Ranking is quality desc
    with doc-id tie-break (deterministic across engines).

    Scale note: ranks only matter up to ``cap``; a skewed mega-domain pays
    a sort of its own partition. At extreme skew, pre-aggregate a
    per-group quality threshold on a sample and pre-filter before the
    window — same output for rows below the cap boundary.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return docs_with_quality.select(
        F.col(id_col),
        F.col(group_col),
        F.col(quality_col),
        F.row_number().over(w).cast("bigint").alias("rank_in_group"),
    ).withColumn("kept", F.col("rank_in_group") <= cap)


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping word-window chunks (RAG/context
    prep): (id, chunk_id, n_words_chunk, chunk_text).

    Chunk i covers words [i·stride, i·stride + window); the last chunk is
    the first one whose window reaches the end of the document (no empty
    trailing chunks, every word covered, short docs yield one chunk).

    Scale shape: a row-local ``sequence → transform → explode`` — output
    rows ≈ tokens/stride, each built from the in-row word array with no
    shuffle; chunking happens inside the scan stage and the chunk frame
    inherits the input partitioning (append chunk files per input split).
    """
    from bricolage_spark.operators.dedup import normalize_text

    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    # number of chunks: 1 + ceil(max(n - window, 0) / stride)
    n_chunks = 1 + F.ceil(
        F.greatest(n - window, F.lit(0)) / F.lit(stride)
    ).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx, lambda i: F.slice(words, i * stride + 1, window)
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "_w"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size("_w").cast("bigint").alias("n_words_chunk"),
        F.concat_ws(" ", "_w").alias("chunk_text"),
    )


def write_packed_shards(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str,
    text_col: str,
    group_col: str,
    budget: int = 2048,
    sep: str = "\n\n",
    token_col: Column | None = None,
) -> DataFrame:
    """Materialize sequence-packed training shards: concatenate documents
    into ~``budget``-token rows and write them partitioned by group.

    The write stage of the packing pipeline (q54 plans the bins; this
    emits them): documents are binned per group by a running token-budget
    sum in deterministic id order, each bin concatenates its members into
    one training row, and the shard table lands partitioned by group so
    a loader reads one directory per language/source.

    Returns the written frame (group, bin_id, n_docs, n_tokens, text).

    Scale shape: the running sum windows PER GROUP (never a global
    order), the concat is one ``array_agg``-style aggregation per bin
    (bins are budget-bounded, so rows stay small), and ``partitionBy``
    on the write maps each group to its own output directory — the
    standard shard layout. Deterministic: same input → same shards.

    ``token_col``: the per-doc token statistic to budget on. Default is
    the ceil(chars/4) estimator; pass ``bpe_symbol_count`` of a
    bpe-encoded column (textual.py, q102) to pack on REAL token counts.
    """
    tokens = (
        token_col.cast("bigint")
        if token_col is not None
        else F.ceil(F.length(F.col(text_col)) / 4.0).cast("bigint")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.col(text_col),
        tokens.alias("_tok"),
    ).withColumn(
        "bin_id",
        F.floor((F.sum("_tok").over(w) - F.col("_tok")) / budget).cast("bigint"),
    )
    # array_sort on (id, text) structs gives deterministic concat order
    # regardless of shuffle arrival order; transform extracts the text
    packed = (
        binned.groupBy(group_col, "bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_tok").cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                sep,
            ).alias("text"),
        )
    )
    packed.write.mode("overwrite").partitionBy(group_col).parquet(out_dir)
    return packed


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    seed: int = 4242,
) -> DataFrame:
    """Temperature-based source mixing: per-group sampling rates
    proportional to count^alpha (the multilingual/multi-source training
    mix recipe — alpha < 1 upweights small sources relative to their raw
    share), applied as a DETERMINISTIC md5-bucket filter.

    Returns the per-group mix summary: (group, n_docs, weight, rate,
    n_sampled). ``weight`` is the group's normalized count^alpha share;
    ``rate = min(1, weight * target_frac * N / n_docs)``. All rates are
    derived from the group-count table — |groups| rows of metadata — and
    the sample filter is row-local on a hash bucket, so at 100 TB the
    plan is: one count aggregation, a |groups|-row weight computation
    with a broadcast total, one broadcast join of rates back onto the
    corpus, one row-local filter. No RNG: reruns and other engines
    select the identical sample.

    ADJUDICATION (r16): the two corpus passes are inherent and measured
    cheapest. The rates depend on the GLOBAL count table (z = Σ n^α), so
    the sample-count pass cannot start until the count pass finishes —
    the only single-pass alternative is a per-(group, hash-bucket)
    histogram (bounded at 1e6·|groups| rows) joined to the rate table
    afterwards. Measured at sf0.1 (best-of-5 × 2 rounds, noop sink,
    results asserted identical): two-scan 0.87/0.51 s vs histogram
    0.89/0.61 s — the histogram's aggregation state costs more than the
    second column-pruned scan, locally and at scale (the scan reads two
    columns; the histogram shuffles up to 1e6 rows per group and holds
    that state in every map task). Closed like q03/q26b: the losing
    number is the record.
    """
    from bricolage_spark.operators.dedup import hash32

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(alpha))).alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col(group_col),
            F.col("n_docs"),
            F.round(
                F.pow(F.col("n_docs").cast("double"), F.lit(alpha)) / F.col("z"),
                12,
            ).alias("_w"),
            F.col("n_total"),
        )
        .select(
            F.col(group_col),
            F.col("n_docs"),
            F.col("_w"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.col("_w")
                    * F.lit(target_frac)
                    * F.col("n_total").cast("double")
                    / F.col("n_docs").cast("double"),
                ),
                6,
            ).alias("rate"),
        )
    )
    bucket = F.pmod(hash32(F.col(id_col).cast("string"), seed), F.lit(1000000))
    sampled = (
        df.join(F.broadcast(rates.select(group_col, "rate")), group_col)
        .where(bucket < F.col("rate") * 1000000)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(sampled, group_col, "left")
        .select(
            F.col(group_col),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("_w", 6).alias("weight"),
            F.col("rate"),
            F.coalesce(F.col("n_sampled"), F.lit(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
    )


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: int = 7171,
) -> DataFrame:
    """Deterministic training-order assignment: (id, shard_id, sort_key).

    The global-shuffle step before sequence packing: shard by hash (even
    load regardless of ingest order or source skew), order within a
    shard by an independent hash key. Purely row-local — the ORDER
    ITSELF is never materialized as a rank (a row_number per shard would
    put a whole shard through one window task at 100 TB); readers sort
    each shard's partition lazily, which parquet/iceberg writers do as a
    local sortWithinPartitions.
    """
    from bricolage_spark.operators.dedup import hash32

    sid = F.col(id_col).cast("string")
    return df.select(
        F.col(id_col),
        F.pmod(hash32(sid, seed), F.lit(n_shards)).cast("bigint").alias("shard_id"),
        F.md5(F.concat_ws("|", F.lit(str(seed + 1)), sid)).alias("sort_key"),
    )


def assign_eval_split(
    df: DataFrame,
    text_col: str,
    *,
    seed: int = 424242,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Append a deterministic train/val/test assignment keyed by the
    CONTENT digest (q106's rule) — not the doc id, so byte-identical
    documents can never straddle splits (id-keyed splits leak every
    duplicate pair across the train/test boundary; content-identity
    keying is the standard guard). Pure row-local hash arithmetic: zero
    shuffle, stable across re-runs and re-crawls of the same text.

    NULL-``text_col`` rows get a NULL ``split`` (they have no content
    identity to key on): silently bucketing them into train would
    co-train unidentifiable bytes, and dropping them here would hide a
    feed problem — the caller decides (the ``eval-split`` job class
    reports the count). Existing split/split_bucket columns are
    overwritten (withColumn semantics), so re-splitting a staged table
    never duplicates columns.
    """
    from bricolage_spark.operators.dedup import content_hash, hash32

    if val_pct < 0 or test_pct < 0 or val_pct + test_pct >= 100:
        raise ValueError(
            f"eval split percentages out of range: val={val_pct} test={test_pct}"
        )
    bucket = hash32(content_hash(F.col(text_col)), seed) % 100
    split = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split).withColumn(
        "split_bucket",
        F.when(F.col(text_col).isNotNull(), bucket).cast("bigint"),
    )


def split_leakage_report(
    pairs: DataFrame,
    splits: DataFrame,
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
    a_col: str = "id_a",
    b_col: str = "id_b",
    jaccard_col: str = "jaccard",
) -> DataFrame:
    """The split-leakage audit aggregate (q107): join a verified
    near-dup pair table against a split assignment and count pairs per
    unordered (split, split) cell — cross-split rows are the
    benchmark-inflating leaks exact-content split keying cannot see.

    Pair-table-scale: |pairs| rows through two id-keyed joins and a
    ≤9-cell aggregate; at 100 TB the pair table is smaller than the
    corpus by orders of magnitude and the split side projects to
    (id, split) before joining. Returns (split_a, split_b, n_pairs,
    n_leaking, avg_jaccard) with split_a <= split_b.

    A NULL split (eval-split's contract for NULL-text rows) maps to the
    label ``unsplit`` BEFORE the cell assignment: Spark's least/greatest
    skip NULLs, which would silently fold a pair with one unsplit side
    into a same-split cell and let it past a zero-tolerance gate. A
    near-dup pair touching an unassigned doc — EITHER side, including
    both — is at best unknown and counts as leaking: ``n_leaking``
    covers cross-split cells and every ``unsplit`` cell, so the
    (unsplit, unsplit) diagonal cannot hide from the gate either
    (round-9 review, second pass).
    """
    sp = splits.select(
        F.col(id_col),
        F.coalesce(F.col(split_col), F.lit("unsplit")).alias(split_col),
    )
    j = (
        pairs.join(
            sp.select(
                F.col(id_col).alias(a_col), F.col(split_col).alias("_sa")
            ),
            a_col,
        )
        .join(
            sp.select(
                F.col(id_col).alias(b_col), F.col(split_col).alias("_sb")
            ),
            b_col,
        )
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
            F.col(jaccard_col).alias("_j"),
        )
    )
    leaking = (F.col("split_a") != F.col("split_b")) | (
        F.col("split_b") == "unsplit"
    )
    return j.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.when(leaking, 1).otherwise(0)).cast("bigint").alias("n_leaking"),
        F.round(F.avg("_j"), 4).alias("avg_jaccard"),
    )


def unimax_plan(
    df: DataFrame,
    group_col: str,
    token_col: Column,
    *,
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICML 2023): distribute a
    token budget across sources as UNIFORMLY as possible, capping every
    source at ``max_epochs`` repetitions — the published alternative to
    temperature sampling (:func:`epoch_plan`) that removes the
    tail-over-repetition failure mode: temperature weights can silently
    plan 20 epochs of a tiny source, UniMax by construction never plans
    past the cap.

    Water-filling, integer-exact so Spark and DuckDB agree to the bit
    (no floating-point level that ULP drift could tip across a cap):

    - capacity_i = floor(n_tokens_i * max_epochs) (BIGINT; the product
      is exact in a double far past any real corpus size);
    - source i is SATURATED (gets its full capacity) iff filling every
      source to at most capacity_i cannot exhaust the budget:
      S_i + capacity_i * G_i <= B, where S_i = Σ capacity_j over
      capacity_j <= capacity_i and G_i = #{capacity_j > capacity_i} —
      all BIGINT sums;
    - every unsaturated source gets the same level
      L = (B − Σ_saturated capacity) div #unsaturated (integer
      division; both operands provably non-negative). The division
      remainder (< #unsaturated tokens) is left unallocated, so
      Σ target <= B is an integer-inequality guarantee, same
      never-over-allocate contract as :func:`epoch_plan`'s truncation.

    The saturation stats come from a |sources|² conditional aggregate
    over the GROUPED table (a broadcast nested-loop of metadata rows —
    thousands of sources is nothing; the corpus is touched exactly once
    by the groupBy). No window, so nothing funnels through one task at
    any |sources|. Scope note: mixture plans are written over NAMED
    sources (tens to thousands of rows — the data-card granularity); if
    someone points this at per-domain groups in the millions, the
    |sources|² aggregate is the term to replace — the same closed form
    follows from a capacity-sorted prefix sum (one sort + window over
    the grouped table), at the cost of re-introducing an ordered pass. Zero-token sources have capacity 0, are saturated by
    construction, and plan to 0 — never a 0/0 (the Spark-NULL vs
    DuckDB-NaN trap q108 pre-empted). Returns (group, n_docs, n_tokens,
    capacity, target_tokens, epochs, saturated).
    """
    b_lit = F.lit(int(budget_tokens)).cast("bigint")
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
    c = counts.withColumn(
        "capacity",
        F.floor(F.col("n_tokens").cast("double") * F.lit(float(max_epochs)))
        .cast("bigint"),
    )
    other = c.select(F.col("capacity").alias("_capb"))
    st = (
        c.select(group_col, "capacity")
        .crossJoin(F.broadcast(other))
        .groupBy(group_col, "capacity")
        .agg(
            F.sum(
                F.when(F.col("_capb") <= F.col("capacity"), F.col("_capb"))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("_S"),
            F.sum(
                F.when(F.col("_capb") > F.col("capacity"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("_G"),
        )
    )
    flagged = st.select(
        group_col,
        ((F.col("_S") + F.col("capacity") * F.col("_G")) <= b_lit).alias(
            "saturated"
        ),
    )
    j = c.join(flagged, group_col)
    glob = j.agg(
        F.sum(F.when(F.col("saturated"), F.col("capacity")).otherwise(0))
        .cast("bigint")
        .alias("_SS"),
        F.sum(F.when(~F.col("saturated"), 1).otherwise(0))
        .cast("bigint")
        .alias("_NU"),
    )
    # nullif guard: when every source is saturated (_NU = 0) the level
    # branch is never TAKEN, but under ANSI mode a DIV 0 would error if
    # it were ever evaluated — NULL-division is inert either way
    level = F.expr("( _B - _SS ) DIV nullif(_NU, 0)")
    plan = (
        j.crossJoin(F.broadcast(glob))
        .withColumn("_B", b_lit)
        .withColumn(
            "target_tokens",
            F.when(F.col("saturated"), F.col("capacity")).otherwise(level)
            .cast("bigint"),
        )
    )
    epochs_raw = F.when(
        F.col("n_tokens") > 0,
        F.col("target_tokens").cast("double") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return plan.select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        "capacity",
        "target_tokens",
        F.round(epochs_raw, 4).alias("epochs"),
        "saturated",
    )


def epoch_plan(
    df: DataFrame,
    group_col: str,
    token_col: Column,
    *,
    budget_tokens: int,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Token-budget epoch planning — the "how many epochs of each source
    at this budget" table a pretraining run fixes before launch (the
    data-card companion of :func:`temperature_mixture`): per source, the
    available token mass, its temperature weight (tokens^alpha / Σ,
    alpha < 1 upweights small sources), the token target the budget
    allocates, the implied epoch count, and an ``oversampled`` flag when
    the plan repeats a source past ``max_epochs`` (the repetition-harm
    threshold the mixture literature warns on — a flagged source needs
    more data or a smaller share, not silent extra epochs).

    Numeric discipline extends q84's oracle-pinned pattern: the raw
    weight is truncated to 12 decimals FIRST — floor(w·10¹²)/10¹², a
    DOWNWARD grid snap, not HALF_UP — and every derived column (floor
    target, epochs, flag) computes from that snapped value. Downward
    matters at production budgets: HALF_UP can push each weight up by
    5e-13, so Σw could exceed 1 by k·5e-13 and a 10¹²-token budget would
    over-allocate by thousands of tokens; truncation keeps Σw ≤ Σraw ≈ 1
    (± k ULP), so Σ floor(w·B) ≤ B holds as an integer inequality for
    any real budget (round-9 review finding; the property test drives
    budgets to 10¹³). The grid snap also keeps engine-to-engine pow/sum
    ULP drift from flipping a floor or a flag, same as q84's rounding.
    Zero-token sources (all-empty docs) get weight/target/epochs 0 and
    ``oversampled`` false — never a 0/0, which Spark's non-ANSI division
    turns into NULL while DuckDB makes it NaN (> any threshold).
    One corpus aggregation; everything after is |sources| rows of
    metadata with a broadcast total — nothing here grows with 100 TB.
    """
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("n_tokens"),
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("z")
    )
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("z")
    w12 = F.when(
        F.col("z") > 0, F.floor(raw * F.lit(1e12)) / F.lit(1e12)
    ).otherwise(F.lit(0.0))
    plan = counts.crossJoin(F.broadcast(tot)).select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        w12.alias("_w"),
    )
    target = F.floor(F.col("_w") * F.lit(float(budget_tokens))).cast("bigint")
    plan = plan.select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        F.round(F.col("_w"), 6).alias("weight"),
        target.alias("target_tokens"),
    )
    epochs_raw = F.when(
        F.col("n_tokens") > 0,
        F.col("target_tokens").cast("double") / F.col("n_tokens").cast("double"),
    ).otherwise(F.lit(0.0))
    return plan.select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        "weight",
        "target_tokens",
        F.round(epochs_raw, 4).alias("epochs"),
        (epochs_raw > F.lit(max_epochs)).alias("oversampled"),
    )
