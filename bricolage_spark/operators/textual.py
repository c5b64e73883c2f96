"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprinting.

All pure Catalyst column expressions (regexp/length/array builtins) —
whole-stage codegen, zero Python on the data path, embarrassingly
partition-parallel. Each returns engine-independent values so the DuckDB
oracle can verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bricolage_spark.catalog import spread
from bricolage_spark.operators.dedup import hash32, normalize_text

# Distinctive high-frequency words per language (n-gram heuristic tier:
# function-word hit counting — standard trigram-free fallback).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "de", "que"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def _marker_hits(words: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (with multiplicity)."""
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def language_pred(text_col: str) -> Column:
    """Row-local predicted-language Column (argmax marker hits, ties →
    first language in the fixed order) — the single-expression form of
    :func:`detect_language` for pipelines that keep other columns of the
    same row (no join needed)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    langs = list(LANG_MARKERS)
    hits = {lang: _marker_hits(words, LANG_MARKERS[lang]) for lang in langs}
    best = F.lit(langs[0])
    best_hits = hits[langs[0]]
    for lang in langs[1:]:
        best = F.when(hits[lang] > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(hits[lang] > best_hits, hits[lang]).otherwise(best_hits)
    return best


def detect_language(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Heuristic language ID: argmax of marker-word hits (ties → 'en').

    Returns (id, pred_lang, marker_hits). Deterministic: language order is
    fixed, strict-greater comparison.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    cols = {
        lang: _marker_hits(words, marks).alias(f"hits_{lang}")
        for lang, marks in LANG_MARKERS.items()
    }
    scored = spread(df, id_col).select(F.col(id_col), *cols.values())
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cand = F.col(f"hits_{lang}")
        best = F.when(cand > best_hits, F.lit(lang)).otherwise(best)
        best_hits = F.when(cand > best_hits, cand).otherwise(best_hits)
    return scored.select(
        F.col(id_col),
        best.alias("pred_lang"),
        best_hits.cast("bigint").alias("marker_hits"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish subword estimate.

    (id, n_words, n_tokens_regex, n_tokens_bpe_est, n_chars):
    - n_words: whitespace split
    - n_tokens_regex: word-or-punct tokens (``\\w+|[^\\w\\s]``) — the
      GPT-2-style pre-tokenizer shape
    - n_tokens_bpe_est: ceil(chars/4) — the standard BPE budget estimate
    """
    t = F.col(text_col)
    norm = normalize_text(t)
    return df.select(
        F.col(id_col),
        F.size(F.split(norm, " ")).cast("bigint").alias("n_words"),
        F.regexp_count(t, F.lit(r"\w+|[^\w\s]")).cast("bigint").alias("n_tokens_regex"),
        F.ceil(F.length(t) / 4.0).cast("bigint").alias("n_tokens_bpe_est"),
        F.length(t).cast("bigint").alias("n_chars"),
    )


def quality_col(text_col: str) -> Column:
    """The row-local ``quality`` Column of :func:`quality_score`, exposed
    so a pipeline keeping other columns of the same row (q65's corpus
    report) can compute it in ONE corpus pass instead of deriving a
    second frame and joining it back (r15, guide §2.4)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(normalize_text(t), " ")
    n_words = F.size(words)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop = _marker_hits(words, LANG_MARKERS["en"])
    stop_ratio = F.round(stop / F.greatest(n_words, F.lit(1)), 4)
    len_sig = F.least(F.greatest((n_chars - 100) / 900.0, F.lit(0.0)), F.lit(1.0))
    stop_sig = F.least(stop_ratio / 0.05, F.lit(1.0))
    punct_sig = F.least(F.greatest(1.0 - punct_ratio / 0.2, F.lit(0.0)), F.lit(1.0))
    return F.round((len_sig + stop_sig + punct_sig) / 3.0, 4)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: length / punctuation / stopword signals.

    (id, n_chars, punct_ratio, stopword_ratio, avg_word_len, quality):
    quality ∈ [0,1] = mean of three clamped signals — length in
    [100, 1000], stopword ratio ≥ 0.05, punct ratio ≤ 0.2. (The classic
    C4/Gopher-style filter shape, engine-independent arithmetic.)
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(normalize_text(t), " ")
    n_words = F.size(words)
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]"))
    stop = _marker_hits(words, LANG_MARKERS["en"])
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(stop / F.greatest(n_words, F.lit(1)), 4)
    avg_wlen = F.round(
        (F.length(F.concat_ws("", words)) / F.greatest(n_words, F.lit(1))), 4
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_wlen.alias("avg_word_len"),
        quality_col(text_col).alias("quality"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition quality filters, entirely row-local.

    (id, n_words, dup_word_frac, dup_bigram_frac, dup_trigram_frac,
    mean_word_len, keep): the duplicate-n-gram fractions are the standard
    "repetitious document" signals (Rae et al., Gopher §A.1.1 shape) —
    1 − distinct/total over word n-grams, n ∈ {1,2,3}.

    Scale design: every column is a Catalyst array expression over the
    in-row token array (split → zip_with → array_distinct → size) — zero
    shuffle, zero Python, embarrassingly partition-parallel; the classic
    first-pass filter a 100 TB curation pipeline runs during the initial
    scan, before anything is shuffled.
    """
    # Three deliberate evaluation choices, each measured at sf0.1:
    # 1. n-grams are arrays_zip STRUCT arrays over shifted slices — pair
    #    identity without building n-gram strings, and (unlike zip_with)
    #    without a per-element lambda: higher-order-function expressions
    #    are interpreted per element and cost ~2× here (1.0 s → 0.6 s).
    # 2. each heavy array expression occurs EXACTLY ONCE: Catalyst's
    #    CollapseProject re-inlines projected columns into every use
    #    site, so a helper like `1 − size(distinct(bg))/size(bg)` would
    #    duplicate the tree per reference (1.57 s before this shape).
    #    Total counts need no arrays at all: |bigrams| = n−1, |trigrams|
    #    = n−2, word-char total = len(norm) − (n−1) separator spaces.
    # 3. spread(): the toy corpus is one parquet split, and a row-local
    #    stage inherits that single partition — at scale this is a no-op.
    counts = spread(df, id_col).select(
        F.col(id_col), *_repetition_count_cols(text_col)
    )
    return counts.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_words"),
        *_repetition_stat_cols(),
    )


def _repetition_count_cols(text_col: str) -> list[Column]:
    """The single-occurrence count projection (`_n/_nd/_ndb/_ndt/_chars`).

    Two measured evaluation choices (sf0.1): n-grams are arrays_zip STRUCT
    arrays over shifted slices — pair identity without building n-gram
    strings and without per-element lambdas (higher-order-function
    expressions are interpreted per element; ~2× slower). Each heavy array
    expression occurs EXACTLY ONCE: CollapseProject re-inlines projected
    columns into every use site, so a `1 − size(distinct(bg))/size(bg)`
    helper would duplicate the tree per reference (1.57 s → 0.58 s).
    Total counts need no arrays: |bigrams| = n−1, |trigrams| = n−2,
    word-char total = len(norm) − (n−1) separator spaces.
    """
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    n = F.size(words)
    bigrams = F.arrays_zip(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
    )
    trigrams = F.arrays_zip(
        F.slice(words, 1, F.greatest(n - 2, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 2, F.lit(0))),
        F.slice(words, 3, F.greatest(n - 2, F.lit(0))),
    )
    return [
        n.alias("_n"),
        F.size(F.array_distinct(words)).alias("_nd"),
        F.size(F.array_distinct(bigrams)).alias("_ndb"),
        F.size(F.array_distinct(trigrams)).alias("_ndt"),
        (F.length(norm) - (n - 1)).alias("_chars"),
    ]


def _dup_frac(n_distinct: Column, total: Column) -> Column:
    return F.when(total > 0, F.round(1.0 - n_distinct / total, 4)).otherwise(
        F.lit(0.0)
    )


def _repetition_keep() -> Column:
    cn = F.col("_n")
    return (
        (_dup_frac(F.col("_nd"), cn) <= 0.55)
        & (_dup_frac(F.col("_ndb"), F.greatest(cn - 1, F.lit(0))) <= 0.05)
        & (_dup_frac(F.col("_ndt"), F.greatest(cn - 2, F.lit(0))) <= 0.02)
        & (cn >= 15)
    )


def _repetition_stat_cols() -> list[Column]:
    cn = F.col("_n")
    return [
        _dup_frac(F.col("_nd"), cn).alias("dup_word_frac"),
        _dup_frac(F.col("_ndb"), F.greatest(cn - 1, F.lit(0))).alias(
            "dup_bigram_frac"
        ),
        _dup_frac(F.col("_ndt"), F.greatest(cn - 2, F.lit(0))).alias(
            "dup_trigram_frac"
        ),
        F.round(F.col("_chars") / F.greatest(cn, F.lit(1)), 4).alias(
            "mean_word_len"
        ),
        _repetition_keep().alias("keep"),
    ]


def repetition_filter(df: DataFrame, text_col: str) -> DataFrame:
    """Drop repetitious documents, keeping every original column.

    The streaming-safe sibling of ``repetition_stats``: the same keep
    verdict applied as a row-local filter over the unchanged input frame —
    works identically on batch and Structured Streaming DataFrames (no
    repartition probe, no aggregation, no state).
    """
    counts = df.select("*", *_repetition_count_cols(text_col))
    return counts.filter(_repetition_keep()).select(*df.columns)


def top_word(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mode word and its share of the token count.

    (id, top_word, top_cnt, n_words, top_share). Ties break to the
    lexicographically LARGEST word via a composite string key
    (zero-padded count ++ word), so every engine picks the same winner.

    Scale design: two hash aggregations with map-side combine —
    explode → groupBy(id, word) → groupBy(id) with max_by — and no window
    over the corpus; per-document cardinality bounds the second stage.
    The single-document token multiset never materializes off-row except
    as (id, word, count) partials.
    """
    words = spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    )
    counts = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    key = F.concat(
        F.lpad(F.col("cnt").cast("string"), 10, "0"), F.lit("|"), F.col("word")
    )
    agg = counts.groupBy(id_col).agg(
        F.max_by("word", key).alias("top_word"),
        F.max("cnt").cast("bigint").alias("top_cnt"),
        F.sum("cnt").cast("bigint").alias("n_words"),
    )
    return agg.select(
        F.col(id_col),
        "top_word",
        "top_cnt",
        "n_words",
        F.round(F.col("top_cnt") / F.col("n_words"), 4).alias("top_share"),
    )


def group_vocab_overlap(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Vocabulary overlap between every pair of groups (sources/snapshots).

    (grp_a, grp_b, n_inter, jaccard, containment) for grp_a < grp_b:
    Jaccard and containment (|A∩B| / min(|A|,|B|)) over the groups'
    DISTINCT word vocabularies — the corpus-overlap measure used to
    decide whether two crawl snapshots / source feeds are worth
    cross-deduplicating before the expensive pairwise passes run.

    Scale design: one explode → distinct (group, word) pass (shuffle key
    is the word, values are group ids), then an inverted-index self-join
    on word whose per-word blowup is bounded by |groups|² — independent
    of corpus size — and a count aggregation per group pair (≤ |groups|²
    rows). Vocabulary sizes are |groups| rows → broadcast to the pair
    frame. No step scales worse than the distinct vocabulary itself.
    """
    vocab = spread(df, group_col).select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word"),
    ).distinct()
    sizes = vocab.groupBy("grp").agg(F.count(F.lit(1)).alias("sz"))
    a = vocab.select(F.col("grp").alias("grp_a"), "word")
    b = vocab.select(F.col("grp").alias("grp_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = F.broadcast(
        sizes.select(F.col("grp").alias("grp_a"), F.col("sz").alias("sz_a"))
    )
    zb = F.broadcast(
        sizes.select(F.col("grp").alias("grp_b"), F.col("sz").alias("sz_b"))
    )
    return (
        inter.join(za, "grp_a")
        .join(zb, "grp_b")
        .select(
            "grp_a",
            "grp_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
            F.round(
                F.col("n_inter") / F.least(F.col("sz_a"), F.col("sz_b")), 4
            ).alias("containment"),
        )
    )


# PII patterns restricted to the RE2 ∩ java.util.regex common subset so
# every engine matches identical spans (no backrefs, no lookaround).
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def redact_pii(col: Column | str) -> Column:
    """Replace emails/phone numbers with typed placeholders (row-local)."""
    return F.regexp_replace(
        F.regexp_replace(col, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Document fingerprint: md5 digest + min-shingle rolling-hash sketch.

    (id, digest, min_shingle_hash): the digest detects exact dups; the
    min-hash of word k-shingles is a 1-value MinHash — a cheap similarity
    sketch (equal sketches ⇒ likely near-dup candidates). The shingle
    definition is shared with the MinHash pipeline
    (``dedup.shingle_array``), so the sketch⇔signature relationship
    can't drift.
    """
    from bricolage_spark.operators.dedup import shingle_array

    shingles = shingle_array(F.col(text_col), k)
    return spread(df, id_col).select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("digest"),
        F.array_min(F.transform(shingles, lambda s: hash32(s, 0))).alias(
            "min_shingle_hash"
        ),
    )


def _char_signals(text_col: str):
    """Row-local (norm_len, entropy, digit_ratio, upper_ratio) columns —
    shared by :func:`char_stats` (report) and :func:`entropy_filter`
    (in-scan predicate)."""
    t = F.col(text_col)
    norm = normalize_text(t)
    chars = F.split(norm, "")
    n = F.length(norm)
    uniq = F.array_distinct(chars)
    # per-distinct-char counts, then -Σ p·log2(p)
    counts = F.transform(uniq, lambda c: F.size(F.filter(chars, lambda x: x == c)))
    entropy = F.when(n > 0, F.round(
        # 0.0 − Σ, not −Σ: a single-char doc sums to 0.0 and unary
        # negation yields −0.0, whose repr differs from +0.0 across
        # engines in the oracle's canonical-value hash
        F.lit(0.0)
        - F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, cnt: acc + (cnt / n) * F.log2(cnt / n),
        ),
        4,
    )).otherwise(F.lit(0.0))
    digit_ratio = F.round(
        F.regexp_count(t, F.lit(r"[0-9]")) / F.greatest(F.length(t), F.lit(1)), 4
    )
    upper_ratio = F.round(
        F.regexp_count(t, F.lit(r"[A-Z]")) / F.greatest(F.length(t), F.lit(1)), 4
    )
    return n, uniq, entropy, digit_ratio, upper_ratio


def char_keep(text_col: str = "text") -> Column:
    """The q63 keep predicate as a single row-local Column (entropy ≥ 2,
    digit ratio ≤ 0.3, uppercase ratio ≤ 0.3)."""
    _, _, entropy, digit_ratio, upper_ratio = _char_signals(text_col)
    return (entropy >= 2.0) & (digit_ratio <= 0.3) & (upper_ratio <= 0.3)


def entropy_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only rows passing the char-entropy quality gate — the
    in-scan filter form of :func:`char_stats` for curation pipelines
    (batch or streaming; pure Catalyst, zero state)."""
    return df.filter(char_keep(text_col))


def char_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-level quality signals: entropy, digit/upper ratios.

    (id, n_chars, n_distinct_chars, char_entropy, digit_ratio,
    upper_ratio, keep): Shannon entropy (log2) of the character
    distribution of the normalized text flags low-information docs
    (repeated padding, binary junk, single-char spam); digit and
    uppercase ratios use the RAW text (normalization lowercases).

    Scale design: entirely row-local — the per-character histogram is
    built as ``transform(array_distinct(chars), c -> count in row)``
    over the in-row char array (distinct chars per document are bounded
    by the alphabet, so the O(n·|alphabet|) inner loop is small), then
    folded with ``aggregate``. Zero shuffle, zero Python; runs inside
    the first curation scan like the other row-local filters.
    """
    n, uniq, entropy, digit_ratio, upper_ratio = _char_signals(text_col)
    return spread(df, id_col).select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        # guard: Spark's split('', '') is [''] (size 1) while other
        # engines give [] — pin empty docs to 0 distinct chars
        F.when(n > 0, F.size(uniq)).otherwise(F.lit(0)).cast("bigint").alias(
            "n_distinct_chars"
        ),
        entropy.alias("char_entropy"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        (
            (entropy >= 2.0) & (digit_ratio <= 0.3) & (upper_ratio <= 0.3)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# hashed-ngram linear classifier (fastText-style quality scoring)
# ---------------------------------------------------------------------------
# The standard public curation signal (CCNet / fastText-style quality
# classifiers): hash word uni+bigrams into a fixed bucket space, look up
# a linear weight per bucket, average, squash through a sigmoid. The
# trained weight table is a broadcast-sized artifact (``buckets`` floats)
# regardless of corpus size; scoring is entirely row-local — zero
# shuffle at 100 TB, embarrassingly parallel over document partitions.
#
# Weights here are hash-DERIVED (a deterministic stand-in for a trained
# table, the same fixture discipline as the IVF seed): INTEGER in
# [-1000, 1000] so per-doc sums are exact and order-free in ANY engine —
# float accumulation order can differ between engines, integer sums
# cannot. The bucket->weight table is MATERIALIZED ONCE on the driver
# (4096 ints, the exact size a trained table ships at) and embedded as
# an array literal, so score time does ONE hash + one array lookup per
# gram instead of re-deriving the weight hash per occurrence. A real
# deployment swaps ``_weight_table`` for its trained vector; the plan
# shape — a single projection — is unchanged.

CLASSIFIER_BUCKETS = 4096
CLASSIFIER_SEED_BUCKET = 8888  # gram -> bucket hash family
CLASSIFIER_SEED_WEIGHT = 9999  # bucket -> weight hash family
CLASSIFIER_BIAS = 0.1  # w0: fixture bias term


def _weight_table() -> list[int]:
    """bucket -> integer weight in [-1000, 1000].

    Same values as hash32(str(bucket), SEED_WEIGHT) % 2001 - 1000 computed
    per-row (the q83 DuckDB oracle still derives them that way), but
    evaluated once here: md5("<seed>|<bucket>") first-8-hex as uint32.
    """
    import hashlib

    out = []
    for b in range(CLASSIFIER_BUCKETS):
        h = hashlib.md5(
            f"{CLASSIFIER_SEED_WEIGHT}|{b}".encode()
        ).hexdigest()[:8]
        out.append(int(h, 16) % 2001 - 1000)
    return out


_WEIGHTS_COL: Column | None = None


def _weights_lit() -> Column:
    """The weight table as a TRUE array Literal (a JVM long[]).

    ``F.lit(list)`` builds a CreateArray of 4096 literal children, and
    Catalyst does not constant-fold inside HOF lambda bodies — the array
    would be re-materialized per aggregate step (measured ~2 s at sf0.1,
    worse than re-hashing). A numpy int64 array lits as ONE ArrayType
    Literal, so ``element_at`` is a plain O(1) index read. The Column is
    cached module-wide: the np->JVM conversion costs ~0.5 s of py4j
    traffic, paid once per process, not per query build (a Literal holds
    no SparkContext state, so it survives session restarts in-process).
    """
    global _WEIGHTS_COL
    if _WEIGHTS_COL is None:
        import numpy as np

        _WEIGHTS_COL = F.lit(np.array(_weight_table(), dtype=np.int64))
    return _WEIGHTS_COL


def gram_array(text_col: str) -> Column:
    """Word unigrams + bigrams WITH multiplicity, as one array Column.

    The shared gram definition for every hashed-ngram surface (the q83
    classifier, DSIR importance weighting): normalized words
    concatenated with space-joined adjacent pairs. Pure Catalyst HOFs —
    callers decide whether to keep it row-local (aggregate over the
    array) or explode it for a distribution fit.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(words, bigrams)


def hashed_ngram_keep(text_col: str, threshold: float = 0.5) -> Column:
    """Row-local boolean: would ``hashed_ngram_score`` keep this doc?

    The same score as a single Column expression, for use as a FILTER
    predicate inside a larger pipeline (batch or streaming micro-batch
    scan) where the caller doesn't want the score columns — e.g. the
    classifier-keep stage of a curation jobnet. NULL text -> NULL ->
    filtered out, matching hashed_ngram_score's dropped-doc semantics.
    Evaluated once per row (single consumer), so the projection-splitting
    hashed_ngram_score needs does not apply here.
    """
    wtab = _weights_lit()
    grams = gram_array(text_col)
    total = F.aggregate(
        grams,
        F.lit(0).cast("bigint"),
        lambda acc, g: acc
        + F.element_at(
            wtab,
            ((hash32(g, CLASSIFIER_SEED_BUCKET) % CLASSIFIER_BUCKETS) + 1).cast(
                "int"
            ),
        ),
    )
    z = F.lit(CLASSIFIER_BIAS) + (
        total.cast("double") / F.size(grams).cast("double")
    ) / F.lit(1000.0)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return score >= F.lit(threshold)


def hashed_ngram_score(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Per-doc linear-classifier score: sigmoid(w0 + mean gram weight).

    Grams are word unigrams + bigrams WITH multiplicity (fastText
    averages over occurrences, not the distinct set). Everything is
    Catalyst HOFs over the per-row word array — transform/zip_with/
    aggregate — so the plan is one projection: no explode, no shuffle,
    no Python. Per gram: one hash32 -> bucket, then an element_at into
    the materialized weight-table literal. NULL-text docs are dropped
    (the oracle's UNNEST over a NULL word list yields no rows; a doc
    with no text has no grams to score). Returns (id, n_grams, score,
    keep).
    """
    wtab = _weights_lit()

    def gram_weight(gram: Column) -> Column:
        idx = (hash32(gram, CLASSIFIER_SEED_BUCKET) % CLASSIFIER_BUCKETS) + 1
        return F.element_at(wtab, idx.cast("int"))

    # compute-bound row-local scoring: spread() guarantees parallelism
    # >= cores (a single-row-group input file scans as ONE task and
    # would serialize the scoring onto one core; no-op at corpus scale)
    df = spread(df.where(F.col(text_col).isNotNull()), id_col)
    # materialize grams in their own projection (CollapseProject keeps it:
    # the array is referenced twice and split/zip_with are not cheap), so
    # the gram pipeline runs once, not once per consumer
    gdf = df.select(F.col(id_col), gram_array(text_col).alias("_grams"))
    # project the aggregate ONCE, then derive score/keep from the column:
    # referencing the HOF expression from both `score` and `keep` would
    # re-run the whole per-gram aggregation per reference (interpreted
    # HOFs get no common-subexpression elimination; measured 2x)
    sums = gdf.select(
        F.col(id_col),
        F.size("_grams").cast("bigint").alias("n_grams"),
        F.aggregate(
            "_grams", F.lit(0).cast("bigint"), lambda acc, g: acc + gram_weight(g)
        ).alias("_total"),
    )
    z = F.lit(CLASSIFIER_BIAS) + (
        F.col("_total").cast("double") / F.col("n_grams").cast("double")
    ) / F.lit(1000.0)
    scored = sums.select(
        F.col(id_col),
        F.col("n_grams"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )
    return scored.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("score"),
        (F.col("score") >= F.lit(threshold)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weighting (targeted data selection)
# ---------------------------------------------------------------------------
# Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
# fit hashed-ngram bag-of-words distributions over a small TARGET sample
# and the RAW pool, then weight every raw doc by its target/raw
# log-likelihood ratio — docs that "read like" the target domain get
# positive weight. The public, cheap alternative to training a quality
# classifier when what you have is an exemplar corpus, not labels.
#
# Scale shape: the fit is ONE corpus pass collapsing to a
# ``buckets``-row table (broadcast-sized forever — in production a
# staged artifact, refit only when the target changes); scoring is one
# raw-pool pass — explode to hashed buckets, broadcast-join the ratio
# table, doc-keyed partial-agg sum. Nothing driver-side, no all-pairs,
# no Python.

DSIR_BUCKETS = 1024
DSIR_SEED = 5151


def dsir_log_ratio_table(
    df: DataFrame,
    text_col: str,
    is_target: Column,
    buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
) -> DataFrame:
    """(bucket, log_ratio): add-one-smoothed hashed-ngram log-likelihood
    ratio ln(p_target/p_raw) per feature bucket.

    ``is_target`` is any boolean Column over ``df``'s rows splitting the
    corpus into the target exemplar sample (true) and the raw pool
    (false). Buckets no gram hashed into carry no row — scoring joins
    only buckets that occur, and every scorable gram's bucket occurs by
    construction.
    """
    gb = df.where(F.col(text_col).isNotNull()).select(
        is_target.alias("_t"),
        F.explode(gram_array(text_col)).alias("_g"),
    )
    dist = gb.select(
        "_t", (hash32(F.col("_g"), seed) % buckets).alias("bucket")
    ).groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("_ct"),
        F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("_cr"),
    )
    totals = dist.agg(
        F.sum("_ct").cast("double").alias("_T"),
        F.sum("_cr").cast("double").alias("_R"),
    )
    b = F.lit(float(buckets))
    return dist.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("_ct") + F.lit(1.0)) / (F.col("_T") + b))
            - F.log((F.col("_cr") + F.lit(1.0)) / (F.col("_R") + b))
        ).alias("log_ratio"),
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
    ratio_table: DataFrame | None = None,
) -> DataFrame:
    """Score every RAW-pool doc (``is_target`` false) by its summed
    hashed-ngram log importance ratio: (id, n_grams, dsir_logweight,
    keep) with keep = weight above 0 (more target-like than raw-like).

    Pass ``ratio_table`` (a persisted :func:`dsir_log_ratio_table`
    result) to skip the fit pass — the staged-artifact shape a pipeline
    uses; omitted, the fit runs inline over the same frame. The weight
    is rounded to 4dp BEFORE the keep comparison so the verdict is
    reproducible across engines (double sums are order-sensitive at the
    ulp level; the rounded value is not).
    """
    if ratio_table is None:
        ratio_table = dsir_log_ratio_table(df, text_col, is_target, buckets, seed)
    raw = spread(
        df.where(F.col(text_col).isNotNull() & ~is_target), id_col
    ).select(F.col(id_col), F.explode(gram_array(text_col)).alias("_g"))
    scored = (
        raw.select(id_col, (hash32(F.col("_g"), seed) % buckets).alias("bucket"))
        .join(F.broadcast(ratio_table), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.round(F.sum("log_ratio"), 4).alias("dsir_logweight"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_grams",
        "dsir_logweight",
        (F.col("dsir_logweight") > F.lit(0.0)).alias("keep"),
    )


def dsir_keep_expr(
    ratio_table: DataFrame,
    text_col: str,
    min_weight: float = 0.0,
    buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
) -> Column:
    """Row-local DSIR keep predicate from a fitted ratio table — the
    STREAMING serve form of :func:`dsir_importance`.

    A micro-batch scan can't afford a join per gram, and a stream-side
    aggregate-then-join would add state; instead the (at most
    ``buckets``-row) ratio table is collected ONCE at query-build time
    into an array literal — the same materialized-table discipline as
    the q83 classifier weights — and the keep decision becomes a pure
    Catalyst ``aggregate`` over the row's grams: zero joins, zero
    state, fused into the scan of every micro-batch.

    Buckets absent from the fitted table contribute 0.0 (a stream can
    carry grams whose bucket no fit-time doc touched; neutral is the
    only weight the fit can justify — batch scoring's inner join never
    meets such buckets, so batch/stream verdicts agree on any doc whose
    gram buckets were all seen at fit time). NULL text scores NULL and
    is filtered, matching dsir_importance's dropped-doc semantics.
    """
    import numpy as np

    table = np.zeros(buckets, dtype=np.float64)
    for r in ratio_table.select("bucket", "log_ratio").collect():
        table[int(r["bucket"])] = float(r["log_ratio"])
    wtab = F.lit(table)
    grams = gram_array(text_col)
    total = F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(
            wtab, ((hash32(g, seed) % buckets) + 1).cast("int")
        ),
    )
    return F.round(total, 4) >= F.lit(min_weight)


# ---------------------------------------------------------------------------
# distribution drift between snapshots (training-mix monitoring)
# ---------------------------------------------------------------------------


def split_word_counts(
    df: DataFrame, group_col: str, text_col: str, in_a: Column
) -> DataFrame:
    """(group, _w, _ca, _cb): per-group word counts split by the ``in_a``
    slice flag — ONE corpus pass (melt → hash-agg with map-side
    combine), the shared substrate for distribution diagnostics
    (:func:`unigram_js_drift` consumes the split; a salient-terms
    report consumes _ca+_cb). Callers that serve several reports stage
    THIS frame once (persist/checkpoint) instead of re-melting the
    corpus per report.
    """
    words = df.where(F.col(text_col).isNotNull()).select(
        F.col(group_col),
        in_a.alias("_a"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("_w"),
    )
    return words.groupBy(group_col, "_w").agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("_cb"),
    )


def unigram_js_drift(
    df: DataFrame,
    group_col: str,
    text_col: str,
    in_a: Column,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-group Jensen-Shannon divergence between the unigram
    distributions of two corpus slices: (group, n_vocab, n_a, n_b,
    js_divergence).

    The drift monitor a recurring crawl runs per source: q72 tells you
    WHICH documents changed between snapshots; this tells you whether
    the LANGUAGE changed — a feed whose JS jumps between crawls has
    shifted topic/template/spam mix even if document membership looks
    routine, and its sampling weight deserves review before the next
    training run. ``in_a`` is any boolean Column assigning each row to
    slice A (true) or B (false).

    Distributions are add-one smoothed over the group's union
    vocabulary, so both sides are true probability distributions (sum
    exactly 1) and JS lands in [0, ln 2] with no zero-probability
    traps. Scale shape: ONE corpus pass melts words into a
    (group, word)-keyed count agg (map-side combine — word strings
    cross the wire once, counted), materialized via localCheckpoint —
    the count table feeds both the totals aggregate and the JS terms,
    and without the truncation Catalyst expands it into repeated
    corpus scans (measured: 3 scans; the branches' differing
    projections defeat exchange reuse). Everything after is
    vocab-scale; the |groups|-row totals join is broadcast, and the
    output collapses in one group-keyed partial agg. Rounded to 6dp
    (double sums are order-sensitive at the ulp level across engines).

    Pass ``counts`` (a MATERIALIZED :func:`split_word_counts` frame —
    persisted or checkpointed) to serve from a staged artifact shared
    with other reports; built inline otherwise.
    """
    if counts is None:
        counts = split_word_counts(
            df, group_col, text_col, in_a
        ).localCheckpoint(eager=True)
    totals = counts.groupBy(group_col).agg(
        F.sum("_ca").alias("_ta"),
        F.sum("_cb").alias("_tb"),
        F.count(F.lit(1)).alias("_v"),
    )
    j = counts.join(F.broadcast(totals), group_col)
    p = (F.col("_ca") + F.lit(1.0)) / (F.col("_ta") + F.col("_v"))
    q = (F.col("_cb") + F.lit(1.0)) / (F.col("_tb") + F.col("_v"))
    m = (p + q) / F.lit(2.0)
    term = F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)
    return (
        j.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
            F.max("_ta").cast("bigint").alias("n_a"),
            F.max("_tb").cast("bigint").alias("n_b"),
            F.round(F.sum(term), 6).alias("js_divergence"),
        )
        .orderBy(group_col)
    )


def salient_terms(
    counts: DataFrame, group_col: str, top_n: int = 5
) -> DataFrame:
    """Per-group most-distinctive terms by TF-IDF over the group axis:
    (group, term, tf, n_groups_with_term, tfidf, rank).

    "What does each feed talk about" — the topic observability report
    next to q99's drift number: IDF is taken across GROUPS (sources),
    so terms shared by every source score exactly 0 and each source's
    list surfaces what distinguishes it. Input is the staged
    :func:`split_word_counts` frame (tf = _ca + _cb); everything here
    is vocab-scale — a word-keyed doc-frequency agg, a broadcast 1-row
    group count, and a group-partitioned rank window (bounded by
    per-group vocab, never a global sort). Ties rank by term so the
    report is deterministic.
    """
    tf = counts.select(
        group_col, "_w", (F.col("_ca") + F.col("_cb")).alias("_tf")
    )
    dfw = tf.groupBy("_w").agg(F.count(F.lit(1)).alias("_df"))
    ng = tf.select(group_col).distinct().agg(
        F.count(F.lit(1)).alias("_ng")
    )
    from pyspark.sql import Window

    scored = (
        tf.join(dfw, "_w")
        .crossJoin(F.broadcast(ng))
        .select(
            group_col,
            F.col("_w").alias("term"),
            F.col("_tf").cast("bigint").alias("tf"),
            F.col("_df").cast("bigint").alias("n_groups_with_term"),
            F.round(
                F.col("_tf")
                * F.log(
                    F.col("_ng").cast("double") / F.col("_df").cast("double")
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("tfidf"), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_n)
        .orderBy(group_col, "rank")
    )


# ---------------------------------------------------------------------------
# code/markup detection (corpus-composition signal)
# ---------------------------------------------------------------------------
# Training mixes track how much of the corpus is code/markup vs prose.
# The standard cheap signal: density of code-punctuation characters and
# average word length. Pure row-local arithmetic over length/replace —
# zero shuffle, reproducible in any engine.

CODE_CHARS = ";{}<>=()[]"
CODE_RATIO_THRESHOLD = 0.02


def code_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc code/markup signals: (id, n_chars, code_char_ratio,
    avg_word_len, is_code).

    ``code_char_ratio`` counts CODE_CHARS occurrences via length-delta
    (length(s) - length(replace(s, c))) summed per char — no regex, no
    explode. ``is_code`` = ratio above threshold.
    """
    t = F.col(text_col)
    n = F.length(t)
    code_count = None
    for ch in CODE_CHARS:
        # literal replace (no regex): same `replace` builtin both engines
        c = F.length(t) - F.length(F.replace(t, F.lit(ch), F.lit("")))
        code_count = c if code_count is None else code_count + c
    words = F.split(normalize_text(t), " ")
    awl = F.round(
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / F.size(words).cast("double"),
        4,
    )
    ratio = F.round(
        F.when(n > 0, code_count.cast("double") / n.cast("double")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        ratio.alias("code_char_ratio"),
        awl.alias("avg_word_len"),
        (ratio > F.lit(CODE_RATIO_THRESHOLD)).alias("is_code"),
    )


def bpe_merge_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    top_n: int = 30,
    eow: str = "</w>",
) -> DataFrame:
    """First-round BPE merge induction: adjacent symbol-pair frequencies
    over the corpus vocabulary, the statistic a byte-pair-encoding
    tokenizer trainer maximizes at every merge step (Sennrich et al.
    2016's algorithm; reference behavior modeled on the public
    subword-nmt/GPT-2 BPE trainers).

    Scale shape — the corpus is touched ONCE, everything after is
    vocab-scale (this is exactly why real BPE trainers count words
    first):

    1. word frequencies: one corpus explode + hash-agg with map-side
       combine (shuffle rows are (word, count), never documents);
    2. per DISTINCT word: symbols = characters + an end-of-word marker,
       adjacent pairs via the codegen'd slice/arrays_zip construction
       (q73's pattern — HOF lambdas are interpreted per element),
       weighted by the word's corpus count;
    3. pair aggregation + deterministic top-n via orderBy().limit()
       (TakeOrderedAndProject — no global sort), ties broken by the
       pair itself.

    Returns (s1, s2, pair_count): the ranked merge candidates; the top
    row IS the first BPE merge.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    vocab = (
        spread(df, id_col)
        .select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(eow)))
    sized = vocab.select("wc", syms.alias("s"), F.size(syms).alias("n"))
    pairs = sized.select(
        "wc",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("s"), 1, F.col("n") - 1).alias("s1"),
                F.slice(F.col("s"), 2, F.col("n") - 1).alias("s2"),
            )
        ).alias("p"),
    )
    agg = pairs.groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2")).agg(
        F.sum("wc").cast("bigint").alias("pair_count")
    )
    return agg.orderBy(F.desc("pair_count"), "s1", "s2").limit(top_n)


def _bpe_local_trainer(
    vocab_counts: list[tuple[str, int]], n_merges: int, eow: str
) -> list[tuple[int, str, str, int]]:
    """The Sennrich trainer loop over a driver-side (word, count) vocab
    — byte-identical semantics to the distributed loop below (same
    re-count-per-merge, same count-DESC/(s1,s2)-ASC tie-break, same
    greedy left-to-right merge application)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, c in vocab_counts:
        syms = tuple(list(word) + [eow])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        bc = max(pairs.values())
        s1, s2 = min(k for k, v in pairs.items() if v == bc)
        merges.append((rank, s1, s2, bc))
        nv: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == s1 and syms[i + 1] == s2:
                    out.append(s1 + s2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nv[t] = nv.get(t, 0) + c
        vocab = nv
    return merges


def bpe_learn_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_merges: int = 30,
    eow: str = "</w>",
    rematerialize_every: int = 24,
    driver_vocab_max: int = 65536,
) -> list[tuple[int, str, str, int]]:
    """TRUE iterative BPE merge induction (Sennrich et al. 2016; the
    subword-nmt / GPT-2 trainer loop): after every accepted merge, pair
    frequencies are RE-COUNTED over the merged vocabulary, so merge t
    sees the symbols merges 1..t-1 created — unlike
    :func:`bpe_merge_candidates`, whose ranked list is first-round
    counts only (merges beyond rank 1 there are approximations).

    Scale shape — the corpus is touched ONCE; the loop is vocab-scale,
    in one of two tiers on the SAME algorithm:

    - the word-count aggregation reduces the corpus to its vocabulary,
      and when that statistic is metadata-sized (≤ ``driver_vocab_max``
      rows, default 64Ki — counted on the persisted table first, so the
      collect is provably bounded, never a blind pull; a limit+collect
      probe was measured and rejected: CollectLimit's incremental
      partition scheduling re-ran the aggregation 4×) the T-round loop
      runs driver-side, exactly how
      every real BPE trainer (subword-nmt, GPT-2) runs it — the same
      collect discipline as the IVF centroids and the DSIR ratio table,
      avoiding T×2 Spark stage floors for a table that fits in hands;
    - a production-scale vocabulary (a 100 TB corpus has 10⁷–10⁸
      distinct words) exceeds the bound and runs the DISTRIBUTED loop
      below (``driver_vocab_max=0`` forces it, which is how the
      property test pins both tiers to the same merges):

    1. word frequencies: one corpus explode + hash-agg (map-side
       combine), then each distinct word becomes a sentinel symbol
       string (chars + ``eow``) — this (string, count) table is
       persisted and is the ONLY input the loop ever reads;
    2. per round: the accepted merges so far apply as a chained
       codegen'd StringReplace projection, adjacent pairs re-count via
       the slice/arrays_zip construction, and exactly ONE row (the
       argmax pair) is collected — the same driver-coordinated
       iteration discipline as pagerank/connected-components
       (operators/graph.py), with the vocab re-materialized every
       ``rematerialize_every`` merges to bound the replace-chain depth
       (a production 30k-merge run keeps codegen'd expression sizes
       sane that way);
    3. the loop stops early when no adjacent pair remains (every word
       fused to a single symbol).

    Tie-break, pinned across the Spark loop, the DuckDB oracle chain
    and the pure-Python test mirror: highest count first, then (s1, s2)
    lexicographically ASCENDING (binary collation both engines).

    Returns ``[(merge_rank, s1, s2, pair_count)]`` in merge order;
    ``pair_count`` is the pair's frequency AT THE TIME of its merge —
    the trainer-log statistic, non-increasing down the table except
    where a merge-created symbol spikes a successor pair.
    """
    from bricolage_spark.catalog import spread as _spread

    words = F.split(normalize_text(F.col(text_col)), " ")
    vocab = (
        _spread(df, id_col)
        .select(F.explode(words).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = vocab.persist()
    try:
        if driver_vocab_max and vocab.count() <= driver_vocab_max:
            return _bpe_local_trainer(
                [(r.word, r.wc) for r in vocab.collect()], n_merges, eow
            )
        base = vocab.select(
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", BPE_SEP + "$1" + BPE_SEP),
                F.lit(BPE_SEP + eow + BPE_SEP),
            ).alias("v"),
            "wc",
        ).persist()
        base.count()  # materialize off the cached vocab before dropping it
    finally:
        vocab.unpersist(blocking=False)
    merges: list[tuple[int, str, str, int]] = []
    pending: list[tuple[str, str]] = []  # merges not yet folded into `base`
    try:
        for rank in range(1, n_merges + 1):
            cur = base.select(bpe_apply_merges(F.col("v"), pending).alias("v"), "wc")
            # strip the outer sentinel of the first/last symbol, then the
            # DOUBLED sentinels between symbols are exact split points
            # (no HOF filter, no per-element lambda)
            inner = F.substring(F.col("v"), F.lit(2), F.length(F.col("v")) - 2)
            sy = F.split(inner, BPE_SEP + BPE_SEP)
            sized = cur.select("wc", sy.alias("s"), F.size(sy).alias("n"))
            pairs = sized.where(F.col("n") >= 2).select(
                "wc",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("s"), 1, F.col("n") - 1).alias("s1"),
                        F.slice(F.col("s"), 2, F.col("n") - 1).alias("s2"),
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
                .agg(F.sum("wc").cast("bigint").alias("c"))
                .orderBy(F.desc("c"), "s1", "s2")
                .limit(1)
                .collect()
            )
            if not best:
                break
            r = best[0]
            merges.append((rank, r.s1, r.s2, r.c))
            pending.append((r.s1, r.s2))
            if len(pending) >= rematerialize_every:
                folded = base.select(
                    bpe_apply_merges(F.col("v"), pending).alias("v"), "wc"
                ).persist()
                folded.count()  # materialize before dropping the parent
                base.unpersist(blocking=False)
                base, pending = folded, []
    finally:
        base.unpersist(blocking=False)
    return merges


# ---------------------------------------------------------------------------
# BPE merge APPLICATION (tokenizer-encode primitive, the q95 dual)
# ---------------------------------------------------------------------------
# q95 (bpe_merge_candidates) INDUCES a merge table; these operators APPLY
# one to encode text into BPE tokens — closing the train/apply pair the
# way q86 (detect) / q92 (apply) close sentence dedup. Reference scope:
# the reference engine ships no tokenizer; this is part of the
# training-pipeline extension surface (SURVEY.md §2.7).
#
# Representation: a document is ONE symbol string with every symbol
# carrying its OWN sentinel pair:
#     \x01h\x01\x01e\x01...\x01o\x01\x01</w>\x01\x01w\x01...\x01</w>\x01
# (each word ends with the </w> marker, so merges can never cross word
# boundaries — first-round merge tables never contain </w> as a LEFT
# element). Applying merge (s1, s2) is then ONE left-to-right
# non-overlapping replace of \x01s1\x01\x01s2\x01 with \x01s1s2\x01.
# Symbols do NOT share boundary sentinels — that is load-bearing: with a
# single shared sentinel, replacing one occurrence consumes the boundary
# the NEXT occurrence needs, so consecutive pair repeats ('banana' under
# merge (a,n)) merge only once per pass while Sennrich et al.'s greedy
# symbol scan merges every non-overlapping occurrence (round-9 review
# finding; regression-tested). With the doubled sentinels, plain
# string replace IS the greedy scan, and both Spark (codegen'd
# StringReplace) and any SQL oracle evaluate it identically. The whole
# encode is a single projection: no explode, no shuffle, no Python —
# embarrassingly parallel over document partitions at 100 TB. The merge
# table itself is tokenizer-vocabulary metadata (tens to a few thousand
# rows), collected once on the driver like the IVF centroids
# (similarity.py) and unrolled into the expression tree.

BPE_SEP = "\x01"  # unit separator: absent from real text; parity-safe
                  # regardless (the oracle applies the same string ops)


def bpe_symbol_string(text_col: Column, eow: str = "</w>") -> Column:
    """Normalized text as one BPE symbol string, every symbol wrapped in
    its OWN sentinel pair (see the representation note above).

    Chars become \x01c\x01 symbols; the single space normalize_text
    leaves between words becomes the end-of-word marker. Empty text
    encodes as the lone </w> symbol (one token), NULL stays NULL.
    """
    norm = normalize_text(text_col)
    melted = F.regexp_replace(norm, "(.)", BPE_SEP + "$1" + BPE_SEP)
    worded = F.replace(
        melted,
        F.lit(BPE_SEP + " " + BPE_SEP),
        F.lit(BPE_SEP + eow + BPE_SEP),
    )
    return F.concat(worded, F.lit(BPE_SEP + eow + BPE_SEP))


def bpe_apply_merges(sym_col: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply a ranked merge table to a symbol string: one replace per
    merge, in rank order, each a greedy left-to-right non-overlapping
    pass over the double-sentinel representation — EXACTLY the classical
    BPE symbol scan: ``aaa`` under merge (a,a) becomes ``aa a``, and
    both (a,n) pairs in ``banana`` merge in one pass (no shared boundary
    to consume). Unrolled into nested StringReplace nodes: whole-stage
    codegen, no Python."""
    out = sym_col
    for s1, s2 in merges:
        out = F.replace(
            out,
            F.lit(BPE_SEP + s1 + BPE_SEP + BPE_SEP + s2 + BPE_SEP),
            F.lit(BPE_SEP + s1 + s2 + BPE_SEP),
        )
    return out


def bpe_symbol_count(sym_col: Column) -> Column:
    """Token count of a symbol string: half the sentinel count (every
    symbol carries exactly two)."""
    return (
        (
            F.length(sym_col)
            - F.length(F.replace(sym_col, F.lit(BPE_SEP), F.lit("")))
        )
        / 2
    ).cast("bigint")


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    preview_n: int = 8,
) -> DataFrame:
    """Encode documents with a BPE merge table: per doc, the pre-merge
    symbol count, the post-merge token count, how many merges landed,
    and the first ``preview_n`` tokens (space-joined — symbols never
    contain spaces) as a value witness that the MERGES applied, not
    just that counts moved. NULL-text docs are dropped (no symbols to
    encode — same contract as hashed_ngram_score). One projection."""
    base = bpe_symbol_string(F.col(text_col))
    df = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), base.alias("_base")
    )
    # materialize the merge chain in its own projection (CollapseProject
    # keeps it: referenced 3x below and StringReplace chains aren't
    # cheap), so the unrolled replaces run once per row, not per consumer
    df = df.select(
        F.col(id_col),
        F.col("_base"),
        bpe_apply_merges(F.col("_base"), merges).alias("_enc"),
    )
    enc = F.col("_enc")
    out = df.select(
        F.col(id_col),
        bpe_symbol_count(F.col("_base")).alias("n_symbols"),
        bpe_symbol_count(enc).alias("n_tokens"),
        # split() sees the sentinel as a (meta-free) regex; symbols sit
        # at even 1-based positions (empty strings at the boundaries and
        # between each symbol's closing and the next one's opening
        # sentinel are filtered out)
        F.concat_ws(
            " ",
            F.filter(
                F.slice(F.split(enc, BPE_SEP), 2, 2 * preview_n),
                lambda t: t != F.lit(""),
            ),
        ).alias("token_preview"),
    )
    return out.withColumn(
        "n_merged", (F.col("n_symbols") - F.col("n_tokens")).cast("bigint")
    )


def calibration_table(
    df: DataFrame, id_col: str, text_col: str, *, n_buckets: int = 10
) -> DataFrame:
    """Quality-classifier calibration sheet (q109, shared with the
    ``calibration-report`` job class): the corpus bucketed by the
    hashed-ngram score (fixed-width buckets — row-local arithmetic,
    never a global ntile window), with per-bucket means of the
    INDEPENDENT Gopher repetition signals, document length, and the
    rule-based keep rate. Two row-local metric projections, one
    doc-keyed join, a |buckets|-row aggregate; a production pipeline
    stages the per-doc metrics table once and the report is then
    metadata-scale."""
    # r15 optimization (guide §2.4: remove shuffles outright): both
    # metric families are ROW-LOCAL projections of the same corpus scan,
    # so they are computed in ONE pass — the previous shape derived two
    # frames (hashed_ngram_score ⋈ repetition_stats on doc id), paying a
    # second scan+normalize of the text plus two exchanges and a join
    # that exist only as code-reuse artifacts. Same expressions, same
    # two-stage projection discipline as the operators themselves
    # (grams/counts materialized once, HOF aggregate projected once),
    # so every output value is bit-identical. NULL-text docs drop
    # exactly as the old inner join dropped them (the classifier side
    # filtered them before the join).
    wtab = _weights_lit()

    def gram_weight(gram: Column) -> Column:
        idx = (hash32(gram, CLASSIFIER_SEED_BUCKET) % CLASSIFIER_BUCKETS) + 1
        return F.element_at(wtab, idx.cast("int"))

    base = spread(df.where(F.col(text_col).isNotNull()), id_col)
    p1 = base.select(
        F.col(id_col),
        gram_array(text_col).alias("_grams"),
        *_repetition_count_cols(text_col),
    )
    p2 = p1.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_words"),
        *_repetition_stat_cols(),
        F.size("_grams").cast("bigint").alias("n_grams"),
        F.aggregate(
            "_grams", F.lit(0).cast("bigint"), lambda acc, g: acc + gram_weight(g)
        ).alias("_total"),
    )
    z = F.lit(CLASSIFIER_BIAS) + (
        F.col("_total").cast("double") / F.col("n_grams").cast("double")
    ) / F.lit(1000.0)
    j = p2.withColumn(
        "score", F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    )
    return _calibration_report(j, n_buckets)


def _calibration_report(j: DataFrame, n_buckets: int) -> DataFrame:
    """The bucketing + aggregation tail of ``calibration_table``, over a
    per-doc metrics frame carrying (score, dup_word_frac,
    dup_trigram_frac, n_words, keep) — separated so the clamp contract
    is unit-testable with a synthetic saturated-score frame (the fused
    single-pass pipeline above offers no stub seam)."""
    # clamp the top edge: the report contract is EXACTLY n_buckets
    # fixed-width buckets, but the score rounds to 6 decimals, so a
    # high-z doc under a real weight table scores exactly 1.0 and
    # floor(1.0 * n) would mint an (n+1)-th bucket. (The fixture weight
    # table bounds |mean weight| <= 1000 -> z <= 1.1 -> score <= ~0.751,
    # so the clamp is contract armor, not a reachable branch here.)
    bucket = F.least(
        F.floor(F.col("score") * n_buckets), F.lit(n_buckets - 1)
    ).cast("bigint")
    n = F.count(F.lit(1))
    return j.groupBy(bucket.alias("score_bucket")).agg(
        n.cast("bigint").alias("n_docs"),
        F.round(F.avg("score"), 4).alias("avg_score"),
        F.round(F.avg("dup_word_frac"), 4).alias("avg_dup_word_frac"),
        F.round(F.avg("dup_trigram_frac"), 4).alias("avg_dup_trigram_frac"),
        F.round(F.avg(F.col("n_words").cast("double")), 2).alias("avg_n_words"),
        F.round(
            F.sum(F.when(F.col("keep"), 1).otherwise(0)) / n.cast("double"), 4
        ).alias("gopher_keep_rate"),
    )


# ---------------------------------------------------------------------------
# token-budget packing / length histogram over ANY token-count column
# ---------------------------------------------------------------------------
# Extracted from q54/q70 so the token statistic is a caller-supplied
# Column: the queries keep their ceil(chars/4) estimator (fixed oracle
# contract), a post-BPE pipeline passes bpe_symbol_count() of its
# encoded docs instead — same plan shape either way.


def pack_sequences(
    df: DataFrame,
    token_col: Column,
    *,
    budget: int,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Assign rows to fixed token-budget bins in deterministic
    ``order_col`` order — the batch-construction step of a pretraining
    data loader. The running sum is windowed PER ``partition_col`` (a
    natural shard key: language, source, shard id), never a global
    ORDER BY window, which would serialize the corpus through one task;
    each partition packs independently, exactly how a per-shard packer
    runs at scale. Appends (n_tokens, bin_id) — with withColumn
    semantics, so an input that already carries either column (e.g.
    bpe_encode output re-packed) gets it OVERWRITTEN, never duplicated
    into an ambiguous name (round-8 advice)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # token_col may itself reference an existing n_tokens column:
    # evaluate it ONCE into a temp before overwriting, or the window
    # expression would re-resolve against the already-replaced value
    tmp = df.withColumn("_pack_tokens", token_col)
    cum = F.sum(F.col("_pack_tokens")).over(w)
    return (
        tmp.withColumn(
            "bin_id",
            F.floor((cum - F.col("_pack_tokens")) / budget).cast("bigint"),
        )
        .withColumn("n_tokens", F.col("_pack_tokens"))
        .drop("_pack_tokens")
    )


def length_histogram(df: DataFrame, token_col: Column, group_col: str) -> DataFrame:
    """Per-group histogram of token counts in power-of-two buckets — the
    length-distribution report that drives packing budgets and
    truncation policy. Row-local bucket arithmetic + one (group, bucket)
    hash-agg with map-side combine; output is |groups|·|buckets| rows
    (metadata-scale). Counts are clamped to >= 1 so log2 is defined."""
    n_tokens = F.greatest(token_col.cast("bigint"), F.lit(1))
    bucket = F.floor(F.log2(n_tokens)).cast("bigint")
    return (
        df.select(
            F.col(group_col), n_tokens.alias("n_tokens"), bucket.alias("bucket")
        )
        .groupBy(group_col, "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            group_col,
            "bucket",
            # SQL shiftleft takes a column bit count (the pyspark wrapper
            # only accepts a literal int) — 2^bucket, integer-exact;
            # BIGINT 1 so bucket >= 31 doesn't wrap
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
            .cast("bigint")
            .alias("bucket_lo"),
            "n_docs",
            "total_tokens",
        )
    )
