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
    scored = df.select(F.col(id_col), *cols.values())
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
    len_sig = F.least(F.greatest((n_chars - 100) / 900.0, F.lit(0.0)), F.lit(1.0))
    stop_sig = F.least(stop_ratio / 0.05, F.lit(1.0))
    punct_sig = F.least(F.greatest(1.0 - punct_ratio / 0.2, F.lit(0.0)), F.lit(1.0))
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_wlen.alias("avg_word_len"),
        F.round((len_sig + stop_sig + punct_sig) / 3.0, 4).alias("quality"),
    )


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Document fingerprint: md5 digest + min-shingle rolling-hash sketch.

    (id, digest, min_shingle_hash): the digest detects exact dups; the
    min-hash of word k-shingles is a 1-value MinHash — a cheap similarity
    sketch (equal sketches ⇒ likely near-dup candidates).
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return spread(df, id_col).select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("digest"),
        F.array_min(F.transform(shingles, lambda s: hash32(s, 0))).alias(
            "min_shingle_hash"
        ),
    )
