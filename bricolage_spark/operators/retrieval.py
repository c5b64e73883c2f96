"""Sparse lexical retrieval: BM25 scoring + top-k search over a corpus.

The batch-retrieval primitive of a training-data pipeline: score every
document against a (small) set of keyword queries and keep the top-k per
query — used for targeted corpus audits ("show me the docs that look like
this benchmark prompt") and quality-slice mining.

Scale shape (100 TB corpus, Q queries, T distinct query terms):
- The posting build explodes ONLY rows that survive ``word IN (terms)`` —
  the term filter runs in the same codegen stage as the explode, so the
  shuffled posting table is bounded by docs-containing-a-query-term, not
  by corpus token count.
- Corpus statistics (N, avgdl) and per-term document frequencies are
  INDEX METADATA, and they stay in-plan: stats are a 1-row broadcast
  cross join, per-term df is a T-row broadcast built from the postings
  (each (doc, word) posting is unique, so df_t = COUNT(*) per word) —
  the same split Lucene makes (df/norms at index-build time), with no
  eager metadata job and no data-sized collect anywhere.
- Query-term → query-id fan-out is a literal array mapping (terms and
  queries are driver-known), so scoring is one job: scan → explode+filter
  → (doc, word) hash-agg → score → per-query top-k window over an
  already candidate-restricted frame.

Everything on the data path is Catalyst expressions (split/explode/
hash-agg/window) — no Python. Reference behavior modeled on the standard
Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75) as in Lucene/Trino docs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bricolage_spark.catalog import spread
from bricolage_spark.operators.dedup import normalize_text

BM25_K1 = 1.2
BM25_B = 0.75


def _literal_map(col: Column, mapping: dict[str, Column], default: Column) -> Column:
    """CASE-WHEN chain for a driver-known key → value mapping."""
    return reduce(
        lambda acc, kv: F.when(col == kv[0], kv[1]).otherwise(acc),
        mapping.items(),
        default,
    )


def bm25_index(
    docs: DataFrame,
    all_terms: list[str],
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """The two tables a BM25 index persists, as lazy DataFrames:

    - postings ``(doc_id, dl, word, tf)`` restricted to ``all_terms`` —
      the term filter runs in the same codegen stage as the explode, so
      the (doc, word) hash-agg shuffle is bounded by query-term hits,
      never corpus tokens;
    - corpus stats ``(_n_docs, _avgdl)`` — one row.

    Callers that serve many query batches over one corpus persist both
    (the Lucene split: df/norms are written at index-build time) and
    pass them to :func:`bm25_topk`; one-shot callers let ``bm25_topk``
    inline them into a single lazy DAG.
    """
    # spread(): parallelize the split/explode stages when the input scan
    # is under-partitioned (single-split toy parquet); no-op at scale
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("words"),
    ).select("doc_id", "words", F.size("words").alias("dl"))

    postings = (
        tok.select("doc_id", "dl", F.explode("words").alias("word"))
        .filter(F.col("word").isin(all_terms))
        .groupBy("doc_id", "dl", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    corpus = tok.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("dl").alias("_avgdl"),
    )
    return postings, corpus


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, str],
    id_col: str,
    text_col: str,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 10,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-k BM25 documents per query.

    ``queries`` maps query_id -> whitespace-separated keyword string.
    ``index`` optionally supplies staged ``bm25_index`` tables (postings,
    corpus stats) so serve time pays no corpus pass at all.
    Returns (query_id, doc_id, n_terms_matched, score, rank) with
    ``score`` rounded to 4 decimals and rank ties broken by doc_id so the
    result is engine-reproducible.
    """
    term_queries: dict[str, list[str]] = {}
    for qid, qtext in sorted(queries.items()):
        for term in dict.fromkeys(qtext.lower().split()):
            term_queries.setdefault(term, []).append(qid)
    all_terms = sorted(term_queries)

    postings, corpus = index or bm25_index(docs, all_terms, id_col, text_col)

    # Index metadata stays IN-PLAN (no eager collect): corpus stats are
    # a 1-row broadcast cross join, and per-term document frequency
    # falls out of the postings themselves — each (doc, word) posting is
    # unique, so df_t = COUNT(*) per word, a T-row broadcast. Same
    # values as a dedicated metadata scan, one lazy DAG.
    dfreq = postings.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = postings.join(F.broadcast(dfreq), "word").crossJoin(F.broadcast(corpus))

    idf = F.log(1.0 + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5))
    term_score = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl")))
    )

    qid_col = _literal_map(
        F.col("word"),
        {t: F.array(*[F.lit(q) for q in qids]) for t, qids in term_queries.items()},
        F.array(),
    )

    per_query = (
        scored.withColumn("term_score", term_score)
        .withColumn("query_id", F.explode(qid_col))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.round(F.sum("term_score"), 4).alias("score"),
        )
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "n_terms_matched", "score", "rank")
    )
