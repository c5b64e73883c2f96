"""Sparse lexical retrieval: BM25 scoring + top-k search over a corpus.

The batch-retrieval primitive of a training-data pipeline: score every
document against a (small) set of keyword queries and keep the top-k per
query — used for targeted corpus audits ("show me the docs that look like
this benchmark prompt") and quality-slice mining.

Scale shape (100 TB corpus, Q queries, T distinct query terms):
- The posting build explodes ONLY rows that survive ``word IN (terms)`` —
  the term filter is applied before the (doc, word) aggregation, so the
  shuffled posting table is bounded by docs-containing-a-query-term, not
  by corpus token count.
- Corpus stats (N, avgdl) and per-term document frequencies are
  metadata-scale single-row / T-row frames, joined in via broadcast.
- The final top-k window partitions by query (Q partitions of candidate
  docs); candidates per query are already down to docs sharing a term.

Everything is Catalyst expressions (split/explode/hash-agg/window) —
no Python on the data path. Reference behavior modeled on the standard
Robertson/Sparck-Jones BM25 (k1=1.2, b=0.75) as in Lucene/Trino docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bricolage_spark.operators.dedup import normalize_text

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, str],
    id_col: str,
    text_col: str,
    *,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int = 10,
) -> DataFrame:
    """Top-k BM25 documents per query.

    ``queries`` maps query_id -> whitespace-separated keyword string.
    Returns (query_id, doc_id, n_terms_matched, score, rank) with
    ``score`` rounded to 4 decimals and rank ties broken by doc_id so the
    result is engine-reproducible.
    """
    spark = docs.sparkSession
    qrows = [
        (qid, term)
        for qid, qtext in sorted(queries.items())
        for term in dict.fromkeys(qtext.lower().split())  # dedup, keep order
    ]
    qterms = spark.createDataFrame(qrows, "query_id string, word string")
    all_terms = sorted({t for _, t in qrows})

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("words"),
    ).select("doc_id", "words", F.size("words").alias("dl"))

    # corpus stats: one row, broadcast into the scoring join
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # postings restricted to query terms BEFORE the aggregation: the
    # explode emits every token but the filter runs in the same codegen
    # stage, so only query-term hits reach the (doc, word) hash-agg.
    postings = (
        tok.select("doc_id", "dl", F.explode("words").alias("word"))
        .filter(F.col("word").isin(all_terms))
        .groupBy("doc_id", "dl", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    dfreq = postings.groupBy("word").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        postings.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )

    per_query = (
        scored.join(F.broadcast(qterms), "word")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_matched"),
            F.round(F.sum("term_score"), 4).alias("score"),
        )
    )

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "doc_id", "n_terms_matched", "score", "rank")
    )
