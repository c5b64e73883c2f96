"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring how a 100 TB corpus is actually searched:

- ``brute_force_cosine_topk`` — exact baseline. Query set is broadcast
  (it is small by definition); the corpus is scanned once,
  partition-parallel, and top-k per query is a window over (query, sim).
  Dot products run as Catalyst array expressions (zip_with/aggregate) in
  codegen — no Python, no UDF.
- ``lsh_bucketed_topk`` — the scale path: sign-random-projection LSH.
  Deterministic hyperplanes are derived from md5 (engine-independent, no
  stored model); vectors land in 2^n_planes buckets; search touches only
  the query's bucket (± optionally neighboring probes). This bounds the
  scanned fraction at ~1/2^n_planes of the corpus per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bricolage_spark.catalog import spread


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd array expression (left-to-right, double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def unit_vector(col: Column) -> Column:
    """v / ‖v‖ (double) — normalize ONCE per row so the pairwise stage is
    a bare dot product (cosine recomputing ‖·‖ per pair does k× the work)."""
    vd = _as_double(col)
    n = norm(vd)
    return F.transform(vd, lambda x: x / n)


def brute_force_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    Both sides are unit-normalized up front (one pass each), so the
    O(|corpus|·|queries|) stage computes only dot products. Ranking uses
    the rounded similarity (+ id tiebreak) so results are reproducible
    across engines despite last-ulp float differences.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), unit_vector(F.col(vec_col)).alias("q_vec")
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), unit_vector(F.col(vec_col)).alias("c_vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# LSH (sign random projection) — the sub-linear scale path
# ---------------------------------------------------------------------------


def _plane_component(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    md5-derived (engine-independent): u = int(md5("p<plane>|<i>")[:8hex]) /
    2^32 → 2u−1.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(f"p{plane}"), dim_idx.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**32))
    )
    return u * 2.0 - 1.0


def srp_bucket(vec_col: Column, n_planes: int = 8) -> Column:
    """Sign-random-projection bucket id in [0, 2^n_planes)."""
    vd = _as_double(vec_col)
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vd,
                F.sequence(F.lit(0), F.size(vd) - 1),
                lambda x, i: x * _plane_component(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("bigint")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share the query's SRP bucket.

    At scale the corpus side is written bucket-partitioned once
    (``.repartition('bucket')`` / partitionBy on write), so each query
    reads a single partition — this is the IVF-style inverted-list layout.
    """
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        unit_vector(F.col(vec_col)).alias("c_vec"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit_vector(F.col(vec_col)).alias("q_vec"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot(F.col("q_vec"), F.col("c_vec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
