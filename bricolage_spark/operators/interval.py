"""Bucketed interval (range) join: points-in-interval matching that
stays a hash equi-join at any scale.

The naive formulation — ``points JOIN intervals ON ts BETWEEN start AND
end`` — has no equi-key, so Spark plans a broadcast-nested-loop or
cartesian product: O(|points|·|intervals|) comparisons and a single-task
disaster at 100 TB. The standard fix (as in Databricks' range-join
optimization and the interval-join of stream processors) is binning:

1. pick a bucket width W (ideally ≥ the typical interval length);
2. each point hashes to bucket ``floor(ts / W)``;
3. each interval explodes to the buckets it covers
   (``floor(start/W) … floor((end-1)/W)`` — ≤ 2 rows when intervals are
   shorter than W);
4. equi-join on (keys…, bucket) — a plain shuffled/broadcast hash join —
   then apply the exact ``start <= ts < end`` residual filter.

Every (point, interval) match is produced exactly once: the point lives
in exactly one bucket and the interval covers that bucket exactly once,
so no post-join dedup is needed. Join blowup is bounded by
|intervals| · ceil(len/W + 1) rows on the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: tuple[str, ...] = (),
    how: str = "inner",
) -> DataFrame:
    """Join point rows into [start, end) interval rows via bucketed
    equi-join. Timestamps are plain numeric columns (e.g. epoch micros).

    ``keys`` adds equi-join columns (e.g. user_id) shared by both sides.
    Returns all columns of both inputs (intervals' bucket helper dropped).
    Intervals with ``end <= start`` are empty and match nothing.

    Inner-join only: the residual range predicate is applied as a
    post-join filter, which would silently drop the null-extended rows
    of any outer variant (they fail ``ts >= start``), collapsing it back
    to inner semantics. Rejecting other ``how`` values is safer than
    returning a wrong answer.
    """
    if how != "inner":
        raise ValueError(
            f"bucketed_interval_join supports how='inner' only (got {how!r}): "
            "the residual range filter drops outer-join null rows"
        )
    w = F.lit(bucket_width)
    p = points.withColumn("_ij_bucket", F.floor(F.col(point_ts) / w))
    i = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_ij_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w),
                    F.floor((F.col(end_col) - 1) / w),
                )
            ),
        )
    )
    joined = p.join(i, [*keys, "_ij_bucket"], how).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_ij_bucket")
