"""Structured Streaming operators (SURVEY.md §2.3 streaming inventory).

The idiomatic-Spark counterpart of the reference's micro-batch loader:
each function takes a (possibly streaming) DataFrame with an event-time
column and returns the transformed frame. They work identically on batch
frames, which is how the unit tests verify values (Structured Streaming's
batch/stream unification), plus dedicated stream tests run them with a
file source + checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame, ts_col: str = "ts", width: str = "10 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window counts (+ value sum)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame, ts_col: str = "ts", width: str = "10 minutes",
    slide: str = "5 minutes", watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding window counts."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )


def session_counts(
    df: DataFrame, ts_col: str = "ts", gap: str = "5 minutes",
    key: str = "user_id", watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session-window aggregation (gap-based, per key)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming dedup: keep the first event per key within the watermark
    (state is bounded by the watermark horizon)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stateful_running_counts(df: DataFrame, key: str = "event_type") -> DataFrame:
    """Running per-key counts (update-mode sink at stream time)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))


def read_event_stream(spark, dir_path: str, schema) -> DataFrame:
    """File-source stream: new files under ``dir_path`` become micro-
    batches (the Structured-Streaming twin of streaming_load's queue)."""
    return spark.readStream.schema(schema).json(dir_path)


def run_to_memory_sink(
    stream_df: DataFrame, name: str, checkpoint: str, mode: str = "append"
):
    """Start a query into an in-memory table (tests / inspection)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    window_us: int = 600_000_000,
    keys: list[str] | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream interval join: match point events into
    [start, start + window_us) interval events.

    The streaming twin of ``operators.interval.bucketed_interval_join``,
    and the binning is MANDATORY here: Structured Streaming rejects
    stream-stream joins without an equality predicate, and a pure
    time-range condition has none. Bucketing ``floor(epoch/W)`` on both
    sides (the interval explodes to the ≤2 buckets it covers, since its
    length equals the bucket width) supplies the equi-key; the exact
    range condition rides along as the residual, and together with the
    two watermarks it bounds the join state to the watermark horizon —
    not the stream length. Each (point, interval) pair matches exactly
    once (a point lives in one bucket; the interval covers it once).

    On batch frames the same expression runs as a plain hash join
    (Spark's batch/stream unification), which is how tests verify values.
    """
    if points.isStreaming:
        points = points.withWatermark(point_ts, watermark)
    if intervals.isStreaming:
        intervals = intervals.withWatermark(start_col, watermark)
    w = F.lit(window_us)
    p = points.withColumn(
        "_ij_bucket", F.floor(F.unix_micros(F.col(point_ts)) / w)
    )
    start_us = F.unix_micros(F.col(start_col))
    i = intervals.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(
                F.floor(start_us / w), F.floor((start_us + window_us - 1) / w)
            )
        ),
    )
    cond = (
        (p["_ij_bucket"] == i["_ij_bucket"])
        & (F.col(point_ts) >= F.col(start_col))
        & (
            F.unix_micros(F.col(point_ts))
            < F.unix_micros(F.col(start_col)) + window_us
        )
    )
    for k in keys or []:
        cond = cond & (p[k] == i[k])
    return p.join(i, cond, "inner").drop("_ij_bucket")
