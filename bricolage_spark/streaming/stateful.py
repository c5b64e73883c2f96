"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful construct is the load-log table; Spark's
arbitrary-state API is the idiomatic generalization (SURVEY.md §2.3:
"custom stateful operators"). Implemented here: per-user sessionization
with inactivity timeout — the canonical pattern a built-in
``session_window`` can't cover once you need custom per-session payloads
(event counts by type, first/last values, emitted exactly at timeout).

Works on batch frames too (groupBy fallback) so values are unit-testable;
the stream path uses GroupState with event-time timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("closed_reason", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start", TimestampType()),
        StructField("end", TimestampType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _sessionize_group_fn(gap_ms: int, tz: str):
    """Build the per-group state function for one (gap, session-tz)
    configuration — the gap must come from the caller's ``gap_minutes``
    (a hardcoded constant here would silently disagree with the
    watermark and the batch fallback for any other gap), and the epoch
    conversion must know the SESSION timezone: Arrow hands the UDF
    tz-naive timestamps in session-local time, and a bare
    ``.timestamp()`` would read them as UTC — 8 h of skew on a
    PST-pinned session, enough to land the timeout at/below the
    watermark. (This repo pins sessions to UTC; the localization keeps
    the operator correct for sessions that don't.)"""

    def _epoch_ms(ts: pd.Timestamp) -> int:
        if ts.tzinfo is None:
            ts = ts.tz_localize(tz)
        return int(ts.timestamp() * 1000)

    def _sessionize_group(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this micro-batch's events for one user into session
        state; emit the session when the inactivity timeout fires."""
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": start,
                        "session_end": end,
                        "n_events": n,
                        "total_value": total,
                        "closed_reason": "timeout",
                    }
                ]
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        ts_min, ts_max = rows["ts"].min(), rows["ts"].max()
        n_new, total_new = len(rows), float(rows["value"].sum())
        if state.exists:
            start, end, n, total = state.get
            state.update(
                (min(start, ts_min), max(end, ts_max), n + n_new, total + total_new)
            )
        else:
            state.update((ts_min, ts_max, n_new, total_new))
        # inactivity gap of event time beyond the newest event — clamped
        # to just past the CURRENT watermark: a micro-batch whose files
        # carry events older than (watermark − gap) would otherwise ask
        # for a timeout in the past, which GroupState rejects
        # (INVALID_TIMEOUT_TIMESTAMP — surfaced by the r16 stream
        # profile, where real unordered parquet chunks put 2h-old
        # events behind a later file's watermark). watermark+1 fires at
        # the next trigger: exactly "the inactivity gap has already
        # passed" semantics for such a session.
        state.setTimeoutTimestamp(
            max(_epoch_ms(ts_max) + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            columns=[f.name for f in SESSION_SCHEMA.fields]
        )  # nothing emitted until the session closes

    return _sessionize_group


def sessionize(df: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Per-user sessions with custom payload.

    Streaming input → applyInPandasWithState (event-time timeout emits
    closed sessions). Batch input → equivalent gap-based fold with window
    functions, so tests can assert exact values.
    """
    if df.isStreaming:
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC") or "UTC"
        return (
            df.withWatermark("ts", f"{gap_minutes} minutes")
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group_fn(gap_minutes * 60 * 1000, tz),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    # batch fallback: classic gaps-and-islands
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.lit(gap_minutes * 60)
    flagged = df.withColumn(
        "new_session",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1, 0).over(w)
            > gap
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.lit("batch").alias("closed_reason"),
    ).drop("session_id")
