"""Structured Streaming operator tests: batch/stream unification for
values, plus real stream runs (file source → availableNow → memory sink)
for the streaming inventory (SURVEY.md §2.3 streaming items)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bricolage_spark.streaming import windows as W

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

ROWS = [
    (1, "2024-01-01 00:01:00", 1, "click", 1.0),
    (2, "2024-01-01 00:04:00", 1, "click", 2.0),
    (3, "2024-01-01 00:12:00", 2, "view", 3.0),
    (4, "2024-01-01 00:13:00", 2, "view", 4.0),
    (5, "2024-01-01 00:31:00", 1, "click", 5.0),
    (5, "2024-01-01 00:31:00", 1, "click", 5.0),  # duplicate event_id
]


@pytest.fixture()
def events(spark):
    df = spark.createDataFrame(
        ROWS, "event_id long, ts string, user_id long, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_tumbling_counts_batch(events):
    out = {
        (str(r.win_start), r.event_type): r.n
        for r in W.tumbling_counts(events, width="10 minutes").collect()
    }
    assert out[("2024-01-01 00:00:00", "click")] == 2
    assert out[("2024-01-01 00:10:00", "view")] == 2
    assert out[("2024-01-01 00:30:00", "click")] == 2


def test_sliding_counts_batch(events):
    rows = W.sliding_counts(events, width="10 minutes", slide="5 minutes").collect()
    # event at 00:01 belongs to windows [23:55,00:05) and [00:00,00:10)
    starts_for_1 = [str(r.win_start) for r in rows if r.n >= 1]
    assert "2024-01-01 00:00:00" in starts_for_1


def test_session_counts_batch(events):
    rows = W.session_counts(events, gap="5 minutes").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.n_events)
    # user 1: events at 00:01+00:04 in one session; 00:31 (x2) another
    assert sorted(by_user[1]) == [2, 2]
    assert by_user[2] == [2]


def test_dedup_batch(events):
    out = W.dedup_within_watermark(events, ["event_id"])
    assert out.count() == 5


def test_stream_file_source_end_to_end(spark, tmp_path):
    """The real thing: file-source stream, watermark, availableNow, memory
    sink, checkpoint resume on new files."""
    src = tmp_path / "stream_in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    out_dir = str(tmp_path / "stream_out")
    write_batch("b1.json", [
        {"event_id": 1, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01T00:12:00", "user_id": 2, "event_type": "view", "value": 2.0},
    ])

    def run_pass():
        stream = W.read_event_stream(spark, str(src), SCHEMA)
        assert stream.isStreaming
        q = (
            stream.select("event_id", "ts", "event_type", "value")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_pass()
    assert spark.read.parquet(out_dir).count() == 2

    # new file arrives → the checkpoint-resumed query processes ONLY it
    write_batch("b2.json", [
        {"event_id": 3, "ts": "2024-01-01T00:13:00", "user_id": 2, "event_type": "view", "value": 3.0},
    ])
    run_pass()
    assert spark.read.parquet(out_dir).count() == 3  # no reprocessing of b1


def test_stream_dedup_run(spark, tmp_path):
    src = tmp_path / "dedup_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for eid in (1, 1, 2):
            f.write(
                json.dumps(
                    {"event_id": eid, "ts": "2024-01-01T00:01:00", "user_id": 1,
                     "event_type": "click", "value": 1.0}
                ) + "\n"
            )
    stream = W.read_event_stream(spark, str(src), SCHEMA)
    dd = W.dedup_within_watermark(stream, ["event_id"], watermark="10 minutes")
    q = W.run_to_memory_sink(dd, "dedup_out", str(tmp_path / "ck2"), mode="append")
    q.awaitTermination(60)
    assert spark.sql("select * from dedup_out").count() == 2


def test_stateful_counts_update_mode(spark, tmp_path):
    src = tmp_path / "state_in"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for et in ("a", "a", "b"):
            f.write(
                json.dumps(
                    {"event_id": 1, "ts": "2024-01-01T00:01:00", "user_id": 1,
                     "event_type": et, "value": 1.0}
                ) + "\n"
            )
    stream = W.read_event_stream(spark, str(src), SCHEMA)
    counts = W.stateful_running_counts(stream)
    q = (
        counts.writeStream.format("memory")
        .queryName("state_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {r.event_type: r.n for r in spark.sql("select * from state_out").collect()}
    assert out == {"a": 2, "b": 1}


GOOD = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)


def test_curate_stream_filters_redacts_and_dedups(spark, tmp_path):
    """Streaming ingest curation: repetition filter + PII redaction +
    watermark-bounded digest dedup over a real file-source stream."""
    from bricolage_spark.streaming.curation import curate_stream

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    spam = ("buy cheap pills now " * 10).strip()
    rows = [
        {"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": GOOD + " contact a@b.com"},
        {"doc_id": 2, "ts": "2024-01-01T00:01:00", "text": spam},
        # same content as doc 1 behind a different email → same digest
        {"doc_id": 3, "ts": "2024-01-01T00:02:00", "text": GOOD + " contact z@y.org"},
    ]
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema(doc_schema).json(str(src))
    curated = curate_stream(stream, watermark="1 hour")
    assert curated.isStreaming
    q = (
        curated.writeStream.format("memory")
        .queryName("curated_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("select * from curated_docs").collect()
    # spam dropped; docs 1 and 3 collapse post-redaction to one kept row
    assert len(out) == 1
    kept = out[0]
    assert kept.doc_id in (1, 3)
    assert "<EMAIL>" in kept.text and "@" not in kept.text.replace("<EMAIL>", "")

    # batch parity: the same pipeline on a batch frame keeps the same set
    batch = spark.createDataFrame(
        [(r["doc_id"], r["ts"].replace("T", " "), r["text"]) for r in rows],
        "doc_id long, ts string, text string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bout = curate_stream(batch, watermark="1 hour").collect()
    assert len(bout) == 1 and bout[0].content_digest == kept.content_digest


def test_curate_stream_dsir_gate_over_real_stream(spark, tmp_path):
    """The DSIR gate runs INSIDE the micro-batch scan (array-literal
    predicate, no stream-side join/state) and keeps exactly the docs
    the batch path keeps at the same min-weight."""
    from bricolage_spark.operators.textual import dsir_log_ratio_table
    from bricolage_spark.streaming.curation import curate_stream

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    target_like = GOOD  # fit target = the GOOD exemplar text
    other = "completely different words about sailing ships and distant harbors tonight"
    fit = spark.createDataFrame(
        [(0, target_like), (1, other)], "doc_id long, text string"
    )
    ratio = dsir_log_ratio_table(fit, "text", F.col("doc_id") == 0).persist()
    try:
        src = tmp_path / "dsir_in"
        src.mkdir()
        rows = [
            {"doc_id": 10, "ts": "2024-01-01T00:00:00", "text": target_like},
            {"doc_id": 11, "ts": "2024-01-01T00:01:00", "text": other},
        ]
        with open(src / "b1.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema(doc_schema).json(str(src))
        curated = curate_stream(
            stream,
            watermark="1 hour",
            classifier_threshold=None,
            dsir_ratio=ratio,
            dsir_min_weight=0.0,
        )
        q = (
            curated.writeStream.format("memory")
            .queryName("dsir_curated")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "dsir_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {r.doc_id for r in spark.sql("select * from dsir_curated").collect()}
        assert got == {10}  # target-like kept, raw-like dropped

        batch = spark.createDataFrame(
            [(r["doc_id"], r["ts"].replace("T", " "), r["text"]) for r in rows],
            "doc_id long, ts string, text string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        bout = curate_stream(
            batch,
            watermark="1 hour",
            classifier_threshold=None,
            dsir_ratio=ratio,
            dsir_min_weight=0.0,
        )
        assert {r.doc_id for r in bout.collect()} == got
    finally:
        ratio.unpersist(blocking=False)


def test_interval_join_batch_values(spark, events):
    """Batch check of interval_join_stream values: points within
    [start, start+10min) of each interval event match."""
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00"), (101, "2024-01-01 00:10:00")],
        "window_id long, start_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp"))
    out = W.interval_join_stream(
        events.select("event_id", "ts"), intervals, window_us=600_000_000
    ).collect()
    got = sorted({(r.window_id, r.event_id) for r in out})
    # [00:00,00:10): events 1,2 ; [00:10,00:20): events 3,4
    assert got == [(100, 1), (100, 2), (101, 3), (101, 4)]


def test_interval_join_stream_stream_run(spark, tmp_path):
    """Real stream-stream range join: both sides are file-source streams
    with watermarks; Spark bounds the join state from the range + the
    watermarks (no unbounded buffering)."""
    psrc = tmp_path / "ij_points"; psrc.mkdir()
    isrc = tmp_path / "ij_intervals"; isrc.mkdir()
    with open(psrc / "p1.json", "w") as f:
        for e in [
            {"event_id": 1, "ts": "2024-01-01T00:01:00"},
            {"event_id": 2, "ts": "2024-01-01T00:12:00"},
            {"event_id": 3, "ts": "2024-01-01T00:25:00"},
        ]:
            f.write(json.dumps(e) + "\n")
    with open(isrc / "i1.json", "w") as f:
        for w in [
            {"window_id": 100, "start_ts": "2024-01-01T00:00:00"},
            {"window_id": 101, "start_ts": "2024-01-01T00:10:00"},
        ]:
            f.write(json.dumps(w) + "\n")
    pschema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    ischema = T.StructType([
        T.StructField("window_id", T.LongType()),
        T.StructField("start_ts", T.TimestampType()),
    ])
    pts = spark.readStream.schema(pschema).json(str(psrc))
    ivs = spark.readStream.schema(ischema).json(str(isrc))
    joined = W.interval_join_stream(pts, ivs, window_us=600_000_000)
    assert joined.isStreaming
    q = W.run_to_memory_sink(joined, "ij_sink", str(tmp_path / "ij_ckpt"))
    q.awaitTermination(120)
    rows = spark.sql("select window_id, event_id from ij_sink").collect()
    got = sorted({(r.window_id, r.event_id) for r in rows})
    assert got == [(100, 1), (101, 2)]  # event 3 (00:25) matches no window


def test_curate_batch_against_history_two_snapshots_and_replay(spark, tmp_path):
    """foreachBatch history near-dedup: snapshot 2 drops docs that
    near-duplicate snapshot 1; replaying snapshot 2 (resume/retry) is
    idempotent — own bands are excluded from the probe and the registry
    write is insert-delta style, so nothing double-appends."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import curate_batch_against_history

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh"))
    base = "the quick brown fox jumps over the lazy dog tonight again"
    other = "completely different words about sailing ships and distant harbors"
    snap1 = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    snap2 = spark.createDataFrame(
        [(10, base), (11, other)], "doc_id long, text string"
    )

    kept1 = curate_batch_against_history(
        snap1, engine, "reg", snapshot="s1"
    ).collect()
    assert [r.doc_id for r in kept1] == [1]  # empty registry keeps all

    kept2 = curate_batch_against_history(
        snap2, engine, "reg", snapshot="s2"
    )
    assert {r.doc_id for r in kept2.collect()} == {11}  # 10 dups history

    reg_rows = engine.table("reg").count()
    # replay snapshot 2: same verdict, registry unchanged in size
    kept2b = curate_batch_against_history(
        snap2, engine, "reg", snapshot="s2"
    )
    assert {r.doc_id for r in kept2b.collect()} == {11}
    assert engine.table("reg").count() == reg_rows
    assert set(
        r.snapshot for r in engine.table("reg").select("snapshot").distinct().collect()
    ) == {"s1", "s2"}


def test_span_scrub_batch_against_history_two_snapshots_and_replay(
    spark, tmp_path
):
    """foreachBatch SPAN dedup (q110's streaming column): snapshot 2
    loses exactly the >= min_span word spans that duplicate snapshot 1
    (novel docs verbatim, NULL text passthrough), the registry reflects
    the SCRUBBED text, and a labeled replay is verdict-stable."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import (
        span_scrub_batch_against_history,
    )

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh"))
    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"  # 14 tokens
    snap1 = spark.createDataFrame(
        [(1, f"history carries the run {run} in context")],
        "doc_id long, text string",
    )
    snap2 = spark.createDataFrame(
        [
            (10, f"Fresh crawl page repeating {run} then novel tail words"),
            (11, "A genuinely Novel document with no history overlap at all"),
            (12, None),
        ],
        "doc_id long, text string",
    )
    out1 = span_scrub_batch_against_history(
        snap1, engine, "span_stream_reg", snapshot="s1"
    ).collect()
    assert len(out1) == 1 and out1[0].text.startswith("history carries")
    seeded = engine.table("span_stream_reg").count()
    assert seeded > 0

    out2 = {
        r.doc_id: r.text
        for r in span_scrub_batch_against_history(
            snap2, engine, "span_stream_reg", snapshot="s2"
        ).collect()
    }
    assert out2[10] == "fresh crawl page repeating then novel tail words"
    assert out2[11] == "A genuinely Novel document with no history overlap at all"
    assert out2[12] is None
    # registry holds the SCRUBBED batch's anchors (the run is gone from
    # s2's published text, so its interior anchors appear only once,
    # from s1)
    reg = engine.table("span_stream_reg")
    assert {
        r.snapshot for r in reg.select("snapshot").distinct().collect()
    } == {"s1", "s2"}
    # labeled replay: same verdicts (own snapshot excluded from probe)
    out2b = {
        r.doc_id: r.text
        for r in span_scrub_batch_against_history(
            snap2, engine, "span_stream_reg", snapshot="s2"
        ).collect()
    }
    assert out2b == out2


def test_streaming_foreachbatch_history_sink(spark, tmp_path):
    """The documented foreachBatch recipe end-to-end: a file-source
    stream runs curate_stream inside the micro-batch, the sink body
    probes the band registry via curate_batch_against_history and
    appends survivors to a curated table; a second batch containing a
    near-dup of batch 1 is dropped by the history probe."""
    import json as _json

    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import (
        curate_batch_against_history,
        curate_stream,
    )

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh"))
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = tmp_path / "stream_in"
    src.mkdir()
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": base}) + "\n")

    def run_stream(epoch_tag):
        stream = spark.readStream.schema(doc_schema).json(str(src))
        curated = curate_stream(stream, watermark="1 hour", classifier_threshold=None)

        def sink(batch_df, epoch_id):
            if batch_df.isEmpty():
                return
            kept = curate_batch_against_history(
                batch_df, engine, "stream_reg", snapshot=f"{epoch_tag}-{epoch_id}"
            )
            engine.save_table(
                kept,
                "curated_corpus",
                mode="append" if engine.table_exists("curated_corpus") else "overwrite",
            )

        q = (
            curated.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{epoch_tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream("s1")
    assert engine.table("curated_corpus").count() == 1

    # batch 2: one near-dup of batch 1 (one word changed), one novel doc
    with open(src / "b2.json", "w") as f:
        f.write(_json.dumps({"doc_id": 10, "ts": "2024-01-01T01:00:00",
                             "text": base.replace("tango", "uniform")}) + "\n")
        f.write(_json.dumps({"doc_id": 11, "ts": "2024-01-01T01:01:00",
                             "text": "entirely novel content about deep sea "
                                     "creatures and their bioluminescent organs "
                                     "glowing in the abyssal dark zone"}) + "\n")
    run_stream("s2")
    kept_ids = sorted(r.doc_id for r in engine.table("curated_corpus").collect())
    assert 1 in kept_ids and 11 in kept_ids
    assert 10 not in kept_ids  # near-dup of history: dropped by the probe


def test_curate_batch_pre_label_history_survives_labeled_runs(spark, tmp_path):
    """A registry written BEFORE snapshot labels existed (no snapshot
    column, or NULL-labeled rows) must stay probe-visible and survive a
    labeled run's insert-delta rewrite — and the schemas must align so
    the snapshot column's existence never depends on which parquet
    footer a reader picks."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import curate_batch_against_history

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh"))
    base = "the quick brown fox jumps over the lazy dog tonight again"
    other = "completely different words about sailing ships and distant harbors"

    # run 1: UNLABELED (legacy) — registry has no snapshot column
    kept1 = curate_batch_against_history(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        engine,
        "reg2",
    ).collect()
    assert [r.doc_id for r in kept1] == [1]
    assert "snapshot" not in engine.table("reg2").columns

    # run 2: labeled — the legacy history must still drop the dup, and
    # the rewrite must keep it (as NULL-labeled rows, schema aligned)
    kept2 = curate_batch_against_history(
        spark.createDataFrame([(10, base), (11, other)], "doc_id long, text string"),
        engine,
        "reg2",
        snapshot="s2",
    )
    assert {r.doc_id for r in kept2.collect()} == {11}
    reg = engine.table("reg2")
    assert "snapshot" in reg.columns
    labels = {r.snapshot for r in reg.select("snapshot").distinct().collect()}
    assert labels == {None, "s2"}
    n_null = reg.where(reg.snapshot.isNull()).count()
    assert n_null > 0  # legacy bands survived the labeled rewrite

    # replaying the labeled run keeps the NULL-labeled history intact
    total = reg.count()
    curate_batch_against_history(
        spark.createDataFrame([(10, base), (11, other)], "doc_id long, text string"),
        engine,
        "reg2",
        snapshot="s2",
    ).collect()
    reg = engine.table("reg2")
    assert reg.count() == total
    assert reg.where(reg.snapshot.isNull()).count() == n_null


def test_curate_batch_null_text_docs_dedup_as_empty_content(spark, tmp_path):
    """NULL/empty text normalizes to the SAME empty shingle — so empty
    docs are near-duplicates of EACH OTHER: the first one ingested
    survives and seeds the registry, every later one is dropped as a
    dup of that empty content (re-ingesting nothing is still a dup)."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import curate_batch_against_history

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh_nb"))
    base = "the quick brown fox jumps over the lazy dog tonight again"

    kept1 = {
        r.doc_id
        for r in curate_batch_against_history(
            spark.createDataFrame(
                [(1, base), (2, None)], "doc_id long, text string"
            ),
            engine,
            "reg_nb",
        ).collect()
    }
    assert kept1 == {1, 2}  # seeding run keeps both (2 seeds "empty")

    kept2 = {
        r.doc_id
        for r in curate_batch_against_history(
            spark.createDataFrame(
                [(10, base), (11, None), (12, "completely different "
                 "words about sailing ships and distant harbors")],
                "doc_id long, text string",
            ),
            engine,
            "reg_nb",
        ).collect()
    }
    # 10 dups history text; 11 dups history EMPTY content; 12 is new
    assert kept2 == {12}


def test_probe_and_update_registry_labeled_replay_idempotent(spark, tmp_path):
    """The band-family-generic registry half: a labeled run re-executed
    with the SAME snapshot returns the same keep set and leaves the
    registry byte-identical (insert-delta rewrite), for an arbitrary
    synthetic band table (no text/embedding derivation involved)."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import probe_and_update_registry

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh_pr"))

    def bands_df(rows):
        return spark.createDataFrame(
            rows, "doc_id long, band_id int, band_hash string"
        )

    # snapshot A seeds buckets x/y
    k1 = probe_and_update_registry(
        bands_df([(1, 0, "x"), (1, 1, "y"), (2, 0, "z")]),
        engine, "generic_reg", "doc_id", snapshot="A",
    )
    assert {r.doc_id for r in k1.collect()} == {1, 2}

    # snapshot B: doc 10 hits bucket x -> dropped; doc 11 is new
    b2 = bands_df([(10, 0, "x"), (11, 0, "w")])
    k2 = {r.doc_id for r in probe_and_update_registry(
        b2, engine, "generic_reg", "doc_id", snapshot="B").collect()}
    assert k2 == {11}
    reg_rows = sorted(
        (r.band_id, r.band_hash, r.snapshot)
        for r in engine.table("generic_reg").collect()
    )

    # replay snapshot B: identical keeps, identical registry
    k3 = {r.doc_id for r in probe_and_update_registry(
        b2, engine, "generic_reg", "doc_id", snapshot="B").collect()}
    assert k3 == k2
    assert sorted(
        (r.band_id, r.band_hash, r.snapshot)
        for r in engine.table("generic_reg").collect()
    ) == reg_rows


def test_curate_stream_bpe_token_counts_over_real_stream(spark, tmp_path):
    """With a q95-induced merge table, curate_stream annotates each kept
    doc with its real BPE token count — a row-local expression fused
    into the micro-batch scan (zero stream state), matching the batch
    path's bpe_encode count on the SAME published (post-redaction)
    text."""
    from bricolage_spark.operators.textual import (
        bpe_encode,
        bpe_merge_candidates,
    )
    from bricolage_spark.streaming.curation import curate_stream

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        {"doc_id": 20, "ts": "2024-01-01T00:00:00", "text": GOOD},
        {"doc_id": 21, "ts": "2024-01-01T00:01:00", "text": GOOD + " extra tail words here"},
    ]
    fit = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id long, text string"
    )
    merges = [
        (r.s1, r.s2)
        for r in bpe_merge_candidates(fit, "doc_id", "text", top_n=10).collect()
    ]
    src = tmp_path / "bpe_in"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(doc_schema).json(str(src))
    curated = curate_stream(
        stream,
        watermark="1 hour",
        classifier_threshold=None,
        bpe_merges=merges,
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("bpe_curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bpe_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.doc_id: (r.n_tokens, r.text)
        for r in spark.sql("select * from bpe_curated").collect()
    }
    assert set(got) == {20, 21}
    # batch mirror: encode the PUBLISHED text with the same table
    pub = spark.createDataFrame(
        [(d, t) for d, (_n, t) in got.items()], "doc_id long, text string"
    )
    mirror = {
        r.doc_id: r.n_tokens
        for r in bpe_encode(pub, "doc_id", "text", merges).collect()
    }
    assert {d: n for d, (n, _t) in got.items()} == mirror
    assert got[21][0] > got[20][0]  # longer doc, more tokens


def test_curate_stream_eval_split_over_real_stream(spark, tmp_path):
    """eval_split=True fuses q106's content-keyed split assignment into
    the micro-batch scan (row-local, zero state): every kept doc carries
    (split, split_bucket), and the assignment equals the batch
    assign_eval_split operator's on the SAME published text — the
    stream/batch co-assignment guarantee that makes re-crawled docs
    land in the same bucket forever."""
    from bricolage_spark.operators.curation import assign_eval_split
    from bricolage_spark.streaming.curation import curate_stream

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = [
        {"doc_id": 30 + i, "ts": f"2024-01-01T00:0{i}:00",
         "text": GOOD + f" variant tail {i}"}
        for i in range(5)
    ]
    src = tmp_path / "split_in"
    src.mkdir()
    with open(src / "s1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(doc_schema).json(str(src))
    curated = curate_stream(
        stream,
        watermark="1 hour",
        classifier_threshold=None,
        eval_split=True,
        split_val_pct=30,
        split_test_pct=30,
    )
    q = (
        curated.writeStream.format("memory")
        .queryName("split_curated")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "split_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.doc_id: (r.split, r.split_bucket, r.text)
        for r in spark.sql("select * from split_curated").collect()
    }
    assert set(got) == {30, 31, 32, 33, 34}
    assert all(s in ("train", "val", "test") for s, _b, _t in got.values())
    # batch mirror on the published text: identical assignment
    pub = spark.createDataFrame(
        [(d, t) for d, (_s, _b, t) in got.items()], "doc_id long, text string"
    )
    mirror = {
        r.doc_id: (r.split, r.split_bucket)
        for r in assign_eval_split(
            pub, "text", val_pct=30, test_pct=30
        ).collect()
    }
    assert {d: (s, b) for d, (s, b, _t) in got.items()} == mirror


def test_span_registry_layout_flip_raises_not_reseeds(spark, tmp_path):
    """Flipping registry-buckets between 0 and N on an existing
    deployment must NOT return None (the caller would then seed a fresh
    registry and silently abandon all span-dedup history) — both flip
    directions raise with a migration hint; absent registries still
    return None."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.exception import JobFailure
    from bricolage_spark.streaming.curation import span_registry_prior

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh_flip"))
    rows = spark.createDataFrame([(f"h{i}",) for i in range(10)], "ahash string")

    engine.save_table(rows, "flip_plain")
    with pytest.raises(JobFailure, match="PLAIN"):
        span_registry_prior(engine, "flip_plain", n_buckets=4)
    assert span_registry_prior(engine, "flip_plain", 0).count() == 10

    engine.save_table_bucketed(rows, "flip_bkt", "ahash", 4)
    try:
        with pytest.raises(JobFailure, match="BUCKETED"):
            span_registry_prior(engine, "flip_bkt", n_buckets=0)
        assert span_registry_prior(engine, "flip_bkt", 4).count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS flip_bkt")

    # genuinely-new registries: None in both layouts
    assert span_registry_prior(engine, "flip_none", 0) is None
    assert span_registry_prior(engine, "flip_none", 4) is None


def test_probe_verdicts_survive_corrupt_duplicate_snapshot_registry(
    spark, tmp_path
):
    """Poisoned-registry robustness: a registry corrupted with the same
    key under TWO conflicting snapshot labels (a crashed migration's
    double-append) must not flip any probe verdict — existence joins
    are duplicate-insensitive, and a labeled probe that excludes its
    own snapshot still sees the other label's row."""
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import probe_and_update_registry

    engine = SparkEngine(spark, warehouse=str(tmp_path / "wh_corrupt"))
    # corrupt registry: bucket x exists under BOTH snapshots A and B,
    # with a stray exact duplicate of the A row for good measure
    engine.save_table(
        spark.createDataFrame(
            [
                (0, "x", "A"),
                (0, "x", "A"),
                (0, "x", "B"),
                (1, "y", "B"),
            ],
            "band_id int, band_hash string, snapshot string",
        ),
        "corrupt_reg",
    )
    batch = spark.createDataFrame(
        [(10, 0, "x"), (11, 1, "y"), (12, 0, "w")],
        "doc_id long, band_id int, band_hash string",
    )
    # probe under snapshot B: doc 10 still dropped (x survives via A's
    # row after B's own label is excluded), doc 11 KEPT (y exists only
    # under the excluded label B), doc 12 novel
    kept = {
        r.doc_id
        for r in probe_and_update_registry(
            batch, engine, "corrupt_reg", "doc_id", snapshot="B"
        ).collect()
    }
    assert kept == {11, 12}
    # replay is verdict-stable on the still-messy registry
    kept2 = {
        r.doc_id
        for r in probe_and_update_registry(
            batch, engine, "corrupt_reg", "doc_id", snapshot="B"
        ).collect()
    }
    assert kept2 == kept
    # the conflicting-label A rows are untouched (only B was rewritten)
    a_rows = engine.table("corrupt_reg").where(F.col("snapshot") == "A")
    assert a_rows.count() == 2
