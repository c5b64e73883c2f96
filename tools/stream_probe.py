"""Streaming-path throughput probe (r12): measured micro-batch rows/sec
for the two Structured Streaming pipelines, at 1x and 64x corpus scale.

The batch side has octaves (scale_probe.py, octave_iterative.py); this
is the missing scale dimension for the STREAM side:

- **stateless + watermark-dedup pipeline** (`curate_stream`): quality
  gates, classifier, PII redaction, digest dedup within the watermark —
  everything fused into the micro-batch scan, state = the dedup
  watermark only. Throughput here is the engine's streaming floor.
- **registry-coupled foreachBatch pipeline**
  (`curate_batch_against_history`): each micro-batch shingles, signs,
  probes the accumulated band registry (exactly-once cross-snapshot
  near-dedup), appends survivors' bands, and appends the curated rows —
  the real recurring-crawl shape. Later micro-batches probe the bands
  of earlier ones, so on the 64x corpus (64 near-copies of every doc)
  most of each later batch is dropped — the honest dedup regime.

Method: the corpus is chunked into N parquet files with a synthetic
event-time column; `readStream` consumes them with `maxFilesPerTrigger`
under `Trigger.AvailableNow` (bounded run, real micro-batch machinery,
checkpointed). Wall time covers the whole stream run; rows/sec =
input rows / wall.

Usage:
    python tools/stream_probe.py [--scales 1,64] [--batches 4]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F


def chunk_source(spark, sf_dir: str, out_dir: str, n_chunks: int) -> tuple[str, int]:
    """Write the corpus' documents as n_chunks parquet files with a
    synthetic event-time column (ts spread over 2 h so the 1 h
    watermark is exercised but no in-window dup is missed)."""
    from bricolage_spark.catalog import table_path

    src = os.path.join(out_dir, "chunks")
    docs = spark.read.parquet(table_path(sf_dir, "documents")).withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 7200)
    )
    docs.repartition(n_chunks).write.mode("overwrite").parquet(src)
    n = spark.read.parquet(src).count()
    return src, n


def run_stream(spark, src: str, ck: str, sink, files_per_trigger: int) -> None:
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    q = (
        sink(stream)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def main() -> None:
    from tools.scale_probe import BASE_SF, build_scaled, _arg

    scales = [int(x) for x in _arg("--scales", "1,64").split(",")]
    n_batches = int(_arg("--batches", "4"))

    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.session import get_spark
    from bricolage_spark.streaming.curation import (
        curate_batch_against_history,
        curate_stream,
    )

    spark = get_spark("stream-probe")
    out: dict = {"base": BASE_SF, "scales": scales, "pipelines": {}}
    for k in scales:
        sf_dir = BASE_SF if k == 1 else build_scaled(spark, k)
        tag = f"{k}x"
        work = tempfile.mkdtemp(prefix=f"stream_probe_{k}x_")
        try:
            # chunk count scales with the corpus so per-micro-batch file
            # size stays comparable; micro-batch COUNT stays n_batches
            n_chunks = 2 * n_batches if k == 1 else 8 * n_batches
            src, n_rows = chunk_source(spark, sf_dir, work, n_chunks)
            fpt = n_chunks // n_batches

            # pipeline 1: stateless + watermark dedup
            seen: list[int] = []

            def sink1(stream):
                curated = curate_stream(stream, watermark="1 hour")

                def body(df, _epoch):
                    seen.append(df.count())

                return curated.writeStream.outputMode("append").foreachBatch(body)

            t0 = time.perf_counter()
            run_stream(spark, src, os.path.join(work, "ck1"), sink1, fpt)
            wall1 = time.perf_counter() - t0

            # pipeline 2: registry-coupled foreachBatch near-dedup.
            # Per-batch walls are recorded because they ARE the claim:
            # the probe is O(batch), so batch k's wall must stay flat
            # while the registry holds k-1 batches' bands.
            eng = SparkEngine(spark, os.path.join(work, "wh"))
            kept: list[int] = []
            batch_walls: list[float] = []

            def sink2(stream):
                def body(df, _epoch):
                    b0 = time.perf_counter()
                    out_df = curate_batch_against_history(
                        df, eng, "stream_band_registry"
                    )
                    eng.save_table(out_df, "curated_corpus", mode="append")
                    kept.append(out_df.count())
                    batch_walls.append(round(time.perf_counter() - b0, 1))

                return stream.writeStream.outputMode("append").foreachBatch(body)

            t0 = time.perf_counter()
            run_stream(spark, src, os.path.join(work, "ck2"), sink2, fpt)
            wall2 = time.perf_counter() - t0

            out["pipelines"].setdefault("curate_stream", {})[tag] = {
                "input_rows": n_rows,
                "micro_batches": len(seen),
                "kept_rows": sum(seen),
                "wall_sec": round(wall1, 1),
                "rows_per_sec": round(n_rows / wall1),
            }
            out["pipelines"].setdefault("registry_foreachBatch", {})[tag] = {
                "input_rows": n_rows,
                "micro_batches": len(kept),
                "kept_rows": sum(kept),
                "kept_per_batch": kept,
                "batch_walls_sec": batch_walls,
                "wall_sec": round(wall2, 1),
                "rows_per_sec": round(n_rows / wall2),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
