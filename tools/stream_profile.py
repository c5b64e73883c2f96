"""r16 streaming-path profile (optimization-guide §4 receipt).

Profiles the two streaming surfaces that had no perf evidence on file:

1. ``sessionize`` — the ``applyInPandasWithState`` custom-stateful
   operator — over the sf0.1 events table (100k rows, 1.5k users)
   streamed with ``Trigger.AvailableNow``, at two Arrow batch sizes
   (``spark.sql.execution.arrow.maxRecordsPerBatch``): per-run wall,
   rows/sec, and the per-group pandas cost implied by the group count.
2. ``span_scrub_batch_against_history`` — the foreachBatch span scrub —
   over the sf0.1 documents corpus in N sequential micro-batches
   against a growing registry: per-batch wall, rows/sec.

Usage: python tools/stream_profile.py [--batches 4]
Prints one JSON line.
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

from pyspark.sql import functions as F  # noqa: E402

from bricolage_spark.catalog import table_path  # noqa: E402
from bricolage_spark.session import get_spark  # noqa: E402


def _arg(flag: str, default: str) -> str:
    return (
        sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else default
    )


def profile_sessionize(spark, sf_dir: str, out: dict, work: str) -> None:
    from bricolage_spark.streaming.stateful import sessionize

    src = os.path.join(work, "ev_chunks")
    ev = spark.read.parquet(table_path(sf_dir, "events")).select(
        "user_id", "ts", "value"
    )
    ev.repartition(8).write.mode("overwrite").parquet(src)
    n = spark.read.parquet(src).count()
    n_users = ev.select("user_id").distinct().count()
    for batch_rows in (10000, 2000):
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
        )
        ck = os.path.join(work, f"ck_sess_{batch_rows}")
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = (
            sessionize(stream, gap_minutes=10)
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        out[f"sessionize_arrow{batch_rows}"] = {
            "rows": n,
            "users": n_users,
            "wall_sec": wall,
            "rows_per_sec": int(n / wall),
        }
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def profile_span_scrub(spark, sf_dir: str, out: dict, work: str,
                       n_batches: int) -> None:
    from bricolage_spark.engine import SparkEngine
    from bricolage_spark.streaming.curation import (
        span_scrub_batch_against_history,
    )

    engine = SparkEngine(spark, os.path.join(work, "wh"))
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    n = docs.count()
    walls = []
    for i in range(n_batches):
        batch = docs.where(F.col("doc_id") % n_batches == i)
        t0 = time.perf_counter()
        kept = span_scrub_batch_against_history(
            batch, engine, "streams.span_registry", snapshot=f"s{i}"
        )
        kept.count()
        walls.append(round(time.perf_counter() - t0, 3))
    out["span_scrub_foreachbatch"] = {
        "rows_total": n,
        "batches": n_batches,
        "per_batch_wall_sec": walls,
        "rows_per_sec_overall": int(n / sum(walls)),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(_arg("--batches", "4"))
    spark = get_spark("stream_profile")
    work = tempfile.mkdtemp(prefix="stream_profile_")
    out: dict = {"sf_dir": sf_dir}
    try:
        spark.range(1000000).selectExpr("sum(id)").collect()
        profile_sessionize(spark, sf_dir, out, work)
        profile_span_scrub(spark, sf_dir, out, work, n_batches)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
