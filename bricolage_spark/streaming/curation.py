"""Streaming ingest curation: the LLM-data quality pipeline applied at
the micro-batch boundary instead of as a batch pass.

Composition over Structured Streaming (readStream → transformations →
writeStream), reusing the batch operators unchanged where they are
row-local (repetition filter, PII redaction, content digest) and the
watermark-bounded streaming primitives where state is involved
(``dropDuplicatesWithinWatermark`` on the digest):

    files → quality filter → redact → digest dedup → curated sink

This is the shape a 100 TB ingest runs: row-local filters execute inside
the scan of each micro-batch (zero state), and the only stateful operator
— first-seen dedup — bounds its state by the watermark horizon, so a
hot-looping crawler re-sending the same document is absorbed without
unbounded state growth. The same pipeline object works on a batch
DataFrame (the filters are engine-agnostic Catalyst expressions and the
dedup falls back to ``dropDuplicates``), which is how the test oracles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bricolage_spark.operators.dedup import normalize_text
from bricolage_spark.operators.textual import (
    entropy_filter,
    redact_pii,
    repetition_filter,
)
from bricolage_spark.streaming.windows import dedup_within_watermark


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality-filter, redact, and first-seen-dedup a document stream.

    Works on streaming and batch DataFrames alike. Output schema: the
    input columns (with ``text_col`` redacted) plus ``content_digest``.
    Dedup keys on the digest of the normalized REDACTED text, so two
    spam blasts differing only in the scrubbed email address collapse to
    one kept document. Both quality gates (repetition + char entropy)
    are row-local Catalyst predicates fused into the micro-batch scan.
    """
    curated = (
        entropy_filter(repetition_filter(docs, text_col), text_col)
        .withColumn(text_col, redact_pii(F.col(text_col)))
        .withColumn("content_digest", F.md5(normalize_text(F.col(text_col))))
    )
    return dedup_within_watermark(
        curated, ["content_digest"], ts_col=ts_col, watermark=watermark
    )
