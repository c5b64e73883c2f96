"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (the part that must be right at 100 TB):
- media live as ``binary`` columns (or (path, offset, length) pointers into
  blob stores read via ``spark.read.format('binaryFile')``);
- metadata is a typed struct column next to the payload;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — Python touches each batch once, schema is
  declared up front, partitioning is preserved, nothing collects.

The actual codec calls (PIL/ffmpeg/torchaudio) are NOT available in this
container, so ``decode_stub`` is a clearly-marked deterministic fake:
it derives "features" from the payload bytes (md5-based) with the same
shape/schema a real decoder would produce. The Spark-side plumbing —
schemas, batch iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("digest", StringType()),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload.

    (The container has no image/audio test assets; the binary-column
    pipeline is exercised with utf-8 payloads, which is schema-identical.)
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector.

    REAL DECODERS GO HERE: e.g. PIL.Image.open(BytesIO(payload)) →
    resize → channel means; librosa.load → MFCC; cv2 frame-sample.
    None of those libs exist in this container, so features are derived
    from the payload digest — stable, shape-correct, schema-correct.
    """
    d = hashlib.md5(payload).digest()
    return [float(b) for b in d[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature stage over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "feature": [_fake_feature(bytes(p), dim) for p in payloads],
                    "digest": [hashlib.md5(bytes(p)).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_stub(*_args, **_kwargs):  # pragma: no cover - documented stub
    """Placeholder for true image/audio/video decoding.

    Raises so nobody mistakes the fake features for real ones.
    """
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "extract_features uses a deterministic digest-based stand-in"
    )
