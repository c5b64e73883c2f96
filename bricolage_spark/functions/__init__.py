"""Public column-function API.

Engine-independent (md5-derived) hashing + text + vector expressions used
by the operator layer, re-exported as the stable surface users compose in
their own queries. Everything here is a pure Catalyst column expression —
codegen'd, no UDFs — unless explicitly noted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bricolage_spark.operators.dedup import (  # noqa: F401
    MINHASH_PRIME,
    content_hash,
    hash32,
    minhash_affine_params,
    normalize_text,
)
from bricolage_spark.operators.similarity import (  # noqa: F401
    cosine_sim,
    dot,
    norm,
    srp_bucket,
)


def ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram array from raw text (normalized)."""
    words = F.split(normalize_text(col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-gram (shingle) array — the dedup granularity used for
    code/short text."""
    s = normalize_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: s.substr(i, F.lit(n)))


def token_count_estimate(col: Column) -> Column:
    """BPE-budget estimate: ceil(chars / 4)."""
    return F.ceil(F.length(col) / 4.0).cast("bigint")
