"""Skew mitigation: salted joins and two-phase aggregations.

At 100 TB a handful of hot keys (the null user, the default partition,
one viral document) can pin an entire shuffle on one task. AQE's skew-
join splitting (on by default in this engine) handles most cases at
runtime; these helpers are the static recipes for the cases AQE can't
see — aggregation skew, and joins where the skewed side must stay on a
deterministic layout.

All salting is deterministic (fixed-seed hash of row content), so
retries land rows on the same salt. The salt never reaches the result —
it exists only between the two shuffle phases — so the engine-native
hash is the right primitive: a codegen'd murmur3 per row, not an md5
(which costs a MessageDigest call per row and buys nothing here; md5 is
reserved for values an external oracle must reproduce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n: int) -> Column:
    """Deterministic salt in [0, n) from a column's content."""
    return F.pmod(F.hash(col), F.lit(n))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``skewed``'s hot keys must spread across tasks.

    The skewed side gets a content-derived salt (from ``salt_from``, any
    well-distributed column); ``other`` is replicated n_salts× with every
    salt value. Join key becomes (key, salt) — a hot key now lands on
    n_salts tasks instead of one. Replication cost: |other|×n_salts rows,
    so ``other`` should be the smaller side.
    """
    s = skewed.withColumn("__salt", _salt_of(F.col(salt_from), n_salts))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (group_cols, salt) — hot groups split across
    n_salts partial states; phase 2 merges partials by group_cols.
    ``aggs``: {column: fn} with fn ∈ sum/count/min/max (the re-mergeable
    family; avg callers compute sum+count and divide).
    """
    mergeable = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for c, fn in aggs.items():
        if fn not in mergeable:
            raise ValueError(f"non-mergeable aggregate for salting: {fn}({c})")

    salted = df.withColumn("__salt", _salt_of(F.col(salt_from), n_salts))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )
    phase2 = phase1.groupBy(*group_cols).agg(
        *[
            getattr(F, mergeable[fn])(f"__p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
    return phase2
