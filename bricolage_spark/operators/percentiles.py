"""Exact interpolated percentiles without a single-partition global sort.

The naive exact percentile (``Window.orderBy(col)`` with no partitionBy)
funnels every row through ONE task — correct at sf0.1, a scale-killer at
100 TB.  This operator computes the same answer (SQL ``percentile_cont``
linear interpolation, matching DuckDB's ``QUANTILE_CONT``) with every
Spark job partition-parallel and every driver-side collect bounded by
*metadata* scale, never data scale:

1. ``n = count()``            — parquet footer metadata.
2. One pass: ``percentile_approx`` at ``q ± margin`` gives a value
   bracket ``[lo, hi]`` guaranteed (GK-sketch rank error <= n/accuracy,
   margin > 2/accuracy + 8/n) to contain the rows at the target ranks.
3. One pass: exact ``count(col < lo)`` — a map-side-combinable
   conditional aggregate — anchors the bracket's global rank offset.
4. The bracket rows (a pushed-down range filter on the scan, ~4·margin·n
   rows) are collapsed to distinct values with counts (point-mass safe),
   tagged with a ``width_bucket`` sub-bucket id (pure arithmetic — a
   deterministic function of the value, so no caching is needed for
   consistency across jobs), and the per-sub-bucket counts (<= B rows)
   are collected to compute cumulative offsets on the driver — the same
   per-partition-offset trick as a distributed rank, with value-derived
   buckets standing in for partitions.
5. Only the 1–2 sub-buckets that cover the target ranks are fetched
   (distinct values + counts, bounded by bracket/B) and walked to read
   off the exact bracketing values.

No stage ever materializes more than ``4·margin·n / B`` rows in one
place; shuffles hash over values / sub-buckets, never SinglePartition.

Reference parity: bricolage ships percentile SQL to Redshift
(``lib/bricolage/psqldatasource.rb``) where the MPP engine owns the
distributed sort; this is the Spark-native equivalent of that contract.
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    col: str,
    qs: Iterable[float],
    accuracy: int = 10_000,
    sub_buckets: int = 65_536,
) -> Dict[float, Optional[float]]:
    """Exact percentile_cont(q) of ``df[col]`` for each q in ``qs``.

    Returns ``{q: value}`` (None when the column is all-NULL/empty).
    Interpolation matches DuckDB QUANTILE_CONT: with p = q*(n-1),
    i = floor(p), f = p-i, result = v[i]*(1-f) + v[i+1]*f over the
    NULL-free ascending order.
    """
    qs = list(qs)
    vals = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n = vals.count()
    if n == 0:
        return {q: None for q in qs}
    if n == 1:
        only = vals.first()["v"]
        return {q: float(only) for q in qs}

    # Target 0-indexed positions: ranks i and i+1 bracket each quantile.
    pos = {}
    for q in qs:
        p = q * (n - 1)
        i = int(math.floor(p))
        pos[q] = (i, p - i)

    # --- pass 1: approx value brackets guaranteed to contain the ranks.
    eps = 1.0 / accuracy  # GK-sketch rank-error guarantee (fraction of n)
    margin = 2.0 * eps + 8.0 / n
    probes = []
    for q in qs:
        probes.append(max(0.0, q - margin))
        probes.append(min(1.0, q + margin))
    approx = vals.agg(
        F.percentile_approx("v", probes, accuracy).alias("b")
    ).first()["b"]
    bracket = {q: (approx[2 * k], approx[2 * k + 1]) for k, q in enumerate(qs)}

    # --- pass 2: exact rank anchor per bracket (one conditional agg scan).
    anchors = vals.agg(
        *[
            F.sum(F.when(F.col("v") < F.lit(bracket[q][0]), 1).otherwise(0))
            .cast("long")
            .alias(f"c{k}")
            for k, q in enumerate(qs)
        ]
    ).first()

    out: Dict[float, Optional[float]] = {}
    for k, q in enumerate(qs):
        lo, hi = bracket[q]
        i, f = pos[q]
        ranks = [i] if f == 0.0 else [i, min(i + 1, n - 1)]
        rank_vals = _values_at_ranks(
            vals, lo, hi, int(anchors[f"c{k}"]), ranks, sub_buckets
        )
        v_lo = rank_vals[ranks[0]]
        v_hi = rank_vals[ranks[-1]]
        out[q] = float(v_lo) * (1.0 - f) + float(v_hi) * f
    return out


def _values_at_ranks(
    vals: DataFrame,
    lo: float,
    hi: float,
    below: int,
    ranks: list,
    sub_buckets: int,
) -> Dict[int, float]:
    """Exact values at global 0-indexed ``ranks``, all guaranteed to lie in
    the value bracket [lo, hi] whose rank offset is ``below``."""
    if lo == hi:
        return {r: lo for r in ranks}

    b = vals.where((F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi)))
    # Distinct values + multiplicities: point-mass collapses to one row.
    d = b.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    # width_bucket is pure arithmetic on the value — deterministic across
    # jobs, so no persist() is needed for offset consistency.  Values == hi
    # land in bucket sub_buckets+1; that is just one more offset entry.
    d = d.withColumn(
        "wb",
        F.width_bucket(
            F.col("v"), F.lit(float(lo)), F.lit(float(hi)), F.lit(sub_buckets)
        ),
    )

    # Per-sub-bucket counts: <= sub_buckets+1 rows to the driver (metadata
    # scale).  Cumulative walk locates the covering sub-bucket per rank.
    offs = d.groupBy("wb").agg(F.sum("cnt").alias("bc")).orderBy("wb").collect()
    local = {r: r - below for r in ranks}
    need = set()
    start_of = {}
    cum = 0
    for row in offs:
        start_of[row["wb"]] = cum
        for lr in local.values():
            if cum <= lr < cum + row["bc"]:
                need.add(row["wb"])
        cum += row["bc"]
    missing = [r for r, lr in local.items() if not (0 <= lr < cum)]
    if missing:
        raise RuntimeError(
            f"percentile bracket [{lo}, {hi}] (offset {below}, total {cum}) "
            f"does not cover ranks {missing}; widen margin/accuracy"
        )

    # Fetch just the covering sub-buckets (consecutive ranks -> the needed
    # buckets are cumulative-adjacent, so one ordered walk is valid) and
    # read off the values.  Bounded by bracket_size / sub_buckets rows.
    sel = (
        d.where(F.col("wb").isin(*[int(w) for w in need]))
        .orderBy("v")
        .collect()
    )
    base = min(start_of[w] for w in need)
    found: Dict[int, float] = {}
    run = base
    for row in sel:
        for r, lr in local.items():
            if run <= lr < run + row["cnt"]:
                found[r] = row["v"]
        run += row["cnt"]
    if len(found) != len(local):
        raise RuntimeError("rank walk failed to locate all bracketing values")
    return found
