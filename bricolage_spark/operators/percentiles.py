"""Exact interpolated percentiles without a single-partition global sort.

The naive exact percentile (``Window.orderBy(col)`` with no partitionBy)
funnels every row through ONE task — correct at sf0.1, a scale-killer at
100 TB.  This operator computes the same answer (SQL ``percentile_cont``
linear interpolation, matching DuckDB's ``QUANTILE_CONT``) with every
Spark job partition-parallel and every driver-side collect bounded by
*metadata* scale, never data scale — in THREE jobs total regardless of
how many quantiles are requested:

1. One pass: ``count`` + ``percentile_approx`` at ``q ± margin`` in a
   single aggregate.  The approx probes give a value bracket
   ``[lo, hi]`` per quantile guaranteed (GK-sketch rank error
   <= n/accuracy, margin > 2/accuracy + 8/n) to contain the rows at the
   target ranks.  (When n is too small for the fixed margin to absorb
   the +8-row slack, a second widened probe pass runs — small inputs
   only, never the 100 TB path.)
2. One pass: a union of per-quantile branches ``filter(v <= hi)`` where
   rows below ``lo`` collapse into a ``wb = -1`` pseudo-bucket (the
   exact rank anchor — map-side combinable) and bracket rows get a
   ``width_bucket`` sub-bucket id (pure arithmetic on the value, so
   deterministic across jobs with no caching).  The per-(quantile,
   sub-bucket) counts (<= Q·(B+2) rows) are collected to compute
   cumulative offsets on the driver.
3. One pass: only the 1–2 sub-buckets per quantile that cover the
   target ranks are fetched (distinct values + counts, bounded by
   bracket/B) and walked to read off the exact bracketing values.

No stage ever materializes more than ``4·margin·n / B`` rows in one
place; shuffles hash over values / sub-buckets, never SinglePartition.

Reference parity: bricolage ships percentile SQL to Redshift
(``lib/bricolage/psqldatasource.rb``) where the MPP engine owns the
distributed sort; this is the Spark-native equivalent of that contract.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Dict, Iterable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed margin floor: 2·eps covers the two probe sketch errors; the extra
# 1e-4 absorbs the +8-row rank slack whenever n >= _SMALL_N.  Below that,
# a second widened probe pass runs (tiny input, one extra cheap job).
_MARGIN_FLOOR = 1e-4
_SMALL_N = 80_000


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

    # --- job 1: count + approx value brackets in ONE aggregate.
    eps = 1.0 / accuracy  # GK-sketch rank-error guarantee (fraction of n)
    margin = 2.0 * eps + _MARGIN_FLOOR
    probes = []
    for q in qs:
        probes.append(max(0.0, q - margin))
        probes.append(min(1.0, q + margin))
    first = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("v", probes, accuracy).alias("b"),
    ).first()
    n = int(first["n"])
    if n == 0:
        return {q: None for q in qs}
    if n == 1:
        only = vals.first()["v"]
        return {q: float(only) for q in qs}
    if n < _SMALL_N:
        # The fixed floor doesn't cover 8/n slack: re-probe with the
        # n-aware margin (an extra job only on small inputs).
        margin = 2.0 * eps + 8.0 / n
        probes = []
        for q in qs:
            probes.append(max(0.0, q - margin))
            probes.append(min(1.0, q + margin))
        first = vals.agg(F.percentile_approx("v", probes, accuracy).alias("b")).first()
    bracket = {q: (first["b"][2 * k], first["b"][2 * k + 1]) for k, q in enumerate(qs)}

    # Target 0-indexed positions: ranks i and i+1 bracket each quantile.
    pos = {}
    for q in qs:
        p = q * (n - 1)
        i = int(math.floor(p))
        pos[q] = (i, p - i)

    # Point-mass brackets need no further scanning: all covered ranks == lo.
    live = [(k, q) for k, q in enumerate(qs) if bracket[q][0] != bracket[q][1]]
    out: Dict[float, Optional[float]] = {
        q: float(bracket[q][0]) for k, q in enumerate(qs) if bracket[q][0] == bracket[q][1]
    }
    if not live:
        return out

    # --- job 2: one union pass — per-quantile rank anchor (wb = -1) +
    # per-sub-bucket counts.  Each branch is a pushed-down range filter on
    # the same column-pruned scan; map-side partial agg collapses the
    # anchor branch before any shuffle.
    def branch(k: int, q: float) -> DataFrame:
        lo, hi = bracket[q]
        return (
            vals.where(F.col("v") <= F.lit(float(hi)))
            .select(
                F.lit(k).alias("k"),
                F.when(F.col("v") < F.lit(float(lo)), F.lit(-1))
                .otherwise(
                    F.width_bucket(
                        F.col("v"),
                        F.lit(float(lo)),
                        F.lit(float(hi)),
                        F.lit(sub_buckets),
                    ).cast("int")
                )
                .alias("wb"),
            )
        )

    u = reduce(DataFrame.unionAll, [branch(k, q) for k, q in live])
    offs = (
        u.groupBy("k", "wb")
        .agg(F.count(F.lit(1)).alias("bc"))
        .collect()
    )
    by_k: Dict[int, Dict[int, int]] = {k: {} for k, _ in live}
    for row in offs:
        by_k[row["k"]][row["wb"]] = int(row["bc"])

    # Driver-side cumulative walk (<= Q·(B+2) entries): locate the
    # sub-buckets covering each target rank.
    need: Dict[int, set] = {}
    start_of: Dict[int, Dict[int, int]] = {}
    for k, q in live:
        buckets = by_k[k]
        below = buckets.get(-1, 0)
        i, f = pos[q]
        ranks = [i] if f == 0.0 else [i, min(i + 1, n - 1)]
        local = [r - below for r in ranks]
        need_k = set()
        starts = {}
        cum = 0
        for wb in sorted(w for w in buckets if w >= 0):
            starts[wb] = cum
            for lr in local:
                if cum <= lr < cum + buckets[wb]:
                    need_k.add(wb)
            cum += buckets[wb]
        missing = [r for r, lr in zip(ranks, local) if not (0 <= lr < cum)]
        if missing:
            lo, hi = bracket[q]
            raise RuntimeError(
                f"percentile bracket [{lo}, {hi}] (offset {below}, total {cum}) "
                f"does not cover ranks {missing}; widen margin/accuracy"
            )
        need[k] = need_k
        start_of[k] = starts

    # --- job 3: fetch just the covering sub-buckets for every quantile in
    # one pass (distinct values + counts; bounded by bracket_size / B per
    # quantile) and read off the values.
    def fetch_branch(k: int, q: float) -> DataFrame:
        lo, hi = bracket[q]
        wb = F.width_bucket(
            F.col("v"), F.lit(float(lo)), F.lit(float(hi)), F.lit(sub_buckets)
        ).cast("int")
        return (
            vals.where(
                (F.col("v") >= F.lit(float(lo))) & (F.col("v") <= F.lit(float(hi)))
            )
            .where(wb.isin(*[int(w) for w in need[k]]))
            .select(F.lit(k).alias("k"), F.col("v"), wb.alias("wb"))
        )

    sel = (
        reduce(DataFrame.unionAll, [fetch_branch(k, q) for k, q in live])
        .groupBy("k", "wb", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k", "v")
        .collect()
    )
    rows_of: Dict[int, list] = {k: [] for k, _ in live}
    for row in sel:
        rows_of[row["k"]].append(row)

    for k, q in live:
        buckets = by_k[k]
        below = buckets.get(-1, 0)
        i, f = pos[q]
        ranks = [i] if f == 0.0 else [i, min(i + 1, n - 1)]
        local = {r: r - below for r in ranks}
        base = min(start_of[k][w] for w in need[k])
        found: Dict[int, float] = {}
        run = base
        for row in rows_of[k]:
            for r, lr in local.items():
                if run <= lr < run + row["cnt"]:
                    found[r] = row["v"]
            run += row["cnt"]
        if len(found) != len(local):
            raise RuntimeError("rank walk failed to locate all bracketing values")
        v_lo = found[ranks[0]]
        v_hi = found[ranks[-1]]
        out[q] = float(v_lo) * (1.0 - f) + float(v_hi) * f
    return out
