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


def _require_free(names: tuple[str, ...], *frames: DataFrame) -> None:
    """Refuse inputs that already carry a helper column name.

    ``withColumn`` silently REPLACES an existing column, so a caller
    whose frame already has ``__salt`` (or the outer-join marker
    ``__m``) would get wrong filter/drop behavior with no error
    (r13 ADVICE). Helper names are an internal namespace; collisions
    are a caller bug and must fail loudly.
    """
    for df in frames:
        clash = [n for n in names if n in df.columns]
        if clash:
            raise ValueError(
                f"skew helper column name(s) {clash} already present in "
                f"input columns {df.columns}; rename them before salting"
            )


def detect_hot_keys(
    df: DataFrame,
    key: str,
    sample_frac: float = 0.02,
    threshold: float = 0.02,
    max_keys: int = 64,
    min_count: int = 8,
    seed: int = 4242,
) -> list:
    """Heavy-hitter probe: key values holding > ``threshold`` share of a
    sampled scan of ``df``. Two metadata-scale jobs over a column-pruned
    sample (the parquet scan reads only ``key``); at most ``max_keys``
    values come back to the driver. ``min_count`` filters sampling noise:
    in a small sample every singleton exceeds a share threshold, so a key
    must also appear ``min_count`` times before it counts as hot (a real
    task-pinning key at any scale clears this trivially). A production
    deployment with table statistics (NDV / histograms from ANALYZE)
    reads them instead of sampling — this probe is the statistics-free
    fallback.
    """
    counts = (
        df.select(key).sample(fraction=sample_frac, seed=seed).groupBy(key).count()
    )
    total = counts.agg(F.sum("count")).first()[0] or 0
    if total == 0:
        return []
    top = counts.orderBy(F.desc("count")).limit(max_keys).collect()
    return [
        r[key]
        for r in top
        if r["count"] >= min_count and r["count"] / total > threshold
    ]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
    hot: list | None = None,
) -> DataFrame:
    """Join that pays for skew mitigation only where skew exists.

    ``hot`` is the list of skewed key values (pass ``[]`` to force a plain
    join, a list to pin them, or leave None to probe with
    :func:`detect_hot_keys`). Three plans, picked by what the data needs:

    - no hot keys → the plain join; Catalyst/AQE choose broadcast vs
      shuffle. Paying n_salts× dim replication on uniform data is pure
      waste — this is the common case and it costs one sampled probe.
    - hot keys, inner/left join → SPLIT join: only rows with hot keys get
      a content-derived salt (from ``salt_from``) and join a dim
      replicated n_salts× *restricted to the hot keys* (≤ |hot|·n_salts
      rows, trivial at any scale); the cold rest takes the plain join;
      union. A hot key now lands on n_salts tasks instead of one.
    - hot keys, other join types → full-replication salting (the split
      rewrite is not an identity for right/full joins: ``other`` rows
      must not be dropped/duplicated across the branches). Replication
      alone is not an identity for right/full either — an ``other``
      replica whose (key, salt) matches no skewed row survives the
      outer join as a NULL-filled row even when ANOTHER salt of the
      same key matched, so a naive salted right join emits up to
      n_salts spurious/duplicate rows per other row (r13 self-review
      repro). The identity-preserving form: a marker column on the
      skewed side keeps exactly the matched pairs (plus, for full
      joins, the unmatched skewed rows, which carry the marker), and
      the truly-unmatched ``other`` rows are re-derived ONCE each by a
      key anti-join (distinct on the bare key — map-side combine, so
      the hot key never pins that shuffle either).
    """
    _require_free(("__salt", "__m"), skewed, other)
    if hot is None:
        hot = detect_hot_keys(skewed, key)
    if not hot:
        return skewed.join(other, key, how)
    if how in ("inner", "left", "leftouter", "left_outer"):
        # The split predicate must be NULL-SAFE: isin() is NULL for a
        # NULL key, so filter(is_hot) AND filter(~is_hot) would both
        # drop NULL-key rows — silently losing them from a left join.
        # And NULL itself can be the hot key (the classic "null user"
        # this module's intro names; detect_hot_keys returns it like
        # any other heavy value): isin() can never match it, so it is
        # routed explicitly. Salting NULL keys is still useful — they
        # all hash to one shuffle partition even though they match no
        # dim row, and the (key, salt) layout spreads them.
        hot_vals = [h for h in hot if h is not None]
        null_is_hot = any(h is None for h in hot)

        def is_hot_on(col: Column) -> Column:
            base = col.isin(hot_vals) if hot_vals else F.lit(False)
            safe = F.coalesce(base, F.lit(False))
            return (col.isNull() | safe) if null_is_hot else safe

        is_hot = is_hot_on(F.col(key))
        s_hot = skewed.filter(is_hot).withColumn(
            "__salt", _salt_of(F.col(salt_from), n_salts)
        )
        o_hot = other.filter(is_hot_on(F.col(key))).withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
        hot_part = s_hot.join(o_hot, [key, "__salt"], how).drop("__salt")
        cold_part = skewed.filter(~is_hot).join(other, key, how)
        return cold_part.unionByName(hot_part)
    s = skewed.withColumn("__m", F.lit(1)).withColumn(
        "__salt", _salt_of(F.col(salt_from), n_salts)
    )
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(o, [key, "__salt"], how).drop("__salt")
    if how in ("right", "rightouter", "right_outer", "full", "fullouter",
               "full_outer", "outer"):
        # keep rows where the skewed side is present (matched pairs; for
        # full joins also the unmatched skewed rows), then re-derive each
        # truly-unmatched other row exactly once
        matched = out.filter(F.col("__m").isNotNull()).drop("__m")
        unmatched_other = other.join(
            skewed.select(key).distinct(), key, "left_anti"
        )
        return matched.unionByName(unmatched_other, allowMissingColumns=True)
    return out.drop("__m")


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
    algebraic family; avg callers compute sum+count and divide) plus
    collect_set/collect_list (partials flattened in phase 2;
    collect_set re-deduped with ``array_distinct``).

    When to reach for this (measured, tools/skew_probe.py): for the
    ALGEBRAIC family Spark's map-side partial aggregation already
    defuses group skew — each mapper emits one partial per group, so
    the hot group's reduce task receives n_mappers rows no matter how
    many input rows the group holds, and salting only adds a shuffle.
    The recipe earns its keep for the HOLISTIC family: collect_set /
    collect_list partials are value-proportional, a 30%-of-corpus group
    pins its entire value set on one reduce task, and splitting it
    across n_salts tasks bounds both the straggler and the single-task
    state (the 100 TB OOM shape).
    """
    mergeable = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    holistic = {"collect_set", "collect_list"}
    for c, fn in aggs.items():
        if fn not in mergeable and fn not in holistic:
            raise ValueError(f"non-mergeable aggregate for salting: {fn}({c})")
    _require_free(("__salt", *(f"__p_{c}" for c in aggs)), df)

    salted = df.withColumn("__salt", _salt_of(F.col(salt_from), n_salts))
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()]
    )

    def _merge(c: str, fn: str) -> Column:
        if fn in mergeable:
            return getattr(F, mergeable[fn])(f"__p_{c}").alias(f"{fn}_{c}")
        merged = F.flatten(F.collect_list(f"__p_{c}"))
        if fn == "collect_set":
            merged = F.array_distinct(merged)
        return merged.alias(f"{fn}_{c}")

    phase2 = phase1.groupBy(*group_cols).agg(
        *[_merge(c, fn) for c, fn in aggs.items()]
    )
    return phase2
