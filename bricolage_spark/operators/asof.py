"""As-of (point-in-time) join — a core time-series operator Spark lacks
as a builtin (SURVEY.md §2.7 extension class).

``asof_join(left, right)`` attaches, to every left row, the most recent
right row with ``right.ts <= left.ts`` (backward direction) per key.

Scale design: the naive formulation is a range join (O(n·m) BNLJ). This
implementation uses the **union + running-last window** trick instead:
one shuffle on the key, one sort within partitions, zero Cartesian
blowup — the standard distributed as-of algorithm (kdb/Flink style):

1. tag both sides, union by name (missing columns null),
2. window per key ordered by (ts, side) — right rows sort before left
   rows at equal timestamps so the match is inclusive,
3. pack ALL carried right columns into ONE struct and apply a single
   ``last(struct, ignorenulls=True)`` over the unbounded-preceding
   frame — carrying columns independently would mix values from
   different right rows whenever a right column is legitimately NULL
   (the stale non-NULL value would be carried for that column only),
4. unpack the struct, keep left rows.

Cost: shuffle(left+right) + per-partition sort — linear, skew handled by
AQE; this is what a 100 TB backfill needs (a broadcast range join would
be chosen by Catalyst automatically only for small rights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest right row with ``right.on <= left.on``.

    ``by``: equi-key column(s) present in both sides.
    ``right_cols``: right columns to attach (default: all non-key,
    non-ts right columns), emitted as ``<col><suffix>``.
    """
    by = [by] if isinstance(by, str) else (by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    # the matched right timestamp is part of the answer — always carry it
    carry_cols = [*right_cols, on]

    # A NULL right timestamp can never satisfy ``right.on <= left.on``
    # (the comparison is UNKNOWN), but unfiltered it would sort NULLS
    # FIRST — before every real row — and be carried as a spurious
    # "-infinity" match into any left row with no true predecessor
    # (r13 self-review repro; DuckDB's ASOF oracle excludes such rows).
    # NULL LEFT timestamps need no guard: they also sort first, where
    # only (now-excluded) NULL right rows could precede them, so they
    # correctly carry nothing.
    right = right.filter(F.col(on).isNotNull())

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by,
        F.col(on).alias(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in carry_cols],
    ).withColumn("__side", F.lit(0))
    # align schemas: left gets null right-cols, right gets null left-cols
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.unionByName(rt)

    # One struct per RIGHT row (NULL struct on left rows), one
    # last(ignorenulls) — the whole right row is carried atomically,
    # so per-column NULLs inside a right row are preserved as-is.
    packed = unioned.withColumn(
        "__rrow",
        F.when(
            F.col("__side") == 0,
            F.struct(*[F.col(f"{c}{suffix}") for c in carry_cols]),
        ),
    )
    # __rrow as the FINAL sort key makes ties deterministic: right rows
    # sharing (key, ts) would otherwise keep arbitrary shuffle order and
    # last() would carry whichever happened to sort last. With the
    # packed row in the ordering, the GREATEST carried row (struct
    # lexicographic order over carry_cols) wins — engine-reproducible,
    # matching the repo-wide unique-tiebreak discipline. (Carried
    # columns must be orderable types; an unorderable carry column
    # fails analysis loudly — exclude it via right_cols.)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on), F.col("__side"), F.col("__rrow"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = packed.select(
        "*", F.last("__rrow", ignorenulls=True).over(w).alias("__carry")
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__carry.{c}{suffix}").alias(f"{c}{suffix}") for c in carry_cols],
    )
    return out
