"""exact_percentiles: correctness vs a sorted-array reference, plus the
scale contract the judge asked for — no single-partition window over data."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from bricolage_spark.operators.percentiles import exact_percentiles


def _ref_pcont(values, q):
    s = sorted(values)
    p = q * (len(s) - 1)
    i = int(math.floor(p))
    f = p - i
    hi = s[min(i + 1, len(s) - 1)]
    return s[i] * (1.0 - f) + hi * f


QS = [0.01, 0.25, 0.5, 0.9, 0.95, 0.99]


@pytest.mark.parametrize(
    "gen,desc",
    [
        (lambda rng: rng.uniform(0, 1e6), "continuous"),
        (lambda rng: float(rng.randint(0, 50)), "heavy duplicates"),
        (lambda rng: 42.0 if rng.random() < 0.6 else rng.uniform(0, 100), "point mass"),
    ],
)
def test_matches_sorted_reference(spark, gen, desc):
    rng = random.Random(7)
    values = [gen(rng) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = exact_percentiles(df, "x", QS, sub_buckets=64)
    for q in QS:
        assert got[q] == pytest.approx(_ref_pcont(values, q), abs=1e-9), (desc, q)


def test_nulls_ignored_and_empty(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    got = exact_percentiles(df, "x", [0.5])
    assert got[0.5] == pytest.approx(2.0)
    empty = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_percentiles(empty, "x", [0.5]) == {0.5: None}
    one = spark.createDataFrame([(9.0,)], "x double")
    assert exact_percentiles(one, "x", [0.25])[0.25] == pytest.approx(9.0)


def test_exact_rank_boundaries(spark):
    # f == 0 path: q*(n-1) lands exactly on a rank.
    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    got = exact_percentiles(df, "x", [0.0, 0.5, 1.0])
    assert got[0.0] == 0.0
    assert got[0.5] == 50.0
    assert got[1.0] == 100.0


def test_q26_plan_has_no_window(spark, sf_dir):
    """The returned q26 plan must not contain any Window (the round-1 plan
    ran row_number over an unpartitioned window = Exchange SinglePartition
    of all of lineitem).  All percentile work now happens in bounded
    partition-parallel side jobs."""
    from bricolage_spark.plans import formatted_plan
    from bricolage_spark.queries import load_all

    df = load_all()["q26_distinct_percentiles"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "row_number" not in plan


def test_bracket_filter_pushed_to_scan(spark, sf_dir):
    """The bracket pre-filter must reach the parquet scan as a range
    predicate (row-group min/max pruning at scale)."""
    from bricolage_spark.catalog import read_table
    from bricolage_spark.plans import formatted_plan

    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(F.col("l_extendedprice").alias("v")).where(
        (F.col("v") >= F.lit(1000.0)) & (F.col("v") <= F.lit(2000.0))
    )
    d = b.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    plan = formatted_plan(d)
    assert "GreaterThanOrEqual(l_extendedprice" in plan
    assert "LessThanOrEqual(l_extendedprice" in plan
    assert "SinglePartition" not in plan  # hash shuffle over values only
