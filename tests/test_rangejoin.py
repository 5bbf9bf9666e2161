"""Bucketed range join: equivalence with the naive nested-loop join, edge
cases at bucket boundaries, and plan shape (equi-join, not BNLJ)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.rangejoin import range_join


def _naive(points, intervals, point_col, lo, hi, keys):
    out = points.crossJoin(intervals.select([intervals[c].alias(f"_r_{c}") for c in intervals.columns]))
    for k in keys:
        out = out.filter(F.col(k) == F.col(f"_r_{k}"))
    out = out.filter(F.col(point_col).between(F.col(f"_r_{lo}"), F.col(f"_r_{hi}")))
    return out.withColumn("iid", F.col("_r_iid"))


def test_matches_naive_join(spark):
    points = spark.createDataFrame(
        [(u, i, 10 * i + u) for u in (1, 2) for i in range(40)],
        "user_id int, pid int, v long",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 7, 93), (1, 101, 120, 260), (2, 102, 0, 399), (2, 103, 55, 55),
         (1, 104, 350, 500), (2, 105, -50, 3)],
        "user_id int, iid int, lo long, hi long",
    )
    got = range_join(
        points, intervals, "v", "lo", "hi", bucket_width=64,
        equality_keys=["user_id"],
    )
    want = _naive(points, intervals, "v", "lo", "hi", ["user_id"])
    k = lambda df: sorted(tuple(r) for r in df.select("user_id", "pid", "iid").collect())
    assert k(got) == k(want)
    assert got.count() > 0


def test_boundary_inclusive_and_width_invariance(spark):
    points = spark.createDataFrame([(1, 0), (2, 10), (3, 11), (4, 20)], "pid int, v long")
    intervals = spark.createDataFrame([(9, 10, 20)], "iid int, lo long, hi long")
    for width in (1, 3, 10, 1000):
        got = range_join(points, intervals, "v", "lo", "hi", bucket_width=width)
        assert sorted(r.pid for r in got.collect()) == [2, 3, 4], width


def test_negative_values(spark):
    points = spark.createDataFrame([(1, -15), (2, -5), (3, 5)], "pid int, v long")
    intervals = spark.createDataFrame([(9, -10, 0)], "iid int, lo long, hi long")
    got = range_join(points, intervals, "v", "lo", "hi", bucket_width=7)
    assert sorted(r.pid for r in got.collect()) == [2]


def test_rejects_ambiguous_columns_and_bad_width(spark):
    df = spark.createDataFrame([(1, 2)], "a int, v long")
    iv = spark.createDataFrame([(1, 0, 5)], "a int, lo long, hi long")
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(df, iv, "v", "lo", "hi", bucket_width=10)
    with pytest.raises(ValueError, match="positive"):
        range_join(df.withColumnRenamed("a", "b"), iv, "v", "lo", "hi", bucket_width=0)


def test_plan_is_equi_join_not_nested_loop(spark):
    points = spark.range(1000).select(
        (F.col("id") % 7).cast("int").alias("user_id"),
        F.col("id").alias("pid"),
        (F.col("id") * 3).alias("v"),
    )
    intervals = spark.range(50).select(
        (F.col("id") % 7).cast("int").alias("user_id"),
        F.col("id").alias("iid"),
        (F.col("id") * 50).alias("lo"),
        (F.col("id") * 50 + 99).alias("hi"),
    )
    plan = range_join(
        points, intervals, "v", "lo", "hi", bucket_width=100,
        equality_keys=["user_id"],
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
