"""Sweep-line peak concurrency (operators/sweepline.py, r10).

The DuckDB oracle (queries.py events_peak_concurrency) replays the same
prefix-scan arithmetic; this file pins the SEMANTICS against an
independent brute-force reference — for every boundary instant, count
the intervals whose [s, e) contains it — over randomized interval sets,
plus the edge cases the oracle's fixed data can't reach.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.sweepline import peak_concurrency


def _brute(intervals):
    """max concurrency and its first instant for half-open [s, e)."""
    best, best_t = 0, None
    # concurrency only changes at boundary instants; evaluate at each start
    for t in sorted({s for s, _ in intervals}):
        c = sum(1 for s, e in intervals if s <= t < e)
        if c > best:
            best, best_t = c, t
    return best, best_t


def test_matches_brute_force_randomized(spark):
    rng = random.Random(7)
    rows = []
    per_group = {}
    for g in ("a", "b", "c"):
        ivs = []
        for _ in range(120):
            s = rng.randrange(0, 500)
            e = s + rng.randrange(1, 60)
            ivs.append((s, e))
            rows.append((g, s, e))
        per_group[g] = ivs
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {
        r["g"]: (r["peak_concurrency"], r["first_peak"])
        for r in peak_concurrency(df, ["g"], "s", "e").collect()
    }
    assert set(got) == {"a", "b", "c"}
    for g, ivs in per_group.items():
        assert got[g] == _brute(ivs), g


def test_half_open_touching_intervals_do_not_overlap(spark):
    # [0,10) and [10,20): departure at 10 frees the slot first — peak 1
    df = spark.createDataFrame(
        [("g", 0, 10), ("g", 10, 20)], "g string, s long, e long"
    )
    row = peak_concurrency(df, ["g"], "s", "e").first()
    assert row["peak_concurrency"] == 1 and row["first_peak"] == 0


def test_duplicate_intervals_and_ties(spark):
    # three identical intervals + one disjoint: peak 3 at t=5
    df = spark.createDataFrame(
        [("g", 5, 9)] * 3 + [("g", 100, 101)], "g string, s long, e long"
    )
    row = peak_concurrency(df, ["g"], "s", "e").first()
    assert row["peak_concurrency"] == 3 and row["first_peak"] == 5


def test_null_and_empty_intervals_excluded(spark):
    df = spark.createDataFrame(
        [("g", 1, 4), ("g", None, 9), ("g", 3, None), ("g", 7, 7), ("g", 9, 2)],
        "g string, s long, e long",
    )
    row = peak_concurrency(df, ["g"], "s", "e").first()
    assert row["peak_concurrency"] == 1 and row["first_peak"] == 1


def test_group_isolation_zero_sum_reset(spark):
    # heavy group before a light one in sort order: the light group's
    # running sum must NOT inherit the heavy group's mass (the zero-sum
    # reset argument) — 50 stacked intervals in "a", a single one in "z"
    rows = [("a", 0, 100)] * 50 + [("z", 0, 1)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {
        r["g"]: r["peak_concurrency"]
        for r in peak_concurrency(df, ["g"], "s", "e").collect()
    }
    assert got == {"a": 50, "z": 1}


def test_validation(spark):
    df = spark.createDataFrame([("g", 1, 2)], "g string, s long, e long")
    with pytest.raises(ValueError, match="group_cols"):
        peak_concurrency(df, [], "s", "e")


def test_column_expression_inputs(spark):
    # start/end as Column expressions (the catalog query's ts+span form)
    df = spark.createDataFrame([("g", 10)], "g string, ts long")
    row = peak_concurrency(
        df, ["g"], F.col("ts"), F.col("ts") + F.lit(5)
    ).first()
    assert row["peak_concurrency"] == 1 and row["first_peak"] == 10
