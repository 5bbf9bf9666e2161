"""Pareto frontier (operators/pareto.py): brute-force dominance
equivalence on random point sets in all four orientations, tie handling,
and plan shape (no self-join, no single-task global window over the
data)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.pareto import pareto_frontier_2d


def _brute_force(points, minimize_x, maximize_y):
    def better(a, b):  # a dominates b
        ax, ay = a if minimize_x else (-a[0], a[1])
        bx, by = b if minimize_x else (-b[0], b[1])
        if not maximize_y:
            ay, by = -ay, -by
        return ax <= bx and ay >= by and (ax < bx or ay > by)

    pts = set(points)
    return {p for p in pts if not any(better(q, p) for q in pts if q != p)}


@pytest.mark.parametrize("minimize_x", [True, False])
@pytest.mark.parametrize("maximize_y", [True, False])
def test_matches_bruteforce_all_orientations(spark, minimize_x, maximize_y):
    rng = random.Random(13)
    points = [
        (rng.randrange(50), rng.randrange(50)) for _ in range(300)
    ]
    df = spark.createDataFrame(points, "x long, y long")
    got = {
        (r["x"], r["y"])
        for r in pareto_frontier_2d(
            df, "x", "y", minimize_x=minimize_x, maximize_y=maximize_y
        ).collect()
    }
    assert got == _brute_force(points, minimize_x, maximize_y)


def test_coincident_points_collapse_to_one_row(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 5), (2, 3)], "x long, y long"
    )
    rows = pareto_frontier_2d(df, "x", "y").collect()
    assert {(r["x"], r["y"]) for r in rows} == {(1, 5)}
    assert len(rows) == 1


def test_nulls_excluded_and_no_join_on_data(spark):
    df = spark.createDataFrame(
        [(1, 5), (None, 9), (2, None), (2, 7)],
        "x long, y long",
    )
    got = {
        (r["x"], r["y"]) for r in pareto_frontier_2d(df, "x", "y").collect()
    }
    assert got == {(1, 5), (2, 7)}
    plan = (
        pareto_frontier_2d(df, "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only join is the partitions-sized broadcast offset join from
    # prefix_max — never a shuffle self-join of the data
    assert "SortMergeJoin" not in plan
