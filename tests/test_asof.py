"""as-of join semantics: backward-inclusive match, deterministic tie winner,
NULL right values surviving the carry, tolerance nulling, and the plan shape
(one union-window pass, no nested-loop join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.asof import asof_join


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_backward_inclusive_and_none(spark):
    left = _mk(spark, [(1, 5), (1, 10), (1, 3), (2, 7)], ["k", "ts"])
    right = _mk(spark, [(1, 4, 40.0), (1, 10, 100.0), (2, 8, 80.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {(r["k"], r["ts"]): r["v"] for r in out.collect()}
    assert got == {
        (1, 5): 40.0,   # most recent at-or-before 5
        (1, 10): 100.0, # equal timestamp matches (inclusive)
        (1, 3): None,   # nothing at-or-before 3
        (2, 7): None,   # right row at 8 is in the future
    }


def test_tie_winner_is_deterministic(spark):
    left = _mk(spark, [(1, 10)], ["k", "ts"])
    right = _mk(
        spark,
        [(1, 10, 1.0, 100), (1, 10, 2.0, 200), (1, 10, 3.0, 150)],
        ["k", "ts", "v", "seq"],
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v", "seq"], tiebreak="seq",
    )
    row = out.collect()[0]
    assert (row["v"], row["seq"]) == (2.0, 200)  # greatest tiebreak wins


def test_null_right_value_survives(spark):
    # the newest right row has v=NULL; it must NOT be skipped in favor of
    # the older non-null row (struct-carry semantics)
    left = _mk(spark, [(1, 10)], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, 4, 40.0), (1, 9, None)], "k int, ts int, v double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    assert out.collect()[0]["v"] is None


def test_tolerance_nulls_stale_matches(spark):
    left = _mk(spark, [(1, 10), (1, 100)], ["k", "ts"])
    right = _mk(spark, [(1, 8, 80.0)], ["k", "ts", "v"])
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        value_cols=["v"], tolerance=5,
    )
    got = {r["ts"]: r["v"] for r in out.collect()}
    assert got == {10: 80.0, 100: None}  # 100-8=92 > 5: stale


def test_extra_left_columns_pass_through(spark):
    left = _mk(spark, [(1, 5, "a"), (1, 6, "b")], ["k", "ts", "tag"])
    right = _mk(spark, [(1, 5, 1.5)], ["k", "ts", "v"])
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {r["tag"]: (r["ts"], r["v"]) for r in out.collect()}
    assert got == {"a": (5, 1.5), "b": (6, 1.5)}


def test_plan_has_no_nested_loop(spark):
    left = _mk(spark, [(1, 5)], ["k", "ts"])
    right = _mk(spark, [(1, 4, 1.0)], ["k", "ts", "v"])
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the whole join is a union + window: exactly one Window over the key
    assert plan.count("Window") >= 1
