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


# ---------------------------------------------------------------------------
# direction="forward"
# ---------------------------------------------------------------------------


def _fwd_frames(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 12), (1, 30), (2, 3)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 5, 50.0), (1, 10, 100.0), (1, 20, 200.0), (3, 1, 999.0)],
        "k long, ts long, v double",
    )
    return left, right


def test_asof_forward_picks_earliest_following(spark):
    from rust_cdc_validator_spark.operators.asof import asof_join

    left, right = _fwd_frames(spark)
    out = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], direction="forward"
        ).collect()
    }
    assert out[(1, 5)] == 50.0   # inclusive: equal ts matches
    assert out[(1, 12)] == 200.0  # next following at ts=20
    assert out[(1, 30)] is None   # nothing after
    assert out[(2, 3)] is None    # no key match


def test_asof_forward_tolerance_and_tiebreak(spark):
    from rust_cdc_validator_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 0), (1, 18)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 20, 1.0, 7), (1, 20, 2.0, 9)], "k long, ts long, v double, tb long"
    )
    out = {
        r["ts"]: (r["v"], r["tb"])
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v", "tb"],
            tiebreak="tb", tolerance=5, direction="forward",
        ).collect()
    }
    assert out[18] == (2.0, 9)        # within tolerance; greatest tiebreak wins
    assert out[0] == (None, None)     # 20 - 0 > 5 -> nulled


def test_asof_forward_equals_backward_on_reversed_axis(spark):
    """forward(ts) == backward(-ts): the two directions are mirror images."""
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.operators.asof import asof_join

    left, right = _fwd_frames(spark)
    fwd = asof_join(left, right, ["k"], "ts", "ts", ["v"], direction="forward")
    neg = lambda df: df.withColumn("ts", -F.col("ts"))
    bwd = asof_join(neg(left), neg(right), ["k"], "ts", "ts", ["v"])
    a = sorted((r["k"], r["ts"], r["v"]) for r in fwd.collect())
    b = sorted((r["k"], -r["ts"], r["v"]) for r in bwd.collect())
    assert a == b


def test_asof_rejects_unknown_direction(spark):
    import pytest
    from rust_cdc_validator_spark.operators.asof import asof_join

    left, right = _fwd_frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "ts", "ts", ["v"], direction="nearest")
