from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.timeseries import rolling_window_features


def _ev(spark):
    rows = [
        # (id, key, ts, value)
        (1, 1, 0, 10.0),
        (2, 1, 50, 20.0),
        (3, 1, 100, 30.0),
        (4, 1, 161, 40.0),   # frame [101, 161]: row 3 at ts=100 excluded
        (5, 2, 100, 5.0),
    ]
    return spark.createDataFrame(rows, "id long, k long, ts long, v double")


def test_rolling_window_inclusive_range(spark):
    out = {
        r["id"]: (r["rolling_count"], r["rolling_sum"])
        for r in rolling_window_features(
            _ev(spark), ["k"], "ts", "v", lookback=60
        ).collect()
    }
    assert out[1] == (1, 10.0)
    assert out[2] == (2, 30.0)          # [−10, 50] covers rows 1,2
    assert out[3] == (2, 50.0)          # [40, 100] covers rows 2,3; row1 at 0 excluded
    assert out[4] == (1, 40.0)          # [101, 161] covers only itself
    assert out[5] == (1, 5.0)           # keys isolated


def test_rolling_window_equal_ts_rows_see_each_other(spark):
    df = _ev(spark).union(
        _ev(spark).sparkSession.createDataFrame(
            [(6, 1, 100, 1.0)], "id long, k long, ts long, v double"
        )
    )
    out = {
        r["id"]: r["rolling_count"]
        for r in rolling_window_features(df, ["k"], "ts", "v", 60).collect()
    }
    # rows 3 and 6 share ts=100: both count rows {2,3,6}
    assert out[3] == out[6] == 4 - 1  # rows 2,3,6


def test_rolling_window_single_shuffle_and_validation(spark):
    df = _ev(spark)
    out = rolling_window_features(df, ["k"], "ts", "v", 60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash shuffle on the key
    with pytest.raises(ValueError):
        rolling_window_features(df, ["k"], "ts", "v", 0)


# ---------------------------------------------------------------------------
# Markov transitions (r9)
# ---------------------------------------------------------------------------

def test_markov_transitions_known_streams(spark):
    from rust_cdc_validator_spark.operators.timeseries import markov_transitions

    rows = [
        ("u1", 1, "view"), ("u1", 2, "cart"), ("u1", 3, "buy"),
        ("u2", 1, "view"), ("u2", 2, "view"), ("u2", 3, "cart"),
        ("u3", 1, "view"),  # single event: no transition
    ]
    df = spark.createDataFrame(rows, "u string, ts long, t string")
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob"])
        for r in markov_transitions(df, "u", "ts", "t").collect()
    }
    assert got[("view", "cart")] == (2, 2 / 3)
    assert got[("view", "view")] == (1, 1 / 3)
    assert got[("cart", "buy")] == (1, 1.0)
    assert set(got) == {("view", "cart"), ("view", "view"), ("cart", "buy")}
    # probs row-normalize per from_type
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values())


def test_markov_transitions_tiebreak_total_order(spark):
    from rust_cdc_validator_spark.operators.timeseries import markov_transitions

    # equal timestamps: tiebreak column fixes the order deterministically
    rows = [("u", 1, 2, "b"), ("u", 1, 1, "a"), ("u", 1, 3, "c")]
    df = spark.createDataFrame(rows, "u string, ts long, eid long, t string")
    got = {
        (r["from_type"], r["to_type"])
        for r in markov_transitions(df, "u", "ts", "t", "eid").collect()
    }
    assert got == {("a", "b"), ("b", "c")}
