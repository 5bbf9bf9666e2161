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


# ------------------------------------------------------- autocorrelation


def test_acf_matches_numpy_on_seasonal_series(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.timeseries import autocorrelation

    rng = np.random.default_rng(11)
    n = 200
    xs = (
        10.0
        + 3.0 * np.sin(2 * np.pi * np.arange(n) / 8.0)
        + rng.normal(0, 0.5, n)
    )
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(xs)], "t long, x double"
    )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in autocorrelation(df, "t", "x", lags=[1, 4, 8]).collect()
    }
    for k in (1, 4, 8):
        a, b = xs[:-k], xs[k:]
        want = float(np.corrcoef(a, b)[0, 1])
        assert got[k][0] == n - k
        assert got[k][1] == pytest.approx(want, abs=1e-9)
    # period-8 seasonality: strong positive at the season, negative at half
    assert got[8][1] > 0.9 and got[4][1] < 0


def test_acf_gaps_are_pairwise_complete(spark):
    from rust_cdc_validator_spark.operators.timeseries import autocorrelation

    rows = [(0, 1.0), (1, 2.0), (2, 4.0), (4, 8.0), (5, 3.0)]  # tick 3 missing
    df = spark.createDataFrame(rows, "t long, x double")
    got = {r["lag"]: r["n_pairs"] for r in
           autocorrelation(df, "t", "x", lags=[1, 2]).collect()}
    # lag 1 pairs: (0,1) (1,2) (4,5) -> 3; lag 2: (0,2) (2,4) -> 2
    assert got == {1: 3, 2: 2}


def test_acf_step_and_validation(spark):
    from rust_cdc_validator_spark.operators.timeseries import autocorrelation

    rows = [(0, 1.0), (10, 2.0), (20, 1.0), (30, 2.0)]
    df = spark.createDataFrame(rows, "t long, x double")
    got = {r["lag"]: r["n_pairs"] for r in
           autocorrelation(df, "t", "x", lags=[1], step=10).collect()}
    assert got[1] == 3
    with pytest.raises(ValueError, match="lags"):
        autocorrelation(df, "t", "x", lags=[])
    with pytest.raises(ValueError, match="lags"):
        autocorrelation(df, "t", "x", lags=[0])
    with pytest.raises(ValueError, match="step"):
        autocorrelation(df, "t", "x", lags=[1], step=0)


# --------------------------------------------------- seasonal_decompose


def test_seasonal_decompose_matches_statsmodels_convention(spark):
    """Planted period-4 signal + linear trend: the phase indices must
    recover the planted offsets (centered), computed exactly like the
    classical 2x4 CMA decomposition."""
    import numpy as np

    from rust_cdc_validator_spark.operators.timeseries import (
        seasonal_decompose,
    )

    season = [3.0, -1.0, -2.0, 0.0]  # sums to 0
    n = 96
    xs = [0.05 * t + season[t % 4] + 10.0 for t in range(n)]
    df = spark.createDataFrame(
        [(t, x) for t, x in enumerate(xs)], "t long, x double"
    )
    got = {
        r["phase"]: (r["n_obs"], r["seasonal"])
        for r in seasonal_decompose(df, "t", "x", period=4).collect()
    }
    # reference: even-period CMA then centered phase means
    h = 2
    trend = {}
    for t in range(h, n - h):
        trend[t] = (
            sum(xs[t - 1 : t + 2]) + 0.5 * xs[t - 2] + 0.5 * xs[t + 2]
        ) / 4.0
    det = {}
    for t, tr in trend.items():
        det.setdefault(t % 4, []).append(xs[t] - tr)
    means = {p: sum(v) / len(v) for p, v in det.items()}
    g = sum(means.values()) / 4.0
    for p in range(4):
        assert got[p][0] == len(det[p])
        assert got[p][1] == pytest.approx(means[p] - g, abs=1e-9)
    # a pure linear trend contributes nothing: indices ~ planted season
    for p in range(4):
        assert got[p][1] == pytest.approx(season[p], abs=1e-6)


def test_seasonal_decompose_odd_period_and_gaps(spark):
    from rust_cdc_validator_spark.operators.timeseries import (
        seasonal_decompose,
    )

    season = [1.0, 0.0, -1.0]
    rows = [(t, season[t % 3] + 5.0) for t in range(30) if t != 14]
    df = spark.createDataFrame(rows, "t long, x double")
    got = {r["phase"]: r["seasonal"] for r in
           seasonal_decompose(df, "t", "x", period=3).collect()}
    for p in range(3):
        assert got[p] == pytest.approx(season[p], abs=1e-9)
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "t", "x", period=1)


# ------------------------------------------------------ cross-correlation


def test_xcorr_matches_numpy_and_detects_lead(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.timeseries import (
        cross_correlation,
    )

    rng = np.random.default_rng(21)
    n = 200
    xs = rng.normal(0, 1, n)
    ys = np.roll(xs, 3) + rng.normal(0, 0.1, n)  # y lags x by 3 ticks
    rows = [(int(t), float(xs[t]), float(ys[t])) for t in range(n)]
    df = spark.createDataFrame(rows, "t long, x double, y double")
    got = {
        r["lag"]: (r["n_pairs"], r["corr"])
        for r in cross_correlation(df, "t", "x", "y", lags=[-3, 0, 3]).collect()
    }
    for k in (-3, 0, 3):
        if k >= 0:
            a, b = xs[: n - k], ys[k:]
        else:
            a, b = xs[-k:], ys[: n + k]
        want = float(np.corrcoef(a, b)[0, 1])
        assert got[k][0] == n - abs(k)
        assert got[k][1] == pytest.approx(want, abs=1e-9)
    # x leads y by 3: corr peaks at +3, not at -3
    assert got[3][1] > 0.95 and abs(got[-3][1]) < 0.5


def test_xcorr_validation_and_acf_consistency(spark):
    from rust_cdc_validator_spark.operators.timeseries import (
        autocorrelation,
        cross_correlation,
    )

    rows = [(t, float((t * 7) % 5), float((t * 7) % 5)) for t in range(40)]
    df = spark.createDataFrame(rows, "t long, x double, y double")
    acf = {r["lag"]: r["acf"] for r in
           autocorrelation(df, "t", "x", lags=[1, 2]).collect()}
    xc = {r["lag"]: r["corr"] for r in
          cross_correlation(df, "t", "x", "y", lags=[1, 2]).collect()}
    assert acf == xc  # x == y: cross-correlation IS the ACF
    with pytest.raises(ValueError, match="lags"):
        cross_correlation(df, "t", "x", "y", lags=[])


def test_seasonal_residuals_recover_planted_anomaly(spark):
    from rust_cdc_validator_spark.operators.timeseries import (
        seasonal_decompose,
        seasonal_residuals,
    )

    season = [2.0, -1.0, -1.0, 0.0]
    xs = [0.1 * t + season[t % 4] + 5.0 for t in range(60)]
    xs[30] += 7.0  # planted level spike
    df = spark.createDataFrame(list(enumerate(xs)), "t long, x double")
    rows = {r["tick"]: r for r in
            seasonal_residuals(df, "t", "x", period=4).collect()}
    # identity: value == trend + seasonal + residual, bit-exact
    for r in rows.values():
        assert r["value"] == r["trend"] + r["seasonal"] + r["residual"]
    # the spike owns the largest |residual| by a wide margin
    top = max(rows.values(), key=lambda r: abs(r["residual"]))
    assert top["tick"] == 30 and abs(top["residual"]) > 3.0
    # phase indices agree with the aggregate operator
    agg = {r["phase"]: r["seasonal"] for r in
           seasonal_decompose(df, "t", "x", period=4).collect()}
    for r in rows.values():
        assert r["seasonal"] == agg[r["phase"]]


# ---------------------------------------------------------------------------
# Kaplan–Meier survival (r11)
# ---------------------------------------------------------------------------


def test_kaplan_meier_hand_computed(spark):
    """Planted history, KM worked by hand.

    Horizon = 2024-01-31 (max date). Subjects:
      a: orders on 01, 11, 21  -> gaps 10, 10 observed; censored 10 (21->31)
      b: orders on 01, 06      -> gap 5 observed; censored 25
      c: order  on 01          -> censored 30 only
    Observations: events {5, 10, 10}, censored {10, 25, 30}.
      t=5:  n=6, d=1, c=0 -> S = 5/6
      t=10: n=5, d=2, c=1 -> S = 5/6 * 3/5 = 0.5
      t=25: n=2, d=0, c=1 -> S = 0.5
      t=30: n=1, d=0, c=1 -> S = 0.5
    """
    from rust_cdc_validator_spark.operators.timeseries import kaplan_meier

    rows = [
        ("a", "2024-01-01"), ("a", "2024-01-11"), ("a", "2024-01-21"),
        ("b", "2024-01-01"), ("b", "2024-01-06"),
        ("c", "2024-01-01"),
    ]
    df = spark.createDataFrame(rows, "u string, d string")
    out = {
        r["t_days"]: (
            r["n_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in kaplan_meier(df, "u", "d", horizon="2024-01-31").collect()
    }
    assert out[5] == (6, 1, 0, round(5 / 6, 6))
    assert out[10] == (5, 2, 1, 0.5)
    assert out[25] == (2, 0, 1, 0.5)
    assert out[30] == (1, 0, 1, 0.5)
    assert set(out) == {5, 10, 25, 30}


def test_kaplan_meier_exact_zero_tail(spark):
    """When every subject at the last risk set dies (d == n), survival is
    EXACT 0.0 — carried by the sticky flag, not ln(0) (which DuckDB
    rejects and Spark silently NULLs out of the sum)."""
    from rust_cdc_validator_spark.operators.timeseries import kaplan_meier

    # Horizon forced past the data so the final gaps are all events with
    # zero-length censoring rows landing at dur=0... instead pin horizon
    # exactly at each subject's last date: censored durs collapse to 0.
    rows = [
        ("a", "2024-01-01"), ("a", "2024-01-11"),
        ("b", "2024-01-01"), ("b", "2024-01-11"),
    ]
    df = spark.createDataFrame(rows, "u string, d string")
    out = {
        r["t_days"]: r["survival"]
        for r in kaplan_meier(df, "u", "d").collect()
    }
    # obs: events {10, 10}, censored {0, 0} (last->horizon=last)
    # t=0: n=4, d=0, c=2 -> S=1.0 ; t=10: n=2, d=2 -> S=0.0 exactly
    assert out[0] == 1.0
    assert out[10] == 0.0


def test_kaplan_meier_single_event_subjects_only_censor(spark):
    from rust_cdc_validator_spark.operators.timeseries import kaplan_meier

    rows = [("a", "2024-01-01"), ("b", "2024-01-06")]
    df = spark.createDataFrame(rows, "u string, d string")
    out = kaplan_meier(df, "u", "d").collect()
    # no observed events anywhere -> survival stays 1.0 on every row
    assert all(r["survival"] == 1.0 for r in out)
    assert sum(r["n_events"] for r in out) == 0


# ---------------------------------------------------------------------------
# EWMA smoothing (r11)
# ---------------------------------------------------------------------------


def test_ewma_matches_numpy_truncated_form(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.timeseries import ewma_smooth

    xs = [10.0, 12.0, 9.0, 20.0, 15.0, 15.0, 3.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, x double"
    )
    out = {
        r["tick"]: (r["ewma"], r["deviation"])
        for r in ewma_smooth(df, "t", "x", alpha=0.3, terms=4).collect()
    }
    a = 0.3
    for t in range(len(xs)):
        lags = [xs[t - i] for i in range(0, 4) if t - i >= 0]
        ws = [(1 - a) ** i for i in range(len(lags))]
        want = float(np.dot(ws, lags) / np.sum(ws))
        assert abs(out[t][0] - want) < 1e-12, (t, out[t][0], want)
        plags = [xs[t - i] for i in range(1, 5) if t - i >= 0]
        if plags:
            pws = [(1 - a) ** (i - 1) for i in range(1, len(plags) + 1)]
            pwant = xs[t] - float(np.dot(pws, plags) / np.sum(pws))
            assert abs(out[t][1] - pwant) < 1e-12
        else:
            assert out[t][1] is None


def test_ewma_validation(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.timeseries import ewma_smooth

    df = spark.createDataFrame([(0, 1.0)], "t long, x double")
    with _pytest.raises(ValueError):
        ewma_smooth(df, "t", "x", alpha=0.0)
    with _pytest.raises(ValueError):
        ewma_smooth(df, "t", "x", terms=0)


def test_nelson_aalen_hand_computed(spark):
    """3-subject example: A orders day1+day3 (observed gap 2, censored 0
    at horizon), B orders day2 only (censored 1). Duration table is
    dur0(0ev,1c) dur1(0ev,1c) dur2(1ev,0c); risk sets 3,2,1; H jumps only
    at dur2 by 1/1; Breslow survival exp(-H)."""
    import math

    from rust_cdc_validator_spark.operators.timeseries import nelson_aalen

    df = spark.createDataFrame(
        [("A", "2024-01-01"), ("A", "2024-01-03"), ("B", "2024-01-02")],
        "u string, d string",
    )
    rows = {r["t_days"]: r for r in nelson_aalen(df, "u", "d").collect()}
    assert (rows[0]["n_risk"], rows[0]["n_events"], rows[0]["n_censored"]) == (3, 0, 1)
    assert (rows[1]["n_risk"], rows[1]["n_events"]) == (2, 0)
    assert (rows[2]["n_risk"], rows[2]["n_events"]) == (1, 1)
    assert rows[0]["cum_hazard"] == 0.0 and rows[1]["cum_hazard"] == 0.0
    assert rows[2]["cum_hazard"] == 1.0
    assert rows[2]["hazard_se"] == 1.0
    assert abs(rows[2]["breslow_survival"] - math.exp(-1.0)) < 1e-6


def test_nelson_aalen_dominates_km(spark, sf_dir):
    """Known estimator inequality: KM survival <= exp(-H_NA) everywhere
    (1-x <= exp(-x) per factor), with equality only where no events.
    Checked on the real orders relation — also pins that both consume the
    identical duration/risk table after the r12 refactor."""
    from rust_cdc_validator_spark.operators.timeseries import (
        kaplan_meier,
        nelson_aalen,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    km = {
        r["t_days"]: r
        for r in kaplan_meier(orders, "o_custkey", "o_orderdate").collect()
    }
    na = {
        r["t_days"]: r
        for r in nelson_aalen(orders, "o_custkey", "o_orderdate").collect()
    }
    assert set(km) == set(na)
    for t in km:
        assert (
            km[t]["n_risk"],
            km[t]["n_events"],
            km[t]["n_censored"],
        ) == (na[t]["n_risk"], na[t]["n_events"], na[t]["n_censored"])
        assert km[t]["survival"] <= na[t]["breslow_survival"] + 1e-6, t
    # hazard is monotone nondecreasing in t
    hz = [na[t]["cum_hazard"] for t in sorted(na)]
    assert hz == sorted(hz)


def test_brown_double_smooth_constant_and_validation(spark):
    """A constant series is a fixed point: s1 = s2 = level = forecast = c,
    trend = 0 at every tick (truncated-fan denominators cancel)."""
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.timeseries import (
        brown_double_smooth,
    )

    df = spark.createDataFrame(
        [(t, 5.0) for t in range(12)], "tick_in long, x double"
    )
    rows = brown_double_smooth(
        df, "tick_in", "x", alpha=0.3, terms=4, horizon=2
    ).collect()
    assert len(rows) == 12
    for r in rows:
        assert abs(r["s1_r"] - 5.0) < 1e-6
        assert abs(r["s2_r"] - 5.0) < 1e-6
        assert abs(r["level_r"] - 5.0) < 1e-6
        assert abs(r["trend_r"]) < 1e-6
        assert abs(r["forecast_r"] - 5.0) < 1e-6

    for bad in (
        dict(alpha=0.0),
        dict(alpha=1.0),
        dict(terms=0),
        dict(horizon=-1),
    ):
        with _pytest.raises(ValueError):
            brown_double_smooth(df, "tick_in", "x", **bad)


def test_brown_double_smooth_tracks_linear_trend(spark):
    """On x_t = 2t the steady-state trend estimate approaches the true
    slope 2 and the h-step forecast leads the level by h*trend — the
    property Brown's method exists for (EWMA alone lags a trend)."""
    from rust_cdc_validator_spark.operators.timeseries import (
        brown_double_smooth,
    )

    df = spark.createDataFrame(
        [(t, 2.0 * t) for t in range(40)], "tick_in long, x double"
    )
    out = {
        r["tick"]: r
        for r in brown_double_smooth(
            df, "tick_in", "x", alpha=0.5, terms=12, horizon=3
        ).collect()
    }
    last = out[39]
    assert abs(last["trend_r"] - 2.0) < 0.1
    assert abs(
        last["forecast_r"] - (last["level_r"] + 3 * last["trend_r"])
    ) < 1e-5
    # the EWMA alone (s1) lags the series; the trend-corrected level
    # closes most of that gap
    assert abs(last["level_r"] - 78.0) < abs(last["s1_r"] - 78.0)


def _cusum_reference(xs: list[float], k: float = 0.5):
    """Sequential Page recursion over standardized values."""
    import math

    n = len(xs)
    mu = sum(xs) / n
    var = sum(v * v for v in xs) / n - mu * mu
    sd = math.sqrt(var)
    sp = sm = 0.0
    out = []
    for v in xs:
        z = (v - mu) / sd
        sp = max(0.0, sp + z - k)
        sm = max(0.0, sm - z - k)
        out.append((sp, sm))
    return out


def test_cusum_matches_sequential_recursion(spark):
    from rust_cdc_validator_spark.operators.timeseries import cusum_chart

    # stable regime then a sustained +2 shift from tick 30
    xs = [10.0 + (i % 5) * 0.1 for i in range(30)] + [
        12.0 + (i % 5) * 0.1 for i in range(20)
    ]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, v double"
    )
    rows = cusum_chart(df, "t", "v", k=0.5, h=4.0).orderBy("tick").collect()
    ref = _cusum_reference(xs, k=0.5)
    for r, (sp, sm) in zip(rows, ref):
        assert r["s_plus"] == pytest.approx(sp, abs=2e-5)
        assert r["s_minus"] == pytest.approx(sm, abs=2e-5)
        assert r["alarm"] == (sp > 4.0 or sm > 4.0) or abs(sp - 4.0) < 1e-4
    # the shift must eventually alarm on the upper side
    assert any(r["alarm"] and r["s_plus"] > 4.0 for r in rows[30:])
    # self-baselined mu sits between the regimes, so the pre-shift era
    # legitimately accumulates on the LOWER side — but nothing alarms
    # before the sums have had ticks to build
    assert not any(r["alarm"] for r in rows[:8])


def test_cusum_validation(spark):
    from rust_cdc_validator_spark.operators.timeseries import cusum_chart

    df = spark.createDataFrame([(0, 1.0)], "t long, v double")
    with pytest.raises(ValueError, match="k must"):
        cusum_chart(df, "t", "v", k=-1.0)
    with pytest.raises(ValueError, match="h must"):
        cusum_chart(df, "t", "v", h=0.0)


def _mk_reference(xs: list[float]):
    """Sequential Mann-Kendall with tie correction + Sen's slope."""
    import math
    from collections import Counter

    n = len(xs)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            d = xs[j] - xs[i]
            s += (d > 0) - (d < 0)
            slopes.append(d / (j - i))
    ties = Counter(xs)
    tie_sum = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_sum) / 18
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    slopes.sort()
    m = len(slopes)
    med = (
        slopes[(m - 1) // 2]
        if m % 2
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    )
    return s, var, z, med


def test_mann_kendall_matches_reference(spark):
    from rust_cdc_validator_spark.operators.timeseries import mann_kendall

    xs = [3.0, 5.0, 2.0, 5.0, 7.0, 6.0, 9.0, 9.0, 11.0, 10.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, v double"
    )
    row = mann_kendall(df, "t", "v").collect()[0]
    s, var, z, med = _mk_reference(xs)
    assert row["n_ticks"] == 10
    assert row["s_stat"] == s
    assert row["var_s"] == pytest.approx(var, abs=1e-6)
    assert row["z"] == pytest.approx(z, abs=1e-5)
    assert row["sen_slope"] == pytest.approx(med, abs=1e-6)


def test_mann_kendall_trend_labels(spark):
    from rust_cdc_validator_spark.operators.timeseries import mann_kendall

    up = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "t long, v double"
    )
    assert mann_kendall(up, "t", "v").collect()[0]["trend"] == "increasing"
    down = spark.createDataFrame(
        [(i, float(-i)) for i in range(20)], "t long, v double"
    )
    assert mann_kendall(down, "t", "v").collect()[0]["trend"] == "decreasing"
    flat = spark.createDataFrame(
        [(i, 1.0 if i % 2 else 2.0) for i in range(12)], "t long, v double"
    )
    r = mann_kendall(flat, "t", "v").collect()[0]
    assert r["trend"] == "no trend"
