from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.drift import drift_report


def _frames(spark):
    before = spark.createDataFrame(
        [(i, float(i), "x" if i % 2 else None) for i in range(100)],
        "id long, v double, s string",
    )
    after = spark.createDataFrame(
        [(i, float(i) * 2, None) for i in range(100)],  # v scale doubles; s all null
        "id long, v double, s string",
    )
    return before, after


def test_drift_report_flags_moved_metrics_only(spark):
    before, after = _frames(spark)
    rows = {
        (r["column"], r["metric"]): r
        for r in drift_report(before, after).collect()
    }
    assert rows[("__table__", "row_count")]["drifted"] is False
    assert rows[("id", "mean")]["drifted"] is False        # unchanged column
    assert rows[("v", "mean")]["drifted"] is True          # doubled
    assert abs(rows[("v", "mean")]["rel_delta"] - 1.0) < 1e-9
    assert rows[("s", "null_count")]["drifted"] is True    # 50 -> 100 nulls
    assert rows[("v", "max")]["value_after"] == 198.0


def test_drift_report_schema_drift_and_single_pass(spark):
    before, after = _frames(spark)
    after2 = after.drop("s").withColumn("extra", F.lit(1))
    rows = {
        (r["column"], r["metric"]): r
        for r in drift_report(before, after2).collect()
    }
    # column only in BEFORE: flagged, after side null
    assert rows[("s", "null_count")]["value_after"] is None
    assert rows[("s", "null_count")]["drifted"] is True
    # column only in AFTER: flagged
    assert rows[("extra", "mean")]["value_before"] is None
    assert rows[("extra", "mean")]["drifted"] is True
    # each side is ONE aggregate: exactly two HashAggregate pairs feed the join
    plan = (
        drift_report(before, after)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_drift_report_null_std_single_row_not_flagged(spark):
    a = spark.createDataFrame([(1, 5.0)], "id long, v double")
    rows = {
        (r["column"], r["metric"]): r for r in drift_report(a, a).collect()
    }
    assert rows[("v", "std")]["value_before"] is None
    assert rows[("v", "std")]["drifted"] is False  # null==null: no drift


def test_psi_drift_identical_distributions_near_zero(spark):
    from rust_cdc_validator_spark.operators.drift import psi_drift

    df = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(500)], "id long, v double"
    )
    rows = psi_drift(df, df, "v", bins=10).collect()
    assert len(rows) == 10
    assert abs(sum(r["psi_contrib"] for r in rows)) < 1e-12


def test_psi_drift_shift_flags_and_clamps_outliers(spark):
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.operators.drift import psi_drift

    before = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], "id long, v double"
    )
    after = before.withColumn("v", F.col("v") + 200.0)  # fully out of range
    rows = psi_drift(before, after, "v", bins=10).collect()
    total = sum(r["psi_contrib"] for r in rows)
    assert total > 0.25  # "investigate" territory
    top = max(rows, key=lambda r: r["bin"])
    assert top["share_after"] == 1.0  # outliers clamp into the edge bin


def test_psi_drift_validation_and_null_exclusion(spark):
    import pytest
    from rust_cdc_validator_spark.operators.drift import psi_drift

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 2.0)], "id long, v double"
    )
    rows = psi_drift(df, df, "v", bins=2).collect()
    assert abs(sum(r["share_before"] for r in rows) - 1.0) < 1e-12  # nulls out
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", bins=1)
    empty = df.filter("v IS NULL")
    with pytest.raises(ValueError):
        psi_drift(empty, df, "v")


def test_spearman_perfect_monotone_and_inverted(spark):
    from rust_cdc_validator_spark.operators.drift import spearman_corr

    rows = [("g", float(i), float(i * i)) for i in range(1, 8)] + [
        ("h", float(i), float(-i)) for i in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r["spearman_r"] for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert got["g"] == pytest.approx(1.0, abs=1e-12)  # monotone, nonlinear
    assert got["h"] == pytest.approx(-1.0, abs=1e-12)


def test_spearman_average_rank_ties_match_scipy_formula(spark):
    from rust_cdc_validator_spark.operators.drift import spearman_corr

    xs = [1.0, 2.0, 2.0, 3.0]
    ys = [10.0, 20.0, 30.0, 40.0]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    got = spearman_corr(df, ["g"], "x", "y").first()["spearman_r"]
    # average ranks: x -> [1, 2.5, 2.5, 4], y -> [1,2,3,4]; Pearson by hand
    import numpy as np

    rx = np.array([1.0, 2.5, 2.5, 4.0])
    ry = np.array([1.0, 2.0, 3.0, 4.0])
    want = float(np.corrcoef(rx, ry)[0, 1])
    assert got == pytest.approx(want, abs=1e-12)


def test_spearman_nulls_excluded_and_degenerate_null(spark):
    from rust_cdc_validator_spark.operators.drift import spearman_corr

    rows = [("g", 1.0, 1.0), ("g", 2.0, None), ("g", 3.0, 9.0), ("k", 5.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in spearman_corr(df, ["g"], "x", "y").collect()}
    assert out["g"]["n_rows"] == 2  # null row dropped before ranking
    assert out["k"]["spearman_r"] is None  # single row: undefined, not a crash


def test_mutual_information_independent_and_determined(spark):
    import math

    from rust_cdc_validator_spark.operators.drift import mutual_information

    # perfectly factorized joint: MI must be exactly ~0
    indep = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "uv" for _ in range(3)],
        "x string, y string",
    )
    r = mutual_information(indep, "x", "y").first()
    assert abs(r["mi_nats"]) < 1e-12 and abs(r["redundancy"]) < 1e-12
    assert r["h_x"] == pytest.approx(math.log(2), abs=1e-12)

    # y determined by x: MI == H(X) == H(Y), redundancy == 1
    det = spark.createDataFrame(
        [("a", "u"), ("a", "u"), ("b", "v"), ("c", "w")], "x string, y string"
    )
    r = mutual_information(det, "x", "y").first()
    want_h = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
    assert r["mi_nats"] == pytest.approx(want_h, abs=1e-12)
    assert r["redundancy"] == pytest.approx(1.0, abs=1e-12)


def test_mutual_information_hand_computed_and_grouped(spark):
    import math

    from rust_cdc_validator_spark.operators.drift import mutual_information

    # group g: joint {(a,u):2, (a,v):1, (b,v):1}; group h: independent
    rows = (
        [("g", "a", "u"), ("g", "a", "u"), ("g", "a", "v"), ("g", "b", "v")]
        + [("h", x, y) for x in "ab" for y in "uv"]
    )
    df = spark.createDataFrame(rows, "grp string, x string, y string")
    out = {
        r["grp"]: r
        for r in mutual_information(df, "x", "y", ["grp"]).collect()
    }
    # p(a,u)=.5 [px=.75, pu=.5]; p(a,v)=.25 [px=.75, pv=.5]; p(b,v)=.25 [px=.25, pv=.5]
    want = (
        0.5 * math.log(0.5 / (0.75 * 0.5))
        + 0.25 * math.log(0.25 / (0.75 * 0.5))
        + 0.25 * math.log(0.25 / (0.25 * 0.5))
    )
    assert out["g"]["mi_nats"] == pytest.approx(want, abs=1e-12)
    assert abs(out["h"]["mi_nats"]) < 1e-12


def test_changepoint_amoc_planted_shift(spark):
    from rust_cdc_validator_spark.operators.timeseries import changepoint_amoc

    # level shift at index 10: 0..9 -> ~1.0, 10..19 -> ~5.0 (small wiggle)
    rows = []
    for i in range(20):
        base = 1.0 if i < 10 else 5.0
        rows.append(("a", i, base + (0.01 * (i % 3))))
    # control series with no shift
    rows += [("b", i, 2.0 + 0.01 * (i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, "grp string, day int, v double")
    out = {r["grp"]: r for r in changepoint_amoc(df, ["grp"], "day", "v").collect()}
    a = out["a"]
    assert a["cut_index"] == 10 and a["cut_point"] == 9  # cut AFTER day 9
    assert a["mean_before"] < 1.1 and a["mean_after"] > 4.9
    assert a["shift_stat"] > out["b"]["shift_stat"] * 10
    assert a["n_points"] == 20


def test_changepoint_amoc_matches_bruteforce(spark):
    import math
    import random as _r

    from rust_cdc_validator_spark.operators.timeseries import changepoint_amoc

    rng = _r.Random(3)
    vals = [rng.random() for _ in range(15)]
    best = None
    n = len(vals)
    for t in range(1, n):
        mb = sum(vals[:t]) / t
        ma = sum(vals[t:]) / (n - t)
        d = abs(mb - ma) * math.sqrt(t * (n - t) / n)
        if best is None or d > best[1] + 1e-15:
            best = (t, d)
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "grp string, day int, v double"
    )
    got = changepoint_amoc(df, ["grp"], "day", "v").first()
    assert got["cut_index"] == best[0]
    assert abs(got["shift_stat"] - round(best[1], 6)) < 1e-9


# ---------------------------------------------------------------------------
# Chi-squared independence (r9)
# ---------------------------------------------------------------------------

def test_chi_squared_matches_direct_computation(spark):
    from rust_cdc_validator_spark.operators.drift import chi_squared

    rows = []
    # 3x2 table with known counts, including a zero-observed cell ("c",0)
    for x, y, c in [("a", 0, 20), ("a", 1, 30), ("b", 0, 25), ("b", 1, 5), ("c", 1, 20)]:
        rows += [(x, y)] * c
    df = spark.createDataFrame(rows, "x string, y int")
    got = chi_squared(df, "x", "y").first()
    # direct chi2 over the FULL 3x2 grid (zero cells included)
    import itertools

    n = len(rows)
    from collections import Counter

    obs = Counter(rows)
    nx = Counter(x for x, _ in rows)
    ny = Counter(y for _, y in rows)
    chi2 = 0.0
    for x, y in itertools.product(nx, ny):
        e = nx[x] * ny[y] / n
        chi2 += (obs.get((x, y), 0) - e) ** 2 / e
    assert got["n"] == n
    assert got["dof"] == 2  # (3-1)*(2-1)
    assert abs(got["chi2"] - chi2) < 1e-9
    import math

    assert abs(got["cramers_v"] - math.sqrt(chi2 / (n * 1))) < 1e-9


def test_chi_squared_independent_and_degenerate(spark):
    from rust_cdc_validator_spark.operators.drift import chi_squared

    # perfectly independent 2x2 (balanced cross)
    rows = [(x, y) for x in ("a", "b") for y in (0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "x string, y int")
    got = chi_squared(df, "x", "y").first()
    assert abs(got["chi2"]) < 1e-9 and got["cramers_v"] == 0.0
    # degenerate 1xk: dof 0, V defined as 0
    deg = spark.createDataFrame([("a", i % 3) for i in range(12)], "x string, y int")
    d = chi_squared(deg, "x", "y").first()
    assert d["dof"] == 0 and d["cramers_v"] == 0.0


def test_chi_squared_grouped(spark):
    from rust_cdc_validator_spark.operators.drift import chi_squared

    rows = [("g1", "a", 0)] * 10 + [("g1", "b", 1)] * 10 + [
        ("g2", x, y) for x in ("a", "b") for y in (0, 1) for _ in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, x string, y int")
    got = {r["g"]: r for r in chi_squared(df, "x", "y", ["g"]).collect()}
    assert got["g1"]["chi2"] > 10  # perfect association
    assert abs(got["g2"]["chi2"]) < 1e-9


def test_chi_squared_null_category_counts(spark):
    """ADVICE r9: NULL must be a real category — null-unsafe marginal
    joins dropped its cells from the sum while n still counted the rows,
    driving chi2 low (even negative) and dof wrong. Compare against a
    direct full-grid computation with NULL as a category."""
    import itertools
    from collections import Counter

    from rust_cdc_validator_spark.operators.drift import chi_squared

    rows = []
    for x, y, c in [
        ("a", 0, 12), ("a", 1, 3), ("b", 0, 5), ("b", 1, 10),
        (None, 0, 9), (None, 1, 1),
    ]:
        rows += [(x, y)] * c
    df = spark.createDataFrame(rows, "x string, y int")
    got = chi_squared(df, "x", "y").first()
    n = len(rows)
    obs = Counter(rows)
    nx = Counter(x for x, _ in rows)
    ny = Counter(y for _, y in rows)
    chi2 = 0.0
    for x, y in itertools.product(nx, ny):
        e = nx[x] * ny[y] / n
        chi2 += (obs.get((x, y), 0) - e) ** 2 / e
    assert got["n"] == n
    assert got["dof"] == 2  # NULL is the third x category: (3-1)*(2-1)
    assert abs(got["chi2"] - chi2) < 1e-9
    assert got["chi2"] > 0


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample (r9)
# ---------------------------------------------------------------------------

def _ks_reference(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    sx, sy = sorted(xs), sorted(ys)
    import bisect

    best, at = -1.0, None
    for v in vals:
        d = abs(
            bisect.bisect_right(sx, v) / na - bisect.bisect_right(sy, v) / nb
        )
        if d > best + 1e-15:
            best, at = d, v
    return best, at


def test_ks_two_sample_matches_reference(spark):
    import random

    from rust_cdc_validator_spark.operators.drift import ks_two_sample

    rng = random.Random(3)
    xs = [round(rng.gauss(0, 1), 3) for _ in range(400)]
    ys = [round(rng.gauss(0.5, 1.3), 3) for _ in range(300)]
    a = spark.createDataFrame([(v,) for v in xs], "x double")
    b = spark.createDataFrame([(v,) for v in ys], "x double")
    got = ks_two_sample(a, b, "x").first()
    want_d, want_at = _ks_reference(xs, ys)
    assert got["n_a"] == 400 and got["n_b"] == 300
    assert abs(got["ks_d"] - round(want_d, 6)) < 1e-9
    assert got["at_value"] == want_at
    assert got["ks_d"] > got["critical_95"]  # planted shift is detectable


def test_ks_two_sample_identical_distributions(spark):
    from rust_cdc_validator_spark.operators.drift import ks_two_sample

    a = spark.range(500).select((F.col("id") % 50).cast("double").alias("x"))
    got = ks_two_sample(a, a, "x").first()
    assert got["ks_d"] == 0.0


def test_ks_round_to_bounds_distinct_relation(spark):
    """VERDICT r9 #6: on a nearly-unique continuous column the (value,
    count) collapse is row-sized — round_to must bound the shuffled
    relation at range/width buckets while keeping D within one bucket's
    probability mass of the exact statistic."""
    import random

    from rust_cdc_validator_spark.operators.drift import ks_two_sample

    rng = random.Random(11)
    xs = [rng.gauss(0, 1) for _ in range(4000)]       # ~all distinct
    ys = [rng.gauss(0.4, 1.0) for _ in range(4000)]
    a = spark.createDataFrame([(v,) for v in xs], "x double")
    b = spark.createDataFrame([(v,) for v in ys], "x double")

    exact = ks_two_sample(a, b, "x").first()
    w = 0.05
    bucketed = ks_two_sample(a, b, "x", round_to=w).first()

    # counts unchanged; D within a bucket's probability mass of exact
    assert bucketed["n_a"] == 4000 and bucketed["n_b"] == 4000
    assert abs(bucketed["ks_d"] - exact["ks_d"]) < 0.05
    assert bucketed["ks_d"] > bucketed["critical_95"]  # drift still seen
    # at_value sits on the bucket grid (floor(v/w)*w)
    assert abs(bucketed["at_value"] / w - round(bucketed["at_value"] / w)) < 1e-9

    # the relation entering the prefix scan is bucket-sized, not row-sized:
    # the same floor expression over the pooled raw values collapses
    # 8000 near-unique rows to ~range/width buckets
    pooled = a.unionAll(b)
    raw_distinct = pooled.distinct().count()
    bucket_distinct = (
        pooled.select((F.floor(F.col("x") / w) * w).alias("v")).distinct().count()
    )
    assert raw_distinct > 7900            # the planted worst case is real
    assert bucket_distinct < 400          # ~8 sigma span / 0.05 width

    # validation
    import pytest

    with pytest.raises(ValueError):
        ks_two_sample(a, b, "x", round_to=0.0)


# ---------------------------------------------------------------------------
# Group-wise OLS (r9)
# ---------------------------------------------------------------------------

def test_ols_by_group_matches_numpy(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.drift import ols_by_group

    rng = np.random.RandomState(9)
    rows = []
    for g, (a, b) in {"g1": (2.0, 1.0), "g2": (-0.5, 3.0)}.items():
        xs = rng.uniform(0, 10, 100)
        ys = a * xs + b + rng.normal(0, 0.5, 100)
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ols_by_group(df, ["g"], "x", "y").collect()}
    for g in ("g1", "g2"):
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[g]["n"] == 100
        assert abs(got[g]["slope"] - slope) < 1e-9
        assert abs(got[g]["intercept"] - intercept) < 1e-9
        assert abs(got[g]["r2"] - r * r) < 1e-9


def test_ols_degenerate_and_nulls(spark):
    from rust_cdc_validator_spark.operators.drift import ols_by_group

    rows = [("flat", 1.0, 5.0), ("flat", 1.0, 7.0),
            ("ok", 1.0, 1.0), ("ok", 2.0, 3.0), ("ok", None, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in ols_by_group(df, ["g"], "x", "y").collect()}
    assert got["flat"]["slope"] is None and got["flat"]["r2"] is None
    assert got["ok"]["n"] == 2  # null x excluded
    assert abs(got["ok"]["slope"] - 2.0) < 1e-12


# ---------------------------------------------------------------------------
# Decile lift (r9)
# ---------------------------------------------------------------------------

def test_decile_lift_matches_reference(spark):
    import random

    from rust_cdc_validator_spark.operators.drift import decile_lift

    from decimal import ROUND_HALF_UP, Decimal

    def r6(v):  # Spark/DuckDB round() is half-up; Python's is half-even
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    rng = random.Random(21)
    rows = []
    for i in range(500):
        score = rng.random()
        # higher score -> more likely positive (a working model)
        label = 1 if rng.random() < score else 0
        rows.append((i, score, label))
    df = spark.createDataFrame(rows, "id long, score double, y int")
    got = {r["bucket"]: r for r in decile_lift(df, "score", "y", "id").collect()}
    # reference: python sort by (-score, id)
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    n, p = len(rows), sum(r[2] for r in rows)
    want = {}
    for rk, (_, _, y) in enumerate(ordered):
        b = rk * 10 // n
        want.setdefault(b, [0, 0])
        want[b][0] += 1
        want[b][1] += y
    cum = 0
    for b in sorted(want):
        nb, pb = want[b]
        cum += pb
        assert got[b]["n_rows"] == nb and got[b]["n_pos"] == pb
        assert abs(got[b]["rate"] - r6(pb / nb)) < 1e-9
        assert abs(got[b]["lift"] - r6((pb / nb) / (p / n))) < 1e-9
        assert abs(got[b]["cum_capture"] - r6(cum / p)) < 1e-9
    # a score that works has a downward-sloping lift curve
    assert got[0]["lift"] > 1.5 > got[9]["lift"]


def test_decile_lift_validation(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.drift import decile_lift

    df = spark.createDataFrame([(1, 0.5, 1)], "id long, s double, y int")
    with _pytest.raises(ValueError, match="buckets"):
        decile_lift(df, "s", "y", "id", buckets=1)


def test_decile_lift_null_scores_excluded(spark):
    """ADVICE r9: Spark's ascending-negated sort put NULL scores FIRST
    (best decile) while SQL ORDER BY s DESC puts them last — unscored
    rows are now excluded entirely, matching ols_by_group's NULL policy."""
    from rust_cdc_validator_spark.operators.drift import decile_lift

    rows = [(i, float(i), 1 if i % 2 else 0) for i in range(40)]
    rows += [(100 + i, None, 1) for i in range(10)]  # unscored positives
    df = spark.createDataFrame(rows, "id long, score double, y int")
    got = decile_lift(df, "score", "y", "id", buckets=4).collect()
    assert sum(r["n_rows"] for r in got) == 40  # NULL-score rows dropped
    # top bucket holds the HIGHEST scores (39..30), not the NULL block
    top = next(r for r in got if r["bucket"] == 0)
    assert top["n_rows"] == 10 and top["n_pos"] == 5
    # cum_capture denominator counts only scored positives (20, not 30)
    last = max(got, key=lambda r: r["bucket"])
    assert abs(last["cum_capture"] - 1.0) < 1e-9


# --------------------------------------------------------- wasserstein_1d


def _w1_reference(xs, ys):
    """Driver-side W1: integral of |CDF gap| over consecutive distinct
    pooled values."""
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    sx, sy = sorted(xs), sorted(ys)
    import bisect

    total = 0.0
    for v, nxt in zip(vals, vals[1:]):
        fa = bisect.bisect_right(sx, v) / na
        fb = bisect.bisect_right(sy, v) / nb
        total += abs(fa - fb) * (nxt - v)
    return total


def test_wasserstein_matches_reference(spark):
    import random

    from rust_cdc_validator_spark.operators.drift import wasserstein_1d

    random.seed(9)
    xs = [random.gauss(0.0, 1.0) for _ in range(400)]
    ys = [random.gauss(0.7, 1.3) for _ in range(300)]
    a = spark.createDataFrame([(x,) for x in xs], "v double")
    b = spark.createDataFrame([(y,) for y in ys], "v double")
    row = wasserstein_1d(a, b, "v").collect()[0]
    assert (row["n_a"], row["n_b"]) == (400, 300)
    assert row["w1"] == pytest.approx(_w1_reference(xs, ys), abs=1e-6)


def test_wasserstein_point_masses_and_identity(spark):
    from rust_cdc_validator_spark.operators.drift import wasserstein_1d

    a = spark.createDataFrame([(0.0,)] * 5, "v double")
    b = spark.createDataFrame([(1.0,)] * 3, "v double")
    assert wasserstein_1d(a, b, "v").collect()[0]["w1"] == 1.0
    same = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    assert wasserstein_1d(same, same, "v").collect()[0]["w1"] == 0.0


def test_wasserstein_round_to_buckets(spark):
    from rust_cdc_validator_spark.operators.drift import wasserstein_1d

    a = spark.createDataFrame([(0.01,), (0.99,)], "v double")
    b = spark.createDataFrame([(0.02,), (0.98,)], "v double")
    # bucketed at width 1 the distributions coincide
    row = wasserstein_1d(a, b, "v", round_to=1.0).collect()[0]
    assert row["w1"] == 0.0
    with pytest.raises(ValueError, match="round_to"):
        wasserstein_1d(a, b, "v", round_to=0.0)


def test_psi_baseline_complete_grid_and_shares(spark):
    from rust_cdc_validator_spark.operators.drift import psi_baseline

    df = spark.createDataFrame([(0.0,), (0.0,), (9.99,)], "v double")
    rows = {r["bin"]: r for r in psi_baseline(df, "v", bins=5).collect()}
    assert set(rows) == set(range(5))  # empty bins keep zero-share rows
    assert rows[0]["share_before"] == pytest.approx(2 / 3)
    assert rows[4]["share_before"] == pytest.approx(1 / 3)
    assert sum(r["share_before"] for r in rows.values()) == pytest.approx(1.0)
    assert all(r["width"] == rows[0]["width"] for r in rows.values())
    with pytest.raises(ValueError, match="bins"):
        psi_baseline(df, "v", bins=1)


def _mw_reference(xs: list[float], ys: list[float]):
    """Sequential tie-corrected Mann-Whitney (Lehmann 1975)."""
    import math

    pooled = sorted(xs + ys)
    # midranks
    ranks: dict[float, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    ra = sum(ranks[x] for x in xs)
    na, nb = len(xs), len(ys)
    n = na + nb
    u = ra - na * (na + 1) / 2
    tie_sum = 0
    for v in set(pooled):
        t = pooled.count(v)
        tie_sum += t**3 - t
    sigma = math.sqrt(na * nb / 12 * ((n + 1) - tie_sum / (n * (n - 1))))
    z = (u - na * nb / 2) / sigma
    return u, z


def test_mann_whitney_matches_reference(spark):
    from rust_cdc_validator_spark.operators.drift import mann_whitney_u

    xs = [float((7 * i) % 23) for i in range(40)]  # plenty of ties
    ys = [float((5 * i) % 23 + 9) for i in range(55)]  # shifted up by 9
    a = spark.createDataFrame([(x,) for x in xs], "v double")
    b = spark.createDataFrame([(y,) for y in ys], "v double")
    row = mann_whitney_u(a, b, "v").collect()[0]
    u, z = _mw_reference(xs, ys)
    assert (row["n_a"], row["n_b"]) == (40, 55)
    assert row["u_a"] == pytest.approx(u, abs=0.01)
    assert row["z"] == pytest.approx(z, abs=1e-5)
    # shifted-up b side -> a stochastically smaller -> U_a below mean
    assert row["z"] < 0 and row["p_two"] < 0.05
    assert row["rank_biserial"] == pytest.approx(
        1 - 2 * u / (40 * 55), abs=1e-5
    )


def test_mann_whitney_identical_distributions(spark):
    from rust_cdc_validator_spark.operators.drift import mann_whitney_u

    same = spark.createDataFrame(
        [(float(i % 11),) for i in range(66)], "v double"
    )
    row = mann_whitney_u(same, same, "v").collect()[0]
    assert row["z"] == 0.0
    assert row["p_two"] == pytest.approx(1.0, abs=1e-6)
    assert row["rank_biserial"] == 0.0


def test_norm_sf_known_values(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.drift import norm_sf

    df = spark.createDataFrame(
        [(0.0,), (1.0,), (1.959964,), (2.575829,)], "z double"
    )
    got = {
        r["z"]: r["sf"]
        for r in df.select("z", norm_sf(F.col("z")).alias("sf")).collect()
    }
    # Abramowitz & Stegun 26.2.17 is good to 7.5e-8
    assert got[0.0] == pytest.approx(0.5, abs=1e-7)
    assert got[1.0] == pytest.approx(0.15865525, abs=1e-6)
    assert got[1.959964] == pytest.approx(0.025, abs=1e-6)
    assert got[2.575829] == pytest.approx(0.005, abs=1e-6)


def test_two_proportion_ztests_hand_computed(spark):
    import math

    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.drift import (
        two_proportion_ztests,
    )

    # group g: 30/100 successes, group h: 10/100
    rows = (
        [("g", 1)] * 30 + [("g", 0)] * 70 + [("h", 1)] * 10 + [("h", 0)] * 90
    )
    df = spark.createDataFrame(rows, "grp string, s int")
    rep = {
        r["group_key"]: r
        for r in two_proportion_ztests(
            df, "grp", F.col("s") == 1
        ).collect()
    }
    pooled = 40 / 200
    se = math.sqrt(pooled * (1 - pooled) * (1 / 100 + 1 / 100))
    z = (0.3 - 0.1) / se
    assert rep["g"]["z"] == pytest.approx(z, abs=1e-5)
    assert rep["h"]["z"] == pytest.approx(-z, abs=1e-5)
    assert rep["g"]["share"] == pytest.approx(0.3)
    assert rep["g"]["rest_share"] == pytest.approx(0.1)
    assert rep["g"]["p_two"] == rep["h"]["p_two"]


def test_two_proportion_degenerate_pooled_null(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.drift import (
        two_proportion_ztests,
    )

    # every row is a success -> pooled share 1 -> z undefined, never inf
    df = spark.createDataFrame(
        [("g", 1)] * 3 + [("h", 1)] * 4, "grp string, s int"
    )
    for r in two_proportion_ztests(df, "grp", F.col("s") == 1).collect():
        assert r["z"] is None and r["p_two"] is None


def test_bh_fdr_textbook_stepup(spark):
    from rust_cdc_validator_spark.operators.drift import bh_fdr

    tests = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005), ("e", 0.2)],
        "name string, p double",
    )
    out = {r["name"]: r for r in bh_fdr(tests, "p", ["name"], q=0.05).collect()}
    # sorted p: .005 .01 .03 .04 .2 with criticals .01 .02 .03 .04 .05
    assert out["d"]["p_rank"] == 1 and out["e"]["p_rank"] == 5
    assert [out[k]["rejected"] for k in "abcde"] == [
        True, True, True, True, False,
    ]
    assert all(r["cutoff_rank"] == 4 for r in out.values())


def test_bh_fdr_nothing_passes_and_nulls_sort_last(spark):
    from rust_cdc_validator_spark.operators.drift import bh_fdr

    tests = spark.createDataFrame(
        [("a", 0.9), ("b", None), ("c", 0.8)], "name string, p double"
    )
    out = {r["name"]: r for r in bh_fdr(tests, "p", ["name"], q=0.05).collect()}
    assert not any(r["rejected"] for r in out.values())
    assert all(r["cutoff_rank"] is None for r in out.values())
    assert out["b"]["p_rank"] == 3  # NULL p ranks after real p-values
    with pytest.raises(ValueError, match="q must"):
        bh_fdr(tests, "p", ["name"], q=1.5)
