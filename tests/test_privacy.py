"""k-anonymity / l-diversity audit (operators/privacy.py)."""

from __future__ import annotations

import pytest

from rust_cdc_validator_spark.operators.privacy import (
    k_anonymity_report,
    quasi_group_sizes,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (nation, segment, sensitive) — group sizes: AA=3, AB=1, BB=2
        ("A", "x", "s1"),
        ("A", "x", "s1"),
        ("A", "x", "s2"),
        ("A", "y", "s3"),
        ("B", "y", "s1"),
        ("B", "y", "s2"),
    ]
    return spark.createDataFrame(rows, "nation string, seg string, sens string")


def test_group_sizes(people):
    got = {
        (r["nation"], r["seg"]): (r["group_rows"], r["sensitive_values"])
        for r in quasi_group_sizes(people, ["nation", "seg"], "sens").collect()
    }
    assert got == {("A", "x"): (3, 2), ("A", "y"): (1, 1), ("B", "y"): (2, 2)}


def test_k_anonymity_report_counts(people):
    r = k_anonymity_report(
        people, ["nation", "seg"], k=2, sensitive_col="sens", l=2
    ).first()
    assert r["n_rows"] == 6 and r["n_groups"] == 3
    assert r["small_groups"] == 1 and r["rows_at_risk"] == 1
    assert r["min_group_rows"] == 1
    assert r["low_diversity_groups"] == 1 and r["rows_low_diversity"] == 1
    assert r["at_risk_ratio"] == pytest.approx(1 / 6, abs=1e-6)


def test_k_anonymity_safe_when_k_met(people):
    r = k_anonymity_report(people, ["nation"], k=2).first()
    assert r["small_groups"] == 0 and r["rows_at_risk"] == 0
    assert r["at_risk_ratio"] == 0.0


def test_validations(people):
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(people, ["nation"], k=1)
    with pytest.raises(ValueError, match="together"):
        k_anonymity_report(people, ["nation"], k=2, sensitive_col="sens")
    with pytest.raises(ValueError, match="l must be"):
        k_anonymity_report(people, ["nation"], k=2, sensitive_col="sens", l=1)
    with pytest.raises(ValueError, match="non-empty"):
        quasi_group_sizes(people, [])


def _tcloseness_reference(rows, quasi_idx, s_idx):
    """Rowwise variational distance per quasi-group."""
    from collections import Counter, defaultdict

    glob = Counter(r[s_idx] for r in rows)
    n = len(rows)
    by_group = defaultdict(list)
    for r in rows:
        by_group[tuple(r[i] for i in quasi_idx)].append(r[s_idx])
    out = {}
    for gkey, vals in by_group.items():
        gc = Counter(vals)
        gn = len(vals)
        dist = 0.0
        for v, gcnt in glob.items():
            p = gc.get(v, 0) / gn
            q = gcnt / n
            dist += abs(p - q)
        out[gkey] = dist / 2
    return out


def test_t_closeness_groups_matches_reference(spark):
    from rust_cdc_validator_spark.operators.privacy import t_closeness_groups

    # group ('a',) skews heavily to sensitive value 'x'
    rows = (
        [("a", "x")] * 9 + [("a", "y")] * 1
        + [("b", "x")] * 5 + [("b", "y")] * 5
        + [("c", "y")] * 4 + [("c", "z")] * 2
    )
    df = spark.createDataFrame(rows, "g string, s string")
    got = {
        (r["g"],): r["t_distance"]
        for r in t_closeness_groups(df, ["g"], "s").collect()
    }
    ref = _tcloseness_reference(rows, [0], 1)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k
    # group c misses 'x' (54% of background) and holds every 'z' --
    # the farthest distribution from global
    assert max(got, key=got.get) == ("c",)


def test_t_closeness_report_thresholds(spark):
    from rust_cdc_validator_spark.operators.privacy import (
        t_closeness_groups,
        t_closeness_report,
    )

    rows = [("a", "x")] * 8 + [("b", "x")] * 4 + [("b", "y")] * 4
    df = spark.createDataFrame(rows, "g string, s string")
    rep = t_closeness_report(df, ["g"], "s", t=0.2).collect()[0]
    dists = {
        (r["g"],): r["t_distance"]
        for r in t_closeness_groups(df, ["g"], "s").collect()
    }
    above = [k for k, v in dists.items() if v > 0.2]
    assert rep["n_rows"] == 16 and rep["n_groups"] == 2
    assert rep["groups_above_t"] == len(above)
    assert rep["t_max"] == pytest.approx(max(dists.values()), abs=1e-6)
    with pytest.raises(ValueError, match="t must"):
        t_closeness_report(df, ["g"], "s", t=1.5)
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_report(df, [], "s", t=0.2)


def test_dp_noisy_counts_deterministic_and_seed_sensitive(spark):
    from rust_cdc_validator_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [(chr(97 + i % 20),) for i in range(400)], "g string"
    )
    a = {r["g"]: r for r in dp_noisy_counts(df, ["g"], 1.0).collect()}
    b = {r["g"]: r for r in dp_noisy_counts(df, ["g"], 1.0).collect()}
    assert all(a[k]["noisy_n"] == b[k]["noisy_n"] for k in a)  # reproducible
    c = {
        r["g"]: r
        for r in dp_noisy_counts(df, ["g"], 1.0, seed="other").collect()
    }
    assert any(a[k]["noise"] != c[k]["noise"] for k in a)  # seed matters
    assert all(r["n"] == 20 for r in a.values())
    assert all(
        r["noisy_n"] == pytest.approx(r["n"] + r["noise"], abs=1e-6)
        for r in a.values()
    )
    # both noise signs appear across 20 groups, and the scale is sane
    signs = {r["noise"] > 0 for r in a.values() if r["noise"] != 0}
    assert signs == {True, False}
    # wider epsilon -> smaller noise, same uniform draw
    tight = {
        r["g"]: r for r in dp_noisy_counts(df, ["g"], 10.0).collect()
    }
    assert all(
        abs(tight[k]["noise"]) <= abs(a[k]["noise"]) + 1e-9 for k in a
    )


def test_dp_noisy_counts_validation(spark):
    from rust_cdc_validator_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], 0.0)
    with pytest.raises(ValueError, match="sensitivity"):
        dp_noisy_counts(df, ["g"], 1.0, sensitivity=0)
    with pytest.raises(ValueError, match="group_cols"):
        dp_noisy_counts(df, [], 1.0)
