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
