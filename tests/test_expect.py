from __future__ import annotations

import pytest

from rust_cdc_validator_spark.operators.expect import (
    Expectation,
    expect_report,
)


def _rep(df, exps):
    return {r["expectation"]: r for r in expect_report(df, exps).collect()}


def test_expect_report_row_level_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, 5.0, "O", "ab1"),
            (2, -3.0, "X", "zz"),
            (None, 50.0, "F", "ab2"),
            (4, None, None, None),
        ],
        "k long, v double, st string, code string",
    )
    rep = _rep(
        df,
        [
            Expectation("k_nn", "not_null", "k"),
            Expectation("v_range", "in_range", "v", {"lo": 0, "hi": 10}),
            Expectation("st_enum", "in_set", "st", {"values": ["O", "F"]}),
            Expectation(
                "code_fmt", "matches_regex", "code", {"pattern": "^ab"}
            ),
        ],
    )
    assert (rep["k_nn"]["n_checked"], rep["k_nn"]["n_failed"]) == (4, 1)
    # nulls are skipped by range/set/regex checks (that's not_null's job)
    assert (rep["v_range"]["n_checked"], rep["v_range"]["n_failed"]) == (3, 2)
    assert (rep["st_enum"]["n_checked"], rep["st_enum"]["n_failed"]) == (3, 1)
    assert (rep["code_fmt"]["n_checked"], rep["code_fmt"]["n_failed"]) == (
        3,
        1,
    )
    assert rep["k_nn"]["pass_ratio"] == 0.75


def test_expect_report_unique_and_referential(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 20), (None, 99)], "k long, fk long"
    )
    ref = spark.createDataFrame([(10,), (20,)], "rk long")
    rep = _rep(
        df,
        [
            Expectation("k_unique", "unique", "k"),
            Expectation(
                "fk_ok", "referential", "fk", {"ref": ref, "ref_col": "rk"}
            ),
        ],
    )
    # 3 non-null keys, 2 distinct -> 1 duplicate row
    assert (rep["k_unique"]["n_checked"], rep["k_unique"]["n_failed"]) == (
        3,
        1,
    )
    # 4 non-null fks, one (99) unmatched
    assert (rep["fk_ok"]["n_checked"], rep["fk_ok"]["n_failed"]) == (4, 1)


def test_expect_report_validation(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-empty"):
        expect_report(df, [])
    with pytest.raises(ValueError, match="unique"):
        expect_report(
            df,
            [
                Expectation("a", "not_null", "k"),
                Expectation("a", "not_null", "k"),
            ],
        )
    with pytest.raises(ValueError, match="unknown expectation kind"):
        expect_report(df, [Expectation("b", "bogus", "k")])
