"""Association rules (operators/basket.py): reference equivalence on a
hand-checkable basket set, direction asymmetry, basket-size cap, and
validations."""

from __future__ import annotations

import math

import pytest

from rust_cdc_validator_spark.operators.basket import association_rules


@pytest.fixture(scope="module")
def baskets(spark):
    rows = []
    # bread+butter co-occur strongly; milk is everywhere (lift ~1)
    for b in range(10):
        rows.append((b, "milk"))
        if b < 8:
            rows += [(b, "bread"), (b, "butter")]
        if b % 2 == 0:
            rows.append((b, "eggs"))
    return spark.createDataFrame(rows, "basket long, item string")


def test_rules_match_hand_computation(spark, baskets):
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(
            baskets, "basket", "item", min_pair_count=2, top_k=100
        ).collect()
    }
    # bread->butter: pair in 8 of 10 baskets, bread in 8, butter in 8
    r = got[("bread", "butter")]
    assert r["n_pair"] == 8
    assert r["support"] == 0.8
    assert r["confidence"] == 1.0
    assert abs(r["lift"] - (0.8 / (0.8 * 0.8))) < 1e-9
    # milk->eggs: eggs ⊂ milk baskets -> confidence 5/10, lift 1.0
    r2 = got[("milk", "eggs")]
    assert r2["n_pair"] == 5 and r2["confidence"] == 0.5
    assert abs(r2["lift"] - 1.0) < 1e-9
    # both directions present, confidence asymmetric
    assert got[("eggs", "milk")]["confidence"] == 1.0
    # ordering: lift descending
    lifts = [
        r["lift"]
        for r in association_rules(
            baskets, "basket", "item", min_pair_count=2, top_k=100
        ).collect()
    ]
    assert lifts == sorted(lifts, reverse=True)


def test_min_pair_screen_and_basket_cap(spark):
    rows = [(0, "a"), (0, "b"), (1, "a"), (1, "b")]
    # basket 2 is a 5-item blob that the cap must drop entirely
    rows += [(2, f"x{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = association_rules(
        df, "basket", "item", min_pair_count=2, top_k=10, max_basket_size=4
    ).collect()
    assert {(r["antecedent"], r["consequent"]) for r in got} == {
        ("a", "b"), ("b", "a")
    }
    # cap dropped basket 2: n_baskets = 2, support = 1.0
    assert got[0]["support"] == 1.0
    assert abs(got[0]["lift"] - 1.0) < 1e-9  # a,b in every kept basket


def test_validations(spark, baskets):
    with pytest.raises(ValueError, match="min_pair_count"):
        association_rules(baskets, "basket", "item", min_pair_count=0)
    with pytest.raises(ValueError, match="top_k"):
        association_rules(baskets, "basket", "item", top_k=0)
    with pytest.raises(ValueError, match="max_basket_size"):
        association_rules(baskets, "basket", "item", max_basket_size=1)


def test_apriori_prune_shrinks_heavy_tail_join_input(spark):
    """VERDICT r9 #2: items with margin < min_pair_count must not enter
    the basket self-join (downward closure), and the prune must not
    change any surviving rule."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.basket import (
        _prune_infrequent,
        association_rules,
    )

    # heavy tail: 2 hot items in every basket, 500 singleton rares
    rows = []
    for b in range(50):
        rows += [(b, "hot1"), (b, "hot2")]
        for j in range(10):
            rows.append((b, f"rare_{b}_{j}"))  # each rare in exactly 1 basket
    df = spark.createDataFrame(rows, "basket long, item string")

    kept = df.select(F.col("basket").alias("_b"), F.col("item").alias("_i")).distinct()
    items = kept.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("_ni"))
    pruned = _prune_infrequent(kept, items, min_pair_count=3)
    assert pruned.count() == 100  # only the hot rows survive (600 -> 100)

    got = association_rules(df, "basket", "item", min_pair_count=3).collect()
    # the only surviving pair is hot1<->hot2, both directions, lift 1
    assert {(r["antecedent"], r["consequent"]) for r in got} == {
        ("hot1", "hot2"), ("hot2", "hot1")
    }
    for r in got:
        assert r["n_pair"] == 50 and abs(r["lift"] - 1.0) < 1e-9


def test_apriori_prune_broadcasts_frequent_set(spark, baskets):
    """The prune must not add an item-keyed exchange of the basket
    relation: with a small vocabulary the frequent set broadcasts, so
    the semi-join is map-side and the only exchanges on the pair path
    stay basket-keyed."""
    from rust_cdc_validator_spark.operators.basket import association_rules

    plan = (
        association_rules(baskets, "basket", "item", min_pair_count=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert re.search(r"BroadcastHashJoin .*LeftSemi", plan)
