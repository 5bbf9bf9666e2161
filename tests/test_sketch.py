"""Engine-portable HLL sketches (operators/sketch.py): exact mergeability
(the reason sketches exist) and estimation accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.sketch import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _vals(spark, lo, hi, tag="g"):
    return spark.range(lo, hi).select(
        F.lit(tag).alias("g"), F.col("id").alias("v")
    )


def test_merge_of_parts_equals_sketch_of_union_exactly(spark):
    """sketch(A) ⊎ sketch(B) == sketch(A ∪ B), register-for-register —
    including OVERLAPPING parts (idempotent max), the property that lets
    daily sketches fold into arbitrary windows without recounts."""
    a = _vals(spark, 0, 3000)
    b = _vals(spark, 2000, 6000)  # overlaps a on [2000, 3000)
    union = a.unionByName(b)
    sa = hll_sketch(a, ["g"], "v", p=10).collect()[0]["registers"]
    sb = hll_sketch(b, ["g"], "v", p=10).collect()[0]["registers"]
    su = hll_sketch(union, ["g"], "v", p=10).collect()[0]["registers"]
    merged = spark.createDataFrame(
        [(sa, sb)], "ra array<int>, rb array<int>"
    ).select(hll_merge(F.col("ra"), F.col("rb")).alias("m")).collect()[0]["m"]
    assert merged == su


def test_estimate_accuracy_and_linear_counting(spark):
    # 6000 true distinct at p=10 (m=1024): expect within ~5 std errors
    df = _vals(spark, 0, 6000)
    est = (
        hll_sketch(df, ["g"], "v", p=10)
        .select(hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - 6000) / 6000 < 0.17  # 1.04/sqrt(1024) ≈ 3.3% 1σ
    # tiny cardinality rides the linear-counting branch and stays tight
    small = _vals(spark, 0, 40)
    est_s = (
        hll_sketch(small, ["g"], "v", p=10)
        .select(hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est_s - 40) <= 3


def test_sketch_grouped_and_duplicates_ignored(spark):
    rows = [("a", i % 50) for i in range(5000)] + [("b", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {
        r["g"]: r["e"]
        for r in hll_sketch(df, ["g"], "v", p=10)
        .select("g", hll_estimate(F.col("registers"), p=10).alias("e"))
        .collect()
    }
    assert abs(out["a"] - 50) <= 4  # duplicates don't inflate
    assert abs(out["b"] - 500) / 500 < 0.15


def test_p_validation(spark):
    df = _vals(spark, 0, 10)
    with pytest.raises(ValueError, match="p must be"):
        hll_sketch(df, ["g"], "v", p=2)
