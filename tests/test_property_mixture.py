"""Property tests for the deterministic samplers: expected-copy counts and
split-ratio quantization hold for ARBITRARY weights/ratios, not just the
fixture values the unit tests pin."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _expected_copies(weight: float, denom: int = 4096) -> float:
    import math

    base = math.floor(weight)
    frac_cut = round((weight - base) * denom)
    return base + frac_cut / denom


@settings(max_examples=8, deadline=None)
@given(w=st.floats(min_value=0.0, max_value=4.0, allow_nan=False,
                   allow_infinity=False))
def test_apply_mixture_copy_count_matches_quantized_weight(spark, w):
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.operators.corpus import apply_mixture

    n = 600
    docs = spark.createDataFrame(
        [(i, "s") for i in range(n)], "doc_id long, source string"
    )
    out_n = apply_mixture(docs, {"s": w}).count()
    # the md5 bucket is uniform ±statistical noise; quantized expectation
    exp = _expected_copies(w) * n
    assert abs(out_n - exp) <= max(60, 0.2 * n)


@settings(max_examples=8, deadline=None)
@given(r=st.floats(min_value=0.05, max_value=0.95, allow_nan=False))
def test_leakage_safe_split_two_way_partition_is_total(spark, r):
    from rust_cdc_validator_spark.operators.corpus import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, i // 3) for i in range(300)], "doc_id long, root long"
    )
    out = leakage_safe_split(docs, {"a": r, "b": 1.0 - r}, cluster_col="root")
    rows = out.collect()
    assert len(rows) == 300  # total: every doc gets exactly one split
    assert {x["split"] for x in rows} <= {"a", "b"}
    by_root = {}
    for x in rows:
        by_root.setdefault(x["root"], set()).add(x["split"])
    assert all(len(s) == 1 for s in by_root.values())
