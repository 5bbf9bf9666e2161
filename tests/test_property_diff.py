"""Property-based validator pinning: for ANY set of planted defects, the
diff drill-down names exactly the defective keys — no more, no fewer."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from rust_cdc_validator_spark.session import get_spark
        _spark = get_spark("hypothesis-diff", shuffle_partitions=4)
    return _spark


N_ROWS = 300
keys = st.integers(min_value=0, max_value=N_ROWS - 1)
defects = st.fixed_dictionaries(
    {
        "missing": st.sets(keys, max_size=5),
        "changed": st.sets(keys, max_size=5),
        "extra": st.sets(st.integers(min_value=N_ROWS, max_value=N_ROWS + 5), max_size=3),
    }
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(defects)
def test_drilldown_names_exactly_the_defects(d):
    from rust_cdc_validator_spark.operators.diff import diff_tables

    spark = _get_spark()
    changed = d["changed"] - d["missing"]  # a missing row can't also differ
    src = spark.range(N_ROWS).select(
        F.col("id").alias("pk"), (F.col("id") * 3).alias("v")
    )
    tgt = (
        src.filter(~F.col("pk").isin(list(d["missing"])) if d["missing"] else F.lit(True))
        .withColumn(
            "v",
            F.when(F.col("pk").isin(list(changed)) if changed else F.lit(False),
                   F.lit(-1)).otherwise(F.col("v")),
        )
    )
    if d["extra"]:
        tgt = tgt.unionByName(
            spark.createDataFrame([(k, int(k) * 3) for k in d["extra"]], "pk long, v long")
        )
    rep = diff_tables(src, tgt, ["pk"], chunk_size=50)
    expected_src_only = d["missing"] | changed
    expected_tgt_only = changed | d["extra"]
    if not expected_src_only and not expected_tgt_only:
        assert rep.is_match
        return
    assert not rep.is_match
    got_src = {r["pk"] for r in rep.rows_only_in_source.collect()} if rep.rows_only_in_source is not None else set()
    got_tgt = {r["pk"] for r in rep.rows_only_in_target.collect()} if rep.rows_only_in_target is not None else set()
    assert got_src == expected_src_only
    assert got_tgt == expected_tgt_only
