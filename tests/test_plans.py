"""Physical-plan assertions: the properties that matter at 100 TB —
filter pushdown, column pruning, broadcast joins — pinned as tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.plans.inspect import (
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
)
from rust_cdc_validator_spark.queries import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_region_revenue,
)


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters


def test_q1_column_pruning(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    cols = scan_columns(df)[0]
    # only the 7 referenced lineitem columns are read, not all 11
    assert set(cols) == {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    }


def test_q3_broadcasts_customer(spark, sf_dir):
    assert uses_broadcast_join(q3_shipping_priority(spark, sf_dir))


def test_q5_broadcasts_dims(spark, sf_dir):
    assert uses_broadcast_join(q5_region_revenue(spark, sf_dir))


def test_projection_prunes_unread_columns(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey")
    )
    assert scan_columns(df) == [["o_orderkey", "o_custkey"]]
