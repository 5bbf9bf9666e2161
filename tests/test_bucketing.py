"""Bucketed-table co-location: the SCALE.md strategy for repeated joins —
pre-bucket both sides on the join key so the sort-merge join needs NO
exchange at query time. Pinned here as an executable demonstration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.plans.inspect import explain_str


@pytest.fixture()
def warehouse(spark, tmp_path_factory):
    # local spark warehouse dir is fixed at session start; use unique table
    # names instead of re-pointing it
    yield
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    # disable broadcast so the join exercises the bucketed sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        def n_exchanges(df) -> int:
            return len(
                [1 for line in explain_str(df).splitlines() if ") Exchange" in line]
            )

        plan = explain_str(joined)
        assert "SortMergeJoin" in plan
        # bucketed: only the groupBy exchanges; join sides are co-located
        assert n_exchanges(joined) == 1, plan

        raw_joined = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # unbucketed baseline: both join inputs shuffle + the groupBy
        assert n_exchanges(raw_joined) == 3

        # and the result is right
        total = sum(r["n"] for r in joined.collect())
        assert total == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
