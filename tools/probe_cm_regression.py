"""Solo bisect probe for the orders_join_size_sketch regression
(VERDICT r10 What's-wrong #1): run the query ≥5 reps with the CURRENT
explode-form cm_sketch and with the r9 union-form build, interleaved,
and print per-form medians + all raw runs. Usage:

    python tools/probe_cm_regression.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators import sketch as sk
from rust_cdc_validator_spark.operators.sketch import (
    _cm_bucket,
    _dense_regroup,
    cm_join_size,
)
from rust_cdc_validator_spark.session import get_spark


def cm_sketch_union(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """The r9 (pre-1865b36) unionByName build, verbatim shape."""
    wt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = None
    for i in range(d):
        r = df.select(
            *group_cols,
            F.lit(i).alias("_row"),
            _cm_bucket(F.col(value_col), i, w).alias("_b"),
            wt.alias("_wt"),
        )
        rows = r if rows is None else rows.unionByName(r)
    regs = (
        rows.groupBy(*group_cols, "_row", "_b")
        .agg(F.sum("_wt").alias("_c"))
        .select(
            *group_cols,
            (F.col("_row") * w + F.col("_b")).cast("int").alias("_i"),
            "_c",
        )
    )
    return _dense_regroup(regs, group_cols, "_i", "_c", d * w, "counters")


def query(spark: SparkSession, sf_dir: str, build) -> DataFrame:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o_sk = build(orders.select(F.col("o_orderkey").alias("k")), [], "k").select(
        F.col("counters").alias("_ca")
    )
    l_sk = build(li.select(F.col("l_orderkey").alias("k")), [], "k").select(
        F.col("counters").alias("_cb")
    )
    exact = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("exact_join_rows")
    )
    return (
        o_sk.crossJoin(F.broadcast(l_sk))
        .crossJoin(F.broadcast(exact))
        .select(
            cm_join_size(F.col("_ca"), F.col("_cb")).alias("est_join_rows"),
            F.col("exact_join_rows"),
            F.round(
                cm_join_size(F.col("_ca"), F.col("_cb"))
                / F.col("exact_join_rows"),
                6,
            ).alias("over_ratio"),
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("probe_cm")
    forms = {"explode": sk.cm_sketch, "union": cm_sketch_union}
    # warm-up both forms once (codegen / scan cache)
    for build in forms.values():
        query(spark, sf_dir, build).write.format("noop").mode("overwrite").save()
    runs: dict[str, list[float]] = {k: [] for k in forms}
    for _ in range(reps):
        for name, build in forms.items():
            t0 = time.monotonic()
            query(spark, sf_dir, build).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.monotonic() - t0)
    for name, r in runs.items():
        print(
            f"{name}: median={statistics.median(r):.3f}s "
            f"min={min(r):.3f} max={max(r):.3f} runs={[round(x, 3) for x in r]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
