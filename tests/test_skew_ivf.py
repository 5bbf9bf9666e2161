from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.similarity import brute_force_topk, ivf_topk
from rust_cdc_validator_spark.operators.skew import salted_agg, salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(300).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    plain = big.join(small, on=["k"]).select("k", "payload", "dim")
    salted = salted_join(big, small, on=["k"], salt_factor=4).select("k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    big = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    plain = big.join(small, on=["k"], how="left").select("k", "v", "tag")
    salted = salted_join(big, small, on=["k"], salt_factor=4, how="left").select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_agg_equals_plain_agg(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 100 != 0, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs={"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
            final_aggs={"n": F.sum, "s": F.sum, "mx": F.max},
        ).collect()
    }
    assert plain == salted


def test_ivf_recall_against_brute_force(spark):
    import math
    rows = []
    for i in range(200):
        angle = (i % 20) * math.pi / 40
        jitter = (i // 20) * 5e-4
        rows.append((i, [math.cos(angle + jitter), math.sin(angle + jitter), 0.05, 0.1]))
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {r["query_id"]: r["neighbor_id"] for r in brute_force_topk(v, v, k=1).collect()}
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk(v, v, k=1, n_cells=8, n_probe=3).collect()
    }
    hits = sum(1 for q, n in exact.items() if approx.get(q) == n)
    assert hits / len(exact) >= 0.9
