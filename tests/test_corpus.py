from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.corpus import (
    contamination_check,
    deterministic_sample,
    md5_bucket,
    normalize_text,
    prepare_training_corpus,
)


def test_normalize_text(spark):
    df = spark.createDataFrame([("  The QUICK,   brown... fox!  ",)], "t string")
    got = df.select(normalize_text(F.col("t")).alias("n")).collect()[0]["n"]
    assert got == "the quick brown fox"


def test_deterministic_sample_stable_and_partition_invariant(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 8).collect()}
    b = {r["doc_id"] for r in deterministic_sample(df.repartition(13), "doc_id", 8).collect()}
    assert a == b  # invariant to partitioning
    assert 0.05 < len(a) / 1000 < 0.22  # ~1/8


def test_md5_bucket_partitions_completely(spark):
    df = spark.range(400).select(F.col("id").alias("k"))
    counts = (
        df.select(md5_bucket(F.col("k"), 4).alias("b"))
        .groupBy("b").count().collect()
    )
    assert {r["b"] for r in counts} == {0, 1, 2, 3}
    assert sum(r["count"] for r in counts) == 400


def test_contamination_check_flags_shared_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
            (2, "totally unrelated text with no overlap at all here now"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in contamination_check(train, bench, shingle_n=8).collect()}
    assert 1 in got and 2 not in got
    assert got[1]["n_benchmark_docs_hit"] == 1


def test_prepare_training_corpus_dedups_normalized(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base.strip()),
        (2, base.strip().upper() + "..."),  # same after normalization
        (3, "short"),                        # fails quality gate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"] for r in prepare_training_corpus(docs, min_chars=50).collect()}
    assert out == {1}  # doc2 deduped into doc1, doc3 gated out
