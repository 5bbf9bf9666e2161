from __future__ import annotations

from rust_cdc_validator_spark.sources.resilient import resilient_foreach_sink


def test_resilient_sink_captures_failures_and_continues(spark):
    df = spark.range(1000).repartition(4)

    def flaky_write(rows):
        # fail any chunk containing id 500; succeed otherwise
        if any(r["id"] == 500 for r in rows):
            raise RuntimeError("simulated sink outage")

    rep = resilient_foreach_sink(df, flaky_write, chunk_size=100)
    assert rep.rows_attempted == 1000
    assert not rep.ok and rep.failure_count == 1
    assert "simulated sink outage" in rep.failures[0]
    # exactly one chunk (≤100 rows, exact size depends on partition layout)
    # was lost; report arithmetic must be consistent
    lost = rep.rows_attempted - rep.rows_written
    assert 0 < lost <= 100


def test_resilient_sink_all_ok(spark):
    df = spark.range(250)
    rep = resilient_foreach_sink(df, lambda rows: None, chunk_size=100)
    assert rep.ok and rep.rows_written == 250 and rep.failure_count == 0


def test_resilient_sink_total_outage_bounded_report(spark):
    def always_fail(rows):
        raise RuntimeError("down")

    rep = resilient_foreach_sink(spark.range(2000).repartition(8), always_fail,
                                 chunk_size=10)
    assert rep.rows_written == 0
    assert rep.failure_count >= 8  # every chunk failed
    assert len(rep.failures) <= 100  # sample is bounded


def test_udtf_lateral_join(spark):
    from rust_cdc_validator_spark.functions.udtf import SplitSentences, Tokenize

    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("tokenize_udtf", Tokenize)
    df = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, None)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    sent = spark.sql(
        "SELECT d.doc_id, s.sentence, s.n_words, s.position "
        "FROM udtf_docs d, LATERAL split_sentences(d.text) s"
    ).collect()
    assert [(r["sentence"], r["n_words"], r["position"]) for r in sent] == [
        ("Hello world", 2, 0),
        ("How are you", 3, 1),
        ("Fine", 1, 2),
    ]
    toks = spark.sql(
        "SELECT t.token FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t "
        "WHERE d.doc_id = 1"
    ).count()
    assert toks == 6
