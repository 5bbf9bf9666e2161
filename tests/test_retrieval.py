"""BM25 retrieval operator (operators/retrieval.py)."""

import pytest

from rust_cdc_validator_spark.operators.retrieval import bm25_topk


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark join filter spark spark"),     # all 3 terms, tf-heavy
            (2, "spark join other words here now"),   # 2 terms
            (3, "filter"),                            # 1 term, very short doc
            (4, "nothing relevant at all whatsoever"),
            (5, "spark " * 50 + "end"),               # long doc: length-normalized
        ],
        "doc_id long, text string",
    )


def test_bm25_ranks_multi_term_matches_first(spark):
    got = bm25_topk(_corpus(spark), ["spark", "join", "filter"], k=10).collect()
    ids = [r.doc_id for r in got]
    assert 4 not in ids                      # no query term -> no row
    assert ids[0] == 1                       # hits all three terms, short doc
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].n_terms == 3 and by_id[2].n_terms == 2
    assert all(r.bm25 > 0 for r in got)


def test_bm25_length_normalization_penalizes_padding(spark):
    # doc 5 has 50 'spark' hits but is mostly padding; with b=0.75 its
    # per-occurrence credit saturates (tf/(tf+k1*norm) -> 1), so it cannot
    # beat a doc matching MORE DISTINCT terms
    got = bm25_topk(_corpus(spark), ["spark", "join", "filter"], k=10).collect()
    by_id = {r.doc_id: r.bm25 for r in got}
    assert by_id[1] > by_id[5]


def test_bm25_k_and_determinism(spark):
    docs = _corpus(spark)
    top2 = bm25_topk(docs, ["spark", "join", "filter"], k=2).collect()
    assert len(top2) == 2
    again = bm25_topk(docs.repartition(7), ["spark", "join", "filter"], k=2).collect()
    assert [(r.doc_id, r.bm25) for r in top2] == [(r.doc_id, r.bm25) for r in again]


def test_bm25_empty_query_raises(spark):
    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), [])


def test_bm25_autostats_guard_raises_above_threshold(spark):
    """Auto-computed corpus stats above the size threshold must raise
    (precompute-and-pass is the at-scale contract) while passing stats
    explicitly still works at any size (VERDICT r2 #8)."""
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="corpus_stats"):
        bm25_topk(docs, ["spark"], k=2, max_autostats_docs=2)
    from rust_cdc_validator_spark.operators.retrieval import corpus_stats

    stats = corpus_stats(docs)
    got = bm25_topk(docs, ["spark"], k=2, stats=stats, max_autostats_docs=2).collect()
    assert len(got) == 2


def test_bm25_with_stats_matches_autostats(spark):
    docs = _corpus(spark)
    from rust_cdc_validator_spark.operators.retrieval import corpus_stats

    auto = bm25_topk(docs, ["spark", "join"], k=10).collect()
    pre = bm25_topk(docs, ["spark", "join"], k=10, stats=corpus_stats(docs)).collect()
    assert [(r.doc_id, r.bm25) for r in auto] == [(r.doc_id, r.bm25) for r in pre]


def test_bm25_log_idf_variant_monotone(spark):
    # log and non-log idf must agree on the ranking for this corpus (the
    # non-log form is a monotone transform of df for fixed N)
    docs = _corpus(spark)
    a = [r.doc_id for r in bm25_topk(docs, ["spark", "join"], k=10, log_idf=True).collect()]
    b = [r.doc_id for r in bm25_topk(docs, ["spark", "join"], k=10, log_idf=False).collect()]
    assert a == b


# ------------------------------------------- RRF fusion

def _ranked(spark, rows, with_query=False):
    schema = (
        "query_id long, doc_id long, rank int" if with_query else "doc_id long, rank int"
    )
    return spark.createDataFrame(rows, schema)


def test_rrf_overlapping_doc_wins(spark):
    from rust_cdc_validator_spark.operators.retrieval import rrf_fuse

    a = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranked(spark, [(3, 1), (4, 2)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}
    # doc 3 appears in both lists → highest fused score
    assert out[3]["rank"] == 1 and out[3]["n_lists"] == 2
    assert abs(out[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-12
    assert out[1]["n_lists"] == 1
    # doc 1 (rank 1 in a) beats doc 4 (rank 2 in b)
    assert out[1]["rank"] < out[4]["rank"]


def test_rrf_weights_tilt_the_fusion(spark):
    from rust_cdc_validator_spark.operators.retrieval import rrf_fuse

    a = _ranked(spark, [(1, 1)])
    b = _ranked(spark, [(2, 1)])
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b], weights=[1.0, 3.0]).collect()}
    assert abs(out[2] / out[1] - 3.0) < 1e-12


def test_rrf_batched_per_query_ranking(spark):
    from rust_cdc_validator_spark.operators.retrieval import rrf_fuse

    a = _ranked(spark, [(10, 1, 1), (10, 2, 2), (20, 5, 1)], with_query=True)
    b = _ranked(spark, [(10, 2, 1), (20, 6, 1)], with_query=True)
    rows = rrf_fuse([a, b], query_col="query_id").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["rank"]
    assert by_q[10][2] == 1  # in both lists for query 10
    assert by_q[10][1] == 2
    assert sorted(by_q[20].values()) == [1, 2]  # ranks restart per query


def test_rrf_validates_inputs(spark):
    import pytest
    from rust_cdc_validator_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
    a = _ranked(spark, [(1, 1)])
    with pytest.raises(ValueError):
        rrf_fuse([a], weights=[1.0, 2.0])


# ---------------------------------------------------------------------------
# mmr_rerank (diversification)
# ---------------------------------------------------------------------------


def _mmr_cands(spark):
    # query 1: doc 10 and 11 are near-duplicates (parallel vectors), doc 12
    # is orthogonal with slightly lower relevance
    rows = [
        (1, 10, 0.99, [1.0, 0.0]),
        (1, 11, 0.98, [1.0, 0.01]),
        (1, 12, 0.90, [0.0, 1.0]),
    ]
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, embedding array<float>"
    )


def test_mmr_prefers_diverse_over_redundant(spark):
    from rust_cdc_validator_spark.operators.retrieval import mmr_rerank

    out = sorted(
        (r["mmr_rank"], r["doc_id"])
        for r in mmr_rerank(_mmr_cands(spark), k=3, lam=0.5).collect()
    )
    # rank 1 = best relevance (10); rank 2 = diverse 12, NOT near-dup 11
    assert out[0] == (1, 10) and out[1] == (2, 12) and out[2] == (3, 11)


def test_mmr_lam_1_is_pure_relevance_order(spark):
    from rust_cdc_validator_spark.operators.retrieval import mmr_rerank

    out = sorted(
        (r["mmr_rank"], r["doc_id"])
        for r in mmr_rerank(_mmr_cands(spark), k=3, lam=1.0).collect()
    )
    assert [d for _, d in out] == [10, 11, 12]


def test_mmr_partition_invariant_k_cap_and_validation(spark):
    import pytest
    from rust_cdc_validator_spark.operators.retrieval import mmr_rerank

    cands = _mmr_cands(spark)
    two_q = cands.union(
        cands.sparkSession.createDataFrame(
            [(2, 20, 0.5, [0.5, 0.5])],
            "query_id long, doc_id long, score double, embedding array<float>",
        )
    )
    key = lambda df: sorted(
        (r["query_id"], r["mmr_rank"], r["doc_id"]) for r in df.collect()
    )
    assert key(mmr_rerank(two_q, k=2)) == key(mmr_rerank(two_q.repartition(7), k=2))
    assert max(r["mmr_rank"] for r in mmr_rerank(two_q, k=2).collect()) <= 2
    with pytest.raises(ValueError):
        mmr_rerank(cands, lam=1.5)


def test_recall_report_counts_hits_per_query(spark):
    from rust_cdc_validator_spark.operators.retrieval import recall_report

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 99, 2), (1, 12, 3), (2, 21, 1)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {r["query_id"]: r for r in recall_report(exact, approx, k=3).collect()}
    assert out[1]["n_exact"] == 3 and out[1]["n_hit"] == 2
    assert abs(out[1]["recall"] - 2 / 3) < 1e-12
    assert out[2]["n_hit"] == 0 and out[2]["recall"] == 0.0


def test_recall_report_respects_k_cutoff(spark):
    from rust_cdc_validator_spark.operators.retrieval import recall_report

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank long"
    )
    approx = spark.createDataFrame(
        [(1, 11, 5)], "query_id long, neighbor_id long, rank long"
    )
    # approx found 11 but only at rank 5; at k=1 it does not count
    (row,) = recall_report(exact, approx, k=1).collect()
    assert row["n_exact"] == 1 and row["n_hit"] == 0
    (row3,) = recall_report(exact, approx, k=5).collect()
    assert row3["n_hit"] == 1


def test_recall_report_shows_multiprobe_lift(spark):
    """Compose the monitor with the index knobs it exists to tune:
    multi-probe LSH must dominate single-probe recall on the same corpus
    (strictly more buckets probed, same index)."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.retrieval import recall_report
    from rust_cdc_validator_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucket_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    queries = emb.filter(F.col("vec_id") < 32)
    exact = brute_force_topk(emb, queries, k=5)
    common = dict(dim=64, k=5, num_planes=8, num_tables=4)
    plain = lsh_bucket_topk(emb, queries, **common)
    multi = lsh_bucket_topk(emb, queries, n_probe_flips=2, **common)
    mean = lambda res: (
        recall_report(exact, res, k=5).agg(F.avg("recall")).collect()[0][0]
    )
    r_plain, r_multi = mean(plain), mean(multi)
    assert r_multi >= r_plain  # never worse: superset of probed buckets
    assert r_multi > 0.0


def test_ndcg_perfect_and_inverted_rankings(spark):
    from rust_cdc_validator_spark.operators.retrieval import ndcg_report

    perfect = spark.createDataFrame(
        [(1, 3.0, 1), (1, 2.0, 2), (1, 1.0, 3)],
        "query_id long, rel double, rank long",
    )
    (row,) = ndcg_report(perfect, "rel", query_col="query_id", k=3).collect()
    assert abs(row["ndcg"] - 1.0) < 1e-12  # already ideal

    inverted = spark.createDataFrame(
        [(1, 1.0, 1), (1, 2.0, 2), (1, 3.0, 3)],
        "query_id long, rel double, rank long",
    )
    (row2,) = ndcg_report(inverted, "rel", query_col="query_id", k=3).collect()
    assert 0 < row2["ndcg"] < 1.0


def test_ndcg_zero_relevance_is_null_and_k_cutoff(spark):
    from rust_cdc_validator_spark.operators.retrieval import ndcg_report

    nothing = spark.createDataFrame(
        [(1, 0.0, 1), (1, 0.0, 2)], "query_id long, rel double, rank long"
    )
    (row,) = ndcg_report(nothing, "rel", query_col="query_id").collect()
    assert row["ndcg"] is None
    # relevant doc at rank 5 with k=3: excluded entirely
    late = spark.createDataFrame(
        [(1, 0.0, 1), (1, 3.0, 5)], "query_id long, rel double, rank long"
    )
    (row2,) = ndcg_report(late, "rel", query_col="query_id", k=3).collect()
    assert row2["ndcg"] is None  # only the rel-0 row is inside k


def test_bm25_empty_corpus_raises_meaningfully(spark):
    """ADVICE r6: an empty (or all-null-text) corpus must raise a clear
    ValueError instead of TypeError at float(None)."""
    import pytest

    from rust_cdc_validator_spark.operators.retrieval import bm25_topk

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty"):
        bm25_topk(empty, "any query", k=5)
