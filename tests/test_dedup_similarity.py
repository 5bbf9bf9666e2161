from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_candidates,
)
from rust_cdc_validator_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    lsh_bucket_topk,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("today", "tomorrow")),  # near dup of 1
        (4, "completely different words about spark query engines and shuffles"),
        (5, "another unrelated sentence mentioning parquet files and columnar data"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = {r["keeper_id"]: r["copies"] for r in exact_dedup(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == 2  # docs 1,2 identical
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_finds_near_dups_not_unrelated(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(
            _docs(spark), "text", "doc_id", num_hashes=32, num_bands=16
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs: every minhash agrees
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_docs(spark), "text", "doc_id", threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # doc3 differs in last word: 12 shingles each, 11 shared → 11/13
    assert abs(pairs[(1, 3)] - 11 / 13) < 1e-9
    assert (1, 4) not in pairs


def test_simhash_candidates(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_dedup_candidates(_docs(spark), "text", "doc_id",
                                               max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0  # identical text → identical signature
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_simhash_signature_distances(spark):
    from pyspark.sql import functions as F
    from rust_cdc_validator_spark.functions.hashing import hamming64, simhash_signatures
    from rust_cdc_validator_spark.functions.text import word_shingles

    sig = simhash_signatures(_docs(spark), "doc_id", word_shingles(F.col("text"), 3))
    s = {r["_id"]: r["_sim"] for r in sig.collect()}
    df = spark.createDataFrame(
        [(s[1], s[2]), (s[1], s[3]), (s[1], s[4])], "a long, b long"
    )
    d12, d13, d14 = [
        r["h"] for r in df.select(hamming64(F.col("a"), F.col("b")).alias("h")).collect()
    ]
    assert d12 == 0          # identical docs
    assert d13 < d14         # near dup closer than unrelated doc


def _vectors(spark):
    import math
    rows = []
    for i in range(50):
        angle = (i % 10) * math.pi / 20  # 10 clusters of 5 near-identical
        jitter = (i // 10) * 1e-3
        rows.append((i, [math.cos(angle + jitter), math.sin(angle + jitter), 0.0, 0.1]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    v = _vectors(spark)
    top1 = brute_force_topk(v, v, k=1).collect()
    assert len(top1) == 50
    for r in top1:
        # nearest neighbor of i is in the same angular cluster
        assert r["neighbor_id"] % 10 == r["query_id"] % 10
        assert r["cos_sim"] > 0.999999


def test_lsh_recall_against_brute_force(spark):
    v = _vectors(spark)
    exact = {r["query_id"]: r["neighbor_id"] for r in brute_force_topk(v, v, k=1).collect()}
    approx = {r["query_id"]: r["neighbor_id"]
              for r in lsh_bucket_topk(v, v, dim=4, k=1, num_planes=4, num_tables=8).collect()}
    hits = sum(1 for q, n in exact.items() if approx.get(q) == n)
    assert hits / len(exact) >= 0.8  # high recall on clustered data


def test_hot_bucket_cap_prevents_quadratic_join(spark):
    """A planted degenerate bucket (10k identical docs → one LSH bucket per
    band) must be dropped by the population cap, not exploded into ~10⁸ join
    rows. With the cap the pipeline returns quickly and reports no pairs from
    the degenerate group, while genuine near-dups elsewhere still surface."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, "boilerplate header repeated verbatim in every document") for i in range(10_000)]
    rows += [(20_001, base), (20_002, base.replace("today", "tomorrow"))]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            df, "text", "doc_id", num_hashes=32, num_bands=16, max_bucket_size=100
        ).collect()
    }
    assert (20_001, 20_002) in pairs  # real near-dup still found
    assert not any(a < 20_000 and b < 20_000 for a, b in pairs)  # hot bucket dropped


def test_simhash_hot_quadrant_cap(spark):
    """A planted degenerate quadrant block (10k identical docs → one
    signature → all 4 quadrant blocks overflow) must be dropped by the
    population cap, not exploded into ~4·10⁸ join rows (VERDICT r2 #2).
    Real near-dups outside the hot block still surface."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [(i, "boilerplate header repeated verbatim in every document") for i in range(10_000)]
    rows += [(20_001, base), (20_002, base)]  # hamming 0: always a candidate
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_dedup_candidates(
            df, "text", "doc_id", max_hamming=3, max_bucket_size=100
        ).collect()
    }
    assert (20_001, 20_002) in pairs  # real near-dup still found
    assert not any(a < 20_000 and b < 20_000 for a, b in pairs)  # hot block dropped
    # observability: the dropped blocks are reportable, with populations
    from rust_cdc_validator_spark.operators.dedup import simhash_dropped_block_stats

    dropped = simhash_dropped_block_stats(
        df, "text", "doc_id", max_bucket_size=100
    ).collect()
    assert len(dropped) == 4  # one overflowing block per quadrant
    assert all(r["population"] == 10_000 for r in dropped)
    # and a healthy corpus reports none
    healthy = spark.createDataFrame(
        [(20_001, base), (20_002, base)], "doc_id long, text string"
    )
    assert simhash_dropped_block_stats(
        healthy, "text", "doc_id", max_bucket_size=100
    ).count() == 0


def test_lsh_near_dup_pairs_narrow_matches_wide_path(spark):
    """The narrow pair-generation strategy (memberships without vector
    payload, dedup before vectors move) must find the same near-dup pairs
    as the wide embedding_near_dup path at the same planes/seed/threshold
    on clustered vectors."""
    from rust_cdc_validator_spark.operators.similarity import (
        embedding_near_dup,
        lsh_near_dup_pairs,
    )

    v = _vectors(spark)  # 10 clusters of 5 near-identical 4-d vectors
    wide = {
        (r["id_a"], r["id_b"]): round(r["cos_sim"], 9)
        for r in embedding_near_dup(
            v, threshold=0.999, dim=4, num_planes=6, num_tables=8
        ).collect()
    }
    narrow = {
        (r["id_a"], r["id_b"]): round(r["cos_sim"], 9)
        for r in lsh_near_dup_pairs(
            v, threshold=0.999, dim=4, num_planes=6, num_tables=8
        ).collect()
    }
    assert narrow == wide
    assert narrow  # the clusters actually produce pairs
    for (a, b), sim in narrow.items():
        assert a < b and sim >= 0.999


def test_lsh_near_dup_pairs_hot_bucket_capped(spark):
    """A degenerate all-identical block must be dropped by the population
    cap before the pair join, not exploded quadratically."""
    from rust_cdc_validator_spark.operators.similarity import lsh_near_dup_pairs

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(3000)]
    rows += [(9001, [0.0, 1.0, 0.05, 0.0]), (9002, [0.0, 1.0, 0.0501, 0.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_dup_pairs(
            v, threshold=0.99, dim=4, num_planes=6, num_tables=4,
            max_bucket_size=100,
        ).collect()
    }
    assert (9001, 9002) in got          # real pair outside the hot block
    assert not any(a < 9000 and b < 9000 for a, b in got)  # block dropped


def test_group_scorer_caps_degenerate_bucket(spark):
    """All-identical corpus vectors land in ONE bucket of every LSH table;
    max_bucket_candidates must bound the per-task matmul by deterministic
    subsampling instead of scoring |q|·|corpus| pairs (VERDICT r2 #3).
    Queries still get full top-k (the survivors are equivalent), and two
    runs subsample identically."""
    n = 5_000
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        [(100_001, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out1 = lsh_bucket_topk(
        corpus, queries, dim=4, k=5, num_planes=4, num_tables=2,
        include_self=True, max_bucket_candidates=50,
    ).collect()
    assert len(out1) == 5
    assert all(abs(r["cos_sim"] - 1.0) < 1e-9 for r in out1)
    out2 = lsh_bucket_topk(
        corpus, queries, dim=4, k=5, num_planes=4, num_tables=2,
        include_self=True, max_bucket_candidates=50,
    ).collect()
    assert sorted(r["neighbor_id"] for r in out1) == sorted(
        r["neighbor_id"] for r in out2
    )


def test_ngram_hot_shingle_cap(spark):
    """Shingles above the document-frequency cap are excluded from both the
    intersection and the sizes, so capped Jaccard stays a true Jaccard over
    the remaining shingles."""
    shared = "alpha beta gamma"  # one hot shingle in every doc
    rows = [(i, f"{shared} unique{i} filler{i} tail{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(
        df, "text", "doc_id", shingle_n=3, threshold=0.01, max_shingle_df=10
    ).collect()
    # the only shared shingle is hot (df=20 > 10) → no pair shares anything
    assert pairs == []


def test_brute_force_guard_raises_on_large_query_set(spark):
    v = _vectors(spark)
    import pytest

    with pytest.raises(ValueError, match="max_broadcast_queries"):
        brute_force_topk(v, v, k=1, max_broadcast_queries=10)


def test_embedding_near_dup_pairs(spark):
    v = _vectors(spark)
    pairs = embedding_near_dup(v, threshold=0.9999, dim=4, num_planes=4, num_tables=8).collect()
    assert all(r["id_a"] % 10 == r["id_b"] % 10 for r in pairs)
    assert len(pairs) > 0


def test_lsh_float32_payload_optin(spark):
    """payload_dtype='float32' (the at-scale shuffle-halving opt-in) still
    retrieves same-cluster neighbors; only sub-1e-7 orderings may differ."""
    v = _vectors(spark)
    out = lsh_bucket_topk(
        v, v, dim=4, k=1, num_planes=4, num_tables=8, payload_dtype="float32"
    ).collect()
    same_cluster = sum(1 for r in out if r["neighbor_id"] % 10 == r["query_id"] % 10)
    assert same_cluster / len(out) >= 0.9


def test_lsh_int8_payload_optin(spark):
    """payload_dtype='int8' (8x shuffle shrink: fixed-scale byte
    quantization of unit vectors) still retrieves same-cluster neighbors;
    only orderings finer than the ~1e-3 quantization noise may differ."""
    v = _vectors(spark)
    out = lsh_bucket_topk(
        v, v, dim=4, k=1, num_planes=4, num_tables=8, payload_dtype="int8"
    ).collect()
    same_cluster = sum(1 for r in out if r["neighbor_id"] % 10 == r["query_id"] % 10)
    assert same_cluster / len(out) >= 0.9
    # scores are dequantized back to ~unit dot products, not raw int dots
    assert all(-1.01 <= r["cos_sim"] <= 1.01 for r in out)


def test_int8_quantize_round_trip_error_bound(spark):
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.functions.vectors import (
        dequantize_unit_int8,
        normalize,
        quantize_unit_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.6, -0.8, 0.0, 0.001]), (2, [1.0, 0.0, 0.0, 0.0])],
        "id long, v array<double>",
    ).withColumn("u", normalize(F.col("v")))
    got = df.select(
        "id", "u", dequantize_unit_int8(quantize_unit_int8(F.col("u"))).alias("rt")
    ).collect()
    for r in got:
        for orig, back in zip(r["u"], r["rt"]):
            assert abs(orig - back) <= 0.5 / 127.0 + 1e-12


def test_lsh_dropped_bucket_stats_planted_hot_bucket(spark):
    """The stats operator reports exactly the buckets the caps would drop:
    a 3000-member identical block shows up over-capacity in EVERY table
    (identical vectors share every table's bucket); with the cap raised
    above the block, the report is empty."""
    from rust_cdc_validator_spark.operators.similarity import (
        lsh_dropped_bucket_stats,
    )

    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(3000)]
    rows += [(9001, [0.0, 1.0, 0.05, 0.0]), (9002, [0.0, 1.0, 0.0501, 0.0])]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    stats = lsh_dropped_bucket_stats(
        v, dim=4, num_planes=6, num_tables=4, max_bucket_size=100
    ).collect()
    assert {r["tbl"] for r in stats} == {0, 1, 2, 3}
    assert all(r["population"] >= 3000 for r in stats)

    assert (
        lsh_dropped_bucket_stats(
            v, dim=4, num_planes=6, num_tables=4, max_bucket_size=5000
        ).count()
        == 0
    )


def test_minhash_dropped_band_stats_planted_hot_bucket(spark):
    """Same contract for the MinHash band cap: identical docs overflow a
    band bucket and the stats name it; diverse docs alone report nothing."""
    from rust_cdc_validator_spark.operators.dedup import (
        minhash_dropped_band_stats,
    )

    boiler = [(i, "lorem ipsum boilerplate footer text repeated") for i in range(50)]
    diverse = [(1000 + i, f"document number {i} with its own distinct words {i*7}")
               for i in range(10)]
    docs = spark.createDataFrame(boiler + diverse, "doc_id long, text string")

    stats = minhash_dropped_band_stats(
        docs, "text", "doc_id", num_hashes=16, num_bands=4, max_bucket_size=20
    ).collect()
    assert stats and all(r["population"] >= 50 for r in stats)

    clean = spark.createDataFrame(diverse, "doc_id long, text string")
    assert (
        minhash_dropped_band_stats(
            clean, "text", "doc_id", num_hashes=16, num_bands=4, max_bucket_size=20
        ).count()
        == 0
    )


# ---- persisted MinHash index (standing dedup, r6) -------------------------


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_index_probe_matches_one_shot_candidates(spark, tmp_path):
    """Sparse regime: probing batch B against an index of A yields exactly
    the cross-set candidate pairs the one-shot self-join over A∪B finds
    (same formulation ⇒ same buckets)."""
    from rust_cdc_validator_spark.operators.dedup import (
        build_minhash_index,
        minhash_lsh_candidates,
        near_dup_against_index,
    )

    a_rows = [(i, f"unique document number {i} about topic {i % 7} " * 3)
              for i in range(40)]
    a_rows += [(100, "the quick brown fox jumps over the lazy dog again and again"),
               (101, "completely different text on another subject entirely here")]
    b_rows = [(1100, "the quick brown fox jumps over the lazy dog again and again"),
              (1101, "completely different text on another subject entirely here"),
              (1102, "novel text that matches nothing in the index at all okay")]
    idx = str(tmp_path / "mh_idx")
    build_minhash_index(_mk_docs(spark, a_rows), idx)

    probe = near_dup_against_index(_mk_docs(spark, b_rows), idx, threshold=0.0)
    got = {(r["id_old"], r["id_new"]) for r in probe.collect()}

    union = _mk_docs(spark, a_rows + b_rows)
    one_shot = minhash_lsh_candidates(union, "text", "doc_id")
    want = {
        (r["id_a"], r["id_b"])
        for r in one_shot.collect()
        if r["id_a"] < 1000 <= r["id_b"]
    }
    assert got == want
    assert (100, 1100) in got and (101, 1101) in got


def test_minhash_index_append_equals_build(spark, tmp_path):
    """build(A) + append(B) produces the same index contents as
    build(A ∪ B) — signatures and memberships, row for row."""
    from rust_cdc_validator_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
    )

    a = [(i, f"document alpha {i} with words {i * 3}") for i in range(30)]
    b = [(500 + i, f"document beta {i} other words {i * 5}") for i in range(20)]
    idx1 = str(tmp_path / "incr")
    idx2 = str(tmp_path / "oneshot")
    build_minhash_index(_mk_docs(spark, a), idx1)
    append_to_minhash_index(_mk_docs(spark, b), idx1)
    build_minhash_index(_mk_docs(spark, a + b), idx2)

    for part in ("signatures", "memberships"):
        got = sorted(map(tuple, spark.read.parquet(f"{idx1}/{part}").collect()))
        want = sorted(map(tuple, spark.read.parquet(f"{idx2}/{part}").collect()))
        assert got == want, part


def test_minhash_index_est_jaccard_and_threshold(spark, tmp_path):
    from rust_cdc_validator_spark.operators.dedup import (
        build_minhash_index,
        near_dup_against_index,
    )

    idx = str(tmp_path / "mh_est")
    build_minhash_index(
        _mk_docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta"),
                      (2, "totally unrelated content about something else")]),
        idx,
    )
    probe = near_dup_against_index(
        _mk_docs(spark, [(900, "alpha beta gamma delta epsilon zeta eta theta")]),
        idx, threshold=0.8,
    ).collect()
    assert [(r["id_new"], r["id_old"], r["est_jaccard"]) for r in probe] == [
        (900, 1, 1.0)
    ]


def test_minhash_index_hot_bucket_cap_and_batch_guard(spark, tmp_path):
    import pytest

    from rust_cdc_validator_spark.operators.dedup import (
        build_minhash_index,
        near_dup_against_index,
    )

    idx = str(tmp_path / "mh_hot")
    boiler = "same boilerplate footer text repeated everywhere verbatim"
    build_minhash_index(
        _mk_docs(spark, [(i, boiler) for i in range(60)]), idx
    )
    # every (band, bucket) the probe hits holds 60 identical members > cap
    got = near_dup_against_index(
        _mk_docs(spark, [(999, boiler)]), idx, threshold=0.0, max_bucket_size=50
    )
    assert got.count() == 0

    with pytest.raises(ValueError, match="membership rows"):
        near_dup_against_index(
            _mk_docs(spark, [(999, boiler)]), idx, max_batch_memberships=10
        )


# ---- persisted LSH index (standing vector near-dup, r6) -------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_index_probe_matches_narrow_pairs(spark, tmp_path):
    """Sparse regime: probing batch B against an index of A yields exactly
    the cross-set pairs lsh_near_dup_pairs finds on A∪B under the same
    params (same seeded planes ⇒ same buckets)."""
    from rust_cdc_validator_spark.operators.similarity import (
        build_lsh_index,
        lsh_near_dup_pairs,
        near_dup_against_lsh_index,
    )

    a_rows = [(i, [float(i % 7 + 1), float(i % 5), 1.0, 0.5]) for i in range(30)]
    a_rows += [(100, [0.0, 1.0, 0.05, 0.0])]
    b_rows = [(1100, [0.0, 1.0, 0.0501, 0.0]), (1101, [9.0, -3.0, 2.0, -7.0])]
    kw = dict(dim=4, num_planes=6, num_tables=4)
    idx = str(tmp_path / "lsh_idx")
    build_lsh_index(_vecs(spark, a_rows), idx, **kw)

    probe = near_dup_against_lsh_index(_vecs(spark, b_rows), idx, threshold=0.9)
    got = {(r["id_old"], r["id_new"], round(r["cos_sim"], 6)) for r in probe.collect()}

    union = _vecs(spark, a_rows + b_rows)
    want = {
        (r["id_a"], r["id_b"], round(r["cos_sim"], 6))
        for r in lsh_near_dup_pairs(union, threshold=0.9, **kw).collect()
        if r["id_a"] < 1000 <= r["id_b"]
    }
    assert got == want
    assert any(o == 100 and n == 1100 for o, n, _ in got)


def test_lsh_index_append_equals_build(spark, tmp_path):
    from rust_cdc_validator_spark.operators.similarity import (
        append_to_lsh_index,
        build_lsh_index,
    )

    a = [(i, [float(i), 1.0, 0.0, 0.5]) for i in range(20)]
    b = [(500 + i, [0.5, float(i), 1.0, 0.0]) for i in range(15)]
    idx1, idx2 = str(tmp_path / "incr"), str(tmp_path / "oneshot")
    kw = dict(dim=4, num_planes=5, num_tables=3)
    build_lsh_index(_vecs(spark, a), idx1, **kw)
    append_to_lsh_index(_vecs(spark, b), idx1)
    build_lsh_index(_vecs(spark, a + b), idx2, **kw)
    for part in ("memberships",):
        got = sorted(map(tuple, spark.read.parquet(f"{idx1}/{part}").collect()))
        want = sorted(map(tuple, spark.read.parquet(f"{idx2}/{part}").collect()))
        assert got == want, part
    g = {r["_id"]: [round(x, 6) for x in r["_v"]]
         for r in spark.read.parquet(f"{idx1}/vectors").collect()}
    w = {r["_id"]: [round(x, 6) for x in r["_v"]]
         for r in spark.read.parquet(f"{idx2}/vectors").collect()}
    assert g == w


def test_lsh_index_hot_bucket_cap_and_batch_guard(spark, tmp_path):
    import pytest

    from rust_cdc_validator_spark.operators.similarity import (
        build_lsh_index,
        near_dup_against_lsh_index,
    )

    idx = str(tmp_path / "lsh_hot")
    same = [1.0, 0.0, 0.0, 0.0]
    build_lsh_index(
        _vecs(spark, [(i, same) for i in range(60)]), idx,
        dim=4, num_planes=6, num_tables=4,
    )
    got = near_dup_against_lsh_index(
        _vecs(spark, [(999, same)]), idx, threshold=0.0, max_bucket_size=50
    )
    assert got.count() == 0

    with pytest.raises(ValueError, match="membership rows"):
        near_dup_against_lsh_index(
            _vecs(spark, [(999, same)]), idx, max_batch_memberships=2
        )


def test_exact_substring_stats_planted_spans(spark):
    """Cross-doc shared span, within-doc repeat, short doc, clean doc —
    coverage checked against hand-computed fixed-width interval unions."""
    from rust_cdc_validator_spark.operators.dedup import exact_substring_stats

    rows = [
        # A and B share the aligned 6-token span c1..c6 -> 3 dup windows
        # each (positions 1-3 in A, 3-5 in B), union coverage 6 tokens
        (1, "c1 c2 c3 c4 c5 c6 u1 u2"),
        (2, "v1 v2 c1 c2 c3 c4 c5 c6"),
        # internal repeat: window 'x y z w' at positions 1 and 5 ->
        # 2 dup windows, disjoint intervals -> coverage 8 (whole doc)
        (3, "x y z w x y z w"),
        (4, "a b c"),  # shorter than the window -> no windows at all
        (5, "e1 e2 e3 e4 e5 e6 e7 e8"),  # unique -> clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_windows"],
            r["n_dup_windows"],
            r["dup_covered_tokens"],
            r["dup_frac"],
        )
        for r in exact_substring_stats(df, "text", "doc_id", window=4).collect()
    }
    assert got[1] == (8, 5, 3, 6, 0.75)
    assert got[2] == (8, 5, 3, 6, 0.75)
    assert got[3] == (8, 5, 2, 8, 1.0)
    assert got[4] == (3, 0, 0, 0, 0.0)
    assert got[5] == (8, 5, 0, 0, 0.0)


def test_exact_substring_scrub_consistent_with_stats(spark):
    """Scrub removes exactly the tokens stats counts as covered, and clean
    docs round-trip untouched."""
    from rust_cdc_validator_spark.operators.dedup import (
        exact_substring_scrub,
        exact_substring_stats,
    )

    rows = [
        (1, "c1 c2 c3 c4 c5 c6 u1 u2"),
        (2, "v1 v2 c1 c2 c3 c4 c5 c6"),
        (3, "x y z w x y z w"),
        (4, "a b c"),
        (5, "e1 e2 e3 e4 e5 e6 e7 e8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scrub = {
        r["doc_id"]: (r["scrubbed"], r["n_removed_tokens"])
        for r in exact_substring_scrub(df, "text", "doc_id", window=4).collect()
    }
    stats = {
        r["doc_id"]: r["dup_covered_tokens"]
        for r in exact_substring_stats(df, "text", "doc_id", window=4).collect()
    }
    assert scrub[1] == ("u1 u2", 6)
    assert scrub[2] == ("v1 v2", 6)
    assert scrub[3] == ("", 8)
    assert scrub[4] == ("a b c", 0)
    assert scrub[5] == ("e1 e2 e3 e4 e5 e6 e7 e8", 0)
    for k in stats:  # removed == covered, doc by doc
        assert scrub[k][1] == stats[k]


# ------------------------------------------- multi-probe LSH

def test_multiprobe_zero_flips_equals_plain_lsh(spark, sf_dir):
    from rust_cdc_validator_spark.operators.similarity import lsh_bucket_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(120)
    plain = lsh_bucket_topk(emb, emb, dim=64, k=1, num_planes=6, num_tables=2)
    probe0 = lsh_bucket_topk(
        emb, emb, dim=64, k=1, num_planes=6, num_tables=2, n_probe_flips=0
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, probe0.collect()))


def test_multiprobe_emits_base_and_flipped_buckets(spark):
    import numpy as np
    from pyspark.sql import types as T
    from rust_cdc_validator_spark.operators.similarity import (
        _bucketed,
        _bucketed_multiprobe,
        _hyperplanes,
    )

    rng = np.random.default_rng(4)
    rows = [
        (i, (v / np.linalg.norm(v)).astype(np.float32).tolist())
        for i, v in enumerate(rng.normal(size=(20, 16)))
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    planes = _hyperplanes(16, seed=1, num_tables=2, num_planes=5)
    base = {
        (r["_id"], r["tbl"]): r["bucket"]
        for r in _bucketed(df, "vec_id", "embedding", planes).collect()
    }
    multi = {}
    for r in _bucketed_multiprobe(
        df, "vec_id", "embedding", planes, n_flip=2
    ).collect():
        multi.setdefault((r["_id"], r["tbl"]), set()).add(r["bucket"])
    for key, b in base.items():
        probes = multi[key]
        assert b in probes          # base bucket always probed
        assert len(probes) == 3     # base + 2 single-bit flips
        for p in probes - {b}:
            x = p ^ b
            assert x & (x - 1) == 0  # each extra probe is one bit away


def test_multiprobe_recall_never_below_plain(spark, sf_dir):
    from rust_cdc_validator_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucket_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    want = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(emb, emb, k=1).collect()
    }

    def recall(flips):
        got = {
            r["query_id"]: r["neighbor_id"]
            for r in lsh_bucket_topk(
                emb, emb, dim=64, k=1, num_planes=8, num_tables=2,
                n_probe_flips=flips,
            ).filter("rank = 1").collect()
        }
        return sum(1 for q in want if got.get(q) == want[q])

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    assert r3 > 0


# ---------------------------------------------------------------------------
# mean_vectors (per-group centroids)
# ---------------------------------------------------------------------------


def test_mean_vectors_exact_and_ragged(spark):
    from rust_cdc_validator_spark.functions.vectors import mean_vectors

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (1, [3.0, 4.0, 5.0]),
            (2, [10.0, 20.0]),
            (2, [30.0, 40.0, 90.0]),  # ragged: dim 2 averaged over 1 row
        ],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in mean_vectors(df, "label").collect()}
    assert out[1]["centroid"] == [2.0, 3.0, 4.0] and out[1]["n_vecs"] == 2
    assert out[2]["centroid"] == [20.0, 30.0, 90.0]


def test_mean_vectors_partial_aggregates_map_side(spark):
    from rust_cdc_validator_spark.functions.vectors import mean_vectors

    df = spark.createDataFrame(
        [(i % 3, [float(i), float(i + 1)]) for i in range(30)],
        "label int, embedding array<float>",
    )
    out = mean_vectors(df, "label")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # JVM-only (no Python stage) and the per-dim aggregate partials map-side
    assert "Python" not in plan and "partial" in plan.lower()
    assert out.count() == 3


def test_centroid_outliers_flags_planted_outlier(spark):
    from rust_cdc_validator_spark.functions.vectors import centroid_outliers

    # label 1: a tight cluster around [1, 0] plus one opposite-direction
    # outlier; label 2 untouched
    rows = [(i, 1, [1.0, 0.01 * i]) for i in range(10)]
    rows.append((99, 1, [-1.0, 0.0]))
    rows += [(200 + i, 2, [0.0, 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = centroid_outliers(df, "label", k=2)
    by_label = {}
    for r in out.collect():
        by_label.setdefault(r["label"], []).append(r)
    top1 = min(by_label[1], key=lambda r: r["outlier_rank"])
    assert top1["vec_id"] == 99 and top1["centroid_sim"] < 0
    assert len(by_label[1]) == 2 and len(by_label[2]) == 2
    # partition invariance
    a = sorted((r["vec_id"], r["outlier_rank"]) for r in out.collect())
    b = sorted(
        (r["vec_id"], r["outlier_rank"])
        for r in centroid_outliers(df.repartition(7), "label", k=2).collect()
    )
    assert a == b


def test_random_projection_preserves_neighbors_and_shape(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.similarity import (
        brute_force_topk,
        random_projection,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    # 5 planted near-dup pairs: vector i+100 = tiny perturbation of i
    rows += [
        (100 + i, [float(x) for x in base[i] + 0.01 * rng.standard_normal(64)])
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    red = random_projection(df, in_dim=64, out_dim=16)
    sample = red.limit(1).collect()[0]["embedding"]
    assert len(sample) == 16
    assert abs(sum(x * x for x in sample) - 1.0) < 1e-9
    nn = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(red, red, k=1).collect()
    }
    hits = sum(nn[100 + i] == i for i in range(5))
    assert hits >= 4  # JL: near-dup pairs survive the 4x reduction


def test_random_projection_deterministic_and_validated(spark):
    import pytest

    from rust_cdc_validator_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    key = lambda d: sorted(
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in d.collect()
    )
    assert key(random_projection(df, 8, 4)) == key(
        random_projection(df.repartition(5), 8, 4)
    )
    with pytest.raises(ValueError):
        random_projection(df, 8, 8)


def test_lsh_plan_scurve(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.dedup import lsh_plan

    plan = lsh_plan(threshold=0.8, num_hashes=64)
    assert plan["num_bands"] * plan["rows_per_band"] == 64
    # the S-curve must separate: near-certain above, unlikely below
    assert plan["p_above"] > 0.95
    assert plan["p_below"] < 0.5
    assert plan["p_at_threshold"] > plan["p_below"]
    # inflection lands near the asked threshold among 64's divisors
    assert abs(plan["inflection"] - 0.8) < 0.15
    # a low threshold picks more, shorter bands (catches weaker pairs)
    loose = lsh_plan(threshold=0.3, num_hashes=64)
    assert loose["rows_per_band"] < plan["rows_per_band"]
    with _pytest.raises(ValueError):
        lsh_plan(threshold=1.5)
    with _pytest.raises(ValueError):
        lsh_plan(threshold=0.5, num_hashes=1)
