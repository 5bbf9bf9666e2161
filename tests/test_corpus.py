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


def test_prepare_training_corpus_no_fulltext_shuffle(spark):
    """The dedup must group/join on xxhash64(_norm) — 8 bytes — not on the
    normalized text itself. Assert the executed plan carries no `_norm`
    column through any Exchange (the column no longer exists at all) and
    that the hash key is present."""
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 4) for i in range(20)],
        "doc_id long, text string",
    )
    out = prepare_training_corpus(docs, min_chars=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_norm" not in plan
    assert "xxhash64" in plan.lower()
    assert {r["doc_id"] for r in out.collect()} == {0}  # still dedupes


def test_prepare_training_corpus_neardup_drops_clusters(spark):
    """Near-dup removal on top of the exact pipeline: verbatim copies go in
    the exact stage, high-Jaccard variants go in the cluster stage, the
    min-id root of each cluster survives."""
    from rust_cdc_validator_spark.operators.corpus import (
        prepare_training_corpus_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog near the river " * 4
    variant = base.replace("lazy", "sleepy")  # high-Jaccard near-dup of base
    rows = [
        (1, base.strip()),
        (2, base.strip().upper() + "..."),   # exact dup after normalization
        (3, variant.strip()),                 # near dup → clustered with 1
        (4, "completely different content about spark shuffles and parquet "
            "files with the required length padding words and more words "
            "to pass the gate easily " * 2),
        (5, "short"),                         # gated out
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"] for r in prepare_training_corpus_neardup(docs).collect()}
    assert out == {1, 4}  # 2 exact-deduped, 3 near-dup-clustered, 5 gated


def test_pack_sequences_default_shards_scale_with_parallelism(spark):
    from rust_cdc_validator_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens int")
    par = spark.sparkContext.defaultParallelism
    # derived default: 4× parallelism, floor 16 — always exceeds parallelism
    shards = {r.shard for r in pack_sequences(docs).collect()}
    target = max(16, 4 * par)
    derived = 1 << (target - 1).bit_length()
    assert derived > par
    assert all(0 <= s < derived for s in shards)
    # a wide corpus actually spreads across more shards than the old fixed 16
    wide = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    n_used = pack_sequences(wide).select("shard").distinct().count()
    assert n_used > 16 or derived == 16


def test_pack_sequences_budget_and_coverage(spark):
    from rust_cdc_validator_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 300) for i in range(200)], "doc_id long, n_tokens int"
    )
    packs = pack_sequences(docs, budget=1000, shards=4).collect()
    # every doc assigned exactly once
    assert sorted(r.doc_id for r in packs) == list(range(200))
    by_doc = {r.doc_id: r for r in packs}
    # within a shard, pack ids follow cumulative offsets: offset < budget,
    # and a doc's pack is floor(start/budget) — verify against a local replay
    import hashlib
    from collections import defaultdict

    shards = defaultdict(list)
    for i in range(200):
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[0], 16) % 4
        shards[sh].append(i)
    for sh, ids in shards.items():
        start = 0
        for i in sorted(ids):
            r = by_doc[i]
            assert r.shard == sh
            assert r.pack_id == start // 1000
            assert r.pack_offset == start % 1000
            start += 100 + (i * 37) % 300
    # packs fill to at least the budget minus one max-doc (greedy property)
    from collections import Counter

    tokens_per_pack = Counter()
    maxpack = {}
    for r in packs:
        tokens_per_pack[(r.shard, r.pack_id)] += r.n_tokens
        maxpack[r.shard] = max(maxpack.get(r.shard, -1), r.pack_id)
    for (sh, p), tot in tokens_per_pack.items():
        if p < maxpack[sh]:  # every non-final pack reaches its budget
            assert tot + 399 >= 1000


def test_cap_per_domain_keeps_top_k_deterministically(spark):
    from rust_cdc_validator_spark.operators.corpus import cap_per_domain

    docs = spark.createDataFrame(
        [(i, f"d{i % 3}", 1000 - (i % 5)) for i in range(60)],
        "doc_id long, source string, n_chars int",
    )
    got = cap_per_domain(docs, "source", k=4, order_col="n_chars").collect()
    assert len(got) == 12
    for r in got:
        assert r.domain_rank <= 4
    # deterministic: biggest n_chars first, doc_id breaks ties
    for dom in ("d0", "d1", "d2"):
        rows = sorted((r for r in got if r.source == dom), key=lambda r: r.domain_rank)
        keys = [(-r.n_chars, r.doc_id) for r in rows]
        assert keys == sorted(keys)


def test_cap_per_domain_two_stage_matches_single_window(spark):
    """The salted two-stage top-k must be bit-identical to the naive
    single-window form (that is what keeps the domain_capped_docs oracle
    hash-green), including under ties and across salt counts."""
    from pyspark.sql import Window

    from rust_cdc_validator_spark.operators.corpus import cap_per_domain

    docs = spark.createDataFrame(
        [(i, f"d{i % 4}", 500 - (i % 7)) for i in range(500)],
        "doc_id long, source string, n_chars int",
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    naive = (
        docs.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= 6)
    )
    key = lambda r: (r.source, r.domain_rank)
    for n_salts in (1, 4, 32):
        got = cap_per_domain(
            docs, "source", k=6, order_col="n_chars", n_salts=n_salts
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, naive.collect()))


def test_cap_per_domain_hot_domain_bounded(spark):
    """A single pathologically hot domain must not be sorted in one task:
    stage 1 splits it across salts (each local sort sees ~1/n_salts of the
    domain) and only n_salts·k survivors reach the exact stage-2 window.
    Verified behaviorally (exact top-k result on a 100k-row single-domain
    table) and structurally (two row_number windows with different
    partition keys in the plan)."""
    from rust_cdc_validator_spark.operators.corpus import cap_per_domain

    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.lit("hot.example.com").alias("source"),
        (F.col("id") % 997).cast("int").alias("n_chars"),
    )
    out = cap_per_domain(docs, "source", k=5, order_col="n_chars", n_salts=32)
    rows = sorted(out.collect(), key=lambda r: r.domain_rank)
    assert [r.n_chars for r in rows] == [996] * 5  # true global top-5
    assert [r.domain_rank for r in rows] == [1, 2, 3, 4, 5]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number") >= 2  # two-stage, not one global window


def test_profile_table_auto_approx_threshold(spark):
    from rust_cdc_validator_spark.operators.corpus import profile_table

    df = spark.range(1000).select(F.col("id").alias("k"))
    exact = {r.column_name: r.n_distinct
             for r in profile_table(df, approx_threshold=10_000).collect()}
    assert exact["k"] == 1000  # under threshold → exact path
    approx = {r.column_name: r.n_distinct
              for r in profile_table(df, approx_threshold=100).collect()}
    assert abs(approx["k"] - 1000) <= 100  # over threshold → HLL sketch


def test_stratified_sample_rates_and_determinism(spark):
    from rust_cdc_validator_spark.operators.corpus import stratified_sample

    docs = spark.createDataFrame(
        [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)],
        "doc_id long, lang string",
    )
    rates = {"en": 1.0, "de": 0.5, "zh": 0.0}
    got = stratified_sample(docs, "lang", rates)
    counts = {r["lang"]: r["count"] for r in got.groupBy("lang").count().collect()}
    assert counts.get("en") == 1000            # rate 1.0 keeps everything
    assert "zh" not in counts                  # rate 0.0 drops everything
    assert 350 <= counts.get("de", 0) <= 650   # ~half, hash-distributed
    # deterministic and partitioning-invariant
    again = stratified_sample(docs.repartition(13), "lang", rates)
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    # unlisted strata are dropped
    extra = spark.createDataFrame([(99999, "xx")], "doc_id long, lang string")
    assert stratified_sample(extra, "lang", rates).count() == 0


def test_md5_bucket_rejects_non_power_of_two():
    """Explicit ValueError (not assert — stripped under python -O, where the
    digit-count loop would never terminate for an odd-factor count)."""
    import pytest
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.corpus import md5_bucket, md5_bucket_fine

    with pytest.raises(ValueError, match="power of 2"):
        md5_bucket(F.col("x"), buckets=10)
    with pytest.raises(ValueError, match="divide 4096"):
        md5_bucket_fine(F.col("x"), denom=5)


def test_percentile_profile_exact_and_auto_sketch(spark):
    """percentile_profile: exact path matches F.percentile bit-for-bit;
    the auto path flips to approx_percentile above the probe threshold
    (plan-asserted — the sketch aggregate appears in the analyzed plan);
    sketch values are rank-bounded close on a known distribution."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.corpus import percentile_profile

    df = spark.range(0, 1001).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )

    exact = percentile_profile(df, ["v"], ["g"], approx=False)
    want = df.groupBy("g").agg(
        F.percentile("v", 0.5).alias("v_p50"),
        F.percentile("v", 0.9).alias("v_p90"),
        F.percentile("v", 0.99).alias("v_p99"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, want.collect()))

    # auto: 1001 rows > threshold 100 → sketch path chosen
    auto = percentile_profile(df, ["v"], ["g"], approx_threshold=100)
    plan = auto._jdf.queryExecution().analyzed().toString()
    assert "percentile_approx" in plan and "percentile(" not in plan
    for r in auto.collect():
        # ids 0..1000 split by parity: p50 of each 500-ish-value group ≈ 500
        assert abs(r["v_p50"] - 500) <= 20
        assert r["n_rows"] in (500, 501)

    # auto: under the threshold → exact (no sketch in the plan)
    small = percentile_profile(df.limit(50), ["v"], approx_threshold=100)
    assert "percentile_approx" not in small._jdf.queryExecution().analyzed().toString()
    assert small.columns == ["v_p50", "v_p90", "v_p99", "n_rows"]


def test_percentile_profile_matches_quantity_percentiles_catalog(spark):
    """The catalog's oracle-pinned exact query is percentile_profile's
    approx=False arm over the same columns (VERDICT r5 #2: catalog stays
    exact, operator surface is scale-safe)."""
    import os

    from pyspark.sql import functions as F

    from rust_cdc_validator_spark import queries as Q
    from rust_cdc_validator_spark.operators.corpus import percentile_profile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    catalog = Q.quantity_percentiles(spark, sf_dir)
    med = percentile_profile(
        li, ["l_quantity"], ["l_returnflag"], probs=(0.5,), approx=False
    ).withColumnRenamed("l_quantity_p50", "med_qty")
    got = {r["l_returnflag"]: r["med_qty"] for r in med.collect()}
    want = {r["l_returnflag"]: r["med_qty"] for r in catalog.collect()}
    assert got == want


def test_source_mixture_weights_rebalance_to_uniform(spark):
    """Applying the emitted weight to each source's token mass must land
    every source exactly on the uniform target share — the defining
    property of a mixture-rebalancing pass — and the weighted token total
    must be conserved (sum of target shares = 1)."""
    import os

    from rust_cdc_validator_spark import queries as Q

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    rows = Q.source_mixture_weights(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["weight"] > 0
        # resampled share = actual share * weight = target share
        assert abs(r["token_share"] * r["weight"] - r["target_share"]) < 1e-12
    assert abs(sum(r["token_share"] * r["weight"] for r in rows) - 1.0) < 1e-9


# ------------------------------------------- DSIR importance weights

def _dsir_frames(spark):
    from pyspark.sql import functions as F

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma alpha") for i in range(3)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "alpha beta alpha gamma"),       # target-like
            (1, "zeta eta theta iota kappa"),    # off-target
            (2, "alpha zeta beta eta"),          # mixed
        ],
        "doc_id long, text string",
    )
    return raw, target


def _dsir_reference(raw_texts, target_texts, buckets, smoothing=0.5):
    import hashlib
    from collections import Counter

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16) % buckets

    def count(texts):
        c = Counter()
        for t in texts:
            for w in t.lower().split():
                c[bucket(w)] += 1
        return c

    ct, cr = count(target_texts), count(raw_texts)
    nt, nr = sum(ct.values()), sum(cr.values())
    import math

    out = {}
    for i, t in enumerate(raw_texts):
        s = 0.0
        for w in t.lower().split():
            b = bucket(w)
            s += math.log((ct[b] + smoothing) / (nt + smoothing * buckets))
            s -= math.log((cr[b] + smoothing) / (nr + smoothing * buckets))
        out[i] = s
    return out


def test_importance_weights_match_reference_model(spark):
    from rust_cdc_validator_spark.operators.corpus import importance_weights

    raw, target = _dsir_frames(spark)
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(raw, target, buckets=64).collect()
    }
    want = _dsir_reference(
        ["alpha beta alpha gamma", "zeta eta theta iota kappa", "alpha zeta beta eta"],
        ["alpha beta gamma alpha"] * 3,
        buckets=64,
    )
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_importance_weights_rank_target_like_docs_higher(spark):
    from rust_cdc_validator_spark.operators.corpus import importance_weights

    raw, target = _dsir_frames(spark)
    w = {r["doc_id"]: r["log_weight"] for r in importance_weights(raw, target, buckets=64).collect()}
    assert w[0] > w[2] > w[1]


def test_importance_weights_partitioning_invariant(spark):
    from rust_cdc_validator_spark.operators.corpus import importance_weights

    raw, target = _dsir_frames(spark)
    a = sorted(map(tuple, importance_weights(raw, target, buckets=64).collect()))
    b = sorted(
        map(
            tuple,
            importance_weights(raw.repartition(5), target.repartition(3), buckets=64).collect(),
        )
    )
    assert [(i, n) for i, n, _ in a] == [(i, n) for i, n, _ in b]
    assert all(abs(x[2] - y[2]) < 1e-9 for x, y in zip(a, b))


def test_importance_weights_ratio_join_is_broadcast(spark):
    from rust_cdc_validator_spark.operators.corpus import importance_weights

    raw, target = _dsir_frames(spark)
    plan = importance_weights(raw, target, buckets=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------- C4 line cleaning / chunking

def _lines_df(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_clean_lines_dedup_keeps_first_occurrence_in_order(spark):
    from rust_cdc_validator_spark.operators.corpus import clean_lines

    text = "\n".join(
        ["beta gamma delta", "alpha beta gamma", "beta gamma delta", "zeta eta theta"]
    )
    (row,) = clean_lines(_lines_df(spark, text), min_words=1).collect()
    assert row["n_lines"] == 4 and row["n_lines_kept"] == 3
    assert row["text_clean"].split("\n") == [
        "beta gamma delta",
        "alpha beta gamma",
        "zeta eta theta",
    ]


def test_clean_lines_min_words_and_blank_lines(spark):
    from rust_cdc_validator_spark.operators.corpus import clean_lines

    text = "one two three\nshort\n\nfour five six seven"
    (row,) = clean_lines(_lines_df(spark, text), min_words=3).collect()
    assert row["text_clean"].split("\n") == ["one two three", "four five six seven"]
    assert row["n_lines"] == 4 and row["n_lines_kept"] == 2


def test_clean_lines_terminal_punct_opt_in(spark):
    from rust_cdc_validator_spark.operators.corpus import clean_lines

    text = 'ends with period.\nno punctuation here\nquoted end."\nasks a question?'
    (row,) = clean_lines(
        _lines_df(spark, text), min_words=1, require_terminal_punct=True
    ).collect()
    assert row["text_clean"].split("\n") == [
        "ends with period.",
        'quoted end."',
        "asks a question?",
    ]


def test_clean_lines_no_dedup_flag(spark):
    from rust_cdc_validator_spark.operators.corpus import clean_lines

    text = "same line here\nsame line here"
    (row,) = clean_lines(_lines_df(spark, text), min_words=1, dedup=False).collect()
    assert row["n_lines_kept"] == 2


def test_chunk_documents_coverage_and_overlap(spark):
    from rust_cdc_validator_spark.operators.corpus import chunk_documents

    words = [f"w{i}" for i in range(100)]
    df = _lines_df(spark, " ".join(words))
    rows = sorted(
        chunk_documents(df, max_tokens=32, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts at 1, 25, 49, 73 (while start <= 100-8=92) → 4 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    chunks = [r["chunk_text"].split(" ") for r in rows]
    assert all(len(c) == 32 for c in chunks[:3]) and len(chunks[3]) == 28
    # consecutive chunks share exactly the 8-token overlap
    for a, b in zip(chunks, chunks[1:]):
        assert a[-8:] == b[:8]
    # every token covered, in order
    seen = chunks[0] + [w for c in chunks[1:] for w in c[8:]]
    assert seen == words


def test_chunk_documents_short_doc_single_chunk(spark):
    from rust_cdc_validator_spark.operators.corpus import chunk_documents

    df = _lines_df(spark, "just a few words")
    rows = chunk_documents(df, max_tokens=32, overlap=8).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_tokens"] == 4 and rows[0]["chunk_idx"] == 0


def test_chunk_documents_no_suffix_subset_chunks(spark):
    from rust_cdc_validator_spark.operators.corpus import chunk_documents

    # n=34, max=32, overlap=8 → starts while s <= 26: 1, 25 → second chunk
    # (25..34) is 10 tokens, NOT a subset of the first (1..32)
    df = _lines_df(spark, " ".join(f"t{i}" for i in range(34)))
    rows = sorted(
        chunk_documents(df, max_tokens=32, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert [r["chunk_tokens"] for r in rows] == [32, 10]


def test_chunk_documents_validates_overlap(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import chunk_documents

    df = _lines_df(spark, "a b c")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# scrub_boilerplate_lines / boilerplate_line_stats (cross-document dedup)
# ---------------------------------------------------------------------------


def _boiler_docs(spark):
    banner = "SITE NAV header banner"
    rows = [
        (1, banner + "\nunique content of doc one\nmore doc one text"),
        (2, banner + "\ncompletely different body two"),
        (3, "doc three has no banner at all\nsecond line of three"),
        (4, banner + "\nshared tail line\nbody of document four"),
        (5, "shared tail line\nbody of document five"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_boilerplate_removes_corpus_wide_lines(spark):
    from rust_cdc_validator_spark.operators.corpus import scrub_boilerplate_lines

    out = {
        r["doc_id"]: r
        for r in scrub_boilerplate_lines(_boiler_docs(spark), min_doc_freq=3).collect()
    }
    # banner appears in 3 docs -> dropped everywhere; "shared tail line"
    # appears in only 2 docs -> kept at min_doc_freq=3
    assert out[1]["text_clean"] == "unique content of doc one\nmore doc one text"
    assert out[2]["text_clean"] == "completely different body two"
    assert out[3]["text_clean"] == out[3]["text"]  # untouched doc passes through
    assert out[4]["text_clean"] == "shared tail line\nbody of document four"
    assert (out[1]["n_lines"], out[1]["n_lines_kept"]) == (3, 2)


def test_scrub_boilerplate_min_doc_freq_2_and_keep_first(spark):
    from rust_cdc_validator_spark.operators.corpus import scrub_boilerplate_lines

    docs = _boiler_docs(spark)
    out = {
        r["doc_id"]: r for r in scrub_boilerplate_lines(docs, min_doc_freq=2).collect()
    }
    # at threshold 2 the shared tail also goes
    assert out[4]["text_clean"] == "body of document four"
    assert out[5]["text_clean"] == "body of document five"

    first = {
        r["doc_id"]: r
        for r in scrub_boilerplate_lines(docs, min_doc_freq=2, keep_first=True).collect()
    }
    # globally-first occurrence (doc 1 pos 0 for banner, doc 4 pos 1 for tail)
    assert first[1]["text_clean"].startswith("SITE NAV header banner\n")
    assert first[2]["text_clean"] == "completely different body two"
    assert first[4]["text_clean"] == "shared tail line\nbody of document four"
    assert first[5]["text_clean"] == "body of document five"


def test_scrub_boilerplate_partition_invariant_and_hash_keyed(spark):
    from rust_cdc_validator_spark.operators.corpus import scrub_boilerplate_lines

    docs = _boiler_docs(spark)
    a = scrub_boilerplate_lines(docs, min_doc_freq=2)
    b = scrub_boilerplate_lines(docs.repartition(7), min_doc_freq=2)
    key = lambda rows: sorted((r["doc_id"], r["text_clean"]) for r in rows)
    assert key(a.collect()) == key(b.collect())
    # counting/aggregation is keyed on the 8-byte xxhash64, never line text
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan.lower()


def test_scrub_boilerplate_rejects_min_doc_freq_1(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import scrub_boilerplate_lines

    with pytest.raises(ValueError):
        scrub_boilerplate_lines(_boiler_docs(spark), min_doc_freq=1)


def test_boilerplate_line_stats_histogram(spark):
    from rust_cdc_validator_spark.operators.corpus import boilerplate_line_stats

    rows = {
        r["doc_freq"]: r for r in boilerplate_line_stats(_boiler_docs(spark)).collect()
    }
    # banner: df=3 occ=3; shared tail: df=2 occ=2; 7 unique lines: df=1
    assert rows[3]["n_distinct_lines"] == 1 and rows[3]["n_occurrences"] == 3
    assert rows[2]["n_distinct_lines"] == 1 and rows[2]["n_occurrences"] == 2
    assert rows[1]["n_distinct_lines"] == 7 and rows[1]["n_occurrences"] == 7


# ---------------------------------------------------------------------------
# shuffle_corpus (deterministic seeded epoch shuffle)
# ---------------------------------------------------------------------------


def test_shuffle_corpus_deterministic_and_partition_invariant(spark):
    from rust_cdc_validator_spark.operators.corpus import shuffle_corpus

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    order = lambda df: sorted(
        (r["shard"], r["shard_pos"], r["doc_id"]) for r in df.collect()
    )
    a = order(shuffle_corpus(docs, seed=7, num_shards=8))
    b = order(shuffle_corpus(docs.repartition(13), seed=7, num_shards=8))
    assert a == b  # same permutation regardless of input partitioning


def test_shuffle_corpus_valid_dense_positions_and_seed_sensitivity(spark):
    from rust_cdc_validator_spark.operators.corpus import shuffle_corpus

    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    rows = shuffle_corpus(docs, seed=0, num_shards=4).collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))  # dense 1..n

    perm0 = [
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (r["shard"], r["shard_pos"]))
    ]
    rows1 = shuffle_corpus(docs, seed=1, num_shards=4).collect()
    perm1 = [
        r["doc_id"]
        for r in sorted(rows1, key=lambda r: (r["shard"], r["shard_pos"]))
    ]
    assert perm0 != perm1  # reseeding gives a fresh epoch order
    assert sorted(perm0) == sorted(perm1) == list(range(100))  # permutations


def test_shuffle_corpus_default_shards_scale_with_parallelism(spark):
    from rust_cdc_validator_spark.operators.corpus import shuffle_corpus

    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    out = shuffle_corpus(docs)  # derived default
    shards_max = out.agg(F.max("shard")).collect()[0][0]
    par = spark.sparkContext.defaultParallelism
    expect = 1 << (max(16, 4 * par) - 1).bit_length()
    assert shards_max < expect  # assignments stay inside the derived range

    import pytest

    with pytest.raises(ValueError):
        shuffle_corpus(docs, num_shards=12)  # odd factor: not md5-splittable


# ---------------------------------------------------------------------------
# apply_mixture (per-source resampling: downsample + replicate)
# ---------------------------------------------------------------------------


def _mix_docs(spark, n=400):
    rows = [(i, "srcA" if i % 2 == 0 else "srcB") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_apply_mixture_downsamples_and_replicates(spark):
    from rust_cdc_validator_spark.operators.corpus import apply_mixture

    out = apply_mixture(_mix_docs(spark), {"srcA": 0.5, "srcB": 2.5}).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
    a_docs = [d for d in by_doc if d % 2 == 0]
    b_docs = [d for d in by_doc if d % 2 == 1]
    # srcA: kept docs appear exactly once, ~half survive
    assert all(by_doc[d] == [0] for d in a_docs)
    assert 0.35 < len(a_docs) / 200 < 0.65
    # srcB: every doc appears 2 or 3 times, mean ~2.5
    assert all(sorted(by_doc[d]) in ([0, 1], [0, 1, 2]) for d in b_docs)
    assert len(b_docs) == 200  # w >= 1 never drops a doc
    n_copies = sum(len(v) for d, v in by_doc.items() if d % 2 == 1)
    assert 2.3 < n_copies / 200 < 2.7


def test_apply_mixture_deterministic_and_weightframe_equivalent(spark):
    from rust_cdc_validator_spark.operators.corpus import apply_mixture

    docs = _mix_docs(spark, 100)
    wdf = spark.createDataFrame(
        [("srcA", 0.25), ("srcB", 1.75)], "source string, weight double"
    )
    key = lambda df: sorted((r["doc_id"], r["copy_id"]) for r in df.collect())
    a = key(apply_mixture(docs, {"srcA": 0.25, "srcB": 1.75}))
    b = key(apply_mixture(docs.repartition(9), wdf))
    assert a == b  # dict == DataFrame weights; partition-invariant


def test_apply_mixture_broadcasts_weights(spark):
    from rust_cdc_validator_spark.operators.corpus import apply_mixture

    out = apply_mixture(_mix_docs(spark, 50), {"srcA": 1.0, "srcB": 1.0})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (map-side scale path)
# ---------------------------------------------------------------------------


def _contam_fixture(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro words alpha beta gamma delta epsilon zeta eta theta tail"),
            (2, "clean document with no overlapping benchmark content anywhere"),
            (3, "more filler then alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    return train, bench


def test_bloom_contamination_matches_exact_join(spark):
    from rust_cdc_validator_spark.operators.corpus import (
        build_benchmark_bloom,
        contamination_check,
        contamination_check_bloom,
    )

    train, bench = _contam_fixture(spark)
    bloom = build_benchmark_bloom(bench, shingle_n=8, fpp=1e-6)
    got = {
        r["doc_id"]: r["n_flagged_shingles"]
        for r in contamination_check_bloom(train, bloom).collect()
    }
    exact = {
        r["doc_id"]: r["n_contaminated_shingles"]
        for r in contamination_check(train, bench, shingle_n=8).collect()
    }
    # at fpp=1e-6 on a tiny corpus: no false positives -> identical output
    assert got == exact and set(got) == {1, 3}


def test_bloom_contamination_partition_invariant_and_zero_shuffle(spark):
    from rust_cdc_validator_spark.operators.corpus import (
        build_benchmark_bloom,
        contamination_check_bloom,
    )

    train, bench = _contam_fixture(spark)
    bloom = build_benchmark_bloom(bench, fpp=1e-6)
    a = sorted(
        (r["doc_id"], r["n_flagged_shingles"])
        for r in contamination_check_bloom(train, bloom).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_flagged_shingles"])
        for r in contamination_check_bloom(train.repartition(5), bloom).collect()
    )
    assert a == b
    # the probe is one scan: no Exchange in the filtered plan
    plan = (
        contamination_check_bloom(train, bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_bloom_empty_benchmark_and_size_guard(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import (
        build_benchmark_bloom,
        contamination_check_bloom,
    )

    train, bench = _contam_fixture(spark)
    empty = bench.filter("doc_id < 0")
    bloom = build_benchmark_bloom(empty)
    assert bloom.n == 0
    assert contamination_check_bloom(train, bloom).count() == 0
    with pytest.raises(ValueError):
        build_benchmark_bloom(bench, max_distinct_shingles=1)


# ---------------------------------------------------------------------------
# curriculum_order (threshold phases + sharded in-phase shuffle)
# ---------------------------------------------------------------------------


def test_curriculum_order_phases_and_dense_in_phase_positions(spark):
    from rust_cdc_validator_spark.operators.corpus import curriculum_order

    docs = spark.createDataFrame(
        [(i, i / 100.0) for i in range(100)], "doc_id long, score double"
    )
    rows = curriculum_order(
        docs, "score", thresholds=[0.25, 0.5, 0.75], num_shards=4
    ).collect()
    for r in rows:  # phase = count of thresholds <= score
        expect = sum(r["score"] >= t for t in (0.25, 0.5, 0.75))
        assert r["phase"] == expect
    by = {}
    for r in rows:
        by.setdefault((r["phase"], r["shard"]), []).append(r["shard_pos"])
    for poss in by.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_curriculum_order_partition_invariant_and_validated(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import curriculum_order

    docs = spark.createDataFrame(
        [(i, (i % 7) / 7.0) for i in range(60)], "doc_id long, score double"
    )
    key = lambda df: sorted(
        (r["doc_id"], r["phase"], r["shard"], r["shard_pos"])
        for r in df.collect()
    )
    a = key(curriculum_order(docs, "score", [0.5], seed=3, num_shards=8))
    b = key(
        curriculum_order(
            docs.repartition(11), "score", [0.5], seed=3, num_shards=8
        )
    )
    assert a == b
    with pytest.raises(ValueError):
        curriculum_order(docs, "score", [])
    with pytest.raises(ValueError):
        curriculum_order(docs, "score", [0.9, 0.1])  # not ascending


# ---------------------------------------------------------------------------
# lm_perplexity (hashed bigram LM quality signal)
# ---------------------------------------------------------------------------


def test_lm_perplexity_ranks_target_like_text_lower(spark):
    from rust_cdc_validator_spark.operators.corpus import lm_perplexity

    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "zxq vbn mlk poi uyt rew qas dfg hjk"),  # out-of-domain
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_perplexity(target, score).collect()}
    assert out[100]["log_ppl"] < out[101]["log_ppl"]
    assert out[100]["n_tokens"] == 9
    import math

    assert all(math.isfinite(r["log_ppl"]) for r in out.values())


def test_lm_perplexity_single_token_and_invariance(spark):
    from rust_cdc_validator_spark.operators.corpus import lm_perplexity

    target = spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(10, "alpha"), (11, "alpha beta gamma")], "doc_id long, text string"
    )
    a = {
        r["doc_id"]: (r["n_tokens"], round(r["log_ppl"], 6))
        for r in lm_perplexity(target, score).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], round(r["log_ppl"], 6))
        for r in lm_perplexity(
            target.repartition(5), score.repartition(3)
        ).collect()
    }
    assert a == b
    assert a[10][0] == 1  # single-token doc: unigram-only term


def test_lm_perplexity_validation(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import lm_perplexity

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        lm_perplexity(df, df, beta=2.0)
    with pytest.raises(ValueError):
        lm_perplexity(df, df, alpha=0.0)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark):
    from rust_cdc_validator_spark.operators.corpus import leakage_safe_split

    # 200 clusters of 3 docs each, all sharing the cluster root
    rows = [(c * 10 + i, c) for c in range(200) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, root long")
    out = leakage_safe_split(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, cluster_col="root"
    ).collect()
    by_root = {}
    for r in out:
        by_root.setdefault(r["root"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_root.values())  # no cluster straddles
    shares = {}
    for r in out:
        shares[r["split"]] = shares.get(r["split"], 0) + 1
    assert shares["train"] / len(out) > 0.7  # ratios roughly honored
    assert set(shares) == {"train", "val", "test"}


def test_leakage_safe_split_deterministic_and_validated(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import leakage_safe_split

    df = spark.createDataFrame(
        [(i, i) for i in range(100)], "doc_id long, root long"
    )
    key = lambda d: sorted((r["doc_id"], r["split"]) for r in d.collect())
    a = key(leakage_safe_split(df, {"train": 0.9, "test": 0.1}, seed=1))
    b = key(
        leakage_safe_split(df.repartition(7), {"train": 0.9, "test": 0.1}, seed=1)
    )
    assert a == b
    c = key(leakage_safe_split(df, {"train": 0.9, "test": 0.1}, seed=2))
    assert a != c  # reseeding reassigns
    with pytest.raises(ValueError):
        leakage_safe_split(df, {"train": 0.5, "test": 0.4})  # sums to 0.9
    with pytest.raises(ValueError):
        leakage_safe_split(df, {"train": 1.0})  # single split


def test_lm_perplexity_broadcast_joins_and_jvm_only(spark):
    from rust_cdc_validator_spark.operators.corpus import lm_perplexity

    target = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(100 + i, "alpha beta gamma") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        lm_perplexity(target, score)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # model relations broadcast; scoring never sort-merge-joins or drops
    # into a Python stage
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan and "Python" not in plan


def test_source_overlap_detects_mirrored_sources(spark):
    from rust_cdc_validator_spark.operators.corpus import source_overlap

    base = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "srcA", base),
        (2, "srcB", base),                      # full mirror of srcA
        (3, "srcC", "totally different words with no overlap whatsoever "
                    "in any of the shingles present here today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(docs, shingle_n=8).collect()
    }
    ab = out[("srcA", "srcB")]
    assert ab["jaccard"] == 1.0 and ab["shared_shingles"] == 5  # 12-7 shingles
    assert ("srcA", "srcC") not in out  # zero overlap pairs absent


def test_contamination_ratio_distinguishes_quote_from_copy(spark):
    from rust_cdc_validator_spark.operators.corpus import contamination_ratio

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    quote = ("many original words surround a short quote alpha beta gamma "
             "delta epsilon zeta eta theta and then much more novel text "
             "follows afterwards for a while longer here")
    copy = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    train = spark.createDataFrame(
        [(1, quote), (2, copy)], "doc_id long, text string"
    )
    strict = {
        r["doc_id"]: r
        for r in contamination_ratio(train, bench, min_ratio=0.5).collect()
    }
    assert set(strict) == {2}  # the near-copy, not the quoting doc
    assert strict[2]["overlap_ratio"] == 1.0
    lax = {
        r["doc_id"]: r["overlap_ratio"]
        for r in contamination_ratio(train, bench, min_ratio=0.0).collect()
    }
    assert set(lax) == {1, 2} and lax[1] < 0.5

    import pytest

    with pytest.raises(ValueError):
        contamination_ratio(train, bench, min_ratio=1.5)


def test_hashed_doc_vectors_bridge_to_knn(spark):
    """The hashing-trick vectors compose with the vector operators: near-
    identical texts land near each other, disjoint texts do not."""
    from rust_cdc_validator_spark.operators.corpus import hashed_doc_vectors
    from rust_cdc_validator_spark.operators.similarity import brute_force_topk

    rows = [
        (1, "spark shuffles partitions into exchanges during wide joins"),
        (2, "spark shuffles partitions into exchanges during wide joins fast"),
        (3, "completely unrelated cooking recipe with butter flour and sugar"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_doc_vectors(docs, dim=64)
    assert vecs.count() == 3
    row = vecs.filter("doc_id = 1").collect()[0]["vector"]
    assert len(row) == 64
    assert abs(sum(x * x for x in row) - 1.0) < 1e-9  # unit norm
    nn = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(
            vecs, vecs, id_col="doc_id", vec_col="vector", k=1
        ).collect()
    }
    assert nn[1] == 2 and nn[2] == 1  # the near-dup pair finds each other


def test_hashed_doc_vectors_deterministic_and_validated(spark):
    import pytest
    from rust_cdc_validator_spark.operators.corpus import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(i, f"token{i % 7} alpha beta gamma token{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    key = lambda df: sorted(
        (r["doc_id"], tuple(round(x, 9) for x in r["vector"]))
        for r in df.collect()
    )
    assert key(hashed_doc_vectors(docs, dim=32)) == key(
        hashed_doc_vectors(docs.repartition(9), dim=32)
    )
    with pytest.raises(ValueError):
        hashed_doc_vectors(docs, dim=100)  # does not divide 4096


def test_hashed_doc_vectors_zero_norm_passthrough(spark):
    """ADVICE r9: signed hashing can cancel to an all-zero sparse vector
    ("aab" and "aau" share bucket 34 at dim=64 with opposite signs) — the
    normalize path must pass the zero vector through unchanged instead of
    dividing by the zero norm (ANSI DIVIDE_BY_ZERO crash)."""
    from rust_cdc_validator_spark.operators.corpus import hashed_doc_vectors

    docs = spark.createDataFrame(
        [(1, "aab aau"), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    got = {r["doc_id"]: list(r["vector"]) for r in
           hashed_doc_vectors(docs, dim=64).collect()}
    assert got[1] == [0.0] * 64  # cancelled doc survives as the zero vector
    import math
    assert abs(math.sqrt(sum(x * x for x in got[2])) - 1.0) < 1e-9


def test_bloom_empty_branch_preserves_id_type(spark):
    """ADVICE r6: the empty-bloom early return must carry the INPUT's id
    type (string ids here), not a hardcoded long, so it unions/joins with
    the non-empty path's output."""
    from rust_cdc_validator_spark.operators.corpus import (
        build_benchmark_bloom,
        contamination_check_bloom,
    )

    train = spark.createDataFrame(
        [("a", "some text here"), ("b", "other words")],
        "doc_id string, text string",
    )
    empty_bench = spark.createDataFrame([], "doc_id string, text string")
    bloom = build_benchmark_bloom(empty_bench, shingle_n=3)
    out = contamination_check_bloom(train, bloom, id_col="doc_id")
    assert out.count() == 0
    assert dict(out.dtypes)["doc_id"] == "string"
    # and the non-empty path agrees on the schema
    bench = spark.createDataFrame(
        [("q", "some text here exactly")], "doc_id string, text string"
    )
    bloom2 = build_benchmark_bloom(bench, shingle_n=3)
    out2 = contamination_check_bloom(train, bloom2, id_col="doc_id")
    assert out.schema == out2.schema


def test_apply_mixture_missing_weight_modes(spark):
    """ADVICE r6: unlisted sources are dropped by default (documented
    whitelist semantics); missing_weight=1.0 keeps them unchanged via a
    left join."""
    from rust_cdc_validator_spark.operators.corpus import apply_mixture

    docs = spark.createDataFrame(
        [(i, "web" if i % 2 else "books") for i in range(20)],
        "doc_id long, source string",
    )
    only_web = {"web": 1.0}
    dropped = apply_mixture(docs, only_web)
    assert {r["source"] for r in dropped.collect()} == {"web"}
    kept = apply_mixture(docs, only_web, missing_weight=1.0)
    assert kept.count() == 20
    assert {r["source"] for r in kept.collect()} == {"web", "books"}


def test_neardup_overflow_report_surfaces_planted_hot_band(spark):
    """r7 (VERDICT #8): the composed near-dup pipeline inherits MinHash's
    hot-bucket cap silently; the companion report must surface a planted
    hot band measured on the SAME post-gate post-exact-dedup relation the
    pipeline's MinHash stage sees."""
    from rust_cdc_validator_spark.operators.corpus import (
        neardup_overflow_report,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to find some tasty food"
    )
    # 30 NEAR-duplicates (distinct suffix → they survive exact dedup) that
    # share nearly all shingles → same LSH buckets in most bands
    rows = [(i, f"{base} variant{i}") for i in range(30)]
    rows += [(100 + i, f"totally different document number {i} with other "
              f"unique words sprinkled liberally throughout the text body "
              f"for the gate to accept it happily") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    hot = neardup_overflow_report(
        docs, min_chars=50, min_stopwords=1, max_bucket_size=10
    )
    stats = hot.collect()
    assert stats, "planted hot band must appear in the report"
    assert all(r["population"] > 10 for r in stats)
    # MinHash variance can route a variant elsewhere in some bands —
    # the bulk of the planted cluster must still surface
    assert max(r["population"] for r in stats) >= 25

    # raising the cap above the planted population empties the report
    assert (
        neardup_overflow_report(
            docs, min_chars=50, min_stopwords=1, max_bucket_size=50
        ).count()
        == 0
    )

    # and identical copies do NOT show up: exact dedup collapses them
    # before the band stage (the relation measured is post-exact-dedup)
    copies = spark.createDataFrame(
        [(i, base) for i in range(30)], "doc_id long, text string"
    )
    assert (
        neardup_overflow_report(
            copies, min_chars=50, min_stopwords=1, max_bucket_size=10
        ).count()
        == 0
    )


def test_clean_lines_long_doc_stays_linear_enough(spark):
    """r7 plan pin: the line array and per-line hashes are materialized
    below the HOF lambdas (an inline split re-evaluates per element —
    O(n_lines^2 * line_len)), and first-occurrence compares 8-byte hashes.
    A planted 5k-line doc must clean promptly and correctly."""
    import time

    from rust_cdc_validator_spark.operators.corpus import clean_lines

    lines = [f"this is unique content line number {i} ok" for i in range(5000)]
    lines.insert(1000, lines[0])  # one duplicate to exercise dedup
    doc = "\n".join(lines)
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    t0 = time.monotonic()
    row = clean_lines(df, min_words=3).collect()[0]
    elapsed = time.monotonic() - t0
    assert row["n_lines"] == 5001
    assert row["n_lines_kept"] == 5000  # the duplicate dropped
    assert row["text_clean"].splitlines()[0] == lines[0]
    assert elapsed < 30, f"clean_lines took {elapsed:.1f}s on a 5k-line doc"


def test_tfidf_keywords_hand_checked(spark):
    import math

    from rust_cdc_validator_spark.operators.corpus import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rnk"]): r.asDict()
        for r in tfidf_keywords(docs, k=2).collect()
    }
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    top0 = out[(0, 1)]
    assert top0["token"] == "apple" and top0["tf"] == 2 and top0["df_docs"] == 1
    assert top0["tfidf_r"] == round(2 * math.log(3.0), 6)
    assert out[(0, 2)]["token"] == "banana"
    # doc 2: cherry tf=2 df=2 -> 2*ln(1.5)=0.81; durian tf=1 df=1 -> ln(3)=1.10
    assert out[(2, 1)]["token"] == "durian"
    assert out[(2, 2)]["token"] == "cherry"
    # n_docs passed explicitly skips the count job and changes nothing
    got = {
        (r["doc_id"], r["rnk"]): r["token"]
        for r in tfidf_keywords(docs, k=2, n_docs=3).collect()
    }
    assert got == {k: v["token"] for k, v in out.items()}


def test_shard_mixing_entropy_bounds(spark):
    import math

    from rust_cdc_validator_spark.operators.corpus import shard_mixing_report

    # single-source corpus: entropy exactly 0 in every shard
    mono = spark.createDataFrame(
        [(i, "x", "web") for i in range(64)], "doc_id long, text string, source string"
    )
    rows = shard_mixing_report(mono, num_shards=4).collect()
    assert rows and all(r["source_entropy_r"] == 0.0 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 64
    # two balanced sources: entropy can never exceed ln(2)
    duo = spark.createDataFrame(
        [(i, "x", "web" if i % 2 else "books") for i in range(256)],
        "doc_id long, text string, source string",
    )
    rows = shard_mixing_report(duo, num_shards=4).collect()
    assert all(0.0 <= r["source_entropy_r"] <= math.log(2.0) + 1e-9 for r in rows)
    # the deterministic shuffle mixes: every shard should see both sources
    assert all(r["n_sources"] == 2 for r in rows)


def test_ngram_novelty_extremes(spark):
    from rust_cdc_validator_spark.operators.corpus import ngram_novelty

    a = spark.createDataFrame(
        [(0, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    b_same = spark.createDataFrame(
        [(1, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    b_disjoint = spark.createDataFrame(
        [(2, "completely different words appear here now")],
        "doc_id long, text string",
    )
    same = ngram_novelty(a, b_same).collect()[0]
    assert same["n_novel"] == 0 and same["novelty_r"] == 0.0
    disj = ngram_novelty(a, b_disjoint).collect()[0]
    assert disj["n_novel"] == disj["n_new_ngrams"] and disj["novelty_r"] == 1.0


def test_ngram_novelty_empty_new_side_defined_zeros(spark):
    from rust_cdc_validator_spark.operators.corpus import ngram_novelty

    a = spark.createDataFrame(
        [(0, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = ngram_novelty(a, empty).collect()[0]
    assert row["n_new_ngrams"] == 0
    assert row["n_novel"] == 0
    assert row["novelty_r"] == 0.0


def test_length_bucket_batches_bands_and_caps(spark):
    from rust_cdc_validator_spark.operators.corpus import length_bucket_batches

    rows = [(i, n) for i, n in enumerate([1, 2, 3, 4, 5, 8, 9, 16, 17, 100])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = length_bucket_batches(df, batch_size=2, shards=1).collect()
    by_id = {r["doc_id"]: r for r in out}
    # bucket = ceil(log2(len)): 1->0, 2->1, (3,4)->2, (5,8)->3, (9,16)->4, ...
    want = {0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4, 8: 5, 9: 7}
    assert {i: by_id[i]["bucket"] for i in want} == want
    # batches respect the cap within each (shard, bucket)
    from collections import Counter

    c = Counter((r["shard"], r["bucket"], r["batch"]) for r in out)
    assert max(c.values()) <= 2
    # ids in the same bucket fill batch 0 before batch 1 (id order)
    assert by_id[2]["batch"] == 0 and by_id[3]["batch"] == 0


def test_length_bucket_batches_validates(spark):
    import pytest

    from rust_cdc_validator_spark.operators.corpus import length_bucket_batches

    df = spark.createDataFrame([(1, 4)], "doc_id long, n_tokens int")
    with pytest.raises(ValueError, match="batch_size"):
        length_bucket_batches(df, batch_size=0)


def test_stratified_kfold_exact_balance(spark):
    from rust_cdc_validator_spark.operators.corpus import stratified_kfold

    rows = [(i, "s%d" % (i % 3)) for i in range(101)]  # strata of 34/34/33
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = stratified_kfold(df, k=5, strata_cols=["src"]).collect()
    per = {}
    for r in out:
        per.setdefault(r["src"], {}).setdefault(r["fold"], 0)
        per[r["src"]][r["fold"]] += 1
    for src, folds in per.items():
        assert set(folds) <= set(range(5))
        sizes = [folds.get(f, 0) for f in range(5)]
        assert max(sizes) - min(sizes) <= 1, (src, sizes)


def test_stratified_kfold_deterministic_and_seeded(spark):
    from rust_cdc_validator_spark.operators.corpus import stratified_kfold

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2)) for i in range(40)], "doc_id long, src string"
    )
    a = {r["doc_id"]: r["fold"] for r in stratified_kfold(df, 4, strata_cols=["src"]).collect()}
    b = {
        r["doc_id"]: r["fold"]
        for r in stratified_kfold(df.repartition(7), 4, strata_cols=["src"]).collect()
    }
    assert a == b  # partitioning-independent
    c = {
        r["doc_id"]: r["fold"]
        for r in stratified_kfold(df, 4, strata_cols=["src"], seed=1).collect()
    }
    assert a != c  # re-dealable per seed


def test_stratified_kfold_sharded_balance_bound(spark):
    from rust_cdc_validator_spark.operators.corpus import stratified_kfold

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = stratified_kfold(df, k=3, shards=4).collect()
    sizes = {}
    for r in out:
        sizes[r["fold"]] = sizes.get(r["fold"], 0) + 1
    assert sum(sizes.values()) == 300
    assert max(sizes.values()) - min(sizes.values()) <= 4  # ±shards bound


def test_stratified_kfold_validates_k(spark):
    import pytest

    from rust_cdc_validator_spark.operators.corpus import stratified_kfold

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="k must be"):
        stratified_kfold(df, k=1)


def test_char_entropy_known_values(spark):
    import math

    from rust_cdc_validator_spark.operators.corpus import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),       # single symbol: 0 bits
            (2, "abab"),       # two equiprobable: 1 bit
            (3, "abcd"),       # four equiprobable: 2 bits
            (4, ""),           # empty: defined zeros
            (5, "aab"),        # 2/3,1/3 mix
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["entropy_bits"])
        for r in char_entropy(df).collect()
    }
    assert got[1] == (4, 0.0)
    assert got[2] == (4, 1.0)
    assert got[3] == (4, 2.0)
    assert got[4] == (0, 0.0)
    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(got[5][1] - want) < 1e-12 and got[5][0] == 3


def test_domain_quota_cap(spark):
    from rust_cdc_validator_spark.operators.corpus import domain_quota_cap

    rows = [(i, "big" if i < 30 else "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = domain_quota_cap(df, "src", cap=10).collect()
    per = {}
    for r in out:
        per.setdefault(r["src"], set()).add(r["doc_id"])
    assert len(per["big"]) == 10          # capped
    assert per["small"] == set(range(30, 40))  # under quota: untouched
    # deterministic across partitionings; seeded re-deal changes the set
    again = {
        r["doc_id"]
        for r in domain_quota_cap(df.repartition(7), "src", cap=10).collect()
        if r["src"] == "big"
    }
    assert again == per["big"]
    reseeded = {
        r["doc_id"]
        for r in domain_quota_cap(df, "src", cap=10, seed=1).collect()
        if r["src"] == "big"
    }
    assert reseeded != per["big"]
    import pytest

    with pytest.raises(ValueError, match="cap"):
        domain_quota_cap(df, "src", cap=0)


# ---------------------------------------------------------------------------
# Bigram PMI (r9)
# ---------------------------------------------------------------------------

def test_bigram_pmi_matches_reference(spark):
    import math
    from collections import Counter

    from rust_cdc_validator_spark.operators.corpus import bigram_pmi

    texts = [
        "strong tea strong tea weak tea",
        "strong coffee weak coffee strong tea",
        "weak tea weak coffee strong tea",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in bigram_pmi(df, min_count=1, top_k=100).collect()
    ]
    bigrams = Counter()
    for t in texts:
        ws = t.split(" ")
        bigrams.update(zip(ws, ws[1:]))
    n_tot = sum(bigrams.values())
    n1, n2 = Counter(), Counter()
    for (a, b), c in bigrams.items():
        n1[a] += c
        n2[b] += c
    want = {
        (a, b): (c, round(math.log(c * n_tot / (n1[a] * n2[b])), 6))
        for (a, b), c in bigrams.items()
    }
    assert {(a, b): (c, p) for a, b, c, p in got} == want
    # ordering: ratio descending, ties by words
    ratios = [
        (-(c * n_tot / (n1[a] * n2[b])), a, b) for a, b, c, _ in got
    ]
    assert ratios == sorted(ratios)


def test_bigram_pmi_min_count_and_short_docs(spark):
    from rust_cdc_validator_spark.operators.corpus import bigram_pmi

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "solo"), (2, "")],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): r["n_pair"]
           for r in bigram_pmi(df, min_count=2, top_k=10).collect()}
    assert got == {("a", "b"): 2}  # "b a" occurs once -> screened; short docs no-op
