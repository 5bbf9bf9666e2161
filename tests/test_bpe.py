"""Distributed BPE (operators/bpe.py) vs a row-at-a-time reference
implementation of Sennrich et al. 2016's algorithm."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    bpe_token_count,
    train_bpe,
)

CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _reference_train(words, num_merges, min_pair_count=2):
    """The textbook BPE trainer: word-freq dict, most-frequent adjacent
    pair per round, ties broken (count desc, pair asc) like train_bpe."""
    freqs = Counter(words)
    vocab = {w: list(w) + [END_OF_WORD] for w in freqs}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _corpus_df(spark, words=CORPUS, per_row=3):
    rows = [
        (i, " ".join(words[i : i + per_row]))
        for i in range(0, len(words), per_row)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_matches_reference_merge_sequence(spark):
    df = _corpus_df(spark)
    got = train_bpe(df, num_merges=12)
    want = _reference_train(CORPUS, num_merges=12)
    assert got == want
    assert len(got) >= 8  # the example corpus supports a real merge chain


def test_train_partitioning_invariant(spark):
    df = _corpus_df(spark)
    a = train_bpe(df, num_merges=6)
    b = train_bpe(df.repartition(7), num_merges=6)
    assert a == b


def test_apply_roundtrips_words(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, num_merges=10)
    out = apply_bpe(df, merges).collect()
    for r in out:
        # stripping markers and joining reconstructs the lowercased text
        joined = "".join(t for t in r["bpe_tokens"])
        assert joined.replace(END_OF_WORD, " ").strip() == r["text"].lower()


def test_apply_merges_frequent_words_to_single_tokens(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, num_merges=30, min_pair_count=1)
    (row,) = apply_bpe(
        spark.createDataFrame([(0, "newest")], "doc_id long, text string"), merges
    ).collect()
    assert row["bpe_tokens"] == ["newest" + END_OF_WORD]


def test_apply_handles_unseen_and_null_text(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, num_merges=5)
    probe = spark.createDataFrame(
        [(0, "zzz"), (1, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in apply_bpe(probe, merges).collect()}
    assert rows[0] is not None and "".join(rows[0]).startswith("z")
    assert rows[1] is None


def test_token_count_column(spark):
    df = _corpus_df(spark)
    merges = train_bpe(df, num_merges=10)
    out = bpe_token_count(df, merges)
    rows = out.collect()
    assert all(r["bpe_token_count"] >= 1 for r in rows)
    assert "bpe_tokens" not in out.columns and "_bpe" not in out.columns


def test_min_pair_count_stops_early(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges = train_bpe(df, num_merges=50, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_max_vocab_rows_truncates_tail(spark):
    df = _corpus_df(spark)
    # keep only the 2 most frequent words: newest (6), low (5)
    merges_full = train_bpe(df, num_merges=4)
    merges_trunc = train_bpe(df, num_merges=4, max_vocab_rows=2)
    want = _reference_train(["newest"] * 6 + ["low"] * 5, num_merges=4)
    assert merges_trunc == want
    assert merges_trunc != merges_full or len(CORPUS) == 11


def test_batched_equals_sequential_on_fixture(spark):
    """r7: batched rounds must reproduce the sequential merge list
    EXACTLY (the prefix-batch selection is provably equivalent, ties
    included — operators/bpe.py:_exact_batch)."""
    df = _corpus_df(spark)
    seq = train_bpe(df, num_merges=16, merge_batch=1)
    bat = train_bpe(df, num_merges=16, merge_batch=16)
    assert bat == seq == _reference_train(CORPUS, 16)


def test_batched_equals_sequential_with_planted_ties(spark):
    """Adversarial tie corpus: several pairs share the top count, and an
    early merge creates a new pair whose count equals remaining
    candidates — the regimes the tie guard (rule 2) exists for."""
    words = (
        ["abab"] * 4 + ["cdcd"] * 4 + ["efef"] * 4 + ["abcd"] * 2
        + ["xyxy"] * 3 + ["aaaa"] * 4
    )
    df = _corpus_df(spark, words=words, per_row=2)
    seq = train_bpe(df, num_merges=12, merge_batch=1)
    bat = train_bpe(df, num_merges=12, merge_batch=8)
    assert bat == seq == _reference_train(words, 12)


def test_batched_round_count_drops(spark):
    """The batching lever actually batches when the top of the pair
    distribution is diverse (the Zipf bulk of a real corpus): 16 words
    over disjoint alphabets with strictly distinct pair counts collapse
    16 merges into ~1 round. (On tiny chain-y corpora where each merge
    builds on the last, the safe prefix is short and training degrades
    gracefully to the sequential loop — exactness is never traded.)"""
    from unittest.mock import patch

    import rust_cdc_validator_spark.operators.bpe as bpe_mod

    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = []
    for i in range(16):
        x, y = alphabet[2 * i], alphabet[2 * i + 1]
        words.extend([(x + y) * 2] * (100 - i))
    df = _corpus_df(spark, words=words, per_row=8)
    rounds = {"n": 0}
    orig = bpe_mod._exact_batch

    def counting(rows, budget):
        rounds["n"] += 1
        return orig(rows, budget)

    with patch.object(bpe_mod, "_exact_batch", counting):
        merges = train_bpe(df, num_merges=16, merge_batch=16)
    assert merges == _reference_train(words, 16)
    assert rounds["n"] <= 3, f"expected batched rounds, got {rounds['n']}"


def test_batched_matches_reference_on_random_corpora(spark):
    """Property check of the batching exactness theorem: for random dense
    corpora over a 3-letter alphabet (maximally tie- and interaction-
    prone), the batched trainer reproduces the textbook sequential merge
    list exactly."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    corpus = st.lists(word, min_size=1, max_size=10)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(corpus)
    def check(words):
        df = _corpus_df(spark, words=words, per_row=4)
        bat = train_bpe(df, num_merges=5, merge_batch=4, min_pair_count=2)
        assert bat == _reference_train(words, 5)

    check()
