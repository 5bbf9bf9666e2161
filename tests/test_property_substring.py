"""Property-based pinning of exact-substring dedup (ExactSubstr family):
for ANY small corpus over a tiny alphabet (dense with repeats), the
distributed hash-windowed operator must agree with a brute-force Python
model — dup windows found by literal text comparison, coverage by literal
interval union, scrub by literal token masking."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from rust_cdc_validator_spark.session import get_spark
        _spark = get_spark("hypothesis-substr", shuffle_partitions=4)
    return _spark


W = 3
# 3-token windows over a 4-letter alphabet: collisions on text are common,
# xxhash64 collisions impossible to stumble into — exactly the regime where
# the hash formulation must match the literal one
token = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(token, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=6)


def model(texts: list[str], w: int = W):
    """Brute force: windows by literal text; coverage by interval union;
    scrub by masking covered token positions."""
    wins = []  # (doc_i, pos 1-based, text)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for p in range(1, len(toks) - w + 2):
            wins.append((i, p, " ".join(toks[p - 1 : p - 1 + w])))
    from collections import Counter

    cnt = Counter(wt for _, _, wt in wins)
    out = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        dup_pos = sorted(p for (j, p, wt) in wins if j == i and cnt[wt] >= 2)
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + w))
        kept = [tok for k, tok in enumerate(toks, start=1) if k not in covered]
        out[i] = {
            "n_tokens": len(toks),
            "n_windows": max(0, len(toks) - w + 1),
            "n_dup_windows": len(dup_pos),
            "dup_covered_tokens": len(covered),
            "scrubbed": " ".join(kept),
        }
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus)
def test_substring_stats_and_scrub_match_brute_force(texts):
    from rust_cdc_validator_spark.operators.dedup import (
        exact_substring_scrub,
        exact_substring_stats,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = model(texts)
    stats = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_stats(df, "text", "doc_id", window=W).collect()
    }
    scrub = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_scrub(df, "text", "doc_id", window=W).collect()
    }
    assert set(stats) == set(want) == set(scrub)
    for i, m in want.items():
        s = stats[i]
        assert (
            s["n_tokens"],
            s["n_windows"],
            s["n_dup_windows"],
            s["dup_covered_tokens"],
        ) == (m["n_tokens"], m["n_windows"], m["n_dup_windows"], m["dup_covered_tokens"]), (i, texts)
        assert scrub[i]["scrubbed"] == m["scrubbed"], (i, texts)
        assert scrub[i]["n_removed_tokens"] == m["dup_covered_tokens"]

def test_scrub_pathological_doc_linear_in_islands():
    """Planted worst case for the keep-filter: a >=20k-token doc that is
    ~100% duplicated (dup_windows ~= doc_len). The interval-merge rewrite
    collapses the doc's thousands of duplicate windows into a single
    covered island, so the per-token check is O(len * islands) and the
    stage finishes promptly instead of O(len * dup_windows) interpreted
    comparisons (~4e8 for this doc under the old exists-over-positions
    filter)."""
    import time

    from rust_cdc_validator_spark.operators.dedup import exact_substring_scrub

    spark = _get_spark()
    # 24k tokens: one 4-token phrase repeated 6000 times; a twin doc makes
    # every window corpus-duplicated even under self-dup-only counting
    phrase = "alpha beta gamma delta"
    big = " ".join([phrase] * 6000)
    df = spark.createDataFrame(
        [(0, big), (1, big), (2, "unique tokens only here nothing repeats")],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    rows = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_scrub(df, "text", "doc_id", window=16).collect()
    }
    elapsed = time.monotonic() - t0
    # fully duplicated docs scrub to empty; the clean doc is untouched
    assert rows[0]["scrubbed"] == "" and rows[0]["n_removed_tokens"] == 24000
    assert rows[1]["scrubbed"] == ""
    assert rows[2]["n_removed_tokens"] == 0
    # generous wall bound: the old quadratic filter takes minutes here
    assert elapsed < 60, f"scrub took {elapsed:.1f}s on the planted doc"
