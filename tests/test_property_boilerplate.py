"""Property test: scrub_boilerplate_lines against a brute-force Python
model on arbitrary small corpora — line content, doc counts, thresholds,
and keep_first all drawn by hypothesis."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

LINE_POOL = ["header", "nav bar", "body one", "body two", "unique x",
             "footer", "contact us", "content"]


def _model(docs, min_doc_freq, keep_first):
    """Brute-force reference: doc-freq per line; drop boilerplate
    occurrences (all, or all but the globally first by (id, pos))."""
    from collections import defaultdict

    freq = defaultdict(set)
    for did, text in docs:
        for line in text.split("\n"):
            freq[line].add(did)
    boiler = {l for l, ids in freq.items() if len(ids) >= min_doc_freq}
    first_seen = {}
    for did, text in sorted(docs):
        for pos, line in enumerate(text.split("\n")):
            if line in boiler and line not in first_seen:
                first_seen[line] = (did, pos)
    out = {}
    for did, text in docs:
        kept = []
        for pos, line in enumerate(text.split("\n")):
            if line not in boiler:
                kept.append(line)
            elif keep_first and first_seen[line] == (did, pos):
                kept.append(line)
        out[did] = "\n".join(kept)
    return out


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(LINE_POOL), min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    ),
    min_doc_freq=st.integers(min_value=2, max_value=4),
    keep_first=st.booleans(),
)
def test_scrub_boilerplate_matches_bruteforce_model(
    spark, corpus, min_doc_freq, keep_first
):
    from rust_cdc_validator_spark.operators.corpus import scrub_boilerplate_lines

    docs = [(i, "\n".join(lines)) for i, lines in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text_clean"]
        for r in scrub_boilerplate_lines(
            df, min_doc_freq=min_doc_freq, keep_first=keep_first
        ).collect()
    }
    assert got == _model(docs, min_doc_freq, keep_first)
