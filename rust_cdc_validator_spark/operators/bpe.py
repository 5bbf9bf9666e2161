"""Distributed byte-pair-encoding: train a merge table on a corpus, apply
it, and count tokens — the token-accounting layer a training-data pipeline
needs (sequence packing, mixture budgets, contamination windows all count
in TOKENS, and whitespace counts drift from real tokenizer counts).

Published recipe (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units", arXiv:1508.07909): BPE training operates
on the WORD-FREQUENCY table, not the corpus — count each distinct word
once, then iteratively merge the most frequent adjacent symbol pair.

Spark shape:

* the corpus is scanned ONCE to build (word, freq) — map-side partial
  counts collapse repeated words before the one shuffle;
* every merge round runs on the words relation (vocabulary-sized, orders
  of magnitude smaller than the corpus): one pair-count aggregation
  (explode adjacent pairs weighted by freq → groupBy → sum → top-1 to the
  driver — a bounded single-row collect) plus one map-side fold applying
  the merge. Round cost ∝ |vocab|, never ∝ corpus;
* iterative lineage is cut with localCheckpoint every few rounds (same
  contract as ``dedup.connected_components``);
* ``apply_bpe`` broadcasts the merge list and runs the classic greedy
  merge loop per word in an Arrow-batched pandas UDF — the right tool:
  per-symbol folds over long merge tables are Python-loop-shaped, and the
  batch transfer amortizes it. A word-level LRU memo inside each batch
  collapses repeated words (Zipf makes this the common case).

At 100 TB: training cost is dominated by the single corpus scan; the
merge rounds touch only the vocabulary (cap it with ``max_vocab_rows`` on
truly unbounded vocabularies — a standard BPE practicality, frequency-
truncating the long tail before the loop).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: marker appended to each word so merges can't cross word boundaries and
#: detokenization is exact (Sennrich's </w>).
END_OF_WORD = "</w>"

_CHECKPOINT_EVERY = 8


def _word_freqs(df: DataFrame, text_col: str, max_vocab_rows: int | None) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    wf = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_vocab_rows is not None:
        # frequency-truncate the tail deterministically (freq desc, word asc)
        wf = wf.orderBy(F.col("freq").desc(), F.col("word")).limit(max_vocab_rows)
    return wf


def _symbolize(wf: DataFrame) -> DataFrame:
    # word → array of single-char symbols + END_OF_WORD
    sym = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
    )
    return wf.select("word", "freq", sym.alias("syms"))


def _merge_fold(a: str, b: str):
    """Map-side left-to-right fold replacing adjacent (a, b) with a+b —
    the exact sequential semantics of the reference BPE merge (an element
    consumed by a merge can't start another)."""
    merged = a + b
    empty = F.array().cast("array<string>")

    def step(acc, cur):
        last = F.element_at(acc, -1)
        hit = (F.size(acc) > 0) & (last == F.lit(a)) & (cur == F.lit(b))
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(cur)))

    return lambda syms: F.aggregate(syms, empty, step)


def _exact_batch(
    rows: list, budget: int
) -> list[tuple[str, str]]:
    """Select the longest prefix of the count-sorted candidate list that
    sequential BPE is GUARANTEED to pick in order — the exactness argument
    for batched rounds:

    1. the prefix is pairwise non-interacting (no symbol appears in two
       selected pairs), so applying its merges in list order equals
       applying them one-at-a-time with recounts: a merge only changes the
       counts of pairs sharing one of its symbols, and the new pairs it
       creates have count ≤ the old count of an interacting pair;
    2. the last selected count strictly exceeds the first EXCLUDED count
       (interacting pairs are where the prefix STOPS, never skipped), so
       every pair outside the prefix — including any pair a batch merge
       newly creates, bounded as above — stays strictly below every batch
       member and cannot win a tie under the lexicographic tiebreak.

    A single-pair batch is always exact (it is literally the sequential
    pick), so rule 2 only truncates batches of length ≥ 2.
    """
    if not rows:
        return []
    k = 1
    used = set(rows[0]["p"])
    while k < min(budget, len(rows)):
        nxt = rows[k]
        a, b = nxt["p"]["a"], nxt["p"]["b"]
        if a in used or b in used:
            break  # stop, don't skip: its post-merge count is unknown
        used.update((a, b))
        k += 1
    # tie guard (rule 2): shrink until strictly above the first excluded
    while k > 1 and k < len(rows) and rows[k - 1]["c"] == rows[k]["c"]:
        k -= 1
    return [(r["p"]["a"], r["p"]["b"]) for r in rows[:k]]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
    max_vocab_rows: int | None = 500_000,
    merge_batch: int = 16,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the ordered
    merge list [(left, right), ...]. Stops early when no adjacent pair
    reaches ``min_pair_count`` (weighted by word frequency). Ties break
    deterministically: highest count, then lexicographic (left, right) —
    partitioning-invariant training.

    Round-count economics (the actual scale limit — per-round DATA is only
    vocabulary-sized): each round costs ~2 scheduled Spark jobs of fixed
    overhead, so 64k merges one-at-a-time is ~10⁵ jobs — days of scheduler
    time independent of data size. Two levers keep real tokenizer training
    tractable, both on by default:

    * **batched rounds** (``merge_batch``): each round collects the top
      ``merge_batch + 1`` pairs (one driver-side, bounded collect) and
      applies the longest provably-safe prefix in one map-side fold —
      see :func:`_exact_batch` for why the result is EXACTLY the
      sequential merge list, ties included. Round count drops ~batch×;
      ``merge_batch=1`` is the plain sequential loop.
    * **bounded vocabulary** (``max_vocab_rows``, default 500k): BPE
      training operates on word FREQUENCIES, so truncating the long tail
      of distinct words (keep the most frequent 500k — far beyond any
      natural language's active vocabulary) bounds every round's relation
      without materially changing top pair counts. Tokenizer training on
      a frequency-truncated or sampled vocabulary is standard practice;
      pass ``None`` to disable the cap for exact small-corpus work.
    """
    if merge_batch < 1:
        raise ValueError("merge_batch must be >= 1")
    words = _symbolize(_word_freqs(df, text_col, max_vocab_rows)).persist()
    words.count()  # materialize: the corpus scan happens exactly once
    merges: list[tuple[str, str]] = []
    current = words
    since_checkpoint = 0
    try:
        while len(merges) < num_merges:
            budget = min(merge_batch, num_merges - len(merges))
            pairs = current.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            top = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.col("c").desc(), F.col("p.a"), F.col("p.b"))
                .limit(budget + 1)
                .collect()
            )
            top = [r for r in top if r["c"] >= min_pair_count]
            batch = _exact_batch(top, budget)
            if not batch:
                break
            merges.extend(batch)
            syms = F.col("syms")
            for a, b in batch:
                syms = _merge_fold(a, b)(syms)
            nxt = current.select("word", "freq", syms.alias("syms"))
            since_checkpoint += len(batch)
            if since_checkpoint >= _CHECKPOINT_EVERY:
                nxt = nxt.localCheckpoint(eager=True)
                since_checkpoint = 0
            current = nxt
    finally:
        words.unpersist()
    return merges


def _apply_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        # apply the winning merge left-to-right across the whole word,
        # mirroring the training fold's sequential semantics
        a, b = syms[best[1]], syms[best[1] + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list; appends ``out_col``
    (array<string>). Merge list is broadcast; per-batch word memoization
    makes repeated words (Zipf bulk) a dict lookup."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(m): i for i, m in enumerate(merges)}
    )
    fields = df.schema.fields
    out_schema = T.StructType(
        list(fields) + [T.StructField(out_col, T.ArrayType(T.StringType()), True)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out = []
            for text in pdf[text_col]:
                if text is None:
                    toks_out.append(None)
                    continue
                toks: list[str] = []
                for w in text.lower().split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _apply_word(w, ranks)
                    toks.extend(got)
                toks_out.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = toks_out
            yield pdf

    return df.mapInPandas(gen, out_schema)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Appends ``bpe_token_count`` — the real-token budget signal that
    whitespace counts approximate. One mapInPandas pass."""
    tok = apply_bpe(df, merges, text_col, out_col="_bpe")
    return tok.withColumn("bpe_token_count", F.size("_bpe")).drop("_bpe")
