"""SemDeDup (operators/semdedup.py): greedy within-cell semantic dedup.

Contract under test:
* decisions equal a row-at-a-time greedy reference (the blockwise matmul
  implementation is an optimization, not a semantics change);
* planted near-duplicates are dropped with ``dup_of`` = the lowest kept id
  they duplicate;
* pinned centroids ⇒ fully partitioning-invariant output;
* the ``max_cell_size`` cap passes overflow rows through KEPT and makes the
  recall loss observable via semantic_dedup_dropped_cell_stats;
* keeper filtering is a semi-join that preserves corpus payload columns.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_validator_spark.operators.semdedup import (
    _greedy_cell_dedup,
    semantic_dedup,
    semantic_dedup_dropped_cell_stats,
    semantic_dedup_keepers,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _planted_corpus(spark, seed=7, n_base=40, dim=16, dups_of=(0, 3, 5, 5)):
    """n_base well-separated random vectors + near-copies (tiny noise) of
    chosen bases appended with higher ids."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].astype(np.float32).tolist()) for i in range(n_base)]
    for j, b in enumerate(dups_of):
        noisy = base[b] + rng.normal(scale=1e-3, size=dim)
        rows.append((n_base + j, noisy.astype(np.float32).tolist()))
    return spark.createDataFrame(rows, _SCHEMA), base


def _reference_greedy(vecs: dict[int, np.ndarray], cells: dict[int, int], threshold):
    """Row-at-a-time greedy scan per cell — the semantics oracle."""
    out = {}
    kept_by_cell: dict[int, list[int]] = {}
    for i in sorted(vecs):
        kept = kept_by_cell.setdefault(cells[i], [])
        sims = [(float(vecs[i] @ vecs[j]), j) for j in kept]
        best = max(sims) if sims else None
        if best is not None and best[0] > threshold:
            out[i] = (False, best[1])
        else:
            out[i] = (True, None)
            kept.append(i)
    return out


def test_matches_rowwise_greedy_reference(spark):
    df, _ = _planted_corpus(spark)
    dec = semantic_dedup(df, n_cells=4, threshold=0.9, seed=1).toPandas()
    vecs = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in df.toPandas().itertuples()
    }
    for k, v in vecs.items():
        vecs[k] = v / np.linalg.norm(v)
    cells = {int(r.vec_id): int(r.cell) for r in dec.itertuples()}
    ref = _reference_greedy(vecs, cells, 0.9)
    for r in dec.itertuples():
        want_keep, want_dup = ref[int(r.vec_id)]
        assert bool(r.keep) == want_keep, r
        if not want_keep:
            assert int(r.dup_of) == want_dup, r


def test_planted_duplicates_dropped_with_lowest_keeper(spark):
    df, _ = _planted_corpus(spark, dups_of=(0, 3, 5, 5))
    dec = semantic_dedup(df, n_cells=4, threshold=0.98, seed=1).toPandas()
    dropped = dec[~dec["keep"]].set_index("vec_id")
    # every planted near-copy (ids 40..43) must be dropped onto its base;
    # the second copy of base 5 (id 43) may dedup onto 5 or onto 42 —
    # whichever kept row it is most similar to — but 42 was dropped, so 5.
    assert set(dropped.index) == {40, 41, 42, 43}
    assert int(dropped.loc[40, "dup_of"]) == 0
    assert int(dropped.loc[41, "dup_of"]) == 3
    assert int(dropped.loc[42, "dup_of"]) == 5
    assert int(dropped.loc[43, "dup_of"]) == 5
    assert not dec["capped"].any()


def test_pinned_centroids_partitioning_invariant(spark):
    df, base = _planted_corpus(spark)
    rng = np.random.default_rng(0)
    cents = base[rng.choice(len(base), size=4, replace=False)]
    a = (
        semantic_dedup(df, threshold=0.9, centroids=cents)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        semantic_dedup(df.repartition(7), threshold=0.9, centroids=cents)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    cols = ["vec_id", "cell", "keep", "dup_of"]
    assert a[cols].equals(b[cols])
    assert np.allclose(
        a["max_sim"].fillna(-9).to_numpy(), b["max_sim"].fillna(-9).to_numpy()
    )


def test_cell_cap_passes_overflow_through_kept(spark):
    df, _ = _planted_corpus(spark, n_base=30, dups_of=())
    # one cell (single centroid) so the cap bites deterministically
    cents = np.ones((1, 16)) / 4.0
    dec = semantic_dedup(
        df, threshold=-1.1, centroids=cents, max_cell_size=10
    ).toPandas()
    capped = dec[dec["capped"]]
    # threshold -1.1 drops everything after the first row (any cosine
    # exceeds it) — but only within the first max_cell_size rows; the
    # overflow is kept undeduped
    assert len(capped) == 20
    assert capped["keep"].all()
    assert capped["dup_of"].isna().all()
    head = dec[~dec["capped"]].sort_values("vec_id")
    assert len(head) == 10
    assert head["keep"].tolist() == [True] + [False] * 9
    stats = semantic_dedup_dropped_cell_stats(
        semantic_dedup(df, threshold=-1.1, centroids=cents, max_cell_size=10)
    ).collect()
    assert len(stats) == 1 and stats[0]["passed_through"] == 20


def test_keepers_semi_join_preserves_payload(spark):
    df, _ = _planted_corpus(spark, dups_of=(0, 3))
    corpus = df.withColumn("payload", F.concat(F.lit("p"), F.col("vec_id")))
    dec = semantic_dedup(df, n_cells=4, threshold=0.98, seed=1)
    kept = semantic_dedup_keepers(corpus, dec)
    rows = kept.select("vec_id", "payload").collect()
    ids = {r["vec_id"] for r in rows}
    assert ids == set(range(40))  # both planted dups removed
    assert all(r["payload"] == f"p{r['vec_id']}" for r in rows)


def test_blockwise_equals_rowwise_at_tiny_block():
    rng = np.random.default_rng(3)
    v = rng.normal(size=(57, 8))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # plant dups to force drops across and within blocks
    v[30] = v[2] + 1e-4
    v[31] = v[30] + 1e-4
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ids = np.arange(57, dtype=np.int64)
    a = _greedy_cell_dedup(v, ids, 0.9, block=5)
    b = _greedy_cell_dedup(v, ids, 0.9, block=1024)
    for x, y in zip(a, b):
        assert np.allclose(
            np.nan_to_num(x.astype(np.float64), neginf=-9),
            np.nan_to_num(y.astype(np.float64), neginf=-9),
        )
