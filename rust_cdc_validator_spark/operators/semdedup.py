"""Semantic deduplication (SemDeDup) for embedding-bearing corpora.

Published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means the
embeddings into clusters, then compare pairs only WITHIN a cluster and drop
one side of every pair whose cosine similarity exceeds a threshold — the
cluster step makes semantic dedup sub-quadratic the same way LSH bands make
MinHash dedup sub-quadratic.

Spark shape (no reference counterpart — the reference validates CDC rows,
this layer serves the training-data brief):

* quantizer fit: the IVF coarse quantizer is EXACTLY the k-means this
  needs, so we reuse ``similarity._fit_coarse_quantizer`` (distributed
  k-means|| over a bounded random sample; only centroids reach the driver).
* cluster assignment: map-side broadcast matmul
  (``similarity._assign_cells`` with ``n_top=1``) — no shuffle.
* the ONLY shuffle is one groupBy on cell id; within each cell a grouped
  Arrow batch runs the greedy scan vectorized (blockwise matmuls against
  the kept set, never a Python-level pair loop).
* degenerate cells are capped like every other bucketed op here
  (``max_cell_size``): beyond the cap rows pass through UNDEDUPED (keep
  semantics err on keeping data) and are observable via
  ``semantic_dedup_dropped_cell_stats`` — same recall-trade contract as
  ``lsh_dropped_bucket_stats`` / ``simhash_dropped_block_stats``.

Greedy semantics (deterministic, partitioning-invariant): within a cell,
scan ids ASCENDING; a row is dropped iff its cosine similarity to some
already-KEPT lower id exceeds ``threshold`` (``dup_of`` = that keeper's id,
the most similar one). Keeping the lowest id mirrors ``exact_dedup`` /
MinHash cluster roots, so downstream keeper-joins compose identically.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_validator_spark.operators.similarity import (
    _assign_cells,
    _assign_schema,
    _fit_coarse_quantizer,
)

_SEMDEDUP_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cell", T.IntegerType(), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("dup_of", T.LongType(), True),
        T.StructField("max_sim", T.DoubleType(), True),
        T.StructField("capped", T.BooleanType(), False),
    ]
)


def _greedy_cell_dedup(
    v: np.ndarray, ids: np.ndarray, threshold: float, block: int = 1024
):
    """Greedy ascending-id scan over one cell's unit vectors, vectorized:
    process ids in blocks; per block compute ONE matmul against the kept
    set plus the block's own gram matrix, then resolve the (inherently
    sequential) keep/drop decisions from those precomputed similarities.
    Exactly equal to the row-at-a-time greedy scan, at matmul speed.

    Returns (keep: bool[n], dup_of: int64[n], max_sim: float64[n]) aligned
    with ids (which must be sorted ascending).
    """
    n = len(ids)
    keep = np.ones(n, dtype=bool)
    dup_of = np.full(n, -1, dtype=np.int64)
    max_sim = np.full(n, -np.inf, dtype=np.float64)
    kept_rows: list[np.ndarray] = []  # block-sized slices of kept vectors
    kept_ids: list[np.ndarray] = []
    for start in range(0, n, block):
        m = min(block, n - start)
        b = v[start : start + m]
        bi = ids[start : start + m]
        if kept_rows:
            km = np.concatenate(kept_rows)
            ki = np.concatenate(kept_ids)
            prior = b @ km.T  # (m, kept) — one matmul vs all prior keepers
        else:
            km = np.empty((0, v.shape[1]))
            ki = np.empty(0, dtype=np.int64)
            prior = np.empty((m, 0))
        gram = b @ b.T  # within-block pairs
        bkeep = np.ones(m, dtype=bool)
        for j in range(m):
            sims = prior[j]
            cand_ids = ki
            if j:
                mask = bkeep[:j]
                sims = np.concatenate([sims, gram[j, :j][mask]])
                cand_ids = np.concatenate([cand_ids, bi[:j][mask]])
            if sims.size:
                a = int(np.argmax(sims))
                max_sim[start + j] = float(sims[a])
                if sims[a] > threshold:
                    bkeep[j] = False
                    dup_of[start + j] = int(cand_ids[a])
        keep[start : start + m] = bkeep
        if bkeep.any():
            kept_rows.append(b[bkeep])
            kept_ids.append(bi[bkeep])
    return keep, dup_of, max_sim


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    sample_size: int = 10_000,
    seed: int = 42,
    max_cell_size: int = 100_000,
    corpus_rows: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """SemDeDup: one row per input vector with the keep/drop decision.

    Columns: ``vec_id``, ``cell`` (k-means cluster), ``keep``, ``dup_of``
    (the kept lower id it duplicates, null when kept), ``max_sim`` (cosine
    to the most similar lower-id keeper seen, null when the row is the
    cell's first or passed through a capped cell), ``capped`` (true for
    pass-through rows beyond ``max_cell_size`` — kept undeduped).

    Scale: the corpus moves ONCE (groupBy cell); cell compute is
    O(|cell|²·dim / block) in blockwise matmuls, bounded by
    ``max_cell_size``; raise ``n_cells`` so expected cell size stays
    comfortable (SemDeDup's own recipe: k ~ sqrt(N) keeps cells ~sqrt(N)).

    Determinism: given fixed ``centroids`` the result is fully
    partitioning-invariant (assignment and the greedy scan are functions of
    values only). When the quantizer is fit here, the k-means SAMPLE
    depends on the input's partitioning (same contract as ``ivf_topk``) —
    a bare parquet scan is stable run-to-run, a repartitioned frame may
    cluster differently. Pin ``centroids`` (unit-normalized, shape
    (n_cells, dim)) for cross-run stability on derived inputs.
    """
    spark = corpus.sparkSession
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
    else:
        cents = _fit_coarse_quantizer(
            corpus, vec_col, n_cells, sample_size, seed, corpus_rows=corpus_rows
        )
    bc = spark.sparkContext.broadcast(cents)
    assigned = _assign_cells(
        corpus, id_col, vec_col, bc, 1, np.float64, _assign_schema("float64")
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id", kind="mergesort").reset_index(drop=True)
        cell = int(pdf["cell"].iloc[0])
        head = pdf.iloc[:max_cell_size]
        v = np.stack(head["_v"].to_numpy()).astype(np.float64)
        ids = head["_id"].to_numpy().astype(np.int64)
        keep, dup_of, max_sim = _greedy_cell_dedup(v, ids, threshold)
        out = pd.DataFrame(
            {
                "vec_id": ids,
                "cell": cell,
                "keep": keep,
                "dup_of": np.where(keep, np.nan, dup_of.astype(np.float64)),
                "max_sim": np.where(np.isfinite(max_sim), max_sim, np.nan),
                "capped": False,
            }
        )
        if len(pdf) > max_cell_size:
            tail = pdf.iloc[max_cell_size:]
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "vec_id": tail["_id"].to_numpy().astype(np.int64),
                            "cell": cell,
                            "keep": True,
                            "dup_of": np.nan,
                            "max_sim": np.nan,
                            "capped": True,
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    return assigned.groupBy("cell").applyInPandas(dedup_cell, _SEMDEDUP_SCHEMA)


def semantic_dedup_dropped_cell_stats(decisions: DataFrame) -> DataFrame:
    """Observability for the ``max_cell_size`` recall trade: per capped cell,
    how many rows passed through undeduped. Empty ⇒ no cell hit the cap and
    the decisions are exact SemDeDup at the given threshold."""
    return (
        decisions.filter(F.col("capped"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("passed_through"))
        .orderBy("cell")
    )


def semantic_dedup_keepers(
    corpus: DataFrame,
    decisions: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Filter the corpus to kept rows via a left-semi join on the 8-byte id
    (decisions are narrow — the corpus payload never re-shuffles)."""
    keep_ids = decisions.filter(F.col("keep")).select(
        F.col("vec_id").alias(id_col)
    )
    return corpus.join(keep_ids, on=id_col, how="left_semi")
