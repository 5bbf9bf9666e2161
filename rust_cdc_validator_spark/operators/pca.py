"""PCA fit + whitening projection for embedding columns.

The linear-algebra-on-Spark pattern the vector family (pq.py, sq8,
similarity.py) leans on, applied to decorrelation: whitening embeddings
(zero mean, unit variance along principal axes) before cosine thresholds
makes near-dup cutoffs comparable across embedding models and sharpens
SemDeDup cells (Jégou & Chum 2012 show whitening + re-normalization
fixes the co-occurrence over-counting in aggregated descriptors).

Scale shape at 100 TB:
  * ``fit_pca`` computes the d×d scatter matrix with ONE ``mapInPandas``
    pass: each Arrow batch folds into a local (count, Σx, ΣxxT) triple and
    each PARTITION emits exactly one flattened row of d(d+1) doubles.
    When the scan has more than ``combine_fanout`` partitions, ONE in-plan
    tree level re-partitions those partial rows to ⌈√P⌉ groups and folds
    them again executor-side, so the driver collects O(√P) rows instead of
    O(P) — at embedding dims (d=1024, each partial ~8 MB) and 100 TB scan
    partition counts (10⁵–10⁶) the un-treed collect would be terabytes;
    the treed one is ≤ √P × 8 MB ≈ single-digit GB spread over a shuffle,
    with ≤ ~1000 rows landing on the driver. Same bounded-collect contract
    as PQ codebooks / IVF centroids / SQ8 bounds. The eigendecomposition
    is a d×d driver-side ``numpy.linalg.eigh`` — microseconds, independent
    of corpus size.
  * ``pca_project`` embeds mean + the k×d projection as PLAN LITERALS:
    each output component is one ``zip_with``/``aggregate`` dot product,
    pure JVM expressions, zero shuffle, no UDF on the projection path.

Eigenvector sign is mathematically arbitrary; ``fit_pca`` canonicalizes
each component so its largest-|loading| coordinate is positive — fits on
permuted/re-partitioned input produce the same projection (up to float
summation noise), and goldens stay stable.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PcaModel", "fit_pca", "pca_project"]


class PcaModel:
    """Driver-held fit result: ``mean`` (d,), ``components`` (k, d) rows =
    principal axes, ``eigenvalues`` (k,) sample variances along them."""

    def __init__(self, mean, components, eigenvalues):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.components = np.asarray(components, dtype=np.float64)
        self.eigenvalues = np.asarray(eigenvalues, dtype=np.float64)

    @property
    def explained_variance_ratio(self):
        tot = getattr(self, "_total_var", None)
        if tot is None or tot <= 0:
            return self.eigenvalues * 0.0
        return self.eigenvalues / tot


_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("s", T.ArrayType(T.DoubleType()), False),
        T.StructField("ss", T.ArrayType(T.DoubleType()), False),
    ]
)


def _fold_partial_rows(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Executor-side combine of (n, s, ss) partial rows — the tree level
    between the scan partials and the driver collect. Pure array sums, so
    it composes associatively with the per-partition fold."""
    n = 0
    s = None
    ss = None
    for pdf in batches:
        for nn, sa, sa2 in zip(pdf["n"], pdf["s"], pdf["ss"]):
            a = np.asarray(sa, dtype=np.float64)
            a2 = np.asarray(sa2, dtype=np.float64)
            if s is not None and (
                a.shape != s.shape or a2.shape != ss.shape
            ):
                raise ValueError(
                    "fit_pca: ragged vectors across partitions"
                )
            n += int(nn)
            s = a if s is None else s + a
            ss = a2 if ss is None else ss + a2
    if n:
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "ss": [ss.tolist()]})


def fit_pca(
    df: DataFrame, vec_col: str, k: int, combine_fanout: int = 64
) -> PcaModel:
    """One distributed pass → top-``k`` principal components.

    Partition partials (count, Σx, flattened ΣxxT) reduce toward the
    driver; when the scan has more than ``combine_fanout`` partitions one
    in-plan ⌈√P⌉-way combine level runs first so the collect is O(√P)
    rows. Covariance = ΣxxT/n − mean·meanT (population, matching the
    oracle-free goldens); eigh on the d×d result.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if combine_fanout < 1:
        raise ValueError("combine_fanout must be >= 1")

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            try:
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            except ValueError as exc:
                raise ValueError(
                    "fit_pca: ragged vectors within a batch"
                ) from exc
            if s is not None and x.shape[1] != s.shape[0]:
                raise ValueError("fit_pca: ragged vectors across batches")
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    part_df = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA)
    p = df.rdd.getNumPartitions()
    if p > combine_fanout:
        groups = max(1, math.isqrt(p - 1) + 1)  # ⌈√P⌉
        part_df = part_df.repartition(groups).mapInPandas(
            _fold_partial_rows, _PARTIAL_SCHEMA
        )
    rows = part_df.collect()
    if not rows:
        raise ValueError("fit_pca: input has no vectors")
    dims = {len(r["s"]) for r in rows}
    if len(dims) != 1:
        raise ValueError("fit_pca: ragged vectors across partitions")
    d = dims.pop()
    if k > d:
        raise ValueError(f"fit_pca: k={k} exceeds dimensionality d={d}")
    n = sum(r["n"] for r in rows)
    s = np.sum([r["s"] for r in rows], axis=0)
    ss = np.sum([r["ss"] for r in rows], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize float noise for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    evals = np.maximum(evals[order], 0.0)
    # canonical sign: largest-|loading| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    model = PcaModel(mean, comps, evals)
    model._total_var = float(np.trace(cov))
    model._collected_partials = len(rows)  # observability: O(√P) contract
    return model


def pca_project(
    vec: Column, model: PcaModel, whiten: bool = False, eps: float = 1e-9
) -> Column:
    """Map-side projection to ``array<double>`` of k components
    (optionally whitened: divided by sqrt(eigenvalue)). Mean and rows of
    the (possibly scaled) projection matrix become literal arrays — the
    plan stays a zero-shuffle select, like ``sq8_encode``."""
    comps = model.components
    if whiten:
        comps = comps / np.sqrt(model.eigenvalues + eps)[:, None]
    from rust_cdc_validator_spark.operators.quantize import _dbl_array_expr

    mean_arr = _dbl_array_expr([float(m) for m in model.mean])
    centered = F.zip_with(vec, mean_arr, lambda v, m: v.cast("double") - m)
    outs = []
    for row in comps:
        w = _dbl_array_expr([float(c) for c in row])
        outs.append(
            F.aggregate(
                F.zip_with(centered, w, lambda c, x: c * x),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
    return F.array(*outs)
