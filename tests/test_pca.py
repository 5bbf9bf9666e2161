"""PCA fit/projection (operators/pca.py): numpy equivalence, whitening
identity, partition invariance, plan shape, validations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.pca import fit_pca, pca_project


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic cloud: dominant axis along (1,1,0)/sqrt(2)
    base = rng.randn(200, 3) * np.array([5.0, 1.0, 0.2])
    rot = np.array(
        [
            [1 / np.sqrt(2), 1 / np.sqrt(2), 0.0],
            [-1 / np.sqrt(2), 1 / np.sqrt(2), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    return base @ rot + np.array([10.0, -3.0, 0.5])


@pytest.fixture(scope="module")
def vecs(spark, data):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>",
    )


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def test_fit_matches_numpy(vecs, data):
    model = fit_pca(vecs, "embedding", k=2)
    mean, comps, evals = _numpy_pca(data, 2)
    np.testing.assert_allclose(model.mean, mean, atol=1e-9)
    np.testing.assert_allclose(model.components, comps, atol=1e-9)
    np.testing.assert_allclose(model.eigenvalues, evals, atol=1e-9)
    ratios = model.explained_variance_ratio
    assert 0.9 < ratios[0] < 1.0 and ratios.sum() <= 1.0 + 1e-12


def test_projection_matches_numpy(vecs, data):
    model = fit_pca(vecs, "embedding", k=2)
    out = (
        vecs.select("vec_id", pca_project(F.col("embedding"), model).alias("p"))
        .orderBy("vec_id")
        .collect()
    )
    got = np.array([r["p"] for r in out])
    mean, comps, _ = _numpy_pca(data, 2)
    np.testing.assert_allclose(got, (data - mean) @ comps.T, atol=1e-9)


def test_whitened_projection_has_unit_variance(vecs):
    model = fit_pca(vecs, "embedding", k=2)
    out = vecs.select(
        pca_project(F.col("embedding"), model, whiten=True).alias("p")
    ).collect()
    w = np.array([r["p"] for r in out])
    np.testing.assert_allclose(w.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(w.var(axis=0), 1.0, atol=1e-6)


def test_partition_invariance(spark, vecs):
    m1 = fit_pca(vecs.repartition(1), "embedding", k=2)
    m8 = fit_pca(vecs.repartition(8), "embedding", k=2)
    np.testing.assert_allclose(m1.components, m8.components, atol=1e-9)
    np.testing.assert_allclose(m1.eigenvalues, m8.eigenvalues, atol=1e-9)


def test_tree_combine_bounds_driver_collect(spark, vecs, data):
    # force a high partition count: without the tree level the driver
    # would collect one partial row per partition (100 here); with it the
    # collect is at most ceil(sqrt(P)) rows, and the fit is unchanged.
    wide = vecs.repartition(100)
    treed = fit_pca(wide, "embedding", k=2, combine_fanout=16)
    assert treed._collected_partials <= 10  # ceil(sqrt(100))
    flat = fit_pca(wide, "embedding", k=2, combine_fanout=1000)
    assert flat._collected_partials > 10
    mean, comps, evals = _numpy_pca(data, 2)
    np.testing.assert_allclose(treed.mean, mean, atol=1e-9)
    np.testing.assert_allclose(treed.components, comps, atol=1e-9)
    np.testing.assert_allclose(treed.eigenvalues, evals, atol=1e-9)


def test_tree_combine_ragged_guard(spark):
    # colocate each dimensionality in its own partitions so the mismatch
    # only surfaces where partials from DIFFERENT partitions meet — the
    # combine level's cross-partition guard.
    ragged = spark.createDataFrame(
        [(i, [1.0, 2.0] if i % 2 else [1.0, 2.0, 3.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    ).repartition(4, (F.col("vec_id") % 2).cast("int"))
    with pytest.raises(Exception, match="ragged vectors"):
        fit_pca(ragged, "embedding", k=1, combine_fanout=1)


def test_projection_is_map_side(vecs):
    model = fit_pca(vecs, "embedding", k=2)
    plan = (
        vecs.select(pca_project(F.col("embedding"), model).alias("p"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_validations(spark, vecs):
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(vecs, "embedding", k=0)
    with pytest.raises(ValueError, match="exceeds dimensionality"):
        fit_pca(vecs, "embedding", k=4)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        fit_pca(empty, "embedding", k=1)
