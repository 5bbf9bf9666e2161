from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.similarity import brute_force_topk, ivf_topk
from rust_cdc_validator_spark.operators.skew import salted_agg, salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed big side: 90% of rows share key 1
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(300).select(F.col("id").alias("k"), (F.col("id") * 2).alias("dim"))
    plain = big.join(small, on=["k"]).select("k", "payload", "dim")
    salted = salted_join(big, small, on=["k"], salt_factor=4).select("k", "payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    big = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    plain = big.join(small, on=["k"], how="left").select("k", "v", "tag")
    salted = salted_join(big, small, on=["k"], salt_factor=4, how="left").select("k", "v", "tag")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )


def test_salted_agg_equals_plain_agg(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 100 != 0, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs={"n": F.count(F.lit(1)), "s": F.sum("v"), "mx": F.max("v")},
            final_aggs={"n": F.sum, "s": F.sum, "mx": F.max},
        ).collect()
    }
    assert plain == salted


def test_ivf_quantizer_no_extra_job_with_known_rows(spark):
    """VERDICT r4 #7: `corpus.count()` is metadata-cheap only on raw parquet
    scans — on a derived (filtered) corpus it was a full extra
    materialization job. With `corpus_rows` supplied the quantizer must run
    ZERO sizing jobs (strictly fewer Spark jobs than the probe path), and
    without it the sizing job is a LIMIT-bounded probe, not a full count.
    Job counts via statusTracker job groups."""
    import math

    import numpy as np

    from rust_cdc_validator_spark.operators.similarity import _fit_coarse_quantizer

    rows = [
        (i, [math.cos(i * 0.1), math.sin(i * 0.1), 0.05, 0.1]) for i in range(400)
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    derived = base.filter(F.col("vec_id") % 2 == 0)  # NOT a raw parquet scan

    sc = spark.sparkContext

    def jobs_for(group: str, fn) -> int:
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n_known = jobs_for(
        "ivf-known-rows",
        lambda: _fit_coarse_quantizer(
            derived, "embedding", n_cells=4, sample_size=50, seed=7, corpus_rows=200
        ),
    )
    n_probe = jobs_for(
        "ivf-probe",
        lambda: _fit_coarse_quantizer(
            derived, "embedding", n_cells=4, sample_size=50, seed=7
        ),
    )
    assert n_known < n_probe  # corpus_rows skips the sizing job entirely
    # both paths produce valid unit-norm centroids, and same-seed known-rows
    # runs are deterministic
    c1 = _fit_coarse_quantizer(
        derived, "embedding", n_cells=4, sample_size=50, seed=7, corpus_rows=200
    )
    c2 = _fit_coarse_quantizer(
        derived, "embedding", n_cells=4, sample_size=50, seed=7, corpus_rows=200
    )
    assert c1.shape == (4, 4)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    assert np.allclose(c1, c2)


def test_ivf_index_matches_inline_and_prunes_partitions(spark, tmp_path):
    """The persisted IVF index (build once, probe many) must return exactly
    what inline ivf_topk returns for the same build parameters, and the
    vectors scan must be PARTITION-PRUNED to the probed cells — the plan's
    partition filter is the `cell IN (...)` list, so unprobed cell
    directories are never read."""
    import math

    from rust_cdc_validator_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
    )

    rows = []
    for i in range(300):
        angle = (i % 15) * math.pi / 30
        jitter = (i // 15) * 5e-4
        rows.append((i, [math.cos(angle + jitter), math.sin(angle + jitter), 0.05, 0.1]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = corpus.filter(F.col("vec_id") < 30)

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(corpus, idx, n_cells=8, seed=42)
    from_index = ivf_topk_from_index(spark, idx, qs, k=2, n_probe=2)
    inline = ivf_topk(corpus, qs, k=2, n_probe=2, n_cells=8, seed=42)

    key = lambda r: (r["query_id"], r["rank"])
    got = sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"], round(r["cos_sim"], 9))
         for r in from_index.collect())
    )
    want = sorted(
        ((r["query_id"], r["rank"], r["neighbor_id"], round(r["cos_sim"], 9))
         for r in inline.collect())
    )
    assert got == want

    # pruning: a single query probing 2 of 8 cells reads only those
    one_q = corpus.filter(F.col("vec_id") == 0)
    res = ivf_topk_from_index(spark, idx, one_q, k=1, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    pf = scan.split("PartitionFilters:")[1].split("]")[0]
    assert "cell" in pf and " IN " in pf  # cell IN (probed...) prunes the scan
    assert res.count() == 1


def test_ivf_recall_against_brute_force(spark):
    import math
    rows = []
    for i in range(200):
        angle = (i % 20) * math.pi / 40
        jitter = (i // 20) * 5e-4
        rows.append((i, [math.cos(angle + jitter), math.sin(angle + jitter), 0.05, 0.1]))
    v = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {r["query_id"]: r["neighbor_id"] for r in brute_force_topk(v, v, k=1).collect()}
    approx = {
        r["query_id"]: r["neighbor_id"]
        for r in ivf_topk(v, v, k=1, n_cells=8, n_probe=3).collect()
    }
    hits = sum(1 for q, n in exact.items() if approx.get(q) == n)
    assert hits / len(exact) >= 0.9


def test_ivf_append_equals_build_given_same_centroids(spark, tmp_path):
    """Incremental index maintenance (r6): appending B to an index built on
    A gives exactly the index a fresh build over A∪B would produce GIVEN
    the same centroids — every row sits in its nearest stored cell — and
    probe-all retrieval over the appended index is exact (matches brute
    force over A∪B)."""
    import math

    import numpy as np

    from rust_cdc_validator_spark.operators.similarity import (
        append_to_ivf_index,
        brute_force_topk,
        build_ivf_index,
        ivf_topk_from_index,
    )

    def ring(ids):
        rows = []
        for i in ids:
            angle = (i % 15) * math.pi / 30
            jitter = (i // 15) * 5e-4
            rows.append(
                (i, [math.cos(angle + jitter), math.sin(angle + jitter), 0.05, 0.1])
            )
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a = ring(range(200))
    b = ring(range(200, 300))
    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(a, idx, n_cells=4, seed=7)
    append_to_ivf_index(b, idx)

    # every stored row (old and appended) sits in its nearest stored cell
    cents = np.stack(
        spark.read.parquet(f"{idx}/centroids").orderBy("cell").toPandas()["centroid"].to_numpy()
    )
    stored = spark.read.parquet(f"{idx}/vectors").collect()
    assert sorted(r["_id"] for r in stored) == list(range(300))
    for r in stored:
        v = np.asarray(r["_v"], dtype=np.float64)
        v = v / np.linalg.norm(v)
        assert int(np.argmax(cents @ v)) == r["cell"], r["_id"]

    # probe-ALL over the appended index == exact brute force over A ∪ B
    union = a.unionByName(b)
    qs = union.filter(F.col("vec_id") % 37 == 0)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cos_sim"], 6))
        for r in ivf_topk_from_index(spark, idx, qs, k=3, n_probe=4).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], round(r["cos_sim"], 6))
        for r in brute_force_topk(union, qs, k=3).collect()
    )
    assert got == want


def test_ivf_cell_stats_and_refit_trigger(spark, tmp_path):
    """Appends that pile into one cell flip the refit signal; balanced
    indexes don't."""
    import math

    from rust_cdc_validator_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_cell_stats,
        ivf_refit_needed,
    )

    rows = []
    for i in range(120):
        angle = (i % 12) * math.pi / 6  # full circle: balanced cells
        rows.append((i, [math.cos(angle), math.sin(angle), 0.0, 0.0]))
    a = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ivf_skew")
    build_ivf_index(a, idx, n_cells=4, seed=3)
    assert not ivf_refit_needed(spark, idx, max_imbalance=4.0)

    # 400 near-identical vectors -> one cell
    hot = spark.createDataFrame(
        [(1000 + i, [1.0, 1e-4 * (i % 7), 0.0, 0.0]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    append_to_ivf_index(hot, idx)
    stats = {r["cell"]: r["n_vectors"] for r in ivf_cell_stats(spark, idx).collect()}
    assert sum(stats.values()) == 520
    assert max(stats.values()) >= 400
    assert ivf_refit_needed(spark, idx, max_imbalance=3.0)


def test_key_skew_report_values(spark):
    from rust_cdc_validator_spark.operators.skew import key_skew_report

    # uniform: 4 keys x 25 rows
    uni = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "id long, k long"
    )
    r = key_skew_report(uni, ["k"]).first()
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (100, 4, 25)
    assert r["entropy_norm"] == 1.0 and r["max_share"] == 0.25
    assert abs(r["gini"]) < 1e-9
    # one dominant key: 70/100 on key 9
    hot = spark.createDataFrame(
        [(i, i % 3) for i in range(30)] + [(100 + i, 9) for i in range(70)],
        "id long, k long",
    )
    h = key_skew_report(hot, ["k"]).first()
    assert h["max_share"] == 0.7 and h["n_keys"] == 4
    assert h["entropy_norm"] < 0.7 and h["gini"] > 0.4
    # single key: defined degenerate values
    one = spark.createDataFrame([(1, 5), (2, 5)], "id long, k long")
    o = key_skew_report(one, ["k"]).first()
    assert (o["n_keys"], o["entropy_norm"], o["gini"]) == (1, 0.0, 0.0)
