"""Scale-shape pressure test for the iterative graph family (VERDICT r8
#6): pagerank and triangle counting at ~1M synthetic edges across a
100-way partitioned edge set. The cost driver at scale is JOBS PER
SUPERSTEP (each localCheckpoint / broadcast materialization is a job
launch), so beyond a wall bound these tests pin the job count: it must be
bounded, and identical across two runs of the same plan — a regression
that silently doubles per-iteration actions fails here before it ships.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.graph import pagerank, triangle_count

N_EDGES = 1_000_000
N_NODES = 50_000
N_PARTS = 100


def _edges(spark):
    # deterministic pseudo-random graph: xxhash64 of the edge index picks
    # the destination; ~20 out-edges per node on average — a plausible
    # supplier/co-trade shape, fixed across runs.
    return (
        spark.range(N_EDGES)
        .select(
            (F.col("id") % N_NODES).cast("long").alias("src"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(N_NODES)).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .repartition(N_PARTS)
    )


def _run_pagerank_counting_jobs(spark, edges):
    sc = spark.sparkContext
    group = f"pr-pressure-{time.monotonic_ns()}"
    sc.setJobGroup(group, "pagerank pressure run")
    try:
        t0 = time.time()
        ranks = pagerank(edges, iterations=5)
        total, n = ranks.agg(
            F.sum("rank").alias("s"), F.count(F.lit(1)).alias("n")
        ).first()
        elapsed = time.time() - t0
    finally:
        sc.setJobGroup("", "")
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    return total, n, elapsed, jobs


def test_pagerank_1m_edges_wall_and_job_count(spark):
    edges = _edges(spark).localCheckpoint(eager=True)  # exclude gen cost
    n_touched = (
        edges.select(F.col("src").alias("n"))
        .unionAll(edges.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    r1 = _run_pagerank_counting_jobs(spark, edges)
    r2 = _run_pagerank_counting_jobs(spark, edges)
    for total, n, elapsed, jobs in (r1, r2):
        assert abs(total - 1.0) < 1e-6  # mass conserved
        assert n == n_touched
        assert elapsed < 120, f"5 supersteps over 1M edges took {elapsed:.1f}s"
        # structural bound: edge build + role/probe + transition build is
        # a handful of jobs; each superstep adds O(1) jobs (checkpoint or
        # broadcast materialization). 5 iterations must stay well under
        # 10 jobs/step — a per-step job-count regression trips this first.
        assert jobs <= 50, f"pagerank launched {jobs} jobs"
    assert r1[3] == r2[3], (
        f"job count not stable across identical runs: {r1[3]} != {r2[3]}"
    )
    print(
        f"\npagerank 1M edges x5 iters: {r1[2]:.1f}s, {r1[3]} jobs "
        f"(run2 {r2[2]:.1f}s)"
    )


def test_triangle_count_200k_edges_wall_bounded(spark):
    edges = (
        spark.range(200_000)
        .select(
            (F.col("id") % 5_000).cast("long").alias("src"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(5_000)).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    n_tri = triangle_count(edges, "src", "dst").agg(
        F.sum("triangles").alias("t")
    ).first()["t"]
    elapsed = time.time() - t0
    assert n_tri > 0  # dense modular graph: triangles certainly exist
    assert elapsed < 90, f"triangle count over 200k edges took {elapsed:.1f}s"
    print(f"\ntriangles over 200k edges: {n_tri} in {elapsed:.1f}s")
