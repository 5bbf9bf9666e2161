from __future__ import annotations

from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.dedup import connected_components, dedup_clusters


def test_connected_components_chain_and_clique(spark):
    # clique {1,2,3}, chain 10-11-12-13, isolated pair {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == comp[13] == 10
    assert comp[20] == comp[21] == 20


def test_connected_components_long_chain_distributed(spark):
    # 201-node chain through the DISTRIBUTED path: plain neighbor
    # propagation would need 200 rounds; pointer halving makes it O(log n)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"]
            for r in connected_components(edges, driver_threshold=0).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 201


def test_dedup_clusters_end_to_end(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("today", "tomorrow")),
        (4, "completely different words about spark query engines and shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {r["doc_id"]: r["keeper_id"] for r in
            dedup_clusters(docs, "text", "doc_id", num_hashes=32, num_bands=16).collect()}
    assert keep[1] == keep[2] == keep[3] == 1  # near-dup cluster keeps min id
    assert keep[4] == 4                        # singleton keeps itself
    assert len(keep) == 4


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured, the distributed path uses reliable
    checkpointing (survives executor loss at scale) and still converges."""
    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(60)], "id_a long, id_b long"
        )
        out = {
            r["node"]: r["component"]
            for r in connected_components(edges, driver_threshold=10).collect()
        }
        assert set(out.values()) == {0}  # one chain, min label propagates
    finally:
        sc.setCheckpointDir(None) if hasattr(sc, "setCheckpointDir") else None
