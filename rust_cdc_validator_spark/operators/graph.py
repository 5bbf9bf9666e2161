"""Iterative graph analytics over edge DataFrames: weighted PageRank
(Brin & Page 1998) with dangling-mass redistribution.

`connected_components` (operators/dedup.py) answers "which nodes touch";
PageRank answers "which nodes MATTER" — the importance score a pipeline
reaches for to weight sources, rank entities after fuzzy linkage, or pick
canonical records inside a dedup cluster.

Spark-first iterative shape (the same discipline as the BPE trainer's
driver loop): each iteration is ONE keyed join (edges ⋈ ranks on src) and
ONE aggregation (contributions by dst) — no driver-side rank state ever;
the only scalar the driver holds is the node count. Transition
probabilities are precomputed ONCE (edge weight / source out-weight) so
the per-iteration join carries a single double per edge. Lineage is
truncated every iteration with an eager ``localCheckpoint`` — without it,
k iterations nest k joins into one exponential plan and the optimizer
re-analyzes the whole history each pass (the classic iterative-Spark
trap; GraphX materializes each superstep for the same reason).

Dangling nodes (no out-edges) leak rank mass; the standard fix
redistributes their mass uniformly. That needs a per-iteration scalar
``dm = Σ rank(dangling)`` — computed IN-PLAN as a 1-row aggregate
broadcast-cross-joined into the update, never collected to the driver.

All arithmetic is plain double expressions, so a SQL oracle replays the
unrolled iterations exactly (see ``SUPPLIER_PAGERANK_SQL``).

Scale shape at 100 TB: per-iteration cost is one shuffle of |E| (join on
src) plus one shuffle of |E| (agg on dst) — the contribution agg combines
map-side. Skewed in-degree (a celebrity node) concentrates the agg, not
the join; AQE's skew handling or a salted pre-agg (operators/skew.py)
applies unchanged. Edges are cached once; ranks are O(|V|) rows of two
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint: bool = True,
) -> DataFrame:
    """Rank every node of the directed (optionally weighted) edge set.

    Returns (node, rank) with Σ rank = 1. ``iterations`` fixed steps of
    the power method (5–10 reaches ~1e-3 station for typical graphs);
    ``checkpoint=False`` is for tiny unit-test graphs only — at scale the
    un-truncated lineage is the failure mode, not the compute.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()  # the ONE driver scalar (|V|), needed as a literal
    if n == 0:
        raise ValueError("pagerank: edge set is empty")

    out_w = edges.groupBy(F.col(src).alias("_s")).agg(F.sum(w).alias("_ow"))
    trans = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w"))
        .join(out_w, "_s")
        .select("_s", "_d", (F.col("_w") / F.col("_ow")).alias("_p"))
    )
    if checkpoint:
        trans = trans.localCheckpoint(eager=True)

    # dangling = nodes that never appear as a source
    dangling_nodes = nodes.join(
        out_w.select(F.col("_s").alias("node")), "node", "left_anti"
    )
    if checkpoint:
        dangling_nodes = dangling_nodes.localCheckpoint(eager=True)

    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans["_s"] == ranks["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_c"))
        )
        dm = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["_d"], "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0)) + F.col("_dm") / n)
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
