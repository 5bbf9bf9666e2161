"""Persisted edge state for the graph family — the graph sibling of the
MinHash/LSH/IVF index discipline (operators/dedup.build_minhash_index,
operators/similarity.build_lsh_index).

Motivation (r10 verdict): pagerank, label propagation, BFS, and triangle
counting each rebuilt the same fact-table-derived edge relation per
query — at bench scale ~11% of suite wall, and at 100 TB a full
lineitem-sized scan + join per analytic. A standing pipeline computes
the edge relation ONCE (per day / per snapshot), persists it in
algorithm-ready form, and every graph analytic reads kilobyte-to-
gigabyte edge state instead of re-joining terabytes of facts.

Layout under ``path`` (same parquet-dir portability as the ANN indexes —
no metastore dependency, any Spark session can read it):

* ``adj/`` — the adjacency every algorithm consumes DIRECTLY:
  (src, dst, w, p) with both directions PRE-EXPLODED for undirected
  builds (dedup'd, self-loops dropped) and the transition probability
  ``p = w / out_w(src)`` precomputed, so ``pagerank_from_state`` skips
  the out-weight aggregation and join entirely. Written re-partitioned
  by ``src`` into ``buckets`` files and sorted within partitions, so
  src-keyed reads get row-group min/max pruning and co-located keys.
* ``nodes/`` — (node, has_out, has_in, out_deg, in_deg, out_w): the
  role relation pagerank derives per call (node set, dangling flag,
  teleport-only flag) plus degrees for degree-keyed analytics.
* ``params/`` — one row: directed, weighted, buckets, n_nodes, n_edges
  (adjacency rows). The staleness baseline —
  :func:`edge_state_refit_needed` compares the CURRENT canonical edge
  count against ``n_edges``, mirroring ``similarity.ivf_refit_needed``.

Semantics contract: undirected builds canonicalize (least, greatest),
DROP self-loops, and SUM weights across duplicate/reversed input rows —
exactly the relation ``label_propagation`` / ``shortest_hops``
(undirected) derive internally, so the ``*_from_state`` variants are
value-identical to the direct operators on self-loop-free input.
Directed builds keep self-loops and sum multi-edge weights.

Scale shape at 100 TB: the build pays the fact scan once; ``adj`` is
O(|E|) narrow rows and every ``*_from_state`` analytic starts its
iterations from a parquet scan — zero prep jobs, zero fact-table
exchanges. The iteration loops themselves are shared with
operators/graph.py (same shuffle bounds, same checkpoint discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_validator_spark.operators.graph import (
    GraphRunStats,
    _bfs_loop,
    _lpa_loop,
    _pagerank_loop,
    _parse_bytes,
    _RANK_ROW_BYTES,
)

__all__ = [
    "build_edge_state",
    "advance_edge_state",
    "betweenness_from_state",
    "edge_state_params",
    "edge_state_adjacency",
    "edge_state_nodes",
    "edge_state_refit_needed",
    "pagerank_from_state",
    "label_propagation_from_state",
    "shortest_hops_from_state",
    "weighted_paths_from_state",
    "k_core_from_state",
    "triangle_count_from_state",
    "degree_assortativity_from_state",
    "clustering_coefficient_from_state",
    "adamic_adar_from_state",
    "hits_from_state",
    "harmonic_closeness_from_state",
]


def _canonical(
    edges: DataFrame,
    src: str,
    dst: str,
    weight_col: str | None,
    directed: bool,
) -> DataFrame:
    """The build's canonical (src, dst, w) relation — also recomputed by
    :func:`edge_state_refit_needed` so drift is measured against the
    same formulation the state was built from."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    if directed:
        pairs = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
        )
    else:
        a, b = F.col(src), F.col(dst)
        pairs = edges.select(
            F.least(a, b).alias("src"),
            F.greatest(a, b).alias("dst"),
            w.alias("w"),
        ).filter(F.col("src") != F.col("dst"))
    return pairs.groupBy("src", "dst").agg(F.sum("w").alias("w"))


def build_edge_state(
    edges: DataFrame,
    path: str,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    directed: bool = False,
    buckets: int = 32,
) -> None:
    """Persist algorithm-ready edge state under ``path`` (layout above).

    ONE pass over the (possibly expensive) ``edges`` subtree: the
    canonical aggregation materializes to ``adj/`` first, and nodes,
    degrees, out-weights, and counts all derive from the WRITTEN files —
    the caller's fact joins never re-execute.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    spark = edges.sparkSession
    canon = _canonical(edges, src, dst, weight_col, directed)
    directed_edges = _expand_directions(canon, directed)
    _write_state(
        spark, directed_edges, path, directed, weight_col is not None, buckets
    )


def _expand_directions(canon: DataFrame, directed: bool) -> DataFrame:
    """Direction-expand a canonical (src, dst, w) relation: directed
    states pass through; undirected states get both directions in ONE
    pass (explode, not unionAll — the union form would evaluate the
    caller's edge build twice)."""
    if directed:
        return canon
    return canon.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("src").alias("src"),
                    F.col("dst").alias("dst"),
                    F.col("w").alias("w"),
                ),
                F.struct(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    F.col("w").alias("w"),
                ),
            )
        ).alias("_x")
    ).select("_x.src", "_x.dst", "_x.w")


def _write_state(
    spark: SparkSession,
    directed_edges: DataFrame,
    path: str,
    directed: bool,
    weighted: bool,
    buckets: int,
) -> None:
    """Write a direction-expanded aggregated (src, dst, w) relation as
    the full state layout (adj + nodes + params) — shared by the
    from-facts build and the state+delta advance."""
    # out-weights and transition probs attached BEFORE the write, so the
    # per-query prep cost is zero forever after; the out_w relation is a
    # groupBy over the (already aggregated) directed edges, not the input
    out_w = directed_edges.groupBy(F.col("src").alias("_s")).agg(
        F.sum("w").alias("_ow")
    )
    adj = directed_edges.join(
        out_w, directed_edges["src"] == out_w["_s"]
    ).select("src", "dst", "w", (F.col("w") / F.col("_ow")).alias("p"))
    adj.repartition(buckets, "src").sortWithinPartitions("src").write.mode(
        "overwrite"
    ).parquet(f"{path}/adj")

    # everything below derives from the WRITTEN adjacency — the input
    # subtree has already been released
    written = spark.read.parquet(f"{path}/adj")
    nodes = (
        written.select(
            F.col("src").alias("node"),
            F.lit(1).alias("_o"),
            F.lit(0).alias("_i"),
            F.col("w").alias("_ow"),
        )
        .unionAll(
            written.select(
                F.col("dst").alias("node"),
                F.lit(0).alias("_o"),
                F.lit(1).alias("_i"),
                F.lit(0.0).alias("_ow"),
            )
        )
        .groupBy("node")
        .agg(
            F.max("_o").alias("has_out"),
            F.max("_i").alias("has_in"),
            F.sum("_o").cast("long").alias("out_deg"),
            F.sum("_i").cast("long").alias("in_deg"),
            F.sum("_ow").alias("out_w"),
        )
    )
    nodes.repartition(buckets, "node").write.mode("overwrite").parquet(
        f"{path}/nodes"
    )
    # counts come from the WRITTEN files (parquet row-group metadata),
    # never from re-running the input subtree
    n_edges = spark.read.parquet(f"{path}/adj").count()
    n_nodes = spark.read.parquet(f"{path}/nodes").count()
    spark.createDataFrame(
        [(bool(directed), bool(weighted), buckets, n_nodes, n_edges)],
        "directed boolean, weighted boolean, buckets int, "
        "n_nodes long, n_edges long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def advance_edge_state(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    new_path: str,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> None:
    """Incremental edge-state maintenance: fold an edge DELTA into the
    state at ``path`` and write the result as a NEW state version at
    ``new_path`` — the graph sibling of ``api.CdcValidator.advance_state``
    (CDC window applied to bucketed PK state) and the same immutable-
    version discipline as the ANN index builders.

    The point at 100 TB: a standing pipeline re-derives the edge
    relation from the FACT table per snapshot — a full terabyte scan +
    join every day. Advancing instead reads O(|E|) state rows plus the
    day's delta: the fact scan is paid once ever, after which graph
    state stays current by folding deltas.

    Delta semantics match the build's canonicalization contract
    (undirected states canonicalize + drop self-loops, duplicates sum):
    positive weights add or strengthen edges, NEGATIVE weights retract
    (CDC deletes) — a merged edge whose weight falls to <= 0 disappears
    entirely, from ``adj`` and from ``nodes``' degrees alike. For
    unweighted states pass a ±1 weight column to retract co-occurrence
    counts; integral deltas stay exact in double arithmetic.

    The result is VALUE-IDENTICAL to rebuilding from the merged edge
    multiset (pinned in tests/test_graphstate.py): adj, transition
    probs, node roles/degrees, and params all re-derive from the merged
    relation through the same ``_write_state`` path.

    Scale shape: one groupBy over state∪delta (narrow (src, dst, w)
    rows, the SAME bucketed key the state was written by — at scale the
    scan-side partitioning feeds the merge with minimal movement), then
    the build's write path. No fact-table exchange anywhere.
    """
    if posixpath_normcase(new_path) == posixpath_normcase(path):
        raise ValueError(
            "advance_edge_state writes a NEW state version: new_path must "
            "differ from path (readers of the old version would race the "
            "overwrite)"
        )
    params = edge_state_params(spark, path)
    directed = bool(params["directed"])
    old = spark.read.parquet(f"{path}/adj").select("src", "dst", "w")
    canon = _canonical(delta, src, dst, weight_col, directed)
    merged = (
        old.unionByName(_expand_directions(canon, directed))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") > 0)
    )
    _write_state(
        spark,
        merged,
        new_path,
        directed,
        bool(params["weighted"]) or weight_col is not None,
        int(params["buckets"]),
    )


def posixpath_normcase(p: str) -> str:
    """Normalize a state path for the same-version guard (trailing
    slashes and redundant separators only — scheme-qualified paths pass
    through untouched)."""
    return p.rstrip("/").replace("//", "/") if "://" not in p else p.rstrip("/")


def edge_state_params(spark: SparkSession, path: str) -> dict:
    """The build's pinned parameters + size facts as a plain dict."""
    return spark.read.parquet(f"{path}/params").first().asDict()


def edge_state_adjacency(spark: SparkSession, path: str) -> DataFrame:
    """(src, dst, w, p) — direction-expanded for undirected builds."""
    return spark.read.parquet(f"{path}/adj")


def edge_state_nodes(spark: SparkSession, path: str) -> DataFrame:
    """(node, has_out, has_in, out_deg, in_deg, out_w)."""
    return spark.read.parquet(f"{path}/nodes")


def edge_state_refit_needed(
    current_edges: DataFrame,
    path: str,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    max_drift: float = 0.10,
) -> bool:
    """True when the CURRENT canonical edge count has drifted more than
    ``max_drift`` (fraction) from the persisted state's — the rebuild cue
    for a standing pipeline, the graph analog of
    ``similarity.ivf_refit_needed``. One count aggregate over the current
    edge relation; the state is never scanned."""
    params = edge_state_params(current_edges.sparkSession, path)
    canon_rows = _canonical(
        current_edges, src, dst, weight_col, params["directed"]
    ).count()
    stored = params["n_edges"] // (1 if params["directed"] else 2)
    if stored == 0:
        return canon_rows > 0
    return abs(canon_rows - stored) / stored > max_drift


def pagerank_from_state(
    spark: SparkSession,
    path: str,
    damping: float = 0.85,
    iterations: int = 5,
    tol: float | None = None,
    checkpoint: bool = True,
    return_stats: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """:func:`graph.pagerank` over persisted edge state: the node set,
    dangling flags, and transition probabilities are READ, not derived —
    the only pre-loop job is a 3-scalar aggregate over ``nodes/``. Same
    power-method loop, bit-for-bit (shared ``_pagerank_loop``)."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if tol is not None and tol <= 0.0:
        raise ValueError("tol must be positive when set")
    if tol is not None and not checkpoint:
        raise ValueError(
            "tol requires checkpoint=True: each delta probe would "
            "re-execute the un-truncated iteration lineage"
        )
    adj = edge_state_adjacency(spark, path)
    trans = adj.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d"), F.col("p").alias("_p")
    )
    role = edge_state_nodes(spark, path)
    probe = role.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("has_out") == 0, 1).otherwise(0)).alias("dang"),
        F.max(F.when(F.col("has_in") == 0, 1).otherwise(0)).alias("srco"),
    ).first()
    n = int(probe["n"])
    if n == 0:
        raise ValueError("pagerank_from_state: edge state is empty")
    nodes = role.select("node")
    if seeds is not None:
        from rust_cdc_validator_spark.operators.graph import _attach_teleport

        nodes = _attach_teleport(nodes, seeds, checkpoint)
    dangling_nodes = role.filter(F.col("has_out") == 0).select("node")
    threshold = _parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    broadcast_ranks = 0 < n * _RANK_ROW_BYTES <= threshold
    ranks, iterations_used, last_delta = _pagerank_loop(
        nodes,
        trans,
        dangling_nodes,
        n,
        bool(probe["dang"]),
        bool(probe["srco"]),
        broadcast_ranks,
        damping,
        iterations,
        tol,
        checkpoint,
    )
    if return_stats:
        return ranks, GraphRunStats(iterations=iterations_used, delta=last_delta)
    return ranks


def label_propagation_from_state(
    spark: SparkSession,
    path: str,
    iterations: int = 5,
    checkpoint: bool = True,
    track_convergence: bool = False,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """:func:`graph.label_propagation` over persisted UNDIRECTED edge
    state: the symmetrized, dedup'd, self-loop-free neighbor relation is
    exactly ``adj/`` — read, not rebuilt. Same synchronous supersteps,
    bit-for-bit (shared ``_lpa_loop``)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if track_convergence and not checkpoint:
        raise ValueError(
            "track_convergence requires checkpoint=True: each "
            "per-superstep changed-count would re-execute the "
            "un-truncated iteration lineage"
        )
    if edge_state_params(spark, path)["directed"]:
        raise ValueError(
            "label_propagation_from_state requires undirected edge state "
            "(LPA is defined on the undirected graph; rebuild with "
            "directed=False)"
        )
    nbr = edge_state_adjacency(spark, path).select(
        F.col("src").alias("_n"), F.col("dst").alias("_nb")
    )
    labels = edge_state_nodes(spark, path).select(
        "node", F.col("node").alias("label")
    )
    labels, iterations_used, changes = _lpa_loop(
        nbr, labels, iterations, checkpoint, track_convergence
    )
    if return_stats:
        return labels, GraphRunStats(iterations=iterations_used, changes=changes)
    return labels


def shortest_hops_from_state(
    spark: SparkSession,
    path: str,
    seeds: DataFrame,
    max_hops: int = 5,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`graph.shortest_hops` over persisted edge state: the
    direction-expanded adjacency is read, not rebuilt (undirected state
    already carries both directions; directed state walks edge
    direction). Same frontier supersteps (shared ``_bfs_loop``)."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    e = edge_state_adjacency(spark, path).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    return _bfs_loop(e, seeds, max_hops, checkpoint)


def k_core_from_state(
    spark: SparkSession,
    path: str,
    k: int,
    rounds: int = 10,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`graph.k_core` over persisted UNDIRECTED edge state: the
    symmetrized adjacency is read, not rebuilt (shared ``_kcore_loop``,
    same peel semantics and early stop)."""
    from rust_cdc_validator_spark.operators.graph import _kcore_loop

    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if edge_state_params(spark, path)["directed"]:
        raise ValueError(
            "k_core_from_state requires undirected edge state (the k-core "
            "is defined on the undirected graph; rebuild with "
            "directed=False)"
        )
    adj = edge_state_adjacency(spark, path).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    return _kcore_loop(adj, k, rounds, checkpoint)


def _state_und_deg(spark: SparkSession, path: str):
    """Canonical distinct pairs + broadcast-gated degree relation from
    persisted UNDIRECTED edge state — the front half
    ``graph._canonical_edges_and_degrees`` derives per call, read here
    instead: pairs are the adjacency's src < dst half, degrees are the
    nodes relation's out_deg, and the broadcast gate uses the params'
    pinned n_nodes (zero probe jobs)."""
    from rust_cdc_validator_spark.operators.graph import (
        _parse_bytes as _pb,
        _RANK_ROW_BYTES as _rrb,
    )

    params = edge_state_params(spark, path)
    if params["directed"]:
        raise ValueError(
            "undirected edge state required (triangles/assortativity are "
            "defined on the undirected graph; rebuild with directed=False)"
        )
    adj = edge_state_adjacency(spark, path)
    und = adj.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("_a"), F.col("dst").alias("_b")
    )
    deg = edge_state_nodes(spark, path).select(
        "node", F.col("out_deg").alias("_deg")
    )
    threshold = _pb(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    if 0 < params["n_nodes"] * _rrb <= threshold:
        deg = F.broadcast(deg)
    return und, deg


def triangle_count_from_state(spark: SparkSession, path: str) -> DataFrame:
    """:func:`graph.triangle_count` over persisted undirected edge state:
    canonical pairs and degrees are READ (parquet scans — the params'
    n_nodes drives the degree-broadcast gate with no probe job); the
    orientation + wedge-closure plan is shared (``_triangle_core``)."""
    from rust_cdc_validator_spark.operators.graph import _triangle_core

    und, deg = _state_und_deg(spark, path)
    return _triangle_core(und, deg)


def degree_assortativity_from_state(spark: SparkSession, path: str) -> DataFrame:
    """:func:`graph.degree_assortativity` over persisted undirected edge
    state (shared ``_assortativity_core``)."""
    from rust_cdc_validator_spark.operators.graph import _assortativity_core

    und, deg = _state_und_deg(spark, path)
    return _assortativity_core(und, deg)


def clustering_coefficient_from_state(
    spark: SparkSession, path: str
) -> DataFrame:
    """:func:`graph.clustering_coefficient` over persisted undirected
    edge state (shared ``_clustering_core``; pairs + degrees read, the
    broadcast gate driven by the params' pinned n_nodes)."""
    from rust_cdc_validator_spark.operators.graph import _clustering_core

    und, deg = _state_und_deg(spark, path)
    return _clustering_core(und, deg)


def adamic_adar_from_state(
    spark: SparkSession,
    path: str,
    src_prefix: str,
    max_degree: int | None = 1000,
) -> DataFrame:
    """:func:`graph.adamic_adar` over persisted edge state: the directed
    witness→candidate relation is the adjacency rows whose src starts
    with ``src_prefix`` (the state pre-explodes both directions of an
    undirected build, so one side's prefix selects one direction), and
    witness degrees are the persisted nodes' out_deg — the distinct
    exchange AND the degree aggregation the direct operator pays both
    disappear (shared ``_adamic_adar_core``)."""
    from rust_cdc_validator_spark.operators.graph import _adamic_adar_core

    adj = edge_state_adjacency(spark, path)
    e = adj.filter(F.col("src").startswith(src_prefix)).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    deg = (
        edge_state_nodes(spark, path)
        .filter(F.col("node").startswith(src_prefix))
        .select(F.col("node").alias("_s"), F.col("out_deg").alias("_deg"))
    )
    return _adamic_adar_core(e, deg, max_degree)


def hits_from_state(
    spark: SparkSession,
    path: str,
    src_prefix: str | None = None,
    iterations: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`graph.hits` over persisted edge state: the edge relation
    is a prefix FILTER on the pre-exploded adjacency (``src_prefix``
    selects one direction of an undirected bipartite build; None runs
    HITS on the full adjacency) and the node set + broadcast gate come
    from the persisted nodes/params relations — zero prep jobs before
    the first half-step (shared ``_hits_loop``)."""
    from rust_cdc_validator_spark.operators.graph import (
        _hits_loop,
        _parse_bytes as _pb,
        _RANK_ROW_BYTES as _rrb,
    )

    adj = edge_state_adjacency(spark, path)
    if src_prefix is not None:
        adj = adj.filter(F.col("src").startswith(src_prefix))
    e = adj.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d"),
        F.col("w").alias("_w"),
    )
    nodes = edge_state_nodes(spark, path).select("node")
    params = edge_state_params(spark, path)
    n = int(params["n_nodes"])
    if n == 0:
        raise ValueError("hits_from_state: edge state is empty")
    threshold = _pb(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    return _hits_loop(
        e, nodes, 0 < n * _rrb <= threshold, iterations, checkpoint
    )


def harmonic_closeness_from_state(
    spark: SparkSession,
    path: str,
    pivots: DataFrame,
    max_hops: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Pivot-sampled harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality" 2014; Eppstein–Wang pivot sampling) over persisted edge
    state: one labeled multi-source BFS carries (pivot, node) frontiers
    for ALL pivots simultaneously — k pivots cost ONE set of supersteps,
    not k BFS runs — then each node's closeness estimate is
    Σ_{pivots p, d(p,n) >= 1} 1 / d(p,n).

    The reciprocal sum is EXACT: distances are small integers, so each
    term is accumulated as the integer ``lcm(1..max_hops) / d`` and the
    single division by the lcm happens once, in double, at the end —
    order-independent, hence engine-portable for the oracle (a plain
    double Σ 1/d would hash differently per shuffle order).

    Returns (node, n_reached, harmonic) for every node some pivot
    reaches within ``max_hops``; a pivot does not count toward its own
    centrality (d = 0 excluded). Scale shape: identical to
    :func:`shortest_hops_from_state` with state rows multiplied by the
    pivot fan-out (bounded by k·|V|); the same exact-count broadcast
    gates apply to the frontier-expansion and settled anti-joins.
    """
    import math

    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edge_state_adjacency(spark, path).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    threshold = _parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    # (pivot, node) rows are two node ids wide — reuse the rank-row bound
    # doubled as the conservative per-row estimate for the gates.
    row_bytes = 2 * _RANK_ROW_BYTES
    dist = pivots.select(F.col("node").alias("pivot")).distinct().select(
        "pivot",
        F.col("pivot").alias("node"),
        F.lit(0).cast("int").alias("hops"),
    )
    if checkpoint:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("pivot", "node")
    n_frontier = n_settled = dist.count()
    for h in range(1, max_hops + 1):
        fside = (
            F.broadcast(frontier)
            if 0 < n_frontier * row_bytes <= threshold
            else frontier
        )
        cand = (
            fside.join(e, fside["node"] == e["_s"])
            .select("pivot", F.col("_d").alias("node"))
            .distinct()
        )
        settled = dist.select("pivot", "node")
        if 0 < n_settled * row_bytes <= threshold:
            settled = F.broadcast(settled)
        new = cand.join(settled, ["pivot", "node"], "left_anti").select(
            "pivot", "node", F.lit(h).cast("int").alias("hops")
        )
        if checkpoint:
            new = new.localCheckpoint(eager=True)
        n_frontier = new.count()
        if n_frontier == 0:
            break
        dist = dist.unionAll(new)
        n_settled += n_frontier
        frontier = new.select("pivot", "node")
    scale = math.lcm(*range(1, max_hops + 1))
    return (
        dist.filter(F.col("hops") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            (
                F.sum((F.lit(scale) / F.col("hops")).cast("long"))
                .cast("double")
                / F.lit(float(scale))
            ).alias("harmonic"),
        )
    )


def betweenness_from_state(
    spark: SparkSession,
    path: str,
    pivots: DataFrame,
    max_hops: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Pivot-sampled betweenness centrality (Brandes 2001, "A faster
    algorithm for betweenness centrality"; horizon-bounded pivot
    estimator per Brandes & Pich 2007, "Centrality estimation in large
    networks") over persisted edge state. Two bounded-superstep passes:

    * FORWARD — the same labeled multi-source BFS as
      :func:`harmonic_closeness_from_state`, except each (pivot, node)
      row carries ``sigma``, the COUNT of shortest paths from the pivot:
      a node first reached at depth h has sigma = Σ sigma(pred at h-1),
      one join + sum per superstep, EXACT in long arithmetic
      (order-independent, so the level relations are deterministic).
    * BACKWARD — Brandes' dependency accumulation descending the
      levels: delta(v) = Σ over shortest-path successors w of
      (sigma_v / sigma_w) · (1 + delta_w); one join + sum per level.
      bc(v) = Σ over pivots of delta(v), the pivot's own source row
      excluded (Brandes accumulates only v ≠ s).

    Paths are counted only up to ``max_hops`` — the estimator's error
    depends on the pivot count and horizon, not |V|, so both are
    precision knobs that hold flat at 100× the graph. On undirected
    state each unordered pair is seen from both endpoints when both are
    sampled, the standard convention for sampled undirected betweenness
    (scores are comparable, not normalized).

    Returns (node, betweenness, n_pivots) for every node reached by at
    least one pivot within the horizon — ``n_pivots`` is how many pivot
    BFS trees the node appears in (its estimate's support), betweenness
    is the double dependency sum (only the final delta divisions are
    floating point; rounding to 4 decimals is stable across
    partitionings).

    Scale shape: forward is closeness's frontier pattern with a sum
    replacing the distinct; backward re-joins each level against the
    edge relation once — 2·max_hops supersteps total, every frontier
    bounded by k·|V| rows, the same exact-count broadcast gates on
    frontier and settled sides, no collect.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    e = edge_state_adjacency(spark, path).select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")
    )
    threshold = _parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    row_bytes = 3 * _RANK_ROW_BYTES  # (pivot, node, sigma)

    def _gate(df: DataFrame, n_rows: int) -> DataFrame:
        return F.broadcast(df) if 0 < n_rows * row_bytes <= threshold else df

    level0 = (
        pivots.select(F.col("node").alias("pivot"))
        .distinct()
        .select(
            "pivot",
            F.col("pivot").alias("node"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    if checkpoint:
        level0 = level0.localCheckpoint(eager=True)
    levels = [level0]
    counts = [level0.count()]
    settled = level0.select("pivot", "node")
    n_settled = counts[0]
    for _h in range(1, max_hops + 1):
        frontier = levels[-1]
        cand = (
            _gate(frontier, counts[-1])
            .join(e, frontier["node"] == e["_s"])
            .groupBy("pivot", F.col("_d").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        sside = settled
        if 0 < n_settled * row_bytes <= threshold:
            sside = F.broadcast(sside)
        new = cand.join(sside, ["pivot", "node"], "left_anti")
        if checkpoint:
            new = new.localCheckpoint(eager=True)
        n_new = new.count()
        if n_new == 0:
            break
        levels.append(new)
        counts.append(n_new)
        settled = settled.unionAll(new.select("pivot", "node"))
        n_settled += n_new

    # backward: deepest level has zero dependency by construction
    cur = levels[-1].withColumn("delta", F.lit(0.0))
    per_level = [cur] if len(levels) > 1 else []
    for h in range(len(levels) - 2, -1, -1):
        w = cur.select(
            "pivot",
            F.col("node").alias("_w"),
            F.col("sigma").alias("_ws"),
            F.col("delta").alias("_wd"),
        )
        lvl = levels[h]
        expanded = _gate(lvl, counts[h]).join(
            e, lvl["node"] == e["_s"]
        ).select("pivot", "node", "sigma", F.col("_d").alias("_w"))
        deltas = (
            expanded.join(_gate(w, counts[h + 1]), ["pivot", "_w"])
            .groupBy("pivot", "node")
            .agg(
                F.sum(
                    (F.col("sigma").cast("double") / F.col("_ws"))
                    * (F.lit(1.0) + F.col("_wd"))
                ).alias("delta")
            )
        )
        cur = lvl.join(deltas, ["pivot", "node"], "left").select(
            "pivot",
            "node",
            "sigma",
            F.coalesce("delta", F.lit(0.0)).alias("delta"),
        )
        if checkpoint:
            cur = cur.localCheckpoint(eager=True)
        if h >= 1:
            per_level.append(cur)

    if not per_level:
        return level0.select("node").limit(0).select(
            "node",
            F.lit(0.0).alias("betweenness"),
            F.lit(0).cast("long").alias("n_pivots"),
        )
    all_deltas = per_level[0].select("pivot", "node", "delta")
    for d in per_level[1:]:
        all_deltas = all_deltas.unionAll(d.select("pivot", "node", "delta"))
    return all_deltas.groupBy("node").agg(
        F.sum("delta").alias("betweenness"),
        F.count(F.lit(1)).cast("long").alias("n_pivots"),
    )


def weighted_paths_from_state(
    spark: SparkSession,
    path: str,
    seeds: DataFrame,
    max_hops: int = 5,
    inverse_weight: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """:func:`graph.weighted_shortest_paths` over persisted edge state:
    the direction-expanded weighted adjacency is read, not rebuilt
    (shared ``_sssp_loop``, same frontier pruning and broadcast gates).
    ``inverse_weight=True`` relaxes over length 1/w — the natural
    "stronger tie = shorter distance" reading of co-occurrence weights
    (Newman 2001, scientific-collaboration networks)."""
    from rust_cdc_validator_spark.operators.graph import _sssp_loop

    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    adj = edge_state_adjacency(spark, path)
    length = (F.lit(1.0) / F.col("w")) if inverse_weight else F.col("w")
    e = adj.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d"), length.alias("_w")
    )
    return _sssp_loop(e, seeds, max_hops, checkpoint)
