"""Graph analytics over edge DataFrames: weighted PageRank (Brin & Page
1998) with dangling-mass redistribution, and degree-oriented triangle
counting (Schank & Wagner 2005).

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

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "GraphRunStats",
    "pagerank",
    "triangle_count",
    "degree_assortativity",
    "label_propagation",
    "shortest_hops",
    "weighted_shortest_paths",
    "k_core",
    "hits",
    "adamic_adar",
    "clustering_coefficient",
    "louvain_communities",
    "modularity",
]


@dataclass(frozen=True)
class GraphRunStats:
    """Convergence observability for the iterative operators, returned as
    a real value (r10 advice: the previous ad-hoc DataFrame attributes
    vanished on any select/filter/cache and were invisible to type
    checkers). ``delta`` is pagerank's last L1 rank delta (None when
    ``tol`` is off); ``changes`` is LPA's per-superstep changed-label
    counts (None when tracking is off)."""

    iterations: int
    delta: float | None = None
    changes: list[int] | None = None

#: conservative per-row estimate for the (node, rank) frame when sizing
#: the ranks-side broadcast: string key + double + row overhead
_RANK_ROW_BYTES = 96


def _parse_bytes(v: str | int | None) -> int:
    """Spark size confs come as '10485760', '10m', '10MB', or '-1'."""
    if v is None:
        return -1
    s = str(v).strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return -1


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
    tol: float | None = None,
    checkpoint: bool = True,
    return_stats: bool = False,
    seeds: DataFrame | None = None,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """Rank every node of the directed (optionally weighted) edge set.

    Returns (node, rank) with Σ rank = 1. ``iterations`` fixed steps of
    the power method (5–10 reaches ~1e-3 station for typical graphs);
    ``checkpoint=False`` is for tiny unit-test graphs only — at scale the
    un-truncated lineage is the failure mode, not the compute.

    ``tol``: optional early-stop — after each superstep compute the L1
    rank delta (one 1-row aggregate over the already-checkpointed rank
    frames; the ONLY per-iteration driver action, and only when ``tol``
    is set) and stop once it falls below ``tol``. With ``return_stats``,
    returns ``(ranks, GraphRunStats(iterations, delta))`` — supersteps
    actually run, last L1 delta (None when ``tol`` is None) — for
    convergence observability (r10 advice: stats are a real value now,
    not DataFrame attributes that vanish on the next select). With
    ``tol`` set, per-step checkpointing is forced even on the broadcast
    path so the delta probe never re-executes the chain; ``tol``
    therefore REQUIRES ``checkpoint=True`` (on an un-truncated lineage
    every probe re-runs the whole chain — raised, not silently
    quadratic).

    ``seeds`` (r11): a one-column (``node``) frame switches to
    PERSONALIZED PageRank (Page et al. 1999 §6): the walk restarts into
    the seed set (uniformly over seeds ∩ V) instead of uniformly over
    all nodes — "importance relative to THESE entities", the
    related-entity retrieval primitive. Dangling mass follows the
    teleport vector; ranks still sum to 1; seeds outside the graph are
    ignored and an empty intersection raises.
    """
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
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w"))
    if checkpoint:
        # materialize the edge build ONCE — nodes, out-weights, transition
        # probs, and the dangling set all derive from it, and without this
        # cut each would re-run the caller's upstream joins/aggregations
        e = e.localCheckpoint(eager=True)
    # ONE aggregation derives the node set AND both structural flags
    # (dangling = no out-edges; teleport-only = no in-edges) — replacing a
    # distinct + two anti-join probe jobs with a single union-aggregate
    # whose filters then run against the checkpointed result.
    role = (
        e.select(F.col("_s").alias("node"), F.lit(1).alias("_o"), F.lit(0).alias("_i"))
        .unionAll(
            e.select(F.col("_d").alias("node"), F.lit(0).alias("_o"), F.lit(1).alias("_i"))
        )
        .groupBy("node")
        .agg(F.max("_o").alias("_has_out"), F.max("_i").alias("_has_in"))
    )
    if checkpoint:
        role = role.localCheckpoint(eager=True)
    # ONE probe job for every driver scalar the loop shape depends on —
    # |V|, any-dangling, any-source-only — instead of a count plus two
    # head() jobs (each driver-blocking action costs a full job launch,
    # and these three run before the first iteration can start).
    probe = role.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.when(F.col("_has_out") == 0, 1).otherwise(0)).alias("dang"),
        F.max(F.when(F.col("_has_in") == 0, 1).otherwise(0)).alias("srco"),
    ).first()
    n = int(probe["n"])  # the ONE collected row (three scalars)
    if n == 0:
        raise ValueError("pagerank: edge set is empty")
    nodes = role.select("node")

    out_w = e.groupBy("_s").agg(F.sum("_w").alias("_ow"))
    trans = e.join(out_w, "_s").select(
        "_s", "_d", (F.col("_w") / F.col("_ow")).alias("_p")
    )
    if checkpoint:
        trans = trans.localCheckpoint(eager=True)

    # A graph with no dangling nodes (e.g. any undirected graph) skips the
    # per-iteration mass aggregate entirely — dm is identically zero, so
    # the plans are equivalent and each iteration saves an aggregation +
    # broadcast.
    dangling_nodes = role.filter(F.col("_has_out") == 0).select("node")
    has_dangling = bool(probe["dang"])
    # Nodes with no IN-edges receive only teleport mass; when none exist
    # (any undirected graph), the contribution aggregate already covers
    # every node and the per-iteration nodes left-join is pure overhead —
    # decided once, saving a join + shuffle per iteration.
    has_sources_only = bool(probe["srco"])

    # localCheckpoint scans carry no size stats, so the planner can't pick
    # a broadcast join on its own — gate it on |V| × an estimated row
    # width against the session's own broadcast threshold: small graphs
    # (ranks fit executors) map-side-join every iteration; huge graphs
    # keep the shuffle join. Same decision the optimizer would make with
    # stats, made explicit.
    threshold = _parse_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    broadcast_ranks = 0 < n * _RANK_ROW_BYTES <= threshold

    if seeds is not None:
        nodes = _attach_teleport(nodes, seeds, checkpoint)
    ranks, iterations_used, last_delta = _pagerank_loop(
        nodes,
        trans,
        dangling_nodes,
        n,
        has_dangling,
        has_sources_only,
        broadcast_ranks,
        damping,
        iterations,
        tol,
        checkpoint,
    )
    if return_stats:
        return ranks, GraphRunStats(iterations=iterations_used, delta=last_delta)
    return ranks


def _attach_teleport(
    nodes: DataFrame, seeds: DataFrame, checkpoint: bool
) -> DataFrame:
    """Attach the personalized teleport column: uniform 1/|seeds ∩ V|
    over the seed nodes, 0 elsewhere (Page et al. 1999 §6 personalized
    vector; the random walk restarts INTO the seed set). Seeds outside
    the node set are ignored; an empty intersection raises — a PPR with
    nowhere to restart is undefined. One bounded count job; the teleport
    frame is materialized so per-superstep reuse never re-runs the seed
    join."""
    seed_nodes = seeds.select("node").distinct()
    ns = nodes.join(seed_nodes, "node", "left_semi").count()
    if ns == 0:
        raise ValueError(
            "personalized pagerank: no seed intersects the graph's nodes"
        )
    marked = nodes.join(
        seed_nodes.select("node", F.lit(1).alias("_is_seed")), "node", "left"
    )
    out = marked.select(
        "node",
        F.when(F.col("_is_seed") == 1, F.lit(1.0 / ns))
        .otherwise(F.lit(0.0))
        .alias("_t"),
    )
    if checkpoint:
        out = out.localCheckpoint(eager=True)
    return out


def _pagerank_loop(
    nodes: DataFrame,
    trans: DataFrame,
    dangling_nodes: DataFrame,
    n: int,
    has_dangling: bool,
    has_sources_only: bool,
    broadcast_ranks: bool,
    damping: float,
    iterations: int,
    tol: float | None,
    checkpoint: bool,
) -> tuple[DataFrame, int, float | None]:
    """The power-method supersteps, shared by :func:`pagerank` (which
    derives nodes/transition-probs/dangling from a raw edge frame) and
    ``graphstate.pagerank_from_state`` (which reads them from persisted
    edge state and skips every prep job). ``nodes`` is (node), ``trans``
    is (_s, _d, _p), ``dangling_nodes`` is (node); all three must already
    be materialized (checkpoint or parquet scan) — the loop never
    re-derives them.

    PERSONALIZED mode (r11): when ``nodes`` carries a ``_t`` column (a
    teleport distribution summing to 1 — nonzero only on the seed set
    for personalized PageRank), the uniform 1/n teleport is replaced by
    ``_t`` everywhere it appears: the init vector, the (1−d) restart
    mass, and the dangling redistribution. The update then always joins
    through the nodes frame (a zero-teleport node with no in-edges must
    still emit its row), and mass stays 1 because Σ _t = 1."""
    personalized = "_t" in nodes.columns
    if personalized:
        tcol = F.col("_t")
        ranks = nodes.select("node", tcol.alias("rank"))
        base_expr = F.lit(1.0 - damping) * tcol
    else:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
        base_expr = F.lit((1.0 - damping) / n)
    iterations_used = iterations
    last_delta = None
    for it in range(iterations):
        prev_ranks = ranks
        rside = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            trans.join(rside, trans["_s"] == rside["node"])
            .groupBy("_d")
            .agg(F.sum(rside["rank"] * F.col("_p")).alias("_c"))
        )
        if has_sources_only or personalized:
            # contrib is ≤|V| rows of (key, double) — the same size class
            # as the rank frame, so the same gate applies: broadcasting
            # the (non-preserved) right side turns this per-superstep
            # left join into a map-side BHJ instead of an SMJ exchange
            # pair (measured 0.67→0.48 s/superstep on the PPR query).
            cside = F.broadcast(contrib) if broadcast_ranks else contrib
            updated = nodes.join(cside, nodes["node"] == cside["_d"], "left")
        else:
            updated = contrib.select(F.col("_d").alias("node"), "_c")
        if has_dangling:
            dm = dangling_nodes.join(ranks, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
            )
            updated = updated.crossJoin(F.broadcast(dm))
            redistributed = F.col("_dm") * (
                tcol if personalized else F.lit(1.0 / n)
            )
        else:
            redistributed = F.lit(0.0)
        ranks = updated.select(
            "node",
            (
                base_expr
                + F.lit(damping)
                * (F.coalesce(F.col("_c"), F.lit(0.0)) + redistributed)
            ).alias("rank"),
        )
        # Shuffle path: truncate lineage EVERY superstep (nested shuffle
        # joins are the iterative-plan failure mode). Broadcast path: each
        # iteration's broadcast exchange already materializes the previous
        # ranks inside one job, so per-step checkpoints only add 1 job per
        # superstep — checkpoint once at the end instead (so callers with
        # multiple downstream actions don't re-run the chain).
        if checkpoint and (
            tol is not None or not broadcast_ranks or it == iterations - 1
        ):
            ranks = ranks.localCheckpoint(eager=True)
        if tol is not None:
            last_delta = (
                ranks.join(
                    prev_ranks.select(
                        "node", F.col("rank").alias("_prev")
                    ),
                    "node",
                )
                .agg(
                    F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("_l1")
                )
                .first()["_l1"]
            )
            if last_delta is not None and last_delta < tol:
                iterations_used = it + 1
                break
    return ranks, iterations_used, last_delta


def _canonical_edges_and_degrees(
    edges: DataFrame, src: str, dst: str
) -> tuple[DataFrame, DataFrame]:
    """Shared front half of the undirected-graph statistics: canonical
    distinct pairs (small, large), plus the (node, _deg) relation —
    materialized once and size-gated for broadcast (the degrees frame is
    |V| rows of (key, long); when that fits the session's broadcast
    threshold both degree-attach joins become map-side, the same explicit
    decision pagerank makes for its rank frame)."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("_a").alias("node"))
        .unionAll(und.select(F.col("_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .localCheckpoint(eager=True)
    )
    threshold = _parse_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    if 0 < deg.count() * _RANK_ROW_BYTES <= threshold:
        deg = F.broadcast(deg)
    return und, deg


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts of the UNDIRECTED graph induced by
    ``edges`` (direction, duplicates, and self-loops are dropped) —
    (node, triangles), one row per node that closes at least one triangle.

    Triangles are the third leg of the graph-analytics family (reach:
    ``connected_components``; importance: ``pagerank``; cohesion: local
    clustering) — a linkage/dedup pipeline reads them as "how clique-like
    is this match cluster", and Σ triangles / Σ wedges is the global
    clustering coefficient.

    Degree-oriented node-iterator (Schank & Wagner 2005; the MapReduce
    formulation is Suri & Vassilvitskii 2011, "the curse of the last
    reducer"): orient every undirected edge from its (degree, id)-smaller
    endpoint to its larger one — a total order, so the oriented graph is
    acyclic and every triangle survives as EXACTLY ONE wedge
    u→v, u→w (v before w in the order) closed by v→w. Counting wedge
    closures therefore needs no de-duplication, and the orientation bounds
    every out-degree by O(√|E|): a celebrity node of degree d contributes
    C(d,2) wedges un-oriented, but oriented it RECEIVES high-degree edges
    instead of fanning them out — the skew is structural, not mitigated.

    Scale shape at 100 TB: one distinct on canonical pairs (shuffle |E|),
    one degree aggregation (map-side combining), two degree-attach joins
    (degrees frame is |V| rows of (key, long) — Catalyst broadcasts when
    small), the wedge self-join shuffled on the shared source, and the
    closure join shuffled on the (v, w) pair key. All arithmetic is
    comparisons and counts — a SQL oracle replays it row for row.
    """
    und, deg = _canonical_edges_and_degrees(edges, src, dst)
    return _triangle_core(und, deg)


def _triangle_core(und: DataFrame, deg: DataFrame) -> DataFrame:
    """The orientation + wedge-closure half of :func:`triangle_count`,
    shared with ``graphstate.triangle_count_from_state`` (which reads the
    canonical pairs and degrees from persisted edge state instead of
    deriving them). ``und`` is (_a, _b) canonical distinct pairs; ``deg``
    is (node, _deg), possibly broadcast-hinted."""
    da = deg.select(F.col("node").alias("_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("node").alias("_b"), F.col("_deg").alias("_db"))
    keyed = und.join(da, "_a").join(db, "_b")
    ka = F.struct(F.col("_da").alias("d"), F.col("_a").alias("n"))
    kb = F.struct(F.col("_db").alias("d"), F.col("_b").alias("n"))
    oriented = keyed.select(
        F.when(ka < kb, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(ka < kb, F.col("_b")).otherwise(F.col("_a")).alias("_v"),
        # the head's order key rides along so the wedge join can order its
        # two endpoints without re-attaching degrees
        F.when(ka < kb, kb).otherwise(ka).alias("_vk"),
    )
    o1 = oriented.select(
        F.col("_u"), F.col("_v").alias("_x"), F.col("_vk").alias("_xk")
    )
    o2 = oriented.select(
        F.col("_u"), F.col("_v").alias("_y"), F.col("_vk").alias("_yk")
    )
    wedges = o1.join(o2, "_u").filter(F.col("_xk") < F.col("_yk"))
    closing = oriented.select(
        F.col("_u").alias("_x"), F.col("_v").alias("_y")
    )
    tris = wedges.join(closing, ["_x", "_y"]).select("_u", "_x", "_y")
    return (
        tris.select(
            F.explode(F.array("_u", "_x", "_y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the undirected
    graph induced by ``edges`` — the Pearson correlation of endpoint
    degrees over all edges, each edge contributing both orientations.
    Positive: hubs link to hubs (social nets); negative: hubs link to
    leaves (hub-and-spoke supply/co-purchase graphs). Completes the graph
    diagnostic family: reach (components), importance (pagerank),
    cohesion (triangles), mixing (this).

    One row: (n_nodes, n_edges, avg_degree, assortativity_r). Degenerate
    degree variance (e.g. a perfect cycle) reports NULL r, as corr does.

    Shape: distinct canonical pairs (one |E| shuffle), a degree agg, two
    node-keyed degree-attach joins, one global corr agg — every join key
    is a node id, nothing wide moves, and the SQL oracle replays it.
    """
    und, deg = _canonical_edges_and_degrees(edges, src, dst)
    return _assortativity_core(und, deg)


def _assortativity_core(und: DataFrame, deg: DataFrame) -> DataFrame:
    """The degree-attach + correlation half of
    :func:`degree_assortativity`, shared with
    ``graphstate.degree_assortativity_from_state``."""
    da = deg.select(F.col("node").alias("_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("node").alias("_b"), F.col("_deg").alias("_db"))
    keyed = und.join(da, "_a").join(db, "_b")
    # both orientations in ONE pass (explode, not unionAll — the union
    # form re-executes the two degree-attach joins)
    both = keyed.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_da").cast("double").alias("_x"),
                    F.col("_db").cast("double").alias("_y"),
                ),
                F.struct(
                    F.col("_db").cast("double").alias("_x"),
                    F.col("_da").cast("double").alias("_y"),
                ),
            )
        ).alias("_p")
    ).select(F.col("_p._x").alias("_x"), F.col("_p._y").alias("_y"))
    n_nodes = deg.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_deg").alias("sd")
    )
    # corr() under ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO on a
    # degree-regular graph (zero variance); try_divide over the explicit
    # covar/stddev form returns NULL there, matching SQL corr semantics
    stats = both.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        F.round(
            F.try_divide(
                F.covar_pop("_x", "_y"),
                F.stddev_pop("_x") * F.stddev_pop("_y"),
            ),
            6,
        ).alias("assortativity_r"),
    )
    return stats.crossJoin(F.broadcast(n_nodes)).select(
        F.col("n").alias("n_nodes"),
        "n_edges",
        F.round(F.col("sd") / F.col("n"), 6).alias("avg_degree"),
        "assortativity_r",
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    checkpoint: bool = True,
    track_convergence: bool = False,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) over the UNDIRECTED graph induced by ``edges``
    (direction, duplicates, self-loops dropped). Every node starts with
    its own id as label; each superstep it adopts the most frequent label
    among its neighbors, breaking count ties toward the SMALLEST label —
    the asynchronous/random tie-break of the paper is replaced with a
    total order so runs (and the SQL oracle) are bit-reproducible.
    Returns (node, label); nodes sharing a label after ``iterations``
    supersteps are one community.

    Scale shape: the symmetrized neighbor relation materializes once
    (localCheckpoint, like pagerank's edge build). Each superstep is one
    |E|-keyed join + a (node, label) count aggregation (map-side partial
    combine) + a per-node argmax window whose partition is bounded by the
    node's distinct NEighbor-label count (≤ degree) — no global sort, no
    driver collect, lineage truncated per step. Iterations are fixed
    (LPA oscillates on bipartite structures; synchronous + fixed count is
    the deterministic choice — callers pick 3–7).

    ``track_convergence``: after each superstep count the nodes whose
    label CHANGED (one count aggregate over the already-checkpointed
    label frames — the only per-superstep driver action, mirroring
    pagerank's ``tol`` probe) and stop early once a superstep changes
    nothing (a fixed point: further synchronous steps are identity).
    It REQUIRES ``checkpoint=True`` — on an un-truncated lineage every
    per-superstep count() re-executes the whole chain (raised, not
    silently quadratic). With ``return_stats``, returns
    ``(labels, GraphRunStats(iterations, changes=[...]))`` — supersteps
    actually run and per-superstep changed counts (``None`` when
    tracking is off) — as a real value, not DataFrame attributes."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if track_convergence and not checkpoint:
        raise ValueError(
            "track_convergence requires checkpoint=True: each "
            "per-superstep changed-count would re-execute the "
            "un-truncated iteration lineage"
        )
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    # both directions in ONE pass: a unionAll of two selects would
    # evaluate the whole und subtree (including the caller's edge build)
    # twice before the checkpoint materializes — explode duplicates each
    # row map-side instead
    nbr = und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_a").alias("_n"), F.col("_b").alias("_nb")
                ),
                F.struct(
                    F.col("_b").alias("_n"), F.col("_a").alias("_nb")
                ),
            )
        ).alias("_x")
    ).select(F.col("_x._n").alias("_n"), F.col("_x._nb").alias("_nb"))
    if checkpoint:
        nbr = nbr.localCheckpoint(eager=True)
    labels = nbr.select(F.col("_n").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    if checkpoint:
        # the loop's broadcast gate counts the init frame and superstep 1
        # joins it — materialize so the node-set distinct runs once
        labels = labels.localCheckpoint(eager=True)
    labels, iterations_used, changes = _lpa_loop(
        nbr, labels, iterations, checkpoint, track_convergence
    )
    if return_stats:
        return labels, GraphRunStats(
            iterations=iterations_used, changes=changes
        )
    return labels


def _lpa_loop(
    nbr: DataFrame,
    labels: DataFrame,
    iterations: int,
    checkpoint: bool,
    track_convergence: bool,
    n: int | None = None,
) -> tuple[DataFrame, int, list[int] | None]:
    """The synchronous LPA supersteps, shared by
    :func:`label_propagation` (which symmetrizes a raw edge frame) and
    ``graphstate.label_propagation_from_state`` (which reads the
    pre-exploded neighbor relation from persisted edge state). ``nbr``
    is (_n, _nb), already symmetric/dedup'd/self-loop-free and
    materialized; ``labels`` is the (node, label) init (materialized or
    cheap to re-derive — the broadcast gate counts it once).

    Superstep shape (r11): the labels side is size-gated for BROADCAST
    exactly like pagerank's rank frame — checkpointed label frames carry
    no stats, so without the gate supersteps ≥ 2 fall back to a
    sort-merge join that EXCHANGES AND SORTS the full |E| neighbor
    relation every step; with it the join is map-side and the only |E|
    pass is the (node, label) count aggregate with map-side partial
    combine. The per-node argmax stays a row_number window: Spark's
    WindowGroupLimit pushes the top-1 below the exchange, so only ≤1 row
    per (partition, node) shuffles."""
    threshold = _parse_bytes(
        nbr.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10m"
        )
    )
    if n is None:  # from-state callers pass the params' pinned n_nodes
        n = labels.count()
    broadcast_labels = 0 < n * _RANK_ROW_BYTES <= threshold
    w = Window.partitionBy("_n").orderBy(
        F.col("_c").desc(), F.col("label").asc()
    )
    changes: list[int] | None = [] if track_convergence else None
    iterations_used = iterations
    for it in range(iterations):
        prev = labels
        lside = F.broadcast(labels) if broadcast_labels else labels
        counts = (
            nbr.join(lside, nbr["_nb"] == lside["node"])
            .groupBy("_n", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        labels = (
            counts.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("_n").alias("node"), "label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
        if track_convergence:
            changed = (
                labels.join(
                    prev.select("node", F.col("label").alias("_prev")),
                    "node",
                )
                .filter(F.col("label") != F.col("_prev"))
                .count()
            )
            changes.append(changed)
            if changed == 0:
                iterations_used = it + 1
                break
    return labels, iterations_used, changes


def shortest_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 5,
    directed: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Minimum hop distance from ANY seed node to every node reachable
    within ``max_hops`` — frontier BFS (unweighted single-source-set
    shortest paths). ``seeds`` is a one-column (``node``) frame. Returns
    (node, hops) with hops 0 for the seeds themselves; unreachable nodes
    are absent.

    Scale shape: classic frontier expansion — each hop joins ONLY the
    newly-discovered frontier (not the whole distance table) against the
    edge relation, dedups the candidates, and anti-joins the settled set,
    so total work is O(Σ frontier-adjacent edges) ≈ O(E) across all hops,
    not O(E × hops). The settled set and each frontier are checkpointed
    (iterative-lineage discipline, as pagerank). One bounded driver probe
    per hop (``take(1)`` on the new frontier) stops early when the BFS
    exhausts before the cap — the same jobs-per-superstep budget the
    pressure test pins for pagerank. Replays in SQL as a bounded-depth
    recursive CTE (see TRADE_REACH_HOPS_SQL).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    if directed:
        e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    else:
        # one-pass doubling (explode, not unionAll — the union form
        # evaluates the caller's edge build twice before the checkpoint)
        e = edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("_s"), F.col(dst).alias("_d")
                    ),
                    F.struct(
                        F.col(dst).alias("_s"), F.col(src).alias("_d")
                    ),
                )
            ).alias("_x")
        ).select(F.col("_x._s").alias("_s"), F.col("_x._d").alias("_d"))
    e = e.filter(F.col("_s") != F.col("_d")).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    return _bfs_loop(e, seeds, max_hops, checkpoint)


def _bfs_loop(
    e: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    checkpoint: bool,
) -> DataFrame:
    """The frontier supersteps, shared by :func:`shortest_hops` (which
    symmetrizes/dedups a raw edge frame) and
    ``graphstate.shortest_hops_from_state`` (which reads the pre-exploded
    adjacency from persisted edge state). ``e`` is (_s, _d), already
    direction-expanded, dedup'd, and materialized.

    Per-hop join shape (r11): the frontier and settled-set sizes are
    KNOWN to the driver exactly — the per-hop emptiness probe is a
    count() over the checkpointed new frontier (same one job the old
    take(1) cost), and the settled total is its running sum — so both
    the frontier-expansion join and the settled anti-join are size-gated
    for broadcast with exact numbers, not estimates. Checkpointed frames
    carry no stats, so without the gates every hop falls back to
    sort-merge joins that exchange and sort the full |E| adjacency AND
    the candidate set; with them, e is scanned map-side per hop and only
    the candidate distinct exchanges. Past the threshold (frontiers near
    |V| on a 100 TB graph) the shuffle join is the honest fallback —
    the same explicit decision pagerank's rank frame makes."""
    threshold = _parse_bytes(
        e.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    dist = seeds.select("node").distinct().select(
        "node", F.lit(0).cast("int").alias("hops")
    )
    if checkpoint:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("node")
    n_frontier = n_settled = dist.count()
    for h in range(1, max_hops + 1):
        fside = (
            F.broadcast(frontier)
            if 0 < n_frontier * _RANK_ROW_BYTES <= threshold
            else frontier
        )
        cand = (
            fside.join(e, fside["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .distinct()
        )
        settled = dist.select("node")
        if 0 < n_settled * _RANK_ROW_BYTES <= threshold:
            settled = F.broadcast(settled)
        new = cand.join(settled, "node", "left_anti").select(
            "node", F.lit(h).cast("int").alias("hops")
        )
        if checkpoint:
            new = new.localCheckpoint(eager=True)
        n_frontier = new.count()
        if n_frontier == 0:
            break
        # dist is a UNION of already-checkpointed frontier frames — its
        # lineage stays flat (a scan per materialized hop, no recursive
        # joins), so re-checkpointing the whole table every hop would
        # only add a job and an O(V) copy per hop for nothing.
        dist = dist.unionAll(new)
        n_settled += n_frontier
        frontier = new.select("node")
    return dist


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 10,
    checkpoint: bool = True,
) -> DataFrame:
    """k-core peeling (Seidman 1983) over the UNDIRECTED graph induced by
    ``edges`` (direction, duplicates, self-loops dropped): repeatedly
    remove nodes with degree < ``k`` until a fixed point (or ``rounds``
    synchronous peels, whichever first). Returns the surviving (node,
    core_deg) — core_deg is the node's degree WITHIN the final survivor
    set, so a converged run has every core_deg ≥ k, and a round-capped
    run exposes the not-yet-peeled frontier (observability over silent
    truncation). The LLM-pipeline use: core membership separates densely
    embedded entities from peripheral/spam structure — link-graph quality
    signals at corpus scale.

    Scale shape: each peel is two survivor-filter joins on the
    materialized adjacency plus one degree aggregate (map-side combined,
    ≤ |V| result rows). The survivor frame's size is KNOWN to the driver
    exactly (the fixed-point probe is a count), so both filter joins are
    size-gated for broadcast like pagerank's ranks — under the threshold
    the adjacency never exchanges; past it the shuffle join is the
    honest fallback. Lineage truncates per peel (checkpoint), and the
    loop stops the first round that removes nothing."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    adj = und.select(
        F.explode(
            F.array(
                F.struct(F.col("_a").alias("_s"), F.col("_b").alias("_d")),
                F.struct(F.col("_b").alias("_s"), F.col("_a").alias("_d")),
            )
        ).alias("_x")
    ).select(F.col("_x._s").alias("_s"), F.col("_x._d").alias("_d"))
    if checkpoint:
        adj = adj.localCheckpoint(eager=True)
    return _kcore_loop(adj, k, rounds, checkpoint)


def _kcore_loop(
    adj: DataFrame, k: int, rounds: int, checkpoint: bool
) -> DataFrame:
    """The synchronous peels, shared by :func:`k_core` (raw edge frame)
    and ``graphstate.k_core_from_state`` (persisted adjacency). ``adj``
    is (_s, _d), direction-expanded, dedup'd, self-loop-free, and
    materialized."""
    threshold = _parse_bytes(
        adj.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    deg = adj.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
    if checkpoint:
        deg = deg.localCheckpoint(eager=True)
    n_alive = deg.count()
    for _ in range(rounds):
        alive = deg.filter(F.col("core_deg") >= k).select(
            F.col("_s").alias("_n")
        )
        if checkpoint:
            alive = alive.localCheckpoint(eager=True)
        n_next = alive.count()
        if n_next == n_alive:
            break
        n_alive = n_next
        if n_alive == 0:
            return deg.filter(F.lit(False)).select(
                F.col("_s").alias("node"), "core_deg"
            )
        aside = (
            F.broadcast(alive)
            if 0 < n_alive * _RANK_ROW_BYTES <= threshold
            else alive
        )
        a2 = aside.select(F.col("_n").alias("_n2"))
        deg = (
            adj.join(aside, adj["_s"] == aside["_n"])
            .join(a2, adj["_d"] == F.col("_n2"))
            .groupBy("_s")
            .agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
        )
        if checkpoint:
            deg = deg.localCheckpoint(eager=True)
    return deg.select(F.col("_s").alias("node"), "core_deg")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over a directed
    (optionally weighted) edge set: a node is a good HUB if it points at
    good authorities and a good AUTHORITY if good hubs point at it — the
    mutual-reinforcement pair PageRank collapses into one score. On a
    bipartite relation (customer→supplier, query→document) the two
    scores land on the two sides: hubs rank the pointing side,
    authorities the pointed-at side.

    Returns (node, hub, auth) for every node of the graph, L1-normalized
    (each column sums to 1 — the standard normalization expressed
    without a sqrt so a SQL oracle replays it with plain arithmetic;
    HITS rankings are normalization-invariant).

    Spark-first iterative shape (same discipline as ``pagerank``): each
    half-step is ONE keyed join (edges ⋈ scores) and ONE map-side-
    combining aggregation — no driver-side score state; lineage is
    truncated once per full iteration (the hub frame). Because the
    recurrence is LINEAR, normalizing per step only rescales every
    subsequent vector by a constant — so the loop runs on RAW sums and
    normalizes ONCE at the end (two 1-row in-plan totals), saving two
    aggregate+crossJoin pairs per iteration. The price is growth of the
    raw values at ~(max node strength)^iterations; doubles carry ~1e308,
    so at the default 3 (and any sane ≤20 on real graphs) this is far
    from overflow — pre-scale weights or lower ``iterations`` for
    pathological magnitudes. The scores frame broadcast-gates against
    the session threshold exactly like the rank loop.

    Scale shape at 100 TB: two |E| shuffles per iteration (join on the
    score key, agg on the opposite key), scores are O(|V|) two-column
    rows, and the normalizing total is a 1-row in-plan aggregate —
    never a collect. Nodes with no out-edges simply receive hub 0 (and
    mirror-image for auth): HITS has no dangling-mass correction to
    carry, which is why the loop is two joins, not three.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionAll(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        raise ValueError("hits: edge set is empty")
    threshold = _parse_bytes(
        edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    broadcast_scores = 0 < n * _RANK_ROW_BYTES <= threshold
    return _hits_loop(e, nodes, broadcast_scores, iterations, checkpoint)


def _hits_loop(
    e: DataFrame,
    nodes: DataFrame,
    broadcast_scores: bool,
    iterations: int,
    checkpoint: bool,
) -> DataFrame:
    """The mutual-reinforcement half-steps, shared by :func:`hits`
    (which derives nodes from a raw edge frame) and
    ``graphstate.hits_from_state`` (which reads the node set and edge
    relation from persisted state and skips every prep job). ``e`` is
    (_s, _d, _w); ``nodes`` is (node); both must already be materialized
    (checkpoint or parquet scan)."""

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("_tot"))
        return scores.crossJoin(F.broadcast(total)).select(
            "node", (F.col(col) / F.col("_tot")).alias(col)
        )

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for it in range(iterations):
        hside = F.broadcast(hub) if broadcast_scores else hub
        auth = (
            e.join(hside, e["_s"] == hside["node"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum(F.col("_w") * F.col("hub")).alias("auth"))
        )
        last = it == iterations - 1
        if checkpoint and last:
            # the final auth is read three times (hub half-step, its own
            # normalizing total, the output join) — cut it
            auth = auth.localCheckpoint(eager=True)
        aside = F.broadcast(auth) if broadcast_scores else auth
        hub = (
            e.join(aside, e["_d"] == aside["node"])
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum(F.col("_w") * F.col("auth")).alias("hub"))
        )
        if checkpoint:
            # per-iteration lineage cut; the final hub is also read twice
            # (normalizing total + output join)
            hub = hub.localCheckpoint(eager=True)
    auth = _norm(auth, "auth")
    hub = _norm(hub, "hub")
    return (
        nodes.join(hub.withColumnRenamed("node", "_hn"),
                   nodes["node"] == F.col("_hn"), "left")
        .join(auth.withColumnRenamed("node", "_an"),
              nodes["node"] == F.col("_an"), "left")
        .select(
            "node",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = 1000,
) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar, Social Networks 2003)
    between DST nodes through shared SRC neighbors: for every pair of
    dst nodes with at least one common src neighbor,
    ``aa_score = Σ_{shared src c} 1 / ln(out_deg(c))`` — common-neighbor
    counting where promiscuous neighbors (a customer who buys from
    everyone) are discounted by their degree, the classic "predict the
    missing link / recommend the partner" primitive. Returns
    (node_a, node_b, common_neighbors, aa_score) with node_a < node_b.

    Spark shape: out-degrees in one aggregation; src nodes with degree 1
    (no pair to witness) or degree > ``max_degree`` are dropped BEFORE
    the quadratic self-join — the same hub-cap hygiene as
    ``association_rules.max_basket_size`` and the LSH bucket caps, making
    worst-case fan-out |SRC| × cap². The 1/ln(d) weight attaches to each
    edge pre-join so the pair aggregation is a plain sum.

    Scale shape at 100 TB: one shuffle keys the self-join on src; pair
    aggregation combines map-side on (node_a, node_b). A degree-capped
    hub contributes ~1/ln(cap) ≈ 0.14 per pair it witnesses — dropping
    it loses near-zero signal while removing cap² fan-out rows, which is
    why the cap defaults ON (pass ``max_degree=None`` to disable).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    return _adamic_adar_core(e, deg, max_degree)


def _adamic_adar_core(
    e: DataFrame, deg: DataFrame, max_degree: int | None
) -> DataFrame:
    """Shared back half of :func:`adamic_adar` and
    ``graphstate.adamic_adar_from_state`` (which feeds already-distinct
    pairs and persisted degrees, skipping the distinct exchange and the
    degree aggregation entirely). ``e`` is (_s, _d) distinct directed
    pairs; ``deg`` is (_s, _deg) out-degrees."""
    if max_degree is not None:
        deg = deg.filter(F.col("_deg") <= max_degree)
    weighted = (
        e.join(deg.filter(F.col("_deg") >= 2), "_s")
        .select("_s", "_d", (1.0 / F.log(F.col("_deg"))).alias("_aa"))
        # BOTH sides of the pair self-join read this relation — without
        # the cut each side re-runs the distinct + degree join (measured
        # ~2x on the catalog query); |E|-sized, three narrow columns
        .localCheckpoint(eager=True)
    )
    other = weighted.select(
        F.col("_s").alias("_s2"), F.col("_d").alias("_d2")
    )
    return (
        weighted.join(
            other,
            (F.col("_s") == F.col("_s2")) & (F.col("_d") < F.col("_d2")),
        )
        .groupBy(
            F.col("_d").alias("node_a"), F.col("_d2").alias("node_b")
        )
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("_aa").alias("aa_score"),
        )
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient (Watts & Strogatz 1998) per node of
    the undirected graph induced by ``edges``: cc(v) = triangles(v) /
    C(deg(v), 2) — what fraction of v's neighbor pairs are themselves
    connected. (node, degree, triangles, cc) for every node of degree
    ≥ 2; cc is triangles·2 as an exact integer numerator over the
    integer wedge count, divided once — engine-portable.

    Composes the degree-oriented triangle core with the degree relation
    it already derives (one extra |V|-sized join over
    :func:`triangle_count`, nothing fact-sized). A dedup/linkage
    pipeline reads cc as "how clique-like is this node's neighborhood"
    — near 1: a tight duplicate cluster or genuine community; near 0 on
    high degree: a hub stitching unrelated records (the classic false-
    link smell the fuzzy-match audits look for).
    """
    und, deg = _canonical_edges_and_degrees(edges, src, dst)
    return _clustering_core(und, deg)


def _clustering_core(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Shared back half of :func:`clustering_coefficient` and
    ``graphstate.clustering_coefficient_from_state``."""
    tri = _triangle_core(und, deg)
    degs = deg.select("node", F.col("_deg").alias("degree"))
    return (
        degs.join(tri, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            (
                (F.coalesce("triangles", F.lit(0)) * 2).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("cc"),
        )
    )


def weighted_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    max_hops: int = 5,
    directed: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Hop-bounded weighted shortest-path costs from ANY seed node —
    Bellman-Ford relaxation (Bellman 1958) with the frontier pruning of
    delta-stepping's simplest case: superstep h relaxes ONLY nodes whose
    tentative distance improved in superstep h-1, and the loop stops
    early the first time nothing improves. ``seeds`` is a one-column
    (``node``) frame; edge lengths come from ``weight_col`` and must be
    non-negative for the hop-bounded answer to equal true shortest
    paths truncated at ``max_hops`` edges. Returns (node, dist) with
    dist 0.0 for seeds; unreachable nodes are absent.

    This is the weighted sibling of :func:`shortest_hops` — same
    frontier supersteps, except the frontier carries (node, dist) and
    improvement replaces novelty: a node can RE-ENTER the frontier when
    a longer-hop-count but cheaper path reaches it (the case unweighted
    BFS never has).

    Spark shape per superstep: frontier ⋈ edges (size-gated for
    broadcast with the driver-known frontier count), a map-side-
    combining MIN per candidate node, then one left join against the
    settled distances to keep strict improvements; the running distance
    relation is lineage-cut per superstep. All arithmetic is double
    path sums and MIN — order-independent, so a SQL oracle replays the
    unrolled relaxation exactly.

    Scale shape at 100 TB: ≤ max_hops supersteps of one |frontier|·deg
    expansion + one min-combine shuffle; the distance relation is
    O(|V|) narrow rows; nothing collects. Negative weights raise (the
    hop bound would silently change the answer's meaning).
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    w = F.col(weight_col).cast("double")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w"))
    if not directed:
        e = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("_s"), F.col("_d"), F.col("_w")),
                    F.struct(
                        F.col("_d").alias("_s"),
                        F.col("_s").alias("_d"),
                        F.col("_w"),
                    ),
                )
            ).alias("_x")
        ).select("_x._s", "_x._d", "_x._w")
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    neg = e.agg(F.min("_w").alias("m")).first()["m"]
    if neg is not None and neg < 0:
        raise ValueError(
            "weighted_shortest_paths requires non-negative edge weights "
            f"(found {neg}): with a hop bound, negative relaxation changes "
            "the meaning of the answer"
        )
    return _sssp_loop(e, seeds, max_hops, checkpoint)


def _sssp_loop(
    e: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    checkpoint: bool,
) -> DataFrame:
    """The relaxation supersteps, shared by :func:`weighted_shortest_paths`
    and ``graphstate.weighted_paths_from_state``. ``e`` is (_s, _d, _w),
    already direction-expanded and materialized. Frontier and distance
    sizes are driver-known exactly (the per-step improvement probe IS the
    count), so both the expansion join and the improvement join are
    size-gated for broadcast with exact numbers — the `_bfs_loop`
    discipline."""
    threshold = _parse_bytes(
        e.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    dist = seeds.select("node").distinct().select(
        "node", F.lit(0.0).alias("dist")
    )
    if checkpoint:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist
    n_frontier = n_dist = dist.count()
    for _h in range(1, max_hops + 1):
        fside = (
            F.broadcast(frontier)
            if 0 < n_frontier * _RANK_ROW_BYTES <= threshold
            else frontier
        )
        cand = (
            fside.join(e, fside["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("_cd"))
        )
        dside = dist.select("node", F.col("dist").alias("_old"))
        if 0 < n_dist * _RANK_ROW_BYTES <= threshold:
            dside = F.broadcast(dside)
        improved = (
            cand.join(dside, "node", "left")
            .filter(F.col("_old").isNull() | (F.col("_cd") < F.col("_old")))
            .select(
                "node",
                F.col("_cd").alias("dist"),
                F.col("_old").isNull().cast("int").alias("_new"),
            )
        )
        if checkpoint:
            improved = improved.localCheckpoint(eager=True)
        # ONE probe job per round instead of two: the frontier count and
        # the post-merge dist size together — n_dist grows by exactly the
        # never-seen nodes (improved-existing rows replace via the
        # min-combine, leaving the count unchanged), so the second O(|V|)
        # count() pass over the merged dist relation is redundant.
        probe = improved.agg(
            F.count(F.lit(1)).alias("_n"), F.sum("_new").alias("_a")
        ).first()
        n_frontier = int(probe["_n"])
        if n_frontier == 0:
            break
        n_dist += int(probe["_a"] or 0)
        improved = improved.select("node", "dist")
        # strict improvements replace: min-combine old and new in ONE pass
        dist = (
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            dist = dist.localCheckpoint(eager=True)
        frontier = improved
    return dist


def louvain_communities(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    sweeps: int = 6,
    checkpoint: bool = True,
    track_convergence: bool = False,
    return_stats: bool = False,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """Modularity-based community detection: the LOCAL-MOVING phase of
    Louvain (Blondel, Guillaume, Lambiotte & Lefebvre 2008) over the
    undirected weighted graph induced by ``edges`` — each node
    iteratively joins the neighboring community with the largest
    modularity gain ΔQ(u→C) ∝ k_{u,C} − k_u·Σtot(C)/2m, starting from
    singletons. The coarsening phase is deliberately omitted (a
    supernode graph invalidates the node-level assignment most consumers
    want; phase-1 alone is the "local moving" used by Leiden's first
    step too), so the result is one community label per ORIGINAL node —
    directly comparable to :func:`label_propagation`, but optimizing an
    explicit objective instead of majority vote.

    Determinism contract (no randomized sequential sweep): moves are
    SYNCHRONOUS but parity-gated — sweep s only lets nodes whose first
    md5 hex digit has parity s%2 move (the engine-portable md5_bucket
    hash, so the SQL oracle replays the gate) — which breaks the
    two-node swap oscillation of naive synchronous Louvain while keeping
    runs bit-reproducible across partitionings; a node moves only on a
    STRICT gain (staying wins all score ties via the window tie-break),
    and equal-gain targets break toward the smallest community id.

    Scale shape (the _lpa_loop discipline): per sweep, Σtot is a |V|
    agg, k_{u,C} is the one |E| pass (join + map-side-combined sum),
    the assignment/degree/Σtot joins are broadcast-gated exactly like
    pagerank's rank frame, and the per-node argmax is a row_number
    window bounded by the node's distinct neighbor-community count
    (WindowGroupLimit collapses it below the exchange). Lineage is cut
    per sweep. ``track_convergence`` early-stops on a zero-move sweep —
    note a zero-move EVEN sweep can still be followed by odd-parity
    moves, so convergence means one full even+odd round without moves.
    """
    if sweeps < 1:
        raise ValueError("sweeps must be >= 1")
    if track_convergence and not checkpoint:
        raise ValueError(
            "track_convergence requires checkpoint=True: each per-sweep "
            "move-count would re-execute the un-truncated lineage"
        )
    a, b = F.col(src), F.col(dst)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"), w.alias("_w"))
        .filter(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.sum("_w").alias("_w"))
    )
    adj = und.select(
        F.explode(
            F.array(
                F.struct(F.col("_a").alias("src"), F.col("_b").alias("dst"), F.col("_w").alias("w")),
                F.struct(F.col("_b").alias("src"), F.col("_a").alias("dst"), F.col("_w").alias("w")),
            )
        ).alias("_x")
    ).select("_x.src", "_x.dst", "_x.w")
    if checkpoint:
        adj = adj.localCheckpoint(eager=True)
    kdeg = adj.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("k"))
    if checkpoint:
        kdeg = kdeg.localCheckpoint(eager=True)
    comms = kdeg.select("node", F.col("node").alias("comm"))
    return _louvain_loop(
        adj, kdeg, comms, sweeps, checkpoint, track_convergence, return_stats
    )


def _md5_parity(col: F.Column) -> F.Column:
    """Deterministic, engine-portable node parity: first md5 hex digit
    mod 2 (the operators/corpus.md5_bucket contract — the SQL oracle
    rebuilds it with one strpos lookup; xxhash64 has no DuckDB twin)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 1), 16, 10).cast("int")
        % 2
    )


def _louvain_loop(
    adj: DataFrame,
    kdeg: DataFrame,
    comms: DataFrame,
    sweeps: int,
    checkpoint: bool,
    track_convergence: bool,
    return_stats: bool,
    n: int | None = None,
    two_m: float | None = None,
) -> DataFrame | tuple[DataFrame, GraphRunStats]:
    """The parity-gated synchronous local-moving sweeps, shared by
    :func:`louvain_communities` (which symmetrizes raw edges) and
    ``graphstate.louvain_from_state`` (which reads the pre-exploded
    adjacency + degree relations from persisted edge state). ``adj`` is
    (src, dst, w) symmetric/dedup'd/self-loop-free and materialized;
    ``kdeg`` is (node, k); ``comms`` the (node, comm) init.

    When ``kdeg`` carries a ``_par`` column (graphstate's long-encoded
    caller: the md5 parity of the ORIGINAL node string, pinned at dict
    build), the move gate reads it instead of hashing the key — the
    long-encoded key must NOT be hashed (md5 of the long's decimal form
    is a different schedule than md5 of the node string)."""
    spark = adj.sparkSession
    threshold = _parse_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    )
    # callers with pinned graph facts (louvain_from_state: params n_nodes
    # and the memoized Σout_w — both pure functions of the immutable
    # state) pass them in; the raw-edges path still probes. For integral
    # weights the memoized sum is identical to a fresh aggregation; with
    # fractional weights it can differ from a re-probe in the last ulp
    # (float sums reorder), which is fine — the value is used
    # consistently within a run.
    if n is None:
        n = kdeg.count()
    gate = lambda df: (  # noqa: E731
        F.broadcast(df) if 0 < n * _RANK_ROW_BYTES <= threshold else df
    )
    if two_m is None:
        two_m = kdeg.agg(F.sum("k")).first()[0]
    if not two_m:
        out = comms
        return (out, GraphRunStats(iterations=0, changes=[])) if return_stats else out
    win = Window.partitionBy("src").orderBy(
        F.col("_score").desc(), F.col("_stay").desc(), F.col("_nc").asc()
    )
    changes: list[int] | None = [] if track_convergence else None
    sweeps_used = sweeps
    for s in range(sweeps):
        prev = comms
        sig = (
            comms.join(gate(kdeg), "node")
            .groupBy("comm")
            .agg(F.sum("k").alias("_sig"))
        )
        nbr_comm = adj.join(
            gate(comms.select(F.col("node").alias("dst"), F.col("comm").alias("_nc"))),
            "dst",
        ).select("src", "_nc", "w")
        stay_zero = comms.select(
            F.col("node").alias("src"), F.col("comm").alias("_nc"), F.lit(0.0).alias("w")
        )
        kuc = (
            nbr_comm.unionByName(stay_zero)
            .groupBy("src", "_nc")
            .agg(F.sum("w").alias("_kuc"))
        )
        pinned_parity = "_par" in kdeg.columns
        kcols = ["k", "_par"] if pinned_parity else ["k"]
        cand = (
            kuc.join(gate(comms.select(F.col("node").alias("src"), F.col("comm").alias("_d"))), "src")
            .join(gate(kdeg.select(F.col("node").alias("src"), *kcols)), "src")
            .join(gate(sig.select(F.col("comm").alias("_nc"), "_sig")), "_nc")
        )
        stay = F.col("_nc") == F.col("_d")
        score = F.when(
            stay,
            F.col("_kuc") - F.col("k") * (F.col("_sig") - F.col("k")) / F.lit(two_m),
        ).otherwise(F.col("_kuc") - F.col("k") * F.col("_sig") / F.lit(two_m))
        winner = (
            cand.select(
                "src", "_nc", "_d", *(["_par"] if pinned_parity else []),
                score.alias("_score"),
                stay.cast("int").alias("_stay"),
            )
            .withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
        )
        eligible = (
            F.col("_par") == F.lit(s % 2)
            if pinned_parity
            else _md5_parity(F.col("src")) == F.lit(s % 2)
        )
        comms = winner.select(
            F.col("src").alias("node"),
            F.when(eligible, F.col("_nc")).otherwise(F.col("_d")).alias("comm"),
        )
        if checkpoint:
            comms = comms.localCheckpoint(eager=True)
        if track_convergence:
            moved = (
                comms.join(prev.select("node", F.col("comm").alias("_p")), "node")
                .filter(F.col("comm") != F.col("_p"))
                .count()
            )
            changes.append(moved)
            # converged = a full even+odd round without moves
            if len(changes) >= 2 and changes[-1] == 0 and changes[-2] == 0:
                sweeps_used = s + 1
                break
    if return_stats:
        return comms, GraphRunStats(iterations=sweeps_used, changes=changes)
    return comms


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Newman modularity of a community ``assignment`` (node, comm) over
    the undirected weighted graph induced by ``edges``: per community,
    Σin (internal weight, both directions) and Σtot (member degree mass),
    contribution = Σin/2m − (Σtot/2m)², and Q = Σ contributions
    (Newman & Girvan 2004). Returns one row per community plus the exact
    decimal-summed contributions so Q is partitioning-independent; the
    estimator any community detector (LPA, Louvain) is scored against.

    Scale shape: two broadcast-gated assignment joins onto the |E|
    relation + one |V| degree agg; every cross-row float sum goes
    through exact decimals (Σin/Σtot are sums of input weights; the
    per-community contribution divides once in double)."""
    a, b = F.col(src), F.col(dst)
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"), w.alias("_w"))
        .filter(F.col("_a") != F.col("_b"))
        .groupBy("_a", "_b")
        .agg(F.sum("_w").alias("_w"))
    )
    adj = und.select(
        F.explode(
            F.array(
                F.struct(F.col("_a").alias("src"), F.col("_b").alias("dst"), F.col("_w").alias("w")),
                F.struct(F.col("_b").alias("src"), F.col("_a").alias("dst"), F.col("_w").alias("w")),
            )
        ).alias("_x")
    ).select("_x.src", "_x.dst", "_x.w")
    return _modularity_core(adj, assignment)


def _modularity_core(adj: DataFrame, assignment: DataFrame) -> DataFrame:
    """Per-community modularity table from a pre-exploded symmetric
    (src, dst, w) adjacency and a (node, comm) assignment."""
    dec = "decimal(38,6)"
    kdeg = adj.groupBy(F.col("src").alias("node")).agg(
        F.sum(F.col("w").cast(dec)).alias("_k")
    )
    two_m_rel = kdeg.agg(F.sum("_k").cast("double").alias("_2m"))
    sides = adj.join(
        assignment.select(F.col("node").alias("src"), F.col("comm").alias("_cs")),
        "src",
    ).join(
        assignment.select(F.col("node").alias("dst"), F.col("comm").alias("_cd")),
        "dst",
    )
    inw = (
        sides.filter(F.col("_cs") == F.col("_cd"))
        .groupBy(F.col("_cs").alias("comm"))
        .agg(F.sum(F.col("w").cast(dec)).alias("_in"))
    )
    sig = (
        assignment.join(kdeg, "node")
        .groupBy("comm")
        .agg(F.sum("_k").alias("_sig"), F.count(F.lit(1)).alias("n_members"))
    )
    per = (
        sig.join(inw, "comm", "left")
        .crossJoin(F.broadcast(two_m_rel))
        .select(
            "comm",
            "n_members",
            F.coalesce(F.col("_in").cast("double"), F.lit(0.0)).alias("internal_w"),
            F.col("_sig").cast("double").alias("sigma_tot"),
            (
                F.coalesce(F.col("_in").cast("double"), F.lit(0.0)) / F.col("_2m")
                - (F.col("_sig").cast("double") / F.col("_2m"))
                * (F.col("_sig").cast("double") / F.col("_2m"))
            ).alias("contribution"),
        )
    )
    return per
