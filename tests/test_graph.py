"""PageRank (operators/graph.py): equivalence against a pure-Python
power-method reference on small graphs, mass conservation with dangling
nodes, weight sensitivity, and argument validation."""

from __future__ import annotations

import random

import pytest

from rust_cdc_validator_spark.operators.graph import pagerank


def _reference(edges, damping=0.85, iterations=5, weights=None):
    """Driver-side power method, same dangling redistribution."""
    ws = weights or {e: 1.0 for e in edges}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    outw = {}
    for (a, b), w in ws.items():
        outw[a] = outw.get(a, 0.0) + w
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if v not in outw)
        nxt = {v: (1.0 - damping) / n + damping * dm / n for v in nodes}
        for (a, b), w in ws.items():
            nxt[b] += damping * r[a] * w / outw[a]
        r = nxt
    return r


def _ranks(df):
    return {row["node"]: row["rank"] for row in df.collect()}


def test_matches_reference_simple_cycle_with_chord(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _ranks(pagerank(df, checkpoint=False))
    want = _reference(edges)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_mass_redistributed(spark):
    # 'c' is a pure sink: without redistribution total mass decays
    edges = [("a", "c"), ("b", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _ranks(pagerank(df, checkpoint=False, iterations=7))
    want = _reference(edges, iterations=7)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["c"] > got["a"] == pytest.approx(got["b"], abs=1e-12)


def test_weights_steer_rank(spark):
    edges = [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = _ranks(pagerank(df, weight_col="w", checkpoint=False))
    want = _reference(
        [(s, d) for s, d, _ in edges],
        weights={(s, d): w for s, d, w in edges},
    )
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert got["b"] > got["c"]  # 90% of a's vote goes to b


def test_checkpointed_equals_uncheckpointed(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    with_cp = _ranks(pagerank(df, checkpoint=True, iterations=3))
    without = _ranks(pagerank(df, checkpoint=False, iterations=3))
    assert with_cp == without


def test_tol_early_stop_converges_before_cap(spark):
    # a 2-cycle reaches its stationary distribution immediately (both
    # ranks stay 0.5 every step), so step 1's L1 delta is ~0 and a
    # 50-iteration cap must stop at the first probe.
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    out, stats = pagerank(df, iterations=50, tol=1e-9, return_stats=True)
    assert stats.iterations < 50
    assert stats.delta < 1e-9
    got = _ranks(out)
    assert got["a"] == pytest.approx(0.5, abs=1e-12)
    assert got["b"] == pytest.approx(0.5, abs=1e-12)


def test_tol_none_runs_fixed_count_and_matches_reference(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out, stats = pagerank(
        df, iterations=5, tol=None, checkpoint=False, return_stats=True
    )
    assert stats.iterations == 5
    assert stats.delta is None
    want = _reference(edges, iterations=5)
    got = _ranks(out)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_validations(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError, match="tol must be positive"):
        pagerank(df, tol=0.0)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)


def test_triangle_count_known_graph(spark):
    from rust_cdc_validator_spark.operators.graph import triangle_count

    # K4 on 1..4 (4 triangles, 3 per node) + pendant 5 + noise the
    # normalization must drop: self-loop, duplicate, reversed duplicate
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5),
        (2, 2), (3, 2), (4, 3),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # pendant 5 closes nothing


def test_triangle_count_matches_bruteforce(spark):
    from itertools import combinations

    from rust_cdc_validator_spark.operators.graph import triangle_count

    # deterministic pseudo-random graph on 30 nodes
    rng = random.Random(42)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(200)
            )
            if a != b
        }
    )
    adj = {v: set() for e in edges for v in e}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected: dict[int, int] = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                expected[n] = expected.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == expected and expected  # non-trivial graph


def test_assortativity_star_and_cycle(spark):
    from rust_cdc_validator_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_assortativity(star).first()
    assert (r["n_nodes"], r["n_edges"]) == (6, 5)
    assert r["assortativity_r"] == -1.0  # pure hub-and-spoke
    # perfect cycle: zero degree variance -> NULL r, like corr
    cyc = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    rc = degree_assortativity(cyc).first()
    assert rc["assortativity_r"] is None and rc["avg_degree"] == 2.0


def test_assortativity_matches_numpy(spark):
    import numpy as np

    from rust_cdc_validator_spark.operators.graph import degree_assortativity

    rng = random.Random(7)
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(25), rng.randrange(25)) for _ in range(120))
            if a != b
        }
    )
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ys = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    want = float(np.corrcoef(xs, ys)[0, 1])
    df = spark.createDataFrame(edges, "src long, dst long")
    got = degree_assortativity(df).first()
    assert abs(got["assortativity_r"] - round(want, 6)) <= 1e-6
    assert got["n_edges"] == len(edges)


# ---------------------------------------------------------------------------
# Label propagation (r9)
# ---------------------------------------------------------------------------

def _lpa_reference(edges, iterations):
    """Driver-side synchronous LPA with the same min-label tie-break."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    labels = {v: v for v in nbrs}
    for _ in range(iterations):
        nxt = {}
        for v, ns in nbrs.items():
            counts = {}
            for u in ns:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            mc = max(counts.values())
            nxt[v] = min(l for l, c in counts.items() if c == mc)
        labels = nxt
    return labels



def test_lpa_two_cliques_converge_to_min_ids(spark):
    from rust_cdc_validator_spark.operators.graph import label_propagation

    cliq1 = [("a", "b"), ("b", "c"), ("a", "c")]
    cliq2 = [("x", "y"), ("y", "z"), ("x", "z")]
    df = spark.createDataFrame(cliq1 + cliq2, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=4, checkpoint=False).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_lpa_matches_reference_random_graph(spark):
    import random

    from rust_cdc_validator_spark.operators.graph import label_propagation

    rng = random.Random(11)
    edges = list(
        {
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(120)
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    for iters in (1, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(
                df, iterations=iters, checkpoint=False
            ).collect()
        }
        assert got == _lpa_reference(edges, iters)


def test_lpa_partition_invariance_and_validation(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.graph import label_propagation

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    one = {
        r["node"]: r["label"]
        for r in label_propagation(df.repartition(1), iterations=3).collect()
    }
    many = {
        r["node"]: r["label"]
        for r in label_propagation(df.repartition(7), iterations=3).collect()
    }
    assert one == many
    with _pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


def test_lpa_track_convergence_early_stop(spark):
    """VERDICT r9 #5: with track_convergence, LPA reports labels-changed
    per superstep and stops at the fixed point — two cliques converge in
    2 supersteps (changes then 0), well before a cap of 10."""
    from rust_cdc_validator_spark.operators.graph import label_propagation

    cliq1 = [("a", "b"), ("b", "c"), ("a", "c")]
    cliq2 = [("x", "y"), ("y", "z"), ("x", "z")]
    df = spark.createDataFrame(cliq1 + cliq2, "src string, dst string")
    out, stats = label_propagation(
        df, iterations=10, track_convergence=True, return_stats=True
    )
    got = {r["node"]: r["label"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}
    assert stats.iterations < 10  # stopped before the cap
    assert stats.changes[-1] == 0  # the stopping superstep changed nothing
    assert all(c >= 0 for c in stats.changes)
    # tracking off: no per-step probe, stats report that
    _, fixed = label_propagation(
        df, iterations=3, checkpoint=False, return_stats=True
    )
    assert fixed.iterations == 3 and fixed.changes is None
    # the probe-requires-checkpoint contracts raise instead of going
    # quadratic on an un-truncated lineage (r10 advice)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="track_convergence"):
        label_propagation(
            df, iterations=3, checkpoint=False, track_convergence=True
        )
    from rust_cdc_validator_spark.operators.graph import pagerank as _pr

    with _pytest.raises(ValueError, match="tol requires"):
        _pr(df, tol=1e-6, checkpoint=False)


# ---------------------------------------------------------------------------
# Shortest hops / BFS (r9)
# ---------------------------------------------------------------------------

def _bfs_reference(edges, seeds, max_hops, directed):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = h
                    nxt.add(u)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_shortest_hops_matches_reference(spark):
    from rust_cdc_validator_spark.operators.graph import shortest_hops

    rng = random.Random(5)
    edges = list(
        {(rng.randrange(40), rng.randrange(40)) for _ in range(150)}
    )
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    for directed in (True, False):
        got = {
            r["node"]: r["hops"]
            for r in shortest_hops(
                df, seeds, max_hops=6, directed=directed, checkpoint=False
            ).collect()
        }
        assert got == _bfs_reference(edges, [0, 1], 6, directed)


def test_shortest_hops_early_exhaustion_and_cap(spark):
    from rust_cdc_validator_spark.operators.graph import shortest_hops

    # chain 0 -> 1 -> 2 -> 3; cap at 2 hops cuts node 3
    chain = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    capped = {
        r["node"]: r["hops"]
        for r in shortest_hops(chain, seeds, max_hops=2).collect()
    }
    assert capped == {0: 0, 1: 1, 2: 2}
    # exhaustion before the cap: max_hops=50 still terminates with all 4
    full = {
        r["node"]: r["hops"]
        for r in shortest_hops(chain, seeds, max_hops=50).collect()
    }
    assert full == {0: 0, 1: 1, 2: 2, 3: 3}
    with pytest.raises(ValueError, match="max_hops"):
        shortest_hops(chain, seeds, max_hops=-1)


# ---------------------------------------------------------------------------
# k-core peeling (r11)
# ---------------------------------------------------------------------------

def test_kcore_cascade_and_survivors(spark):
    """A triangle with a pendant chain: k=2 peels the chain node by node
    (a real cascade — each removal drops the next node under k) and
    leaves exactly the triangle, every survivor at core_deg 2."""
    from rust_cdc_validator_spark.operators.graph import k_core

    edges = [("a", "b"), ("b", "c"), ("a", "c"),  # triangle
             ("c", "d"), ("d", "e"), ("e", "f")]  # pendant chain
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["core_deg"] for r in k_core(df, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_whole_graph_is_core(spark):
    """k=1 on a connected graph peels nothing — first round is a no-op
    and the loop early-stops, returning full degrees."""
    from rust_cdc_validator_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: r["core_deg"] for r in k_core(df, k=1).collect()}
    assert got == {"a": 1, "b": 2, "c": 1}


def test_kcore_empties_and_validations(spark):
    from rust_cdc_validator_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    # a path has no 2-core
    assert k_core(df, k=2).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        k_core(df, k=0)
    with _pytest.raises(ValueError, match="rounds"):
        k_core(df, k=2, rounds=0)


def test_kcore_round_cap_matches_unrolled_semantics(spark):
    """With rounds capped below convergence, the output is the degrees
    after exactly that many peels — the contract the fixed-unroll SQL
    oracle replays. Path a-b-c-d-e, k=2: round 1 peels the endpoints;
    capping there leaves b,c,d with their restricted degrees."""
    from rust_cdc_validator_spark.operators.graph import k_core

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {r["node"]: r["core_deg"] for r in k_core(df, k=2, rounds=1).collect()}
    assert got == {"b": 1, "c": 2, "d": 1}
    # run to convergence: the whole path peels away
    assert k_core(df, k=2).count() == 0


def test_kcore_from_state_matches_direct(spark, tmp_path):
    from rust_cdc_validator_spark.operators.graph import k_core
    from rust_cdc_validator_spark.operators.graphstate import (
        build_edge_state,
        k_core_from_state,
    )

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    path = str(tmp_path / "kcore_state")
    build_edge_state(df, path, directed=False, buckets=2)
    direct = {r["node"]: r["core_deg"] for r in k_core(df, k=2).collect()}
    from_state = {
        r["node"]: r["core_deg"]
        for r in k_core_from_state(spark, path, k=2).collect()
    }
    assert from_state == direct == {"a": 2, "b": 2, "c": 2}
    # directed state refused
    path2 = str(tmp_path / "kcore_directed")
    build_edge_state(df, path2, directed=True, buckets=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="undirected"):
        k_core_from_state(spark, path2, k=2)


# ---------------------------------------------------------------------------
# Personalized PageRank (r11)
# ---------------------------------------------------------------------------

def _ppr_reference(edges, seeds, damping=0.85, iterations=5):
    """Driver-side personalized power method: teleport and dangling mass
    both follow the seed-uniform vector; init at the teleport vector."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outd = {}
    for a, _ in edges:
        outd[a] = outd.get(a, 0) + 1
    sset = [v for v in nodes if v in seeds]
    t = {v: (1.0 / len(sset) if v in sset else 0.0) for v in nodes}
    r = dict(t)
    for _ in range(iterations):
        dm = sum(r[v] for v in nodes if v not in outd)
        nxt = {v: (1.0 - damping) * t[v] + damping * dm * t[v] for v in nodes}
        for a, b in edges:
            nxt[b] += damping * r[a] / outd[a]
        r = nxt
    return r


def test_personalized_pagerank_matches_reference(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]  # d dangles
    df = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("zzz",)], "node string")  # zzz ignored
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, seeds=seeds, iterations=5).collect()
    }
    want = _ppr_reference(edges, {"a"}, iterations=5)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # restart mass concentrates near the seed: a outranks the uniform case
    uniform = {
        r["node"]: r["rank"] for r in pagerank(df, iterations=5).collect()
    }
    assert got["a"] > uniform["a"]


def test_personalized_pagerank_from_state_and_validation(spark, tmp_path):
    from rust_cdc_validator_spark.operators.graphstate import (
        build_edge_state,
        pagerank_from_state,
    )

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    path = str(tmp_path / "ppr_state")
    build_edge_state(df, path, directed=False, buckets=2)
    seeds = spark.createDataFrame([("d",)], "node string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_from_state(spark, path, seeds=seeds, iterations=4).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["d"] == max(got.values())  # restart node dominates
    bad = spark.createDataFrame([("nope",)], "node string")
    with pytest.raises(ValueError, match="no seed"):
        pagerank_from_state(spark, path, seeds=bad)


# ---------------------------------------------------------------- HITS


def _hits_reference(edges, weights=None, iterations=3):
    """Driver-side HITS with L1 normalization, same half-step order as
    the operator (auth from hub, then hub from the NEW auth)."""
    ws = weights or {e: 1.0 for e in edges}
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        auth = {v: 0.0 for v in nodes}
        for (a, b), w in ws.items():
            auth[b] += w * hub[a]
        tot = sum(auth.values())
        auth = {v: s / tot for v, s in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for (a, b), w in ws.items():
            hub[a] += w * auth[b]
        tot = sum(hub.values())
        hub = {v: s / tot for v, s in hub.items()}
    return hub, auth


def test_hits_matches_reference_bipartite(spark):
    from rust_cdc_validator_spark.operators.graph import hits

    edges = [
        ("c1", "s1"), ("c1", "s2"), ("c2", "s1"), ("c3", "s1"),
        ("c3", "s3"), ("c4", "s2"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, checkpoint=False).collect()}
    hub, auth = _hits_reference(edges)
    assert set(got) == set(hub)
    for v in hub:
        assert got[v][0] == pytest.approx(hub[v], abs=1e-12)
        assert got[v][1] == pytest.approx(auth[v], abs=1e-12)
    # bipartite: the pointing side has auth 0, the pointed side hub 0
    assert got["c1"][1] == 0.0 and got["s1"][0] == 0.0


def test_hits_weighted_and_validation(spark):
    from rust_cdc_validator_spark.operators.graph import hits

    edges = [("c1", "s1", 10.0), ("c1", "s2", 1.0), ("c2", "s2", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r["node"]: r["auth"] for r in
           hits(df, weight_col="w", checkpoint=False).collect()}
    hub, auth = _hits_reference(
        [(a, b) for a, b, _ in edges],
        weights={(a, b): w for a, b, w in edges},
    )
    for v in auth:
        assert got[v] == pytest.approx(auth[v], abs=1e-12)
    assert got["s1"] > got["s2"]  # the heavy edge dominates
    with pytest.raises(ValueError, match="iterations"):
        hits(df, iterations=0)


def test_hits_checkpointed_equals_uncheckpointed(spark):
    from rust_cdc_validator_spark.operators.graph import hits

    random.seed(7)
    edges = list({
        (f"u{random.randrange(8)}", f"v{random.randrange(8)}")
        for _ in range(30)
    })
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, checkpoint=True).collect()}
    b = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, checkpoint=False).collect()}
    assert a == b


# --------------------------------------------------------- Adamic-Adar


def test_adamic_adar_hand_computed(spark):
    import math

    from rust_cdc_validator_spark.operators.graph import adamic_adar

    # c1 -> {s1, s2, s3} (deg 3); c2 -> {s1, s2} (deg 2); c3 -> {s3} (deg 1)
    edges = [
        ("c1", "s1"), ("c1", "s2"), ("c1", "s3"),
        ("c2", "s1"), ("c2", "s2"), ("c3", "s3"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar(df).collect()
    }
    w3, w2 = 1 / math.log(3), 1 / math.log(2)
    assert got[("s1", "s2")] == (2, pytest.approx(w3 + w2, abs=1e-12))
    assert got[("s1", "s3")] == (1, pytest.approx(w3, abs=1e-12))
    assert got[("s2", "s3")] == (1, pytest.approx(w3, abs=1e-12))
    assert len(got) == 3  # degree-1 c3 witnesses no pair


def test_adamic_adar_degree_cap_drops_hub(spark):
    from rust_cdc_validator_spark.operators.graph import adamic_adar

    edges = [("hub", f"s{i}") for i in range(5)] + [
        ("c1", "s0"), ("c1", "s1")
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    capped = {
        (r["node_a"], r["node_b"]) for r in
        adamic_adar(df, max_degree=4).collect()
    }
    assert capped == {("s0", "s1")}  # only c1 (deg 2) survives the cap
    full = adamic_adar(df, max_degree=None).collect()
    assert len(full) == 10  # C(5,2) pairs from the hub; (s0,s1) merged


# ------------------------------------------------- clustering coefficient


def test_clustering_coefficient_known_graphs(spark):
    from rust_cdc_validator_spark.operators.graph import clustering_coefficient

    # triangle a-b-c plus pendant d on a: cc(a)=1/3 (d breaks one pair),
    # cc(b)=cc(c)=1, d has degree 1 and is excluded
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: (r["degree"], r["triangles"], r["cc"])
           for r in clustering_coefficient(df).collect()}
    assert got["a"] == (3, 1, pytest.approx(1 / 3))
    assert got["b"] == (2, 1, 1.0)
    assert got["c"] == (2, 1, 1.0)
    assert "d" not in got


def test_clustering_coefficient_matches_bruteforce(spark):
    import itertools
    import random

    from rust_cdc_validator_spark.operators.graph import clustering_coefficient

    random.seed(13)
    nodes = [f"n{i}" for i in range(12)]
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2)
        if random.random() < 0.3
    ]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["cc"] for r in clustering_coefficient(df).collect()}
    for v, nbrs in adj.items():
        if len(nbrs) < 2:
            assert v not in got
            continue
        closed = sum(
            1 for x, y in itertools.combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        want = closed / (len(nbrs) * (len(nbrs) - 1) / 2)
        assert got[v] == pytest.approx(want, abs=1e-12), v


def test_clustering_from_state_equals_direct(spark, tmp_path):
    from rust_cdc_validator_spark.operators.graph import clustering_coefficient
    from rust_cdc_validator_spark.operators.graphstate import (
        build_edge_state,
        clustering_coefficient_from_state,
    )

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    path = str(tmp_path / "es")
    build_edge_state(df, path, directed=False)
    direct = {tuple(r) for r in clustering_coefficient(df).collect()}
    state = {tuple(r) for r in
             clustering_coefficient_from_state(spark, path).collect()}
    assert direct == state


# ---------------------------------------------- weighted_shortest_paths


def _dijkstra_reference(edges, seeds, max_hops, directed):
    """Sequential hop-bounded Bellman-Ford on dicts."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        if not directed:
            adj.setdefault(d, []).append((s, w))
    dist = {s: 0.0 for s in seeds}
    for _ in range(max_hops):
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in adj.get(u, []):
                if du + w < nxt.get(v, float("inf")):
                    nxt[v] = du + w
        dist = nxt
    return dist


def test_weighted_paths_prefer_cheap_long_routes(spark):
    from rust_cdc_validator_spark.operators.graph import (
        weighted_shortest_paths,
    )

    # a->z direct costs 10; a->b->c->z costs 3 — more hops, cheaper,
    # the case unweighted BFS can never express
    edges = [
        ("a", "z", 10.0),
        ("a", "b", 1.0), ("b", "c", 1.0), ("c", "z", 1.0),
        ("z", "y", 2.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["dist"]
        for r in weighted_shortest_paths(
            df, seeds, max_hops=4, directed=True
        ).collect()
    }
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "z": 3.0, "y": 5.0}
    # hop bound 1 only sees the direct edge
    bounded = {
        r["node"]: r["dist"]
        for r in weighted_shortest_paths(
            df, seeds, max_hops=1, directed=True
        ).collect()
    }
    assert bounded == {"a": 0.0, "z": 10.0, "b": 1.0}


def test_weighted_paths_match_reference_random(spark):
    import random

    from rust_cdc_validator_spark.operators.graph import (
        weighted_shortest_paths,
    )

    rng = random.Random(13)
    nodes = [f"n{i}" for i in range(20)]
    edges = [
        (*rng.sample(nodes, 2), round(rng.uniform(0.5, 5.0), 3))
        for _ in range(60)
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    seeds_l = ["n0", "n5"]
    seeds = spark.createDataFrame([(s,) for s in seeds_l], "node string")
    for directed in (True, False):
        for hops in (1, 3, 6):
            got = {
                r["node"]: r["dist"]
                for r in weighted_shortest_paths(
                    df, seeds, max_hops=hops, directed=directed
                ).collect()
            }
            ref = _dijkstra_reference(edges, seeds_l, hops, directed)
            assert set(got) == set(ref), (directed, hops)
            for n, d in got.items():
                assert d == pytest.approx(ref[n], abs=1e-9), (n, directed, hops)


def test_weighted_paths_validation_and_state_variant(spark, tmp_path):
    from rust_cdc_validator_spark.operators.graph import (
        weighted_shortest_paths,
    )
    from rust_cdc_validator_spark.operators.graphstate import (
        build_edge_state,
        weighted_paths_from_state,
    )

    df = spark.createDataFrame(
        [("a", "b", -1.0)], "src string, dst string, w double"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="non-negative"):
        weighted_shortest_paths(df, seeds)
    with pytest.raises(ValueError, match="max_hops"):
        weighted_shortest_paths(df, seeds, max_hops=-1)

    edges = [("a", "b", 4.0), ("b", "c", 1.0), ("a", "c", 1.0)]
    good = spark.createDataFrame(edges, "src string, dst string, w double")
    path = str(tmp_path / "sssp_state")
    build_edge_state(good, path, weight_col="w", directed=False, buckets=2)
    got = {
        r["node"]: r["dist"]
        for r in weighted_paths_from_state(spark, path, seeds, max_hops=3).collect()
    }
    # state weights: a-b 4, b-c 1, a-c 1 -> b best via c
    assert got == {"a": 0.0, "c": 1.0, "b": 2.0}
    inv = {
        r["node"]: r["dist"]
        for r in weighted_paths_from_state(
            spark, path, seeds, max_hops=3, inverse_weight=True
        ).collect()
    }
    # inverse: length(a-b)=0.25 direct beats 1/1+1/1=2.0 via c
    assert inv == {"a": 0.0, "b": 0.25, "c": 1.0}


# ---------------------------------------------------------------------------
# Louvain local-moving + modularity (r12)
# ---------------------------------------------------------------------------


def _two_cliques(spark):
    """K4 {1..4} + K4 {5..8} joined by the bridge (4,5)."""
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    edges.append((4, 5))
    return spark.createDataFrame(edges, "src long, dst long")


def test_louvain_finds_cliques_and_modularity_matches_hand_value(spark):
    from rust_cdc_validator_spark.operators.graph import (
        louvain_communities,
        modularity,
    )

    g = _two_cliques(spark)
    comms = louvain_communities(g, sweeps=6)
    got = {r["node"]: r["comm"] for r in comms.collect()}
    assert len(set(got.values())) == 2
    assert len({got[n] for n in (1, 2, 3, 4)}) == 1
    assert len({got[n] for n in (5, 6, 7, 8)}) == 1
    per = modularity(g, comms).collect()
    q = sum(r["contribution"] for r in per)
    # hand value: m=13, per clique in=12, tot=13 → 2*(12/26 - (13/26)^2)
    assert abs(q - 2 * (12 / 26 - 0.25)) < 1e-9
    for r in per:
        assert r["n_members"] == 4
        assert r["internal_w"] == 12.0
        assert r["sigma_tot"] == 13.0


def test_louvain_deterministic_across_partitionings(spark):
    from rust_cdc_validator_spark.operators.graph import louvain_communities

    g = _two_cliques(spark)
    a = sorted(map(tuple, louvain_communities(g, sweeps=4).collect()))
    b = sorted(
        map(tuple, louvain_communities(g.repartition(13), sweeps=4).collect())
    )
    assert a == b


def test_louvain_modularity_nondecreasing_over_sweeps(spark):
    """Pinned regression property on a fixed random graph: each extra
    even+odd sweep round never lowers modularity (parity gating makes
    each half-sweep a batch of independent strict-gain moves against a
    frozen opposite-parity configuration)."""
    from rust_cdc_validator_spark.operators.graph import (
        louvain_communities,
        modularity,
    )

    rng = random.Random(7)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    g = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    qs = []
    for sweeps in (2, 4, 6):
        comms = louvain_communities(g, sweeps=sweeps)
        qs.append(
            sum(r["contribution"] for r in modularity(g, comms).collect())
        )
    assert qs[0] <= qs[1] + 1e-12 and qs[1] <= qs[2] + 1e-12, qs


def test_louvain_beats_singletons_and_validation(spark):
    import pytest as _pytest

    from rust_cdc_validator_spark.operators.graph import (
        louvain_communities,
        modularity,
    )

    g = _two_cliques(spark)
    nodes = g.selectExpr("src as node").union(g.selectExpr("dst")).distinct()
    singletons = nodes.selectExpr("node", "node as comm")
    q0 = sum(r["contribution"] for r in modularity(g, singletons).collect())
    comms, stats = louvain_communities(
        g, sweeps=8, track_convergence=True, return_stats=True
    )
    q1 = sum(r["contribution"] for r in modularity(g, comms).collect())
    assert q1 > q0
    # converged: the recorded move counts end with a full zero round
    assert stats.changes[-1] == 0 and stats.changes[-2] == 0
    with _pytest.raises(ValueError):
        louvain_communities(g, sweeps=0)
    with _pytest.raises(ValueError):
        louvain_communities(g, track_convergence=True, checkpoint=False)


def test_louvain_from_state_equals_direct(spark, tmp_path):
    from rust_cdc_validator_spark.operators.graph import (
        louvain_communities,
        modularity,
    )
    from rust_cdc_validator_spark.operators.graphstate import (
        build_edge_state,
        louvain_from_state,
        modularity_from_state,
    )

    g = _two_cliques(spark)
    path = str(tmp_path / "state")
    build_edge_state(g, path, directed=False)
    direct = sorted(map(tuple, louvain_communities(g, sweeps=4).collect()))
    from_state = sorted(
        map(tuple, louvain_from_state(spark, path, sweeps=4).collect())
    )
    assert direct == from_state
    comms = louvain_from_state(spark, path, sweeps=4)
    a = sorted(map(tuple, modularity_from_state(spark, path, comms).collect()))
    b = sorted(map(tuple, modularity(g, comms).collect()))
    assert a == b


def test_modularity_singleton_formula(spark):
    """Q over singletons = −Σ(k_u/2m)² exactly (no internal edges)."""
    from rust_cdc_validator_spark.operators.graph import modularity

    g = _two_cliques(spark)
    nodes = g.selectExpr("src as node").union(g.selectExpr("dst")).distinct()
    singletons = nodes.selectExpr("node", "node as comm")
    per = modularity(g, singletons).collect()
    degs = {1: 3, 2: 3, 3: 3, 5: 3, 6: 3, 7: 3, 4: 4, 8: 4}
    expect = -sum((k / 26) ** 2 for k in degs.values())
    assert abs(sum(r["contribution"] for r in per) - expect) < 1e-9
    assert all(r["internal_w"] == 0.0 for r in per)
