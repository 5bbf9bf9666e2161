"""PageRank (operators/graph.py): equivalence against a pure-Python
power-method reference on small graphs, mass conservation with dangling
nodes, weight sensitivity, and argument validation."""

from __future__ import annotations

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


def test_validations(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty)
