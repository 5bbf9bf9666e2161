"""Seeded golden outputs for the rows-only sketch ops (VERDICT r4 #5).

Six catalog queries are xxhash64/LSH/KMeans sketches DuckDB cannot express,
so the driver's oracle gate only checks their ROW COUNTS. A silent behavior
change (different candidates, different neighbors, different cluster roots)
would pass the driver as long as counts held. These tests pin the full
sorted output at sf0.001 with the catalog's fixed seeds against goldens in
tests/goldens/*.json.

Float columns are rounded to 4 decimals before comparison: group contents
are deterministic, but pandas/numpy accumulation order inside a grouped
matmul is not guaranteed across partitionings, so the last float bits are
not part of the contract.

Regenerate on PURPOSE only:  REGEN_GOLDENS=1 python -m pytest tests/test_goldens_sketch_ops.py
(then review the diff — a golden change IS a behavior change).
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path

import pytest

GOLDEN_DIR = Path(__file__).parent / "goldens"
SF_DIR = "/root/testdata/sf0.001"

SKETCH_QUERIES = [
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_lsh_top1",
    "ann_ivf_top1",
    "ann_ivfpq_top1",
    "dedup_clusters_docs",
    "embedding_near_dup_docs",
    "embedding_near_dup_narrow",
    "semantic_dedup_docs",
    "bpe_vocab_docs",
    "training_corpus_neardup",
    "lsh_bucket_overflow_stats",
    "minhash_band_overflow_stats",
    "minhash_index_probe",
    "lsh_index_probe",
    "contamination_bloom_docs",
    "mmr_rerank_docs",
    "ann_recall_report",
    "dedup_cluster_histogram",
    "docs_lsh_planned_neardup",
    "bpe_token_budget",
    "embedding_pca_whiten",
    "trade_betweenness",
]


def test_every_catalog_query_is_gated():
    """Structural invariant (VERDICT r8 #1): every registered catalog
    query must be value-checked by SOME gate — the DuckDB oracle sweep or
    this file's golden pins. Round 8 shipped two queries that escaped
    both; this test makes that impossible to repeat."""
    from rust_cdc_validator_spark.queries import ORACLES, QUERIES

    ungated = set(QUERIES) - set(ORACLES) - set(SKETCH_QUERIES)
    assert not ungated, (
        f"catalog queries with no oracle and no golden pin: {sorted(ungated)}"
    )


def _cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)


def _canon(df) -> dict:
    cols = df.columns
    rows = sorted([_cell(r[c]) for c in cols] for r in df.collect())
    return {"columns": cols, "rows": rows}


@pytest.mark.parametrize("name", SKETCH_QUERIES)
def test_sketch_op_matches_golden(spark, name):
    from rust_cdc_validator_spark.queries import QUERIES

    got = _canon(QUERIES[name](spark, SF_DIR))
    path = GOLDEN_DIR / f"{name}.json"
    if os.environ.get("REGEN_GOLDENS"):
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
        pytest.skip(f"regenerated {path}")
    assert path.exists(), (
        f"missing golden {path} — run REGEN_GOLDENS=1 pytest {__file__}"
    )
    want = json.loads(path.read_text())
    assert got["columns"] == want["columns"]
    assert got["rows"] == want["rows"]
