"""Streaming JSONL ingest (streaming/ingest.py): quarantine parity with
the batch reader, resumable incremental drains."""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from rust_cdc_validator_spark.streaming.ingest import ingest_jsonl_stream

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _drop(dirpath, name, lines):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _run(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    ingest_jsonl_stream(spark, src, dest, quar, _SCHEMA, ckpt)
    return src, dest, quar, ckpt


def test_ingest_splits_and_resumes_incrementally(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(
        src,
        "a.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "one"}),
            "{broken",
            json.dumps({"doc_id": 2, "text": "two"}),
        ],
    )
    src, dest, quar, ckpt = _run(spark, tmp_path)
    good = spark.read.parquet(dest)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    bad = spark.read.text(quar).collect()
    assert [r["value"] for r in bad] == ["{broken"]

    # second drop: only the NEW file is processed (checkpointed source)
    _drop(
        src,
        "b.jsonl",
        [json.dumps({"doc_id": 3, "text": "three"}), '{"doc_id": "x"}'],
    )
    ingest_jsonl_stream(spark, src, dest, quar, _SCHEMA, ckpt)
    good2 = spark.read.parquet(dest)
    assert {r["doc_id"] for r in good2.collect()} == {1, 2, 3}
    assert good2.count() == 3  # file a NOT re-ingested
    bad2 = sorted(r["value"] for r in spark.read.text(quar).collect())
    assert bad2 == ['{"doc_id": "x"}', "{broken"]


def test_ingest_good_schema_matches_contract(spark, tmp_path):
    src = str(tmp_path / "src")
    _drop(src, "a.jsonl", [json.dumps({"doc_id": 7, "text": "t"})])
    _, dest, _, _ = _run(spark, tmp_path)
    got = spark.read.parquet(dest)
    assert got.columns == ["doc_id", "text"]
    assert dict(got.dtypes) == {"doc_id": "bigint", "text": "string"}


def test_ingest_curate_hook_gates_at_landing(spark, tmp_path):
    """Curation at ingest: a Bloom decontamination gate + min-length filter
    applied inside the checkpointed epoch — flagged/short docs never land,
    malformed lines still quarantine."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.operators.corpus import (
        build_benchmark_bloom,
        contamination_check_bloom,
    )

    bench = spark.createDataFrame(
        [(999, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    bloom = build_benchmark_bloom(bench, shingle_n=8, fpp=1e-6)

    def curate(df):
        flagged = contamination_check_bloom(df, bloom).select("doc_id")
        return df.join(flagged, "doc_id", "left_anti").filter(
            F.length("text") >= 20
        )

    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    _drop(
        src,
        "a.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "clean document with plenty of words here"}),
            json.dumps({"doc_id": 2, "text": "prefix alpha beta gamma delta epsilon zeta eta theta suffix"}),
            json.dumps({"doc_id": 3, "text": "short"}),
            "NOT JSON AT ALL",
        ],
    )
    ingest_jsonl_stream(spark, src, dest, quar, _SCHEMA, ckpt, curate=curate)
    landed = {r["doc_id"] for r in spark.read.parquet(dest).collect()}
    assert landed == {1}  # 2 contaminated, 3 too short
    bad = [r["value"] for r in spark.read.text(quar).collect()]
    assert bad == ["NOT JSON AT ALL"]


def test_ingest_curate_redacts_pii_at_landing(spark, tmp_path):
    """PII never touches the landed corpus: redact_pii runs inside the
    curate hook (same checkpointed epoch), so every landed row is already
    scrubbed and crash-replay re-redacts identically."""
    from pyspark.sql import functions as F

    from rust_cdc_validator_spark.functions.text import pii_counts, redact_pii

    def curate(df):
        return df.select(
            "doc_id", redact_pii(F.col("text")).alias("text")
        )

    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    quar = str(tmp_path / "quar")
    ckpt = str(tmp_path / "ckpt")
    _drop(
        src,
        "a.jsonl",
        [
            json.dumps({"doc_id": 1, "text": "mail me at a.b@example.com today"}),
            json.dumps({"doc_id": 2, "text": "server 10.0.0.1 is fine"}),
            json.dumps({"doc_id": 3, "text": "nothing sensitive"}),
        ],
    )
    ingest_jsonl_stream(spark, src, dest, quar, _SCHEMA, ckpt, curate=curate)
    landed = spark.read.parquet(dest)
    texts = {r["doc_id"]: r["text"] for r in landed.collect()}
    assert "<EMAIL>" in texts[1] and "@" not in texts[1]
    assert "<IPV4>" in texts[2]
    assert texts[3] == "nothing sensitive"
    # and the landed corpus scans PII-free end to end
    residue = landed.select(pii_counts(F.col("text")).alias("p")).agg(
        F.sum("p.email").alias("e"), F.sum("p.ipv4").alias("i")
    ).first()
    assert residue["e"] == 0 and residue["i"] == 0
