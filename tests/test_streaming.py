from __future__ import annotations

import pyspark.sql.types as T

from rust_cdc_validator_spark.streaming.incremental import start_incremental_replay
from tests.cdc_fixtures import write_cdc_file

SCHEMA = T.StructType(
    [
        T.StructField("Op", T.StringType(), True),
        T.StructField("_dms_ingestion_timestamp", T.StringType(), True),
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)
COLS = ["Op", "_dms_ingestion_timestamp", "id", "v"]


def _run(spark, root, state):
    q = start_incremental_replay(
        spark, root, SCHEMA, ["id"], state, max_files_per_trigger=1
    )
    q.awaitTermination(120)


def test_streaming_replay_converges_to_batch_semantics(spark, tmp_path):
    root = str(tmp_path / "stream/db/public/t")
    state = str(tmp_path / "state")
    write_cdc_file(
        f"{root}/LOAD00000001.parquet",
        [{"Op": "I", "_dms_ingestion_timestamp": f"2024-01-01T00:00:{i:02d}Z",
          "id": i, "v": i} for i in range(5)],
        COLS,
    )
    write_cdc_file(
        f"{root}/2024/01/02/a.parquet",
        [{"Op": "U", "_dms_ingestion_timestamp": "2024-01-02T00:00:00Z", "id": 2, "v": 22},
         {"Op": "D", "_dms_ingestion_timestamp": "2024-01-02T00:00:01Z", "id": 3, "v": 3}],
        COLS,
    )
    _run(spark, root, state)
    got = {r["id"]: r["v"] for r in spark.read.parquet(state).collect()}
    assert got == {0: 0, 1: 1, 2: 22, 4: 4}


def test_streaming_resumes_with_new_files(spark, tmp_path):
    root = str(tmp_path / "stream/db/public/t")
    state = str(tmp_path / "state")
    write_cdc_file(
        f"{root}/LOAD00000001.parquet",
        [{"Op": "I", "_dms_ingestion_timestamp": "2024-01-01T00:00:00Z", "id": 1, "v": 1}],
        COLS,
    )
    _run(spark, root, state)
    assert {r["id"] for r in spark.read.parquet(state).collect()} == {1}

    # land a new CDC file; restart from the same checkpoint — only the new
    # file is processed (exactly-once file tracking)
    write_cdc_file(
        f"{root}/2024/01/03/b.parquet",
        [{"Op": "I", "_dms_ingestion_timestamp": "2024-01-03T00:00:00Z", "id": 2, "v": 2},
         {"Op": "D", "_dms_ingestion_timestamp": "2024-01-03T00:00:01Z", "id": 1, "v": 0}],
        COLS,
    )
    _run(spark, root, state)
    got = {r["id"]: r["v"] for r in spark.read.parquet(state).collect()}
    assert got == {2: 2}


def test_same_timestamp_tiebreak_is_deterministic(spark, tmp_path):
    """Same key + same ingestion timestamp inside one micro-batch (common for
    DMS batched writes): the later (file, row) wins, mirroring the batch
    replay's (file_seq, row_index) total order — not an arbitrary row."""
    root = str(tmp_path / "stream/db/public/t")
    state = str(tmp_path / "state")
    ts = "2024-01-01T00:00:00Z"
    write_cdc_file(
        f"{root}/LOAD00000001.parquet",
        [{"Op": "I", "_dms_ingestion_timestamp": ts, "id": 1, "v": 0}],
        COLS,
    )
    # one file, two same-ts updates to the same key: row order decides
    write_cdc_file(
        f"{root}/2024/01/02/a.parquet",
        [{"Op": "U", "_dms_ingestion_timestamp": ts, "id": 1, "v": 100},
         {"Op": "U", "_dms_ingestion_timestamp": ts, "id": 1, "v": 200}],
        COLS,
    )
    # a lexicographically later file with the same ts: file order decides
    write_cdc_file(
        f"{root}/2024/01/02/b.parquet",
        [{"Op": "U", "_dms_ingestion_timestamp": ts, "id": 1, "v": 300}],
        COLS,
    )
    q = start_incremental_replay(
        spark, root, SCHEMA, ["id"], state, max_files_per_trigger=10
    )
    q.awaitTermination(120)
    got = {r["id"]: r["v"] for r in spark.read.parquet(state).collect()}
    assert got == {1: 300}


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """A micro-batch touching one key must rewrite only that key's hash
    bucket; every other bucket's files stay byte-identical on disk."""
    import glob
    import os
    import time

    root = str(tmp_path / "stream/db/public/t")
    state = str(tmp_path / "state")
    write_cdc_file(
        f"{root}/LOAD00000001.parquet",
        [{"Op": "I", "_dms_ingestion_timestamp": "2024-01-01T00:00:00Z",
          "id": i, "v": i} for i in range(40)],
        COLS,
    )
    _run(spark, root, state)

    def bucket_files():
        out = {}
        for d in glob.glob(f"{state}/_bucket=*"):
            files = sorted(glob.glob(f"{d}/*.parquet"))
            out[os.path.basename(d)] = [(f, os.path.getmtime(f)) for f in files]
        return out

    before = bucket_files()
    assert len(before) > 1  # 40 keys spread over several buckets
    time.sleep(1.1)  # mtime granularity

    write_cdc_file(
        f"{root}/2024/01/02/a.parquet",
        [{"Op": "U", "_dms_ingestion_timestamp": "2024-01-02T00:00:00Z",
          "id": 7, "v": 777}],
        COLS,
    )
    _run(spark, root, state)
    after = bucket_files()

    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1  # exactly the bucket containing id=7
    got = {r["id"]: r["v"] for r in spark.read.parquet(state).collect()}
    assert got[7] == 777 and len(got) == 40
