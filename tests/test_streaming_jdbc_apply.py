"""Streaming CDC apply to a live (embedded Derby) JDBC target
(streaming/jdbc_apply.py): DMS-layout files drain through foreachBatch
into set-based staging DELETE + MERGE; the checkpoint makes a second
drain apply only the NEW files."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.types as T

from rust_cdc_validator_spark.sources.jdbc import (
    JdbcTarget,
    execute_statements,
)
from rust_cdc_validator_spark.streaming.jdbc_apply import start_cdc_jdbc_apply

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

SCHEMA = T.StructType(
    [
        T.StructField("Op", T.StringType()),
        T.StructField("_dms_ingestion_timestamp", T.StringType()),
        T.StructField("ID", T.LongType()),
        T.StructField("V", T.LongType()),
    ]
)


_MTIME_SEQ = [0]


def _write(path, rows):
    ops, ts, ids, vs = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "Op": list(ops),
                "_dms_ingestion_timestamp": list(ts),
                "ID": list(ids),
                "V": list(vs),
            }
        ),
        str(path),
    )
    # pin strictly-increasing mtimes: files written microseconds apart can
    # tie on mtime, and the file source's modified-time ordering then
    # becomes load-dependent — the CDC apply order must be deterministic
    import os

    _MTIME_SEQ[0] += 1
    t = 1_700_000_000 + _MTIME_SEQ[0]
    os.utime(str(path), (t, t))


def _read_target(spark, url):
    df = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "streamtarget")
        .options(**DERBY)
        .load()
    )
    return {r["ID"]: r["V"] for r in df.collect()}


def test_streaming_jdbc_apply_and_checkpoint_resume(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/stream_target_db;create=true"
    execute_statements(
        spark,
        url,
        ["CREATE TABLE streamtarget (ID BIGINT NOT NULL PRIMARY KEY, V BIGINT)"],
        DERBY,
    )
    target = JdbcTarget(
        url=url, table="streamtarget", properties=DERBY, num_partitions=2
    )

    root = tmp_path / "dms" / "db" / "sch" / "orders"
    (root / "2024" / "01" / "02").mkdir(parents=True)
    (root / "2024" / "01" / "03").mkdir(parents=True)
    _write(
        root / "LOAD00000001.parquet",
        [("I", "2024-01-01 00:00:00", i, 10 * i) for i in range(1, 6)],
    )
    _write(
        root / "2024" / "01" / "02" / "20240102-000000000.parquet",
        [("U", "2024-01-02 00:00:00", 2, 999),
         ("D", "2024-01-02 00:00:00", 3, 0)],
    )
    _write(
        root / "2024" / "01" / "03" / "20240103-000000000.parquet",
        [("I", "2024-01-03 00:00:00", 6, 60),
         ("U", "2024-01-03 01:00:00", 2, 1000)],
    )

    checkpoint = str(tmp_path / "ckpt")
    q = start_cdc_jdbc_apply(
        spark, str(root), SCHEMA, target, ["ID"],
        checkpoint=checkpoint, max_files_per_trigger=1,
    )
    q.awaitTermination(180)
    assert _read_target(spark, url) == {1: 10, 2: 1000, 4: 40, 5: 50, 6: 60}

    # resume from the checkpoint: ONLY the new file applies (a full
    # re-apply would resurrect id 3's delete as a no-op but also re-MERGE
    # id 2 — idempotent either way; the point is the delete lands)
    (root / "2024" / "01" / "04").mkdir(parents=True)
    _write(
        root / "2024" / "01" / "04" / "20240104-000000000.parquet",
        [("D", "2024-01-04 00:00:00", 1, 0),
         ("U", "2024-01-04 00:00:00", 6, 61)],
    )
    q2 = start_cdc_jdbc_apply(
        spark, str(root), SCHEMA, target, ["ID"],
        checkpoint=checkpoint, max_files_per_trigger=1,
    )
    q2.awaitTermination(180)
    assert _read_target(spark, url) == {2: 1000, 4: 40, 5: 50, 6: 61}


def test_same_batch_insert_then_delete_nets_to_absent(spark, tmp_path):
    """A key inserted and deleted within ONE micro-batch must net to a
    delete (last change wins) — the within-batch window, not arrival
    order, decides."""
    url = f"jdbc:derby:{tmp_path}/stream_target_db2;create=true"
    execute_statements(
        spark,
        url,
        ["CREATE TABLE streamtarget (ID BIGINT NOT NULL PRIMARY KEY, V BIGINT)"],
        DERBY,
    )
    target = JdbcTarget(
        url=url, table="streamtarget", properties=DERBY, num_partitions=1
    )
    root = tmp_path / "dms2" / "db" / "sch" / "t"
    root.mkdir(parents=True)
    _write(
        root / "LOAD00000001.parquet",
        [("I", "2024-01-01 00:00:00", 1, 1),
         ("I", "2024-01-01 00:00:01", 2, 2),
         ("D", "2024-01-01 00:00:02", 2, 2)],
    )
    q = start_cdc_jdbc_apply(
        spark, str(root), SCHEMA, target, ["ID"],
        checkpoint=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)
    assert _read_target(spark, url) == {1: 1}
