"""Incremental CDC replay as a Structured Streaming pipeline.

The reference replays a bounded window of CDC files once (batch; SURVEY.md
§2.9 — no streaming operators in-tree). The natural Spark extension is a
file-source stream over the same DMS layout: new CDC parquet files are
discovered as they land, and each micro-batch is merged into the target
state with the same net-effect semantics as the batch replay.

Design:
* ``readStream`` with the parquet file source over ``{table_root}`` —
  file discovery order is the stream order; ``maxFilesPerTrigger`` bounds
  micro-batch size.
* per micro-batch (``foreachBatch``): reduce the batch to last-change-per-key
  (within-batch net effect, ordered by ``_dms_ingestion_timestamp`` then file
  position), then merge into the target parquet state: existing keys updated,
  deleted keys dropped, new keys appended — a full-outer merge rewrite,
  which is the plain-parquet equivalent of Delta MERGE.
* ``Trigger.AvailableNow`` drains everything pending then stops — that is
  exactly the reference's "replay a bounded window" semantics, while leaving
  continuous mode one flag away.

At scale the merge rewrite is one shuffle per micro-batch on the PK; state
lives as parquet partitioned by bucket of PK so the merge can prune
untouched partitions (future work: Delta/Iceberg target for real MERGE).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rust_cdc_validator_spark.sources.catalog import ENVELOPE_COLS, OP_COL


def _merge_batch(
    batch: DataFrame,
    state_path: str,
    primary_key: list[str],
) -> None:
    """Apply one micro-batch of changes onto the parquet state at
    ``state_path`` (read-modify-write; atomicity via temp-dir rename is the
    production hardening step, elided for the local filesystem)."""
    spark = batch.sparkSession

    # within-batch net effect: last change per key wins
    w = Window.partitionBy(*primary_key).orderBy(
        F.col("_dms_ingestion_timestamp").desc_nulls_last()
    )
    last = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    data_cols = [c for c in last.columns if c not in ENVELOPE_COLS]
    upserts = last.filter(F.coalesce(F.col(OP_COL), F.lit("I")) != "D").select(*data_cols)
    deletes = last.filter(F.coalesce(F.col(OP_COL), F.lit("I")) == "D").select(*primary_key)

    try:
        current = spark.read.parquet(state_path)
        exists = True
    except Exception:
        exists = False

    if exists:
        touched = last.select(*primary_key)
        kept = current.join(touched, on=primary_key, how="left_anti")
        new_state = kept.unionByName(upserts)
    else:
        new_state = upserts
    _ = deletes  # deletes are realized by exclusion via the anti-join above

    tmp = state_path.rstrip("/") + "._tmp"
    new_state.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(state_path)
    # best-effort temp cleanup (local/HDFS)
    try:
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(tmp)
        p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).delete(p, True)
    except Exception:
        pass


def incremental_replay(
    spark: SparkSession,
    table_root: str,
    schema,
    primary_key: list[str],
    state_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 10,
):
    """Build (not start) the streaming query: file-source stream → foreachBatch
    net-effect merge. Returns the DataStreamWriter."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")  # LOAD at root + dated subdirs
        .parquet(f"{table_root}")
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        _merge_batch(batch, state_path, primary_key)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def start_incremental_replay(
    spark: SparkSession,
    table_root: str,
    schema,
    primary_key: list[str],
    state_path: str,
    checkpoint: str | None = None,
    continuous: bool = False,
    max_files_per_trigger: int = 10,
):
    """Start the incremental replay. ``continuous=False`` uses
    Trigger.AvailableNow — drain pending files, then stop (the reference's
    bounded-window replay); ``continuous=True`` keeps watching for files."""
    checkpoint = checkpoint or os.path.join(state_path + "._checkpoint")
    writer = incremental_replay(
        spark, table_root, schema, primary_key, state_path, checkpoint,
        max_files_per_trigger,
    )
    if continuous:
        return writer.start()
    return writer.trigger(availableNow=True).start()
