"""Streaming CDC apply to a LIVE JDBC target — the reference's UPSERT/
DELETE sink (S10, postgres_operator_impl.rs:357-400 per-row loop) as a
continuous pipeline: new DMS-layout CDC parquet files land, each
micro-batch collapses to its net effect, and the set-based staging
DELETE + MERGE the batch apply already uses (sources/jdbc.py) runs
against the target database.

This closes the loop the batch API leaves open: ``CdcValidator`` replays
a bounded window once; ``merge_net_effect`` applies one net-effect frame
once. Standing replication — "keep this Postgres table current with the
CDC feed" — is the composition of the two under a file-source stream,
and it is exactly Structured Streaming's shape: source progress tracked
in the checkpoint, per-batch side effects in ``foreachBatch``.

Delivery contract: foreachBatch is AT-LEAST-ONCE — a crash between the
server-side statements and the checkpoint commit re-runs the batch. The
apply is IDEMPOTENT per batch (staging tables are reset, the DELETE and
MERGE re-realize the same final rows), so replays converge instead of
duplicating — the same reasoning Delta/JDBC exactly-once recipes use.
Within-batch ordering is total and deterministic
(``incremental.batch_net_effect``: ingestion ts, LOAD-before-CDC, file
path, row index), and cross-batch ordering is the file-source's
discovery order, which for DMS layouts is the date-keyed order the
batch manifest replays.

Scale shape: per micro-batch, ONE key-partitioned window over the batch
(net effect), two distributed JDBC staging writes sized by the batch
(never by the target), and two server-side set statements whose cost the
DATABASE optimizes — no per-row round-trips anywhere. State on the Spark
side is only the source checkpoint; the target itself is the state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_validator_spark.sources.catalog import ENVELOPE_COLS, OP_COL
from rust_cdc_validator_spark.sources.jdbc import (
    JdbcTarget,
    execute_statements,
    merge_net_effect,
)
from rust_cdc_validator_spark.streaming.incremental import (
    _SRC_FILE,
    _SRC_ROW,
    batch_net_effect,
)

__all__ = ["cdc_jdbc_apply", "start_cdc_jdbc_apply"]


def _reset_staging(
    spark: SparkSession, target: JdbcTarget, staging_prefix: str
) -> None:
    """Empty both staging tables so this batch's rows are the only rows
    the server-side statements see. First batch: the tables don't exist
    yet (the JDBC append will CREATE them) — that failure is expected
    and swallowed; real connectivity errors resurface on the write."""
    for suffix in ("upserts", "deletes"):
        try:
            execute_statements(
                spark,
                target.url,
                [f"DELETE FROM {staging_prefix}_{suffix}"],
                target.properties,
            )
        except Exception:  # noqa: BLE001 — table-missing on first batch
            pass


def cdc_jdbc_apply(
    spark: SparkSession,
    table_root: str,
    schema,
    target: JdbcTarget,
    primary_key: list[str],
    checkpoint: str,
    dialect: str = "ansi",
    staging_prefix: str = "cdc_stream_stg",
    max_files_per_trigger: int = 10,
):
    """Build (not start) the streaming apply: file-source stream over the
    DMS table root → per-batch net effect → staging write → server-side
    DELETE + MERGE on the caller's connection. Returns the
    DataStreamWriter; see :func:`start_cdc_jdbc_apply` for triggers.

    ``dialect``: 'ansi' (MERGE INTO — Derby/Oracle/SQL Server) or
    'postgres' (ON CONFLICT). Identifier case follows the batch sink's
    convention: unquoted names, folded by the target (use upper-case
    column names for Derby).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("recursiveFileLookup", "true")
        .parquet(table_root)
        .select(
            "*",
            F.col("_metadata.file_path").alias(_SRC_FILE),
            F.col("_metadata.row_index").alias(_SRC_ROW),
        )
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        last = batch_net_effect(batch, primary_key)
        op = F.coalesce(F.col(OP_COL), F.lit("I"))
        data_cols = [c for c in last.columns if c not in ENVELOPE_COLS]
        upserts = last.filter(op != "D").select(*data_cols)
        deletes = last.filter(op == "D").select(*primary_key)
        _reset_staging(batch.sparkSession, target, staging_prefix)
        stmts = merge_net_effect(
            upserts,
            deletes,
            target,
            primary_key,
            staging_prefix=staging_prefix,
            dialect=dialect,
        )
        execute_statements(
            batch.sparkSession, target.url, stmts, target.properties
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


def start_cdc_jdbc_apply(
    spark: SparkSession,
    table_root: str,
    schema,
    target: JdbcTarget,
    primary_key: list[str],
    checkpoint: str | None = None,
    continuous: bool = False,
    dialect: str = "ansi",
    staging_prefix: str = "cdc_stream_stg",
    max_files_per_trigger: int = 10,
):
    """Start the apply. ``continuous=False`` drains pending files with
    Trigger.AvailableNow then stops (bounded-window semantics);
    ``continuous=True`` keeps the target current as files land."""
    checkpoint = checkpoint or os.path.join(
        table_root, "._jdbc_apply_checkpoint"
    )
    writer = cdc_jdbc_apply(
        spark,
        table_root,
        schema,
        target,
        primary_key,
        checkpoint,
        dialect,
        staging_prefix,
        max_files_per_trigger,
    )
    if continuous:
        return writer.start()
    return writer.trigger(availableNow=True).start()
