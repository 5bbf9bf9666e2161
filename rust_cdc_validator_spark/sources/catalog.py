"""Catalog introspection + DDL synthesis + the Postgres↔Spark type bridge.

The reference introspects the *source* database at runtime
(information_schema.columns / pg_index, src/postgres/table_query.rs:17-60,
src/postgres/postgres_operator_impl.rs:51-95) and synthesizes CREATE TABLE
DDL from the ordered column map (table_query.rs:62-98). We keep the same
shape behind a ``Catalog`` protocol so tests can supply columns/PKs without a
live Postgres; a JDBC-backed implementation issues the same catalog queries
through ``spark.read.jdbc``.

Type bridge per SURVEY.md §1.2 — note we map ``numeric`` to
``DecimalType(38, s)`` (full precision), strictly better than the reference's
i64-mantissa truncation (src/postgres/postgres_row_struct.rs:41-47).
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import types as T

# DMS envelope columns injected into every CDC parquet file
# (reference: src/cdc/cdc_operator.rs:178).
OP_COL = "Op"
TS_COL = "_dms_ingestion_timestamp"
ENVELOPE_COLS = (OP_COL, TS_COL)


class Catalog(Protocol):
    """Extension point mirroring the reference's PostgresOperator trait
    (src/postgres/postgres_operator.rs:25-159)."""

    def get_table_columns(self, schema: str, table: str) -> dict[str, str]: ...

    def get_primary_key(self, schema: str, table: str) -> list[str]: ...

    def get_tables_in_schema(
        self,
        schema: str,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
    ) -> list[str]: ...


class StaticCatalog:
    """In-memory catalog for tests/fixtures: {schema: {table: (cols, pk)}}.

    ``cols`` is an *ordered* dict name→postgres type (order matters — the
    reference preserves catalog order for positional inserts, SURVEY.md §1.3).
    """

    def __init__(self, tables: dict[str, dict[str, tuple[dict[str, str], list[str]]]]):
        self._tables = tables

    def get_table_columns(self, schema: str, table: str) -> dict[str, str]:
        return dict(self._tables[schema][table][0])

    def get_primary_key(self, schema: str, table: str) -> list[str]:
        return list(self._tables[schema][table][1])

    def get_tables_in_schema(
        self,
        schema: str,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
    ) -> list[str]:
        # include/exclude mirror TableMode IncludeTables/ExcludeTables
        # (reference: src/postgres/table_mode.rs:1-5, postgres_operator_impl.rs:110-154).
        names = list(self._tables.get(schema, {}))
        if include:
            names = [n for n in names if n in set(include)]
        if exclude:
            names = [n for n in names if n not in set(exclude)]
        return names


class JdbcCatalog:
    """Catalog over a live database via Spark's JDBC source.

    Issues the same queries as the reference (table_query.rs:17-60) as JDBC
    pushdown subqueries. Requires a JDBC driver jar on the classpath; tests
    use StaticCatalog instead.
    """

    def __init__(self, spark, url: str, properties: dict[str, str] | None = None):
        self.spark = spark
        self.url = url
        self.properties = properties or {}

    def _query(self, sql: str):
        return self.spark.read.jdbc(self.url, f"({sql}) q", properties=self.properties)

    def get_table_columns(self, schema: str, table: str) -> dict[str, str]:
        # reference: table_query.rs:17-26
        rows = self._query(
            "SELECT column_name, data_type, ordinal_position "
            "FROM information_schema.columns "
            f"WHERE table_schema = '{schema}' AND table_name = '{table}'"
        ).collect()
        out: dict[str, str] = {}
        for r in sorted(rows, key=lambda r: r["ordinal_position"]):
            # the one special case: ARRAY → text[]
            # (reference: postgres_operator_impl.rs:24-37,67-71)
            out[r["column_name"]] = (
                "text[]" if r["data_type"] == "ARRAY" else r["data_type"]
            )
        return out

    def get_primary_key(self, schema: str, table: str) -> list[str]:
        # reference: table_query.rs:48-60 (pg_index ⋈ pg_attribute)
        rows = self._query(
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid "
            "AND a.attnum = ANY(i.indkey) "
            f"WHERE i.indrelid = '{schema}.{table}'::regclass AND i.indisprimary"
        ).collect()
        return [r["attname"] for r in rows]

    def get_tables_in_schema(
        self,
        schema: str,
        include: list[str] | None = None,
        exclude: list[str] | None = None,
    ) -> list[str]:
        # reference: table_query.rs:27-35
        rows = self._query(
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{schema}'"
        ).collect()
        names = [r["table_name"] for r in rows]
        if include:
            names = [n for n in names if n in set(include)]
        if exclude:
            names = [n for n in names if n not in set(exclude)]
        return names


# ---------------------------------------------------------------- type bridge

_PG_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "character varying": T.StringType(),
    "varchar": T.StringType(),
    "character": T.StringType(),
    "char": T.StringType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "smallint": T.ShortType(),
    "int2": T.ShortType(),
    "double precision": T.DoubleType(),
    "float8": T.DoubleType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "timestamp without time zone": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    "timestamp with time zone": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "text[]": T.ArrayType(T.StringType()),
    "bytea": T.BinaryType(),
    "json": T.StringType(),
    "jsonb": T.StringType(),
    "uuid": T.StringType(),
}


def pg_type_to_spark(pg_type: str) -> T.DataType:
    """Map a Postgres catalog type string to a Spark type (SURVEY.md §1.2)."""
    t = pg_type.strip().lower()
    if t.startswith("numeric") or t.startswith("decimal"):
        # numeric(p,s) → DecimalType(38, s): full 38-digit precision, vs the
        # reference's i64 mantissa truncation (postgres_row_struct.rs:43).
        if "(" in t:
            inner = t[t.index("(") + 1 : t.rindex(")")]
            parts = [p.strip() for p in inner.split(",")]
            scale = int(parts[1]) if len(parts) > 1 else 0
            return T.DecimalType(38, min(scale, 37))
        return T.DecimalType(38, 18)
    if t == "array":
        return T.ArrayType(T.StringType())
    if t in _PG_TO_SPARK:
        return _PG_TO_SPARK[t]
    return T.StringType()  # verbatim passthrough fallback, like the reference DDL


def spark_schema_for(columns: dict[str, str]) -> T.StructType:
    return T.StructType(
        [T.StructField(name, pg_type_to_spark(pg), True) for name, pg in columns.items()]
    )


# ---------------------------------------------------------------- DDL synthesis


def create_table_ddl(
    schema: str,
    table: str,
    columns: dict[str, str],
    primary_key: list[str],
) -> str:
    """Synthesize CREATE TABLE text from the ordered column map + PK list
    (reference: src/postgres/table_query.rs:62-98)."""
    col_defs = ", ".join(f"{name} {pg}" for name, pg in columns.items())
    pk = f", PRIMARY KEY ({', '.join(primary_key)})" if primary_key else ""
    return f"CREATE TABLE IF NOT EXISTS {schema}.{table} ({col_defs}{pk})"


def create_schema_ddl(schema: str) -> str:
    return f"CREATE SCHEMA IF NOT EXISTS {schema}"


def drop_schema_ddl(schema: str) -> str:
    return f"DROP SCHEMA IF EXISTS {schema} CASCADE"


def check_schema_containment(
    parquet_columns: list[str], expected_columns: list[str]
) -> None:
    """Schema-drift containment check: every non-envelope parquet column must
    exist in the source table's column set (reference:
    src/cdc/cdc_operator.rs:170-184 — panic there, ValueError here)."""
    extra = set(parquet_columns) - set(ENVELOPE_COLS) - set(expected_columns)
    if extra:
        raise ValueError(
            f"schema drift: parquet columns {sorted(extra)} not present in "
            f"source table columns {sorted(expected_columns)}"
        )
