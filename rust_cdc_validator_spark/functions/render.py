"""SQL-literal rendering — the reference's scalar function surface (F1-F9,
P8) as distributed column expressions.

The reference renders every row into SQL literal text when building INSERT /
DELETE statements (src/postgres/postgres_row_struct.rs:15-47,
postgres_operator_impl.rs:224-244). Our sinks bind parameters instead
(sources/jdbc.py), but the rendering functions exist for parity and for
generating portable SQL dumps — all JVM-side expressions, exhaustively:

F1 string quote-escape, F2 decimal render, F3 date/datetime quoting,
F8 PK-tuple extraction — plus the INSERT statement assembler that the
reference builds row-by-row, here produced for ALL rows in one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def quote_string(col: Column) -> Column:
    """Single-quote a string with ``'`` doubled (reference F1,
    postgres_row_struct.rs:37-39). NULL renders as bare NULL."""
    escaped = F.regexp_replace(col, "'", "''")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), escaped, F.lit("'"))
    )


def render_decimal(col: Column, scale: int = 18) -> Column:
    """Full-precision decimal → quoted literal (reference F2 truncates the
    i128 mantissa to i64, postgres_row_struct.rs:41-47 — we don't)."""
    as_dec = col.cast(T.DecimalType(38, scale)).cast("string")
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), as_dec, F.lit("'"))
    )


def render_timestamp(col: Column) -> Column:
    """Date/datetime → quoted literal (reference F3, postgres_row_struct.rs:31)."""
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'"), F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("'"))
    )


def render_array_text(col: Column) -> Column:
    """text[] → Postgres array literal ``'{a,b}'`` (the one array rule,
    postgres_operator_impl.rs:67-71)."""
    inner = F.concat_ws(",", F.transform(col, lambda x: F.regexp_replace(x, "'", "''")))
    return F.when(col.isNull(), F.lit("NULL")).otherwise(
        F.concat(F.lit("'{"), inner, F.lit("}'"))
    )


def sql_literal(col: Column, dtype: T.DataType) -> Column:
    """Dispatch on Spark type to the reference's rendering rules
    (postgres_row_struct.rs:25-47: strings quoted+escaped, decimals quoted,
    dates quoted, numerics bare, booleans bare)."""
    if isinstance(dtype, T.StringType):
        return quote_string(col)
    if isinstance(dtype, T.DecimalType):
        return render_decimal(col, dtype.scale)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return render_timestamp(col)
    if isinstance(dtype, T.ArrayType):
        return render_array_text(col)
    if isinstance(dtype, T.BooleanType):
        return F.when(col.isNull(), F.lit("NULL")).otherwise(
            F.when(col, F.lit("true")).otherwise(F.lit("false"))
        )
    # numerics and anything else: Display passthrough (F.col cast string)
    return F.when(col.isNull(), F.lit("NULL")).otherwise(col.cast("string"))


def pk_tuple(df_columns: list[str], primary_key: list[str]) -> Column:
    """PK tuple as comma-joined text (reference F8,
    postgres_operator_impl.rs:296-300)."""
    return F.concat_ws(",", *[F.col(c).cast("string") for c in primary_key])


def render_insert_statements(
    df: DataFrame,
    table: str,
    rows_per_statement: int = 10_000,
) -> DataFrame:
    """Render multi-row INSERT statements for all rows — the reference's
    chunked statement builder (postgres_operator_impl.rs:206-244) as one
    distributed plan: per-row tuple text, then 10k-row groups aggregated
    into one statement each. Returns (stmt_id, statement, n_rows).

    Statements chunk within each partition: ``monotonically_increasing_id``
    encodes (partition, row-in-partition), so integer-dividing it by
    ``rows_per_statement`` yields ≤10k-row groups without any global sort.
    Exact statement membership is not semantically meaningful (the
    reference's offset chunks aren't stable across runs either).
    """
    cols = df.columns
    tuple_text = F.concat(
        F.lit("("),
        F.concat_ws(
            ", ", *[sql_literal(F.col(c), df.schema[c].dataType) for c in cols]
        ),
        F.lit(")"),
    )
    bucketed = df.select(tuple_text.alias("_t")).withColumn(
        "stmt_id",
        F.expr(f"monotonically_increasing_id() div {int(rows_per_statement)}"),
    )
    grouped = bucketed.groupBy("stmt_id").agg(
        F.collect_list("_t").alias("_ts"), F.count(F.lit(1)).alias("n_rows")
    )
    header = F.lit(f"INSERT INTO {table} ({', '.join(cols)}) VALUES ")
    return grouped.select(
        "stmt_id",
        F.concat(header, F.concat_ws(", ", F.col("_ts"))).alias("statement"),
        "n_rows",
    )
