"""Golden assertions for SQL-literal rendering (reference F1-F3, F8;
postgres_row_struct.rs semantics)."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_validator_spark.functions.render import (
    pk_tuple,
    quote_string,
    render_array_text,
    render_insert_statements,
    sql_literal,
)


def test_quote_escape_golden(spark):
    df = spark.createDataFrame(
        [("O'Brien",), ("plain",), (None,)], "s string"
    )
    got = [r["q"] for r in df.select(quote_string(F.col("s")).alias("q")).collect()]
    assert got == ["'O''Brien'", "'plain'", "NULL"]


def test_sql_literal_type_dispatch(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DecimalType(38, 2)),
            T.StructField("t", T.TimestampNTZType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("i", T.LongType()),
        ]
    )
    df = spark.createDataFrame(
        [("a'b", Decimal("12345678901234567890.12"), datetime(2024, 1, 2, 3, 4, 5), True, 7)],
        schema,
    )
    row = df.select(
        *[sql_literal(F.col(f.name), f.dataType).alias(f.name) for f in schema.fields]
    ).collect()[0]
    assert row["s"] == "'a''b'"
    # full 20-digit precision preserved (the reference truncates to i64 mantissa)
    assert row["d"] == "'12345678901234567890.12'"
    assert row["t"] == "'2024-01-02 03:04:05.000000'"
    assert row["b"] == "true"
    assert row["i"] == "7"


def test_array_literal(spark):
    df = spark.createDataFrame([(["x", "o'k"],)], "a array<string>")
    got = df.select(render_array_text(F.col("a")).alias("r")).collect()[0]["r"]
    assert got == "'{x,o''k}'"


def test_pk_tuple(spark):
    df = spark.createDataFrame([(1, 2, "z")], "a int, b int, c string")
    got = df.select(pk_tuple(df.columns, ["a", "b"]).alias("t")).collect()[0]["t"]
    assert got == "1,2"


def test_render_insert_statements(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y'z")], "id long, v string").coalesce(1)
    out = render_insert_statements(df, "public.t").collect()
    assert len(out) == 1
    stmt = out[0]["statement"]
    assert stmt.startswith("INSERT INTO public.t (id, v) VALUES ")
    assert "(1, 'x')" in stmt and "(2, 'y''z')" in stmt
    assert out[0]["n_rows"] == 2
