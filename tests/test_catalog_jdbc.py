"""Golden-SQL and catalog tests — the reference's own unit-test strategy
(SQL text golden-assertions, table_query.rs:103-195)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rust_cdc_validator_spark.sources.catalog import (
    StaticCatalog,
    check_schema_containment,
    create_schema_ddl,
    create_table_ddl,
    drop_schema_ddl,
    pg_type_to_spark,
    spark_schema_for,
)
from rust_cdc_validator_spark.sources.jdbc import delete_sql, upsert_sql


def test_create_table_ddl_golden():
    ddl = create_table_ddl(
        "public", "customers",
        {"id": "bigint", "name": "text", "tags": "text[]"},
        ["id"],
    )
    assert ddl == (
        "CREATE TABLE IF NOT EXISTS public.customers "
        "(id bigint, name text, tags text[], PRIMARY KEY (id))"
    )


def test_create_table_no_pk_and_schema_ddl():
    assert create_table_ddl("s", "t", {"a": "int"}, []) == \
        "CREATE TABLE IF NOT EXISTS s.t (a int)"
    assert create_schema_ddl("s") == "CREATE SCHEMA IF NOT EXISTS s"
    assert drop_schema_ddl("s") == "DROP SCHEMA IF EXISTS s CASCADE"


def test_upsert_sql_golden():
    sql = upsert_sql("public.t", ["id", "a", "b"], ["id"], "_stg")
    assert sql == (
        "INSERT INTO public.t (id, a, b) SELECT id, a, b FROM _stg "
        "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b"
    )


def test_delete_sql_composite_pk_golden():
    sql = delete_sql("public.t", ["order_id", "line_no"], "_stg")
    assert sql == (
        "DELETE FROM public.t WHERE (order_id, line_no) IN "
        "(SELECT order_id, line_no FROM _stg)"
    )


@pytest.mark.parametrize(
    "pg,expected",
    [
        ("text", T.StringType()),
        ("bigint", T.LongType()),
        ("numeric(12,2)", T.DecimalType(38, 2)),
        ("numeric", T.DecimalType(38, 18)),
        ("double precision", T.DoubleType()),
        ("timestamp without time zone", T.TimestampNTZType()),
        ("timestamp with time zone", T.TimestampType()),
        ("text[]", T.ArrayType(T.StringType())),
        ("ARRAY", T.ArrayType(T.StringType())),
        ("some_exotic_type", T.StringType()),
    ],
)
def test_pg_type_bridge(pg, expected):
    assert pg_type_to_spark(pg) == expected


def test_spark_schema_preserves_order():
    cols = {"z": "int", "a": "text", "m": "bigint"}
    assert [f.name for f in spark_schema_for(cols).fields] == ["z", "a", "m"]


def test_static_catalog_include_exclude():
    cat = StaticCatalog({"s": {
        "t1": ({"a": "int"}, ["a"]),
        "t2": ({"a": "int"}, ["a"]),
        "t3": ({"a": "int"}, ["a"]),
    }})
    assert cat.get_tables_in_schema("s") == ["t1", "t2", "t3"]
    assert cat.get_tables_in_schema("s", include=["t2"]) == ["t2"]
    assert cat.get_tables_in_schema("s", exclude=["t2"]) == ["t1", "t3"]


def test_containment_allows_envelope_and_subset():
    check_schema_containment(["Op", "_dms_ingestion_timestamp", "id"], ["id", "x"])
    with pytest.raises(ValueError, match="schema drift"):
        check_schema_containment(["id", "rogue"], ["id"])


def test_ansi_merge_and_exists_delete_goldens():
    from rust_cdc_validator_spark.sources.jdbc import delete_sql_exists, merge_sql

    assert merge_sql("t", ["id", "a"], ["id"], "_stg") == (
        "MERGE INTO t t USING _stg s ON (t.id = s.id) "
        "WHEN MATCHED THEN UPDATE SET t.a = s.a "
        "WHEN NOT MATCHED THEN INSERT (id, a) VALUES (s.id, s.a)"
    )
    assert delete_sql_exists("t", ["id", "k"], "_stg") == (
        "DELETE FROM t t WHERE EXISTS "
        "(SELECT 1 FROM _stg s WHERE s.id = t.id AND s.k = t.k)"
    )


def test_tls_connection_properties_parity():
    """S11: accept_invalid_certs / sslmode / sslrootcert parity with the
    reference's PostgresConfig (postgres_config.rs:51-79)."""
    from rust_cdc_validator_spark.sources.jdbc import JdbcTarget

    t = JdbcTarget(url="jdbc:postgresql://h/db", table="t",
                   ssl_mode="verify-full", ssl_root_cert="/certs/ca.pem")
    p = t.connection_properties()
    assert p["ssl"] == "true" and p["sslmode"] == "verify-full"
    assert p["sslrootcert"] == "/certs/ca.pem"

    t2 = JdbcTarget(url="jdbc:postgresql://h/db", table="t",
                    accept_invalid_certs=True)
    p2 = t2.connection_properties()
    assert p2["sslfactory"] == "org.postgresql.ssl.NonValidatingFactory"

    # explicit properties win on conflicts
    t3 = JdbcTarget(url="u", table="t", ssl_mode="require",
                    properties={"sslmode": "disable"})
    assert t3.connection_properties()["sslmode"] == "disable"
