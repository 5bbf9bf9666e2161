"""CLI contract regression: drive __main__.main(argv) end-to-end on a
generated bucket (the same flow as `python -m rust_cdc_validator_spark`)."""

from __future__ import annotations

import json

import pytest

from rust_cdc_validator_spark.__main__ import main
from tests.cdc_fixtures import customers_scenario


@pytest.fixture()
def bucket(tmp_path):
    root, expected = customers_scenario(str(tmp_path / "bucket"))
    catalog = {
        "public": {
            "customers": {
                "columns": {"id": "bigint", "name": "text",
                            "score": "double precision", "active": "boolean"},
                "primary_key": ["id"],
            }
        }
    }
    cat_path = tmp_path / "catalog.json"
    cat_path.write_text(json.dumps(catalog))
    return str(tmp_path / "bucket"), str(cat_path), str(tmp_path / "out"), expected


def test_cli_snapshot_then_validate_match(spark, bucket):
    root, cat, out, expected = bucket
    rc = main([
        "--bucket-root", root, "--database", "db", "--schema", "public",
        "--catalog-json", cat, "--start-date", "2024-01-01",
        "--output", out, "--only-snapshot",
    ])
    assert rc == 0
    snap = spark.read.parquet(f"{out}/customers")
    assert snap.count() == len(expected)

    rc2 = main([
        "--bucket-root", root, "--database", "db", "--schema", "public",
        "--catalog-json", cat, "--start-date", "2024-01-01",
        "--output", out, "--only-datadiff", "--source-root", out,
    ])
    assert rc2 == 0  # MATCH → exit 0


def test_cli_validate_mismatch_exit_code(spark, bucket):
    root, cat, out, expected = bucket
    main([
        "--bucket-root", root, "--database", "db", "--schema", "public",
        "--catalog-json", cat, "--start-date", "2024-01-01",
        "--output", out, "--only-snapshot",
    ])
    bad = str(out) + "_bad"
    spark.read.parquet(f"{out}/customers").filter("id <> 3").write.parquet(
        f"{bad}/customers"
    )
    rc = main([
        "--bucket-root", root, "--database", "db", "--schema", "public",
        "--catalog-json", cat, "--start-date", "2024-01-01",
        "--output", out, "--only-datadiff", "--source-root", bad,
    ])
    assert rc == 1  # MISMATCH → exit 1
