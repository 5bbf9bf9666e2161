"""Generate DMS-layout CDC parquet fixtures (FIXTURES.md §1-§3) plus a pure-
python sequential-apply oracle to pin replay semantics."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

ENVELOPE = ["Op", "_dms_ingestion_timestamp"]


def write_cdc_file(path: str, rows: list[dict], columns: list[str]) -> None:
    """Write rows (each a dict incl. Op/_dms_ingestion_timestamp) as parquet,
    preserving row order."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = {c: [r.get(c) for r in rows] for c in columns}
    pq.write_table(pa.table(arrays), path)


def sequential_apply(
    files: list[list[dict]], primary_key: list[str]
) -> list[dict]:
    """The reference's row-at-a-time apply loop, verbatim semantics
    (cdc_operator.rs:152-216): file order, then row order; I/U upsert by PK,
    D deletes by PK. Null/missing Op = insert (LOAD files). Returns final
    rows sorted by PK."""
    state: dict[tuple, dict] = {}
    seq = 0
    for rows in files:
        for r in rows:
            key = tuple(r[k] for k in primary_key) if primary_key else (seq,)
            seq += 1
            op = r.get("Op") or "I"
            data = {k: v for k, v in r.items() if k not in ENVELOPE}
            if op == "D":
                state.pop(key, None)
            else:
                state[key] = data
    return [state[k] for k in sorted(state)]


def customers_scenario(base_dir: str):
    """FIXTURES.md §3.1 scenario: LOAD, then CDC with I/U/D including
    delete-then-reinsert and later-file-wins updates."""
    root = os.path.join(base_dir, "db", "public", "customers")
    cols = ["Op", "_dms_ingestion_timestamp", "id", "name", "score", "active"]

    load = [
        {"Op": "I", "_dms_ingestion_timestamp": "2024-01-01T00:00:00Z",
         "id": i, "name": f"cust_{i}'s", "score": float(i) * 1.5, "active": i % 2 == 0}
        for i in range(1, 11)
    ]
    cdc1 = [
        {"Op": "U", "_dms_ingestion_timestamp": "2024-01-02T00:00:01Z",
         "id": 3, "name": "updated_3", "score": 33.0, "active": True},
        {"Op": "I", "_dms_ingestion_timestamp": "2024-01-02T00:00:02Z",
         "id": 11, "name": "new_11", "score": 11.0, "active": False},
        {"Op": "D", "_dms_ingestion_timestamp": "2024-01-02T00:00:03Z",
         "id": 5, "name": None, "score": None, "active": None},
    ]
    cdc2 = [
        {"Op": "U", "_dms_ingestion_timestamp": "2024-01-03T00:00:01Z",
         "id": 3, "name": "updated_3_again", "score": 333.0, "active": False},
        {"Op": "D", "_dms_ingestion_timestamp": "2024-01-03T00:00:02Z",
         "id": 11, "name": None, "score": None, "active": None},
        {"Op": "I", "_dms_ingestion_timestamp": "2024-01-03T00:00:03Z",
         "id": 5, "name": "reborn_5", "score": 5.5, "active": True},
        {"Op": "U", "_dms_ingestion_timestamp": "2024-01-03T00:00:04Z",
         "id": 12, "name": "upsert_insert_12", "score": 12.0, "active": True},
    ]
    write_cdc_file(os.path.join(root, "LOAD00000001.parquet"), load, cols)
    write_cdc_file(os.path.join(root, "2024", "01", "02", "20240102-000000000.parquet"), cdc1, cols)
    write_cdc_file(os.path.join(root, "2024", "01", "03", "20240103-000000000.parquet"), cdc2, cols)
    expected = sequential_apply([load, cdc1, cdc2], ["id"])
    return root, expected
