"""CdcValidator.advance_state: windowed incremental merge into bucketed
state equals a full snapshot replay of the same history."""

from __future__ import annotations

import os
import time
import uuid

import pytest

from rust_cdc_validator_spark.api import CdcPayload, CdcValidator
from rust_cdc_validator_spark.operators.state import save_state_bucketed
from rust_cdc_validator_spark.sources.catalog import StaticCatalog
from tests.cdc_fixtures import write_cdc_file


def _set_mtime(path: str, y: int, mo: int, d: int, h: int = 0) -> None:
    t = time.mktime((y, mo, d, h, 0, 0, 0, 0, -1))
    os.utime(path, (t, t))


@pytest.fixture()
def tables(spark):
    names = [f"inc_state_{uuid.uuid4().hex[:8]}_v{i}" for i in range(3)]
    yield names
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_advance_state_equals_full_snapshot(spark, tmp_path, tables):
    cols = ["Op", "_dms_ingestion_timestamp", "id", "val"]
    root = str(tmp_path)
    tdir = f"{root}/db/public/items"
    load = [
        {"Op": "I", "_dms_ingestion_timestamp": "t0", "id": i, "val": f"v{i}"}
        for i in range(1, 6)
    ]
    day1 = [
        {"Op": "U", "_dms_ingestion_timestamp": "t1", "id": 2, "val": "day1-2"},
        {"Op": "D", "_dms_ingestion_timestamp": "t1", "id": 4, "val": "x"},
    ]
    day2 = [
        {"Op": "I", "_dms_ingestion_timestamp": "t2", "id": 9, "val": "day2-9"},
        {"Op": "U", "_dms_ingestion_timestamp": "t2", "id": 2, "val": "day2-2"},
        {"Op": "D", "_dms_ingestion_timestamp": "t2", "id": 5, "val": "x"},
    ]
    p_load = f"{tdir}/LOAD00000001.parquet"
    p_day1 = f"{tdir}/2024/01/02/a.parquet"
    p_day2 = f"{tdir}/2024/01/03/b.parquet"
    write_cdc_file(p_load, load, cols)
    write_cdc_file(p_day1, day1, cols)
    write_cdc_file(p_day2, day2, cols)
    _set_mtime(p_day1, 2024, 1, 2, 6)
    _set_mtime(p_day2, 2024, 1, 3, 6)

    from datetime import datetime

    catalog = StaticCatalog(
        {"public": {"items": ({"id": "integer", "val": "text"}, ["id"])}}
    )
    v = CdcValidator(spark, catalog)

    def payload(start, stop=None):
        return CdcPayload(
            bucket_root=root, database="db", schema="public",
            included_tables=["items"], start_date=start, stop_date=stop,
        )

    # seed: snapshot through day1, saved bucketed
    snap0 = v.snapshot(payload(datetime(2024, 1, 1), datetime(2024, 1, 2, 12)))
    save_state_bucketed(snap0["items"], tables[0], ["id"], n_buckets=4)

    # advance over the day2 window only
    new_state = v.advance_state(
        payload(datetime(2024, 1, 2, 12), datetime(2024, 1, 4)),
        "items", tables[0], tables[1],
    )
    got = sorted((r["id"], r["val"]) for r in new_state.collect())

    # reference: one-shot snapshot of the whole history
    full = v.snapshot(payload(datetime(2024, 1, 1), datetime(2024, 1, 4)))
    want = sorted((r["id"], r["val"]) for r in full["items"].collect())
    assert got == want
    assert got == [(1, "v1"), (2, "day2-2"), (3, "v3"), (9, "day2-9")]

    # empty window: state versions forward unchanged
    same = v.advance_state(
        payload(datetime(2025, 1, 1), datetime(2025, 1, 2)),
        "items", tables[1], tables[2],
    )
    assert sorted((r["id"], r["val"]) for r in same.collect()) == got


def test_advance_state_requires_pk(spark, tmp_path, tables):
    from datetime import datetime

    catalog = StaticCatalog({"public": {"logs": ({"id": "integer"}, [])}})
    v = CdcValidator(spark, catalog)
    p = CdcPayload(
        bucket_root=str(tmp_path), database="db", schema="public",
        included_tables=["logs"], start_date=datetime(2024, 1, 1),
    )
    with pytest.raises(ValueError, match="primary key"):
        v.advance_state(p, "logs", tables[0], tables[1])


def test_advance_state_stamps_window_and_chains_from_it(spark, tmp_path, tables):
    """The applied window lands in TBLPROPERTIES; the next run derives its
    start from state_window()['stop'] instead of out-of-band bookkeeping."""
    from datetime import datetime, timezone

    cols = ["Op", "_dms_ingestion_timestamp", "id", "val"]
    root = str(tmp_path)
    tdir = f"{root}/db/public/items"
    write_cdc_file(f"{tdir}/LOAD00000001.parquet",
                   [{"Op": "I", "_dms_ingestion_timestamp": "t0", "id": 1, "val": "a"}],
                   cols)
    p1 = f"{tdir}/2024/02/01/a.parquet"
    write_cdc_file(p1, [{"Op": "U", "_dms_ingestion_timestamp": "t1",
                         "id": 1, "val": "b"}], cols)
    _set_mtime(p1, 2024, 2, 1, 6)
    p2 = f"{tdir}/2024/02/02/b.parquet"
    write_cdc_file(p2, [{"Op": "U", "_dms_ingestion_timestamp": "t2",
                         "id": 1, "val": "c"}], cols)
    _set_mtime(p2, 2024, 2, 2, 6)

    catalog = StaticCatalog(
        {"public": {"items": ({"id": "integer", "val": "text"}, ["id"])}}
    )
    v = CdcValidator(spark, catalog)

    def payload(start, stop):
        return CdcPayload(bucket_root=root, database="db", schema="public",
                          included_tables=["items"], start_date=start,
                          stop_date=stop)

    seed = v.snapshot(payload(datetime(2024, 1, 1), datetime(2024, 2, 1, 12)))
    save_state_bucketed(seed["items"], tables[0], ["id"], n_buckets=4)

    stop1 = datetime(2024, 2, 2, tzinfo=timezone.utc)
    v.advance_state(payload(datetime(2024, 2, 1, 12), stop1),
                    "items", tables[0], tables[1])
    win = v.state_window(tables[1])
    assert win["stop"] == stop1
    assert win["start"] == datetime(2024, 2, 1, 12, tzinfo=timezone.utc)

    # chain: next window starts at the STORED stop
    nxt = v.advance_state(
        payload(win["stop"], datetime(2024, 2, 3, tzinfo=timezone.utc)),
        "items", tables[1], tables[2],
    )
    assert [(r["id"], r["val"]) for r in nxt.collect()] == [(1, "c")]
    assert v.state_window(tables[2])["start"] == stop1


def test_advance_states_fans_out_all_tables(spark, tmp_path):
    """Multi-table incremental advance through the bounded pool: every
    catalog table's state moves forward and equals its full snapshot."""
    from datetime import datetime

    cols_a = ["Op", "_dms_ingestion_timestamp", "id", "v"]
    cols_b = ["Op", "_dms_ingestion_timestamp", "k", "name"]
    root = str(tmp_path)
    write_cdc_file(f"{root}/db/public/alpha/LOAD00000001.parquet",
                   [{"Op": "I", "_dms_ingestion_timestamp": "t", "id": i, "v": i}
                    for i in range(5)], cols_a)
    pa_ = f"{root}/db/public/alpha/2024/01/02/a.parquet"
    write_cdc_file(pa_, [{"Op": "D", "_dms_ingestion_timestamp": "t",
                          "id": 0, "v": 0}], cols_a)
    _set_mtime(pa_, 2024, 1, 2, 6)
    write_cdc_file(f"{root}/db/public/beta/LOAD00000001.parquet",
                   [{"Op": "I", "_dms_ingestion_timestamp": "t", "k": 10, "name": "x"}],
                   cols_b)
    pb = f"{root}/db/public/beta/2024/01/02/b.parquet"
    write_cdc_file(pb, [{"Op": "U", "_dms_ingestion_timestamp": "t",
                         "k": 10, "name": "y"}], cols_b)
    _set_mtime(pb, 2024, 1, 2, 6)

    catalog = StaticCatalog({"public": {
        "alpha": ({"id": "bigint", "v": "bigint"}, ["id"]),
        "beta": ({"k": "bigint", "name": "text"}, ["k"]),
    }})
    v = CdcValidator(spark, catalog)

    def payload(start, stop):
        return CdcPayload(bucket_root=root, database="db", schema="public",
                          start_date=start, stop_date=stop)

    names = {t: [f"adv_{t}_{uuid.uuid4().hex[:8]}_v{i}" for i in range(2)]
             for t in ("alpha", "beta")}
    try:
        seed = v.snapshot(payload(datetime(2024, 1, 1), datetime(2024, 1, 2)))
        pks = {"alpha": ["id"], "beta": ["k"]}
        for t, snap in seed.items():
            save_state_bucketed(snap, names[t][0], pks[t], n_buckets=4)

        out = v.advance_states(
            payload(datetime(2024, 1, 2), datetime(2024, 1, 3)),
            {t: n[0] for t, n in names.items()},
            {t: n[1] for t, n in names.items()},
        )
        full = v.snapshot(payload(datetime(2024, 1, 1), datetime(2024, 1, 3)))
        for t in ("alpha", "beta"):
            got = sorted(map(tuple, out[t].collect()))
            want = sorted(map(tuple, full[t].collect()))
            assert got == want, t
    finally:
        for n in names.values():
            for x in n:
                spark.sql(f"DROP TABLE IF EXISTS {x}")


def test_drift_between_states_flags_moved_column(spark, tmp_path, tables):
    from rust_cdc_validator_spark.api import CdcValidator
    from rust_cdc_validator_spark.sources.catalog import StaticCatalog

    a = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, score double"
    )
    b = spark.createDataFrame(
        [(i, float(i) * 3) for i in range(50)], "id long, score double"
    )
    save_state_bucketed(a, tables[0], ["id"], n_buckets=4)
    save_state_bucketed(b, tables[1], ["id"], n_buckets=4)
    v = CdcValidator(
        spark, StaticCatalog({"public": {"items": ({"id": "bigint"}, ["id"])}})
    )
    rows = {
        (r["column"], r["metric"]): r
        for r in v.drift_between_states(tables[0], tables[1]).collect()
    }
    assert rows[("score", "mean")]["drifted"] is True
    assert rows[("id", "mean")]["drifted"] is False
    assert rows[("__table__", "row_count")]["drifted"] is False
