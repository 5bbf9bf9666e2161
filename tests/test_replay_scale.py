"""Scale-ish replay correctness: 500k changes over 100k keys across 20 CDC
files, verified against an independent DuckDB window-function oracle over
the same files. Also exercises the multi-file single-scan path (20 files →
one distributed read) at a size where per-file looping would visibly hurt.
"""

from __future__ import annotations

import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rust_cdc_validator_spark.operators.replay import replay_snapshot
from rust_cdc_validator_spark.sources.manifest import FileMode, discover_files

N_KEYS = 100_000
N_FILES = 20
ROWS_PER_FILE = 25_000


def _gen(root: str) -> None:
    rng = np.random.default_rng(42)
    # LOAD: every key once
    pq.write_table(
        pa.table(
            {
                "Op": np.repeat("I", N_KEYS),
                "_dms_ingestion_timestamp": np.repeat("2024-01-01T00:00:00Z", N_KEYS),
                "id": np.arange(N_KEYS, dtype=np.int64),
                "v": np.arange(N_KEYS, dtype=np.int64),
            }
        ),
        f"{root}/LOAD00000001.parquet",
    )
    for f in range(N_FILES):
        ids = rng.integers(0, N_KEYS, size=ROWS_PER_FILE)
        ops = rng.choice(np.array(["U", "U", "U", "D", "I"]), size=ROWS_PER_FILE)
        vals = rng.integers(0, 1_000_000, size=ROWS_PER_FILE)
        pq.write_table(
            pa.table(
                {
                    "Op": ops,
                    "_dms_ingestion_timestamp": np.repeat(
                        f"2024-01-{f + 2:02d}T00:00:00Z", ROWS_PER_FILE
                    ),
                    "id": ids,
                    "v": vals,
                }
            ),
            f"{root}/2024/01/{f + 2:02d}/cdc-{f:04d}.parquet",
        )


def test_replay_500k_changes_matches_duckdb_oracle(spark, tmp_path):
    root = str(tmp_path / "db/public/big")
    import os

    for f in range(N_FILES):
        os.makedirs(f"{root}/2024/01/{f + 2:02d}", exist_ok=True)
    _gen(root)

    entries = discover_files(
        spark, root, FileMode.DATE_AWARE,
        start_date=__import__("datetime").datetime(2020, 1, 1),
    )
    assert len(entries) == N_FILES + 1 and entries[0].is_load

    t0 = time.time()
    result = replay_snapshot(spark, entries, ["id"])
    spark_rows = result.count()
    elapsed = time.time() - t0

    # independent oracle: DuckDB over the same files, file order from the
    # manifest, row order within file from parquet order
    con = duckdb.connect()
    frames = []
    for e in entries:
        local = e.path.split("file:", 1)[-1] if e.path.startswith("file:") else e.path
        con.execute(
            f"CREATE OR REPLACE VIEW f AS SELECT *, "
            f"{e.file_seq} AS fseq, row_number() OVER () - 1 AS rpos "
            f"FROM read_parquet('{local}')"
        )
        frames.append(con.execute("SELECT * FROM f").arrow())
    all_changes = pa.concat_tables(frames)
    con.register("changes", all_changes)
    oracle_n, oracle_sum = con.execute(
        """
        SELECT COUNT(*), SUM(v) FROM (
          SELECT id, v, Op,
                 row_number() OVER (PARTITION BY id
                                    ORDER BY fseq DESC, rpos DESC) AS rn
          FROM changes
        ) WHERE rn = 1 AND Op <> 'D'
        """
    ).fetchone()

    spark_sum = result.selectExpr("sum(v)").collect()[0][0]
    assert spark_rows == oracle_n
    assert spark_sum == oracle_sum
    # throughput sanity: half a million changes should replay in seconds
    total_changes = N_KEYS + N_FILES * ROWS_PER_FILE
    assert elapsed < 60, f"replay of {total_changes} changes took {elapsed:.1f}s"
    print(f"\nreplayed {total_changes} changes -> {spark_rows} live keys "
          f"in {elapsed:.2f}s ({total_changes / elapsed:,.0f} changes/s)")
