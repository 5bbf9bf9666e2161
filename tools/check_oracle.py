"""Replicate the driver's correctness gate locally: run each Spark query and
its DuckDB oracle at sf0.01, compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from rust_cdc_validator_spark.queries import ORACLES, QUERIES
    from rust_cdc_validator_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        spark_s = time.time() - t0
        if name not in ORACLES:
            print(f"  {name:28s} rows-only: {len(srows):7d} rows  ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(ORACLES[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_s = time.time() - t0
        sc, sv = frame_key(scols, srows)
        oc, ov = frame_key(ocols, orows)
        status = "OK"
        if sc != oc:
            status = f"COLS MISMATCH spark={sc} duck={oc}"
        elif len(sv) != len(ov):
            status = f"ROWCOUNT spark={len(sv)} duck={len(ov)}"
        elif sv != ov:
            bad = next(
                (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if a != b
            )
            status = f"VALUES differ at sorted-row {bad[0]}:\n    spark={bad[1]}\n    duck ={bad[2]}"
        if status != "OK":
            failures.append(name)
        print(
            f"  {name:28s} {status if status != 'OK' else f'OK {len(sv):7d} rows'}"
            f"  (spark {spark_s:.1f}s, duck {duck_s:.1f}s)"
        )
    spark.stop()
    if failures:
        print(f"\nFAILED: {failures}")
        return 1
    print("\nall oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
