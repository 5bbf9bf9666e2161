"""Replicate the driver's correctness gate locally: run each Spark query and
its DuckDB oracle at sf0.01, compare row count, column names, result TYPES,
and order-insensitive exact values.

Round-1 lesson (VERDICT.md "What's wrong" #1): the driver's value-hash is
type-sensitive — a DuckDB HUGEINT (bare SUM over integers) hashes differently
from Spark's BIGINT even when every value matches. The old norm_cell()
(%.10g / str) erased that distinction, so the local gate passed while the
driver failed. This version compares:
  * Arrow schema type CLASSES per column (int / float / decimal / str / ...)
    — DuckDB surfaces HUGEINT as decimal128(38,0) in Arrow, so a bare
    integer SUM now fails locally exactly as it does on the driver;
  * exact typed reprs of every cell (no float rounding, Decimal != int).

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def type_class(t: pa.DataType) -> str:
    """Coarse, engine-portable type class for an Arrow type. Integer widths
    are collapsed (Spark int32 vs DuckDB int64 is benign) but the
    int/float/decimal/string boundaries are preserved — those are what the
    driver's hash is sensitive to."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    return str(t)


def norm_cell(v):
    """Type-tagged repr; floats rounded to 10 significant digits.

    Floats are the ONE family compared approximately: cross-engine
    decimal→double casts differ in the last ulp (q1's sum_disc_price:
    ...410907 vs ...41090703) yet hash-match on the driver, so the driver's
    value-hash tolerates sub-10-digit float noise. Everything else —
    including the int/decimal type boundary the old gate missed — is exact."""
    if v is None:
        return "~null~"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):  # date/datetime: compare instants, not tzinfo
        return v.isoformat()
    return f"{type(v).__name__}:{v!r}"


def frame_key(tbl: pa.Table):
    cols = tbl.column_names
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    sorted_types = [type_class(tbl.schema.field(cols[i]).type) for i in order]
    pyrows = tbl.to_pylist()
    out = sorted(
        tuple(norm_cell(r[cols[i]]) for i in order) for r in pyrows
    )
    return sorted_cols, sorted_types, out


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
        stbl = sdf.toArrow()
        spark_s = time.time() - t0
        if name not in ORACLES:
            print(
                f"  {name:28s} rows-only: {stbl.num_rows:7d} rows  ({spark_s:.1f}s)"
            )
            continue
        t0 = time.time()
        otbl = con.execute(ORACLES[name]).arrow()
        duck_s = time.time() - t0
        sc, st, sv = frame_key(stbl)
        oc, ot, ov = frame_key(otbl)
        status = "OK"
        if sc != oc:
            status = f"COLS MISMATCH spark={sc} duck={oc}"
        elif st != ot:
            bad = [
                (c, a, b) for c, a, b in zip(sc, st, ot) if a != b
            ]
            status = f"TYPES MISMATCH {bad} (spark vs duck)"
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
            f"  {name:28s} {status if status != 'OK' else f'OK {stbl.num_rows:7d} rows'}"
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
