"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (distributed
execution, no driver collect). One warm-up query amortizes JVM/codegen
startup out of the measurements.

$SPARK_GRAFT_BENCH_REPS (default 1) runs each query N times and reports
the per-query MEDIAN — single runs swing up to ~5× on a few queries from
GC/JIT noise (round-1 observation on lineitem_cube), so set REPS=3 when
comparing plans.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_cdc_validator_spark.queries import QUERIES  # noqa: E402
from rust_cdc_validator_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm-up: JVM JIT + parquet footer caches, not counted
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "all_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
