"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (distributed
execution, no driver collect). One warm-up query amortizes JVM/codegen
startup out of the measurements.

Methodology:
* Warm-up (round-1 verdict): every query first runs ONCE untimed — a
  query's first execution pays one-off JVM codegen, Arrow/pandas-UDF worker
  startup, and broadcast costs that are 2-5x its steady state and are not
  properties of the plan.
* Interleaved repetitions (round-4 verdict: "make bench regressions
  attributable"): the timed reps run A,B,C,...,A,B,C,... — every query is
  measured once per ROUND, with rounds spread across the session — rather
  than A,A,A,B,B,B. Back-to-back reps share whatever transient state the
  session is in (GC pressure, page cache, JIT recompilation), so a bad
  moment used to poison all of one query's reps while leaving its
  neighbors pristine; 36/64 queries swung >1.2x between r3 and r4 in code
  nobody touched. Interleaving converts session drift from a per-query
  bias into per-query dispersion, which the output now reports.
* Per-query MEDIAN is the headline (single runs swing up to ~5x from GC
  noise; round-1 observation on lineitem_cube). The `dispersion` key
  carries min/median/max/IQR plus every raw run so a regression can be
  judged against the query's own noise floor: a delta inside the IQR is
  noise, not a regression.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_cdc_validator_spark.queries import QUERIES  # noqa: E402
from rust_cdc_validator_spark.session import get_spark  # noqa: E402


def _iqr(runs: list[float]) -> float:
    if len(runs) < 2:
        return 0.0
    q = statistics.quantiles(runs, n=4, method="inclusive")
    return q[2] - q[0]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    start = time.time()
    spark = get_spark("bench")

    # warm-up: one untimed pass of EVERY query (JVM JIT, codegen cache,
    # python-UDF worker pool, parquet footers) — see module docstring
    warm0 = time.time()
    for fn in QUERIES.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        gc.collect()  # release py4j refs so ContextCleaner can drop
        # eager-localCheckpoint RDDs; otherwise blocks from dozens of
        # earlier queries pile up in executor storage and distort timings
    warm_cost = time.time() - warm0

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Budget guard (100-query catalog): the harness window that runs this
    # script is finite, and a killed run loses EVERY median — worse than
    # fewer reps. The warm-up pass just measured one full-catalog pass, so
    # fit the rep count to the remaining budget (steady-state passes run
    # faster than the warm-up, so warm_cost is a safe upper bound). Full
    # catalog coverage is never sacrificed — only dispersion resolution.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "540"))
    remaining = budget - (time.time() - start) - 30.0  # leave margin to emit
    # steady-state passes run ~25% faster than the warm-up (codegen/worker
    # startup is in the warm numbers) — measured across the r6 clean runs
    rep_est = max(0.75 * warm_cost, 1e-9)
    afford = max(1, int(remaining // rep_est))
    if afford < reps:
        print(
            f"bench: budget {budget:.0f}s fits {afford} rep(s) of "
            f"~{rep_est:.0f}s, not {reps} — reducing",
            file=sys.stderr,
        )
        reps = afford
    runs: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(reps):  # interleaved: each round times every query once
        for name, fn in QUERIES.items():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(time.time() - t0)
            gc.collect()

    timings = {name: round(statistics.median(r), 3) for name, r in runs.items()}
    dispersion = {
        name: {
            "min": round(min(r), 3),
            "median": timings[name],
            "max": round(max(r), 3),
            "iqr": round(_iqr(r), 3),
            "runs": [round(x, 3) for x in r],
        }
        for name, r in runs.items()
    }

    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "all_queries_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "dispersion": dispersion,
            "reps": reps,
            "interleaved": True,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    print(line)
    # companion file: the driver's stdout capture is tail-bounded and
    # truncated BENCH_r05's medians away (r5 verdict) — the full line always
    # lands on disk too, so no capture window can lose it
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
    )
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"bench: could not write {out_path}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
