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
* Per-query rep ALLOCATION (round-6 verdict: at 106 queries a flat rep
  count degraded to 2 — a median of two runs IS their mean, and one GC
  spike migrates it): the warm-up pass doubles as a cost probe, and reps
  are allocated per query from it. Every query gets the same floor first
  (coverage before resolution); leftover budget then buys extra rounds
  for the CHEAP queries — a sub-second query at 5 reps costs ~2 s of
  budget and gains a real median, while a 4 s query stays at the floor.
  Rounds stay interleaved: round k times every query whose allocation
  exceeds k, so dispersion remains session-wide, and the wave structure
  means a mid-run budget stop leaves every query with the same rep count
  (uniform truncation, never a half-measured catalog).
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

#: steady-state passes run ~25% faster than the warm-up (codegen/worker
#: startup is in the warm numbers) — measured across the r6 clean runs
_STEADY_FACTOR = 0.75
#: queries under this estimated steady-state cost are "cheap": extra reps
#: are nearly free and their 2-rep medians were the migrating-spike victims.
#: 1.5 because the estimate is 0.75x the WARM time, which still overstates
#: steady state for scan-bound queries — the first r7 run left 4 queries
#: that run sub-second at steady state on 2-rep medians at a 1.0 cutoff.
_CHEAP_S = 1.5
#: hard per-query rep ceiling (diminishing returns past this)
_MAX_REPS = 7


def _iqr(runs: list[float]) -> float:
    if len(runs) < 2:
        return 0.0
    q = statistics.quantiles(runs, n=4, method="inclusive")
    return q[2] - q[0]


def _allocate_reps(
    est: dict[str, float], budget_s: float, target: int
) -> dict[str, int]:
    """Per-query rep counts fitted to ``budget_s``.

    Fairness first: raise EVERY query to the same level (1 → 2 → …
    ``target``) while the budget holds — a uniform floor keeps medians
    comparable across the catalog. Then spend what's left on extra reps
    for cheap queries only (up to ``_MAX_REPS``), cheapest first — that's
    where two-run medians were statistically meaningless and where a rep
    costs the least.
    """
    alloc = {name: 1 for name in est}
    remaining = budget_s - sum(est.values())
    if remaining < 0:
        return alloc  # coverage floor: one run each, never a partial catalog

    def raise_wave(names: list[str], level: int) -> float:
        nonlocal remaining
        wave_cost = sum(est[n] for n in names if alloc[n] == level - 1)
        if wave_cost <= remaining:
            for n in names:
                if alloc[n] == level - 1:
                    alloc[n] = level
            remaining -= wave_cost
            return wave_cost
        return -1.0

    everyone = sorted(est)
    for level in range(2, target + 1):
        if raise_wave(everyone, level) < 0:
            break
    # cheap extras resume from wherever the uniform waves stopped: under
    # budget pressure the heavies stay at the floor but sub-second queries
    # still climb to a statistically meaningful rep count. Unlike the
    # uniform waves these fill PARTIALLY, cheapest first — an
    # all-or-nothing cheap wave meant one over-budget wave left the whole
    # catalog on 2-rep medians (the exact failure mode this allocator
    # exists to prevent). A caller who PINNED a low target (REPS<=2, e.g.
    # a one-pass smoke run) gets exactly that — extras only engage at the
    # default-or-higher target.
    if target < 3:
        return alloc
    cheap = sorted((n for n in est if est[n] < _CHEAP_S), key=est.__getitem__)
    for level in range(2, _MAX_REPS + 1):
        for n in cheap:
            if alloc[n] == level - 1 and est[n] <= remaining:
                alloc[n] = level
                remaining -= est[n]
    return alloc


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    start = time.time()
    spark = get_spark("bench")

    # warm-up: one untimed pass of EVERY query (JVM JIT, codegen cache,
    # python-UDF worker pool, parquet footers) — doubles as the cost probe
    # the rep allocator reads (see module docstring)
    warm: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = time.time() - t0
        gc.collect()  # release py4j refs so ContextCleaner can drop
        # eager-localCheckpoint RDDs; otherwise blocks from dozens of
        # earlier queries pile up in executor storage and distort timings

    target = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Budget guard (100-query catalog): the harness window that runs this
    # script is finite, and a killed run loses EVERY median — worse than
    # fewer reps. Fit per-query reps to the remaining budget using the
    # warm-up costs (steady state runs faster, so they're a safe bound).
    # The DEFAULT budget scales with the catalog (r7 verdict #4: a fixed
    # 540 s fit 3 reps at 106 queries but degraded to a uniform 2-rep
    # floor at 120). Sized assuming steady state runs NO faster than the
    # warm pass — 0.75x is the historical mean, but the first r8 capture
    # measured ~0.95x on a noisy machine and the optimistic budget cut
    # round 3 on the wave boundary; a pessimistic budget only ever ends
    # early, never under-reps. Floored at the old 540 s so small catalogs
    # keep their cheap-query extra reps. An explicit
    # SPARK_GRAFT_BENCH_BUDGET_S always wins (the driver's window is not
    # ours to size).
    env_budget = os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S")
    warm_total = sum(warm.values())
    budget = (
        float(env_budget)
        if env_budget
        else max(540.0, (1.0 + target) * warm_total + 120.0)
    )
    remaining = budget - (time.time() - start) - 30.0  # leave margin to emit
    est = {name: max(_STEADY_FACTOR * t, 1e-3) for name, t in warm.items()}
    alloc = _allocate_reps(est, remaining, target)
    n_rounds = max(alloc.values())
    if min(alloc.values()) < target:
        print(
            f"bench: budget {budget:.0f}s fits floor "
            f"{min(alloc.values())} rep(s), not {target} — reduced",
            file=sys.stderr,
        )

    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"),
    )

    def emit_line(runs: dict[str, list[float]]) -> str:
        timings = {
            name: round(statistics.median(r), 3) for name, r in runs.items()
        }
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
        return json.dumps(
            {
                "metric": "all_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "dispersion": dispersion,
                "reps": {name: len(r) for name, r in runs.items()},
                "interleaved": True,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )

    def write_out(line: str) -> None:
        try:
            with open(out_path, "w") as f:
                f.write(line + "\n")
        except OSError as e:
            print(f"bench: could not write {out_path}: {e}", file=sys.stderr)

    runs: dict[str, list[float]] = {name: [] for name in QUERIES}
    for k in range(n_rounds):  # interleaved: round k times every query
        # whose allocation exceeds k — cheap-query extra rounds stay
        # spread across the session like the base rounds
        wave = [n for n in QUERIES if alloc[n] > k]
        wave_est = sum(est[n] for n in wave)
        if k > 0 and (time.time() - start) + wave_est > budget - 30.0:
            # estimates drifted: stop on a wave boundary (uniform
            # truncation — every remaining query keeps equal reps)
            print(f"bench: stopping after round {k} (budget)", file=sys.stderr)
            break
        for name in wave:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.time() - t0)
            gc.collect()
        # checkpoint the capture after EVERY completed round: an external
        # kill (harness wall limit) then costs one round of resolution,
        # never the whole run's medians
        write_out(emit_line(runs))

    line = emit_line(runs)
    print(line)
    # companion file: the driver's stdout capture is tail-bounded and
    # truncated BENCH_r05's medians away (r5 verdict) — the full line always
    # lands on disk too, so no capture window can lose it
    write_out(line)
    spark.stop()


if __name__ == "__main__":
    main()
