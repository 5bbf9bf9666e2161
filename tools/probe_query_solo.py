"""Solo per-query probe: run named catalog queries interleaved for N
reps on a quiet box and print per-rep walls + medians — the bisect
discipline that closed the r10 CM regression (probe_cm_regression.py),
generalized so any suspect query gets the same adjudication. Usage:

    python tools/probe_query_solo.py [reps] [sf_dir] name [name ...]

Reps interleave across queries (a b c, a b c, ...) so slow ambient
drift hits every query equally instead of biasing the last one. The
first rep is reported separately from the median — standing-index
builds (edge state, LSH/IVF, NB fits) amortize into rep 1 by design.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_validator_spark.queries import QUERIES
from rust_cdc_validator_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = int(args.pop(0)) if args and args[0].isdigit() else 5
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    names = args
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown or missing query names: {unknown}")
    spark = get_spark("probe-solo")
    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).collect()
            walls[n].append(time.perf_counter() - t0)
            print(
                f"rep {rep + 1}/{reps}  {n:40s} {walls[n][-1]:7.2f}s",
                flush=True,
            )
    print()
    for n in names:
        w = walls[n]
        med = statistics.median(w[1:]) if len(w) > 1 else w[0]
        print(
            f"{n:40s} rep1 {w[0]:6.2f}s  median(rest) {med:6.2f}s  "
            f"min {min(w):6.2f}s  all {[round(x, 2) for x in w]}"
        )


if __name__ == "__main__":
    main()
