"""Physical-plan report over the full query catalog: per query, the
properties that matter at scale — exchange count, join strategies, pushed
filters, codegen spans, and red flags (cartesian products, single-partition
windows). Usage: python tools/plan_report.py [query ...]"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from rust_cdc_validator_spark.queries import QUERIES
    from rust_cdc_validator_spark.plans.inspect import explain_str
    from rust_cdc_validator_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark("plan-report")
    flags_total = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            plan = explain_str(fn(spark, sf_dir))
        except Exception as exc:  # plan-only; queries with driver-side stages
            print(f"{name:28s} (not statically plannable: {type(exc).__name__})")
            continue
        # formatted-mode node names: "(12) Exchange" + "Arguments: hashpartitioning(...)"
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        n_single = len(re.findall(r"Arguments: SinglePartition", plan))
        n_bc = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        n_bnl = plan.count("BroadcastNestedLoopJoin")
        n_cart = plan.count("CartesianProduct")
        n_wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        single_part_window = n_single > 0 and "Window" in plan
        flags = []
        if n_cart:
            flags.append("CARTESIAN")
        if single_part_window:
            flags.append("SINGLE-PARTITION-WINDOW")
        flags_total += len(flags)
        print(
            f"{name:28s} exch={n_ex:2d} bhj={n_bc} smj={n_smj} bnlj={n_bnl} "
            f"codegen={n_wsc:2d} pushed={pushed} {' '.join(flags)}"
        )
    spark.stop()
    print(f"\nred flags: {flags_total}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
