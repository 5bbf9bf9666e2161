"""Full-lineage superstep plans for the long-key-encoding evidence:
with checkpoint=False the iteration lineage is not truncated, so
.explain('formatted') shows every superstep exchange and its join keys
(node string before r13, bigint nid after). Usage:

    python tools/dump_superstep_plans.py <outdir> <suffix>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rust_cdc_validator_spark.plans.inspect import explain_str  # noqa: E402
from rust_cdc_validator_spark.queries import _trade_edge_state_for  # noqa: E402
from rust_cdc_validator_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("superstep-plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    state = _trade_edge_state_for(spark, sf_dir)

    from rust_cdc_validator_spark.operators.graphstate import (
        pagerank_from_state,
        shortest_hops_from_state,
        weighted_paths_from_state,
    )

    seeds = spark.createDataFrame([("s1",), ("s2",), ("s3",)], "node string")
    cases = {
        "pagerank_supersteps": lambda: pagerank_from_state(
            spark, state, iterations=2, checkpoint=False
        ),
        "sssp_supersteps": lambda: weighted_paths_from_state(
            spark, state, seeds, max_hops=2, inverse_weight=True,
            checkpoint=False,
        ),
        "bfs_supersteps": lambda: shortest_hops_from_state(
            spark, state, seeds, max_hops=2, checkpoint=False
        ),
    }
    for name, fn in cases.items():
        plan = explain_str(fn())
        out = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange hashpartitioning")
        print(f"wrote {out} ({n_ex} hash exchanges)")
    spark.stop()


if __name__ == "__main__":
    main()
