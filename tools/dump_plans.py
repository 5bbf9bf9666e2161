"""Dump `.explain('formatted')` for named catalog queries to files —
the before/after plan evidence for optimization rounds. Usage:

    python tools/dump_plans.py <outdir> <suffix> name [name ...]

Writes <outdir>/<name>_<suffix>.txt per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_cdc_validator_spark.plans.inspect import explain_str  # noqa: E402
from rust_cdc_validator_spark.queries import QUERIES  # noqa: E402
from rust_cdc_validator_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    for name in names:
        plan = explain_str(QUERIES[name](spark, sf_dir))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(') Exchange')} exchanges)")


if __name__ == "__main__":
    main()
