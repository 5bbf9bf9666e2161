"""2-D Pareto frontier (skyline) over a DataFrame — Börzsönyi, Kossmann
& Stocker 2001's SKYLINE OF operator, specialized to two criteria, which
is the case with a shuffle-free-after-one-exchange exact algorithm.

"Best trade-off" questions ("record price for its date", "cheapest
supplier at each quality level") are dominance queries: a point is ON the
frontier iff no other point is at least as good on both criteria and
strictly better on one. The naive formulation is a self-join (quadratic —
a non-starter at scale); the 2-D case instead sorts by one criterion and
keeps running records of the other:

  1. collapse to one candidate per x (the best y at that x) — a hash
     aggregation, map-side combined, output is |distinct x| rows;
  2. exclusive running max of candidate y in ascending-x order via
     :func:`operators.layout.prefix_max` (range exchange +
     partition-local windows + broadcast offsets — no single-task global
     window, no self-join);
  3. keep candidates whose y beats every strictly-smaller x's best.

Total cost: one agg shuffle on x + one range exchange of the
|distinct x|-sized candidate relation. The window arithmetic is plain
max/compare, so a SQL oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pareto_frontier_2d"]


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    minimize_x: bool = True,
    maximize_y: bool = True,
) -> DataFrame:
    """Distinct non-dominated (x, y) points of ``df``.

    Dominance (default orientation minimize-x / maximize-y): point p is
    dominated iff some q has q.x <= p.x AND q.y >= p.y with at least one
    strict inequality. Flip orientations with ``minimize_x`` /
    ``maximize_y`` — internally the frame is reflected (negation) onto
    the canonical case, then reflected back, so all four quadrant
    conventions share one plan. Ties: coincident points are mutually
    non-dominated and return as ONE distinct row. NULL in either column
    is excluded (no dominance order with NULL).
    """
    x, y = F.col(x_col), F.col(y_col)
    base = df.select(
        (x if minimize_x else -x).alias("_x"),
        (y if maximize_y else -y).alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    cand = base.groupBy("_x").agg(F.max("_y").alias("_ybest"))
    from rust_cdc_validator_spark.operators.layout import prefix_max

    scanned = prefix_max(cand, ["_x"], "_ybest", "_prev_best")
    frontier = scanned.filter(
        F.col("_prev_best").isNull() | (F.col("_ybest") > F.col("_prev_best"))
    )
    restore_x = F.col("_x") if minimize_x else -F.col("_x")
    restore_y = F.col("_ybest") if maximize_y else -F.col("_ybest")
    return frontier.select(restore_x.alias(x_col), restore_y.alias(y_col))
