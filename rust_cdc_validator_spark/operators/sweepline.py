"""Sweep-line interval analytics: peak concurrency over half-open
intervals — the +1/−1 boundary-scan family (concurrent sessions, open
connections, room occupancy, overlapping jobs).

Spark-first shape (no per-group single-partition window anywhere):

1. Each interval [start, end) emits two boundary rows (+1 at start, −1
   at end).
2. Boundaries COLLAPSE to (group…, t, delta) cells in one map-side-
   combined aggregation — the scan's input is the cells relation, not
   the row set, and the collapsed key is UNIQUE, which is exactly
   :func:`layout.prefix_sums`' tie-free-order contract.
3. ONE generalized two-phase prefix scan (range exchange + partition-
   local windows + broadcast offsets) ordered by (group…, t, delta)
   yields the running concurrency. Because every interval contributes
   +1 and −1, each group's deltas sum to ZERO, so the GLOBAL running
   sum resets itself at group boundaries — per-group semantics without
   a partitioned window. −1 sorts before +1 at equal t (half-open: a
   departure at t frees its slot before an arrival at t claims one).
4. The peak and its first instant come from one struct-max aggregate:
   ``max(struct(run, −t))`` is the highest concurrency at its earliest
   time. Tie-safety: after the cell collapse, run values exist only at
   cell ends, and a cell's value is order-independent, so the argmax is
   deterministic and a SQL oracle replays it.

At 100 TB: one boundary-agg shuffle of the data + one range exchange of
the CELLS relation (distinct boundary instants, not rows) + a |groups|
aggregate. Skew concentrates in the boundary agg exactly like any keyed
count — AQE / salting apply unchanged.

Reference parity: extension operator (no reference counterpart); the
prefix-scan machinery is shared with operators/layout.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["peak_concurrency"]


def peak_concurrency(
    df: DataFrame,
    group_cols: list[str],
    start_col: str | Column,
    end_col: str | Column,
) -> DataFrame:
    """Per group: the maximum number of simultaneously-open half-open
    intervals [start, end) and the first instant it is reached.

    Returns (group…, peak_concurrency, first_peak) with peak a long and
    first_peak in the start/end columns' (integer) domain. Rows whose
    start or end is NULL, or with end <= start (empty interval), are
    excluded.
    """
    from rust_cdc_validator_spark.operators.layout import prefix_sums

    if not group_cols:
        raise ValueError("group_cols must not be empty")
    s = F.col(start_col) if isinstance(start_col, str) else start_col
    e = F.col(end_col) if isinstance(end_col, str) else end_col
    iv = df.select(*group_cols, s.alias("_s"), e.alias("_e")).filter(
        F.col("_s").isNotNull()
        & F.col("_e").isNotNull()
        & (F.col("_e") > F.col("_s"))
    )
    # both boundaries in ONE pass (explode, not unionAll — the union form
    # evaluates the caller's upstream plan twice)
    pts = iv.select(
        *group_cols,
        F.explode(
            F.array(
                F.struct(
                    F.col("_s").alias("_t"), F.lit(1).alias("_delta")
                ),
                F.struct(
                    F.col("_e").alias("_t"), F.lit(-1).alias("_delta")
                ),
            )
        ).alias("_x"),
    ).select(
        *group_cols,
        F.col("_x._t").alias("_t"),
        F.col("_x._delta").alias("_delta"),
    )
    cells = pts.groupBy(*group_cols, "_t", "_delta").agg(
        F.sum("_delta").alias("_d")
    )
    cum = prefix_sums(
        cells, [*group_cols, "_t", "_delta"], {"_d": "_before"}
    )
    run = cum.select(
        *group_cols,
        "_t",
        (F.col("_before") + F.col("_d")).alias("_run"),
    )
    best = run.groupBy(*group_cols).agg(
        F.max(
            F.struct(F.col("_run").alias("r"), (-F.col("_t")).alias("nt"))
        ).alias("_b")
    )
    return best.select(
        *group_cols,
        F.col("_b.r").alias("peak_concurrency"),
        (-F.col("_b.nt")).alias("first_peak"),
    )
