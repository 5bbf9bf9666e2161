"""Bucketed range (interval) join.

Spark's built-in strategies for a non-equi join predicate like
``p.ts BETWEEN i.lo AND i.hi`` are broadcast-nested-loop (fine only when one
side is tiny) or cartesian — both quadratic when each side is large. The
scalable shape, used by every production interval-join implementation
(e.g. Flink's interval join and Databricks' range-join optimization), is:

1. quantize the value domain into fixed-width buckets;
2. a point row lands in exactly one bucket; an interval row is replicated
   into every bucket its ``[lo, hi]`` span covers (``sequence`` + ``explode``);
3. equi-join on (optional equality keys…, bucket) — a plain shuffled hash
   join Catalyst can plan and AQE can rebalance;
4. apply the exact ``BETWEEN`` predicate to discard same-bucket misses.

Replication factor is ``span / bucket_width + 1`` per interval row, so pick
``bucket_width`` on the order of the typical span: the join stays linear in
input size, never quadratic in it. At 100 TB the equality keys (e.g.
``user_id``) carry most of the selectivity and the bucket bound the rest —
no row ever meets more than its own few buckets.

The reference has no join operators at all (SURVEY.md §2.3); this is part of
the beyond-reference pipeline layer (as-of join's sibling — as-of is
"nearest earlier event", range join is "all events in a window").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "_range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    equality_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row whose ``[lo, hi]``
    contains it (and whose ``equality_keys`` match), without a nested-loop
    plan. Column sets of the two sides must be disjoint apart from
    ``equality_keys``. ``point_col``/``lo_col``/``hi_col`` must be numeric
    (cast timestamps to epoch first).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(equality_keys or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    w = F.lit(bucket_width).cast("long")
    pb = points.withColumn(_BUCKET, _fdiv(F.col(point_col), w))
    ib = intervals.withColumn(
        _BUCKET,
        F.explode(F.sequence(_fdiv(F.col(lo_col), w), _fdiv(F.col(hi_col), w))),
    )
    joined = pb.join(ib, on=keys + [_BUCKET], how="inner")
    return joined.filter(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    ).drop(_BUCKET)


def _fdiv(col: Column, width: Column) -> Column:
    """Floor-division that is correct for negative values too (Spark's
    ``div`` truncates toward zero; ``floor`` of the true quotient doesn't)."""
    return F.floor(col.cast("long").cast("double") / width).cast("long")
