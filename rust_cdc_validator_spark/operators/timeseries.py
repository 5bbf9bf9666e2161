"""Time-range rolling aggregates: per-key trailing-window features over an
event stream — the feature-engineering primitive behind "activity in the
last hour" style signals.

This is the RANGE-frame window class (frame bounded by the ORDER-BY
*value*, not by row offsets): ``supplier_running_totals`` and friends cover
ROWS frames; a trailing time window needs
``rangeBetween(-lookback, 0)`` over an integer timestamp so sparse and
bursty keys get the same wall-clock semantics.

Scale shape: ONE hash shuffle on the keys + a per-key sort — groupBy cost
class. Spark evaluates a bounded RANGE frame with a sliding buffer holding
only the rows inside the frame, so executor memory is bounded by the
busiest key's event count within ``lookback`` (not by partition size);
pick ``lookback`` accordingly for hot keys, or pre-aggregate to coarser
ticks first. No reference counterpart — extension surface (SURVEY.md §2.9:
the reference has no windowing at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_window_features(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    lookback: int,
    prefix: str = "rolling",
) -> DataFrame:
    """Append trailing-window features per key: ``{prefix}_count``,
    ``{prefix}_sum``, ``{prefix}_avg`` of ``value_col`` over the inclusive
    window ``[ts - lookback, ts]`` (same units as ``ts_col``, which must
    be integer-typed — epoch micros/nanos; event-time semantics, so rows
    at equal ts see each other).

    All other columns pass through. One shuffle on ``keys``; the frame
    buffer holds only in-window rows per key.
    """
    if lookback <= 0:
        raise ValueError("lookback must be positive")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-lookback, 0)
    )
    return (
        df.withColumn(f"{prefix}_count", F.count(F.lit(1)).over(w))
        .withColumn(f"{prefix}_sum", F.sum(value_col).over(w))
        .withColumn(f"{prefix}_avg", F.avg(value_col).over(w))
    )
