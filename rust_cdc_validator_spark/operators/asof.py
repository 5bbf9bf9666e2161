"""As-of (point-in-time) join: for each left row, the most recent right row
with the same key and right.ts <= left.ts (backward direction, inclusive).

Spark has no built-in as-of join (pandas has `merge_asof`; DuckDB has
`ASOF JOIN`). The naive formulation — a range join `l.ts >= r.ts` followed by
a max-per-left-row reduction — explodes to O(|L| * matches) intermediate rows
and Spark plans the inequality as a broadcast-nested-loop when the equi-key
is missing. This implementation is the scalable shape:

* UNION both sides into one relation tagged with `_side` (right=0, left=1),
* ONE hash shuffle on the join key,
* per key, sort by (ts, _side) and carry the right-side payload forward with
  `last(col, ignorenulls=True)` over a running frame,
* keep only left rows.

Cost: one shuffle of |L| + |R| narrow rows and one per-key sort — the same
cost class as a sort-merge join, with no pair explosion regardless of how
many right rows precede a left row. At 100 TB this is the only viable shape:
the shuffle carries each row once, AQE handles moderate key skew, and no
driver state exists.

Right-side duplicates at the same (key, ts) are reduced to ONE deterministic
winner first (greatest tiebreak column) — mirroring pandas `merge_asof`
(which keeps the last by input order) but with an explicit, order-free rule,
because at-scale "input order" is not reproducible.

Tolerance (optional): with `tolerance=t`, a match older than `left.ts - t`
is nulled out — pandas `merge_asof(tolerance=...)` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_MTS = "_asof_matched_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance: int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join, backward or forward.

    ``direction="backward"`` (default): `left` gains `value_cols` from the
    most recent `right` row per `on`-key having
    ``right[right_ts] <= left[left_ts]`` (null when none).
    ``direction="forward"``: the EARLIEST right row with
    ``right[right_ts] >= left[left_ts]`` — "next event after" semantics
    (pandas ``merge_asof(direction='forward')``, DuckDB
    ``ASOF JOIN ... ON l.ts <= r.ts``). Same single-shuffle plan: only
    the per-key traversal order flips, so the running carry picks up the
    nearest FOLLOWING payload instead.

    `tiebreak`: right column deciding ties at identical (key, ts) — the
    greatest value wins; defaults to the first of `value_cols`.
    `tolerance`: max allowed gap between the timestamps (same units as
    the ts columns); farther matches are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    tiebreak = tiebreak or value_cols[0]

    # 1. deterministic winner per (key, right_ts)
    wdup = Window.partitionBy(*on, right_ts).orderBy(F.col(tiebreak).desc())
    r1 = (
        right.select(*on, right_ts, *value_cols)
        .withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 2. tag + union: right rows sort BEFORE left rows at the same ts, so an
    #    equal-timestamp right row is visible to the left row (inclusive >=)
    left_cols = left.columns
    r_tagged = r1.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(r1.schema[c].dataType).alias(c) for c in value_cols],
        *[F.col(c) for c in left_cols if c not in on],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # 3. one shuffle on the key; a running last-non-null over ONE struct
    #    carries the newest right payload forward (struct-wrapping keeps
    #    legitimately-NULL right values intact — only whole left rows are
    #    skipped by ignorenulls) plus the matched ts for the tolerance check
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col(_TS).alias(_MTS), *[F.col(c) for c in value_cols]),
    )
    carried = unioned.select("*", F.last(payload, ignorenulls=True).over(w).alias("_p"))

    out = carried.filter(F.col(_SIDE) == 1)
    keep: list = [F.col(c) for c in on]
    keep += [F.col(_TS).alias(left_ts)]
    keep += [F.col(c) for c in left_cols if c not in on and c != left_ts]
    if tolerance is None:
        in_tol = F.lit(True)
    elif direction == "backward":
        in_tol = F.col(_TS) - F.col("_p")[_MTS] <= F.lit(tolerance)
    else:
        in_tol = F.col("_p")[_MTS] - F.col(_TS) <= F.lit(tolerance)
    keep += [F.when(in_tol, F.col("_p")[c]).alias(c) for c in value_cols]
    return out.select(*keep)
