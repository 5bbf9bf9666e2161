"""Mergeable distinct-count sketches (HyperLogLog, Flajolet et al. 2007)
as ENGINE-PORTABLE register arrays.

Spark's ``approx_count_distinct`` answers one query; a standing pipeline
needs the SKETCH itself: per-day/per-shard register arrays that persist,
MERGE exactly (register-wise max — sketch(A) ⊎ sketch(B) ==
sketch(A ∪ B), bit-for-bit), and answer distinct-count questions over
arbitrary unions of history without ever recounting raw data. That
union-without-recount property is the whole point — counting 100 TB once
per partition and folding KB-sized registers afterwards.

Everything is JVM expression arithmetic over an md5-derived 60-bit hash
(no UDFs, no JVM-private sketch formats), so a SQL oracle can rebuild the
registers AND the estimate exactly — the `events_user_hll` query is
value-hash-checked against DuckDB, which no binary-sketch design allows.

Layout: one row per group, ``registers`` = dense ``array<int>`` of
``m = 2**p`` rank-of-first-one values. Estimation is the standard HLL
harmonic mean with the small-range linear-counting correction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60  # 15 md5 hex digits — stays positive in a signed 64-bit


def _h60(col: Column) -> Column:
    """Uniform 60-bit hash: first 15 hex digits of md5 of the string form.
    md5 (not xxhash64) so the oracle can replay it: DuckDB parses the
    same digits with CAST('0x' || substring(md5(v), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """One HLL register array per group over ``value_col``'s distinct
    values. ``p`` trades size for error: m = 2**p registers, standard
    error ≈ 1.04/sqrt(m) (p=12 → ±1.6%).

    Scale shape: index and rank are map-side column arithmetic; the
    registers reduce through a (group, idx) max aggregation — map-side
    partial max collapses each partition to ≤ m rows per group before
    the shuffle, so shuffle volume is bounded by groups × m tiny rows
    regardless of input size. The dense regroup moves ≤ m rows per group.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    tail = _HASH_BITS - p
    h = _h60(F.col(value_col))
    idx = F.shiftright(h, tail)
    w = h.bitwiseAND(F.lit((1 << tail) - 1))
    # rank of first 1-bit in the tail window (1-based from the left);
    # all-zero tail -> tail+1. bin() length = floor(log2(w))+1 for w>0,
    # exact integer string arithmetic — no float log anywhere.
    rho = F.when(w == 0, F.lit(tail + 1)).otherwise(
        F.lit(tail) - (F.length(F.bin(w)) - F.lit(1))
    )
    regs = (
        df.select(*group_cols, idx.alias("_idx"), rho.alias("_rho"))
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rho").alias("_r"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)),
    )
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_idx").cast("int"), F.col("_r")))
            ).alias("_m")
        )
        .select(*group_cols, dense.alias("registers"))
    )


def hll_merge(a: Column, b: Column) -> Column:
    """Union two register arrays: element-wise max. EXACT: merging
    per-partition sketches gives bit-identical registers to sketching the
    union (max is associative/commutative/idempotent), so re-merging,
    re-ordering, or double-counting overlapping history never skews the
    estimate."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hll_estimate(registers: Column, p: int = 12) -> Column:
    """Distinct-count estimate from a register array: HLL harmonic mean
    ``alpha_m · m² / Σ 2^(−r)`` with the small-range linear-counting
    correction (``m·ln(m/V)`` when the raw estimate ≤ 2.5m and V empty
    registers remain). Pure expression — usable over persisted sketches
    without any driver code, and replayable in SQL."""
    m = 1 << p
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    s = F.aggregate(
        registers,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    zeros = F.size(F.filter(registers, lambda r: r == 0))
    raw = F.lit(alpha * m * m) / s
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)


# ---------------------------------------------------------------------------
# Count-Min: mergeable frequency sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

def _cm_bucket(value: Column, i: int, w: int) -> Column:
    """Row-``i`` bucket for a value: 4 md5 hex digits of the salted string
    form, mod ``w`` (w must divide 16⁴ so the mod is unbiased) — the same
    engine-portable discipline as every md5 bucket here."""
    h = F.md5(F.concat(F.lit(f"{i}:"), value.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % w).cast("int")


def cm_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str | None = None,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """One Count-Min table per group: ``d`` hash rows × ``w`` counters,
    flattened row-major into a single ``array<long>`` (``counters``).
    Point-frequency overestimates by at most ``e·N/w`` with probability
    ``1 − e^−d`` (never underestimates) — the heavy-hitter / frequency
    side of the sketch family (:func:`hll_sketch` is the distinct side).

    Scale shape: bucket assignment is map-side arithmetic; each of the
    ``d`` rows reduces through a (group, row, bucket) SUM whose map-side
    partials bound shuffle volume at groups × d × w rows whatever the
    input size; the dense regroup moves the same. ``weight_col`` makes it
    a weighted-frequency sketch (token counts, byte sizes).
    """
    if 65536 % w != 0:
        raise ValueError("w must divide 16^4 (unbiased md5 bucket contract)")
    if d < 1:
        raise ValueError("d must be >= 1")
    wt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = None
    for i in range(d):
        r = df.select(
            *group_cols,
            F.lit(i).alias("_row"),
            _cm_bucket(F.col(value_col), i, w).alias("_b"),
            wt.alias("_wt"),
        )
        rows = r if rows is None else rows.unionByName(r)
    regs = rows.groupBy(*group_cols, "_row", "_b").agg(
        F.sum("_wt").alias("_c")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(d * w - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("long")),
    )
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("_row") * w + F.col("_b")).cast("int"),
                        F.col("_c"),
                    )
                )
            ).alias("_m")
        )
        .select(*group_cols, dense.alias("counters"))
    )


def cm_merge(a: Column, b: Column) -> Column:
    """Combine two Count-Min tables: element-wise sum. Over DISJOINT
    inputs (per-partition / per-day sketches of distinct row sets) this
    is exactly the sketch of the union; overlapping inputs double-count —
    unlike :func:`hll_merge`, CM merge is additive, not idempotent, so
    fold each raw row into exactly one part."""
    return F.zip_with(a, b, lambda x, y: x + y)


def cm_estimate(counters: Column, value: Column, d: int = 4, w: int = 256) -> Column:
    """Point-frequency estimate: min over the ``d`` rows of the value's
    counter — a pure expression over a persisted sketch (join the sketch
    row, estimate any number of candidate values without touching raw
    data). Never below the true count."""
    est = None
    for i in range(d):
        c = F.element_at(counters, _cm_bucket(value, i, w) + F.lit(i * w) + 1)
        est = c if est is None else F.least(est, c)
    return est
