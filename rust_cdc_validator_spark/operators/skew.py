"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join (enabled in session.py) handles most skew at runtime by
splitting oversized partitions. Salting is the static fallback for extreme
hot keys — e.g. a null-heavy join column or a power-law CDC key:

* salted_join: scatter the big side across ``salt_factor`` salts, replicate
  the small side once per salt; join on (key, salt). Hot-key partitions
  split ``salt_factor`` ways at the cost of small-side duplication.
* salted_agg: two-phase aggregation — partial agg on (key, salt), final
  recombine on key. Only valid for algebraic aggregates; the caller states
  both phases explicitly so the recombination is always correct.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _salt_col(salt_factor: int) -> Column:
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_factor)
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys; equals ``big.join(small, on, how)`` for
    row-preserving join types (inner/left)."""
    big_s = big.withColumn("_salt", _salt_col(salt_factor))
    salts = big.sparkSession.range(salt_factor).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, on=[*on, "_salt"], how=how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Callable[[str], Column]],
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    ``partial_aggs``: output name → aggregate expression for phase 1 (over
    (keys, salt)). ``final_aggs``: same names → fn(col_name) recombining
    partials in phase 2, e.g.::

        salted_agg(df, ["k"],
                   partial_aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
                   final_aggs={"n": F.sum, "s": F.sum})
    """
    partial = (
        df.withColumn("_salt", _salt_col(salt_factor))
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(name) for name, c in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[fn(name).alias(name) for name, fn in final_aggs.items()]
    )


def key_skew_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """The diagnostic that decides WHETHER to salt: one row summarizing
    how skewed a prospective shuffle key is — the shuffle-planning
    companion to ``salted_join``/``salted_agg`` and the static sibling of
    AQE's runtime skew split.

    Columns: n_rows, n_keys, max_count, max_share (hottest key's row
    fraction — >1/parallelism means the hot key alone outlasts every
    other task), entropy_norm (Shannon entropy of the key distribution
    over log2 n_keys: 1.0 = uniform, →0 = one key dominates), gini
    (0 = uniform, →1 = concentrated).

    Shape: ONE map-side-combining count agg to a keys-sized relation,
    then a keys-sized re-agg. The Gini ranks come from
    ``layout.prefix_sum`` (range-repartitioned two-phase scan), NOT a
    global window — a 100M-key relation would funnel through one task
    otherwise; key columns break count ties so the ranks are exact.
    Output is a single row.
    """
    from rust_cdc_validator_spark.operators.layout import prefix_sum

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    ranked = prefix_sum(
        counts.withColumn("_one", F.lit(1)),
        order_cols=["_c", *key_cols],
        value_col="_one",
        out_col="_r0",
    ).withColumn("_i", F.col("_r0") + 1)
    return ranked.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_c").alias("max_count"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("max_share"),
        # H = log2 N − (Σ c·log2 c)/N (no nested aggregates), normalized
        # by the uniform-distribution maximum log2 n_keys
        F.when(
            F.count(F.lit(1)) > 1,
            F.round(
                (
                    F.log2(F.sum("_c"))
                    - F.sum(F.col("_c") * F.log2("_c")) / F.sum("_c")
                )
                / F.log2(F.count(F.lit(1))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("entropy_norm"),
        F.round(
            (2 * F.sum(F.col("_i") * F.col("_c")))
            / (F.count(F.lit(1)) * F.sum("_c"))
            - (F.count(F.lit(1)) + 1) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )
