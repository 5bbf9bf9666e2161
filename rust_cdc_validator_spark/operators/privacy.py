"""Privacy risk measurement for training-data release: k-anonymity and
l-diversity audits (Sweeney 2002; Machanavajjhala et al. 2007).

A corpus that leaves the pipeline (training set, eval dump, vendor
hand-off) carries re-identification risk through QUASI-IDENTIFIER
combinations — columns individually harmless (nation, segment, balance
band) whose joint values isolate individuals. The standard audit:

  * k-anonymity: every quasi-identifier combination must cover ≥ k rows;
    a row in a smaller group is re-identifiable by linking on those
    columns alone.
  * l-diversity: within each combination, a SENSITIVE column must take
    ≥ l distinct values — a 50-row group is still disclosive if all 50
    share the same diagnosis.

Both are plain aggregations, so the audit is exactly SQL-replayable —
unlike the PII regex scrub (``events_pii_scrub``), which removes known
patterns, this measures the structural risk that remains.

Scale shape at 100 TB: ONE hash aggregation on the quasi-identifier
tuple with map-side partial counts (plus a distinct-count partial for
l-diversity); everything after is a groups-sized re-aggregation to a
one-row report. No joins, no windows, nothing driver-side. Skewed
quasi-groups (huge common combinations) are exactly the SAFE ones, so
skew never needs mitigation here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "quasi_group_sizes"]


def quasi_group_sizes(
    df: DataFrame,
    quasi_cols: list[str | Column],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per quasi-identifier combination: row count, and (when
    ``sensitive_col`` is given) the number of distinct sensitive values.
    The drill-down companion to :func:`k_anonymity_report` — filter
    ``group_rows < k`` to see WHICH combinations leak."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("group_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("sensitive_values")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str | Column],
    k: int,
    sensitive_col: str | None = None,
    l: int | None = None,
) -> DataFrame:
    """One-row audit: does the frame satisfy k-anonymity (and optionally
    l-diversity) over ``quasi_cols``?

    Returns n_rows, n_groups, groups/rows below ``k`` (the rows that
    must be suppressed or generalized before release), the smallest
    group size, and — with ``sensitive_col`` + ``l`` — the same for
    diversity violations. ``at_risk_ratio`` is the fraction of rows
    re-identifiable at the chosen k.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    if l is not None and l < 2:
        raise ValueError("l must be >= 2")
    groups = quasi_group_sizes(df, quasi_cols, sensitive_col)
    viol = F.col("group_rows") < k
    aggs = [
        F.sum("group_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias("small_groups"),
        F.sum(F.when(viol, F.col("group_rows")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("group_rows").cast("long").alias("min_group_rows"),
    ]
    if l is not None:
        div_viol = F.col("sensitive_values") < l
        aggs += [
            F.sum(F.when(div_viol, 1).otherwise(0))
            .cast("long")
            .alias("low_diversity_groups"),
            F.sum(F.when(div_viol, F.col("group_rows")).otherwise(0))
            .cast("long")
            .alias("rows_low_diversity"),
        ]
    rep = groups.agg(*aggs)
    return rep.withColumn(
        "at_risk_ratio",
        F.round(F.col("rows_at_risk") / F.col("n_rows"), 6),
    )
