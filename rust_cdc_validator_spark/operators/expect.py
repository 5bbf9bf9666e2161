"""Declarative data-quality expectations — the validation mission of the
reference (equality diff between two copies, cdc_operator.rs:254-288)
generalized to SINGLE-table contracts: instead of "does the target match
the source", assert what a correct table looks like (nullability, ranges,
formats, uniqueness, referential integrity) and get one auditable report
row per expectation.

Scale shape: every ROW-LEVEL expectation (not_null / in_range / in_set /
matches_regex) compiles into one conditional-sum inside a SINGLE
aggregation pass — map-side partials, one scan however many expectations.
UNIQUE expectations ride the same pass as count-distinct partials.
REFERENTIAL expectations each cost one broadcast-able anti-join count
against their (dimension-sized) reference relation. The report is
expectations-sized — KBs. Everything is exact integer counting, so a SQL
oracle replays every row bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Expectation", "expect_report"]


@dataclass(frozen=True)
class Expectation:
    """One table contract: ``kind`` ∈ {not_null, in_range, in_set,
    matches_regex, unique, referential}. ``params``: in_range uses
    lo/hi (inclusive, either optional), in_set uses values, matches_regex
    uses pattern (RE2-safe so oracles replay), referential uses
    ref (DataFrame) + ref_col. NULLs: range/set/regex expectations
    SKIP nulls (that is not_null's job) — n_checked counts non-nulls."""

    name: str
    kind: str
    column: str
    params: dict = field(default_factory=dict)


def _violation(e: Expectation) -> tuple[Column, Column]:
    """(applicable, violated) predicate pair for a row-level kind."""
    c = F.col(e.column)
    if e.kind == "not_null":
        return F.lit(True), c.isNull()
    if e.kind == "in_range":
        lo, hi = e.params.get("lo"), e.params.get("hi")
        v = F.lit(False)
        if lo is not None:
            v = v | (c < F.lit(lo))
        if hi is not None:
            v = v | (c > F.lit(hi))
        return c.isNotNull(), v
    if e.kind == "in_set":
        return c.isNotNull(), ~c.isin(list(e.params["values"]))
    if e.kind == "matches_regex":
        return c.isNotNull(), ~c.rlike(e.params["pattern"])
    raise ValueError(f"unknown row-level expectation kind {e.kind!r}")


def expect_report(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run every expectation; return one row each:
    (expectation, kind, column, n_checked, n_failed, pass_ratio).

    * row-level kinds fold into ONE aggregation pass over ``df``;
    * ``unique`` adds a count-distinct to that same pass
      (n_failed = n_non_null − n_distinct: the rows beyond one per value);
    * ``referential`` runs one anti-join count per expectation against
      ``params["ref"]``'s ``params["ref_col"]`` (broadcast-sized dims —
      the catalog's FK targets — stay broadcast; Spark picks).
    """
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")
    aggs = []
    row_level = []
    for e in expectations:
        if e.kind in ("not_null", "in_range", "in_set", "matches_regex"):
            applicable, violated = _violation(e)
            aggs.append(
                F.sum(F.when(applicable, 1).otherwise(0))
                .cast("long")
                .alias(f"_chk_{e.name}")
            )
            aggs.append(
                F.sum(F.when(applicable & violated, 1).otherwise(0))
                .cast("long")
                .alias(f"_bad_{e.name}")
            )
            row_level.append(e)
        elif e.kind == "unique":
            c = F.col(e.column)
            aggs.append(
                F.sum(F.when(c.isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"_chk_{e.name}")
            )
            aggs.append(
                F.countDistinct(c).cast("long").alias(f"_dst_{e.name}")
            )
            row_level.append(e)
        elif e.kind != "referential":
            raise ValueError(f"unknown expectation kind {e.kind!r}")
    spark = df.sparkSession
    rows = []
    if row_level:
        stats = df.agg(*aggs).first()
        for e in row_level:
            checked = int(stats[f"_chk_{e.name}"] or 0)
            if e.kind == "unique":
                failed = checked - int(stats[f"_dst_{e.name}"] or 0)
            else:
                failed = int(stats[f"_bad_{e.name}"] or 0)
            rows.append((e.name, e.kind, e.column, checked, failed))
    for e in expectations:
        if e.kind != "referential":
            continue
        ref = e.params["ref"].select(
            F.col(e.params["ref_col"]).alias("_rk")
        ).distinct()
        side = df.select(F.col(e.column).alias("_fk")).filter(
            F.col("_fk").isNotNull()
        )
        checked, failed = (
            side.join(ref, side["_fk"] == ref["_rk"], "left")
            .agg(
                F.count(F.lit(1)).cast("long"),
                F.sum(F.when(F.col("_rk").isNull(), 1).otherwise(0)).cast(
                    "long"
                ),
            )
            .first()
        )
        rows.append(
            (e.name, "referential", e.column, int(checked), int(failed or 0))
        )
    order = {n: i for i, n in enumerate(names)}
    rows.sort(key=lambda r: order[r[0]])
    out = spark.createDataFrame(
        rows,
        "expectation string, kind string, column string, "
        "n_checked long, n_failed long",
    )
    return out.withColumn(
        "pass_ratio",
        F.round(
            F.when(
                F.col("n_checked") > 0,
                (F.col("n_checked") - F.col("n_failed"))
                / F.col("n_checked"),
            ).otherwise(F.lit(1.0)),
            6,
        ),
    )
