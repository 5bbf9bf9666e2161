"""Distribution drift between two table snapshots — the monitoring
companion to the equality diff (`operators/diff.py`).

The reference validates that two databases are EQUAL
(cdc_operator.rs:254-288 delegating to rust-pgdatadiff); a standing
pipeline also wants to know HOW a table moved between versions when they
legitimately differ — nulls creeping up, a numeric column's scale
shifting, cardinality collapsing after a bad join upstream. This operator
reduces each side to a per-column metric vector and compares those.

Scale shape: ONE aggregation pass per side (all partials map-side, output
is columns × metrics — KBs), then a columns-sized driver-free compare via
a tiny join. Cost at 100 TB = two scans, no shuffle beyond the one-row
aggregates; safe on any width (metrics are built per-column into a single
agg, not per-column jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _metric_rows(df: DataFrame, columns: list[str]) -> DataFrame:
    """One aggregation pass → long format (column, metric, value) with
    every metric a DOUBLE: count, null_count, and for numeric columns
    mean/stddev/min/max. Exact aggregates only, so the result is
    engine-checkable; distinct estimates belong to profile_table."""
    aggs = [F.count(F.lit(1)).cast("double").alias("__rows")]
    per_col: dict[str, list[str]] = {}
    for c in columns:
        dt = df.schema[c].dataType
        safe = c.replace("`", "")
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("double").alias(f"__null__{safe}")
        )
        per_col[c] = ["null_count"]
        if isinstance(dt, _NUMERIC):
            d = F.col(c).cast("double")
            aggs += [
                F.avg(d).alias(f"__mean__{safe}"),
                F.stddev_samp(d).alias(f"__std__{safe}"),
                F.min(d).alias(f"__min__{safe}"),
                F.max(d).alias(f"__max__{safe}"),
            ]
            per_col[c] += ["mean", "std", "min", "max"]
    row = df.agg(*aggs)
    pairs: list = []
    pairs += [F.lit("__rows"), F.col("__rows")]
    tag = {"null_count": "null", "mean": "mean", "std": "std",
           "min": "min", "max": "max"}
    for c, metrics in per_col.items():
        safe = c.replace("`", "")
        for m in metrics:
            # NUL separator: legal nowhere in SQL identifiers
            key = f"{c}\x00{m}"
            pairs += [F.lit(key), F.col(f"__{tag[m]}__{safe}")]
    # long format via explode over a literal-keyed map rather than stack()
    # string templating (injection-proof for odd column names)
    kvs = F.create_map(*pairs)
    long = row.select(F.explode(kvs).alias("_key", "value"))
    split = F.split(F.col("_key"), "\x00")
    return long.select(
        F.when(F.col("_key") == "__rows", F.lit("__table__"))
        .otherwise(split.getItem(0))
        .alias("column"),
        F.when(F.col("_key") == "__rows", F.lit("row_count"))
        .otherwise(split.getItem(1))
        .alias("metric"),
        F.col("value").cast("double").alias("value"),
    )


def drift_report(
    before: DataFrame,
    after: DataFrame,
    columns: list[str] | None = None,
    rel_tolerance: float = 0.01,
) -> DataFrame:
    """Compare two snapshots of a table column-by-column: one row per
    (column, metric) with ``value_before``, ``value_after``, ``rel_delta``
    (|after−before| / max(|before|, 1e-12)) and ``drifted`` (rel_delta >
    ``rel_tolerance``; a metric present on one side only — schema drift —
    is always flagged). Metrics: row_count, per-column null_count, and
    mean/std/min/max for numeric columns.

    Columns default to the intersection of both schemas; columns present
    on one side only surface as all-null rows flagged drifted."""
    cols_b = set(before.columns)
    cols_a = set(after.columns)
    columns = columns or sorted(cols_b | cols_a)
    mb = _metric_rows(before, [c for c in columns if c in cols_b])
    ma = _metric_rows(after, [c for c in columns if c in cols_a])
    joined = (
        mb.withColumnRenamed("value", "value_before")
        .join(
            ma.withColumnRenamed("value", "value_after"),
            ["column", "metric"],
            "full_outer",
        )
    )
    both = F.col("value_before").isNotNull() & F.col("value_after").isNotNull()
    rel = F.abs(F.col("value_after") - F.col("value_before")) / F.greatest(
        F.abs(F.col("value_before")), F.lit(1e-12)
    )
    return joined.select(
        "column",
        "metric",
        "value_before",
        "value_after",
        F.when(both, rel).alias("rel_delta"),
        F.when(both, rel > F.lit(rel_tolerance))
        .when(
            F.col("value_before").isNull() & F.col("value_after").isNull(),
            F.lit(False),  # null on BOTH sides (e.g. std of 1 row) = no drift
        )
        .otherwise(F.lit(True))
        .alias("drifted"),
    )
