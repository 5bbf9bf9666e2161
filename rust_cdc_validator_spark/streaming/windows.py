"""Streaming windowed aggregation + custom stateful operators.

The reference has no streaming surface (SURVEY.md §2.9); these are the
Structured Streaming building blocks a CDC/event pipeline needs on Spark:

* ``windowed_counts``: tumbling event-time windows with a watermark — late
  data beyond the watermark is dropped, state is bounded (the canonical
  late-data handling pattern).
* ``running_totals_stateful``: per-key running aggregates via
  ``applyInPandasWithState`` — the escape hatch for operators Spark's
  built-in aggregations can't express (custom eviction, session logic,
  model state). State is an explicit tuple per key, timeout-driven.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts with late-data drop beyond the watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType(
    [T.StructField("total", T.DoubleType()), T.StructField("n", T.LongType())]
)
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, n = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += len(pdf)
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total_value": [total], "n_events": [n]})


def dedup_stream(
    stream: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event dedup across micro-batches: Spark keeps the seen
    id set as streaming state, bounded by the watermark (ids older than the
    watermark can be evicted because duplicates that late are dropped by
    the watermark anyway)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([id_col])


def running_totals_stateful(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (total, count) that survives across micro-batches —
    arbitrary stateful processing via Arrow-batched pandas."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
