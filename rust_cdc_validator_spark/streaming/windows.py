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


def session_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time session windows via Spark's BUILT-IN ``session_window``
    — the declarative sibling of :func:`sessionize_stateful`: the engine
    merges events within ``gap`` of each other into one growing window
    per key, holds it in the streaming state store, and emits the closed
    session when the watermark passes its end. No Python state function
    runs anywhere — the whole operator is JVM-side (codegen'd merge +
    RocksDB-compatible state), which is the right default; reach for the
    ``applyInPandasWithState`` variant only when the session payload
    needs custom Python logic the built-in aggregation can't express.

    Late data beyond ``watermark`` is dropped (the same contract as the
    tumbling windows); out-of-order data WITHIN the watermark lands in
    the correct session even across micro-batches — the property the
    order-sensitive stateful fold only gets from its per-batch sort.

    Scale shape: one shuffle on ``key_col``; state is one (start, end,
    aggregates) tuple per OPEN session per key — bounded by watermark
    lag, independent of history length.
    """
    agg = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        agg.append(F.sum(value_col).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(*agg)
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
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
    """EXACT event dedup across micro-batches: Spark keeps the seen id set
    as streaming state. Caveat this docstring got wrong until r12: with
    ``dropDuplicates([id_col])`` the watermark does NOT evict that state —
    Spark only clears dedup state when the event-time column is part of
    the dedup subset — so the id set grows for the stream's lifetime.
    Correct for bounded id universes (CDC keys); for unbounded ones use
    ``dedup_stream_within_watermark`` below, whose state IS evicted."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([id_col])


def dedup_stream_within_watermark(
    stream: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-BOUNDED streaming dedup (``dropDuplicatesWithinWatermark``,
    Spark 3.5+): drops a record if a same-id record was already seen at an
    event time within the watermark delay, and evicts ids once the
    watermark passes them — state is O(ids per watermark window), not
    O(all ids ever), the shape an unbounded 100 TB/day ingest needs.
    The trade: a duplicate arriving after its first copy's state expired
    is re-emitted (at-least-once dedup; downstream sinks stay idempotent —
    the same contract streaming/jdbc_apply.py already assumes). Eviction
    is pinned behaviorally in tests (a post-expiry duplicate re-emits)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


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


_SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)
_SESS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    gap_us: int = 1_800_000_000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming sessionization — the stateful sibling of the batch
    ``events_sessionize`` query: per key, events within ``gap_us`` of the
    previous event belong to one session; a longer silence CLOSES the open
    session, which is emitted as one row. The open session survives across
    micro-batches as explicit state.

    ``idle_timeout_ms`` (processing-time) flushes a still-open session when
    its key has been silent that long — without it, a key that never speaks
    again holds its last session open forever (fine for AvailableNow
    drains, wrong for continuous mode; the timeout is the state-eviction
    contract applyInPandasWithState exists for).
    """

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "session_start_us": pd.Series(dtype="int64"),
                "session_end_us": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
            }
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "session_start_us": [start],
                 "session_end_us": [last], "n_events": [n]}
            )
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple] = []
        ts_all = sorted(int(t) for pdf in pdfs for t in pdf[ts_us_col])
        for t in ts_all:
            if last is not None and t - last > gap_us:
                closed.append((key[0], start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )
        else:
            yield _empty()

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


_HLL_STATE_SCHEMA = T.StructType(
    [T.StructField("regs", T.ArrayType(T.IntegerType()))]
)
_HLL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("est_distinct", T.DoubleType()),
        T.StructField("n_nonzero", T.IntegerType()),
    ]
)
_HLL_P = 10  # m = 1024 registers per key, ±3.3% 1σ — KBs of state per key


def _hll_estimate_py(regs) -> float:
    """Mirror of operators/sketch.hll_estimate for m=2^p registers."""
    m = 1 << _HLL_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs)
    zeros = sum(1 for r in regs if r == 0)
    raw = alpha * m * m / s
    if raw <= 2.5 * m and zeros > 0:
        import math

        return m * math.log(m / zeros)
    return raw


def _hll_prereduce(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Stateless in-plan pre-reduce for the streaming HLL fold: (idx, rho)
    are the SAME codegen column expressions as operators/sketch.hll_sketch
    (md5 ``conv``, ``bin``-length rank — JVM-side, no Python per row),
    then a partition-local pandas groupby-max collapses each partition to
    ≤ m rows per key BEFORE the stateful operator. Max is associative and
    idempotent, so partial maxima fold into state bit-identically to
    folding every raw event. NULL values hash to NULL and are excluded
    (SQL count-distinct semantics)."""
    from rust_cdc_validator_spark.operators.sketch import hll_index_rank

    idx, rho = hll_index_rank(F.col(value_col), _HLL_P)
    pre = df.select(
        F.col(key_col).cast("string").alias("_k"),
        idx.cast("int").alias("_idx"),
        rho.cast("int").alias("_rho"),
    ).filter(F.col("_idx").isNotNull())

    def partial_max(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # dropna=False: pandas groupby DROPS None group keys by default,
        # which would silently erase the NULL-key group the raw
        # stream.groupBy(key_col) used to emit
        parts = [
            pdf.groupby(["_k", "_idx"], as_index=False, dropna=False)[
                "_rho"
            ].max()
            for pdf in batches
            if len(pdf)
        ]
        if parts:
            yield (
                pd.concat(parts)
                .groupby(["_k", "_idx"], as_index=False, dropna=False)[
                    "_rho"
                ]
                .max()
            )

    return pre.mapInPandas(partial_max, schema="_k string, _idx int, _rho int")


def distinct_count_stateful(
    stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key streaming distinct count whose STATE is an HLL register
    array — bounded at m=1024 ints per key forever, unlike
    ``dropDuplicates`` state that grows with the distinct set. The
    streaming sibling of ``events_rolling_distinct_hll``'s batch
    sketches: the SAME hash/rank arithmetic, so state equals a batch
    sketch of everything seen (pytest-pinned).

    Scale shape: hashing happens as codegen column arithmetic and a
    partition-local pandas max (:func:`_hll_prereduce`) — the stateful
    operator's input is ≤ m rows per key per partition per micro-batch
    (register-sized, pytest-pinned), NOT the raw event stream, and the
    state update is one vectorized ``np.maximum.at`` over those rows.
    No per-row Python anywhere on the path."""
    reduced = _hll_prereduce(stream, key_col, value_col)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        m = 1 << _HLL_P
        (regs,) = state.get if state.exists else ([0] * m,)
        regs = np.asarray(regs, dtype=np.int32)
        for pdf in pdfs:
            np.maximum.at(
                regs, pdf["_idx"].to_numpy(), pdf["_rho"].to_numpy()
            )
        state.update(([int(r) for r in regs],))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "est_distinct": [_hll_estimate_py(regs)],
                "n_nonzero": [int((regs != 0).sum())],
            }
        )

    return reduced.groupBy("_k").applyInPandasWithState(
        update,
        outputStructType=_HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_GAUGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("first_peak", T.LongType()),
    ]
)
_GAUGE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("current", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("first_peak", T.LongType()),
    ]
)


def interval_boundaries(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Explode half-open intervals [start, end) into the (key, ts, delta)
    boundary relation the concurrency gauge consumes: +1 at start, −1 at
    end, NULL/empty intervals excluded (matching
    operators/sweepline.peak_concurrency). For a LIVE gauge feed the
    open and close events should instead arrive as separate rows when
    they happen — exploding a completed-interval stream closes every
    interval within its own micro-batch, so ``current`` nets to zero at
    each batch end (peak/first_peak remain the useful outputs)."""
    iv = df.select(
        F.col(key_col).alias("_k"),
        F.col(start_col).cast("long").alias("_s"),
        F.col(end_col).cast("long").alias("_e"),
    ).filter(
        F.col("_s").isNotNull()
        & F.col("_e").isNotNull()
        & (F.col("_e") > F.col("_s"))
    )
    # one-pass boundary fan-out (explode, not unionAll — the union form
    # evaluates the upstream plan twice)
    return iv.select(
        F.col("_k").alias(key_col),
        F.explode(
            F.array(
                F.struct(
                    F.col("_s").alias("ts"),
                    F.lit(1).cast("long").alias("delta"),
                ),
                F.struct(
                    F.col("_e").alias("ts"),
                    F.lit(-1).cast("long").alias("delta"),
                ),
            )
        ).alias("_x"),
    ).select(
        key_col,
        F.col("_x.ts").alias("ts"),
        F.col("_x.delta").alias("delta"),
    )


def _boundary_prereduce(
    df: DataFrame, key_col: str, ts_col: str, delta_col: str
) -> DataFrame:
    """Stateless in-plan pre-reduce for the streaming concurrency gauge:
    a partition-local pandas groupby-sum collapses boundary rows to NET
    deltas per (key, instant) BEFORE the stateful operator — partial
    sums are associative, so folding partial cells in time order equals
    folding every raw boundary, and net-collapse is peak-equivalent
    (within one instant the −1s apply before the +1s under half-open
    semantics, so the only new peak candidate is the post-all-deltas
    value — exactly the net cell's running value). The stateful input is
    cells (distinct boundary instants per key per partition), not the
    raw boundary stream. NULL ts/delta rows are excluded."""
    pre = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(ts_col).cast("long").alias("_t"),
        F.col(delta_col).cast("long").alias("_d"),
    ).filter(F.col("_t").isNotNull() & F.col("_d").isNotNull())

    def partial_sum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # dropna=False: a NULL gauge key is a real group (same policy as
        # _hll_prereduce); only NULL ts/delta rows are excluded above
        parts = [
            pdf.groupby(["_k", "_t"], as_index=False, dropna=False)[
                "_d"
            ].sum()
            for pdf in batches
            if len(pdf)
        ]
        if parts:
            yield (
                pd.concat(parts)
                .groupby(["_k", "_t"], as_index=False, dropna=False)[
                    "_d"
                ]
                .sum()
            )

    return pre.mapInPandas(partial_sum, schema="_k string, _t long, _d long")


def concurrency_gauge_stateful(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    delta_col: str = "delta",
) -> DataFrame:
    """Per-key streaming concurrency gauge over a BOUNDARY stream —
    rows are open (+1) / close (−1) events at an instant (connections
    opened and closed, sessions started and ended). Emits the CURRENT
    number open, the running PEAK, and the first instant the peak was
    reached, with O(1) state per key (three longs) forever — the
    stateful sibling of ``operators/sweepline.peak_concurrency``
    (:func:`interval_boundaries` explodes interval-shaped input into
    this relation).

    Exactness contract: ``current`` is exact under ANY arrival order
    (every boundary adjusts the sum exactly once — pytest-pinned under
    cross-batch disorder). ``peak``/``first_peak`` equal the batch
    operator whenever boundaries arrive in non-decreasing time order
    ACROSS micro-batches (within a batch the fold sorts, so intra-batch
    disorder is free — pytest-pinned on a time-split feed); a boundary
    older than the high-water mark still adjusts ``current``, but its
    transient peak cannot be reconstructed from three longs — the
    documented gauge approximation, same family as every O(1)-state
    monitor.

    Scale shape: delta arithmetic is codegen column work; a
    partition-local pandas sum (:func:`_boundary_prereduce`) hands the
    stateful operator cells, not events, and the state update is one
    vectorized cumsum over those cells. No per-row Python on the path."""
    reduced = _boundary_prereduce(stream, key_col, ts_col, delta_col)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cur, peak, first_peak = (
            state.get if state.exists else (0, 0, None)
        )
        cells = [pdf for pdf in pdfs if len(pdf)]
        if cells:
            merged = (
                pd.concat(cells)
                .groupby("_t", as_index=False)["_d"]
                .sum()
                .sort_values("_t")
            )
            running = merged["_d"].cumsum() + cur
            cur = int(running.iloc[-1])
            batch_max = int(running.max())
            if batch_max > peak:
                peak = batch_max
                first_peak = int(
                    merged.loc[running.to_numpy() == peak, "_t"].iloc[0]
                )
        state.update((cur, peak, first_peak))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "current": [cur],
                "peak": [peak],
                "first_peak": [first_peak],
            }
        )

    return reduced.groupBy("_k").applyInPandasWithState(
        update,
        outputStructType=_GAUGE_OUT_SCHEMA,
        stateStructType=_GAUGE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EXACT_GAUGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_buf", T.ArrayType(T.LongType())),
        T.StructField("d_buf", T.ArrayType(T.LongType())),
        T.StructField("cur", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("first_peak", T.LongType()),
    ]
)
_EXACT_GAUGE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("watermark_ts", T.LongType()),
        T.StructField("current", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("first_peak", T.LongType()),
    ]
)


def concurrency_gauge_exact(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    delta_col: str = "delta",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Event-time-EXACT streaming concurrency gauge (r11, closing the r10
    gauge's documented peak approximation): ``peak``/``first_peak`` equal
    ``operators/sweepline.peak_concurrency`` over every boundary the
    watermark admits, under ANY cross-batch arrival disorder — the
    exactness :func:`concurrency_gauge_stateful` can only promise for
    time-ordered feeds.

    Mechanism: boundary cells (the same :func:`_boundary_prereduce`
    relation) BUFFER in state until the watermark passes their instant;
    each invocation folds the now-CLOSED cells in global timestamp order
    into the running (current, peak, first_peak), exactly once, and
    re-arms an event-time timeout at the earliest still-open instant so
    closure fires even when a key's later batches carry no data. Late
    rows beyond the watermark are dropped by the engine (the standard
    event-time contract — pick ``watermark`` ≥ the worst expected
    disorder; note the engine drops rows AT the watermark too, so a
    boundary exactly ``watermark`` behind the max seen event time is
    already late); everything inside it is exact.

    Emitted per invocation: (key, watermark_ts s, current, peak,
    first_peak) — the gauge AS OF the closed horizon. ``current`` here
    is the closed-horizon running sum; the r10 gauge remains the
    any-order-exact choice for a LIVE ``current`` reading.

    State shape: the (cur, peak, first_peak) longs plus the OPEN cell
    buffer — bounded by watermark lag × distinct boundary instants per
    key (cells, not events: the pre-reduce nets deltas per instant
    before state), the price of event-time exactness every watermarked
    operator pays. Fold arithmetic is one vectorized pandas
    cumsum per invocation; no per-row Python."""
    reduced = _boundary_prereduce(stream, key_col, ts_col, delta_col)
    evt = reduced.withColumn(
        "_ts", F.timestamp_seconds(F.col("_t"))
    ).withWatermark("_ts", watermark)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_buf, d_buf, cur, peak, first_peak = state.get
            frames = [pd.DataFrame({"_t": ts_buf, "_d": d_buf})]
        else:
            cur, peak, first_peak = 0, 0, None
            frames = []
        frames += [pdf[["_t", "_d"]] for pdf in pdfs if len(pdf)]
        merged = (
            pd.concat(frames).groupby("_t", as_index=False)["_d"].sum()
            if frames
            else pd.DataFrame({"_t": [], "_d": []})
        )
        wm_ms = state.getCurrentWatermarkMs()
        closed = merged[merged["_t"] * 1000 <= wm_ms].sort_values("_t")
        still_open = merged[merged["_t"] * 1000 > wm_ms]
        if len(closed):
            running = closed["_d"].cumsum() + cur
            cur = int(running.iloc[-1])
            fold_max = int(running.max())
            if fold_max > peak:
                peak = fold_max
                first_peak = int(
                    closed.loc[running.to_numpy() == peak, "_t"].iloc[0]
                )
        state.update(
            (
                [int(t) for t in still_open["_t"]],
                [int(d) for d in still_open["_d"]],
                cur,
                peak,
                first_peak,
            )
        )
        if len(still_open):
            # fire again once the watermark reaches the earliest open
            # cell, even if this key sees no further data
            state.setTimeoutTimestamp(int(still_open["_t"].min()) * 1000)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "watermark_ts": [wm_ms // 1000],
                "current": [cur],
                "peak": [peak],
                "first_peak": [first_peak],
            }
        )

    return evt.groupBy("_k").applyInPandasWithState(
        update,
        outputStructType=_EXACT_GAUGE_OUT_SCHEMA,
        stateStructType=_EXACT_GAUGE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
    ]
)
_TOPK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_err", T.LongType()),
    ]
)


def _count_prereduce(df: DataFrame, key_col: str, item_col: str) -> DataFrame:
    """Stateless in-plan pre-reduce for the streaming top-k: partition-
    local pandas (key, item) count sums collapse each partition to one
    row per distinct (key, item) BEFORE the stateful operator. Counts
    are additive, so partial sums feed SpaceSaving identically to raw
    events — the same pre-reduce discipline as :func:`_hll_prereduce`
    and :func:`_boundary_prereduce` (the stateful operator must never
    see the raw stream)."""
    pre = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.col(item_col).cast("string").alias("_i"),
    ).filter(F.col("_i").isNotNull())

    def partial_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [
            pdf.groupby(["_k", "_i"], as_index=False, dropna=False)
            .size()
            .rename(columns={"size": "_c"})
            for pdf in batches
            if len(pdf)
        ]
        if parts:
            yield (
                pd.concat(parts)
                .groupby(["_k", "_i"], as_index=False, dropna=False)["_c"]
                .sum()
            )

    return pre.mapInPandas(partial_counts, schema="_k string, _i string, _c long")


def topk_stateful(
    stream: DataFrame,
    key_col: str,
    item_col: str,
    k: int = 10,
    capacity: int = 64,
) -> DataFrame:
    """Per-key streaming top-k heavy hitters whose STATE is a
    SpaceSaving summary (Metwally, Agrawal & El Abbadi, ICDT 2005) —
    ``capacity`` counters per key FOREVER, never the distinct-item set.
    Emits the current top ``k`` per key each micro-batch:
    (key, rank, item, est_count, max_err) with the SpaceSaving
    guarantees ``true ≤ est_count`` and ``est_count − max_err ≤ true``;
    any item whose true count exceeds N/capacity is guaranteed present.

    Batched update: the pre-reduced (item, partial count) rows merge
    into tracked counters by plain addition; untracked items enter (in
    deterministic (count DESC, item ASC) order, so results are
    partitioning-independent) by evicting the minimum counter and
    inheriting its count as error — the standard batched SpaceSaving
    generalization (increment-by-c ≡ c unit increments).

    Scale shape: counting happens partition-locally in Arrow batches
    (:func:`_count_prereduce`); the stateful operator's input is one
    row per distinct (key, item) per partition per micro-batch, and
    state is three capacity-length arrays per key. Estimates for
    UNTRACKED items simply don't appear — downstream consumers treat
    absence as "below the N/capacity watermark", exactly like the
    batch CM heavy-hitter screen (operators/sketch.py)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if capacity < k:
        raise ValueError("capacity must be >= k")
    reduced = _count_prereduce(stream, key_col, item_col)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs = state.get
            counters = {
                i: [c, e] for i, c, e in zip(items, counts, errs)
            }
        else:
            counters = {}
        pending: dict[str, int] = {}
        for pdf in pdfs:
            for i, c in zip(pdf["_i"], pdf["_c"]):
                if i in counters:
                    counters[i][0] += int(c)
                else:
                    pending[i] = pending.get(i, 0) + int(c)
        # deterministic admission order: heaviest new items first
        for i, c in sorted(pending.items(), key=lambda kv: (-kv[1], kv[0])):
            if len(counters) < capacity:
                counters[i] = [c, 0]
            else:
                victim = min(counters.items(), key=lambda kv: (kv[1][0], kv[0]))
                vmin = victim[1][0]
                del counters[victim[0]]
                counters[i] = [c + vmin, vmin]
        state.update((
            list(counters.keys()),
            [v[0] for v in counters.values()],
            [v[1] for v in counters.values()],
        ))
        top = sorted(counters.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "item": [i for i, _ in top],
                "est_count": [v[0] for _, v in top],
                "max_err": [v[1] for _, v in top],
            }
        )

    return reduced.groupBy("_k").applyInPandasWithState(
        update,
        outputStructType=_TOPK_OUT_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def psi_stream(
    stream: DataFrame,
    baseline: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    epsilon: float = 1e-6,
) -> DataFrame:
    """Streaming Population Stability Index: per event-time window, the
    PSI of the window's value distribution against a STATIC baseline
    histogram — the deployed-model drift monitor
    (:func:`operators.drift.psi_drift`) moved onto the live stream.
    Emits (window_start, window_end, n_events, psi) per window; the
    standard reading applies (< 0.1 stable, > 0.25 investigate).

    ``baseline`` is the reference histogram relation from
    :func:`operators.drift.psi_baseline` — (bin, bin_lo, width,
    share_before), built ONCE offline from the training snapshot. It is
    bins-sized and static, so it is read to the driver here (the one
    legitimate collect: reference metadata, not stream data) and
    COMPILED INTO the aggregation: bucket assignment is per-row
    arithmetic and the whole histogram is one windowed aggregate with a
    conditional-sum column per bin — a single streaming aggregation
    (chained per-bin-then-per-window aggs are not streaming-legal),
    after which the PSI folds as a literal expression over the bin
    columns, INCLUDING empty-bin epsilon terms, matching the batch
    operator's sum exactly.

    Scale shape: stateless bucketing, one watermarked windowed agg whose
    state is windows × (bins + 1) longs per key; bin edges never drift
    with the stream (out-of-range values clamp into the edge bins).
    NULL values are excluded, matching the batch operator.
    """
    rows = sorted(
        baseline.select("bin", "bin_lo", "width", "share_before").collect(),
        key=lambda r: r["bin"],
    )
    if not rows:
        raise ValueError("psi_stream: baseline histogram is empty")
    bins = len(rows)
    lo = float(rows[0]["bin_lo"])
    width = float(rows[0]["width"])
    shares = [float(r["share_before"]) for r in rows]
    x = F.col(value_col).cast("double")
    bucket = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    counts = (
        stream.filter(x.isNotNull())
        .select(F.col(ts_col), bucket.alias("_bin"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("_total"),
            *[
                F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).alias(
                    f"_b{i}"
                )
                for i in range(bins)
            ],
        )
    )
    psi = None
    for i in range(bins):
        pa = F.greatest(
            F.col(f"_b{i}").cast("double") / F.col("_total"), F.lit(epsilon)
        )
        pb = F.lit(max(shares[i], epsilon))
        term = (pa - pb) * (F.log(pa) - F.log(pb))
        psi = term if psi is None else psi + term
    return counts.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        F.col("_total").cast("long").alias("n_events"),
        psi.alias("psi"),
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    lookback: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval condition:
    each LEFT row pairs with the RIGHT rows of the same key whose
    timestamp falls in ``[left_ts - lookback, left_ts]`` — the
    "purchase joined to the views that preceded it" enrichment shape,
    fully declarative (no Python state function; Spark's symmetric hash
    join buffers both sides in the state store).

    The interval condition is what makes unbounded stream-stream join
    FEASIBLE: together with the watermarks it gives the engine an
    eviction bound — a buffered right row can be dropped once the
    watermark guarantees no future left row's lookback window can reach
    it, so state is O(rate × (watermark + lookback)) per side, not
    O(history). Without a time-range constraint Spark would have to
    keep every row forever (and rejects outer variants outright).

    ``how``: "inner" or "leftOuter" (left rows with no match emit with
    nulls once the watermark closes their window — the standard funnel
    "views that never converted" complement comes from rightOuter, but
    the unmatched-side semantics are symmetric).

    Columns are prefixed ``l_`` / ``r_`` so self-joins of one stream
    (the common case: events against events) never collide.
    """
    lpref = left.select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    ).withWatermark(f"l_{left_ts}", left_watermark)
    rpref = right.select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark(f"r_{right_ts}", right_watermark)
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (
            F.col(f"r_{right_ts}")
            >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
    )
    return lpref.join(rpref, cond, how)


_CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sp6", T.LongType()),
        T.StructField("sm6", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)
_CUSUM_OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("tick_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("s_plus", T.DoubleType()),
        T.StructField("s_minus", T.DoubleType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)


def cusum_stateful(
    stream: DataFrame,
    mu: float,
    sigma: float,
    k: float = 0.5,
    h: float = 4.0,
    key_col: str = "series",
    ts_us_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Streaming CUSUM control chart — the stateful sibling of the batch
    ``operators/timeseries.cusum_chart``: per series key, Page's
    one-sided sums S⁺/S⁻ of the standardized tick value fold across
    micro-batches as explicit state, alarming live when either crosses
    ``h``. Baseline (``mu``, ``sigma``) is FIXED from a training
    snapshot — the ``psi_baseline`` discipline: a self-baselined chart
    would re-standardize history every batch, and a control chart's
    whole point is a pinned reference regime.

    Equivalence contract (pytest-gated): on in-order ticks the emitted
    S⁺/S⁻ match the batch chart's prefix-identity values tick for tick —
    the state carries the SAME half-up-scaled integer micro-units
    (``floor(x·1e6 + 0.5)``), so batch/stream never drift by float
    association. Within a batch ticks process in event-time order; a
    tick at-or-before the last folded event time is DROPPED (the
    monotonicity guard — the recursion cannot retro-insert; callers who
    need exact disorder handling buffer with a watermark first, the
    ``concurrency_gauge_exact`` pattern).

    Scale shape: state is three scalars per series; each micro-batch
    shuffles once on the series key."""
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    if k < 0 or h <= 0:
        raise ValueError("k must be >= 0 and h > 0")
    kd = float(k)
    h6 = int(float(h) * 1e6 + 0.5)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        sp6, sm6, last_us = state.get if state.exists else (0, 0, None)
        ticks = sorted(
            (int(t), float(v))
            for pdf in pdfs
            for t, v in zip(pdf[ts_us_col], pdf[value_col])
            if v == v  # NaN ticks carry no signal
        )
        out = []
        for t, v in ticks:
            if last_us is not None and t <= last_us:
                continue  # monotonicity guard (see docstring)
            z = (round(v, 6) - mu) / sigma
            dp = math.floor((z - kd) * 1e6 + 0.5)
            dm = math.floor((-z - kd) * 1e6 + 0.5)
            sp6 = max(0, sp6 + dp)
            sm6 = max(0, sm6 + dm)
            last_us = t
            out.append(
                (
                    key[0],
                    t,
                    round(v, 6),
                    round(sp6 / 1e6, 6),
                    round(sm6 / 1e6, 6),
                    sp6 > h6 or sm6 > h6,
                )
            )
        state.update((sp6, sm6, last_us))
        yield pd.DataFrame(
            out,
            columns=[
                "series", "tick_us", "value", "s_plus", "s_minus", "alarm",
            ],
        ) if out else pd.DataFrame(
            {
                "series": pd.Series(dtype="object"),
                "tick_us": pd.Series(dtype="int64"),
                "value": pd.Series(dtype="float64"),
                "s_plus": pd.Series(dtype="float64"),
                "s_minus": pd.Series(dtype="float64"),
                "alarm": pd.Series(dtype="bool"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
