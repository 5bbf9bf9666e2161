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


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention matrix: group users by the period of their FIRST
    event (the cohort), then count how many of each cohort are still active
    N periods later — the standard product-analytics retention triangle,
    here as a batch relational plan.

    Returns (cohort, age, n_users, cohort_size, retention) where ``age`` is
    whole ``bucket`` periods since the cohort period and ``retention`` =
    n_users / cohort_size (age 0 is 1.0 by construction).

    Scale shape: the event stream is projected to (user, date) and
    DEDUPLICATED before anything joins — map-side partial combine
    collapses each user's same-day events locally, so a high-event user
    contributes at most one row per active day to every downstream
    shuffle. Then (1) min-date per user rides the same (user,)-prefixed
    partitioning, (2) the first-date join fans the already-shrunk
    (user, date) rows, (3) distinct (user, cohort, age) then count by
    (cohort, age). Nothing wider than (user, date) ever shuffles. The
    cohort-size join is a broadcast: one row per cohort period.
    """
    if bucket not in ("week", "month", "day"):
        raise ValueError("bucket must be week|month|day")
    per = {"week": 7, "month": 30, "day": 1}[bucket]
    ev = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    first = ev.groupBy("_u").agg(F.min("_d").alias("_first"))
    aged = (
        ev.join(first, "_u")
        .select(
            "_u",
            F.date_trunc(bucket, F.col("_first")).cast("date").alias("cohort"),
            (
                F.floor(
                    F.datediff(
                        F.date_trunc(bucket, F.col("_d")),
                        F.date_trunc(bucket, F.col("_first")),
                    )
                    / per
                )
            ).cast("int").alias("age"),
        )
        .distinct()
    )
    counts = aged.groupBy("cohort", "age").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = counts.filter(F.col("age") == 0).select(
        "cohort", F.col("n_users").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_users",
            "cohort_size",
            F.round(
                F.col("n_users").cast("double") / F.col("cohort_size"), 4
            ).alias("retention"),
        )
    )


def event_path_ngrams(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    n: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Most-common length-``n`` event-type sequences per user stream (path
    analysis: "view → cart → purchase"). Orders each user's events by
    timestamp (plus ``tiebreak_col`` for a total order), slides an n-gram
    window with ``lead``, and counts each path corpus-wide.

    Returns (path, n_paths) — one row per distinct n-gram that occurs,
    ``path`` as the arrow-joined type string.

    Scale shape: one shuffle on the user key + per-user sort for the lead
    window (the stream never globally sorts), then a hash count on the
    n-gram string whose cardinality is |types|^n, tiny. The count agg gets
    map-side partial combine, so what shuffles the second time is at most
    (partitions x |types|^n) rows.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(" -> ", *steps)
    return (
        df.select(F.col(user_col), F.col(ts_col), F.col(type_col), path.alias("_path"))
        .filter(F.col("_path").isNotNull())
        .withColumn("_n_steps", F.size(F.split(F.col("_path"), " -> ")))
        .filter(F.col("_n_steps") == n)
        .groupBy(F.col("_path").alias("path"))
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )


def changepoint_amoc(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """At-most-one-change (AMOC) mean-shift detection per group — the
    binary-segmentation statistic of classic change-point analysis
    (Hinkley 1970; the first split of PELT/binseg): for every cut t of
    the ordered series, D_t = |mean(x₁..t) − mean(x_{t+1}..n)| ·
    √(t(n−t)/n), maximized over t. Reports each group's best cut —
    (group, n_points, cut_point, cut_index, shift_stat, mean_before,
    mean_after) — the monitoring query that answers "WHEN did this
    feed's level move", one step past drift_report's "did it move".

    Recursive CUSUM folds don't window-express; this statistic does:
    ONE per-group cumulative-sum window (prefix mean; suffix mean derives
    from total − prefix) + one max-ranking window over the same
    partitioning — two shuffles on the group key, no recursion, so the
    SQL oracle replays it exactly. Ties break on the earliest cut.
    Series are per-group ordered sequences (e.g. daily aggregates):
    pre-aggregate raw events to ticks first so n = series length, not
    row count.
    """
    g = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*g).orderBy(order_col)
    cum = df.select(
        *g,
        F.col(order_col),
        F.col(value_col).cast("double").alias("_v"),
        F.row_number().over(w).alias("_t"),
        F.sum(F.col(value_col).cast("double")).over(w).alias("_ps"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*g).orderBy(order_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
        F.sum(F.col(value_col).cast("double")).over(
            Window.partitionBy(*g).orderBy(order_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    scored = cum.filter(F.col("_t") < F.col("_n")).select(
        *g,
        F.col(order_col),
        "_t",
        "_n",
        (F.col("_ps") / F.col("_t")).alias("_mb"),
        ((F.col("_total") - F.col("_ps")) / (F.col("_n") - F.col("_t"))).alias(
            "_ma"
        ),
        (
            F.abs(
                F.col("_ps") / F.col("_t")
                - (F.col("_total") - F.col("_ps")) / (F.col("_n") - F.col("_t"))
            )
            * F.sqrt(
                F.col("_t") * (F.col("_n") - F.col("_t")) / F.col("_n")
            )
        ).alias("_d"),
    )
    pick = Window.partitionBy(*g).orderBy(F.desc("_d"), F.col(order_col))
    return (
        scored.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            *group_cols,
            F.col("_n").alias("n_points"),
            F.col(order_col).alias("cut_point"),
            F.col("_t").alias("cut_index"),
            F.round("_d", 6).alias("shift_stat"),
            F.round("_mb", 6).alias("mean_before"),
            F.round("_ma", 6).alias("mean_after"),
        )
    )


def markov_transitions(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix of per-entity event streams:
    for each consecutive event pair within an entity's timeline, count
    (from_type → to_type) and row-normalize — the "what happens next"
    model behind path analysis (:func:`event_path_ngrams` counts the
    raw n-grams; this is the n=2 case as conditional probabilities).
    Returns (from_type, to_type, n_transitions, prob) with
    Σ prob = 1 per from_type.

    Scale shape: one shuffle on the entity key + per-entity sort for the
    ``lead`` window (streams never globally sort; pass ``tiebreak_col``
    for a total order under equal timestamps), then a hash count whose
    cardinality is |types|² — tiny — with map-side partial combine. The
    row-normalizing totals re-aggregate FROM the counts relation, never
    from the data.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("_t")
    )
    return counts.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        (F.col("n_transitions") / F.col("_t")).alias("prob"),
    )


def autocorrelation(
    series: DataFrame,
    time_col: str,
    value_col: str,
    lags: list[int],
    step: int = 1,
) -> DataFrame:
    """Sample autocorrelation (Pearson, pairwise-complete) of a regular
    series at the given ``lags`` — the seasonality / burst-memory probe
    (Box & Jenkins 1970 ch. 2): acf(k) ≈ 1 at k = season length, ≈ 0
    for white noise. ``time_col`` must be an INTEGER tick (epoch hours,
    day numbers, …) advancing by ``step``; gaps are fine — a pair
    (t, t+k·step) simply doesn't form when either side is missing
    (pairwise-complete semantics, the ``statsmodels acf(missing=
    'conservative')`` convention).

    Returns (lag, n_pairs, acf) per requested lag, where ``acf`` is the
    Pearson correlation of (x_t, x_{t+lag·step}) over the formed pairs.

    Spark shape: NO single-partition window — the lag alignment is a
    self-EQUI-join on (time + lag·step) after a one-pass ``explode`` of
    the lag list onto the left side (the r10 fan-out rule: one
    generated row per (tick, lag), never |lags| unioned scans).
    Correlation comes out of the standard five-sum formula with each
    sum accumulated as EXACT DECIMAL over per-row double products, so
    both the pair set and every intermediate sum are engine-portable —
    the only double arithmetic is the final one-expression formula.

    Scale shape at 100 TB: one shuffle keys the self-join on the tick
    (the exploded side carries |lags| rows per tick); the five-sum
    aggregation combines map-side per lag. A year of SECOND-level ticks
    is ~3e7 rows — trivially partitionable; no per-key state, no sort.
    """
    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be a non-empty list of positive ints")
    base = series.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
        F.col(value_col).cast("double").alias("_yv"),
    )
    return _lagged_corr(base, lags, step).withColumnRenamed("corr", "acf")


def _lagged_corr(base: DataFrame, lags: list[int], step: int) -> DataFrame:
    """Shared core of :func:`autocorrelation` and
    :func:`cross_correlation`: pair (x at t, y at t + lag·step) via one
    exploded self-equi-join on the tick, Pearson from five exact-decimal
    sums. ``base`` is (_t, _x, _yv); rows where EITHER side is NULL drop
    from the pairing (pairwise-complete)."""
    if step < 1:
        raise ValueError("step must be >= 1")
    left = base.filter(F.col("_x").isNotNull()).select(
        "_t",
        "_x",
        F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("lag"),
    )
    right = base.filter(F.col("_yv").isNotNull()).select(
        F.col("_t").alias("_t2"), F.col("_yv").alias("_y")
    )
    dec = "decimal(38,12)"
    paired = left.join(
        right, left["_t"] + F.col("lag") * step == right["_t2"]
    )
    return (
        paired.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("_x").cast(dec)).alias("_sx"),
            F.sum(F.col("_y").cast(dec)).alias("_sy"),
            F.sum((F.col("_x") * F.col("_x")).cast(dec)).alias("_sxx"),
            F.sum((F.col("_y") * F.col("_y")).cast(dec)).alias("_syy"),
            F.sum((F.col("_x") * F.col("_y")).cast(dec)).alias("_sxy"),
        )
        .select(
            "lag",
            "n_pairs",
            (
                (
                    F.col("n_pairs") * F.col("_sxy").cast("double")
                    - F.col("_sx").cast("double") * F.col("_sy").cast("double")
                )
                / F.sqrt(
                    (
                        F.col("n_pairs") * F.col("_sxx").cast("double")
                        - F.col("_sx").cast("double") * F.col("_sx").cast("double")
                    )
                    * (
                        F.col("n_pairs") * F.col("_syy").cast("double")
                        - F.col("_sy").cast("double") * F.col("_sy").cast("double")
                    )
                )
            ).alias("corr"),
        )
    )


def cross_correlation(
    series: DataFrame,
    time_col: str,
    x_col: str,
    y_col: str,
    lags: list[int],
    step: int = 1,
) -> DataFrame:
    """Lagged cross-correlation between two columns of one regular
    series — corr(x_t, y_{t+lag·step}) per requested lag — the lead-lag
    probe (does volume LEAD value? does an upstream metric predict a
    downstream one k ticks later?). Positive lags test "x leads y";
    NEGATIVE lags test the reverse direction (y at an earlier tick),
    so a full ±window reads as one panel. Returns (lag, n_pairs, corr).

    Same Spark shape as :func:`autocorrelation` (shared core): one
    exploded self-equi-join on the tick axis — no global window — and
    five exact-decimal sums per lag with a single double expression at
    the end. Gap ticks pair pairwise-complete.
    """
    if not lags:
        raise ValueError("lags must be a non-empty list of ints")
    base = series.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_yv"),
    )
    return _lagged_corr(base, lags, step)


def seasonal_decompose(
    series: DataFrame,
    time_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Classical additive seasonal decomposition (Kendall & Stuart; the
    ``statsmodels seasonal_decompose`` convention): centered moving
    average of length ``period`` for the trend (half-weighted ends when
    ``period`` is even — the standard 2×m MA), per-phase means of the
    detrended series for the seasonal component, centered so the
    indices sum to zero. Returns one row per phase:
    (phase, n_obs, seasonal) — "how much does hour-of-day k sit above
    or below trend", the seasonality fingerprint behind anomaly
    baselines and rollup-granularity choices.

    ``time_col`` must be an integer tick; the trend at tick t is only
    defined when ALL ticks of the centered window exist (gap rows get
    no trend and drop from the phase means — pairwise-complete, same
    convention as :func:`autocorrelation`).

    Spark shape: the trend is RANGE-frame window sums over the ordered
    tick axis — on an already-aggregated series relation (ticks, not
    events), the documented bounded-relation single-partition pattern.
    Every accumulation (window sums, phase means, the grand centering
    mean) runs as EXACT DECIMAL over per-row double casts, so the whole
    decomposition replays bit-identically in a SQL oracle; the only
    double arithmetic is per-row expressions.

    Scale shape at 100 TB: the fact-sized work (bucketing events to
    ticks) happens BEFORE this operator; a century of hourly ticks is
    ~1e6 rows, so the ordered scan is metadata-sized. For per-key
    decomposition, partition the window by the key — same plan, no
    single-partition flag.
    """
    trended = _trended_rows(series, time_col, value_col, period)
    phase_means, grand = _phase_indices(trended)
    return phase_means.crossJoin(F.broadcast(grand)).select(
        "phase", "n_obs", (F.col("_m") - F.col("_g")).alias("seasonal")
    )


def _trended_rows(
    series: DataFrame, time_col: str, value_col: str, period: int
) -> DataFrame:
    """(_t, phase, _x, _trend) per tick — _trend NULL where the centered
    window is incomplete. Shared by :func:`seasonal_decompose` and
    :func:`seasonal_residuals`."""
    if period < 2:
        raise ValueError("period must be >= 2")
    h = period // 2
    even = period % 2 == 0
    dec = "decimal(38,12)"
    base = series.select(
        F.col(time_col).cast("long").alias("_t"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())

    def _rng(lo: int, hi: int):
        return Window.orderBy("_t").rangeBetween(lo, hi)

    xdec = F.col("_x").cast(dec)
    n_window = F.count(F.lit(1)).over(_rng(-h, h))
    if even:
        trend = (
            F.sum(xdec).over(_rng(-(h - 1), h - 1)).cast("double")
            + 0.5 * F.sum(xdec).over(_rng(-h, -h)).cast("double")
            + 0.5 * F.sum(xdec).over(_rng(h, h)).cast("double")
        ) / period
        required = period + 1
    else:
        trend = F.sum(xdec).over(_rng(-h, h)).cast("double") / period
        required = period
    return base.select(
        "_t",
        (F.col("_t") % period).alias("phase"),
        "_x",
        F.when(n_window == required, trend).alias("_trend"),
    )


def _phase_indices(trended: DataFrame):
    """(phase_means with raw mean _m, 1-row grand mean _g) from the
    trended row relation — exact-decimal sums throughout."""
    dec = "decimal(38,12)"
    detrended = trended.filter(F.col("_trend").isNotNull()).select(
        "phase", (F.col("_x") - F.col("_trend")).alias("_d")
    )
    phase_means = detrended.groupBy("phase").agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.sum(F.col("_d").cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("_m"),
    )
    grand = phase_means.agg(
        (
            F.sum(F.col("_m").cast(dec)).cast("double")
            / F.count(F.lit(1))
        ).alias("_g")
    )
    return phase_means, grand


def seasonal_residuals(
    series: DataFrame,
    time_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Per-tick decomposition components — (tick, phase, value, trend,
    seasonal, residual) for every tick whose centered window is
    complete — the anomaly-detection surface :func:`seasonal_decompose`
    aggregates away: a residual far outside its own distribution is a
    level change the seasonality cannot explain (the classical
    residual-z anomaly detector).

    Same plan as the decompose (shared trended-rows and phase-index
    relations — the trended relation is materialized ONCE because both
    the phase means and the output rows read it); one extra broadcast
    join attaches the phase index back to the rows.
    """
    trended = _trended_rows(series, time_col, value_col, period)
    trended = trended.localCheckpoint(eager=True)
    phase_means, grand = _phase_indices(trended)
    seasonal = phase_means.crossJoin(F.broadcast(grand)).select(
        "phase", (F.col("_m") - F.col("_g")).alias("_seasonal")
    )
    return (
        trended.filter(F.col("_trend").isNotNull())
        .join(F.broadcast(seasonal), "phase")
        .select(
            F.col("_t").alias("tick"),
            "phase",
            F.col("_x").alias("value"),
            F.col("_trend").alias("trend"),
            F.col("_seasonal").alias("seasonal"),
            (
                F.col("_x") - F.col("_trend") - F.col("_seasonal")
            ).alias("residual"),
        )
    )


def _duration_risk_table(
    df: DataFrame,
    subject_col: str,
    date_col: str,
    horizon=None,
) -> DataFrame:
    """Shared survival-analysis base relation: per distinct inter-event
    day duration, (dur, n_events, n_censored, n_risk) — observed gaps
    from consecutive per-subject event pairs, right-censored tails to the
    horizon, and the risk set as a suffix sum over the bounded duration
    table. Consumed by :func:`kaplan_meier` and :func:`nelson_aalen`."""
    per = Window.partitionBy("_u").orderBy(F.col("_d").asc())
    ev = df.select(
        F.col(subject_col).alias("_u"), F.to_date(F.col(date_col)).alias("_d")
    )
    if horizon is None:
        hz = ev.agg(F.max("_d").alias("_hz"))
    else:
        hz = ev.sparkSession.range(1).select(F.lit(horizon).cast("date").alias("_hz"))
    gaps = (
        ev.withColumn("_prev", F.lag("_d").over(per))
        .filter(F.col("_prev").isNotNull())
        .select(F.datediff("_d", "_prev").alias("dur"), F.lit(1).alias("ev"))
    )
    last = ev.groupBy("_u").agg(F.max("_d").alias("_ld"))
    censored = last.crossJoin(F.broadcast(hz)).select(
        F.datediff("_hz", "_ld").alias("dur"), F.lit(0).alias("ev")
    )
    obs = gaps.unionByName(censored)
    agg = obs.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("n_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("n_censored"),
    )
    # duration table is bounded (distinct day durations): suffix sum =
    # risk set.
    suffix = Window.orderBy(F.col("dur").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return agg.withColumn(
        "n_risk", F.sum(F.col("n_events") + F.col("n_censored")).over(suffix)
    )


def nelson_aalen(
    df: DataFrame,
    subject_col: str,
    date_col: str,
    horizon=None,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over the same censored
    inter-event durations as :func:`kaplan_meier` (Nelson 1972, Aalen
    1978): H(t) = Σ_{t_i ≤ t} d_i / n_i with the standard variance
    estimate Σ d_i / n_i² (Klein & Moeschberger eq. 4.2.3). Where KM
    multiplies survival factors, NA adds hazard increments — the additive
    form is what hazard-ratio eyeballing and piecewise-exponential fits
    consume, and exp(−H) gives the Breslow survival curve for free.

    Engine portability: each increment divides once in double; the
    running sums are ordered prefix windows over the BOUNDED duration
    table (the same sequential-fold contract the KM log-sum relies on).
    Scale shape: identical to KM — one subject shuffle, one duration
    groupBy with map-side combine, bounded-table windows."""
    na = _duration_risk_table(df, subject_col, date_col, horizon)
    prefix = Window.orderBy(F.col("dur").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    d = F.col("n_events").cast("double")
    n = F.col("n_risk").cast("double")
    cumhaz = F.sum(d / n).over(prefix)
    cumvar = F.sum(d / (n * n)).over(prefix)
    return na.select(
        F.col("dur").cast("int").alias("t_days"),
        "n_risk",
        "n_events",
        "n_censored",
        F.round(cumhaz, 6).alias("cum_hazard"),
        F.round(F.sqrt(cumvar), 6).alias("hazard_se"),
        F.round(F.exp(-cumhaz), 6).alias("breslow_survival"),
    )


def kaplan_meier(
    df: DataFrame,
    subject_col: str,
    date_col: str,
    horizon=None,
) -> DataFrame:
    """Kaplan–Meier survival curve over inter-event gaps with right
    censoring (Kaplan & Meier 1958): every consecutive pair of a
    subject's event dates yields an OBSERVED duration (the subject
    "re-ordered" after ``dur`` days); the stretch from each subject's
    LAST event to the observation ``horizon`` (default: the max date in
    the data) yields a CENSORED duration — the subject survived at least
    that long without the next event, which is exactly what a naive
    "average gap" silently drops. Subjects with a single event
    contribute only a censored row — the churn-analysis framing.

    Returns one row per distinct duration ``t_days`` with the risk set
    ``n_risk`` (observations with duration >= t), event count
    ``n_events``, ``n_censored``, and the product-limit estimate
    ``survival`` = Π_{t_i <= t} (1 - d_i / n_i) rounded to 6 places
    (computed as exp of the running sum of logs — the running sum is
    sequential in duration order in both engines, so the value hash is
    engine-portable). Censorings at t are conventionally still at risk
    at t (events-before-censorings tie rule).

    Scale shape: one shuffle on ``subject_col`` for the lag window, one
    groupBy on duration (map-side combine collapses each partition to
    one row per distinct day first), then a single-partition running
    window over the KM table itself — bounded by the number of DISTINCT
    day durations (≤ the date span of the data, thousands of rows at any
    SF; same documented bounded-relation pattern as the prefix-scan
    offset windows). The risk set is the suffix sum of (events +
    censored), so no separate total-count job runs.
    """
    km = _duration_risk_table(df, subject_col, date_col, horizon)
    prefix = Window.orderBy(F.col("dur").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # d == n at the last event time drives the curve to EXACT zero; ln(0)
    # is an error in DuckDB and a silent NULL (dropped from the sum) in
    # Spark, so that case is carried as an explicit sticky flag instead of
    # through the log path in both engines.
    dead = F.max(
        (F.col("n_events") >= F.col("n_risk")).cast("int")
    ).over(prefix)
    logsum = F.sum(
        F.when(
            F.col("n_events") < F.col("n_risk"),
            F.log(
                F.lit(1.0)
                - F.col("n_events").cast("double") / F.col("n_risk")
            ),
        )
    ).over(prefix)
    return km.select(
        F.col("dur").cast("int").alias("t_days"),
        "n_risk",
        "n_events",
        "n_censored",
        F.when(dead == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.coalesce(logsum, F.lit(0.0))), 6))
        .alias("survival"),
    )


def ewma_smooth(
    series: DataFrame,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    terms: int = 8,
) -> DataFrame:
    """EWMA smoothing as a FINITE weighted window (Roberts 1959's control
    statistic, truncated): the smoothed value at tick t is
    Σ_{i<terms} (1-α)^i · x_{t-i} / Σ_{i<terms} (1-α)^i over the ticks
    that exist — the infinite recursion's geometric tail is dropped
    (≈5.8% of the weight mass at α=0.3, terms=8) because a recursive
    definition is neither
    shuffle-friendly nor SQL-replayable, while a fixed LAG fan is both.
    Missing leading ticks (series start) shrink the denominator rather
    than biasing toward zero.

    ``deviation`` = value − EWMA of the PRECEDING ticks only (lag-1
    applied to the smoothed column's inputs — i runs 1..terms), i.e. the
    one-step-ahead forecast error the EWMA control chart alarms on.

    Determinism contract: each weight is an exact double power, the
    term additions are written in FIXED ascending-lag order, and every
    engine evaluates the same nested-sum expression — no cross-row
    shuffle-order float sums anywhere, so the oracle hashes match.

    Scale shape: one window over the tick series per key-less series
    (bounded: ticks, not rows — pre-aggregate to ticks first, as every
    caller here does); ``terms`` LAG reads resolve inside ONE window
    sort, not ``terms`` of them.
    """
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    if terms < 1:
        raise ValueError("terms must be >= 1")
    w = Window.orderBy(F.col(time_col).asc())
    x = F.col(value_col)

    def _weighted(start: int) -> tuple:
        num = F.lit(0.0)
        den = F.lit(0.0)
        for i in range(start, terms + start):
            wt = (1.0 - alpha) ** (i - start)
            lagged = F.lag(x, i).over(w) if i else x
            num = num + F.when(
                lagged.isNotNull(), F.lit(wt) * lagged
            ).otherwise(F.lit(0.0))
            den = den + F.when(
                lagged.isNotNull(), F.lit(wt)
            ).otherwise(F.lit(0.0))
        return num, den

    num0, den0 = _weighted(0)
    num1, den1 = _weighted(1)
    return series.select(
        F.col(time_col).alias("tick"),
        x.alias("value"),
        (num0 / den0).alias("ewma"),
        F.when(den1 > 0, x - num1 / den1).alias("deviation"),
    )


def brown_double_smooth(
    series: DataFrame,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    terms: int = 8,
    horizon: int = 3,
) -> DataFrame:
    """Brown's double exponential smoothing with an h-step linear
    forecast (Brown 1963): S' = EWMA(x), S'' = EWMA(S'), level =
    2S' − S'', trend = α/(1−α)·(S' − S''), forecast = level + h·trend —
    the classic trend-following extension of the EWMA control line.

    Both smoothing passes are the same TRUNCATED fixed-order LAG fan as
    :func:`ewma_smooth` (the recursion's geometric tail dropped), so the
    estimator is two stacked bounded windows over the tick relation and
    the oracle replays the identical nested sums — first fan over x in a
    CTE, second fan over that CTE's output. Same determinism contract:
    exact double weight literals, ascending-lag addition order, divisions
    once per row.

    Scale shape: the input must already be a pre-aggregated tick relation
    (every caller here pre-reduces to hours); two ordered windows over
    ticks, not rows.
    """
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1) for the trend factor")
    if terms < 1:
        raise ValueError("terms must be >= 1")
    if horizon < 0:
        raise ValueError("horizon must be >= 0")
    s1 = ewma_smooth(series, time_col, value_col, alpha=alpha, terms=terms)
    s2 = ewma_smooth(s1, "tick", "ewma", alpha=alpha, terms=terms).select(
        "tick", F.col("value").alias("s1"), F.col("ewma").alias("s2")
    )
    level = 2.0 * F.col("s1") - F.col("s2")
    trend = (alpha / (1.0 - alpha)) * (F.col("s1") - F.col("s2"))
    out = s1.select("tick", "value").join(s2, "tick")
    return out.select(
        "tick",
        "value",
        F.round("s1", 6).alias("s1_r"),
        F.round("s2", 6).alias("s2_r"),
        F.round(level, 6).alias("level_r"),
        F.round(trend, 6).alias("trend_r"),
        F.round(level + F.lit(float(horizon)) * trend, 6).alias("forecast_r"),
    )


def cusum_chart(
    series: DataFrame,
    time_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Tabular CUSUM control chart (Page 1954) over a tick series —
    the drift-sensitive companion to the EWMA line: one-sided cumulative
    sums S⁺_t = max(0, S⁺_{t−1} + z_t − k) and
    S⁻_t = max(0, S⁻_{t−1} − z_t − k) of the standardized value, with an
    alarm when either exceeds ``h`` (both in σ units; k = allowance,
    h = decision interval — the classic (0.5, 4) detects ~1σ sustained
    shifts an individual-point Shewhart chart misses).

    The recursion never runs: by the prefix identity
    S_t = P_t − min_{0≤j≤t} P_j with P_t = Σ_{i≤t}(z_i − k), both sides
    are a cumulative sum plus a running min — two stacked windows over
    the tick relation, the same bounded class as the EWMA fan. All window
    arithmetic is EXACT: deviations are half-up-scaled to integer
    micro-units (floor(x·1e6 + 0.5), the sq8 discipline) and accumulated
    as DECIMAL(38,0), so cumulative sums replay bit-for-bit in any
    engine regardless of its windowed-sum association order; the single
    divide back to σ units happens per row at the end.

    Standardization is self-baselined in-plan: μ, σ come from exact
    integer-scaled sums over the same ticks (one aggregate, broadcast
    back as a 1-row relation). Returns (tick, value, z, s_plus, s_minus,
    alarm) per tick.

    Scale shape: callers pre-aggregate to ticks (hourly/daily means), so
    every window here sorts ticks, not rows; the raw table is scanned
    once by the caller's aggregation."""
    if k < 0:
        raise ValueError("k must be >= 0")
    if h <= 0:
        raise ValueError("h must be > 0")
    dec = "decimal(38,0)"
    x = F.round(F.col(value_col).cast("double"), 6)
    x6 = F.floor(x * F.lit(1e6) + F.lit(0.5)).cast(dec)
    base = series.select(
        F.col(time_col).alias("tick"), x.alias("value"), x6.alias("_x6")
    )
    params = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_x6").alias("_sx"),
        F.sum(F.col("_x6") * F.col("_x6")).alias("_sxx"),
    )
    mu = F.col("_sx").cast("double") / F.col("_n") / F.lit(1e6)
    var = (
        F.col("_sxx").cast("double") / F.col("_n") / F.lit(1e12) - mu * mu
    )
    withz = base.crossJoin(F.broadcast(params)).select(
        "tick",
        "value",
        ((F.col("value") - mu) / F.sqrt(var)).alias("_z"),
    )
    kd = float(k)
    dplus = F.floor((F.col("_z") - F.lit(kd)) * F.lit(1e6) + F.lit(0.5)).cast(
        dec
    )
    dminus = F.floor(
        (-F.col("_z") - F.lit(kd)) * F.lit(1e6) + F.lit(0.5)
    ).cast(dec)
    w = (
        Window.orderBy(F.col("tick").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = withz.select(
        "tick",
        "value",
        "_z",
        F.sum(dplus).over(w).alias("_cp"),
        F.sum(dminus).over(w).alias("_cm"),
    )
    zero = F.lit(0).cast(dec)
    sp = F.col("_cp") - F.least(zero, F.min("_cp").over(w))
    sm = F.col("_cm") - F.least(zero, F.min("_cm").over(w))
    h6 = F.floor(F.lit(float(h)) * F.lit(1e6) + F.lit(0.5)).cast(dec)
    return stepped.select(
        "tick",
        "value",
        F.round("_z", 6).alias("z"),
        F.round(sp.cast("double") / F.lit(1e6), 6).alias("s_plus"),
        F.round(sm.cast("double") / F.lit(1e6), 6).alias("s_minus"),
        ((sp > h6) | (sm > h6)).alias("alarm"),
    )


def mann_kendall(
    series: DataFrame,
    time_col: str,
    value_col: str,
) -> DataFrame:
    """Mann–Kendall trend test + Sen's slope (Mann 1945; Kendall 1975;
    Sen 1968) over a tick series — the nonparametric "is this metric
    trending" readout: S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18, the
    continuity-corrected z = (S∓1)/√Var(S), a two-sided p through the
    portable normal polynomial (drift.norm_sf), and the robust trend
    magnitude as the MEDIAN pairwise slope.

    Pairs are a self-join of the TICK relation with itself (i < j by
    tick) — ticks², never rows², the documented bounded class: callers
    pre-aggregate (daily/hourly means) so a month of daily ticks is 435
    pairs. S and the tie sums are exact integers; the median slope is
    selected by rank over the bounded pairs relation (positions
    ⌈m/2⌉ and ⌊m/2⌋+1 averaged — written identically in the oracle, no
    engine median() whose interpolation may differ). Returns ONE row:
    (n_ticks, s_stat, var_s, z, p_two, sen_slope, trend)."""
    from rust_cdc_validator_spark.operators.drift import norm_sf

    t = F.col(time_col).cast("double")
    x = F.round(F.col(value_col).cast("double"), 6)
    base = series.select(t.alias("_t"), x.alias("_x"))
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a._t") < F.col("b._t")).select(
        F.col("a._t").alias("_ti"),
        F.col("b._t").alias("_tj"),
        F.col("a._x").alias("_xi"),
        F.col("b._x").alias("_xj"),
    )
    sgn = F.when(F.col("_xj") > F.col("_xi"), 1).otherwise(
        F.when(F.col("_xj") < F.col("_xi"), -1).otherwise(0)
    )
    s_and_n = pairs.agg(
        F.sum(sgn).cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    n_row = base.agg(F.count(F.lit(1)).cast("long").alias("n_ticks"))
    ties = (
        base.groupBy("_x")
        .agg(F.count(F.lit(1)).cast("long").alias("_tg"))
        .agg(
            F.sum(
                F.col("_tg")
                * (F.col("_tg") - 1)
                * (2 * F.col("_tg") + 5)
            )
            .cast("long")
            .alias("_tie_sum")
        )
    )
    slope = (F.col("_xj") - F.col("_xi")) / (F.col("_tj") - F.col("_ti"))
    ws = Window.orderBy(slope.asc(), F.col("_ti").asc(), F.col("_tj").asc())
    ranked = pairs.select(
        slope.alias("_slope"), F.row_number().over(ws).alias("_r")
    )
    med = (
        ranked.crossJoin(F.broadcast(s_and_n.select("_m")))
        .filter(
            (F.col("_r") == F.ceil(F.col("_m") / F.lit(2.0)))
            | (F.col("_r") == F.floor(F.col("_m") / F.lit(2.0)) + 1)
        )
        .agg(
            (F.sum("_slope") / F.count(F.lit(1))).alias("sen_slope")
        )
    )
    joined = (
        s_and_n.crossJoin(F.broadcast(n_row))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(med))
    )
    nd = F.col("n_ticks").cast("double")
    var_s = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("_tie_sum").cast("double")
    ) / F.lit(18.0)
    sd = F.col("s_stat").cast("double")
    z = F.when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(var_s)).when(
        F.col("s_stat") < 0, (sd + F.lit(1.0)) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    p = F.round(F.lit(2.0) * norm_sf(F.abs(z)), 6)
    return joined.select(
        "n_ticks",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        p.alias("p_two"),
        F.round("sen_slope", 6).alias("sen_slope"),
        F.when(
            (p < 0.05) & (F.col("s_stat") > 0), F.lit("increasing")
        )
        .when((p < 0.05) & (F.col("s_stat") < 0), F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
    )
