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

from pyspark.sql import DataFrame, Window
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


def psi_drift(
    before: DataFrame,
    after: DataFrame,
    value_col: str,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> DataFrame:
    """Population Stability Index for one numeric column — the standard
    ML-monitoring histogram-drift metric (rule of thumb: < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate). Fixed-width bins over
    the BEFORE side's [min, max] (after-side outliers clamp into the edge
    bins, which is where they should count); one row per bin with both
    shares and the bin's PSI contribution ``(p_a − p_b)·ln(p_a / p_b)``,
    shares floored at ``epsilon`` so empty bins contribute finitely.
    ``SUM(psi_contrib)`` is the headline number.

    Scale shape: one min/max aggregate on before (two doubles to the
    driver), then ONE map-side bucket + count pass per side — shuffle is
    ``bins`` rows each; the compare joins bins-sized relations. Null
    values are excluded from both histograms (nulls are `drift_report`'s
    null_count metric, not a bin)."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    lo, hi = before.agg(
        F.min(F.col(value_col).cast("double")),
        F.max(F.col(value_col).cast("double")),
    ).collect()[0]
    if lo is None or hi is None:
        raise ValueError(f"{value_col} has no non-null values on the before side")
    width = (hi - lo) / bins if hi > lo else 1.0

    def hist(df: DataFrame, name: str) -> DataFrame:
        x = F.col(value_col).cast("double")
        b = F.least(
            F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(bins - 1),
        ).cast("int")
        counts = (
            df.filter(x.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        total = counts.agg(F.sum("_n").alias("_t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("_n") / F.col("_t")).alias(name)
        )

    grid = before.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    hb = hist(before, "share_before")
    ha = hist(after, "share_after")
    joined = (
        grid.join(hb, "bin", "left").join(ha, "bin", "left").fillna(0.0)
    )
    pb = F.greatest(F.col("share_before"), F.lit(epsilon))
    pa = F.greatest(F.col("share_after"), F.lit(epsilon))
    return joined.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
        "share_before",
        "share_after",
        ((pa - pb) * F.log(pa / pb)).alias("psi_contrib"),
    )


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.5,
) -> DataFrame:
    """Median/MAD outlier screen per group: the robust z-score
    ``0.6745 · |x − median| / MAD`` (Iglewicz & Hoaglin 1993's modified
    z), which unlike mean/stddev does not let the outliers it is hunting
    inflate their own acceptance threshold. Returns one row per group:
    (group, n_rows, med, mad, n_outliers, outlier_frac) with ``z`` the
    flag threshold (3.5 is the standard recommendation).

    Scale shape: two grouped EXACT percentile aggregations (median of x,
    then median of |x − med|) plus a broadcast join of the group-level
    medians — so the group key shuffles twice and each group's values are
    buffered by Spark's exact `percentile` aggregate. That buffer makes
    this the exact-percentile cost class (same as `quantity_percentiles`):
    right when groups are bounded (segments, priorities, days). For
    unbounded value streams use the mergeable `q_histogram` sketch
    (operators/sketch.py) and read the median off the histogram instead —
    this function is the exact companion, not the 100 TB path.

    Groups where MAD = 0 (over half the values identical) report
    n_outliers over the strict ``x != med`` set — anything not exactly
    the median is infinitely many MADs away, which is the conventional
    degenerate-MAD reading.
    """
    if z <= 0:
        raise ValueError("z must be positive")
    x = F.col(value_col).cast("double")
    med_df = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5d)").alias("med"),
        F.count(value_col).alias("n_rows"),
    )
    dev = F.abs(x - F.col("med"))
    joined = df.join(F.broadcast(med_df), group_cols)
    mad_df = joined.groupBy(*group_cols).agg(
        F.expr(
            f"percentile(abs(cast({value_col} as double) - med), 0.5d)"
        ).alias("mad")
    )
    flagged = (
        joined.join(F.broadcast(mad_df), group_cols)
        .select(
            *group_cols,
            F.col("med"),
            F.col("mad"),
            F.col("n_rows"),
            F.when(
                F.col("mad") > 0,
                (F.lit(0.6745) * dev / F.col("mad") > z).cast("int"),
            )
            .otherwise((dev > 0).cast("int"))
            .alias("_is_out"),
        )
        .groupBy(*group_cols)
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum("_is_out").alias("n_outliers"),
            F.round(F.sum("_is_out") / F.first("n_rows"), 4).alias(
                "outlier_frac"
            ),
        )
    )
    return flagged


def spearman_corr(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Spearman rank correlation between two columns — the
    monotone-association monitor (is balance still predictive of spend in
    every segment?) that Pearson misses whenever the relationship curves
    or outliers stretch one tail.

    Ranks use the standard AVERAGE-rank tie treatment, built from
    engine-portable pieces so the SQL oracle agrees exactly:
    ``avg_rank = rank() + (ties − 1)/2`` where ``ties`` counts the value's
    duplicates — identical in Spark and any ANSI engine (no
    implementation-defined `percent_rank` edge cases). Pearson of the
    avg-ranks is then one ``corr`` aggregate.

    Scale shape: two window passes partitioned BY GROUP (per-group sorts,
    never a global one) + one grouped corr with map-side partials. Rows
    with a NULL in either column are excluded up front (their presence
    would shift everyone's rank); groups need ≥ 2 distinct rows for a
    defined corr — degenerate groups return NULL, not a crash.
    """
    from pyspark.sql import Window

    base = df.select(*group_cols, F.col(x_col), F.col(y_col)).filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )

    def avg_rank(col: str):
        w_rank = Window.partitionBy(*group_cols).orderBy(F.col(col))
        w_ties = Window.partitionBy(*group_cols, col)
        return (
            F.rank().over(w_rank)
            + (F.count(F.lit(1)).over(w_ties) - F.lit(1)) / F.lit(2.0)
        )

    ranked = base.select(
        *group_cols,
        avg_rank(x_col).alias("_rx"),
        avg_rank(y_col).alias("_ry"),
    )
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.corr("_rx", "_ry").alias("spearman_r"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns —
    I(X;Y) = Σ p(x,y)·ln(p(x,y) / (p(x)p(y))) — the dependence monitor
    that catches what correlation cannot (categorical, non-ordinal,
    non-monotone relations): does event type depend on hour-of-day, does
    label depend on source, did a supposedly independent sampling key
    become entangled with the payload?

    Computed exactly from counts: ONE hash aggregation on (x, y) with
    map-side partials; the x- and y-marginals re-aggregate FROM the joint
    relation (cells-sized, not data-sized), and the final score is a
    cells-sized join + sum. Also reports the entropies H(X), H(Y) and the
    normalized redundancy I/min(H) (0 = independent, 1 = one determines
    the other) so thresholds transfer across cardinalities. NULL category
    values count as a category of their own (groupBy semantics) — a
    column going all-NULL is a dependence signal, not a row drop.

    With ``group_cols``, everything is additionally keyed per group (one
    row out per group). Scale: shuffle is bounded by distinct cells, not
    rows; no windows; log arithmetic stays in the JVM.
    """
    g = list(group_cols or [])
    joint = df.groupBy(*g, x_col, y_col).agg(F.count(F.lit(1)).alias("_nxy"))
    tot = joint.groupBy(*g).agg(F.sum("_nxy").alias("_n"))
    mx = joint.groupBy(*g, x_col).agg(F.sum("_nxy").alias("_nx"))
    my = joint.groupBy(*g, y_col).agg(F.sum("_nxy").alias("_ny"))
    cells = joint.join(mx, [*g, x_col]).join(my, [*g, y_col])
    if g:
        cells = cells.join(tot, g)
    else:
        cells = cells.crossJoin(F.broadcast(tot))
    n = F.col("_n").cast("double")
    pxy = F.col("_nxy") / n
    mi_term = pxy * F.log(
        (F.col("_nxy") * n) / (F.col("_nx") * F.col("_ny"))
    )
    hx_term = (F.col("_nxy") / n) * F.log(F.col("_nx") / n)
    hy_term = (F.col("_nxy") / n) * F.log(F.col("_ny") / n)
    rep = cells.groupBy(*g).agg(
        F.sum(mi_term).alias("mi_nats"),
        (-F.sum(hx_term)).alias("h_x"),
        (-F.sum(hy_term)).alias("h_y"),
    )
    min_h = F.least(F.col("h_x"), F.col("h_y"))
    return rep.withColumn(
        "redundancy",
        F.when(min_h > 0, F.col("mi_nats") / min_h).otherwise(F.lit(0.0)),
    )


def chi_squared(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Pearson chi-squared independence statistic between two categorical
    columns, plus Cramér's V — the frequentist sibling of
    :func:`mutual_information` (same question, different scale: chi² has
    a null distribution, V is in [0, 1] regardless of table size).

    Zero-observed cells matter to chi² (expected mass with no counts),
    but the full |X|×|Y| grid never materializes: by the identity
    χ² = n·(Σ_observed n_xy²/(n_x·n_y) − 1) the unobserved cells are
    exactly the "−1" — Σ over all cells of expected is n. So the compute
    is the SAME cells-sized relation MI uses: one (x, y) hash agg with
    map-side partials, marginals re-aggregated from the cells, one
    cells-sized join + sum. Returns (group…, n, dof, chi2, cramers_v);
    dof = (|X|−1)(|Y|−1), V = sqrt(χ²/(n·(min(|X|,|Y|)−1))) (0 when the
    table is degenerate 1×k). NULL categories count as categories: x/y
    ride inside single-field structs, which group, equi-join, and
    countDistinct null-safely (struct(NULL) is a non-null value), so a
    NULL category's cells stay in the sum and its marginal in the counts
    — plain columns would silently drop them at the null-unsafe joins
    while n still counted their rows, skewing chi² (even negative).
    """
    g = list(group_cols or [])
    wrapped = df.select(
        *g,
        F.struct(F.col(x_col).alias("v")).alias("_x"),
        F.struct(F.col(y_col).alias("v")).alias("_y"),
    )
    joint = wrapped.groupBy(*g, "_x", "_y").agg(
        F.count(F.lit(1)).alias("_nxy")
    )
    tot = joint.groupBy(*g).agg(F.sum("_nxy").alias("_n"))
    mx = joint.groupBy(*g, "_x").agg(F.sum("_nxy").alias("_nx"))
    my = joint.groupBy(*g, "_y").agg(F.sum("_nxy").alias("_ny"))
    cells = joint.join(mx, [*g, "_x"]).join(my, [*g, "_y"])
    if g:
        cells = cells.join(tot, g)
    else:
        cells = cells.crossJoin(F.broadcast(tot))
    nxy = F.col("_nxy").cast("double")
    s_term = (nxy * nxy) / (
        F.col("_nx").cast("double") * F.col("_ny").cast("double")
    )
    rep = cells.groupBy(*g).agg(
        F.max("_n").cast("long").alias("n"),
        F.sum(s_term).alias("_s"),
        F.countDistinct("_x").alias("_rx"),
        F.countDistinct("_y").alias("_ry"),
    )
    n_d = F.col("n").cast("double")
    chi2 = n_d * (F.col("_s") - F.lit(1.0))
    min_side = F.least(F.col("_rx"), F.col("_ry")) - F.lit(1)
    return rep.select(
        *g,
        "n",
        ((F.col("_rx") - 1) * (F.col("_ry") - 1)).cast("long").alias("dof"),
        chi2.alias("chi2"),
        F.when(
            min_side > 0, F.sqrt(F.greatest(chi2, F.lit(0.0)) / (n_d * min_side))
        )
        .otherwise(F.lit(0.0))
        .alias("cramers_v"),
    )


def ks_two_sample(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    round_to: float | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic for one numeric column —
    D = max over observed values of |CDF_a(v) − CDF_b(v)|, the
    distribution-drift test that (unlike :func:`psi_drift`'s fixed bins)
    needs no binning decision and catches shape changes PSI's coarse
    histogram can average away. Returns ONE row:
    (n_a, n_b, ks_d, at_value, critical_95) where ``at_value`` is the
    smallest value achieving D and ``critical_95`` the classic
    1.358·√((n_a+n_b)/(n_a·n_b)) large-sample threshold.

    Scale shape: each side collapses to a (value, count) relation first
    (map-side combine — the shuffle carries distinct values, not rows),
    the two relations merge-count in one hash agg, and BOTH cumulative
    counts ride ONE two-phase prefix scan
    (operators/layout.prefix_sums: range exchange + partition-local
    windows + broadcast offsets — no single-task global window). All
    arithmetic is exact integer counts divided once per row, so a SQL
    oracle replays D bit-for-bit. NULLs are excluded (they are
    drift_report's null_count signal, not a distribution point).

    ``round_to``: optional bucket width. The (value, count) collapse only
    shrinks the shuffle when values repeat — on a nearly-unique
    continuous column (prices with float noise, timings) the distinct
    relation IS row-sized. Setting ``round_to`` floors each value to a
    multiple of the width BEFORE aggregation (``floor(v/w)·w``), bounding
    the shuffled relation at range/width rows per side. D is then
    computed on the bucketed CDFs — exact for the bucketed distribution,
    and within one bucket's probability mass of the raw-value D. Default
    ``None`` preserves the exact raw-value semantics (the oracle path).
    """
    from rust_cdc_validator_spark.operators.layout import prefix_sums

    if round_to is not None and not round_to > 0:
        raise ValueError("round_to must be > 0")

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(value_col).cast("double")
        if round_to is not None:
            v = F.floor(v / F.lit(float(round_to))) * F.lit(float(round_to))
        return (
            df.select(v.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .select("_v", F.lit(ca).alias("_ca"), F.lit(cb).alias("_cb"))
        )

    pooled = side(a, 1, 0).unionAll(side(b, 0, 1))
    cells = pooled.groupBy("_v").agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    cum = prefix_sums(cells, ["_v"], {"_na": "_cna", "_nb": "_cnb"})
    tot = cells.agg(
        F.sum("_na").cast("long").alias("_ta"),
        F.sum("_nb").cast("long").alias("_tb"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "_v",
        "_ta",
        "_tb",
        F.abs(
            (F.col("_cna") + F.col("_na")).cast("double") / F.col("_ta")
            - (F.col("_cnb") + F.col("_nb")).cast("double") / F.col("_tb")
        ).alias("_d"),
    )
    mx = d.agg(F.max("_d").alias("_mx"))
    return (
        d.join(F.broadcast(mx), d["_d"] == mx["_mx"])
        .agg(
            F.max("_ta").alias("n_a"),
            F.max("_tb").alias("n_b"),
            F.round(F.max("_d"), 6).alias("ks_d"),
            F.min("_v").alias("at_value"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_d",
            "at_value",
            F.round(
                F.lit(1.358)
                * F.sqrt(
                    (F.col("n_a") + F.col("n_b")).cast("double")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("critical_95"),
        )
    )


def ols_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group simple linear regression (closed-form OLS): slope,
    intercept, r², n — the trend detector behind "is this metric drifting
    WITH that one" questions (drift_report says a mean moved;
    this says how fast, per segment).

    Everything derives from the five classical sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) in ONE hash aggregation with map-side partials — no second pass,
    no window, shuffle bounded by group count. Degenerate groups (zero x
    variance or n < 2) return NULL slope/intercept/r² via ``try_divide``
    (ANSI-safe) rather than raising. Rows with NULL x or y are excluded.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("_sxy") - F.col("_sx") * F.col("_sy") / n  # n·cov
    varx_n = F.col("_sxx") - F.col("_sx") * F.col("_sx") / n  # n·var(x)
    vary_n = F.col("_syy") - F.col("_sy") * F.col("_sy") / n  # n·var(y)
    slope = F.try_divide(cov_n, varx_n)
    intercept = (F.col("_sy") - slope * F.col("_sx")) / n
    r2 = F.try_divide(cov_n * cov_n, varx_n * vary_n)
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Lift table: rank rows by ``score_col`` descending, split into
    ``buckets`` equal-population bands, and report each band's positive
    rate against the base rate plus the cumulative share of positives
    captured — the model-evaluation readout ("top decile captures 31% of
    converters") and the drift check for a deployed score (a lift curve
    flattening release-over-release is the score going stale).

    Ranks are EXACT and scalable: no global ``Window.orderBy`` funnel —
    rows ride :func:`operators.layout.prefix_sum` (range exchange +
    partition-local windows + broadcast offsets) over the tie-broken
    (−score, tiebreak) order; bucket = floor(rank·buckets/n), identical
    to SQL ROW_NUMBER arithmetic, so an oracle replays it. The final
    cumulative-capture window runs over ``buckets`` rows — constant-size.
    ``label_col`` must be 0/1-valued (cast to int). NULL scores are
    EXCLUDED (matching :func:`ols_by_group`'s NULL policy): an unscored
    row has no rank — Spark's ascending-negated sort would otherwise put
    NULLs in the TOP decile while SQL ``ORDER BY s DESC`` puts them
    last, a silent oracle divergence and surprising semantics.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    from rust_cdc_validator_spark.operators.layout import prefix_sum

    df = df.filter(F.col(score_col).isNotNull())
    base = df.select(
        (-F.col(score_col).cast("double")).alias("_ns"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(label_col).cast("int").alias("_y"),
        F.lit(1).alias("_one"),
    )
    ranked = prefix_sum(base, ["_ns", "_tb"], "_one", "_rk")
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_p"),
    )
    bucketed = ranked.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.col("_rk").cast("double") * buckets / F.col("_n")
        ).cast("int").alias("bucket"),
        "_y",
        "_n",
        "_p",
    )
    per = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.max("_n").alias("_n"),
        F.max("_p").alias("_p"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    rate = F.col("n_pos").cast("double") / F.col("n_rows")
    base_rate = F.col("_p").cast("double") / F.col("_n")
    return (
        per.withColumn("_cum_pos", F.sum("n_pos").over(w))
        .select(
            "bucket",
            "n_rows",
            "n_pos",
            F.round(rate, 6).alias("rate"),
            F.round(F.try_divide(rate, base_rate), 6).alias("lift"),
            F.round(
                F.try_divide(
                    F.col("_cum_pos").cast("double"), F.col("_p")
                ),
                6,
            ).alias("cum_capture"),
        )
    )


def wasserstein_1d(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    round_to: float | None = None,
) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between two empirical
    distributions — W₁ = ∫|CDF_a − CDF_b| dx — the drift metric that
    weighs HOW FAR mass moved where KS (:func:`ks_two_sample`) only
    reports the largest CDF gap and PSI depends on a binning choice.
    Returns ONE row (n_a, n_b, w1). ``round_to`` buckets values first,
    same contract and same shuffle bound as the KS knob.

    Exact over the empirical CDFs: the integral is a finite sum over
    consecutive distinct values, Σᵢ |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ).
    Each |CDF gap| is the INTEGER |cum_a·n_b − cum_b·n_a| (no per-row
    division), the per-interval term multiplies it by the gap as one
    double product, terms sum as exact DECIMAL, and the single division
    by n_a·n_b happens once at the end — engine-portable throughout.

    Scale shape: distinct-value cells collapse map-side exactly like
    KS, then cumulative counts AND the consecutive-value gap ride ONE
    shared two-phase scan: a single range exchange (materialized once —
    RangePartitioner re-samples per evaluation, so unmaterialized
    double evaluation stamps inconsistent partition ids), partition-
    local windows for the running sums and the lead, and one
    partitions-sized offsets relation that carries both the cumulative
    carry-ins and each partition's NEXT first value (patching the last
    row's gap) — no global window, no second exchange. The global last
    value has no successor and contributes exactly 0 (both CDFs are 1
    there).
    """
    if round_to is not None and not round_to > 0:
        raise ValueError("round_to must be > 0")

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(value_col).cast("double")
        if round_to is not None:
            v = F.floor(v / F.lit(float(round_to))) * F.lit(float(round_to))
        return (
            df.select(v.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .select("_v", F.lit(ca).alias("_ca"), F.lit(cb).alias("_cb"))
        )

    pooled = side(a, 1, 0).unionAll(side(b, 0, 1))
    cells = pooled.groupBy("_v").agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    parts = int(
        cells.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        cells.repartitionByRange(parts, F.col("_v"))
        .sortWithinPartitions("_v")
        .withColumn("_pid", F.spark_partition_id())
        # materialize ONCE: every consumer below must see the SAME range
        # boundaries — RangePartitioner re-samples per evaluation (seeded
        # on the RDD id), so two evaluations of this subtree can stamp the
        # same row with different _pid values and mis-patch the partition-
        # boundary gaps (observed: nondeterministic W1). Cells-sized, and
        # bounded by round_to on continuous columns.
        .localCheckpoint(eager=True)
    )
    w_local = Window.partitionBy("_pid").orderBy("_v")
    w_excl = w_local.rowsBetween(Window.unboundedPreceding, -1)
    # partitions-sized relation; the 1-task windows span partition COUNT
    w_pid = Window.orderBy("_pid")
    w_pid_excl = w_pid.rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(
            F.sum("_na").alias("_pa"),
            F.sum("_nb").alias("_pb"),
            F.min("_v").alias("_first_v"),
        )
        .select(
            "_pid",
            F.coalesce(F.sum("_pa").over(w_pid_excl), F.lit(0)).alias("_offa"),
            F.coalesce(F.sum("_pb").over(w_pid_excl), F.lit(0)).alias("_offb"),
            F.lead("_first_v").over(w_pid).alias("_next_first"),
        )
    )
    with_gap = (
        ranged.withColumn(
            "_cna", F.coalesce(F.sum("_na").over(w_excl), F.lit(0))
        )
        .withColumn(
            "_cnb", F.coalesce(F.sum("_nb").over(w_excl), F.lit(0))
        )
        .withColumn("_lead_local", F.lead("_v").over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_cna", F.col("_cna") + F.col("_offa"))
        .withColumn("_cnb", F.col("_cnb") + F.col("_offb"))
        .withColumn(
            "_gap",
            F.coalesce(F.col("_lead_local"), F.col("_next_first"))
            - F.col("_v"),
        )
    )
    tot = ranged.agg(
        F.sum("_na").cast("long").alias("_ta"),
        F.sum("_nb").cast("long").alias("_tb"),
    )
    # the global last value has no successor: a NULL gap contributes 0
    # (keeping the row, so a single-bucket input still aggregates)
    term = (
        F.abs(
            (F.col("_cna") + F.col("_na")) * F.col("_tb")
            - (F.col("_cnb") + F.col("_nb")) * F.col("_ta")
        ).cast("double")
        * F.coalesce(F.col("_gap"), F.lit(0.0))
    ).cast("decimal(38,12)")
    return (
        with_gap.crossJoin(F.broadcast(tot))
        .agg(
            F.max("_ta").alias("n_a"),
            F.max("_tb").alias("n_b"),
            F.round(
                F.sum(term).cast("double")
                / (F.max("_ta") * F.max("_tb")).cast("double"),
                6,
            ).alias("w1"),
        )
    )


def psi_baseline(
    df: DataFrame, value_col: str, bins: int = 10
) -> DataFrame:
    """The PSI reference histogram as a persistable RELATION —
    (bin, bin_lo, width, share_before) over ``bins`` fixed-width
    buckets of ``df``'s [min, max] — built ONCE from the training
    snapshot so every later compare (batch :func:`psi_drift` shape, or
    the live ``streaming.windows.psi_stream`` monitor) scores against
    the SAME edges. Bins with no mass keep a zero-share row (the grid
    is complete — a consumer can compile it without re-deriving edges).

    Scale shape: one min/max aggregate (two doubles to the driver), one
    map-side bucket+count pass, bins-sized output. NULLs excluded."""
    if bins < 2:
        raise ValueError("bins must be >= 2")
    lo, hi = df.agg(
        F.min(F.col(value_col).cast("double")),
        F.max(F.col(value_col).cast("double")),
    ).collect()[0]
    if lo is None or hi is None:
        raise ValueError(f"{value_col} has no non-null values")
    width = (hi - lo) / bins if hi > lo else 1.0
    x = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(F.floor((x - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    counts = (
        df.filter(x.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    total = counts.agg(F.sum("_n").alias("_t"))
    grid = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    return (
        grid.join(counts, "bin", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            F.lit(width).alias("width"),
            (
                F.coalesce(F.col("_n"), F.lit(0)) / F.col("_t")
            ).alias("share_before"),
        )
    )


def norm_sf(z) -> F.Column:
    """Upper-tail standard-normal survival P(Z > z) for z >= 0 as a pure
    column expression — Zelen & Severo's polynomial (Abramowitz & Stegun
    26.2.17, |error| < 7.5e-8), so a SQL oracle replays the p-value
    bit-for-bit: the formula is per-row double arithmetic (exp + one
    Horner chain), which is IEEE-identical across engines — no erf/
    gamma-function dependency either side may lack. Callers pass |z| and
    double for a two-sided p."""
    z = z if isinstance(z, F.Column) else F.col(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z)
    phi = F.exp(-(z * z) / F.lit(2.0)) * F.lit(0.3989422804014327)
    horner = (
        (
            (
                (F.lit(1.330274429) * t + F.lit(-1.821255978)) * t
                + F.lit(1.781477937)
            )
            * t
            + F.lit(-0.356563782)
        )
        * t
        + F.lit(0.319381530)
    ) * t
    return phi * horner


# the same polynomial as ANSI SQL, for oracle builders ({z} is substituted)
NORM_SF_SQL = (
    "(exp(-(({z}) * ({z})) / 2.0) * 0.3989422804014327 * "
    "((((((1.330274429 * (1.0 / (1.0 + 0.2316419 * ({z})))) + -1.821255978)"
    " * (1.0 / (1.0 + 0.2316419 * ({z}))) + 1.781477937)"
    " * (1.0 / (1.0 + 0.2316419 * ({z}))) + -0.356563782)"
    " * (1.0 / (1.0 + 0.2316419 * ({z}))) + 0.319381530)"
    " * (1.0 / (1.0 + 0.2316419 * ({z})))))"
)


def mann_whitney_u(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric
    location-shift companion to :func:`ks_two_sample`: KS asks "did the
    shape move anywhere", this asks "does one side stochastically
    dominate", robust to outliers a mean-based t-test chases. Returns ONE
    row: (n_a, n_b, u_a, z, p_two, rank_biserial) with the tie-corrected
    normal approximation (Mann & Whitney 1947; tie variance per Lehmann,
    Nonparametrics 1975) and the rank-biserial effect size
    r = 1 − 2U_a/(n_a·n_b) (Wendt 1972).

    Scale shape — identical to KS: each side collapses map-side to a
    (value, count) relation, one hash agg merges them, and the exclusive
    cumulative counts ride ONE two-phase prefix scan (no single-task
    global window). Rank sums use the midrank identity
    2·R_a = Σ_v n_a(v)·(2·cum_before(v) + n(v) + 1), kept EXACT in
    DECIMAL(38,0) (2R ≤ 2N² overflows int64 past ~3e9 rows), divided
    once at the end — a SQL oracle replays U, z, and p bit-for-bit.
    NULLs are excluded on both sides."""
    from rust_cdc_validator_spark.operators.layout import prefix_sums

    def side(df: DataFrame, ca: int, cb: int) -> DataFrame:
        v = F.col(value_col).cast("double")
        return (
            df.select(v.alias("_v"))
            .filter(F.col("_v").isNotNull())
            .select("_v", F.lit(ca).alias("_ca"), F.lit(cb).alias("_cb"))
        )

    cells = (
        side(a, 1, 0)
        .unionAll(side(b, 0, 1))
        .groupBy("_v")
        .agg(F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb"))
    )
    cum = prefix_sums(cells, ["_v"], {"_na": "_cna", "_nb": "_cnb"})
    dec = "decimal(38,0)"
    nv = (F.col("_na") + F.col("_nb")).cast(dec)
    two_rank = (
        F.lit(2).cast(dec) * (F.col("_cna") + F.col("_cnb")).cast(dec)
        + nv
        + F.lit(1).cast(dec)
    )
    agg = cum.agg(
        F.sum("_na").cast("long").alias("n_a"),
        F.sum("_nb").cast("long").alias("n_b"),
        F.sum(F.col("_na").cast(dec) * two_rank).alias("_2ra"),
        F.sum(nv * nv * nv - nv).alias("_ties"),
    )
    na, nb = F.col("n_a").cast(dec), F.col("n_b").cast(dec)
    n = na + nb
    two_u = (F.col("_2ra") - na * (na + F.lit(1).cast(dec))).alias("_2u")
    stats = agg.select("n_a", "n_b", two_u, "_ties")
    u = F.col("_2u").cast("double") / F.lit(2.0)
    mu = F.col("n_a").cast("double") * F.col("n_b") / F.lit(2.0)
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    tie_term = F.col("_ties").cast("double") / (nd * (nd - F.lit(1.0)))
    sigma = F.sqrt(
        F.col("n_a").cast("double")
        * F.col("n_b")
        / F.lit(12.0)
        * ((nd + F.lit(1.0)) - tie_term)
    )
    z = (u - mu) / sigma
    return stats.select(
        "n_a",
        "n_b",
        F.round(u, 2).alias("u_a"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(2.0) * norm_sf(F.abs(z)), 6).alias("p_two"),
        F.round(
            F.lit(1.0)
            - F.lit(2.0) * u / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("rank_biserial"),
    )


def two_proportion_ztests(
    df: DataFrame,
    group_col: str,
    success: F.Column,
) -> DataFrame:
    """Per-group two-proportion z-test of each group AGAINST ITS
    COMPLEMENT: for every value of ``group_col``, is the group's success
    share different from everyone else's? The screening pass that feeds
    :func:`bh_fdr` — one test per group means multiple comparisons, and
    raw p < 0.05 readouts at 25+ groups are noise without FDR control.

    Pooled-variance form (Fleiss, Levin & Paik 2003 §3): with the group's
    (n₁, s₁) and the complement's (n₂, s₂) = (N−n₁, S−s₁),
    z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) where p̂ = S/N. Two-sided p via
    :func:`norm_sf`. Degenerate splits (empty complement, p̂ ∈ {0,1})
    return NULL z/p rather than ±inf.

    Scale shape: ONE map-side-combined hash agg to a groups-sized
    relation; the (N, S) totals re-aggregate FROM that relation and
    broadcast back — the raw table is read once, shuffled never (counts
    move, rows don't)."""
    per = df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(success, 1).otherwise(0)).alias("successes"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("_tn"),
        F.sum("successes").cast("long").alias("_ts"),
    )
    j = per.crossJoin(F.broadcast(tot))
    n1 = F.col("n").cast("double")
    s1 = F.col("successes").cast("double")
    n2 = (F.col("_tn") - F.col("n")).cast("double")
    s2 = (F.col("_ts") - F.col("successes")).cast("double")
    pooled = F.col("_ts").cast("double") / F.col("_tn")
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / n1 + F.lit(1.0) / n2)
    )
    z = F.when(
        (n2 > 0) & (pooled > 0) & (pooled < 1), (s1 / n1 - s2 / n2) / se
    )
    return j.select(
        "group_key",
        "n",
        "successes",
        F.round(s1 / n1, 6).alias("share"),
        F.round(F.when(n2 > 0, s2 / n2), 6).alias("rest_share"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(2.0) * norm_sf(F.abs(z)), 6).alias("p_two"),
    )


def bh_fdr(
    tests: DataFrame,
    p_col: str,
    key_cols: list[str],
    q: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control (Benjamini & Hochberg 1995)
    over a relation of m tests: rank p-values ascending, find the largest
    k with p₍ₖ₎ ≤ k·q/m, reject ranks 1..k. Adds (p_rank, bh_critical,
    rejected) to every test row plus the shared cutoff rank — the
    multiple-comparisons gate every per-segment screening pass
    (:func:`two_proportion_ztests`, per-group drift tests) needs before
    anyone acts on a p < 0.05.

    The input is a TESTS relation — one row per hypothesis (groups-sized:
    segments, nations, metrics), orders of magnitude smaller than the
    data that produced it. The global rank window is therefore the
    documented bounded-relation exception, not a row-scaled sort; m rows
    is KBs. ``key_cols`` break p-ties deterministically (the BH decision
    is tie-stable — equal p-values share a bh_critical ladder position
    range, and step-up rejects a tied block iff its LAST rank passes, so
    the tie order never changes who is rejected — but stable output needs
    a total order). NULL p-values (degenerate tests) are never rejected
    and sort last."""
    if not 0 < q < 1:
        raise ValueError("q must be in (0, 1)")
    w = Window.orderBy(
        F.col(p_col).asc_nulls_last(), *[F.col(c) for c in key_cols]
    )
    m = tests.count()
    ranked = tests.withColumn("p_rank", F.row_number().over(w)).withColumn(
        "bh_critical",
        F.round(F.col("p_rank") * F.lit(float(q)) / F.lit(float(m)), 6),
    )
    passing = ranked.filter(
        F.col(p_col).isNotNull() & (F.col(p_col) <= F.col("bh_critical"))
    ).agg(F.max("p_rank").alias("_cutoff"))
    return (
        ranked.crossJoin(F.broadcast(passing))
        .withColumn(
            "rejected",
            F.col(p_col).isNotNull()
            & (F.col("p_rank") <= F.coalesce(F.col("_cutoff"), F.lit(0))),
        )
        .withColumnRenamed("_cutoff", "cutoff_rank")
    )
