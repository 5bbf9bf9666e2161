"""Int8 scalar quantization (SQ8) for embedding columns.

The storage-tier companion to IVF-PQ (`operators/pq.py`): where PQ
compresses vectors to m codebook bytes for ANN *probing*, SQ8 keeps every
dimension at 1 byte with a per-dimension affine scale — 4x smaller than
float32 at ~1e-2 reconstruction error, and decode is exact arithmetic (no
codebook), so it is the standard format for the *stored* tier of a vector
pipeline (FAISS `SQ8`, Milvus/pgvector scalar quantization; Jégou et al.
2011 §II discusses the scalar-vs-product trade-off).

Scale shape at 100 TB:
  * `sq8_fit` is ONE aggregation pass: per-dimension min/max with map-side
    partials — the shuffle is partitions x dims rows of three scalars, and
    the driver collects a dims-sized bounds list (512 dims = ~8 KB, the
    same bounded-collect contract as PQ codebooks / IVF centroids).
  * `sq8_encode` / `sq8_decode` are pure map-side array expressions with
    the bounds embedded as literal arrays in the plan — zero shuffle, no
    UDF, no join. Codes travel as `array<smallint>` (0..255).
  * quantization uses floor(x*255 + 0.5) — explicit half-up — so the
    DuckDB oracle reproduces codes bit-exactly (engine `round()` tie rules
    differ; floor(+0.5) does not).

Degenerate dimensions (hi == lo, e.g. a padding dim) encode to 0 and
decode to exactly `lo`, contributing zero error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sq8_fit",
    "sq8_encode",
    "sq8_decode",
    "sq8_error_report",
    "sq8_refit_needed",
    "write_sq8_baseline",
    "read_sq8_baseline",
]


def sq8_fit(df: DataFrame, vec_col: str) -> list[tuple[float, float]]:
    """One scan -> per-dimension (lo, hi) bounds, driver-collected.

    posexplode + groupBy(dim) so the min/max partials combine map-side;
    the exchange carries at most partitions x dims tiny rows. Returns a
    dims-sized python list (bounded like PQ codebooks), ready to embed as
    plan literals in `sq8_encode`/`sq8_decode`.
    """
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("_dim", "_v"))
        .groupBy("_dim")
        .agg(
            F.min(F.col("_v").cast("double")).alias("_lo"),
            F.max(F.col("_v").cast("double")).alias("_hi"),
            F.count(F.lit(1)).alias("_n"),
        )
        .orderBy("_dim")
        .collect()
    )
    if not rows:
        raise ValueError("sq8_fit: input has no vectors")
    # Raggedness check that actually sees SHORT rows: a missing dim in a
    # short row still exists in longer rows, so dim-id contiguity alone
    # cannot detect it — but its per-dim count drops below dim 0's.
    if [r["_dim"] for r in rows] != list(range(len(rows))) or len(
        {r["_n"] for r in rows}
    ) != 1:
        raise ValueError("sq8_fit: ragged vectors (dimensions missing in some rows)")
    return [(float(r["_lo"]), float(r["_hi"])) for r in rows]


def _dbl_array_expr(vals: list[float]) -> Column:
    """array<double> literal built as ONE parsed SQL expression — the
    per-element F.lit loop cost ~1 s of py4j round-trips per call at
    dim=64 (measured; the HyperBall-lane fix applied to literals).
    ``%.17e`` round-trips every finite double exactly; non-finite values
    fall back to the Column API (SQL has no inf/nan literal)."""
    import math

    if all(math.isfinite(v) for v in vals):
        return F.expr(
            "array(" + ", ".join(f"{v:.17e}" for v in vals) + ")"
        )
    return F.array(*[F.lit(float(v)) for v in vals])


def _bounds_arrays(bounds: list[tuple[float, float]]) -> tuple[Column, Column]:
    lo = _dbl_array_expr([float(b[0]) for b in bounds])
    hi = _dbl_array_expr([float(b[1]) for b in bounds])
    return lo, hi


def sq8_encode(vec: Column, bounds: list[tuple[float, float]]) -> Column:
    """float vector -> array<smallint> of 0..255 codes, map-side only.

    code = floor((v - lo) / (hi - lo) * 255 + 0.5), clamped to [0, 255]
    (clamping matters when encoding NEW vectors against bounds fit on an
    older corpus — out-of-range values saturate instead of wrapping).
    """
    lo, hi = _bounds_arrays(bounds)
    return F.transform(
        vec,
        lambda v, i: F.when(
            F.element_at(hi, i + 1) > F.element_at(lo, i + 1),
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (v.cast("double") - F.element_at(lo, i + 1))
                        / (F.element_at(hi, i + 1) - F.element_at(lo, i + 1))
                        * 255.0
                        + 0.5
                    ),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("smallint"),
    )


def sq8_decode(code: Column, bounds: list[tuple[float, float]]) -> Column:
    """array<smallint> codes -> array<double> reconstruction
    (lo + code/255 * (hi - lo)); exact arithmetic, no codebook lookup."""
    lo, hi = _bounds_arrays(bounds)
    return F.transform(
        code,
        lambda c, i: F.element_at(lo, i + 1)
        + c.cast("double")
        / 255.0
        * (F.element_at(hi, i + 1) - F.element_at(lo, i + 1)),
    )


def sq8_error_report(
    df: DataFrame,
    vec_col: str,
    bounds: list[tuple[float, float]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Reconstruction-quality monitor: encode -> decode -> per-group mean
    squared error and max absolute error. The refit cue for a standing
    SQ8 tier (bounds fit on last month's corpus drift as the data does —
    same maintenance loop as `ivf_refit_needed` / the PQ drift trigger).

    One map-side encode/decode + one aggregation with map-side partials;
    output is groups-sized.
    """
    deq = sq8_decode(sq8_encode(F.col(vec_col), bounds), bounds)
    err = F.zip_with(F.col(vec_col), deq, lambda v, d: v.cast("double") - d)
    per_row = df.select(
        *(group_cols or []),
        F.aggregate(err, F.lit(0.0), lambda a, e: a + e * e).alias("_sse"),
        F.array_max(F.transform(err, F.abs)).alias("_maxe"),
        F.size(F.col(vec_col)).alias("_dim"),
    )
    gb = per_row.groupBy(*(group_cols or []))
    return gb.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        (F.sum("_sse") / F.sum("_dim")).alias("mse"),
        F.max("_maxe").alias("max_abs_err"),
    )


def sq8_refit_needed(
    df: DataFrame,
    vec_col: str,
    bounds: list[tuple[float, float]],
    baseline_mse: float,
    max_error_ratio: float = 1.5,
    abs_error_floor: float = 1e-6,
    max_clip_frac: float = 0.01,
    max_sample_rows: int = 2048,
) -> bool:
    """Maintenance trigger for a standing SQ8 tier — the stored-tier
    analog of ``pq.ivfpq_refit_needed``. True when either drift signal
    fires on a bounded sample of the CURRENT corpus:

    * **clipped mass**: the fraction of vector components falling outside
      the fitted per-dimension [lo, hi] exceeds ``max_clip_frac``. At fit
      time this is exactly 0 by construction (bounds ARE the min/max), so
      any clipped mass is appended-data drift; clipped components saturate
      to code 0/255 and their error is unbounded by the fit.
    * **reconstruction-error growth**: sampled encode->decode MSE exceeds
      ``max(max_error_ratio * baseline_mse, abs_error_floor)``. The
      absolute floor handles a zero baseline (constant dims reconstruct
      exactly) the same way the PQ trigger does.

    ``baseline_mse`` is the fit-time ``sq8_error_report(...)['mse']`` on
    the corpus the bounds were fitted against — record it next to the
    bounds, as ``write_ivfpq_quant_baseline`` does for PQ.

    Bounded work: one LIMIT-sampled map-side encode/decode + a single
    global aggregation (three scalars); nothing shuffles but the partial
    sums.
    """
    lo, hi = _bounds_arrays(bounds)
    deq = sq8_decode(sq8_encode(F.col(vec_col), bounds), bounds)
    err = F.zip_with(F.col(vec_col), deq, lambda v, d: v.cast("double") - d)
    clip_flags = F.transform(
        F.col(vec_col),
        lambda v, i: (
            (v.cast("double") < F.element_at(lo, i + 1))
            | (v.cast("double") > F.element_at(hi, i + 1))
        ).cast("int"),
    )
    row = (
        df.select(vec_col)
        .limit(max_sample_rows)
        .select(
            F.aggregate(err, F.lit(0.0), lambda a, e: a + e * e).alias("_sse"),
            F.aggregate(clip_flags, F.lit(0), lambda a, x: a + x).alias("_clip"),
            F.size(F.col(vec_col)).alias("_dim"),
        )
        .agg(
            (F.sum("_sse") / F.sum("_dim")).alias("mse"),
            (F.sum("_clip") / F.sum("_dim")).alias("clip_frac"),
        )
        .first()
    )
    if row is None or row["mse"] is None:
        return False  # empty sample: nothing to judge drift on
    if float(row["clip_frac"]) > max_clip_frac:
        return True
    return float(row["mse"]) > max(
        max_error_ratio * float(baseline_mse), abs_error_floor
    )


def write_sq8_baseline(
    spark,
    path: str,
    df: DataFrame,
    vec_col: str,
    bounds: list[tuple[float, float]],
) -> float:
    """Persist the fit-time reconstruction baseline next to a stored SQ8
    tier — the exact analog of ``pq.write_ivfpq_quant_baseline`` so both
    quantizer tiers share one maintenance idiom: fit → write baseline →
    periodically probe ``sq8_refit_needed(..., read_sq8_baseline(...))``.
    Returns the recorded MSE."""
    mse = float(
        sq8_error_report(df, vec_col, bounds).first()["mse"] or 0.0
    )
    spark.createDataFrame(
        [(mse, len(bounds))], "baseline_mse double, n_dims int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/sq8_stats")
    return mse


def read_sq8_baseline(spark, path: str) -> float:
    """Read back the persisted fit-time MSE (see
    :func:`write_sq8_baseline`). Raises if the baseline was never
    written — a standing tier without its baseline has no drift anchor,
    and silently substituting 0.0 would make the refit trigger fire
    forever (or never, depending on the floor)."""
    row = spark.read.parquet(f"{path}/sq8_stats").first()
    if row is None or row["baseline_mse"] is None:
        raise ValueError(f"no SQ8 baseline recorded at {path}/sq8_stats")
    return float(row["baseline_mse"])
