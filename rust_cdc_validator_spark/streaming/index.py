"""Standing dedup at ingest: a Structured Streaming query that maintains
the persisted MinHash index (``operators/dedup.py:build_minhash_index``)
as new documents arrive.

Per micro-batch (``foreachBatch`` — index writes are batch-sink territory):

1. probe: ``near_dup_against_index`` finds the batch's near-dups against
   everything indexed so far (corpus signatures never recompute, corpus
   memberships never shuffle — the probe broadcasts the BATCH);
2. emit: the pairs append to a parquet log (``pairs_path``) for the
   downstream keep/drop policy;
3. append: the batch's own signatures/memberships join the index
   (``append_to_minhash_index``), so the NEXT batch dedups against this
   one too.

Probe-before-append gives clean semantics: a batch is never compared with
itself (batch-internal dups are ``minhash_near_dup_pairs`` on the batch,
run by the caller if wanted), and a doc is indexed exactly once.

At 100 TB the index is the corpus-sized side and lives in the object
store; each micro-batch costs ∝ |batch| signatures + the probed buckets'
populations — the streaming sibling of the day-2 story
``build_minhash_index`` documents. foreachBatch re-runs on recovery are
idempotent for the PAIRS log only if ids are later deduped downstream;
exact-once appends need a transactional table format underneath — called
out here rather than papered over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rust_cdc_validator_spark.operators.dedup import (
    append_to_minhash_index,
    near_dup_against_index,
)


def maintain_minhash_index(
    doc_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
):
    """Build (not start) the maintenance query; caller ``.start()``s it.

    ``doc_stream`` is any streaming DataFrame of (id, text) — file source
    over a landing prefix in production, memory/file source in tests.
    """

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        pairs = near_dup_against_index(
            batch, index_path, text_col=text_col, id_col=id_col,
            threshold=threshold,
        )
        pairs.write.mode("append").parquet(pairs_path)
        append_to_minhash_index(
            batch, index_path, text_col=text_col, id_col=id_col
        )

    return (
        doc_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


def maintain_lsh_index(
    vec_stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
):
    """The embedding sibling of :func:`maintain_minhash_index`: per
    micro-batch, probe the persisted hyperplane-LSH index
    (``operators/similarity.py:build_lsh_index``) for near-dups of the
    batch's vectors, log the verified pairs, then append the batch's
    memberships + unit vectors. Same probe-before-append semantics and
    the same ∝|batch| cost shape."""
    from rust_cdc_validator_spark.operators.similarity import (
        append_to_lsh_index,
        near_dup_against_lsh_index,
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        pairs = near_dup_against_lsh_index(
            batch, index_path, id_col=id_col, vec_col=vec_col,
            threshold=threshold,
        )
        pairs.write.mode("append").parquet(pairs_path)
        append_to_lsh_index(batch, index_path, id_col=id_col, vec_col=vec_col)

    return (
        vec_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


def maintain_ivf_index(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refit_flag_path: str | None = None,
    max_imbalance: float = 4.0,
):
    """Keep a persisted IVF index (``operators/similarity.py:
    build_ivf_index``) fresh from an embedding stream: each micro-batch is
    assigned map-side against the STORED centroids and appended into its
    cells' partitions — no shuffle, no scan of existing vectors, cost
    ∝ |batch|. Unlike the near-dup maintainers there is nothing to probe;
    retrieval freshness IS the product.

    After each append the cell-balance cue is checked
    (``ivf_refit_needed`` — bounded, n_cells rows); when drift crosses
    ``max_imbalance`` a one-row marker is written under
    ``refit_flag_path`` (if given) so an external scheduler can rebuild
    with a fresh quantizer fit — the refit itself is a batch job, not a
    per-micro-batch cost.
    """
    from rust_cdc_validator_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_refit_needed,
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        append_to_ivf_index(batch, index_path, id_col=id_col, vec_col=vec_col)
        if refit_flag_path is not None and ivf_refit_needed(
            batch.sparkSession, index_path, max_imbalance=max_imbalance
        ):
            batch.sparkSession.createDataFrame(
                [(int(batch_id),)], "flagged_at_batch long"
            ).write.mode("append").parquet(refit_flag_path)

    return (
        vec_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


def init_edge_state_log(spark, versions_path: str, initial_path: str) -> None:
    """Register an already-built edge state (``graphstate.build_edge_state``)
    as version -1 of a maintenance log — the seed :func:`maintain_edge_state`
    advances from."""
    spark.createDataFrame(
        [(-1, initial_path)], "batch_id long, path string"
    ).write.mode("overwrite").parquet(versions_path)


def current_edge_state(spark, versions_path: str, before: int | None = None) -> str:
    """Resolve the newest complete edge-state version from the log —
    optionally only versions strictly OLDER than ``before`` (the retry
    guard: a re-run batch must advance from its original parent, never
    from its own half-registered output)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(versions_path)
    if before is not None:
        df = df.filter(F.col("batch_id") < before)
    row = df.orderBy(F.col("batch_id").desc()).first()
    if row is None:
        raise ValueError(
            f"edge-state log {versions_path} has no version before {before} "
            "— seed it with init_edge_state_log"
        )
    return row["path"]


def maintain_edge_state(
    edge_stream: DataFrame,
    state_root: str,
    versions_path: str,
    checkpoint_dir: str,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
):
    """Standing graph maintenance — the edge-state sibling of
    :func:`maintain_minhash_index`: each micro-batch of edge deltas folds
    into the persisted graph state (``graphstate.advance_edge_state``,
    CDC semantics — negative weights retract) as an immutable NEW version
    under ``{state_root}/v{batch_id}``, then registers in the version
    log. Every ``*_from_state`` analytic reads
    :func:`current_edge_state`'s resolution and always sees a COMPLETE
    version — readers never race a half-written advance.

    Recovery semantics (foreachBatch may re-run a batch): the parent is
    resolved as the newest version with ``batch_id <`` this batch's — so
    a retried batch re-advances from its ORIGINAL parent and overwrites
    its own ``v{batch_id}`` instead of double-counting its delta;
    duplicate log rows from a crash between write and checkpoint carry
    identical values and are harmless to max-resolution. Old versions
    are the caller's to vacuum once no reader pins them.

    At 100 TB: per batch cost is O(|E| state read + |batch|) with zero
    fact-table scans — the graph stays current at streaming cadence
    while the expensive from-facts build runs exactly once, ever.
    """
    from rust_cdc_validator_spark.operators.graphstate import (
        advance_edge_state,
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        spark = batch.sparkSession
        parent = current_edge_state(spark, versions_path, before=batch_id)
        new_path = f"{state_root}/v{batch_id}"
        advance_edge_state(
            spark, parent, batch, new_path,
            src=src, dst=dst, weight_col=weight_col,
        )
        spark.createDataFrame(
            [(batch_id, new_path)], "batch_id long, path string"
        ).write.mode("append").parquet(versions_path)

    return (
        edge_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
