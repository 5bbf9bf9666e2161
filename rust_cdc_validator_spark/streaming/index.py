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
