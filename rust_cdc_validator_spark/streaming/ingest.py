"""Streaming JSONL corpus ingestion with quarantine — the continuous
sibling of ``sources/corpus_io.read_jsonl_corpus``.

A training-data landing zone receives JSONL continuously; the batch reader
re-lists everything each run, while this module tails the directory with a
Structured Streaming file source: only NEW files are parsed per trigger,
parsed rows append to a parquet corpus, malformed lines append verbatim to
a quarantine text sink, and the checkpoint makes the split resumable and
exactly-once per file. The parse core (PERMISSIVE from_json over a text
scan) is shared with the batch reader — same schema contract, same
corrupt-line semantics, proven by the same tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rust_cdc_validator_spark.sources.corpus_io import (
    CORRUPT_COL,
    split_json_lines,
)


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """STREAMING (good, quarantined) frames over a JSONL directory. Wire
    them to sinks yourself, or use ``ingest_jsonl_stream`` for the standard
    parquet-plus-quarantine layout. ``max_files_per_trigger`` bounds each
    micro-batch's file count (ingest-rate control on a deep backlog)."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.text(path)
    return split_json_lines(lines, schema, corrupt_col)


def ingest_jsonl_stream(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    quarantine_path: str,
    schema: T.StructType,
    checkpoint: str,
    corrupt_col: str = CORRUPT_COL,
    available_now: bool = True,
    curate=None,
) -> None:
    """Run the ingest: parsed rows → parquet at ``dest_path``, malformed
    lines → text at ``quarantine_path``; one checkpoint governs both (a
    single stream with a foreachBatch fan-out, so a file is either fully
    ingested — both splits — or replayed whole after a crash; two
    independent streams would let the splits drift on restart).

    ``curate``: optional ``DataFrame -> DataFrame`` applied to each
    micro-batch's PARSED split before it lands — the ingest-time curation
    gate (quality filter, blocklist, Bloom decontamination against a
    broadcast benchmark filter: everything map-side composes here without
    a second pass over the landed corpus). It must return a frame still
    carrying the schema columns; rows it drops are simply not landed
    (quarantine is for MALFORMED lines only and is unaffected). The hook
    runs inside the checkpointed epoch, so crash-replay re-curates the
    same file identically — keep it deterministic (every operator in this
    repo's curation layer is).

    ``available_now=True`` (default) drains the current backlog and stops —
    the cron-friendly mode; pass False for a continuous tail (caller then
    manages the returned query's lifecycle via spark.streams)."""
    good_cols = schema.fieldNames()

    def write_batch(batch: DataFrame, _epoch: int) -> None:
        # batch carries the corrupt col alongside parsed cols (built below);
        # split it here so both sinks commit within one epoch
        bad_mask = F.col(corrupt_col).isNotNull()
        batch.persist()
        try:
            parsed = batch.filter(~bad_mask).select(*good_cols)
            if curate is not None:
                parsed = curate(parsed).select(*good_cols)
            parsed.write.mode("append").parquet(dest_path)
            batch.filter(bad_mask).select(
                F.col(corrupt_col).alias("value")
            ).write.mode("append").text(quarantine_path)
        finally:
            batch.unpersist()

    good, bad = stream_jsonl_corpus(spark, src_path, schema, corrupt_col)
    # one unioned stream: good rows with corrupt_col=null, bad rows with
    # parsed cols null — so ONE checkpointed query feeds both sinks
    unioned = good.select(
        *good_cols, F.lit(None).cast("string").alias(corrupt_col)
    ).unionByName(
        bad.select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields],
            F.col(corrupt_col),
        )
    )
    writer = (
        unioned.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        writer.start()
