"""Structured-Streaming variant of the incremental layer (SURVEY §2.9).

The reference is a daily batch with high-watermark semantics; its
streaming-equivalent is a file-source stream with
``Trigger.AvailableNow`` and a checkpoint-tracked offset: each run
processes exactly the files that arrived since the last run, then
stops — the same incremental contract as the watermark INSERT
(`stage_tranformation_queries.py:20`) but with exactly-once file
tracking instead of a max-timestamp predicate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def stream_append_incremental(
    spark: SparkSession,
    source_dir: str,
    schema,
    transform: Callable[[DataFrame], DataFrame],
    target_dir: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
) -> None:
    """Run one available-now micro-batch pass: read new parquet files
    under ``source_dir``, apply ``transform``, append to ``target_dir``.
    Safe to re-run; processed files are tracked in the checkpoint."""
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .load(source_dir)
    )
    writer = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination()


def stream_upsert_with_quarantine(
    spark: SparkSession,
    source_dir: str,
    schema,
    suite,
    serve_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    key: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Streaming serving with QUARANTINE-mode data quality (r6 verdict
    item 8): each micro-batch of the feature stream is split by the
    constraint suite's row-attributable checks — clean rows are
    key-upserted into the serving sink, failing rows land in a
    quarantine sink carrying ``dq_reasons`` (every violated
    constraint) and ``dq_batch_id`` for triage/replay. This is the
    streaming translation of the reference's halt-the-pipeline DQ gate
    (`defi_features_data_quality_pipeline.py:24-33`): a stream cannot
    halt retroactively, so bad ROWS are diverted while good rows keep
    serving; TABLE-level constraints (not-all-zero — no row to blame)
    stay with the batch gate upstream, which still halts the run.

    Exactly-once: the file-source checkpoint tracks which feature
    files each batch consumed, and both sinks are written inside one
    ``foreachBatch`` — a replayed batch re-upserts the same keys
    (idempotent) and re-appends its quarantine rows keyed by the same
    ``dq_batch_id`` (dedupable on (key, dq_batch_id))."""
    from pyspark.sql import functions as F

    from ..sources.sinks import upsert_parquet

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.fsutil import has_committed_data

        clean, quarantined = suite.split(batch_df)
        tagged = quarantined.withColumn("dq_batch_id", F.lit(batch_id))
        # append only when there is something to quarantine — an
        # unconditional append would accumulate one empty part file
        # per healthy micro-batch forever. The first batch writes even
        # when empty so the sink exists with its schema for readers.
        if not tagged.isEmpty() or not has_committed_data(spark, quarantine_dir):
            tagged.write.mode("append").parquet(quarantine_dir)
        if not clean.isEmpty():
            upsert_parquet(spark, clean, serve_dir, key=key)

    stream = spark.readStream.format("parquet").schema(schema).load(source_dir)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
