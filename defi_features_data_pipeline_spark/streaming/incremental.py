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
    ``foreachBatch``. A replayed batch re-upserts the same keys
    (idempotent) and OVERWRITES its own quarantine partition —
    quarantine rows land under ``dq_batch_id=<id>/`` (a partition
    directory keyed by the batch id), so a crash between the two
    writes followed by a replay replaces the partial partition instead
    of duplicating rows; readers of the quarantine sink see standard
    partition discovery with ``dq_batch_id`` as a column and never
    need to dedup.

    Per-batch cost: the batch is persisted once, so the clean/
    quarantine split and the two emptiness probes all scan the cached
    micro-batch — one source read per batch, not three (the split's
    two filters re-read the file source otherwise)."""
    import os as _os

    from ..sources.sinks import upsert_parquet

    def _quarantine_sink_exists() -> bool:
        from ..sources.fsutil import _fs

        fs, p = _fs(spark, quarantine_dir)
        if not fs.exists(p):
            return False
        for st in fs.listStatus(p):
            if st.getPath().getName().startswith("dq_batch_id="):
                return True
        return False

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            clean, quarantined = suite.split(batch_df)
            part_dir = _os.path.join(quarantine_dir, f"dq_batch_id={batch_id}")
            # write only when there is something to quarantine — an
            # unconditional write would accumulate one empty partition
            # per healthy micro-batch forever. The first batch writes
            # even when empty so the sink exists with its schema for
            # readers. mode=overwrite scoped to THIS batch's partition
            # directory makes replay idempotent.
            if not quarantined.isEmpty() or not _quarantine_sink_exists():
                quarantined.write.mode("overwrite").parquet(part_dir)
            if not clean.isEmpty():
                upsert_parquet(spark, clean, serve_dir, key=key)
        finally:
            batch_df.unpersist()

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
