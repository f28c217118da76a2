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
