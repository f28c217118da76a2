"""Lakehouse maintenance operations.

A daily incremental pipeline (the reference appends per-run parquet
files — `src/pipelines/raw/defi_events.py:38-45`) accumulates small
files and stale aggregates; at 100 TB these utilities are part of the
operating surface, not an afterthought.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Small-file compaction: rewrite a parquet dir into ~target-sized
    files (bin-packed by current on-disk bytes). Returns
    (files_before, files_after). Swap-based like upsert_parquet so
    readers never see a partial state; listing + swap go through the
    Hadoop FS API (fsutil) so HDFS/S3A paths compact the same way."""
    from .fsutil import list_parquet_files, swap_dirs

    files = list_parquet_files(spark, path)
    if not files:
        return (0, 0)  # not-yet-written table: nothing to compact
    total_bytes = sum(sz for _, sz in files)
    n_out = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact_tmp__"
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    swap_dirs(spark, tmp, path)

    after = len(list_parquet_files(spark, path))
    return len(files), after


def optimize_zorder(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_file_mb: int = 512,
    bits: int = 8,
    n_files: int | None = None,
) -> tuple[int, int]:
    """OPTIMIZE + ZORDER in one maintenance pass (the lakehouse
    ``OPTIMIZE tbl ZORDER BY (a, b)``): bin-pack the table's current
    bytes into ~target-sized files AND cluster them on the Morton
    curve of ``cols`` — after the rewrite every file is a compact
    multi-dimensional tile, so min/max footer stats prune on EVERY
    z column (sources/layout.py) and the small-file problem is gone in
    the same single shuffle. Swap-based like compact_parquet: readers
    never observe a partial state. Returns (files_before,
    files_after)."""
    from .fsutil import list_parquet_files, swap_dirs
    from .layout import write_zordered

    files = list_parquet_files(spark, path)
    if not files:
        return (0, 0)
    total_bytes = sum(sz for _, sz in files)
    n_out = n_files or max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    # ONE z-write recipe lives in sources/layout.py; this pass adds the
    # bin-packed file count and the atomic swap
    tmp = path.rstrip("/") + ".__optimize_tmp__"
    write_zordered(spark.read.parquet(path), tmp, cols, bits=bits, n_files=n_out)
    swap_dirs(spark, tmp, path)
    return len(files), len(list_parquet_files(spark, path))


def merge_incremental_aggregate(
    stored: DataFrame | None,
    increment: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Incremental aggregate-view maintenance: fold a new increment's
    partial aggregates into the stored per-key aggregate WITHOUT
    rescanning history — the scale path for daily feature refresh
    (full recompute of a 100 TB history every day is the naive
    alternative). Additive measures only (sums/counts); avg = sum/n at
    read time."""
    inc_agg = increment.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    if stored is None:
        return inc_agg
    both = stored.unionByName(inc_agg)
    return both.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.sum(count_col).alias(count_col),
    )


def read_with_schema_evolution(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant read: merge schemas across files so a
    table whose writer added columns mid-stream (the reference's raw
    layer appends whatever the API returned — SURVEY §1.4) reads as the
    union schema with NULLs for missing columns."""
    return spark.read.option("mergeSchema", "true").parquet(path)
