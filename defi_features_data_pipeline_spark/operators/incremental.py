"""High-watermark helpers (P3).

Reference: ``WHERE to_unixtime(ts) > (SELECT max(to_unixtime(ts)) FROM
target)`` (`/root/reference/src/pipelines/stage/transformations/stage_tranformation_queries.py:20`)
and the block-number variant with COALESCE(...,0)
(`src/pipelines/analytics/historical_market_data_and_account_positions.py:19-24`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def high_watermark(target: DataFrame, col: str, default=None):
    """Scalar MAX(col) of the target (column-pruned scan; parquet
    row-group stats make this cheap even on huge targets)."""
    row = target.agg(F.max(col).alias("wm")).first()
    wm = row["wm"]
    return default if wm is None else wm


def newer_than_watermark(source: DataFrame, target: DataFrame, col: str) -> DataFrame:
    """Rows of ``source`` strictly newer than target's max(col). Late
    rows (<= watermark) are dropped — exactly the reference's implicit
    late-data policy (SURVEY §2.9)."""
    wm = high_watermark(target, col)
    return source if wm is None else source.filter(F.col(col) > F.lit(wm))
