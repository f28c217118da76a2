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


def _utc_wallclock(ev: DataFrame, ts_col: str) -> F.Column:
    """``ts_col`` as a timestamp whose CALENDAR fields (year/month/…)
    read in UTC regardless of ``spark.sql.session.timeZone``. Identity
    when the session is already UTC; otherwise shifts via
    ``to_utc_timestamp`` so ``F.year``/``F.month`` (which evaluate in
    the session zone) see the UTC wall clock. Keeps the partition
    columns and the UTC-epoch watermark arithmetic in
    ``incremental_read_pruned`` on the SAME calendar — with a
    non-UTC session and session-zone partition columns, rows just
    after a month boundary would be silently pruned away."""
    tz = ev.sparkSession.conf.get("spark.sql.session.timeZone")
    col = F.col(ts_col).cast("timestamp")
    return col if tz == "UTC" else F.to_utc_timestamp(col, tz)


def with_calendar_partitions(ev: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the year/month partition columns the reference's raw
    layer writes (`src/pipelines/raw/defi_events.py:38-45`, SURVEY
    §1.2) from the event timestamp — write this frame with
    ``sinks.write_partitioned(..., ["year", "month"])`` to get a
    partition-prunable events lake. Partition columns are derived on
    the UTC calendar (see ``_utc_wallclock``) so they agree with the
    watermark→partition predicate mapping in
    ``incremental_read_pruned`` under any session timezone."""
    utc = _utc_wallclock(ev, ts_col)
    return ev.withColumn("year", F.year(utc)).withColumn("month", F.month(utc))


def incremental_read_pruned(
    lake: DataFrame,
    wm_epoch: int,
    ts_col: str = "ts",
    year_col: str = "year",
    month_col: str = "month",
) -> DataFrame:
    """Watermark-incremental read of a year/month-partitioned lake
    with STATIC partition pruning: the epoch watermark is mapped to
    literal predicates on the partition columns (month floor), so the
    scan skips every wholly-processed partition at plan time — the
    exact ``ts > wm`` residual then applies within the boundary
    partition. Without this a 100 TB daily increment re-lists and
    re-filters the entire history; with it the scan touches only the
    watermark month onward. Late-arriving rows (<= wm) are dropped,
    matching ``newer_than_watermark``. The residual compares at FULL
    timestamp precision (``> timestamp_seconds(wm)``) — a cast to
    whole seconds would silently drop rows landing inside the
    watermark second (wm + 0.5s), diverging from
    ``newer_than_watermark``."""
    import datetime

    d = datetime.datetime.fromtimestamp(wm_epoch, datetime.timezone.utc)
    boundary = (F.col(year_col) > d.year) | (
        (F.col(year_col) == d.year) & (F.col(month_col) >= d.month)
    )
    return lake.filter(boundary).filter(
        F.col(ts_col).cast("timestamp")
        > F.timestamp_seconds(F.lit(int(wm_epoch)).cast("long"))
    )
