"""Latest-per-group / top-k-per-group.

The reference expresses "each market's latest snapshot" as a MAX +
inequality self-join (J10,
`/root/reference/src/pipelines/features/transformations/view_defi_current_health_factor_features.sql:3-22`)
and "latest price per (event, token)" as MAX + equi-join-back (A7).
Both are one windowed ``row_number() = 1`` in Spark — one shuffle
instead of two, with explicit deterministic tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: str | list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group under ``order_by`` (pass desc() columns for
    "largest"). Ties broken by the order columns supplied — pass a
    unique column last for full determinism."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def latest_per_group(
    df: DataFrame,
    group_by: str | list[str],
    time_col: str,
    tie_break: list[Column] | None = None,
) -> DataFrame:
    """The single latest row per group (J10 rewrite)."""
    order = [F.col(time_col).desc()] + (tie_break or [])
    return top_k_per_group(df, group_by, order, 1)
