"""Stage layer: schema-on-write normalization (the reference's contract
boundary, SURVEY §1.4).

Semantics ported 1:1 from
`/root/reference/src/pipelines/stage/transformations/stage_tranformation_queries.py`
(events) and `src/pipelines/stage/ddl/the_graph_historical_market_data.sql` /
`the_graph_historical_account_positions.sql` (Graph snapshots):
enumerate columns, snake-case renames, LOWER() every address, cast
epoch seconds, flatten nested structs. Incremental via high-watermark
append (`... WHERE to_unixtime(ts) > (SELECT max(...) FROM target)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ...functions.scalars import epoch_seconds, normalize_address


def stage_events(raw: DataFrame, liquidation: bool = False) -> DataFrame:
    """Event normalization (`stage_tranformation_queries.py:3-18`,
    liquidation variant `:25-44`)."""
    cols = [
        F.col("block_number"),
        F.col("log_index"),
        F.col("transaction_hash"),
        F.col("timestamp"),
        epoch_seconds("timestamp").alias("epoch_timestamp"),
        F.col("protocol_name"),
        F.col("contract_version"),
        normalize_address("market_address").alias("market_address"),
        normalize_address("token_address").alias("token_address"),
    ]
    if liquidation:
        cols.append(
            normalize_address("liquidated_token_address").alias("liquidated_token_address")
        )
    cols += [
        F.col("category"),
        normalize_address("account_address").alias("account_address"),
    ]
    if liquidation:
        cols.append(normalize_address("liquidator_address").alias("liquidator_address"))
    cols.append(F.col("quantity"))
    if liquidation:
        cols.append(F.col("quantity_liquidated"))
    cols += [
        normalize_address("sender_address").alias("sender_address"),
        F.col("year"),
        F.col("month"),
    ]
    return raw.select(*cols)


def stage_market_data(raw: DataFrame) -> DataFrame:
    """Market-data normalization with nested-field flattening
    (`the_graph_historical_market_data.sql:7-18`):
    ``inputtoken.decimals AS decimals``, double casts, rename to
    snake_case."""
    return raw.select(
        F.col("liquidationthreshold").cast("double").alias("liquidation_threshold"),
        F.col("name"),
        F.col("inputtokenpriceusd").cast("double").alias("input_token_price_usd"),
        normalize_address("id").alias("id"),
        F.col("inputtoken.decimals").cast("long").alias("decimals"),
        F.col("protocol"),
        F.col("block_number").cast("long").alias("block_number"),
        F.col("block_timestamp").cast("long").alias("block_timestamp"),
    ).distinct()


def stage_account_positions(raw: DataFrame) -> DataFrame:
    """Position normalization (`the_graph_historical_account_positions.sql:7-21`):
    ``CAST(balance AS DOUBLE)``, ``market.name``/``market.id``/
    ``account.id`` flattening, boolean is_collateral, LOWER(account)."""
    return raw.select(
        F.col("balance").cast("double").alias("balance"),
        F.col("id"),
        F.col("iscollateral").cast("boolean").alias("is_collateral"),
        F.col("market.name").alias("market"),
        normalize_address(F.col("market.id")).alias("market_id"),
        F.col("side"),
        normalize_address(F.col("account.id")).alias("account"),
        F.col("blocknumber").cast("long").alias("block_number"),
        F.col("protocol"),
        F.col("block_timestamp").cast("long").alias("block_timestamp"),
    ).distinct()
