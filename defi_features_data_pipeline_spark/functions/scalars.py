"""Scalar expression helpers shared by the pipelines.

Each encodes one reference semantic exactly once (SURVEY §7.3.1 — the
clamp/sentinel ladders appear 4x in the reference with copy drift; here
they are single functions under test).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Sentinels — part of the reference's output contract
# (`/root/reference/src/pipelines/features/transformations/defi_features_calculation.sql:162-172`,
#  `view_defi_current_health_factor_features.sql:81-88`).
NEVER_SENTINEL = 999_999_999
HF_CAP = 1_000_000.0
HF_FLOOR = 0.000001


def normalize_address(c: Column | str) -> Column:
    """Stage-layer address normalization: LOWER() on every address
    column (`stage_tranformation_queries.py:11-16`)."""
    return F.lower(F.col(c) if isinstance(c, str) else c)


def epoch_seconds(ts: Column | str) -> Column:
    """``CAST(TO_UNIXTIME(timestamp) AS DECIMAL)`` — bare Presto DECIMAL
    truncates sub-second, so the Spark equivalent is a cast to long
    (`stage_tranformation_queries.py:8`, SURVEY §1.3)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.cast("timestamp").cast("long")


def address_bucket(c: Column | str, width: int = 2) -> Column:
    """256-hex-bucket partition key: SUBSTR(addr, 3, 2)
    (`analytics/transformations/transformations.sql:38`). Kept for
    schema parity; under Spark, prefer hash partitioning / bucketBy."""
    return F.substring(F.col(c) if isinstance(c, str) else c, 3, width)


def scale_by_decimals(quantity: Column | str, decimals: Column | str) -> Column:
    """Wei → token units: quantity / POWER(10, decimals)
    (`transformations.sql:31-32`)."""
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    d = F.col(decimals) if isinstance(decimals, str) else decimals
    return q / F.pow(F.lit(10.0), d)
