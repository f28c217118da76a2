"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``defi_features_data_pipeline_spark/queries/``;
this module is just the contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defi_features_data_pipeline_spark.queries import (  # noqa: E402
    ALL_ORACLES,
    ALL_QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the customer feature spine — the
    reference's defi_features assembly shape (spine + left-join feature
    fragments + COALESCE-0) over the TPC-H-ish tables."""
    return ALL_QUERIES["customer_feature_spine"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    large-scale extension operators)."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each query (same column names/values).
    Keys absent here (non-SQL-expressible ops) get a rows-only check."""
    return dict(ALL_ORACLES)
