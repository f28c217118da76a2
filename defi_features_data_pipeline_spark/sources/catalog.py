"""Parquet-directory catalog.

The reference organizes tables into medallion-layer databases on S3 +
Glue (`/root/reference/README.md:121-143`; layer writes
`src/pipelines/raw/defi_events.py:38-45`). Here a Catalog maps
``(layer, table)`` to a Parquet path rooted at a base dir and registers
Spark temp views; on a real cluster the base dir is an object-store
prefix and the registration is `saveAsTable` into a metastore —
the call sites don't change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-generated TPC-H-ish tables from ``sf_dir``."""
    return {
        t: spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        for t in TESTDATA_TABLES
    }


def register_testdata_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register each table as a temp view named after itself."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


class Catalog:
    """Layered Parquet catalog: ``base/<layer>/<table>/`` directories.

    Mirrors the reference's 4-layer medallion databases
    (db_raw/db_stage/db_analytics/db_sandbox) without a metastore
    dependency; swap ``base`` for an object-store URI in production.
    """

    LAYERS = ("raw", "stage", "analytics", "sandbox", "features")

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.base, layer, table)

    def exists(self, layer: str, table: str) -> bool:
        p = self.path(layer, table)
        # _SUCCESS / parquet part files indicate a committed write
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, layer: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(layer, table))

    def write(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
    ) -> None:
        """Partitioned Parquet write (reference S5/S6/S8:
        `src/pipelines/raw/defi_events.py:38-45`,
        `src/pipelines/features/save_defi_features_datalake.py:45-53`)."""
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(layer, table))

    def view(self, layer: str, table: str, view_name: str | None = None) -> DataFrame:
        df = self.read(layer, table)
        df.createOrReplaceTempView(view_name or table)
        return df
