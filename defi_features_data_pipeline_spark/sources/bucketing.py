"""Bucketed tables — the co-located-join storage layout.

The reference has no bucketing concept (Athena re-shuffles every
join); at 100 TB the dominant repeated cost in the feature pipeline is
re-shuffling the same event/position tables on the same join keys for
every run. Spark's bucketing amortizes that shuffle into the write:
``bucketBy(n, keys)`` hash-partitions rows into a fixed number of
buckets AT WRITE TIME, and a join between two tables bucketed on the
same keys with the same bucket count runs WITHOUT any Exchange on
either side — the shuffle happened once, at ingestion, instead of once
per query. ``sortBy`` additionally pre-sorts within buckets so the
sort-merge join skips its sort.

This is the static sibling of AQE: AQE fixes a bad shuffle at runtime;
bucketing removes the shuffle from the plan entirely. Use it for the
spine tables every feature query joins on (wallet/account address).

Plan contract (asserted in ``tests/test_plans.py``): joining two
same-key same-count bucketed tables shows a SortMergeJoin whose
children contain NO ShuffleExchange (``Exchange hashpartitioning``).

Caveats encoded here rather than left to the caller:
- bucketed writes go through ``saveAsTable`` (the bucket metadata
  lives in the session catalog, not in the parquet files);
- the number of OUTPUT FILES per bucket follows the input partitioning
  — repartition by the bucket keys first so each bucket is one file
  (otherwise tasks × buckets small files);
- bucket pruning applies equality filters on the first bucket key to
  skip whole buckets at scan time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table in the session catalog; ``path`` makes it an
    external table at that location."""
    # Spark's repartition hash partitioning and bucketBy both assign via
    # pmod(murmur3(keys), n) — with MATCHING counts each task holds
    # exactly one bucket's keys, so each bucket is one file. Without the
    # explicit count the shuffle uses spark.sql.shuffle.partitions and a
    # bucket's keys spread across many tasks (tasks × buckets files).
    out = df.repartition(n_buckets, *[df[c] for c in bucket_cols])
    w = (
        out.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog;
    a plain ``spark.read.parquet`` on the files would LOSE the bucket
    layout and re-shuffle on join)."""
    return spark.table(table)
