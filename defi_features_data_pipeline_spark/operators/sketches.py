"""Bounded-memory streaming sketches as distributed operators.

`misra_gries_candidates` is the candidate-generation half of the
two-pass exact heavy-hitters pattern: per-partition Misra-Gries with k
counters (O(k) memory however large the partition), whose classical
guarantee makes the union of per-partition candidates a SUPERSET of
every item with global frequency > n/k (pigeonhole over partitions:
an item below the per-partition MG bar in EVERY partition is below
n/k globally). The second pass — exact counts restricted to the small
candidate set — is plain DataFrame code at the call site, so the
composite's final output is EXACT and engine-independent even though
phase 1 is partitioning-dependent.

Reference analogue: the reference has no sketch surface; its
heavy-key handling is the 256-way address bucketing
(/root/reference/src/pipelines/analytics/defi_events.py:123). At
100 TB a two-pass exact groupBy over a mostly-light-tailed key is
dominated by the full shuffle; MG candidates cut the second pass to
a broadcast-semi-filtered fraction of the input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Distinct candidate keys from a per-partition Misra-Gries sketch
    with ``k`` counters. Guarantee: contains every key whose GLOBAL
    count exceeds total_rows / k. Output column: ``key_col`` (distinct).

    mapInPandas keeps the sketch across a partition's Arrow batches —
    one pass, O(k) state, no shuffle; the only shuffle is the final
    small distinct."""
    out_field = df.schema[key_col]

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[key_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame({key_col: list(counters.keys())})

    return (
        df.select(key_col)
        .mapInPandas(sketch, schema=f"{key_col} {out_field.dataType.simpleString()}")
        .distinct()
    )


def bitmap_distinct_buckets(
    df: DataFrame, group_cols: list[str], id_col: str
) -> DataFrame:
    """Per-(group, bucket) EXACT-distinct bitmaps over an integer id
    column: bitmap_bucket_number partitions the id space, one
    bitmap_construct_agg per bucket. Fixed-size (≤4 KB/bucket),
    map-side-combinable partials that MERGE via ``bitmap_or_agg``
    (commutative/associative/idempotent) — the storable-increment
    property COUNT DISTINCT lacks. Shared by the batch gate
    (queries/warehouse.py::bitmap_count_distinct), the streaming
    OR-merge sink below, and their tests, so all three exercise one
    implementation."""
    from pyspark.sql import functions as F

    return (
        df.select(
            *group_cols,
            F.expr(f"bitmap_bucket_number({id_col})").alias("bn"),
            F.expr(f"bitmap_bit_position({id_col})").alias("bp"),
        )
        .groupBy(*group_cols, "bn")
        .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
    )


def bitmap_or_merge_sink(spark, root: str, group_cols: list[str], id_col: str):
    """foreachBatch function maintaining a manifest-committed bitmap
    store: each micro-batch's per-(group, bucket) bitmaps OR-merge
    against ONLY the store's matching rows, then publish atomically.
    Replay-idempotent and batch-order invariant because bitmap OR is
    commutative/associative/idempotent. Read the final counts with
    ``bitmap_counts_from_store``."""
    from pyspark.sql import functions as F

    from ..sources.fsutil import manifest_resolve, read_manifested
    from ..sources.sinks import upsert_manifested

    def or_merge(batch_df, _batch_id):
        inc = bitmap_distinct_buckets(batch_df, group_cols, id_col)
        if manifest_resolve(spark, root) is not None:
            prev = read_manifested(spark, root).select(
                *group_cols, "bn", "bm"
            ).join(
                inc.select(*group_cols, "bn").distinct(),
                [*group_cols, "bn"],
                "semi",
            )
            inc = (
                prev.unionByName(inc)
                .groupBy(*group_cols, "bn")
                .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
            )
        inc = inc.withColumn(
            "__k",
            F.concat_ws(
                "|", *group_cols, F.col("bn").cast("string")
            ),
        )
        upsert_manifested(spark, inc, root, "__k")

    return or_merge


def bitmap_counts_from_store(spark, root: str, group_cols: list[str]) -> DataFrame:
    """Exact distinct counts per group from a bitmap store maintained
    by ``bitmap_or_merge_sink`` (buckets partition the id space, so
    the per-bucket counts sum exactly)."""
    from pyspark.sql import functions as F

    from ..sources.fsutil import read_manifested

    return (
        read_manifested(spark, root)
        .groupBy(*group_cols)
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct"))
    )
