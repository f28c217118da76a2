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
