"""Union-distinct spine builder.

The reference builds its wallet spine as a 10-way UNION (sender and
account columns across all 5 event tables, deduplicated) —
`/root/reference/src/pipelines/features/transformations/view_distinct_defi_events_addresses.sql:2-33`.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def union_distinct(parts: list[DataFrame], out_col: str | None = None) -> DataFrame:
    """UNION (dedup) of single-column projections. Each part must have
    exactly one column; the result column is renamed to ``out_col`` (or
    the first part's column name).

    Plan shape: Spark collapses the chained unions into one multi-child
    Union and the distinct into a single hash aggregate — partial
    (map-side) dedup happens before the shuffle, so wide inputs with
    heavy duplication shuffle only the distinct keys.
    """
    name = out_col or parts[0].columns[0]
    normalized = [p.select(F.col(p.columns[0]).alias(name)) for p in parts]
    return reduce(DataFrame.unionByName, normalized).distinct()
