"""Disjunctive (OR-predicate) equi-join rewrite.

The reference joins borrow events to health factors with
``ON (b.account_address = hf.account OR b.sender_address = hf.account)``
(J9, `/root/reference/src/pipelines/features/transformations/view_defi_historical_count_above_threshold.sql:66-67`).
An OR of equalities defeats hash joins — Catalyst falls back to
BroadcastNestedLoopJoin, which is O(n*m) and a non-starter at scale.

Rewrite: UNION of per-disjunct equi-joins, then DISTINCT on the
combined key (a row matching via both disjuncts must appear once, as
in the OR semantics). Each leg is hash-joinable and AQE-broadcastable;
the distinct is one extra shuffle — linear, not quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def disjunctive_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` where ANY of ``left[a] == right[b]``
    for (a, b) in ``key_pairs`` holds — as a union of equi-joins.

    Column collisions must be resolved by the caller (select/alias
    before the call). ``how`` supports 'inner' and 'left' ('left'
    keeps unmatched left rows once, like LEFT JOIN ... ON a OR b).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    legs = [
        left.join(right, left[a] == right[b], "inner")
        for a, b in key_pairs
    ]
    matched = legs[0]
    for leg in legs[1:]:
        matched = matched.unionByName(leg)
    matched = matched.distinct()
    if how == "inner":
        return matched
    # left: add rows with no match under ANY disjunct, right columns NULL
    unmatched = left
    for a, b in key_pairs:
        unmatched = unmatched.join(right.select(right[b]), left[a] == right[b], "left_anti")
    import pyspark.sql.functions as F

    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched.select(matched.columns))
