"""Disjunctive (OR-predicate) equi-join rewrite.

The reference joins borrow events to health factors with
``ON (b.account_address = hf.account OR b.sender_address = hf.account)``
(J9, `/root/reference/src/pipelines/features/transformations/view_defi_historical_count_above_threshold.sql:66-67`).
An OR of equalities defeats hash joins — Catalyst falls back to
BroadcastNestedLoopJoin, which is O(n*m) and a non-starter at scale.

Rewrite: UNION of per-disjunct equi-joins where leg *i* additionally
requires that NO earlier disjunct matched (a residual non-equi filter
on the hash join). Every qualifying (left row, right row) pair then
matches EXACTLY ONE leg, so the union reproduces ``JOIN ... ON a OR b``
row multiplicity exactly — genuinely duplicate input rows and distinct
matches with coinciding projections are preserved, and no DISTINCT
shuffle is needed. Each leg stays hash-joinable and AQE-broadcastable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def disjunctive_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: list[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` where ANY of ``left[a] == right[b]``
    for (a, b) in ``key_pairs`` holds — as a union of equi-joins, one
    per disjunct, each excluding pairs already matched by an earlier
    disjunct (null-safe: an earlier NULL comparison counts as
    not-matched, as in SQL OR).

    Column collisions must be resolved by the caller (select/alias
    before the call). ``how`` supports 'inner' and 'left' ('left'
    keeps unmatched left rows once, like LEFT JOIN ... ON a OR b).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    legs = []
    for i, (a, b) in enumerate(key_pairs):
        cond = left[a] == right[b]
        for pa, pb in key_pairs[:i]:
            # NOT (earlier disjunct is TRUE); NULL comparisons = not matched
            cond = cond & ~F.coalesce(left[pa] == right[pb], F.lit(False))
        legs.append(left.join(right, cond, "inner"))
    matched = legs[0]
    for leg in legs[1:]:
        matched = matched.unionByName(leg)
    if how == "inner":
        return matched
    # left: add rows with no match under ANY disjunct, right columns NULL
    unmatched = left
    for a, b in key_pairs:
        unmatched = unmatched.join(right.select(right[b]), left[a] == right[b], "left_anti")
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched.select(matched.columns))
