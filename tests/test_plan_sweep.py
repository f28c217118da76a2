"""Plan-regression sweep: EVERY gated query's physical plan is checked
for the two shapes that kill a 100 TB run outright — CartesianProduct
(O(n*m) pairs materialized) and BroadcastNestedLoopJoin (O(n*m)
comparisons, plus an unbounded broadcast). Individual plan tests in
test_plans.py assert what the hot queries SHOULD look like; this sweep
asserts what no query may EVER look like, so a future edit that trips
Catalyst into a nested loop (e.g. an OR join condition, a non-equi
predicate left as the only join condition) fails CI instead of failing
at the cluster.

Plans are built at sf0.001 — planning only; nothing is executed except
the handful of queries that drive iterative/driver-side logic while
composing their result.
"""

from __future__ import annotations

import pytest

from defi_features_data_pipeline_spark.queries import ALL_QUERIES

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Bounded-build exceptions — a nested-loop node whose build side is
# small BY CONSTRUCTION, so the "quadratic" cost is k*N with k fixed:
#   knn_cosine_topk        broadcast side is <=10 query vectors; the
#                          10*N score evaluations ARE the brute-force
#                          baseline's work (the scale path is
#                          ann_ivf_topk / knn_cosine_topk_vectorized)
#   dedup_embedding_cosine documented exact all-pairs BASELINE (non-equi
#                          id_a < id_b); the 100 TB path is
#                          dedup_embedding_blocked / dedup_minhash_lsh
# Scalar attaches (global aggregate -> every row) must NOT appear here:
# they are expressed as DataFrame.scalar() subqueries, which plan as a
# Subquery literal, not a join.
ALLOWED_BOUNDED = {"knn_cosine_topk", "dedup_embedding_cosine"}


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - ALLOWED_BOUNDED))
def test_no_quadratic_join_shapes(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for banned in BANNED:
        assert banned not in plan, f"{name}: {banned} in physical plan"
