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

# Bounded-build exception — a nested-loop node whose build side is
# small BY CONSTRUCTION, so the "quadratic" cost is k*N with k fixed:
#   knn_cosine_topk        broadcast side is <=10 query vectors; the
#                          10*N score evaluations ARE the brute-force
#                          baseline's work (the scale path is
#                          ann_ivf_topk / knn_cosine_topk_vectorized)
# Scalar attaches (global aggregate -> every row) must NOT appear here:
# they are expressed as DataFrame.scalar() subqueries, which plan as a
# Subquery literal, not a join.
#   hybrid_search_rrf      dense leg broadcasts ONE query vector (1*N
#                          scores — the exact-cosine baseline by
#                          construction; the scale path swaps in
#                          ann_ivf_* for that leg, fusion unchanged)
ALLOWED_BOUNDED = {"knn_cosine_topk", "hybrid_search_rrf"}

# Deliberately-quadratic recall baselines: excluded from the sweep
# because their all-pairs shape is the point — and they are fenced by a
# runtime row-count circuit breaker (test below) so the quadratic plan
# cannot be launched at scale by accident. Their 100 TB twins
# (dedup_lsh_verified / dedup_embedding_blocked) ARE swept.
EXACT_BASELINES = {"dedup_ngram_jaccard", "dedup_embedding_cosine"}


@pytest.mark.parametrize(
    "name", sorted(set(ALL_QUERIES) - ALLOWED_BOUNDED - EXACT_BASELINES)
)
def test_no_quadratic_join_shapes(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for banned in BANNED:
        assert banned not in plan, f"{name}: {banned} in physical plan"


@pytest.mark.parametrize("name,twin", [
    ("dedup_ngram_jaccard", "dedup_lsh_verified"),
    ("dedup_embedding_cosine", "dedup_embedding_blocked"),
])
def test_exact_baselines_guarded_at_scale(spark, sf_dir, name, twin, monkeypatch):
    """The two quadratic baselines refuse inputs above the circuit
    breaker and point at their scale twin."""
    monkeypatch.setenv("SPARK_GRAFT_EXACT_BASELINE_MAX_ROWS", "10")
    with pytest.raises(ValueError, match=twin):
        ALL_QUERIES[name](spark, sf_dir)
