"""Plan-regression sweeps: EVERY gated query's physical plan is checked
for the shapes that kill a 100 TB run outright.

Sweep 1 (sf0.001): CartesianProduct (O(n*m) pairs materialized) and
BroadcastNestedLoopJoin (O(n*m) comparisons, plus an unbounded
broadcast). Individual plan tests in test_plans.py assert what the hot
queries SHOULD look like; this sweep asserts what no query may EVER
look like, so a future edit that trips Catalyst into a nested loop
(e.g. an OR join condition, a non-equi predicate left as the only join
condition) fails CI instead of failing at the cluster.

Sweep 2 (sf0.1, r8): no BroadcastExchange may cover an UNBOUNDED
corpus-table subtree — the structural form of the r7 sf10-probe lesson
(estimate-dependent broadcasts of corpus-scaled frames). See the
section comment below.

Plans are built without executing; the only execution is the handful
of queries that drive iterative/driver-side logic while composing
their result.
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


# ---------------------------------------------------------------------------
# Corpus-broadcast sweep — the sf10 lesson as a standing structural ban
# ---------------------------------------------------------------------------
#
# Both r7 sf10-probe failures shared one mechanism: a corpus-derived
# frame whose size ESTIMATE (compressed bytes × pruning/aggregate
# ratios) sat under the broadcast threshold, so the planner built a
# hashed relation of something that is executor-memory-scale at 100 TB.
# Two layers enforce the fix:
#   1. session policy (session.py): spark.sql.autoBroadcastJoinThreshold
#      = -1 — static, estimate-fed broadcasts are OFF; AQE's RUNTIME
#      conversion (actual stage sizes) and explicit broadcast() remain.
#   2. this sweep: every gated query's plan is composed at the sweep SF
#      with AQE off and audited — no BroadcastExchange may cover a
#      corpus-table scan (documents/embeddings/lineitem/orders/events)
#      without a structural bound (limit / global or bounded-domain-key
#      aggregate / left-semi reduction) on the path
#      (plans/inspect.py::corpus_broadcast_violations).
#
# BOUNDED_BROADCAST_OK: explicit broadcast()s whose build side is
# bounded BY CONSTRUCTION in a way the plan walker cannot prove.
# Every entry must say WHY the frame cannot scale with the corpus.

import os

from defi_features_data_pipeline_spark.plans.inspect import (
    corpus_broadcast_violations,
)

SWEEP_SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.1")

BOUNDED_BROADCAST_OK = {
    "knn_cosine_topk": "build side is the <=10 query vectors (vec_id < 10)",
    "hybrid_search_rrf": "dense leg broadcasts ONE query vector (vec_id = 0)",
    "ann_ivf_topk": "query vector + nprobe probe-list rows (k-bounded index)",
    "ann_ivf_multiprobe": "query vector + k-bounded multiprobe list",
    "ann_ivf_soft_topk": "query vector + k-bounded probe list (soft replica)",
    "ann_ivf_quantized": "query vector + k-bounded probe list",
    "ann_pq_adc": "per-query ADC LUT: m subspaces x 256 codes rows",
    "ann_pq_rescore": "ADC LUT + top-N shortlist ids (window-rank bounded)",
    "decontaminate_overlap": (
        "benchmark shingle set (doc_id < 5 stand-in): a test SUITE, "
        "fixed size by definition, never corpus-scaled"
    ),
    "heavy_hitters_mg": (
        "Misra-Gries candidate set: <= ceil(1/phi)+1 keys by the "
        "sketch's capacity bound (operators/sketches.py)"
    ),
    "pareto_frontier": (
        "per-day prior-max map: one row per calendar day — bounded by "
        "the calendar, not the data (skyline_2d docstring)"
    ),
    "exact_median_twopass": (
        "per-(event_type, bucket) stats: |event-type enum| x 1024 "
        "histogram buckets, both domains fixed by construction"
    ),
}


@pytest.mark.parametrize(
    "name",
    sorted(set(ALL_QUERIES) - set(BOUNDED_BROADCAST_OK) - EXACT_BASELINES),
)
def test_no_unbounded_corpus_broadcast(spark, name):
    """No gated query may put an unbounded corpus-table subtree under a
    BroadcastExchange — composed at sf0.1 with AQE off so every static
    broadcast decision is an explicit, walkable exchange node."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        df = ALL_QUERIES[name](spark, SWEEP_SF_DIR)
        bad = corpus_broadcast_violations(df)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert not bad, (
        f"{name}: corpus-scaled subtree under BroadcastExchange "
        f"(estimate-dependent broadcast): {bad}"
    )


def test_session_policy_disables_estimate_broadcasts(spark):
    """The session must keep static (estimate-fed) broadcasts off and
    runtime (actual-size-fed) conversion on — the policy layer the
    sweep above assumes."""
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert (
        int(spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
        > 0
    )


def test_sweep_flags_semijoin_laundered_broadcast(spark, sf_dir):
    """Detector power for the LeftSemi blind spot: a semi join only
    BOUNDS its output when the filtering (right) side is itself
    bounded. A corpus frame semi-joined against a corpus-DERIVED key
    set (a frequent-item table) is still corpus-scaled — broadcasting
    it above the semi must be flagged; the same shape against a
    LIMIT-bounded key set keeps the pre-existing bounded-reduction
    contract and stays clean."""
    from pyspark.sql import functions as F

    from defi_features_data_pipeline_spark.queries.extensions import _t

    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        freq = (
            li.groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
        )
        semi = li.join(freq, "l_partkey", "left_semi").select(
            F.col("l_orderkey").alias("ok")
        )
        probe = _t(spark, sf_dir, "orders").select("o_orderkey")
        laundered = probe.join(
            F.broadcast(semi), F.col("o_orderkey") == F.col("ok")
        )
        assert corpus_broadcast_violations(laundered), (
            "corpus-scaled semi-join output under BroadcastExchange "
            "not flagged — the LeftSemi blind spot is back"
        )
        semi_bounded = li.join(
            freq.limit(10), "l_partkey", "left_semi"
        ).select(F.col("l_orderkey").alias("ok"))
        clean = probe.join(
            F.broadcast(semi_bounded), F.col("o_orderkey") == F.col("ok")
        )
        assert not corpus_broadcast_violations(clean)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_sweep_flags_reverted_token_rarity_shape(spark, sf_dir):
    """Detector power: rebuilding the PRE-FIX token_rarity_score shape
    (git e1c99c2^ — corpus-scaled vocabulary aggregate with no join
    pin) under a restored 10 MB estimate threshold MUST produce a
    violation, and the shipped query under the same threshold must
    stay clean — proving the sweep would have caught the sf10 failure
    before the probe did."""
    from pyspark.sql import functions as F

    from defi_features_data_pipeline_spark.queries.extensions import (
        TOKENS_SPARK,
        _spread,
        _t,
    )

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        d = _spread(spark, _t(spark, sf_dir, "documents"))
        toks = (
            d.withColumn("__toks", F.expr(TOKENS_SPARK))
            .select("doc_id", F.explode_outer("__toks").alias("t"))
            .filter(F.col("t").isNotNull())
        )
        freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
        prefix = toks.join(freq, "t").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_tokens")
        )
        assert corpus_broadcast_violations(prefix), (
            "pre-fix shape not flagged — the sweep lost its detection power"
        )
        fixed = ALL_QUERIES["token_rarity_score"](spark, sf_dir)
        assert not corpus_broadcast_violations(fixed)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
