"""Round-12 wave tests: the crawl-curation closers in
queries/webops.py — robots-style longest-prefix filtering, host
mirror detection, and host HITS. The claims under test:

1. robots_prefix_filter agrees verdict-for-verdict with an
   INDEPENDENT pure-python longest-prefix matcher (rule ladder
   re-derived from host scalars, match by plain string prefix,
   longest wins, allow on ties) — pinning semantics against a second
   implementation, not just the DuckDB oracle's mirrored SQL; and the
   ladder is non-degenerate (multiple rule depths fire, both verdicts
   present);
2. host_mirror_detect flags exactly the synthesized mirror pairs that
   clear BOTH thresholds (every flagged pair is an (X, mirror.X)
   pair; digest.example candidate pairs exist and are never flagged —
   the Jaccard computation decides, not candidacy), pair order is
   normalized, and Jaccard sits in the designed ~1/7 band;
3. host_hits equals an exact integer HITS recurrence run in pure
   python over the collected distinct edge list — bit-exact, since
   the unnormalized fixed-iteration recurrence is integer arithmetic;
4. the robots join plan carries ONE keyed exchange (the shared
   repartition(host) feeding both the rule derivation and the doc
   side — ReuseExchange) and no Python eval: the rules relation must
   never broadcast a corpus-scaled side.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _robots_rules(host: str):
    a, h = ord(host[0]), len(host)
    d, s, u = (a * 7 + h) % 10, (a + h) % 10, (a + h) % 7
    return [
        ("/", True),
        (f"/articles/{d}", False),
        (f"/articles/{d}{s}", True),
        (f"/articles/{d}{s}/~user{u}", False),
    ]


def _py_verdict(host: str, path: str):
    matched = [r for r in _robots_rules(host) if path.startswith(r[0])]
    # longest prefix wins; allow beats disallow on (impossible) ties
    return max(matched, key=lambda r: (len(r[0]), r[1]))


def test_robots_filter_matches_python_reference(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        q_robots_prefix_filter,
    )

    rows = q_robots_prefix_filter(spark, SF_DIR).collect()
    assert len(rows) == 500
    depths = set()
    verdicts = set()
    for r in rows:
        prefix, allow = _py_verdict(r["host"], r["path"])
        assert (r["rule_prefix"], r["allowed"]) == (prefix, allow), r
        depths.add(len(prefix))
        verdicts.add(allow)
    # non-degenerate: both verdicts occur and the ladder goes past the
    # '/' default on a meaningful slice
    assert verdicts == {True, False}
    assert len(depths) >= 2
    blocked = sum(1 for r in rows if not r["allowed"])
    assert 0 < blocked < 500


def test_host_mirror_flags_mirror_pairs_only(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        MIRROR_MIN_SHARED,
        MIRROR_TAU,
        q_host_mirror_detect,
    )

    rows = q_host_mirror_detect(spark, SF_DIR).collect()
    assert rows
    flagged = [r for r in rows if r["is_mirror"]]
    digest = [
        r
        for r in rows
        if "digest.example" in (r["host_a"], r["host_b"])
    ]
    assert flagged, "some mirror pairs must clear both thresholds"
    assert digest, "digest candidate pairs must exist"
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert 0 < r["jaccard"] <= 1
        assert r["is_mirror"] == (
            r["jaccard"] >= MIRROR_TAU and r["n_shared"] >= MIRROR_MIN_SHARED
        )
    for r in flagged:
        # every flagged pair is an (origin, mirror.origin) pair — the
        # aggregator host must never be flagged as a mirror
        assert (
            r["host_a"] == "mirror." + r["host_b"]
            or r["host_b"] == "mirror." + r["host_a"]
        ), r
        # designed band: a mod-7 slice of the origin, J ~ 1/7
        assert 0.08 <= r["jaccard"] <= 0.35, r
    assert not any(r["is_mirror"] for r in digest)


def test_host_hits_equals_exact_integer_recurrence(spark):
    from collections import defaultdict

    from defi_features_data_pipeline_spark.queries.webops import (
        HOST_HITS_ITERS,
        _host_edges,
        q_host_hits,
    )

    edges = {
        (r["src_host"], r["dst_host"])
        for r in _host_edges(spark, SF_DIR)
        .select("src_host", "dst_host")
        .distinct()
        .collect()
    }
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    hub = {n: 1 for n in nodes}
    auth = {}
    for _ in range(HOST_HITS_ITERS):
        auth = defaultdict(int)
        for s, d in edges:
            auth[d] += hub[s]
        auth = {n: auth.get(n, 0) for n in nodes}
        hub = defaultdict(int)
        for s, d in edges:
            hub[s] += auth[d]
        hub = {n: hub.get(n, 0) for n in nodes}
    got = {
        r["host"]: (r["auth_score"], r["hub_score"])
        for r in q_host_hits(spark, SF_DIR).collect()
    }
    assert set(got) == nodes
    for n in nodes:
        # integer scores, exactly representable (< 2^53) — exact match
        assert got[n] == (float(auth[n]), float(hub[n])), n
    # non-degenerate authority signal: real spread across hosts
    vals = sorted(a for a, _ in got.values())
    assert vals[0] >= 0 and vals[-1] > 0 and vals[-1] >= 2 * max(vals[0], 1)


def test_robots_plan_one_keyed_exchange_no_broadcast_rules(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        q_robots_prefix_filter,
    )

    from defi_features_data_pipeline_spark.plans.inspect import (
        corpus_broadcast_violations,
    )

    df = q_robots_prefix_filter(spark, SF_DIR)
    df.collect()  # AQE stage reuse is decided at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the one big exchange partitions by the null-safe join's derived
    # hash keys, so the doc side needs no second shuffle and AQE
    # reuses the exchange for the rules branch — the canonicalization
    # chain runs ONCE. No ESTIMATE-fed broadcast of a corpus-scaled
    # side (AQE's runtime SMJ→BHJ conversion on ACTUAL small sizes is
    # allowed, per the sweep's discipline — at crawl scale the rules
    # relation is host-cardinality and stays a shuffle join).
    assert "ReusedExchange" in plan, plan
    assert not corpus_broadcast_violations(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
