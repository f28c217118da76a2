"""Round-11 wave tests: the URL/host canonicalization family
(queries/webops.py). The claims under test:

1. the column-expression canonicalizer agrees byte-for-byte with an
   INDEPENDENT pure-python reference (re + manual RFC 3986 §6.2
   normalization) on every synthesized URL — pinning semantics against
   a second implementation, not just the DuckDB oracle's mirrored SQL;
2. canonicalization is IDEMPOTENT (canon(canon(u)) == canon(u));
3. the three messy variants of every doc collapse to exactly one
   canonical URL (n_raw == 3 x n_docs on every dedup row);
4. canonical URLs are clean: no fragment, no tracking params, no
   default ports, no lowercase hex, no www. prefix, no trailing slash;
5. the host filter partitions docs exactly by their domain's keep
   flag, and both keep classes exist;
6. the canonicalize gate is MAP-ONLY (no Exchange in the plan) — at
   100 TB it must fuse into the scan.
"""

import re
import string

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_UNRESERVED = set(string.ascii_letters + string.digits + "-._~")
_TRACKING = ("utm_", "gclid=", "fbclid=", "msclkid=", "igshid=")
_SUFFIX2 = {"co.uk", "org.uk", "com.au", "co.jp"}


def _py_canon(url: str) -> tuple[str, str, str]:
    """Independent reference: (canon_url, host, registrable_domain)."""
    url = url.split("#", 1)[0]
    scheme, rest = url.split("://", 1)
    scheme = scheme.lower()
    slash = rest.find("/")
    auth, pathq = (rest, "") if slash < 0 else (rest[:slash], rest[slash:])
    auth = auth.lower()
    host, _, port = auth.partition(":")
    if host.startswith("www."):
        host = host[4:]
    if port == "" or (scheme, port) in (("http", "80"), ("https", "443")):
        portc = ""
    else:
        portc = ":" + port
    qpos = pathq.find("?")
    path, query = (pathq, "") if qpos < 0 else (pathq[:qpos], pathq[qpos + 1 :])

    def pct(m):
        h = m.group(1).upper()
        c = chr(int(h, 16))
        return c if c in _UNRESERVED else "%" + h

    path = re.sub(r"%([0-9A-Fa-f]{2})", pct, path)
    if path == "":
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    params = sorted(
        p for p in query.split("&") if p and not p.startswith(_TRACKING)
    )
    qc = "?" + "&".join(params) if params else ""
    labels = host.split(".")
    if len(labels) <= 1:
        reg = host
    elif len(labels) >= 3 and ".".join(labels[-2:]) in _SUFFIX2:
        reg = ".".join(labels[-3:])
    else:
        reg = ".".join(labels[-2:])
    return scheme + "://" + host + portc + path + qc, host, reg


def test_canonicalizer_matches_python_reference(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        q_url_canonicalize,
    )

    rows = q_url_canonicalize(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        canon, host, reg = _py_canon(r["url"])
        assert r["canon_url"] == canon, (r["url"], r["canon_url"], canon)
        assert r["host"] == host
        assert r["registrable_domain"] == reg


def test_canonicalization_is_idempotent(spark):
    """Running the canonicalizer ON its own output must be a no-op —
    the fixed-point property that makes canonical URLs safe as stable
    dedup keys across pipeline re-runs."""
    from defi_features_data_pipeline_spark.queries.webops import (
        q_url_canonicalize,
        with_canonical_url,
    )

    # materialize pass 1 (500 rows) so pass 2's expression tree does
    # not nest the whole canonicalizer inside itself — the composed
    # plan is quadratic in codegen size and overflows the janino limit
    once_rows = (
        q_url_canonicalize(spark, SF_DIR)
        .select("doc_id", F.col("canon_url").alias("url"))
        .collect()
    )
    once = spark.createDataFrame(once_rows)
    twice = with_canonical_url(once).select("doc_id", "url", "canon_url")
    bad = twice.filter(F.col("canon_url") != F.col("url")).collect()
    assert bad == [], bad[:5]


def test_variants_collapse_to_one_canonical(spark):
    """Every doc's 3 differently-messy URLs share one canonical form:
    each dedup group holds exactly 3 raw URLs per member doc, and the
    groups partition the full doc set."""
    from defi_features_data_pipeline_spark.queries.webops import (
        q_url_dedup_canonical,
    )

    rows = q_url_dedup_canonical(spark, SF_DIR).collect()
    assert all(r["n_raw"] == 3 * r["n_docs"] for r in rows)
    assert sum(r["n_docs"] for r in rows) == 500
    # the mess is real: within a group the raw variants differ
    assert all(r["min_url"] != "" for r in rows)


def test_canonical_urls_are_clean(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        q_url_canonicalize,
    )

    rows = q_url_canonicalize(spark, SF_DIR).collect()
    saw_kept_port = saw_query = saw_encoded_slash = False
    for r in rows:
        u = r["canon_url"]
        assert "#" not in u
        assert "utm_" not in u and "gclid" not in u
        assert "fbclid" not in u and "msclkid" not in u
        assert ":80/" not in u and ":443/" not in u
        assert "%7e" not in u and "%7E" not in u and "%2f" not in u
        assert not u.endswith("/")
        scheme, rest = u.split("://", 1)
        assert scheme in ("http", "https")
        assert not rest.startswith("www.")
        authority = rest.split("/", 1)[0]
        assert authority == authority.lower()  # host is lowercased
        # uppercase elsewhere is only the canonical %XX hex
        assert re.sub(r"%[0-9A-F]{2}", "", rest) == re.sub(
            r"%[0-9A-F]{2}", "", rest
        ).lower() or "?" in u
        saw_kept_port |= ":8080" in u
        saw_query |= "?" in u
        saw_encoded_slash |= "%2F" in u
    # the corpus exercises the keep-branches too, not just the strips
    assert saw_kept_port and saw_query and saw_encoded_slash


def test_host_filter_partitions_by_keep_flag(spark):
    from defi_features_data_pipeline_spark.queries.webops import (
        q_host_filtered_docs,
        q_host_reputation_rollup,
        q_url_canonicalize,
    )

    rollup = {
        r["registrable_domain"]: r["keep"]
        for r in q_host_reputation_rollup(spark, SF_DIR).collect()
    }
    assert any(rollup.values()) and not all(rollup.values())
    kept_docs = {
        r["doc_id"] for r in q_host_filtered_docs(spark, SF_DIR).collect()
    }
    expected = {
        r["doc_id"]
        for r in q_url_canonicalize(spark, SF_DIR).collect()
        if rollup[r["registrable_domain"]]
    }
    assert kept_docs == expected and 0 < len(kept_docs) < 500


def test_url_canonicalize_is_map_only(spark):
    """The canonicalizer must fuse into the scan: no Exchange, no UDF
    — pure WholeStageCodegen column arithmetic."""
    from defi_features_data_pipeline_spark.queries.webops import (
        q_url_canonicalize,
    )

    plan = (
        q_url_canonicalize(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # _spread's RoundRobin re-parallelization of the 1-split test file
    # is allowed (a no-op on a multi-split 100 TB scan); any KEYED
    # exchange would mean the operator itself shuffles — it must not
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_url_dedup_equals_batch_and_state_bounded(spark):
    """The stream twin's verdicts equal the batch first-arrival
    semantics row-for-row (proven by the shared oracle; pinned here
    cross-gate too), every doc keeps exactly one non-dup arrival, and
    the per-batch appended state is the COLLAPSED canonical ledger —
    at most 1/3 of the batch's arrivals, the reason ingest-time
    canonical dedup state survives crawl scale."""
    from collections import defaultdict

    from defi_features_data_pipeline_spark.queries.extensions import (
        STREAM_STATE_METRICS,
    )
    from defi_features_data_pipeline_spark.queries.webops import (
        q_streaming_url_dedup,
    )

    rows = q_streaming_url_dedup(spark, SF_DIR).collect()
    assert len(rows) == 3 * 500
    per_doc = defaultdict(int)
    for r in rows:
        per_doc[r["doc_id"]] += 0 if r["is_dup"] else 1
    # exactly one keeper per doc (the doc's first-arriving variant)
    assert set(per_doc.values()) == {1} and len(per_doc) == 500
    metrics = STREAM_STATE_METRICS.get("streaming_url_dedup") or []
    assert len(metrics) >= 2, "expected multiple micro-batches"
    for m in metrics:
        assert 0 < m["state_rows_appended"] <= m["arrivals"] / 3 + 1
