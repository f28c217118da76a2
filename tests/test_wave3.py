"""Independent ALGORITHMIC references for the round-8 wave-3 operators
(label propagation, personalized PageRank, NDCG): the oracle gates
prove cross-engine determinism; these tests prove the algorithm — a
pure-Python implementation on the same inputs must agree (the lesson
from embedding_pca_power, where a hash-matching trajectory was still
numerically wrong until the numpy reference caught it)."""

import math
import os
from collections import Counter, defaultdict

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _edges():
    """Verified near-dup edge list from the artifact store (its build
    is oracle-gated by dedup_lsh_verified; these tests check the
    ITERATION logic on top of it)."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        lsh_edges_dir,
    )

    path = os.path.join(lsh_edges_dir(SF_DIR), "edges")
    if not os.path.isdir(path):
        pytest.skip("lsh_edges artifact not built for sf0.001")
    rows = duckdb.sql(
        f"SELECT doc_a, doc_b FROM read_parquet('{path}/*.parquet')"
    ).fetchall()
    sym = set()
    for a, b in rows:
        sym.add((a, b))
        sym.add((b, a))
    return sorted(sym)


def test_label_propagation_python_reference(spark):
    from defi_features_data_pipeline_spark.queries.extensions import (
        LPA_ROUNDS,
        q_label_propagation,
    )

    ed = _edges()
    nbrs = defaultdict(list)
    for s, d in ed:
        nbrs[d].append(s)
    lab = {n: n for n in nbrs}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n, ins in nbrs.items():
            cnt = Counter(lab[s] for s in ins)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    got = {
        r["doc_id"]: r["community"]
        for r in q_label_propagation(spark, SF_DIR).collect()
    }
    assert got == lab


def test_personalized_pagerank_python_reference(spark):
    from defi_features_data_pipeline_spark.queries.extensions import (
        BFS_SEED_MOD,
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        q_personalized_pagerank,
    )

    ed = _edges()
    out = defaultdict(list)
    deg = Counter(s for s, _ in ed)
    for s, d in ed:
        out[s].append(d)
    nodes = sorted(deg)
    seeds = [n for n in nodes if n % BFS_SEED_MOD == 0]
    if not seeds:
        pytest.skip("no seeds in the sf0.001 dup graph")
    tele = {
        n: ((1.0 - PAGERANK_DAMPING) / len(seeds) if n % BFS_SEED_MOD == 0 else 0.0)
        for n in nodes
    }
    r = dict(tele)
    for _ in range(PAGERANK_ITERS):
        acc = defaultdict(float)
        for s in nodes:
            c = r[s] / deg[s]
            for d in out[s]:
                acc[d] += c
        r = {n: tele[n] + PAGERANK_DAMPING * acc.get(n, 0.0) for n in nodes}
    got = {
        row["doc_id"]: row["ppr"]
        for row in q_personalized_pagerank(spark, SF_DIR).collect()
    }
    assert set(got) == set(nodes)
    for n in nodes:
        # the gate rounds to 8 dp (half the last digit = 5e-9) and the
        # python reference accumulates floats in a different order
        assert got[n] == pytest.approx(r[n], abs=6e-9), n


def test_retrieval_ndcg_python_reference(spark):
    from defi_features_data_pipeline_spark.queries.extensions import (
        BM25_QUERY_TERMS,
        NDCG_K,
        q_bm25_search,
        q_retrieval_ndcg,
    )

    ranked = [
        (r["doc_id"], r["bm25"])
        for r in q_bm25_search(spark, SF_DIR).collect()
    ]
    ranked.sort(key=lambda t: (-t[1], t[0]))
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    )
    def rel(doc_id):
        toks = set(docs[doc_id].lower().split())
        return sum(1 for t in BM25_QUERY_TERMS if t in toks)

    rels = [(doc_id, rel(doc_id)) for doc_id, _ in ranked]
    dcg = sum(
        round((2.0 ** rl - 1.0) / math.log2(rank + 1), 10)
        for rank, (_, rl) in enumerate(rels, start=1)
        if rank <= NDCG_K
    )
    ideal = sorted(rels, key=lambda t: (-t[1], t[0]))
    idcg = sum(
        round((2.0 ** rl - 1.0) / math.log2(rank + 1), 10)
        for rank, (_, rl) in enumerate(ideal, start=1)
        if rank <= NDCG_K
    )
    row = q_retrieval_ndcg(spark, SF_DIR).collect()[0]
    assert row["dcg_10"] == pytest.approx(dcg, abs=1e-6)
    assert row["idcg_10"] == pytest.approx(idcg, abs=1e-6)
    assert row["ndcg_10"] == pytest.approx(dcg / idcg, abs=1e-6)
    assert 0.0 < row["ndcg_10"] <= 1.0


def test_epoch_reshuffle_decorrelated(spark):
    """Epoch orders must be statistically independent: the Spearman
    rank correlation between epoch-0 and epoch-1 in-shard positions
    should be near zero (|rho| << 1), and shard assignment must be
    IDENTICAL across epochs (files never rewrite)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_epoch_reshuffle_manifest,
    )

    rows = q_epoch_reshuffle_manifest(spark, SF_DIR).collect()
    by_epoch = defaultdict(dict)
    shard_of = defaultdict(dict)
    for r in rows:
        by_epoch[r["epoch"]][r["doc_id"]] = r["pos"]
        shard_of[r["epoch"]][r["doc_id"]] = r["shard"]
    assert shard_of[0] == shard_of[1], "shard assignment must be epoch-stable"
    docs = sorted(by_epoch[0])
    p0 = [by_epoch[0][d] for d in docs]
    p1 = [by_epoch[1][d] for d in docs]
    n = len(docs)
    m0, m1 = sum(p0) / n, sum(p1) / n
    cov = sum((a - m0) * (b - m1) for a, b in zip(p0, p1))
    v0 = sum((a - m0) ** 2 for a in p0)
    v1 = sum((b - m1) ** 2 for b in p1)
    rho = cov / math.sqrt(v0 * v1)
    assert abs(rho) < 0.2, f"epoch orders correlated: rho={rho}"
