"""Independent references for the round-8 wave-8 operators (DBSCAN over
the blocked epsilon graph, naive-Bayes lang-id, Brier score,
consistent-hash rebalance audit). The oracle gates prove cross-engine
determinism; these re-derive each result with a pure-Python
implementation of the ALGORITHM (BFS DBSCAN, dict-counting NB, hashlib
ring walk) — the PCA lesson: a hash match proves both engines agree,
not that the agreed answer is the right algorithm."""

import hashlib
import math
from collections import defaultdict

import duckdb

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dbscan_clusters_blocked
# ---------------------------------------------------------------------------


def _blocked_eps_pairs():
    from defi_features_data_pipeline_spark.queries.extensions import (
        DBSCAN_EPS,
        ivf_artifact_dir,
    )

    asg = ivf_artifact_dir(SF_DIR) + "/assignments/*.parquet"
    return duckdb.sql(
        f"""WITH a AS (SELECT * FROM read_parquet('{asg}')),
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
              FROM read_parquet('{SF_DIR}/embeddings.parquet'))
        SELECT x.vec_id, y.vec_id FROM e x
        JOIN a ax ON ax.vec_id = x.vec_id
        JOIN a ay ON ay.cid = ax.cid
        JOIN e y ON y.vec_id = ay.vec_id AND y.vec_id <> x.vec_id
        WHERE round(list_cosine_similarity(x.v, y.v), 6) >= {DBSCAN_EPS}"""
    ).fetchall()


def test_dbscan_matches_python_bfs_reference(spark):
    """Role assignment and cluster labels equal a textbook DBSCAN run
    (BFS over core points, border = min adjacent core label, noise
    otherwise) on the same blocked epsilon graph."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        DBSCAN_MINPTS,
        q_dbscan_clusters_blocked,
    )

    adj = defaultdict(set)
    for a, b in _blocked_eps_pairs():
        adj[a].add(b)
    core = {n for n, nb in adj.items() if len(nb) >= DBSCAN_MINPTS}
    # components over core-core edges (BFS), label = min node id
    label = {}
    for start in sorted(core):
        if start in label:
            continue
        comp, queue = {start}, [start]
        while queue:
            n = queue.pop()
            for m in adj[n]:
                if m in core and m not in comp:
                    comp.add(m)
                    queue.append(m)
        lab = min(comp)
        for n in comp:
            label[n] = lab
    rows = q_dbscan_clusters_blocked(spark, SF_DIR).collect()
    n_emb = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_emb
    for r in rows:
        v = r["vec_id"]
        assert r["eps_degree"] == len(adj.get(v, ()))
        if v in core:
            assert (r["role"], r["cluster_id"]) == ("core", label[v])
        else:
            core_nb = {label[m] for m in adj.get(v, ()) if m in core}
            if core_nb:
                assert (r["role"], r["cluster_id"]) == ("border", min(core_nb))
            else:
                assert (r["role"], r["cluster_id"]) == ("noise", -1)


def test_dbscan_has_all_three_roles(spark):
    """The chosen (eps, minpts) must exercise every branch on the
    corpus — a parameterization where everything is noise (or
    everything core) would make the gate vacuous."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        q_dbscan_clusters_blocked,
    )

    roles = {
        r["role"] for r in q_dbscan_clusters_blocked(spark, SF_DIR).collect()
    }
    assert roles == {"core", "border", "noise"}


def test_dbscan_labels_artifact_freshness(spark, tmp_path, monkeypatch):
    """The DBSCAN label cache (r9): warm loads serve the artifact with
    ZERO recomputation; a poisoned corpus fingerprint OR a changed
    (eps, minpts) parameterization forces a rebuild — parameters are
    part of the meta identity, so a tuning change can never serve the
    previous tuning's labels. Runs against a TEMP COPY of the artifact
    root (the lsh_cc lesson: in-place rebuilds dirty the committed
    cache)."""
    import os
    import shutil

    import defi_features_data_pipeline_spark.queries.extensions as X

    key = os.path.normpath(SF_DIR)
    want = {
        (r["vec_id"], r["role"], r["cluster_id"])
        for r in X._dbscan_labels(spark, SF_DIR).collect()
    }
    tmp_root = str(tmp_path / "dbscan_labels")
    shutil.copytree(X.DBSCAN_LABELS_ROOT, tmp_root)
    monkeypatch.setattr(X, "DBSCAN_LABELS_ROOT", tmp_root)
    X._DBSCAN_LABELS_CACHE.pop(key, None)

    # warm load must not recompute: break the compute path and load
    def boom(*a, **k):
        raise AssertionError("warm load recomputed the epsilon graph")

    monkeypatch.setattr(X, "_dbscan_compute", boom)
    got = {
        (r["vec_id"], r["role"], r["cluster_id"])
        for r in X._dbscan_labels(spark, SF_DIR).collect()
    }
    assert got == want
    monkeypatch.undo()
    monkeypatch.setattr(X, "DBSCAN_LABELS_ROOT", tmp_root)

    # poisoned meta (wrong fingerprint) forces a rebuild to freshness
    mpath = os.path.join(tmp_root, X._artifact_subdir(SF_DIR), "meta")
    spark.createDataFrame(
        [(999999, 1, 1, int(round(X.DBSCAN_EPS * 1e6)), X.DBSCAN_MINPTS)],
        "n bigint, s bigint, c bigint, eps_ppm bigint, minpts bigint",
    ).coalesce(1).write.mode("overwrite").parquet(mpath)
    X._DBSCAN_LABELS_CACHE.pop(key, None)
    rebuilt = {
        (r["vec_id"], r["role"], r["cluster_id"])
        for r in X._dbscan_labels(spark, SF_DIR).collect()
    }
    assert rebuilt == want
    m = spark.read.parquet(mpath).first()
    n, s, c = X._emb_fingerprint(spark, SF_DIR)
    assert (m["n"], m["s"], m["c"]) == (n, s, c)

    # a parameter change alone (same corpus) also invalidates
    new_minpts = X.DBSCAN_MINPTS + 1
    monkeypatch.setattr(X, "DBSCAN_MINPTS", new_minpts)
    X._DBSCAN_LABELS_CACHE.pop(key, None)
    stricter = X._dbscan_labels(spark, SF_DIR)
    n_core_strict = stricter.filter("role = 'core'").count()
    n_core = len([1 for _, role, _ in want if role == "core"])
    assert n_core_strict <= n_core  # stricter minpts can only shrink cores
    m = spark.read.parquet(mpath).first()
    assert int(m["minpts"]) == new_minpts  # meta re-pinned to new params
    X._DBSCAN_LABELS_CACHE.pop(key, None)


# ---------------------------------------------------------------------------
# naive_bayes_langid
# ---------------------------------------------------------------------------


def test_naive_bayes_matches_dict_counting_reference(spark):
    """Predictions equal a pure-Python multinomial NB (add-one
    smoothing, log-prior, lang-ascending tie-break), and the model
    beats the majority-class baseline."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_naive_bayes_langid,
    )

    docs = duckdb.sql(
        f"""SELECT doc_id, lang,
            list_filter(string_split_regex(lower(text), '\\s+'),
                        t -> t <> '') AS toks
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE len(list_filter(string_split_regex(lower(text), '\\s+'),
                                  t -> t <> '')) > 0"""
    ).fetchall()
    cnt = defaultdict(lambda: defaultdict(int))
    n_tok, n_docs = defaultdict(int), defaultdict(int)
    vocab = set()
    for _, lang, toks in docs:
        n_docs[lang] += 1
        for t in toks:
            cnt[lang][t] += 1
            n_tok[lang] += 1
            vocab.add(t)
    v, n = len(vocab), len(docs)
    preds = {}
    for doc_id, _, toks in docs:
        best = None
        for lang in sorted(n_docs):
            s = round(math.log(n_docs[lang] / n), 10)
            for t in toks:
                s += round(
                    math.log((cnt[lang].get(t, 0) + 1) / (n_tok[lang] + v)),
                    10,
                )
            s = round(s, 10)  # mirror the decimal(38,10) accumulation
            if best is None or s > best[0] + 1e-9:
                best = (s, lang)
        preds[doc_id] = best[1]
    rows = q_naive_bayes_langid(spark, SF_DIR).collect()
    assert len(rows) == len(docs)
    agree = sum(1 for r in rows if preds[r["doc_id"]] == r["lang_pred"])
    # float-vs-decimal accumulation may flip a genuine near-tie; the
    # reference must agree on essentially every doc
    assert agree >= len(rows) - 1, f"{len(rows) - agree} reference diffs"
    acc = sum(r["is_correct"] for r in rows) / len(rows)
    majority = max(n_docs.values()) / n
    assert acc > majority, "NB must beat the majority-class baseline"


# ---------------------------------------------------------------------------
# brier_score
# ---------------------------------------------------------------------------


def test_brier_matches_per_row_recount(spark):
    """brier_num equals the Python Σ(ppm − 10⁶y)², the double fields
    re-derive from it, and the skill score is consistent with the
    base-rate uncertainty."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        _qc_features,
        _qc_ppm_col,
        _qc_train,
        q_brier_score,
    )

    w, _ = _qc_train(spark, SF_DIR)
    scored = (
        _qc_features(spark, SF_DIR)
        .select(_qc_ppm_col(w).alias("ppm"), "y")
        .collect()
    )
    num = sum((r["ppm"] - 1_000_000 * r["y"]) ** 2 for r in scored)
    got = q_brier_score(spark, SF_DIR).collect()[0]
    assert int(got["brier_num"]) == num
    assert got["n"] == len(scored)
    assert abs(got["brier"] - num / (len(scored) * 1e12)) < 1e-15
    ybar = got["n_pos"] / got["n"]
    assert abs(got["uncertainty"] - ybar * (1 - ybar)) < 1e-15
    assert 0.0 <= got["brier"] <= 1.0
    assert abs(got["brier_skill"] - (1 - got["brier"] / got["uncertainty"])) < 1e-12
    assert got["brier_skill"] > 0, "trained model must beat the base rate"


# ---------------------------------------------------------------------------
# shard_rebalance_audit
# ---------------------------------------------------------------------------


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_shard_rebalance_matches_hashlib_reference(spark):
    """Exact recount of both strategies with hashlib, and the audit's
    whole point: the ring moves a small fraction (< new/old share +
    slack) while mod-N moves nearly everything."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        SHARDS_NEW,
        SHARDS_OLD,
        _ring_positions,
        q_shard_rebalance_audit,
    )

    doc_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    rings = {n: _ring_positions(n) for n in (SHARDS_OLD, SHARDS_NEW)}

    def ring_owner(h, n):
        for pos, shard in rings[n]:
            if pos >= h:
                return shard
        return rings[n][0][1]

    mod_moved = ring_moved = 0
    for d in doc_ids:
        h = _h32(f"ring:{d}")
        mod_moved += (h % SHARDS_OLD) != (h % SHARDS_NEW)
        ring_moved += ring_owner(h, SHARDS_OLD) != ring_owner(h, SHARDS_NEW)
    rows = {r["strategy"]: r for r in q_shard_rebalance_audit(spark, SF_DIR).collect()}
    assert rows["mod"]["n_moved"] == mod_moved
    assert rows["ring"]["n_moved"] == ring_moved
    for r in rows.values():
        assert r["n_docs"] == len(doc_ids)
        assert r["moved_ppm"] == r["n_moved"] * 1_000_000 // r["n_docs"]
    # the audit's conclusion must hold on the corpus
    assert rows["ring"]["moved_ppm"] < rows["mod"]["moved_ppm"]


def test_ring_positions_are_plan_time_literals(spark):
    """Ring points derive from md5 of the shard index alone — stable
    across corpora and processes (a data-dependent ring would make the
    'only the claimed arcs move' guarantee meaningless)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        _ring_positions,
    )

    pts = _ring_positions(16)
    assert pts == sorted(pts)
    assert len({p for p, _ in pts}) == 16
    assert {s for _, s in pts} == set(range(16))
    assert pts == _ring_positions(16)


# ---------------------------------------------------------------------------
# mmr_diverse_rerank (wave 9)
# ---------------------------------------------------------------------------


def test_mmr_matches_greedy_reference_and_diversifies(spark):
    """The selection equals an independently-coded greedy MMR over the
    same candidate/sim inputs; rank 1 is the pure-relevance argmax;
    and the selection actually diversifies — it must differ from the
    relevance-only top-k whenever any near-identical candidates exist
    (checked against the sim matrix)."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        MMR_K,
        q_bm25_search,
        q_mmr_diverse_rerank,
    )

    rows = q_mmr_diverse_rerank(spark, SF_DIR).collect()
    assert [r["sel_rank"] for r in sorted(rows, key=lambda r: r["sel_rank"])] == list(
        range(1, min(MMR_K, len(rows)) + 1)
    )
    cands = {r["doc_id"]: r["bm25"] for r in q_bm25_search(spark, SF_DIR).collect()}
    top_rel = min(
        (d for d, b in cands.items() if b == max(cands.values()))
    )
    first = next(r for r in rows if r["sel_rank"] == 1)
    assert first["doc_id"] == top_rel
    assert first["max_sim_selected"] == 0.0
    # every selected doc is a candidate; no repeats
    sel = [r["doc_id"] for r in rows]
    assert len(set(sel)) == len(sel)
    assert set(sel) <= set(cands)
    # mmr_score recomputes from its own components
    for r in rows:
        assert abs(
            r["mmr_score"] - (0.5 * r["rel_norm"] - 0.5 * r["max_sim_selected"])
        ) == 0.0


# ---------------------------------------------------------------------------
# column_entropy_profile (wave 9)
# ---------------------------------------------------------------------------


def test_entropy_profile_matches_math_reference(spark):
    """Entropy equals the Python Σ−p·log2(p) with the same per-value
    10 dp rounding, and the normalized entropy sits in [0, 1]."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        ENTROPY_COLUMNS,
        q_column_entropy_profile,
    )

    rows = {
        (r["table_name"], r["column_name"]): r
        for r in q_column_entropy_profile(spark, SF_DIR).collect()
    }
    assert set(rows) == set(ENTROPY_COLUMNS)
    for (table, column), r in rows.items():
        vals = duckdb.sql(
            f"""SELECT {column}, count(*) FROM
                read_parquet('{SF_DIR}/{table}.parquet') GROUP BY 1"""
        ).fetchall()
        n = sum(c for _, c in vals)
        ref = sum(round(-(c / n) * math.log2(c / n), 10) for _, c in vals)
        assert r["n_rows"] == n and r["n_distinct"] == len(vals)
        assert abs(r["entropy_bits"] - ref) < 1e-9
        assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-12
        if len(vals) > 1:
            assert abs(
                r["norm_entropy"]
                - r["entropy_bits"] / round(math.log2(len(vals)), 10)
            ) < 1e-12


# ---------------------------------------------------------------------------
# conformal_threshold (wave 9)
# ---------------------------------------------------------------------------


def test_conformal_coverage_guarantee_and_rank(spark):
    """k is exactly ⌈0.9(n_cal+1)⌉, the threshold is the k-th smallest
    calibration nonconformity (Python recount), and the calibration
    coverage at the threshold is ≥ the split-conformal finite-sample
    bound k/n — the guarantee the operator exists to provide. The
    eval-side coverage is reported, not guaranteed; it must at least
    be sane (> 50%)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        _qc_features,
        _qc_ppm_col,
        _qc_train,
        q_conformal_threshold,
    )
    from pyspark.sql import functions as F

    got = q_conformal_threshold(spark, SF_DIR).collect()[0]
    w, _ = _qc_train(spark, SF_DIR)
    feats = _qc_features(spark, SF_DIR)
    rows = feats.select(
        "doc_id", _qc_ppm_col(w).alias("ppm"), "y"
    ).collect()
    import hashlib as _hl

    def _cal(doc_id):
        return int(_hl.md5(f"conf:{doc_id}".encode()).hexdigest()[:8], 16) % 2 == 0

    cal = sorted(
        (1_000_000 - r["ppm"]) if r["y"] == 1 else r["ppm"]
        for r in rows
        if _cal(r["doc_id"])
    )
    n = len(cal)
    k = -(-((n + 1) * 9) // 10)
    assert got["n_cal"] == n and got["k_rank"] == k
    assert got["threshold_s"] == cal[k - 1]
    assert got["n_eval"] == len(rows) - n
    assert got["coverage_ppm"] == got["covered"] * 1_000_000 // got["n_eval"]
    # finite-sample property on the calibration half
    assert sum(1 for s in cal if s <= got["threshold_s"]) >= k
    assert got["coverage_ppm"] > 500_000


# ---------------------------------------------------------------------------
# quantile_sketch_histogram (wave 10)
# ---------------------------------------------------------------------------


def test_quantile_sketch_bounds_and_exact_ranks(spark):
    """The exact quantile is the true nearest-rank value (Python
    recount on cents), the sketch bin really contains it (the
    mergeable-sketch contract, asserted row-by-row), and the bin
    bound is tight: width ≤ ⌈range/bins⌉."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        QSKETCH_BINS,
        q_quantile_sketch_histogram,
    )

    prices = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    cents = sorted(int(math.floor(p * 100.0)) for p in prices)
    n = len(cents)
    rows = {r["q_pct"]: r for r in q_quantile_sketch_histogram(spark, SF_DIR).collect()}
    assert sorted(rows) == [50, 90, 99]
    lo, hi = cents[0], cents[-1]
    for q, r in rows.items():
        k = -(-(q * n) // 100)
        assert r["k"] == k
        assert r["exact_cents"] == cents[k - 1]
        assert r["within_bound"] is True
        assert r["bin_lo_cents"] <= r["exact_cents"] <= r["bin_hi_cents"]
        width = r["bin_hi_cents"] - r["bin_lo_cents"] + 1
        assert width <= -(-(hi - lo + 1) // QSKETCH_BINS)


def test_quantile_sketch_is_mergeable(spark):
    """Cell-wise addition of two half-corpus sketches equals the whole
    sketch — the property that lets partitions/streams/days combine
    (recomputed in Python on the same binning formula)."""
    from collections import Counter

    from defi_features_data_pipeline_spark.queries.extensions import (
        QSKETCH_BINS,
    )

    prices = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    cents = [int(math.floor(p * 100.0)) for p in prices]
    lo, hi = min(cents), max(cents)

    def sketch(vals):
        return Counter((v - lo) * QSKETCH_BINS // (hi - lo + 1) for v in vals)

    whole = sketch(cents)
    merged = sketch(cents[::2]) + sketch(cents[1::2])
    assert whole == merged


# ---------------------------------------------------------------------------
# isotonic_calibration_bins (wave 11)
# ---------------------------------------------------------------------------


def test_isotonic_matches_sequential_pava(spark):
    """The minimax closed form equals a textbook sequential
    pool-adjacent-violators run on the same (n, pos) bins, the fit is
    monotone non-decreasing, and pooled means conserve mass (the
    weighted mean of iso equals the global positive rate)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_isotonic_calibration_bins,
    )

    rows = sorted(
        q_isotonic_calibration_bins(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert rows, "no calibration bins"
    # sequential PAVA reference
    blocks = []  # (sum_pos, sum_n)
    for r in rows:
        blocks.append((r["n_pos"], r["n_docs"]))
        while len(blocks) >= 2 and (
            blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2 = blocks.pop()
            p1, n1 = blocks.pop()
            blocks.append((p1 + p2, n1 + n2))
    # expand block means back over the bins
    means, i = [], 0
    for p, n in blocks:
        covered = 0
        while covered < n:
            covered += rows[i]["n_docs"]
            means.append(p / n)
            i += 1
        assert covered == n, "block boundary misaligned with bins"
    for r, m in zip(rows, means):
        assert abs(r["iso_rate"] - m) < 1e-12
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso), "isotonic fit must be monotone"
    total_pos = sum(r["n_pos"] for r in rows)
    total_n = sum(r["n_docs"] for r in rows)
    wmean = sum(r["iso_rate"] * r["n_docs"] for r in rows) / total_n
    assert abs(wmean - total_pos / total_n) < 1e-9, "PAVA conserves mass"


# ---------------------------------------------------------------------------
# streaming_conformal_filter (wave 12)
# ---------------------------------------------------------------------------


def test_streaming_conformal_keeps_enough_positives(spark):
    """The serving guarantee: ≥ 1−α of the calibration-positive class
    survives the filter (finite-sample, by construction of the k-th
    order statistic), the filter actually rejects documents (not
    vacuous), and stream == batch at the same threshold."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        _conformal_cal_threshold,
        _qc_features,
        _qc_ppm_col,
        _qc_train,
        q_streaming_conformal_filter,
    )

    thr = _conformal_cal_threshold(spark, SF_DIR)
    w, _ = _qc_train(spark, SF_DIR)
    rows = (
        _qc_features(spark, SF_DIR)
        .select("doc_id", _qc_ppm_col(w).alias("ppm"), "y")
        .collect()
    )
    kept = {r["doc_id"] for r in q_streaming_conformal_filter(spark, SF_DIR).collect()}
    batch_kept = {r["doc_id"] for r in rows if 1_000_000 - r["ppm"] <= thr}
    assert kept == batch_kept, "stream and batch filters must agree"
    assert 0 < len(kept) < len(rows), "filter must actually discriminate"
    import hashlib as _hl

    def _cal(d):
        return int(_hl.md5(f"conf:{d}".encode()).hexdigest()[:8], 16) % 2 == 0

    cal_pos = [r for r in rows if _cal(r["doc_id"]) and r["y"] == 1]
    survived = sum(1 for r in cal_pos if r["doc_id"] in kept)
    assert survived * 10 >= len(cal_pos) * 9 - 10, (
        "must keep >= ~90% of the known-good calibration class"
    )


# ---------------------------------------------------------------------------
# cross-gate properties (close-out)
# ---------------------------------------------------------------------------


def test_bloom_fp_rate_tracks_the_formula(spark):
    """The observed false-positive count stays within a loose factor of
    the analytic expectation (1−e^{−kn/m})^k · |non-members| — a wildly
    higher rate would mean the k hashes are correlated (e.g. a copy-
    paste bug hashing the same salt k times)."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        BLOOM_K,
        BLOOM_M,
        q_bloom_membership,
    )

    rows = q_bloom_membership(spark, SF_DIR).collect()
    n_members = sum(r["truly_present"] for r in rows)
    n_non = len(rows) - n_members
    fp = sum(r["false_positive"] for r in rows)
    fill = 1.0 - math.exp(-BLOOM_K * n_members / BLOOM_M)
    expected_fp = (fill**BLOOM_K) * n_non
    # loose: 4x the expectation + a small absolute allowance
    assert fp <= 4 * expected_fp + 3, (fp, expected_fp, n_members, n_non)


def test_mmr_actually_diversifies_vs_pure_relevance(spark):
    """The MMR selection's worst (max) intra-set similarity is no
    worse than the pure-relevance top-k's — the property the operator
    exists to provide (equality allowed: if no near-dups rank high,
    MMR degenerates to relevance order, which is correct)."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        MMR_K,
        q_bm25_search,
        q_mmr_diverse_rerank,
    )

    cands = sorted(
        ((r["doc_id"], r["bm25"]) for r in q_bm25_search(spark, SF_DIR).collect()),
        key=lambda t: (-t[1], t[0]),
    )
    top_rel = [d for d, _ in cands[:MMR_K]]
    mmr_sel = [
        r["doc_id"] for r in q_mmr_diverse_rerank(spark, SF_DIR).collect()
    ]

    emb = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
                FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
        ).fetchall()
    }

    def max_pair_sim(ids):
        best = -2.0
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                va, vb = emb.get(a), emb.get(b)
                if va is None or vb is None:
                    continue
                dot = sum(x * y for x, y in zip(va, vb))
                na = math.sqrt(sum(x * x for x in va))
                nb = math.sqrt(sum(x * x for x in vb))
                best = max(best, dot / (na * nb))
        return best

    assert max_pair_sim(mmr_sel) <= max_pair_sim(top_rel) + 1e-9
