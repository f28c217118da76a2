"""Pinned behavior + independent references for the round-8 wave-7
operators (classifier eval family: exact AUC / PR curve / Cohen's
kappa, DPO preference pairs, Bloom membership sketch, Benford digit
audit). The oracle gates prove cross-engine determinism; these tests
pin the SEMANTICS — a pure-Python reference where the operator is a
formula (AUC via brute pair counting, kappa from the confusion cells,
Benford's law from math.log10), and the structural invariants
(one-sided Bloom error, PR monotonicity, pair disjointness) that a
hash match alone would not prove."""

import math

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# classifier_auc_roc
# ---------------------------------------------------------------------------


def _scored_rows(spark):
    from defi_features_data_pipeline_spark.queries.learnops import (
        _qc_features,
        _qc_ppm_col,
        _qc_train,
    )

    w, _ = _qc_train(spark, SF_DIR)
    feats = _qc_features(spark, SF_DIR)
    return feats.select(_qc_ppm_col(w).alias("ppm"), "y").collect()


def test_auc_matches_brute_force_pair_counting(spark):
    """AUC from the distributed Mann-Whitney gate == the O(n+·n-)
    definition: over every (positive, negative) pair, score 1 if the
    positive ranks higher, 0.5 on a tie — the independent-algorithm
    check (the PCA lesson: a cross-engine hash match proves
    determinism, not that the formula is AUC)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_classifier_auc_roc,
    )

    rows = _scored_rows(spark)
    pos = [r["ppm"] for r in rows if r["y"] == 1]
    neg = [r["ppm"] for r in rows if r["y"] == 0]
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    got = q_classifier_auc_roc(spark, SF_DIR).collect()[0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    # u_times2 is integer-exact: 2U must equal the brute-force 2U
    assert got["u_times2"] == round(2 * u)
    assert abs(got["auc"] - u / (len(pos) * len(neg))) < 1e-12
    assert 0.5 < got["auc"] <= 1.0, "trained classifier must beat chance"


# ---------------------------------------------------------------------------
# annotator_agreement_kappa
# ---------------------------------------------------------------------------


def test_kappa_matches_confusion_cell_formula(spark):
    """kappa == (po - pe) / (1 - pe) recomputed in Python floats from
    the gate's own integer cells, and the exact-rational pair
    (kappa_num, kappa_den) reduces to the same value."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_annotator_agreement_kappa,
    )

    r = q_annotator_agreement_kappa(spark, SF_DIR).collect()[0]
    n = r["n"]
    assert n == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    po = (r["n11"] + r["n00"]) / n
    pe = (
        (r["n11"] + r["n10"]) * (r["n11"] + r["n01"])
        + (r["n01"] + r["n00"]) * (r["n10"] + r["n00"])
    ) / (n * n)
    ref = (po - pe) / (1 - pe)
    assert abs(r["kappa"] - ref) < 1e-12
    assert abs(r["kappa_num"] / r["kappa_den"] - ref) < 1e-12
    assert -1.0 <= r["kappa"] <= 1.0
    # the prediction agrees with the label beyond chance (acc ~0.8)
    assert r["kappa"] > 0.0


def test_kappa_corrects_for_chance(spark):
    """Raw agreement is higher than kappa whenever pe > 0 — the whole
    point of the statistic; guards a regression to plain accuracy."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_annotator_agreement_kappa,
    )

    r = q_annotator_agreement_kappa(spark, SF_DIR).collect()[0]
    po = (r["n11"] + r["n00"]) / r["n"]
    assert r["kappa"] < po


# ---------------------------------------------------------------------------
# precision_recall_curve
# ---------------------------------------------------------------------------


def test_pr_curve_invariants(spark):
    """Recall is non-increasing in the threshold, tp+fn is the constant
    positive count, every cell recomputes from the scored rows, and the
    degenerate empty-prediction sentinel only appears with tp+fp=0."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_precision_recall_curve,
    )

    rows = {
        r["threshold_ppm"]: r
        for r in q_precision_recall_curve(spark, SF_DIR).collect()
    }
    scored = _scored_rows(spark)
    n_pos = sum(r["y"] for r in scored)
    last_recall = None
    for t in sorted(rows):
        r = rows[t]
        tp = sum(1 for s in scored if s["ppm"] >= t and s["y"] == 1)
        fp = sum(1 for s in scored if s["ppm"] >= t and s["y"] == 0)
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["tp"] + r["fn"] == n_pos
        assert r["recall_ppm"] == tp * 1_000_000 // n_pos
        if tp + fp == 0:
            assert r["precision_ppm"] == -1
        else:
            assert r["precision_ppm"] == tp * 1_000_000 // (tp + fp)
        if last_recall is not None:
            assert r["recall_ppm"] <= last_recall
        last_recall = r["recall_ppm"]
    # the grid must actually separate operating points on this corpus
    recalls = {r["recall_ppm"] for r in rows.values()}
    assert len(recalls) > 1, "threshold grid collapsed to one point"


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------


def test_preference_pairs_margins_and_disjointness(spark):
    """Every pair has a strictly positive integer margin, chosen and
    rejected sets are disjoint (mirror pairing cannot reuse a doc on
    both sides), pair_rank stays in the top half, and the construction
    is deterministic across runs."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        q_preference_pairs,
    )

    rows = q_preference_pairs(spark, SF_DIR).collect()
    assert rows, "no preference pairs at sf0.001"
    chosen = {r["chosen_doc_id"] for r in rows}
    rejected = {r["rejected_doc_id"] for r in rows}
    assert not chosen & rejected
    for r in rows:
        assert r["margin_ppm"] == r["chosen_ppm"] - r["rejected_ppm"]
        assert r["margin_ppm"] > 0
        assert r["pair_rank"] * 2 <= r["n_in_lang"]
    again = q_preference_pairs(spark, SF_DIR).collect()
    key = lambda r: (r["lang"], r["pair_rank"])  # noqa: E731
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again)), key


def test_preference_pairs_are_per_lang_mirrors(spark):
    """Within a language the i-th pair's chosen doc outranks every
    later pair's chosen doc (ranks are the 1..n/2 prefix), so the
    FIRST pair is the maximal-margin pair of its language."""
    from collections import defaultdict

    from defi_features_data_pipeline_spark.queries.learnops import (
        q_preference_pairs,
    )

    by_lang = defaultdict(list)
    for r in q_preference_pairs(spark, SF_DIR).collect():
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["pair_rank"])
        margins = [r["margin_ppm"] for r in rs]
        chosen = [r["chosen_ppm"] for r in rs]
        assert chosen == sorted(chosen, reverse=True)
        # mirror pairing: margins shrink toward the middle
        assert margins == sorted(margins, reverse=True)


# ---------------------------------------------------------------------------
# bloom_membership
# ---------------------------------------------------------------------------


def test_bloom_one_sided_error(spark):
    """The Bloom contract, row by row: NO false negatives (every true
    member is claimed), false_positive is exactly claimed-minus-truth,
    and the probe covers every customer exactly once."""
    import duckdb

    from defi_features_data_pipeline_spark.queries.extensions import (
        BLOOM_HV_PRICE,
        q_bloom_membership,
    )

    rows = q_bloom_membership(spark, SF_DIR).collect()
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_cust
    truth = {
        r[0]
        for r in duckdb.sql(
            f"""SELECT DISTINCT o_custkey
                FROM read_parquet('{SF_DIR}/orders.parquet')
                WHERE o_totalprice >= {BLOOM_HV_PRICE}"""
        ).fetchall()
    }
    for r in rows:
        assert r["truly_present"] == (r["c_custkey"] in truth)
        if r["truly_present"]:
            assert r["claimed_present"], "false negative — Bloom broken"
        assert r["false_positive"] == (
            r["claimed_present"] and not r["truly_present"]
        )


# ---------------------------------------------------------------------------
# benford_digit_audit
# ---------------------------------------------------------------------------


def test_benford_expected_ppm_are_the_math_log10_floors(spark):
    """The embedded expectation literals ARE floor(log10(1+1/d)·10⁶) —
    recomputed here from math.log10 so a typo in the table can't hide
    behind the cross-engine hash (both engines share the literal)."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        BENFORD_PPM,
    )

    for d in range(1, 10):
        assert BENFORD_PPM[d] == math.floor(math.log10(1 + 1 / d) * 1e6)
    assert sum(BENFORD_PPM.values()) <= 1_000_000


def test_benford_audit_counts_every_order_once(spark):
    """All 9 digit rows come back (absent digits as zero), counts sum
    to the order count, observed shares are exact floor-ppm, and the
    leading digit matches a Python string extraction."""
    import duckdb

    from defi_features_data_pipeline_spark.queries.extensions import (
        q_benford_digit_audit,
    )

    rows = {r["digit"]: r for r in q_benford_digit_audit(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(1, 10))
    prices = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    from collections import Counter

    ref = Counter(int(str(int(math.floor(p)))[0]) for p in prices)
    total = len(prices)
    for d in range(1, 10):
        assert rows[d]["n_orders"] == ref.get(d, 0)
        assert rows[d]["observed_ppm"] == ref.get(d, 0) * 1_000_000 // total
        assert (
            rows[d]["deviation_ppm"]
            == rows[d]["observed_ppm"] - rows[d]["benford_ppm"]
        )
    assert sum(r["n_orders"] for r in rows.values()) == total
