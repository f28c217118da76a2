"""Round-9 wave tests: exact longest-duplicated-span dedup (the k-mer
anchor + diagonal-run operator that retires the fixed-width stand-in),
checked against a brute-force token-LCS reference — the PCA lesson: the
oracle gate proves both engines agree; this proves the agreed answer IS
the longest common token span."""

import random

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _lcs_spans(a: list[str], b: list[str]):
    """O(n·m) DP: length of the longest common contiguous token span,
    the number of maximal spans (distinct (end_a, end_b) cells at the
    max, collapsed to distinct (start_a-diag) islands the way the
    operator counts), and the min 1-based start in ``a``."""
    n, m = len(a), len(b)
    # maximal runs per diagonal — the direct definition of a maximal
    # common contiguous span
    runs = []
    for diag in range(-(m - 1), n):
        run = 0
        for j in range(1, m + 1):
            i = j + diag
            if 1 <= i <= n and a[i - 1] == b[j - 1]:
                run += 1
            else:
                if run:
                    runs.append((run, i - run, j - run))
                run = 0
        # close the trailing run on this diagonal
        if run:
            j = m + 1
            i = j + diag
            runs.append((run, i - run, j - run))
    if not runs:
        return 0, 0, None
    best = max(r[0] for r in runs)
    tops = [r for r in runs if r[0] == best]
    return best, len(tops), min(r[1] for r in tops)


def test_longest_dup_span_matches_bruteforce_lcs(spark):
    """On a small random corpus with a tiny vocabulary (forcing real
    shared passages), the operator's per-pair (span_len, n_max_spans,
    start_a) must equal the brute-force DP for every pair with
    LCS ≥ k, and pairs with LCS < k must be absent. Seeded RNG: the
    corpus regenerates identically."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        SPAN_WINDOW_TOKENS as K,
        longest_dup_span_frame,
    )

    rng = random.Random(97)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    shared = [rng.choice(vocab) for _ in range(17)]  # a plantable passage
    docs = []
    for i in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        if i % 3 == 0:  # plant the shared passage in a third of docs
            at = rng.randint(0, len(toks))
            toks = toks[:at] + shared[: rng.randint(K, 17)] + toks[at:]
        docs.append((i, " ".join(toks)))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["span_len_tokens"],
            r["n_max_spans"],
            r["start_a"],
            r["span_text"],
        )
        for r in longest_dup_span_frame(spark, d).collect()
    }
    toks = {i: t.split() for i, t in docs}
    checked_present = checked_absent = 0
    for a in range(30):
        for b in range(a + 1, 30):
            L, n_max, start_a = _lcs_spans(toks[a], toks[b])
            if L >= K:
                assert (a, b) in got, (a, b, L)
                g = got[(a, b)]
                assert g[0] == L and g[1] == n_max and g[2] == start_a, (
                    (a, b), g, (L, n_max, start_a)
                )
                span = g[3].split()
                assert len(span) == L
                # the evidence text really occurs in BOTH documents
                sa = " ".join(span)
                assert sa in " ".join(toks[a]) and sa in " ".join(toks[b])
                checked_present += 1
            else:
                assert (a, b) not in got, (a, b, L)
                checked_absent += 1
    assert checked_present >= 10 and checked_absent >= 10  # both branches real


def test_longest_dup_span_gate_runs_and_is_exact_extent(spark):
    """On the driver corpus: every reported span must be at least the
    window width, the span text must tokenize to exactly span_len
    tokens, and re-slicing doc_b at SOME position must reproduce it
    (extent verified from the other side)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        SPAN_WINDOW_TOKENS as K,
        q_dedup_longest_span,
    )
    from defi_features_data_pipeline_spark.queries.extensions import _t

    rows = q_dedup_longest_span(spark, SF_DIR).collect()
    assert rows, "no duplicated spans at sf0.001 — vacuous gate"
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in _t(spark, SF_DIR, "documents").collect()
    }
    for r in rows:
        assert r["span_len_tokens"] >= K
        span = r["span_text"].split()
        assert len(span) == r["span_len_tokens"]
        ta = texts[r["doc_a"]]
        assert ta[r["start_a"] - 1 : r["start_a"] - 1 + len(span)] == span
        tb = texts[r["doc_b"]]
        assert any(
            tb[i : i + len(span)] == span
            for i in range(len(tb) - len(span) + 1)
        ), (r["doc_a"], r["doc_b"])
