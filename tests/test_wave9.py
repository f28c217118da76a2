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


# ---------------------------------------------------------------------------
# winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------


def _py_winnow(tokens, k, w):
    """Pure-python Schleimer–Wilkerson–Aiken winnowing over the same
    md5-prefix hash: the selected (pos, hash) set (1-based positions,
    rightmost-min tie rule), deduplicated."""
    import hashlib

    grams = [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    sel = set()
    for p0 in range(len(hs) - w + 1):
        win = hs[p0 : p0 + w]
        m = min(win)
        # rightmost occurrence of the min
        j = max(i for i, h in enumerate(win) if h == m)
        sel.add((p0 + j + 1, m))
    return sel


def test_winnow_selection_matches_python_reference(spark):
    """The operator's selected (pos, hash) set equals the textbook
    winnowing algorithm run in pure python over the same tokens and
    the same portable hash — frame bounds, tie direction, dedup and
    the bigint rightmost-min encoding all verified."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        SPAN_WINDOW_TOKENS as K,
        WINNOW_WINDOW as W,
        _winnow_selected,
    )
    from defi_features_data_pipeline_spark.queries.extensions import _t

    got = {}
    for r in _winnow_selected(spark, SF_DIR).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fh"]))
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in _t(spark, SF_DIR, "documents").collect()
    }
    n_nonempty = 0
    for doc_id, toks in docs.items():
        want = _py_winnow(toks, K, W)
        assert got.get(doc_id, set()) == want, doc_id
        n_nonempty += bool(want)
    assert n_nonempty >= 400  # the corpus genuinely exercises it


def test_winnowing_guarantee_covers_longest_span_pairs(spark):
    """The MOSS guarantee, checked against the EXACT operator: every
    pair whose longest shared span is ≥ w+k−1 tokens must share at
    least one winnowed fingerprint VALUE (the floor-1 candidate set —
    the gate's floor of 2 is a precision knob on top)."""
    from pyspark.sql import functions as F  # noqa: F811

    from defi_features_data_pipeline_spark.queries.learnops import (
        SPAN_WINDOW_TOKENS as K,
        WINNOW_WINDOW as W,
        _winnow_selected,
        q_dedup_longest_span,
    )

    spans = {
        (r["doc_a"], r["doc_b"]): r["span_len_tokens"]
        for r in q_dedup_longest_span(spark, SF_DIR).collect()
    }
    must_cover = {p for p, L in spans.items() if L >= W + K - 1}
    assert must_cover, "no guarantee-threshold pairs at sf0.001 — vacuous"
    sel = _winnow_selected(spark, SF_DIR).select("doc_id", "fh").distinct()
    a = sel.select(F.col("doc_id").alias("doc_a"), "fh")
    b = sel.select(F.col("doc_id").alias("doc_b"), "fh")
    anchored = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, "fh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    missing = must_cover - anchored
    assert not missing, f"winnowing guarantee violated: {sorted(missing)[:5]}"


def test_winnow_density_near_theory(spark):
    """Winnowing selects ~2/(w+1) of positions in expectation on
    hash-random input; the per-doc density must sit in a sane band
    around that (duplicated windows dedup below it, short docs above)."""
    from defi_features_data_pipeline_spark.queries.learnops import (
        WINNOW_WINDOW as W,
        q_winnow_fingerprints,
    )

    rows = [
        r
        for r in q_winnow_fingerprints(spark, SF_DIR).collect()
        if r["n_kgrams"] >= 20
    ]
    assert rows
    mean = sum(r["density_ppm"] for r in rows) / len(rows)
    theory = 2_000_000 / (W + 1)
    assert 0.5 * theory < mean < 1.6 * theory, (mean, theory)


# ---------------------------------------------------------------------------
# LSM segment compaction
# ---------------------------------------------------------------------------


def test_compaction_is_block_identical_to_fresh_build(spark):
    """Compaction output is CANONICAL: decoding the per-segment
    gap-encoded blocks and rebuilding must produce byte-identical
    blocks to a from-scratch monolithic build over the same corpus —
    so compact-then-compact is a no-op and a reader can never tell
    whether an index has segment history. Also pins the decode half:
    base+running-gap reconstruction loses nothing."""
    from defi_features_data_pipeline_spark.queries.extensions import (
        INDEX_DELTA_MOD,
        _blocks_from_postings,
        _decode_block_postings,
        _index_blocks_from,
        _t,
    )

    d = _t(spark, SF_DIR, "documents")
    base = d.filter(F.col("doc_id") % INDEX_DELTA_MOD != 0)
    delta = d.filter(F.col("doc_id") % INDEX_DELTA_MOD == 0)
    segs = _index_blocks_from(base).unionByName(_index_blocks_from(delta))
    compacted = _blocks_from_postings(_decode_block_postings(segs))
    fresh = _index_blocks_from(d)

    def key(df):
        return {
            (r["term"], r["block_id"], r["n_in_block"], r["base_doc"],
             tuple(r["gaps"]))
            for r in df.collect()
        }

    c, f = key(compacted), key(fresh)
    assert c == f, (len(c - f), len(f - c))
    # decode really reads blocks, not text: postings round-trip exactly
    post = {
        (r["term"], r["doc_id"])
        for r in _decode_block_postings(fresh).collect()
    }
    want = {
        (r["term"], r["doc_id"])
        for r in d.selectExpr(
            f"explode(filter(split(lower(text), '\\\\s+'), t -> t <> '')) AS term",
            "doc_id",
        ).distinct().collect()
    }
    assert post == want
