"""Exact set-similarity join via prefix filtering (PPJoin family).

The scalable EXACT counterpart of the MinHash/LSH candidate path: no
false negatives (a completeness theorem, property-tested against brute
force). See queries/extensions.py::q_dedup_jaccard_prefix for the
gated instantiation over document shingles and the proof sketch.

Corpus-shape caveat (measured BOTH ways): prefix filtering prunes in
proportion to token-frequency SKEW. On a long-tail shingle corpus
(each doc ~70% near-unique shingles + ~30% from a Zipfian
common-phrase pool — the shape real 5-gram shingling produces) the
prefix candidates collapse to ≈ the true-pair count: 35 candidates for
30 planted dups over 3 030 docs, vs ~4.5M any-shared-token pairs —
selectivity < 1e-4, pinned by
tests/test_operators.py::test_prefix_filter_selectivity_on_longtail.
The synthetic testdata has a small vocabulary, so even "rare" shingles
co-occur in many documents and the candidate stage stays dense: 788k
raw prefix matches for 25 true pairs at sf0.1, cut to ~500k by the
exact SIZE and POSITIONAL filters, verified map-side — ~4 s at sf0.1
(KNOWN_SLOW; two stages are compute-heavy per shuffle byte, so their
widths are pinned explicitly against AQE's byte-size coalescing). At a
low threshold on such a dense corpus, ``dedup_lsh_verified``
(probabilistic recall) remains the production path; this operator is
the exactness option and the gate pins its correctness.

Reference scope note: the reference has no similarity join; this is
part of the training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def jaccard_join_prefix(
    sh: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "s",
    threshold_num: int = 1,
    threshold_den: int = 5,
    stats: dict | None = None,
) -> DataFrame:
    """All pairs with Jaccard >= threshold_num/threshold_den over a
    (id, token) set representation (tokens must be distinct per id).
    Returns (doc_a, doc_b, n_common, jaccard) with doc_a < doc_b and
    jaccard rounded to 6 dp.

    The prefix bound ⌈τ·n⌉ is computed in INTEGER arithmetic
    ((n·num + den − 1) div den) — an IEEE τ·n can land a hair above
    the true product and silently shorten the prefix below the safe
    length (a false-negative class float ceil() admits)."""
    tau = threshold_num / threshold_den
    # FIVE consumers derive from the token frame (sizes, df, prefix
    # ranking, and both sides of the verify join) — materialize it once
    # or the caller's (potentially expensive) tokenize/shingle plan
    # re-executes per consumer (measured 6.8 s → ~2 s at sf0.1 on the
    # document-shingle instantiation).
    sh = sh.select(
        F.col(id_col).alias("doc_id"), F.col(token_col).alias("s")
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy("doc_id").orderBy("__df", "s")
    ceil_tn = F.expr(
        f"(n_sh * {threshold_num} + {threshold_den} - 1) div {threshold_den}"
    )
    pref = (
        sh.join(dfreq, "s")
        .withColumn("__rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("__rn") <= F.col("n_sh") - ceil_tn + 1)
        .select("doc_id", "s", "__rn", "n_sh")
    )
    # The candidate self-join is match-heavy per input byte (hot
    # prefix tokens fan out), but its input frame is only a few MB —
    # AQE's byte-size coalescing collapses it to ~4 tasks and
    # serializes the most expensive stage (measured ~6 s of the ~7 s
    # query at sf0.1). An EXPLICIT partition count on the join key
    # opts this exchange out of coalescing; both join sides reuse the
    # one exchange, so the join stays co-partitioned at full width.
    n_parts = int(sh.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    pref = pref.repartition(n_parts, "s")
    # Candidate pruning beyond the prefix itself — both filters are
    # exact (integer arithmetic) and standard in the PPJoin family:
    # - SIZE filter: J >= τ forces τ·max(|A|,|B|) <= min(|A|,|B|);
    # - POSITIONAL filter: for the pair's MINIMAL common token c (the
    #   one the completeness theorem guarantees in both prefixes), no
    #   common token precedes c, so overlap <= 1 + min(|A|−pos_A(c),
    #   |B|−pos_B(c)); requiring that bound to reach the Jaccard
    #   overlap threshold t = ⌈τ/(1+τ)·(|A|+|B|)⌉ prunes the match.
    #   A pair is kept if ANY of its prefix matches passes, and the
    #   match at c always passes for a truly-qualifying pair, so
    #   completeness is preserved (property-tested).
    na, nb = F.col("pa.n_sh"), F.col("pb.n_sh")
    ra, rb = F.col("pa.__rn"), F.col("pb.__rn")
    size_ok = F.greatest(na, nb) * threshold_num <= F.least(na, nb) * threshold_den
    t_overlap = F.expr(
        f"(({threshold_num} * (pa.n_sh + pb.n_sh)) + {threshold_num} + "
        f"{threshold_den} - 1) div ({threshold_num} + {threshold_den})"
    )
    pos_ok = F.lit(1) + F.least(na - ra, nb - rb) >= t_overlap
    cand = (
        pref.alias("pa")
        .join(
            pref.alias("pb"),
            (F.col("pa.s") == F.col("pb.s"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            & size_ok
            & pos_ok,
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    if stats is not None:
        # opt-in selectivity instrumentation (costs one extra action;
        # tests pin the prefix filter's candidate count per corpus
        # shape — see test_prefix_filter_selectivity_on_longtail)
        stats["candidates"] = cand.count()
    # Verify MAP-SIDE against per-doc sorted token arrays: the exploded
    # pair⋈tokens⋈tokens formulation materializes Σ_pairs |A| rows
    # (~26M at sf0.1 for 500k candidates) before its partial aggregate;
    # joining the pair list to one array row per doc and intersecting
    # in the projection keeps the stage at |pairs| rows. Arrays are
    # SORTED so array_intersect's cost is predictable; the doc-array
    # table is one row per doc (broadcast here; at larger scale
    # semi-join it to candidate-touched docs first or let it hash-join).
    # Width pinned for the same byte-size-vs-compute reason as above.
    cand = cand.repartition(n_parts, "doc_a")
    doc_sets = sh.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("s")).alias("__toks"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    sa = doc_sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("__toks").alias("__ta"),
        F.col("n_sh").alias("na"),
    )
    sb = doc_sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("__toks").alias("__tb"),
        F.col("n_sh").alias("nb"),
    )
    n_common = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    return (
        cand.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("n_common", n_common)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
