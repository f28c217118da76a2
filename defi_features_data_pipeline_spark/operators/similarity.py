"""Exact set-similarity join via prefix filtering (PPJoin family).

The scalable EXACT counterpart of the MinHash/LSH candidate path: no
false negatives (a completeness theorem, property-tested against brute
force). See queries/extensions.py::q_dedup_jaccard_prefix for the
gated instantiation over document shingles and the proof sketch.

Corpus-shape caveat (measured honestly): prefix filtering prunes in
proportion to token-frequency SKEW — on long-tail real text, prefix
tokens are near-unique and candidates ≈ true pairs. The synthetic
testdata has a small vocabulary, so even "rare" shingles co-occur in
many documents and the candidate self-join stays dense (788k candidate
pairs for 25 true pairs at sf0.1) — the candidate stage, not
verification, dominates its ~7 s bench time (KNOWN_SLOW). At a low
threshold on such a corpus, ``dedup_lsh_verified`` (probabilistic
recall) remains the production path; this operator is the exactness
option and the gate pins its correctness.

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
        .select("doc_id", "s")
    )
    cand = (
        pref.alias("pa")
        .join(
            pref.alias("pb"),
            (F.col("pa.s") == F.col("pb.s"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    common = (
        cand.join(sh.alias("fa"), F.col("doc_a") == F.col("fa.doc_id"))
        .join(
            sh.alias("fb"),
            (F.col("doc_b") == F.col("fb.doc_id"))
            & (F.col("fa.s") == F.col("fb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
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
