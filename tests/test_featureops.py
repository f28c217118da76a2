"""Independent-reference tests for queries/featureops.py — numpy /
pure-Python recomputation, NOT the DuckDB oracle (the oracle gate
proves cross-engine agreement; these prove the shared formula itself
is right — the round-6 outlier_zscore lesson: two engines can
hash-match on the same wrong algebra)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest


class TestEwmaUserValue:
    def test_matches_python_reference(self, spark, sf_dir):
        """decayed_value == Σ value·2^(−age_days) recomputed in pure
        Python floats (exact powers of two, so 1e-6 is generous)."""
        from defi_features_data_pipeline_spark.queries.core import _events
        from defi_features_data_pipeline_spark.queries.featureops import (
            DECAY_ANCHOR,
            DECAY_MAX_AGE_DAYS,
            q_ewma_user_value,
        )

        got = {
            r["user_id"]: r for r in q_ewma_user_value(spark, sf_dir).collect()
        }
        pdf = (
            _events(spark, sf_dir)
            .selectExpr("user_id", "cast(ts as long) as ep", "value")
            .toPandas()
        )
        want: dict = {}
        for uid, ep, v in zip(pdf["user_id"], pdf["ep"], pdf["value"]):
            age = min(DECAY_MAX_AGE_DAYS, (DECAY_ANCHOR - ep) // 86400)
            acc, na, ne = want.get(uid, (0.0, 10**9, 0))
            want[uid] = (acc + v * 2.0 ** (-age), min(na, age), ne + 1)
        assert set(got) == set(want)
        for uid, (acc, na, ne) in want.items():
            assert abs(got[uid]["decayed_value"] - acc) < 1e-6
            assert got[uid]["freshest_age_days"] == na
            assert got[uid]["n_events"] == ne
        # recency must matter: some user's decayed sum is far below its
        # plain sum (weights < 1 on all but same-day events)
        plain = pdf.groupby("user_id")["value"].sum()
        assert any(
            got[u]["decayed_value"] < 0.5 * plain[u] for u in plain.index
        )


class TestOutlierMad:
    def test_matches_numpy(self, spark, sf_dir):
        """Flagged set == numpy's |x−med| > 3·1.4826·MAD set and
        robust_z matches to 1e-4 (the 6-dp stat rounding bounds the
        drift; no flagged row may sit closer to the raw threshold than
        that rounding can move it)."""
        import numpy as np

        from defi_features_data_pipeline_spark.queries.core import _events
        from defi_features_data_pipeline_spark.queries.featureops import (
            MAD_CONSISTENCY,
            MAD_K,
            q_outlier_mad,
        )

        got = {r["event_id"]: r["robust_z"] for r in q_outlier_mad(spark, sf_dir).collect()}
        pdf = _events(spark, sf_dir).select(
            "event_id", "event_type", "value"
        ).toPandas()
        want = {}
        for _, grp in pdf.groupby("event_type"):
            med = float(np.median(grp["value"]))
            mad = float(np.median(np.abs(grp["value"] - med)))
            if mad <= 0:
                continue
            z = (grp["value"] - med) / (MAD_CONSISTENCY * mad)
            for eid, zi in zip(grp["event_id"], z):
                if abs(zi) > MAD_K:
                    want[eid] = zi
        assert set(got) == set(want)
        for eid, zi in want.items():
            assert abs(got[eid] - zi) < 1e-4
        assert len(got) > 0

    def test_more_robust_than_zscore_on_contaminated_group(self, spark, sf_dir):
        """The defining MAD property: z-score's threshold inflates with
        the outliers it is trying to find; MAD's does not. On each
        group, the MAD flag set contains the z flag set (up to boundary
        rounding) — MAD never flags fewer."""
        from defi_features_data_pipeline_spark.queries.extensions import (
            q_outlier_zscore,
        )
        from defi_features_data_pipeline_spark.queries.featureops import (
            q_outlier_mad,
        )

        mad_ids = {r["event_id"] for r in q_outlier_mad(spark, sf_dir).collect()}
        z_ids = {r["event_id"] for r in q_outlier_zscore(spark, sf_dir).collect()}
        assert len(mad_ids) >= len(z_ids)


class TestKeySkewProfile:
    def test_consistent_with_pandas_counts(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.core import _events
        from defi_features_data_pipeline_spark.queries.featureops import (
            SKEW_TOP_K,
            q_key_skew_profile,
        )

        rows = q_key_skew_profile(spark, sf_dir).collect()
        pdf = _events(spark, sf_dir).select("user_id").toPandas()
        counts = pdf["user_id"].value_counts()
        tot, nk = len(pdf), counts.size
        assert len(rows) == min(SKEW_TOP_K, nk)
        # rows are the true top-K by (count desc, key asc)
        want = sorted(
            ((int(c), u) for u, c in counts.items()),
            key=lambda t: (-t[0], t[1]),
        )[: len(rows)]
        assert [(r["cnt"], r["user_id"]) for r in rows] == want
        for r in rows:
            assert abs(r["share"] - r["cnt"] / tot) < 1e-6
            assert abs(r["skew_x"] - r["cnt"] * nk / tot) < 1e-6


class TestFeatureHashing:
    @staticmethod
    def _bucket(tok: str, dim: int) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    def test_matches_pure_python_vectorizer(self, spark, sf_dir):
        """Every (doc, bucket, weight) row equals a hashlib-based
        reimplementation of lower→split→md5-bucket→count."""
        from defi_features_data_pipeline_spark.queries.core import _t
        from defi_features_data_pipeline_spark.queries.featureops import (
            HASH_DIM,
            q_feature_hashing,
        )

        got = {
            (r["doc_id"], r["bucket"]): r["weight"]
            for r in q_feature_hashing(spark, sf_dir).collect()
        }
        pdf = _t(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
        want: dict = {}
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            for tok in re.split(r"\s+", text.lower()):
                if tok:
                    k = (did, self._bucket(tok, HASH_DIM))
                    want[k] = want.get(k, 0) + 1
        assert got == want
        assert all(0 <= b < HASH_DIM for _, b in got)


class TestTokenClassCounts:
    def test_matches_python_re(self, spark, sf_dir):
        """Class counts equal a pure-Python re reference, classes
        partition the token stream, and the count beats chars/4 as a
        token estimate on word-heavy docs (the reason this op exists)."""
        from defi_features_data_pipeline_spark.queries.core import _t
        from defi_features_data_pipeline_spark.queries.featureops import (
            q_token_class_counts,
        )

        pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]")
        got = {r["doc_id"]: r for r in q_token_class_counts(spark, sf_dir).collect()}
        pdf = _t(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            toks = pat.findall(text.lower())
            r = got[did]
            assert r["n_tokens"] == len(toks)
            assert r["n_word_tokens"] == sum(t[0].isalpha() for t in toks)
            assert r["n_num_tokens"] == sum(t[0].isdigit() for t in toks)
            assert (
                r["n_word_tokens"] + r["n_num_tokens"] + r["n_punct_tokens"]
                == r["n_tokens"]
            )


class TestIncrementalConnectedComponents:
    def test_random_graph_incremental_equals_full(self, spark):
        """Property: for a random graph split into two edge batches,
        CC(batch1) + incremental-merge(batch2) == CC(all edges)."""
        import random

        from defi_features_data_pipeline_spark.operators import (
            connected_components,
            connected_components_incremental,
        )

        rng = random.Random(7)
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(90)
        ]
        cut = len(edges) // 2
        all_df = spark.createDataFrame(edges, "id_a long, id_b long")
        old_df = spark.createDataFrame(edges[:cut], "id_a long, id_b long")
        new_df = spark.createDataFrame(edges[cut:], "id_a long, id_b long")
        full = {
            r["node"]: r["label"]
            for r in connected_components(
                all_df, symmetrize=True
            ).collect()
        }
        base = connected_components(old_df, symmetrize=True)
        inc = {
            r["node"]: r["label"]
            for r in connected_components_incremental(base, new_df).collect()
        }
        assert inc == full

    def test_lsh_gate_split_is_nonvacuous_and_bridges(self, spark, sf_dir_t2):
        """The dedup_clusters_incremental gate's old/new split must keep
        both batches non-empty AND the delta must re-label at least one
        old node (at sf0.01 — where the driver gate runs — new doc 45
        joins old component {267, 413} and its smaller id wins) —
        otherwise the gate degenerates to plain CC."""
        sf_dir = sf_dir_t2
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.operators import (
            connected_components,
            connected_components_incremental,
        )
        from defi_features_data_pipeline_spark.queries.extensions import (
            _lsh_edges,
        )

        pairs = _lsh_edges(spark, sf_dir)
        new_a, new_b = F.col("doc_a") % 5 == 0, F.col("doc_b") % 5 == 0
        old_e = pairs.filter(~new_a & ~new_b)
        delta = pairs.filter(new_a | new_b)
        assert old_e.count() > 0 and delta.count() > 0
        base = connected_components(old_e, "doc_a", "doc_b", symmetrize=True)
        base_labels = {r["node"]: r["label"] for r in base.collect()}
        merged = connected_components_incremental(base, delta, "doc_a", "doc_b")
        merged_labels = {r["node"]: r["label"] for r in merged.collect()}
        reassigned = [
            n
            for n, lb in base_labels.items()
            if merged_labels.get(n, lb) != lb
        ]
        assert reassigned, "delta batch never re-labels an old node"


class TestJaccardPrefixJoin:
    def test_completeness_vs_brute_force_random_sets(self, spark):
        """The theorem under test: the prefix filter admits NO false
        negatives. 120 random token sets (sizes 3-12 over a 40-token
        universe — dense overlap, lots of boundary pairs), result must
        EQUAL brute-force all-pairs Jaccard >= 1/5 exactly."""
        import itertools
        import random

        from defi_features_data_pipeline_spark.operators import (
            jaccard_join_prefix,
        )

        rng = random.Random(13)
        docs = {
            i: frozenset(
                rng.sample(range(40), rng.randint(3, 12))
            )
            for i in range(120)
        }
        rows = [(i, f"t{t}") for i, ts in docs.items() for t in ts]
        sh = spark.createDataFrame(rows, "doc_id long, s string")
        got = {
            (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
            for r in jaccard_join_prefix(sh).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(docs), 2):
            inter = len(docs[a] & docs[b])
            union = len(docs[a] | docs[b])
            if round(inter / union, 6) >= 0.2:
                want[(a, b)] = (inter, round(inter / union, 6))
        assert got == want
        assert len(want) > 50  # non-vacuous: many qualifying pairs

    def test_float_ceil_boundary_sizes(self, spark):
        """Sizes where IEEE 0.2·n rounds ABOVE the true product
        (n = 15: 3.0000000000000004 → float ceil 4 shortens the prefix
        and can drop a qualifying pair). Identical 15-token sets must
        survive at exactly J = 1.0, and a pair at exactly J = 0.2 with
        |A| = 15 must be found."""
        from defi_features_data_pipeline_spark.operators import (
            jaccard_join_prefix,
        )

        a = [f"x{i}" for i in range(15)]
        # |A ∩ B| = 5, |A ∪ B| = 25 → J = 0.2 exactly, both sizes 15
        b = a[:5] + [f"y{i}" for i in range(10)]
        rows = (
            [(0, t) for t in a]
            + [(1, t) for t in a]  # identical twin
            + [(2, t) for t in b]
        )
        sh = spark.createDataFrame(rows, "doc_id long, s string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_join_prefix(sh).collect()
        }
        assert got[(0, 1)] == 1.0
        assert got[(0, 2)] == 0.2 and got[(1, 2)] == 0.2

    def test_prefix_candidates_shrink_vs_all_pairs(self, spark, sf_dir_t2):
        """Scalability evidence on the real corpus: the prefix join
        generates strictly fewer candidate pairs than the full
        shingle-share join (the exact baseline's fan-out)."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.queries.extensions import (
            _doc_shingles,
        )

        sh = _doc_shingles(spark, sf_dir_t2)
        all_pairs = (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        # rebuild the operator's candidate set only
        from pyspark.sql import Window

        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        w = Window.partitionBy("doc_id").orderBy("__df", "s")
        pref = (
            sh.join(dfreq, "s")
            .withColumn("__rn", F.row_number().over(w))
            .join(sizes, "doc_id")
            .filter(F.col("__rn") <= F.col("n_sh") - F.expr("(n_sh + 4) div 5") + 1)
            .select("doc_id", "s")
        )
        cand = (
            pref.alias("pa")
            .join(
                pref.alias("pb"),
                (F.col("pa.s") == F.col("pb.s"))
                & (F.col("pa.doc_id") < F.col("pb.doc_id")),
            )
            .select("pa.doc_id", "pb.doc_id")
            .distinct()
            .count()
        )
        assert cand < all_pairs
        assert cand > 0


class TestDriftPsi:
    def test_matches_numpy_reference(self, spark, sf_dir):
        """PSI terms equal a numpy recomputation (baseline deciles,
        clamped shares, (p−q)·ln(p/q)) to 1e-6, shares sum to ~1 per
        window, and the total PSI is small on this stationary corpus
        (same generator both halves — a large PSI would mean the
        binning itself drifts)."""
        import math

        import numpy as np

        from defi_features_data_pipeline_spark.queries.core import _events
        from defi_features_data_pipeline_spark.queries.featureops import (
            PSI_FLOOR,
            PSI_SPLIT_EPOCH,
            q_drift_psi,
        )

        rows = {r["bin"]: r for r in q_drift_psi(spark, sf_dir).collect()}
        pdf = (
            _events(spark, sf_dir)
            .selectExpr("cast(ts as long) as ep", "value")
            .toPandas()
        )
        base = pdf[pdf.ep < PSI_SPLIT_EPOCH]["value"].to_numpy()
        cur = pdf[pdf.ep >= PSI_SPLIT_EPOCH]["value"].to_numpy()
        edges = [
            round(float(np.percentile(base, p * 10, method="linear")), 6)
            for p in range(1, 10)
        ]
        def shares(x):
            bins = np.searchsorted(edges, x, side="left")
            # searchsorted(left): count of edges < x... our rule is
            # value > edge, i.e. bin = #edges strictly below value
            bins = np.array([sum(v > e for e in edges) for v in x])
            return {
                b: max(np.count_nonzero(bins == b) / len(x), PSI_FLOOR)
                for b in range(10)
            }
        p, q = shares(base), shares(cur)
        total = 0.0
        for b, r in rows.items():
            want = (p[b] - q[b]) * math.log(p[b] / q[b])
            assert abs(r["psi_term"] - want) < 1e-6
            assert abs(r["p_base"] - round(p[b], 6)) < 1e-6
            total += r["psi_term"]
        assert abs(sum(r["p_base"] for r in rows.values()) - 1.0) < 1e-3
        assert abs(total) < 0.1  # stationary corpus → no drift signal


class TestCogroupAsofBucketed:
    def test_bucketed_cogroup_equals_jvm_twin(self, spark, sf_dir_t2):
        """The hash-bucketed cogroup (merge_asof by=user_id inside a
        bucket) must be row-identical to the JVM union-window operator
        — including view-only users, whose right-side by-group is
        absent and must surface as a NULL price, and equal-timestamp
        ties, which must resolve to MAX pval."""
        from defi_features_data_pipeline_spark.queries import ALL_QUERIES

        a = ALL_QUERIES["asof_price_cogroup_pandas"](spark, sf_dir_t2)
        b = ALL_QUERIES["asof_price"](spark, sf_dir_t2)
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols
        sa, sb = a.select(cols), b.select(cols)
        assert sa.exceptAll(sb).count() == 0
        assert sb.exceptAll(sa).count() == 0
        # non-vacuous: some views have no eligible purchase (null path)
        assert a.filter("asof_purchase_value IS NULL").count() > 0


class TestMultimodalResize:
    def test_stride_semantics_and_corpus_preconditions(self, spark, sf_dir):
        """The oracle's regex-subsample equals Python text[::4] only on
        newline-free single-byte text — assert the corpus precondition,
        then pin the resize length arithmetic."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.core import _t

        docs = _t(spark, sf_dir, "documents")
        assert docs.filter(
            F.col("text").contains("\n")
            | (F.length(F.encode("text", "utf-8")) != F.length("text"))
        ).count() == 0
        got = ALL_QUERIES["multimodal_resize"](spark, sf_dir)
        # ceil(orig/4) kept samples, never empty for non-empty docs
        bad = got.filter(
            F.col("resized_len") != F.ceil(F.col("orig_len") / 4)
        ).count()
        assert bad == 0
        assert got.filter("orig_len > 0 AND resized_len = 0").count() == 0


class TestBpeLearnMerges:
    def test_merge_sequence_matches_reference_bpe(self, spark, sf_dir):
        """The distributed merge loop must learn EXACTLY the same merge
        sequence (pairs, order, weighted counts) as a single-threaded
        reference BPE over the same tokenization — argmax ties broken
        (count desc, left, right) in both."""
        from collections import Counter

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.core import _t
        from defi_features_data_pipeline_spark.queries.extensions import (
            BPE_N_MERGES,
        )

        got = [
            (r.round, r.left, r.right, r.merged, r.pair_count)
            for r in ALL_QUERIES["bpe_learn_merges"](spark, sf_dir)
            .orderBy("round")
            .collect()
        ]

        texts = [
            r.text for r in _t(spark, sf_dir, "documents").select("text").collect()
        ]
        freq = Counter()
        for t in texts:
            for w in t.lower().split():
                freq[w] += 1
        vocab = {w: list(w) for w in freq if len(w) >= 2}

        want = []
        for rnd in range(1, BPE_N_MERGES + 1):
            pc = Counter()
            for w, syms in vocab.items():
                f = freq[w]
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (a, b), n = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            want.append((rnd, a, b, a + b, n))
            for w, syms in vocab.items():
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                vocab[w] = out

        assert got == want
        # non-vacuous: at least one merge consumes an earlier merge
        merged_syms = {m[3] for m in want}
        assert any(
            m[1] in merged_syms or m[2] in merged_syms for m in want
        ), "corpus never exercised a second-order merge"


class TestBpeTokenizeApply:
    def test_replace_pass_equals_reference_fold(self, spark, sf_dir):
        """The separator-string replace pass must implement exactly the
        greedy left-to-right non-overlapping BPE merge (the explicit
        list fold) — including overlap traps like 'aaa' under (a,a) —
        and the corpus must not contain the separator."""
        import random

        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.core import _t
        from defi_features_data_pipeline_spark.queries.extensions import (
            BPE_APPLY_MERGES,
            BPE_SEP,
        )

        docs = _t(spark, sf_dir, "documents")
        assert docs.filter(F.col("text").contains(BPE_SEP)).count() == 0

        def fold(word):
            syms = list(word)
            for a, b in BPE_APPLY_MERGES:
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                syms = out
            return syms

        def via_replace(word):
            s = BPE_SEP + BPE_SEP.join(list(word)) + BPE_SEP
            for a, b in BPE_APPLY_MERGES:
                for _ in range(2):  # two passes: see BPE_APPLY_MERGES
                    s = s.replace(
                        f"{BPE_SEP}{a}{BPE_SEP}{b}{BPE_SEP}",
                        f"{BPE_SEP}{a}{b}{BPE_SEP}",
                    )
            return s.strip(BPE_SEP).split(BPE_SEP)

        rng = random.Random(7)
        alphabet = "erinotha"
        words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
                 for _ in range(500)]
        words += ["ererer", "ththe", "thers", "eer", "erer", "r", "er",
                  "ononon", "rihnneononto", "onononononon"]
        for w in words:
            assert fold(w) == via_replace(w), w

        # per-doc totals must be consistent: tokens never exceed chars
        got = ALL_QUERIES["bpe_tokenize_apply"](spark, sf_dir)
        assert got.filter("n_bpe_tokens > n_chars").count() == 0
        assert got.filter("n_bpe_tokens <= 0").count() == 0


class TestUserEventSequences:
    def test_sequence_matches_sorted_events(self, spark, sf_dir):
        """The collected array must equal the (ts, event_id)-sorted
        event-type prefix for every user, regardless of partitioning."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.core import _events

        got = {
            r.user_id: (list(r.first_events), r.n_events)
            for r in ALL_QUERIES["user_event_sequences"](spark, sf_dir).collect()
        }
        rows = (
            _events(spark, sf_dir)
            .select("user_id", F.col("ts").cast("long").alias("t"),
                    "event_id", "event_type")
            .collect()
        )
        from collections import defaultdict

        per_user = defaultdict(list)
        for r in rows:
            per_user[r.user_id].append((r.t, r.event_id, r.event_type))
        for uid, evs in per_user.items():
            evs.sort()
            want = [y for _, _, y in evs[:5]]
            assert got[uid][0] == want, uid
            assert got[uid][1] == len(evs)


class TestGraphBfsDistance:
    def test_bfs_invariants(self, spark, sf_dir_t2):
        """Seeds at distance 0; every positive-distance node has a
        neighbor one hop closer; non-vacuous beyond the seed set."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.extensions import (
            BFS_SEED_MOD,
            _lsh_edges,
        )

        dist = ALL_QUERIES["graph_bfs_distance"](spark, sf_dir_t2)
        assert dist.filter(
            (F.col("doc_id") % BFS_SEED_MOD == 0) & (F.col("dist") != 0)
        ).count() == 0
        assert dist.filter("dist > 0").count() > 0

        e = _lsh_edges(spark, sf_dir_t2).select("doc_a", "doc_b")
        e = e.unionByName(
            e.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        d2 = dist.select(
            F.col("doc_id").alias("nb"), F.col("dist").alias("nb_dist")
        )
        witness = (
            dist.filter("dist > 0")
            .join(e, dist.doc_id == e.doc_a)
            .join(d2, e.doc_b == d2.nb)
            .groupBy("doc_id", "dist")
            .agg(F.min("nb_dist").alias("best_nb"))
        )
        assert witness.filter("best_nb != dist - 1").count() == 0
