"""Independent-reference tests for queries/learnops.py — pure-Python /
decimal recomputation, NOT the DuckDB oracle (the oracle gate proves
cross-engine agreement; these prove the shared formula itself is right
— the round-6 outlier_zscore lesson)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest


def _docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toPandas()
    )


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _q6(x: float) -> Decimal:
    """decimal(18,6) cast semantics (HALF_UP on the double's value)."""
    return Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)


class TestQualityClassifier:
    STOP = {"the", "a", "of", "and", "in", "to", "is"}

    def _features(self, pdf: pd.DataFrame):
        rows = []
        for did, text, nc in zip(pdf["doc_id"], pdf["text"], pdf["n_chars"]):
            tk = _toks(text)
            if not tk:
                continue
            nt = len(tk)
            stop = sum(1 for t in tk if t in self.STOP)
            chars = sum(len(t) for t in tk)
            rows.append(
                (
                    did,
                    1 if nc >= 300 else 0,
                    1.0,
                    nt / 100.0,
                    ((stop * 10000) // nt) / 10000.0,
                    ((chars * 10000) // (nt * 10)) / 10000.0,
                )
            )
        return rows

    def _train(self, rows):
        """Pure-Python GD mirror: rational sigmoid, floor-scaled 6 dp
        quantization, exact-Decimal gradient accumulation."""
        n = len(rows)
        w = [0.0, 0.0, 0.0, 0.0]
        for _ in range(8):
            g = [Decimal(0)] * 4
            for _, y, x0, x1, x2, x3 in rows:
                m = ((w[0] * x0 + w[1] * x1) + w[2] * x2) + w[3] * x3
                p = math.floor((0.5 + 0.5 * (m / (1.0 + abs(m)))) * 1e6) / 1e6
                r = _q6(y - p)
                for j, x in enumerate((x0, x1, x2, x3)):
                    g[j] += r * _q6(x)
            gs = [
                float(gj.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
                for gj in g
            ]
            w = [
                math.floor((w[j] + 0.5 * (gs[j] / n)) * 1e6) / 1e6
                for j in range(4)
            ]
        return w

    def test_weights_match_python_gd(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import _qc_train

        got, n = _qc_train(spark, sf_dir)
        rows = self._features(_docs(spark, sf_dir))
        assert n == len(rows)
        want = self._train(rows)
        assert got == pytest.approx(want, abs=0)  # bit-exact trajectory

    def test_classifier_beats_majority_baseline(self, spark, sf_dir):
        """The learned model must actually separate the label — in-
        sample accuracy strictly above the majority-class rate."""
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_quality_classifier_score,
        )

        pdf = q_quality_classifier_score(spark, sf_dir).toPandas()
        acc = (pdf["pred_high"] == pdf["label_high"]).mean()
        base = max(pdf["label_high"].mean(), 1 - pdf["label_high"].mean())
        assert acc > base + 0.02, (acc, base)

    def test_probabilities_are_quantized_and_bounded(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_quality_classifier_score,
        )

        pdf = q_quality_classifier_score(spark, sf_dir).toPandas()
        assert ((pdf["p_quality"] >= 0) & (pdf["p_quality"] <= 1)).all()
        # floor-scaled to 1e-6: scaling back up must give integers
        scaled = pdf["p_quality"] * 1e6
        assert (abs(scaled - scaled.round()) < 1e-6).all()


class TestDedupSubstringSpans:
    K = 8

    def test_matches_python_window_hashing(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_dedup_substring_spans,
        )

        got = {
            r["doc_id"]: r
            for r in q_dedup_substring_spans(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        wins: dict[int, list[int]] = {}
        owners: dict[int, set[int]] = defaultdict(set)
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            tk = _toks(text)
            hs = [
                _h32(" ".join(tk[i : i + self.K]))
                for i in range(len(tk) - self.K + 1)
            ]
            wins[did] = hs
            for h in hs:
                owners[h].add(did)
        assert set(got) == set(wins)
        for did, hs in wins.items():
            dup = sum(1 for h in hs if len(owners[h]) >= 2)
            assert got[did]["n_windows"] == len(hs)
            assert got[did]["dup_windows"] == dup
            if hs:
                assert got[did]["dup_fraction"] == pytest.approx(
                    dup / len(hs), abs=1e-6
                )
                assert got[did]["dup_heavy"] == (
                    got[did]["dup_fraction"] >= 0.25
                )
            else:
                assert got[did]["dup_fraction"] == 0.0
                assert not got[did]["dup_heavy"]
        # the synthetic corpus must actually contain cross-doc spans,
        # or the operator is vacuous at this SF
        assert any(len(o) >= 2 for o in owners.values())


class TestUnigramPerplexityBuckets:
    def test_matches_python_unigram_lm(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_unigram_perplexity_buckets,
        )

        got = {
            r["doc_id"]: r
            for r in q_unigram_perplexity_buckets(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        tf: dict[str, int] = defaultdict(int)
        doc_toks = {}
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            tk = _toks(text)
            if tk:
                doc_toks[did] = tk
            for t in tk:
                tf[t] += 1
        total = float(sum(tf.values()))
        nll = {
            did: -sum(round(math.log(tf[t] / total), 10) for t in tk) / len(tk)
            for did, tk in doc_toks.items()
        }
        assert set(got) == set(doc_toks)
        for did in nll:
            assert got[did]["nll"] == pytest.approx(nll[did], abs=1e-5)
        # bucket assignment: SQL NTILE(3) semantics per language —
        # with n = q*3 + r, the first r buckets hold q+1 rows
        lang = {d: l for d, l in zip(pdf["doc_id"], pdf["lang"])}
        by_lang: dict[str, list[int]] = defaultdict(list)
        for did in doc_toks:
            by_lang[lang[did]].append(did)
        for lg, dids in by_lang.items():
            dids.sort(key=lambda d: (nll[d], d))
            n = len(dids)
            q, rem = divmod(n, 3)
            for r, did in enumerate(dids, start=1):
                if q == 0 or r <= (q + 1) * rem:
                    b = math.ceil(r / (q + 1))
                else:
                    b = rem + math.ceil((r - (q + 1) * rem) / q)
                want = {1: "head", 2: "middle", 3: "tail"}[b]
                assert got[did]["bucket"] == want, (lg, did)

    def test_each_language_has_all_three_buckets(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_unigram_perplexity_buckets,
        )

        pdf = q_unigram_perplexity_buckets(spark, sf_dir).toPandas()
        per = pdf.groupby("lang")["bucket"].nunique()
        assert (per[pdf.groupby("lang").size() >= 3] == 3).all()


class TestDedupSpanExtents:
    K = 8

    def test_matches_python_islands(self, spark, sf_dir):
        """Spans == maximal runs of consecutive duplicated window
        positions recomputed in pure Python."""
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_dedup_span_extents,
        )

        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_windows"])
            for r in q_dedup_span_extents(spark, sf_dir).collect()
        )
        pdf = _docs(spark, sf_dir)
        owners: dict[int, set[int]] = defaultdict(set)
        poshash = {}
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            tk = _toks(text)
            hs = [
                (i + 1, _h32(" ".join(tk[i : i + self.K])))
                for i in range(len(tk) - self.K + 1)
            ]
            poshash[did] = hs
            for _, h in hs:
                owners[h].add(did)
        want = []
        for did, hs in poshash.items():
            dup_pos = [p for p, h in hs if len(owners[h]) >= 2]
            run: list[int] = []
            for p in dup_pos + [None]:
                if run and (p is None or p != run[-1] + 1):
                    s, e = run[0], run[-1] + self.K - 1
                    want.append((did, s, e, e - s + 1, len(run)))
                    run = []
                if p is not None:
                    run.append(p)
        assert got == sorted(want)
        assert got  # corpus must contain at least one span at this SF

    def test_spans_do_not_overlap_within_doc(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_dedup_span_extents,
        )

        by_doc: dict[int, list] = defaultdict(list)
        for r in q_dedup_span_extents(spark, sf_dir).collect():
            by_doc[r["doc_id"]].append((r["span_start"], r["span_end"]))
        for spans in by_doc.values():
            spans.sort()
            for (s1, e1), (s2, _) in zip(spans, spans[1:]):
                # maximal islands: next span starts AFTER a gap of at
                # least one non-duplicated window position
                assert s2 > e1 - self.K + 2


class TestEmbeddingPcaPower:
    def test_matches_numpy_eigendecomposition(self, spark, sf_dir):
        """Loadings == numpy's dominant eigenvector of the centered
        scatter matrix (up to the 6 dp quantization), eigenvalue ==
        the dominant eigenvalue."""
        import numpy as np

        from defi_features_data_pipeline_spark.queries.learnops import (
            PCA_D,
            q_embedding_pca_power,
        )

        rows = q_embedding_pca_power(spark, sf_dir).collect()
        v = np.zeros(PCA_D)
        for r in rows:
            v[r["dim"]] = r["loading"]
        lam = rows[0]["eigenvalue"]
        pdf = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .toPandas()
        )
        x = np.array([list(e[:PCA_D]) for e in pdf["embedding"]], dtype=np.float64)
        xc = x - x.mean(axis=0)
        g = xc.T @ xc
        evals, evecs = np.linalg.eigh(g)
        top = evecs[:, -1]
        cos = abs(float(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top)))
        assert cos > 1 - 1e-6, cos
        assert lam == pytest.approx(float(evals[-1]), rel=1e-5)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


class TestEmbeddingPcaProject:
    def test_matches_numpy_projection(self, spark, sf_dir):
        import numpy as np

        from defi_features_data_pipeline_spark.queries.learnops import (
            PCA_D,
            q_embedding_pca_project,
        )

        got = {
            r["vec_id"]: (r["pc1_score"], r["resid_sq"])
            for r in q_embedding_pca_project(spark, sf_dir).collect()
        }
        pdf = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .toPandas()
        )
        x = np.array([list(e[:PCA_D]) for e in pdf["embedding"]], dtype=np.float64)
        xc = x - x.mean(axis=0)
        g = xc.T @ xc
        _, evecs = np.linalg.eigh(g)
        top = evecs[:, -1]
        proj = xc @ top
        # sign of the fitted component is deterministic but arbitrary
        # vs numpy's — align on the best-correlated sign
        ours = np.array([got[v][0] for v in pdf["vec_id"]])
        if float(np.dot(ours, proj)) < 0:
            proj = -proj
        assert np.abs(ours - proj).max() < 1e-4
        resid = (xc * xc).sum(axis=1) - proj * proj
        ours_r = np.array([got[v][1] for v in pdf["vec_id"]])
        assert np.abs(ours_r - resid).max() < 1e-4
        assert (ours_r >= -1e-6).all()  # residual energy is non-negative


class TestDocLmInterpolated:
    def test_matches_python_jelinek_mercer(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_doc_lm_interpolated,
        )

        got = {
            r["doc_id"]: r for r in q_doc_lm_interpolated(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        c12: dict[tuple, int] = defaultdict(int)
        doc_bgs = {}
        for did, text in zip(pdf["doc_id"], pdf["text"]):
            tk = _toks(text)
            bgs = list(zip(tk, tk[1:]))
            if bgs:
                doc_bgs[did] = bgs
            for bg in bgs:
                c12[bg] += 1
        c1: dict[str, int] = defaultdict(int)
        cw: dict[str, int] = defaultdict(int)
        for (w1, w2), c in c12.items():
            c1[w1] += c
            cw[w2] += c
        n = float(sum(cw.values()))
        assert set(got) == set(doc_bgs)
        for did, bgs in doc_bgs.items():
            s = sum(
                round(
                    math.log(
                        0.5 * (c12[(w1, w2)] / c1[w1]) + 0.5 * (cw[w2] / n)
                    ),
                    10,
                )
                for w1, w2 in bgs
            ) / len(bgs)
            assert got[did]["n_bigrams"] == len(bgs)
            assert got[did]["lm_score"] == pytest.approx(s, abs=1e-6)

    def test_interpolation_differs_from_pure_bigram(self, spark, sf_dir):
        """Smoothing must actually change scores vs the raw-MLE bigram
        gate (else the operator is a rename)."""
        from defi_features_data_pipeline_spark.queries.extensions import (
            q_doc_lm_score,
        )
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_doc_lm_interpolated,
        )

        a = {r["doc_id"]: r["lm_score"] for r in q_doc_lm_interpolated(spark, sf_dir).collect()}
        b = {r["doc_id"]: r["lm_score"] for r in q_doc_lm_score(spark, sf_dir).collect()}
        diffs = [abs(a[d] - b[d]) for d in a]
        assert max(diffs) > 1e-3


class TestTokenBudgetSelection:
    def test_budget_respected_and_maximal(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            TOKEN_BUDGET_PCT,
            q_quality_classifier_score,
            q_token_budget_selection,
        )

        kept = {
            r["doc_id"]: r for r in q_token_budget_selection(spark, sf_dir).collect()
        }
        scores = {
            r["doc_id"]: r["p_quality"]
            for r in q_quality_classifier_score(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        ntok = {
            did: len(_toks(t))
            for did, t in zip(pdf["doc_id"], pdf["text"])
            if _toks(t)
        }
        total = sum(ntok.values())
        budget = (total * TOKEN_BUDGET_PCT) // 100
        order = sorted(ntok, key=lambda d: (-scores[d], d))
        cum, want = 0, {}
        for d in order:
            cum += ntok[d]
            if cum <= budget:
                want[d] = cum
            else:
                break  # prefix selection: first overflow ends the take
        assert {d: r["cum_tokens"] for d, r in kept.items()} == want
        if kept:
            assert max(r["cum_tokens"] for r in kept.values()) <= budget


class TestTrainingShardManifest:
    def test_matches_python_shuffle(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            SHARD_COUNT,
            q_training_shard_manifest,
        )

        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in q_training_shard_manifest(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        by_shard: dict[int, list] = defaultdict(list)
        for did in pdf["doc_id"]:
            sh = _h32(f"shard:{did}") % SHARD_COUNT
            by_shard[sh].append((_h32(f"order:{did}"), did))
        want = {}
        for sh, lst in by_shard.items():
            for pos, (_, did) in enumerate(sorted(lst), start=1):
                want[did] = (sh, pos)
        assert got == want
        # every shard is contiguous 1..n and the shuffle actually
        # decorrelates from doc_id order (some shard is non-monotone)
        nonmono = 0
        for sh, lst in by_shard.items():
            docs_in_rank_order = [d for _, d in sorted(lst)]
            if docs_in_rank_order != sorted(docs_in_rank_order):
                nonmono += 1
        assert nonmono > 0


class TestGroupedNtile:
    def test_matches_window_ntile(self, spark, sf_dir):
        """grouped_ntile must equal Spark's own NTILE window (the
        single-task-per-group plan it replaces) on a real frame with
        uneven group sizes."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.operators.ranking import (
            grouped_ntile,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang", "n_chars"
        )
        got = {
            r["doc_id"]: r["b"]
            for r in grouped_ntile(
                d, 4, ["lang"], ["n_chars", "doc_id"], bucket_col="b"
            ).collect()
        }
        w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        want = {
            r["doc_id"]: r["b"]
            for r in d.withColumn("b", F.ntile(4).over(w)).collect()
        }
        assert got == want

    def test_parallel_rank_spans_partitions(self, spark, sf_dir):
        """The point of the rewrite: the ranked frame must NOT be
        collapsed to one partition per group — with more input
        partitions than groups, at least one group must span several
        range partitions."""
        from pyspark.sql import functions as F

        from defi_features_data_pipeline_spark.operators.ranking import (
            grouped_rank,
        )

        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "n_chars")
            .repartition(16)
        )
        ranked, totals = grouped_rank(d, ["lang"], ["n_chars", "doc_id"])
        # recompute pid spread per group on the materialized frame
        spread = (
            ranked.withColumn("__p", F.spark_partition_id())
            .groupBy("lang")
            .agg(F.countDistinct("__p").alias("np"))
            .collect()
        )
        assert max(r["np"] for r in spread) > 1
        assert sum(totals.values()) == d.count()


class TestStreamingQualityFilter:
    def test_stream_equals_batch_filter(self, spark, sf_dir):
        """Over bounded input the streaming filter's kept set must
        equal the batch score gate filtered at p >= 0.5 — same frozen
        weights, same stateless scoring expression."""
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_quality_classifier_score,
            q_streaming_quality_filter,
        )

        got = {
            r["doc_id"]: r["p_quality"]
            for r in q_streaming_quality_filter(spark, sf_dir).collect()
        }
        batch = {
            r["doc_id"]: r["p_quality"]
            for r in q_quality_classifier_score(spark, sf_dir).collect()
            if r["p_quality"] >= 0.5
        }
        assert got == batch
        assert got  # the filter must keep something at this SF


class TestDsirImportanceWeights:
    def test_matches_python_likelihood_ratio(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_dsir_importance_weights,
        )

        got = {
            r["doc_id"]: r
            for r in q_dsir_importance_weights(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        c_raw: dict[str, int] = defaultdict(int)
        c_tgt: dict[str, int] = defaultdict(int)
        doc_toks = {}
        for did, text, lg in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
            tk = _toks(text)
            if tk:
                doc_toks[did] = tk
            for t in tk:
                c_raw[t] += 1
                if lg == "en":
                    c_tgt[t] += 1
        n_raw = float(sum(c_raw.values()))
        n_tgt = float(sum(c_tgt.values()))
        v = float(len(c_raw))
        assert set(got) == set(doc_toks)
        for did, tk in doc_toks.items():
            w = sum(
                round(
                    math.log(
                        ((c_tgt[t] + 1) / (n_tgt + v))
                        / ((c_raw[t] + 1) / (n_raw + v))
                    ),
                    10,
                )
                for t in tk
            ) / len(tk)
            assert got[did]["n_tokens"] == len(tk)
            assert got[did]["dsir_weight"] == pytest.approx(w, abs=1e-5)
            assert got[did]["selected"] == (got[did]["dsir_weight"] > 0)

    def test_target_docs_score_higher(self, spark, sf_dir):
        """The weight must actually separate the target domain: mean
        weight of target-language docs above mean of the rest."""
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_dsir_importance_weights,
        )

        pdf = q_dsir_importance_weights(spark, sf_dir).toPandas()
        tgt = pdf.loc[pdf["lang"] == "en", "dsir_weight"].mean()
        rest = pdf.loc[pdf["lang"] != "en", "dsir_weight"].mean()
        assert tgt > rest


class TestDomainMixtureSample:
    def test_matches_python_integer_rates(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_domain_mixture_sample,
        )

        got = {
            r["source"]: r for r in q_domain_mixture_sample(spark, sf_dir).collect()
        }
        pdf = _docs(spark, sf_dir)
        n_total = len(pdf)
        boost = {"src0", "src1", "src2", "src3"}
        counts = pdf.groupby("source").size().to_dict()
        for src, c in counts.items():
            tgt = 100_000 if src in boost else 37_500
            keep_ppm = min(1_000_000, (tgt * n_total) // c)
            kept = sum(
                1
                for did in pdf.loc[pdf["source"] == src, "doc_id"]
                if _h32(f"mix:{did}") % 1_000_000 < keep_ppm
            )
            assert got[src]["n_in"] == c
            assert got[src]["keep_ppm"] == keep_ppm
            assert got[src]["n_kept"] == kept

    def test_downsampling_actually_happens(self, spark, sf_dir):
        from defi_features_data_pipeline_spark.queries.learnops import (
            q_domain_mixture_sample,
        )

        pdf = q_domain_mixture_sample(spark, sf_dir).toPandas()
        assert (pdf["n_kept"] <= pdf["n_in"]).all()
        assert (pdf["n_kept"] < pdf["n_in"]).any()  # some source shrank
