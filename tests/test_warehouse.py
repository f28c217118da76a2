"""Tests for queries/warehouse.py — the SQL-surface correctness traps:
null-aware NOT IN three-valued logic, recursive-CTE depth handling,
UNPIVOT reshaping, MERGE changeset invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defi_features_data_pipeline_spark.queries import ALL_QUERIES
from defi_features_data_pipeline_spark.queries.warehouse import (
    MERGE_INS_OFFSET,
    _merge_changes,
)


class TestNotInNullAware:
    def test_null_in_subquery_empties_result(self, spark):
        """The branch the gate can't exercise: a NULL anywhere in the
        NOT IN subquery makes the predicate never-true. The rewrite's
        guard scalar subquery must reproduce that — and it must agree
        with Spark's own literal NOT IN."""
        big = spark.range(10).withColumnRenamed("id", "k")
        small = spark.createDataFrame([(1,), (None,)], "k bigint")
        big.createOrReplaceTempView("t_big")
        small.createOrReplaceTempView("t_small")
        literal = spark.sql(
            "SELECT k FROM t_big WHERE k NOT IN (SELECT k FROM t_small)"
        )
        rewrite = spark.sql("""
            SELECT k FROM t_big
            WHERE k IS NOT NULL
              AND (SELECT count(*) FROM t_small WHERE k IS NULL) = 0
              AND NOT EXISTS (
                    SELECT 1 FROM t_small s WHERE s.k = t_big.k)
        """)
        assert literal.count() == 0
        assert rewrite.count() == 0

    def test_empty_subquery_keeps_outer_nulls(self, spark):
        """x NOT IN (empty set) is TRUE even for NULL x — the corner
        the naive 'k IS NOT NULL' rewrite gets wrong. Literal and
        rewrite must both return EVERY outer row, NULLs included."""
        big = spark.createDataFrame([(1,), (None,), (5,)], "k bigint")
        small = spark.createDataFrame([], "k bigint")
        big.createOrReplaceTempView("t_big")
        small.createOrReplaceTempView("t_small")
        literal = spark.sql(
            "SELECT k FROM t_big WHERE k NOT IN (SELECT k FROM t_small)"
        )
        rewrite = spark.sql("""
            SELECT k FROM t_big
            WHERE (SELECT count(*) FROM t_small WHERE k IS NULL) = 0
              AND (k IS NOT NULL OR (SELECT count(*) FROM t_small) = 0)
              AND NOT EXISTS (
                    SELECT 1 FROM t_small s WHERE s.k = t_big.k)
        """)
        assert literal.count() == 3
        assert rewrite.count() == 3

    def test_outer_null_rows_dropped_not_matched(self, spark):
        """Outer-side NULL keys are dropped (k NOT IN ... is NULL for
        NULL k), never treated as non-members."""
        big = spark.createDataFrame([(1,), (None,), (5,)], "k bigint")
        small = spark.createDataFrame([(1,)], "k bigint")
        big.createOrReplaceTempView("t_big")
        small.createOrReplaceTempView("t_small")
        rows = spark.sql(
            "SELECT k FROM t_big WHERE k NOT IN (SELECT k FROM t_small)"
        ).collect()
        assert [r.k for r in rows] == [5]

    def test_gate_null_path_non_vacuous(self, spark, sf_dir):
        """The gate's NULLIF-derived outer key actually produces NULL
        rows on this corpus (they must be absent from the result)."""
        from defi_features_data_pipeline_spark.queries.core import _t

        o = _t(spark, sf_dir, "orders")
        n_null = o.filter(F.expr("nullif(o_custkey % 100, 7) IS NULL")).count()
        assert n_null > 0
        got = ALL_QUERIES["not_in_null_aware"](spark, sf_dir)
        assert got.filter("o_custkey % 100 = 7").count() == 0


class TestRecursiveOrderChain:
    def test_chain_covers_all_orders_with_correct_depths(self, spark, sf_dir):
        """Every order appears exactly once; per-customer hop count is
        dense 1..n; recursion goes genuinely deep (max hop > 1)."""
        from defi_features_data_pipeline_spark.queries.core import _t

        got = ALL_QUERIES["recursive_order_chain"](spark, sf_dir)
        n_orders = _t(spark, sf_dir, "orders").count()
        assert got.count() == n_orders
        per_cust = got.groupBy("o_custkey").agg(
            F.count("*").alias("n"),
            F.max("hop").alias("maxh"),
            F.countDistinct("hop").alias("ndist"),
        )
        assert per_cust.filter("n != maxh OR n != ndist").count() == 0
        assert per_cust.agg(F.max("maxh")).first()[0] > 1

    def test_recursion_limit_exceeded_is_loud(self, spark):
        """A chain deeper than the level limit must raise, never
        silently truncate."""
        prev = spark.conf.get("spark.sql.cteRecursionLevelLimit", "100")
        spark.conf.set("spark.sql.cteRecursionLevelLimit", "5")
        try:
            with pytest.raises(Exception, match="(?i)recursion|limit"):
                spark.sql("""
                    WITH RECURSIVE t(n) AS (
                      SELECT 1
                      UNION ALL
                      SELECT n + 1 FROM t WHERE n < 50
                    ) SELECT count(*) FROM t
                """).collect()
        finally:
            spark.conf.set("spark.sql.cteRecursionLevelLimit", prev)


class TestChainClosure:
    def test_rounds_are_logarithmic_in_depth(self, spark):
        """Pointer doubling must finish one 64-deep chain in ~log2(64)
        rounds, not 64 — the whole point of the closure vs the
        per-level recursion. Values are pinned against the analytic
        prefix sums."""
        import math

        from defi_features_data_pipeline_spark.operators.graph import (
            chain_closure,
        )

        depth = 64
        rows = [(i, i - 1 if i > 0 else None, float(i + 1)) for i in range(depth)]
        nodes = spark.createDataFrame(
            rows, "id bigint, prev_id bigint, value double"
        )
        stats = {}
        got = {
            r["id"]: (r["hop"], float(r["cum"]))
            for r in chain_closure(nodes, stats=stats).collect()
        }
        assert stats["rounds"] <= math.ceil(math.log2(depth)) + 1  # 7, not 64
        for i in range(depth):
            want_cum = sum(range(1, i + 2))  # 1+2+...+(i+1)
            assert got[i] == (i + 1, float(want_cum))

    def test_cycle_raises_instead_of_truncating(self, spark):
        """A prev-pointer cycle never reaches a null head — the
        operator must fail loudly, not return truncated sums."""
        from defi_features_data_pipeline_spark.operators.graph import (
            chain_closure,
        )

        nodes = spark.createDataFrame(
            [(0, 2, 1.0), (1, 0, 1.0), (2, 1, 1.0)],
            "id bigint, prev_id bigint, value double",
        )
        with pytest.raises(RuntimeError, match="cycle|converge"):
            chain_closure(nodes, max_rounds=6)

    def test_closure_matches_recursive_gate(self, spark, sf_dir):
        """chain_closure is a pure plan upgrade of the recursive CTE:
        identical rows on the same corpus (both also share one oracle
        in the driver gate)."""
        a = ALL_QUERIES["chain_closure"](spark, sf_dir)
        b = ALL_QUERIES["recursive_order_chain"](spark, sf_dir)
        assert a.count() == b.count()
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


class TestUnpivotMetrics:
    def test_three_rows_per_customer_and_roundtrip(self, spark, sf_dir):
        got = ALL_QUERIES["unpivot_metrics"](spark, sf_dir)
        per_key = got.groupBy("o_custkey").count()
        assert per_key.filter("count != 3").count() == 0
        # melt⁻¹: pivoting back reproduces the wide aggregate
        wide = (
            got.groupBy("o_custkey")
            .pivot("metric", ["n_orders", "total_spend", "max_order"])
            .agg(F.first("val"))
        )
        assert wide.filter(
            "n_orders IS NULL OR total_spend IS NULL OR max_order IS NULL"
        ).count() == 0
        assert wide.filter("max_order > total_spend").count() == 0


class TestMergeApplyChanges:
    def test_merge_invariants(self, spark, sf_dir_t2):
        """U/D/I partition the changeset disjointly; inserted keys are
        offset-disjoint from base; deleted keys are absent; untouched
        base rows pass through with their original balance. Runs at
        sf0.01 — the smallest SF where order-less customers exist, so
        the passthrough branch is non-vacuous."""
        from defi_features_data_pipeline_spark.queries.core import _t

        sf_dir = sf_dir_t2
        ch = _merge_changes(spark, sf_dir)
        # ops are key-disjoint by construction
        assert ch.groupBy("k").count().filter("count > 1").count() == 0
        got = ALL_QUERIES["merge_apply_changes"](spark, sf_dir)
        base = _t(spark, sf_dir, "customer")

        n_ins = ch.filter("op = 'I'").count()
        assert n_ins > 0
        assert got.filter("row_src = 'inserted'").count() == n_ins
        assert (
            got.filter(f"c_custkey >= {MERGE_INS_OFFSET}").count() == n_ins
        )

        deleted = ch.filter("op = 'D'")
        assert deleted.count() > 0
        assert (
            got.join(deleted, got.c_custkey == deleted.k, "left_semi").count()
            == 0
        )

        untouched = base.join(ch, base.c_custkey == ch.k, "left_anti")
        n_untouched = untouched.count()
        assert n_untouched > 0
        passthrough = got.filter("row_src = 'base'").join(
            untouched.select(
                "c_custkey", F.col("c_acctbal").cast("double").alias("bal")
            ),
            "c_custkey",
        )
        assert passthrough.count() == n_untouched
        assert passthrough.filter("acctbal != bal").count() == 0


class TestTableFingerprint:
    def test_invariant_to_layout_sensitive_to_content(self, spark, sf_dir):
        """The checksum must not move under repartition/reorder (replica
        layouts differ) and MUST move when any row changes."""
        from defi_features_data_pipeline_spark.queries.core import _t

        base = {
            r.o_orderstatus: (r.n_rows, r.fingerprint)
            for r in ALL_QUERIES["table_fingerprint"](spark, sf_dir).collect()
        }
        from defi_features_data_pipeline_spark.queries.warehouse import (
            fingerprint_orders,
        )

        o = _t(spark, sf_dir, "orders")
        # the PRODUCTION expression over a shuffled layout
        shuffled = o.repartition(7, "o_custkey").sortWithinPartitions(
            "o_totalprice"
        )
        again = {
            r.o_orderstatus: (r.n_rows, r.fingerprint)
            for r in fingerprint_orders(shuffled).collect()
        }
        assert base == again
        # tamper one row -> that status's fingerprint moves, count same
        tampered = o.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == o.select(F.min("o_orderkey"))
                   .first()[0], F.col("o_totalprice") + 0.01)
            .otherwise(F.col("o_totalprice")),
        )
        t = {
            r.o_orderstatus: (r.n_rows, r.fingerprint)
            for r in fingerprint_orders(tampered).collect()
        }
        assert t != base
        assert {k: v[0] for k, v in t.items()} == {
            k: v[0] for k, v in base.items()
        }


class TestBitmapCountDistinct:
    def test_incremental_or_merge_equals_full(self, spark, sf_dir):
        """The storable-increment claim: per-bucket bitmaps built from
        two disjoint halves, OR-merged, must count exactly what a full
        pass counts — the merge path an incremental exact-distinct
        pipeline runs every batch."""
        from defi_features_data_pipeline_spark.queries.core import _events

        ev = _events(spark, sf_dir).select("event_type", "user_id", "event_id")
        full = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }

        def buckets(df):
            return (
                df.select(
                    "event_type",
                    F.expr("bitmap_bucket_number(user_id)").alias("bn"),
                    F.expr("bitmap_bit_position(user_id)").alias("bp"),
                )
                .groupBy("event_type", "bn")
                .agg(F.expr("bitmap_construct_agg(bp)").alias("bm"))
            )

        h1 = buckets(ev.filter("event_id % 2 = 0"))
        h2 = buckets(ev.filter("event_id % 2 = 1"))
        merged = (
            h1.unionByName(h2)
            .groupBy("event_type", "bn")
            .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
            .groupBy("event_type")
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
        )
        got = {r.event_type: r.n for r in merged.collect()}
        assert got == full


class TestResampleInterpolateLinear:
    def test_matches_numpy_interp(self, spark, sf_dir):
        """Per-user daily series must equal numpy.interp over the
        observed (day, value) points, to 1e-6."""
        import numpy as np

        from defi_features_data_pipeline_spark.queries.core import _events

        got = ALL_QUERIES["resample_interpolate_linear"](spark, sf_dir)
        ev = (
            _events(spark, sf_dir)
            .select("user_id", F.to_date("ts").alias("day"), "value")
            .groupBy("user_id", "day")
            .agg(
                F.round(
                    F.sum(F.col("value").cast("decimal(38,10)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("v")
            )
        )
        # spot-check the 3 users with the most observation days
        top = [
            r.user_id
            for r in ev.groupBy("user_id")
            .count()
            .orderBy(F.desc("count"), "user_id")
            .limit(3)
            .collect()
        ]
        for uid in top:
            obs = sorted(
                (r.day.toordinal(), r.v)
                for r in ev.filter(F.col("user_id") == uid).collect()
            )
            xs = [d for d, _ in obs]
            vs = [v for _, v in obs]
            rows = got.filter(F.col("user_id") == uid).collect()
            assert len(rows) == xs[-1] - xs[0] + 1
            n_obs = sum(1 for r in rows if r.observed)
            assert n_obs == len(xs)
            for r in rows:
                want = float(np.interp(r.day.toordinal(), xs, vs))
                assert abs(r.interp_value - want) < 1e-6, (uid, r)


class TestScd2DimensionJoin:
    def test_state_is_last_browse_before_purchase(self, spark, sf_dir):
        """Each purchase's browse_state must equal the event_type of
        the user's latest view/click at-or-before the purchase, and be
        NULL iff no such event exists — the half-open interval join
        re-derived independently per row."""
        from collections import defaultdict

        from defi_features_data_pipeline_spark.queries import ALL_QUERIES
        from defi_features_data_pipeline_spark.queries.core import _events

        got = {
            r.event_id: r.browse_state
            for r in ALL_QUERIES["scd2_dimension_join"](spark, sf_dir).collect()
        }
        rows = (
            _events(spark, sf_dir)
            .selectExpr(
                "user_id", "cast(ts as long) t", "event_type", "event_id"
            )
            .collect()
        )
        browse = defaultdict(list)
        purchases = []
        for r in rows:
            if r.event_type in ("view", "click"):
                browse[r.user_id].append((r.t, r.event_id, r.event_type))
            elif r.event_type == "purchase":
                purchases.append(r)
        assert len(got) == len(purchases)
        n_null = n_set = 0
        for p in purchases:
            prior = [
                (t, eid, y) for t, eid, y in browse[p.user_id]
                if (t, eid) <= (p.t, float("inf"))
                and t <= p.t
            ]
            want = max(prior)[2] if prior else None
            if want is None:
                n_null += 1
            else:
                n_set += 1
            assert got[p.event_id] == want, (p.event_id, got[p.event_id], want)
        assert n_set > 0  # non-vacuous match path


class TestExactMedianTwoPass:
    def test_matches_python_lower_median(self, spark, sf_dir):
        from collections import defaultdict

        got = {
            r.event_type: r.median_value
            for r in ALL_QUERIES["exact_median_twopass"](spark, sf_dir).collect()
        }
        from defi_features_data_pipeline_spark.queries.core import _events

        vals = defaultdict(list)
        for r in _events(spark, sf_dir).select("event_type", "value").collect():
            vals[r.event_type].append(r.value)
        for et, vs in vals.items():
            vs.sort()
            want = vs[(len(vs) - 1) // 2]
            assert got[et] == want, (et, got[et], want)

    def test_degenerate_and_duplicate_heavy_groups(self, spark, tmp_path):
        """All-equal groups short-circuit; a median sitting inside a
        run of duplicates is still the exact order statistic."""
        import datetime

        rows = []
        eid = 0
        ts = datetime.datetime(2024, 1, 1)
        for v in [5.0] * 7:                       # degenerate: lo == hi
            rows.append((eid, ts, 1, "flat", v, "{}")); eid += 1
        for v in [1.0, 2.0, 2.0, 2.0, 9.0, 10.0]:  # median inside dup run
            rows.append((eid, ts, 1, "dups", v, "{}")); eid += 1
        for v in [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]:  # even n
            rows.append((eid, ts, 1, "mixed", v, "{}")); eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        sf = str(tmp_path / "sfx")
        import os

        os.makedirs(sf)
        df.coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))
        got = {
            r.event_type: r.median_value
            for r in ALL_QUERIES["exact_median_twopass"](spark, sf).collect()
        }
        # lower medians: flat -> 5; dups: sorted [1,2,2,2,9,10] k=floor(5/2)+1=3 -> 2
        # mixed: sorted [1,1,2,3,4,5,6,9] k=4 -> 3
        assert got == {"flat": 5.0, "dups": 2.0, "mixed": 3.0}


class TestPrestoCompat:
    def test_translate_rewrites(self):
        from defi_features_data_pipeline_spark.sources.presto_compat import (
            translate_presto,
        )

        t = translate_presto
        assert t("SELECT arbitrary(x) FROM t") == "SELECT any_value(x) FROM t"
        assert (
            t("SELECT approx_distinct(u) FROM t")
            == "SELECT approx_count_distinct(u) FROM t"
        )
        assert (
            t("date_add('day', 30, ts)") == "timestampadd(day, 30, ts)"
        )
        assert (
            t("date_diff('second', a, b)") == "timestampdiff(second, a, b)"
        )
        assert t("cast(x as decimal)") == "cast(x as decimal(38,0))"
        # Spark's own 2-arg date_add must pass through untouched
        assert t("date_add(d, 3)") == "date_add(d, 3)"
        # already-precise decimal casts untouched
        assert t("cast(x as decimal(18,2))") == "cast(x as decimal(18,2))"

    def test_reference_view_shape_runs_verbatim(self, spark, sf_dir):
        """The exact construct shape the reference's lending view uses
        (cast(to_unixtime(<now>) as decimal) - min(epoch)) must run
        unmodified through the compat layer and produce the epoch
        arithmetic it means — and the bare-decimal widening must
        prevent Spark's decimal(10,0) overflow on epoch-scale values
        (1.7e9 fits decimal(10) but the sum path can exceed it)."""
        from defi_features_data_pipeline_spark.queries.core import _events
        from defi_features_data_pipeline_spark.sources.presto_compat import (
            run_presto_sql,
        )

        _events(spark, sf_dir).createOrReplaceTempView("pc_events")
        out = run_presto_sql(
            spark,
            """
            SELECT user_id,
                   cast(to_unixtime(timestamp '2026-01-01 00:00:00')
                        as decimal)
                     - min(cast(to_unixtime(ts) as bigint))
                     AS time_since_first
            FROM pc_events GROUP BY user_id
            """,
        ).collect()
        import datetime

        anchor = int(
            datetime.datetime(
                2026, 1, 1, tzinfo=datetime.timezone.utc
            ).timestamp()
        )
        ref = {
            r.user_id: anchor - int(r.mn.timestamp())
            for r in _events(spark, sf_dir)
            .selectExpr("user_id", "min(ts) over (partition by user_id) mn")
            .distinct()
            .collect()
        }
        got = {r.user_id: int(r.time_since_first) for r in out}
        assert got == ref


class TestJoinCardinalityAudit:
    def test_prediction_equals_actual_join_count(self, spark, sf_dir):
        """The audit's predicted row count must equal the ACTUAL inner
        join's count — and the audited 1:N invariant must hold."""
        from defi_features_data_pipeline_spark.queries.core import _t

        got = ALL_QUERIES["join_cardinality_audit"](spark, sf_dir).first()
        o = _t(spark, sf_dir, "orders")
        li = _t(spark, sf_dir, "lineitem")
        actual = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert got.predicted_join_rows == actual
        assert got.max_mult_left == 1
        assert got.n_many_to_many_keys == 0
