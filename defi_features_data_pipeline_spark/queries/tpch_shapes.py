"""Correlated-subquery decorrelation family (TPC-H Q2/Q4/Q11/Q15/Q17/
Q18/Q21/Q22 shapes) over the driver testdata.

Each DuckDB oracle is the LITERAL correlated-subquery SQL (EXISTS /
NOT EXISTS / IN / correlated scalar); the Spark side is the
hand-decorrelated DataFrame plan a distributed engine must run instead
(windows, semi/anti joins, scalar-subquery thresholds,
aggregate-then-join-back). The gate therefore proves each
decorrelation is semantics-preserving — the core rewrite battery of
any warehouse query engine, and the shape the reference's Athena SQL
relies on the warehouse to perform (SURVEY §2.3-§2.4; reference
analogues noted per query).

Relationship to queries/core.py's q_small_quantity_revenue /
q_top_supplier_share / q_important_stock (same TPC-H ancestries):
those gate the PLAN SHAPE against an already-decorrelated CTE oracle;
the queries here gate the REWRITE ITSELF — their oracles keep the
correlation, so a semantic drift between the correlated form and the
decorrelated plan fails the hash even if both engines agree on the
decorrelated algebra. Predicates, date windows, and output columns
also differ; none is a re-registration of a core query.

Determinism contract (same as queries/core.py): money/quantity sums go
through exact DECIMAL(38,10) (or narrower) accumulation; thresholds
derived from aggregates are computed in IEEE doubles from those exact
sums with the identical expression in both engines, so every filter
boundary lands on the same side. Raw stored doubles compare exactly.

100 TB notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .core import _t

DEC = "decimal(38,10)"

TPCH_QUERIES: dict = {}
TPCH_ORACLES: dict = {}

# Exact-decimal sum cast back to double via VARCHAR on the DuckDB side
# (see queries/core.py docstring: DuckDB's direct decimal->double cast
# is not correctly rounded).
_D2D = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Q2 shape — correlated MIN: rows equal to their group's minimum
# ---------------------------------------------------------------------------


def q_cheapest_lineitem_per_order(spark, sf_dir):
    """TPC-H Q2 shape — `WHERE price = (SELECT min(price) ... same
    order)`: the correlated scalar-min subquery decorrelated as a
    window MIN over the correlation key (ONE shuffle on l_orderkey, no
    join-back, no per-row subquery). Equality is on the raw stored
    double — no arithmetic, so both engines compare identical bits.

    100 TB: a window min is a single hash-exchange + in-partition
    scan; the naive correlated form would be a per-row aggregate probe.
    Ties (two items at the min price) are kept by BOTH forms — the
    rewrite must not dedup.

    Reference analogue: min-block/min-timestamp lookups in
    src/pipelines/features/transformations/view_defi_borrow_features.sql."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    w = Window.partitionBy("l_orderkey")
    return (
        li.withColumn("__mn", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__mn"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


TPCH_ORACLES["cheapest_lineitem_per_order"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem l
WHERE l_extendedprice = (
  SELECT min(l2.l_extendedprice) FROM lineitem l2
  WHERE l2.l_orderkey = l.l_orderkey)
"""
TPCH_QUERIES["cheapest_lineitem_per_order"] = q_cheapest_lineitem_per_order


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS with a correlated non-equi predicate
# ---------------------------------------------------------------------------


def q_priority_count_exists(spark, sf_dir):
    """TPC-H Q4 shape — order-priority counts over one quarter where
    EXISTS a lineitem shipped after the order date. The EXISTS
    decorrelates to a LEFT SEMI join on the key plus the non-equi
    residual (l_shipdate > o_orderdate); semi stops at first match, so
    multi-match orders are not double-counted.

    100 TB: the quarter filter is pushed to the orders scan
    (partition-prunable on a date-partitioned lake); the semi join
    shuffles both sides once on orderkey; the final rollup has ~5 keys
    and is map-side combinable."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1998-01-01")
            & (F.col("o_orderdate") < "1998-04-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


TPCH_ORACLES["priority_count_exists"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1998-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
"""
TPCH_QUERIES["priority_count_exists"] = q_priority_count_exists


# ---------------------------------------------------------------------------
# Q11 shape — HAVING vs an uncorrelated scalar aggregate of the whole table
# ---------------------------------------------------------------------------


def q_nation_balance_share(spark, sf_dir):
    """TPC-H Q11 shape — nations whose supplier-balance sum exceeds 5%
    of the GLOBAL supplier-balance sum. The scalar subquery
    decorrelates to a 1-row aggregate broadcast against the per-nation
    rollup (Spark plans the literal-free cross join of a 1-row frame
    as a broadcast — no shuffle of the big side).

    Determinism: both sums accumulate in decimal(38,10); the 5%
    threshold compare runs in doubles derived from those exact sums
    with the identical expression (0.05 * global) in both engines.

    100 TB: two scans of supplier (one per aggregate) — or one shared
    scan with a grouping-sets rewrite if supplier were large; the
    per-nation rollup is map-side combinable; nation dim broadcasts."""
    s = _t(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    bal = F.col("s_acctbal").cast(DEC)
    per_nation = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(bal).cast("double").alias("nation_bal"))
    )
    total = s.agg(F.sum(bal).cast("double").alias("__tot"))
    # scalar subquery (not a 1-row broadcast join): an inequality
    # threshold cannot be folded into a join condition, so a crossJoin
    # here would plan as BroadcastNestedLoopJoin — .scalar() embeds the
    # aggregate result as a literal instead (see q_watermark_filter)
    return per_nation.filter(
        F.col("nation_bal") > F.lit(0.05) * total.scalar()
    ).select("n_name", F.round("nation_bal", 6).alias("nation_bal"))


TPCH_ORACLES["nation_balance_share"] = f"""
WITH per_nation AS (
  SELECT n_name,
         {_D2D.format(x="SUM(CAST(s_acctbal AS DECIMAL(38,10)))")} AS nation_bal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1
)
SELECT n_name, round(nation_bal, 6) AS nation_bal
FROM per_nation
WHERE nation_bal > 0.05 * (
  SELECT {_D2D.format(x="SUM(CAST(s_acctbal AS DECIMAL(38,10)))")} FROM supplier)
"""
TPCH_QUERIES["nation_balance_share"] = q_nation_balance_share


# ---------------------------------------------------------------------------
# Q15 shape — view + uncorrelated scalar MAX over the view
# ---------------------------------------------------------------------------


def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape — supplier(s) achieving the MAX quarterly
    revenue: the revenue view is computed ONCE, and the `= (SELECT
    max(..) FROM view)` scalar subquery becomes a 1-row max aggregate
    broadcast-joined back to the view. Revenue totals are exact
    decimals, so the max-equality row set is engine-independent (ties
    would be kept by both).

    100 TB: the view aggregate shuffles lineitem once on suppkey
    (map-side combinable); the max is a 1-row reduce; supplier dim
    broadcasts. The view is small (one row per supplier), so Spark
    re-computing it for the max branch is two cheap stages — at real
    scale, cache/checkpoint the view once."""
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast(DEC)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    view = li.groupBy("l_suppkey").agg(F.sum(rev).alias("__tot"))
    mx = view.agg(F.max("__tot").alias("__mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        view.join(F.broadcast(mx))
        .filter(F.col("__tot") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__tot").cast("double"), 6).alias("total_rev"),
        )
    )


TPCH_ORACLES["top_supplier_revenue"] = f"""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,10))) AS tot
  FROM lineitem
  WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       round({_D2D.format(x="tot")}, 6) AS total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE tot = (SELECT max(tot) FROM rev)
"""
TPCH_QUERIES["top_supplier_revenue"] = q_top_supplier_revenue


# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar AVG threshold per group
# ---------------------------------------------------------------------------


def q_small_qty_order_revenue(spark, sf_dir):
    """TPC-H Q17 shape — revenue from lineitems whose quantity is below
    20% of their part's average quantity. The correlated `(SELECT
    0.2*avg(qty) WHERE same part)` decorrelates to a per-part aggregate
    joined back on partkey.

    Determinism: the per-part average is sum/count with the sum exact
    in decimal(38,10); the 0.2*avg threshold and the `<` compare run in
    doubles derived identically in both engines.

    100 TB: the brand filter prunes the part dim, and the per-part
    stats are computed over the ALREADY-pruned fact (the brand is a
    part attribute, so every row of a surviving partkey survives the
    join — the per-part average is unchanged). The stats frame is one
    row per surviving part — still CORPUS-SCALED (part count grows
    with the corpus), so it is NOT broadcast-hinted: the stats↔fact
    join shuffles on l_partkey (both sides already hash-compatible),
    and AQE may still broadcast it at runtime from the stage's ACTUAL
    size — the estimate-independent policy the sf10 probe taught
    (session.py broadcast policy)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#4").select(
        "p_partkey"
    )
    branded = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    stats = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg_qty")
    )
    small = (
        branded
        .join(stats, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty"))
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_rows"),
        F.round(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0),
            2,
        ).alias("avg_yearly"),
    )


TPCH_ORACLES["small_qty_order_revenue"] = f"""
SELECT count(*) AS n_small_rows,
       round({_D2D.format(x="SUM(CAST(l.l_extendedprice AS DECIMAL(38,10)))")} / 7.0, 2)
         AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < 0.2 * (
    SELECT {_D2D.format(x="SUM(CAST(l2.l_quantity AS DECIMAL(38,10)))")} / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""
TPCH_QUERIES["small_qty_order_revenue"] = q_small_qty_order_revenue


# ---------------------------------------------------------------------------
# Q18 shape — IN over an aggregate-HAVING subquery
# ---------------------------------------------------------------------------


def q_large_order_customers(spark, sf_dir):
    """TPC-H Q18 shape — orders whose total quantity exceeds 250, with
    their customer. `o_orderkey IN (SELECT .. HAVING sum(qty) > 250)`
    decorrelates to aggregate-then-join: the per-order quantity rollup
    (exact decimal vs an exact decimal literal — no float boundary) is
    joined INNER to orders, which both filters (IN) and carries sum_qty
    to the output. Customer dim broadcasts.

    100 TB: one shuffle of lineitem on orderkey (map-side combinable),
    one shuffle of orders on orderkey for the join (or zero if both are
    bucketed on orderkey); the HAVING prunes the agg to ~1% before the
    join, so AQE can flip it to broadcast at runtime."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__sq"))
        .filter(F.col("__sq") > F.lit(250).cast(DEC))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("__sq").cast("double"), 6).alias("sum_qty"),
        )
    )


TPCH_ORACLES["large_order_customers"] = f"""
SELECT c_name, c_custkey, o_orderkey, o_totalprice,
       round({_D2D.format(x="(SELECT SUM(CAST(l2.l_quantity AS DECIMAL(38,10))) FROM lineitem l2 WHERE l2.l_orderkey = o.o_orderkey)")}, 6) AS sum_qty
FROM orders o JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,10))) > CAST(250 AS DECIMAL(38,10)))
"""
TPCH_QUERIES["large_order_customers"] = q_large_order_customers


# ---------------------------------------------------------------------------
# Q21 shape — EXISTS + NOT EXISTS, both correlated, over the same relation
# ---------------------------------------------------------------------------


def q_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape — suppliers whose late lineitems (shipped > 90
    days after the order date) sit in multi-supplier orders where they
    are the ONLY late supplier. The EXISTS (another supplier in the
    order) + NOT EXISTS (another LATE supplier) pair decorrelates to
    ONE per-(order, supplier) aggregate followed by a per-order
    aggregate — no self-join of lineitem against itself at all:

      pair level:  n_late_items = count of this supplier's late items,
                   any_late     = n_late_items > 0
      order level: ns = #distinct suppliers, nl = #late suppliers
      keep pairs with any_late AND ns >= 2 AND nl = 1; numwait sums
      n_late_items (Q21 counts late LINEITEMS, not pairs).

    Top-10 by numwait with s_name as the total tie-break keeps the
    boundary engine-independent.

    100 TB: the orderkey shuffle that the lineitem⋈orders sort-merge
    join pays is the ONLY fact exchange in the whole chain — the
    (orderkey, suppkey) pair aggregate is clustered by the join's
    output partitioning, and the order-level ns/nl are WINDOW
    aggregates over that same partitioning (no join-back, no second
    exchange, no recomputation of the pair subtree). Supplier dim
    broadcasts. The naive form is two correlated semi/anti probes per
    lineitem."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    pair = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("n_late_items"))
        .withColumn("any_late", (F.col("n_late_items") > 0).cast("int"))
    )
    w = Window.partitionBy("l_orderkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    kept = (
        pair.withColumn("ns", F.count(F.lit(1)).over(w))
        .withColumn("nl", F.sum("any_late").over(w))
        .filter((F.col("any_late") == 1) & (F.col("ns") >= 2) & (F.col("nl") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        kept.groupBy("s_name")
        .agg(F.sum("n_late_items").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


TPCH_ORACLES["sole_late_supplier"] = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""
TPCH_QUERIES["sole_late_supplier"] = q_sole_late_supplier


# ---------------------------------------------------------------------------
# Q22 shape — NOT EXISTS (anti join) + uncorrelated scalar AVG threshold
# ---------------------------------------------------------------------------


def q_idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape — per-nation count/balance of customers whose
    balance beats the positive-balance average but have placed NO order
    since 2000-01-01. The scalar AVG decorrelates to a 1-row aggregate
    broadcast; the NOT EXISTS to a LEFT ANTI join against the
    date-filtered orders.

    Determinism: the average threshold is exact-decimal-sum / count in
    doubles, identically derived in both engines; the output balance
    sum is exact decimal.

    100 TB: the anti join's right side is pre-filtered and projected to
    one bigint column; the date filter pushes to the orders scan. The
    final rollup has ~25 nation keys, map-side combinable."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    bal = F.col("c_acctbal").cast(DEC)
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    # scalar subquery, not a 1-row broadcast join (inequality filter —
    # see q_nation_balance_share)
    return (
        c.filter(F.col("c_acctbal") > thr.scalar())
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(bal).cast("double"), 6).alias("totacctbal"),
        )
    )


TPCH_ORACLES["idle_customer_balance"] = f"""
SELECT c_nationkey, count(*) AS numcust,
       round({_D2D.format(x="SUM(CAST(c_acctbal AS DECIMAL(38,10)))")}, 6) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT {_D2D.format(x="SUM(CAST(c_acctbal AS DECIMAL(38,10)))")} / count(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= '2000-01-01')
GROUP BY 1
"""
TPCH_QUERIES["idle_customer_balance"] = q_idle_customer_balance
