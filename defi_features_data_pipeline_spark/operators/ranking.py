"""Latest-per-group / top-k-per-group.

The reference expresses "each market's latest snapshot" as a MAX +
inequality self-join (J10,
`/root/reference/src/pipelines/features/transformations/view_defi_current_health_factor_features.sql:3-22`)
and "latest price per (event, token)" as MAX + equi-join-back (A7).
Both are one windowed ``row_number() = 1`` in Spark — one shuffle
instead of two, with explicit deterministic tie-breaking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _range_parts(df: DataFrame) -> int:
    """Partition count for the parallel range sorts below. Deliberately
    NOT ``df.rdd.getNumPartitions()``: under AQE, materializing ``.rdd``
    finalizes the adaptive plan, which EXECUTES every upstream shuffle
    stage as a throwaway job — the checkpoint pass then re-plans and
    re-runs the same subtree, so each ranking call paid one full extra
    execution of its input (r13-opt, guide §1.2 "don't compute things
    you throw away"). The session's default parallelism is the
    scale-adaptive stand-in: locally the core count, on a cluster the
    total executor cores — the same order the input partitioning had.
    Ranks/offsets are exact for ANY partition count (offset + local
    row_number is position-exact under range partitioning), so this
    changes job shape only, never results."""
    return max(df.sparkSession.sparkContext.defaultParallelism, 1)


def top_k_per_group(
    df: DataFrame,
    group_by: str | list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group under ``order_by`` (pass desc() columns for
    "largest"). Ties broken by the order columns supplied — pass a
    unique column last for full determinism."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def latest_per_group(
    df: DataFrame,
    group_by: str | list[str],
    time_col: str,
    tie_break: list[Column] | None = None,
) -> DataFrame:
    """The single latest row per group (J10 rewrite)."""
    order = [F.col(time_col).desc()] + (tie_break or [])
    return top_k_per_group(df, group_by, order, 1)


def global_rank(df: DataFrame, order_by: list[str], rank_col: str = "rank") -> DataFrame:
    """1-based dense global rank under a TOTAL order (include a unique
    column in ``order_by``) — without the single-partition collapse.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
    whole dataset to ONE task (Spark warns and then does it anyway) —
    instant death at 100 TB. This is the scalable rewrite:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on the order
       columns — a parallel range sort (sampled boundaries), the same
       machinery as a global ORDER BY;
    2. count rows per physical partition (tiny: P rows to the driver);
    3. rank = partition's cumulative offset + local row_number, where
       the window partitions BY spark_partition_id — fully parallel.

    Ranks are exact regardless of where the sampled range boundaries
    land, because ranges are non-overlapping and ordered: offset +
    local position IS the global position. Cost: one extra pass to
    count (cheap scan of the sorted intermediate), no extra shuffle.

    The sorted intermediate is localCheckpoint()ed before the size
    collect: repartitionByRange re-samples its boundaries per job (the
    sampler seed hangs off the fresh RDD id), so without freezing the
    partitioning, the sizes collected in job 1 could disagree with the
    __pid assignment in the consuming job and ranks would silently
    collide. Checkpointing pins one materialized partitioning that the
    size-collect, the ntile count, and the caller's action all share.
    """
    cols = [F.col(c) for c in order_by]
    n_part = _range_parts(df)
    ranged = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*cols)
    return ranged.withColumn(
        rank_col, (offset_expr + F.row_number().over(w)).cast("long")
    ).drop("__pid")


def global_ntile(
    df: DataFrame, k: int, order_by: list[str], bucket_col: str = "bucket"
) -> DataFrame:
    """Exact NTILE(k) over a total order, scalable (see global_rank).
    Matches SQL NTILE bucket-size semantics: with n = total rows,
    q = n // k, r = n % k, the first r buckets hold q+1 rows and the
    rest hold q."""
    ranked = global_rank(df, order_by, rank_col="__grank")
    n = ranked.count()
    q, r = divmod(n, k)
    big = (q + 1) * r  # rows covered by the q+1-sized buckets
    rank = F.col("__grank")
    bucket = F.when(
        F.lit(q == 0) | (rank <= big), F.ceil(rank / (q + 1))
    ).otherwise(F.lit(r) + F.ceil((rank - big) / F.lit(max(q, 1))))
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("__grank")


def grouped_rank(
    df: DataFrame,
    group_by: list[str],
    order_by: list[str],
    rank_col: str = "rank",
) -> tuple[DataFrame, dict[tuple, int]]:
    """1-based rank WITHIN each group under a total order, for
    LOW-CARDINALITY groups (languages, sources, event types) — without
    the group-per-task collapse.

    ``row_number() OVER (PARTITION BY lang ...)`` puts each language's
    ENTIRE corpus on one task — with 5 languages over 100 TB that is 5
    tasks doing all the work. This rewrite range-partitions on
    (group, order) — groups larger than a partition span several
    CONSECUTIVE partitions — then applies the global_rank offset trick
    per (partition, group): counts per (pid, group) go to the driver
    (bounded O(P·|groups|) metadata — that is why this is for
    low-cardinality groups; a high-cardinality PARTITION BY is already
    parallel and needs none of this), cumulative offsets per group in
    pid order come back as a literal map, and rank = group offset in
    this partition + local row_number partitioned by (pid, group).

    Group columns must be non-null (map keys join on a string
    concatenation). Returns (ranked_df, {group_tuple: total_rows}) —
    the totals are free (same collect) and grouped_ntile needs them.
    Group tuples hold Spark's cast('string') rendering of each group
    value (NOT Python str()) so they compose with cast('string')
    lookup keys for any group column type.

    Same checkpoint-pinning rationale as global_rank: the sampled
    range boundaries must not re-draw between the size collect and the
    consuming job."""
    gcols = [F.col(c) for c in group_by]
    ocols = [F.col(c) for c in order_by]
    n_part = _range_parts(df)
    ranged = (
        df.repartitionByRange(n_part, *gcols, *ocols)
        .sortWithinPartitions(*gcols, *ocols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # The size collect aggregates on the PRE-CAST string rendering of
    # the group columns so the driver-side map keys are Spark's OWN
    # renderings — Python str(value) diverges from cast('string') for
    # booleans ('True' vs 'true'), floats ('1e-07' vs '1.0E-7'),
    # timestamps and decimals, which would make the element_at lookup
    # return NULL and silently NULL every rank in that group.
    rows = (
        ranged.groupBy(
            "__pid",
            *[F.col(c).cast("string").alias(c) for c in group_by],
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    totals: dict[tuple, int] = {}
    offsets: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda r: r["__pid"]):
        gk = tuple(r[c] for c in group_by)
        offsets[(r["__pid"], *gk)] = totals.get(gk, 0)
        totals[gk] = totals.get(gk, 0) + r["n"]
    sep = "\x1f"
    key = F.concat_ws(
        sep, F.col("__pid").cast("string"), *[c.cast("string") for c in gcols]
    )
    items = [
        F.lit(x)
        for pk, off in offsets.items()
        for x in (sep.join(str(p) for p in pk), off)
    ]
    offset_expr = (
        F.element_at(F.create_map(*items), key) if items else F.lit(0)
    )
    w = Window.partitionBy("__pid", *group_by).orderBy(*ocols)
    return (
        ranged.withColumn(
            rank_col, (offset_expr + F.row_number().over(w)).cast("long")
        ).drop("__pid"),
        totals,
    )


def grouped_ntile(
    df: DataFrame,
    k: int,
    group_by: list[str],
    order_by: list[str],
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact NTILE(k) PER GROUP for low-cardinality groups, scalable
    (see grouped_rank). SQL NTILE semantics within each group: with
    n = group rows, q = n // k, r = n % k, the first r buckets hold
    q+1 rows and the rest hold q."""
    ranked, totals = grouped_rank(df, group_by, order_by, rank_col="__grank")
    sep = "\x1f"
    gkey = F.concat_ws(sep, *[F.col(c).cast("string") for c in group_by])
    items = [
        F.lit(x) for gk, n in totals.items() for x in (sep.join(gk), n)
    ]
    n_expr = (
        F.element_at(F.create_map(*items), gkey).cast("long")
        if items
        else F.lit(0).cast("long")
    )
    q = F.floor(n_expr / F.lit(k)).cast("long")
    r = n_expr % F.lit(k)
    big = (q + F.lit(1)) * r
    rank = F.col("__grank")
    bucket = F.when(
        (q == 0) | (rank <= big), F.ceil(rank / (q + F.lit(1)))
    ).otherwise(r + F.ceil((rank - big) / q))
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("__grank")


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D Pareto frontier: keep rows not dominated by any row with a
    strictly smaller ``x`` and a ``y`` at least as large (rows sharing
    an ``x`` never dominate each other). The quadratic NOT EXISTS is
    rewritten as: per-``x`` max of ``y`` (map-side combinable, |x|
    output rows), running prior-``x`` max over that small table (the
    only single-partition step — O(|distinct x|), bounded by the key
    domain, never the data), broadcast back, filter.

    ``x`` must be an orderable numeric (RANGE frame requirement);
    callers with dates pass a day number. Used by the
    ``pareto_frontier`` gate; property-tested against brute force in
    tests/test_properties.py."""
    xmax = df.groupBy(x).agg(F.max(F.col(y)).alias("__ymax"))
    w = Window.orderBy(x).rangeBetween(Window.unboundedPreceding, -1)
    prior = xmax.select(F.col(x), F.max("__ymax").over(w).alias("__prior_max"))
    return (
        df.join(F.broadcast(prior), x)
        .filter(
            F.col("__prior_max").isNull() | (F.col(y) > F.col("__prior_max"))
        )
        .drop("__prior_max")
    )


def global_prefix_sum(
    df: DataFrame,
    order_by: list[str],
    value_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` under a total order,
    without the single-partition collapse — the distributed prefix-sum
    (scan) primitive: same two-pass machinery as global_rank, but the
    per-partition offsets accumulate SUMS instead of row counts.
    Integer/decimal value columns give bit-exact results; the offsets
    collected to the driver are P scalars."""
    cols = [F.col(c) for c in order_by]
    n_part = _range_parts(df)
    ranged = (
        df.repartitionByRange(n_part, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0
    offset_expr = (
        F.element_at(
            F.create_map(
                *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
            ),
            F.col("__pid"),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranged.withColumn(
        out_col, (offset_expr + F.sum(value_col).over(w)).cast("long")
    ).drop("__pid")
