"""Point-in-interval (range) join without a nested loop.

Reference scope: the reference's range predicates are per-key time
windows (J3/P7, `transformations.sql:2-13`) which the as-of operator
covers; this operator handles the KEYLESS (or weakly-keyed) case —
"which events fall inside which windows" — where Spark's only native
plan for ``p.t BETWEEN i.start AND i.end`` is a
BroadcastNestedLoopJoin: O(|points| x |intervals|) comparisons and an
unbounded broadcast. Banned by this repo's plan sweep.

Bucketized rewrite (the standard range-join trick, cf. the interval
join in stream processors and range-join hints in other Spark
distributions):

1. pick a bucket width ``w`` (about the MEDIAN interval length: too
   small explodes interval replication, too large explodes the
   residual-filter candidate count);
2. each point maps to bucket ``floor(t / w)`` — one row;
3. each interval replicates to every bucket it overlaps
   (``sequence(floor(start/w), floor(end/w))`` exploded) —
   ``len/w + 1`` rows;
4. equi-join on the bucket id, then re-check the exact
   ``BETWEEN`` as a cheap residual filter.

The join is now a hash join on an integer key: shuffle-partitionable,
AQE-splittable, no broadcast of the big side. Replication cost is
explicit and bounded: ``max_buckets_per_interval`` fails loudly if an
interval would fan out more than expected (an open-ended interval
would otherwise silently explode the build side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
    max_buckets_per_interval: int = 64,
) -> DataFrame:
    """All (point, interval) pairs with
    ``interval[start] <= point[point_time] <= interval[end]``,
    as an equi-join on ``floor(time / bucket_width)``.

    Time columns must be numeric (epoch); ``how`` is 'inner' or
    'left' (left = keep unmatched points with NULL interval columns).
    Column names must not collide across the two inputs (select/alias
    first — same contract as a plain join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    numeric = {"byte", "short", "integer", "long", "float", "double", "decimal"}
    for df, col in ((points, point_time), (intervals, start), (intervals, end)):
        t = df.schema[col].dataType
        if t.typeName() not in numeric:
            raise TypeError(
                f"time column {col!r} must be numeric (epoch), got {t}; "
                "cast timestamps to epoch seconds/micros first (floor-"
                "division bucketing is ill-defined on temporal types)"
            )

    overlap = (
        F.floor(F.col(end) / bucket_width) - F.floor(F.col(start) / bucket_width) + 1
    )
    # the fan-out guard lives INSIDE the exploded expression (an
    # unused side column would be pruned by Catalyst, silently
    # disabling the check): assert_true returns NULL when the bound
    # holds, so the `when` always selects the sequence — or raises.
    guard = F.assert_true(
        overlap <= max_buckets_per_interval,
        F.concat(
            F.lit("point_in_interval_join: an interval spans "),
            overlap.cast("string"),
            F.lit(
                f" buckets (> {max_buckets_per_interval}); raise "
                "bucket_width or max_buckets_per_interval"
            ),
        ),
    )
    exploded = intervals.filter(F.col(start) <= F.col(end)).withColumn(
        "__bucket",
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence(
                    F.floor(F.col(start) / bucket_width),
                    F.floor(F.col(end) / bucket_width),
                ),
            )
        ),
    )
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_time) / bucket_width)
    )
    residual = (F.col(start) <= F.col(point_time)) & (
        F.col(point_time) <= F.col(end)
    )
    if how == "inner":
        return p.join(exploded, on="__bucket", how="inner").filter(residual).drop(
            "__bucket"
        )
    # left: join on bucket AND residual so unmatched points survive;
    # a point in several buckets' intervals still matches each interval
    # exactly once (its own bucket row is unique on the point side).
    cond = (p["__bucket"] == exploded["__bucket"]) & residual
    return (
        p.join(exploded, on=cond, how="left")
        .drop(exploded["__bucket"])
        .drop(p["__bucket"])
    )


def point_in_interval_agg(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start: str,
    end: str,
    interval_id: str,
    fine_width: int,
    sum_cols: tuple[str, ...] = (),
    max_buckets_per_interval: int = 64,
) -> DataFrame:
    """Per-interval COUNT/SUM of contained points WITHOUT materializing
    the (point, interval) pairs — the aggregate twin of
    ``point_in_interval_join`` for the common "how many / how much per
    window" question.

    ``point_in_interval_join`` + groupBy is output-bound: dense data
    makes |pairs| grow as |points| × |intervals| / grid even though the
    final answer is one row per interval (the r7 sf1 probe measured the
    pair-producing gate at 213 s for exactly this reason — workload,
    not plan). This operator pushes the aggregate BELOW the residual
    join with the classic two-level decomposition:

    1. points pre-aggregate per FINE bucket ``floor(t / fine_width)``
       → (bucket, cnt, partial sums) — one map-side-combinable pass,
       |buckets| output rows;
    2. each interval explodes to its covered fine buckets (bounded by
       the loud ``max_buckets_per_interval`` guard) and each bucket is
       classified FULL (entirely inside [start, end]) or EDGE;
    3. FULL buckets take the pre-aggregated (cnt, sums) directly — a
       bucket-keyed equi-join against |buckets| rows, never points;
    4. only EDGE buckets (≤ 2 per interval) join actual points, with
       the exact BETWEEN residual;
    5. one final groupBy(interval_id) sums the contributions.

    Pair materialization is thus ≤ 2 × fine_width worth of points per
    interval instead of the full window. Counts are exact; sums
    accumulate in DECIMAL(38,10) (exact, association-independent).
    Time columns must be INTEGRAL epoch values — full-bucket
    containment tests ``[k·w, (k+1)·w − 1] ⊆ [start, end]``, which is
    only exact on integers. Inner-join semantics: intervals containing
    no points are absent (same contract as the pair-producing join).
    Output: (interval_id, n_points, sum_<c> for each sum col)."""
    if fine_width <= 0:
        raise ValueError("fine_width must be positive")
    integral = {"byte", "short", "integer", "long"}
    for df, col in ((points, point_time), (intervals, start), (intervals, end)):
        t = df.schema[col].dataType
        if t.typeName() not in integral:
            raise TypeError(
                f"time column {col!r} must be an integral epoch type for "
                f"exact bucket containment, got {t}"
            )

    dec = "decimal(38,10)"
    bucket_aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(F.col(c).cast(dec)).alias(f"__s_{c}") for c in sum_cols
    ]
    p = points.withColumn("__b", F.floor(F.col(point_time) / fine_width))
    per_bucket = p.groupBy("__b").agg(*bucket_aggs)

    overlap = (
        F.floor(F.col(end) / fine_width) - F.floor(F.col(start) / fine_width) + 1
    )
    guard = F.assert_true(
        overlap <= max_buckets_per_interval,
        F.concat(
            F.lit("point_in_interval_agg: an interval spans "),
            overlap.cast("string"),
            F.lit(
                f" fine buckets (> {max_buckets_per_interval}); raise "
                "fine_width or max_buckets_per_interval"
            ),
        ),
    )
    exploded = intervals.filter(F.col(start) <= F.col(end)).withColumn(
        "__b",
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence(
                    F.floor(F.col(start) / fine_width),
                    F.floor(F.col(end) / fine_width),
                ),
            )
        ),
    )
    is_full = (F.col("__b") * fine_width >= F.col(start)) & (
        (F.col("__b") + 1) * fine_width - 1 <= F.col(end)
    )

    contrib_cols = [interval_id, "__cnt"] + [f"__s_{c}" for c in sum_cols]
    full = (
        exploded.filter(is_full)
        .join(per_bucket, "__b")
        .select(*contrib_cols)
    )
    # Edge join safety + width: project BOTH sides down before joining.
    # Points keep only (__b, point_time, sum_cols) — the join must not
    # shuffle point columns it never uses — and the interval columns go
    # behind reserved __iv_* aliases so a column name shared between
    # points and intervals (other than __b) cannot make the residual
    # BETWEEN references ambiguous.
    p_edge = p.select("__b", point_time, *sum_cols)
    iv_edge = exploded.filter(~is_full).select(
        F.col("__b"),
        F.col(interval_id).alias("__iv_id"),
        F.col(start).alias("__iv_start"),
        F.col(end).alias("__iv_end"),
    )
    edge_pairs = iv_edge.join(p_edge, "__b").filter(
        (F.col("__iv_start") <= F.col(point_time))
        & (F.col(point_time) <= F.col("__iv_end"))
    )
    edge = edge_pairs.select(
        F.col("__iv_id").alias(interval_id),
        F.lit(1).cast("long").alias("__cnt"),
        *[F.col(c).cast(dec).alias(f"__s_{c}") for c in sum_cols],
    )
    out_aggs = [F.sum("__cnt").alias("n_points")] + [
        F.sum(f"__s_{c}").cast(dec).alias(f"sum_{c}") for c in sum_cols
    ]
    return full.unionByName(edge).groupBy(interval_id).agg(*out_aggs)
