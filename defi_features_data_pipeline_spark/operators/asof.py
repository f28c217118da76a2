"""Backward as-of join with tolerance.

Reference semantics (J3/A7): events are priced with the latest token
price at-or-before the event time, looking back at most 7 days —
implemented there as a two-pass self-join: (a) range join
``tp.timestamp BETWEEN ev.epoch_timestamp - 604800 AND ev.epoch_timestamp``
grouped to ``MAX(tp.timestamp)`` per (event ts, token), then (b) an
equi-join back on ``(max_ts, token)`` to fetch the price
(`/root/reference/src/pipelines/analytics/transformations/transformations.sql:2-13,44-48`).

Spark-first implementation: the **union-window** algorithm — ONE shuffle
on the key, no range-join row explosion, no join back:

1. tag left and right rows and union them on (key, time), each side
   carrying its payload in a struct column (NULL on the other side);
2. window ``partitionBy(key).orderBy(t, side, tie)`` — right rows sort
   before left rows at equal t, so backward matching is inclusive —
   and take ``last(right_payload, ignoreNulls=True)`` over
   rowsBetween(unboundedPreceding, currentRow);
3. keep left rows; null out matches older than ``tolerance``.

At 100 TB this is strictly better than the reference's two-pass plan:
one hash shuffle + per-key sort, versus a range join whose intermediate
is |events| x |prices-in-window| followed by a second shuffle and a
re-aggregation. A hot key (one dominant token) is the residual risk:
AQE skew splitting cannot help here (a window partition cannot be
split), so pass ``salt_buckets=n`` — left rows salt deterministically
into n sub-partitions, right rows replicate into every sub-partition,
and the window runs per (key, salt). Any single task's input is then
bounded by ``|hot-key left rows|/n + |hot-key right rows|``, at the
cost of an n× right-side inflation (cheap when the right side is a
dimension-like price series, exactly the reference's shape).

Tie semantics: the reference's max+join-back FANS OUT when two price
rows share the max timestamp. We resolve ties deterministically instead
(last row in ``tie_break`` order wins) — documented divergence per
SURVEY §7.3.2; the oracle tests encode the same argmax semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_INTEGRAL = {"byte", "short", "integer", "long"}
_NUMERIC = _INTEGRAL | {"float", "double", "decimal"}


def _common_time_type(lt, rt) -> str:
    """Common SQL type for the union'd time column, chosen to keep
    int64 epochs EXACT: two integral types stay ``bigint`` (a double
    would silently lose precision above 2^53 — e.g. nanosecond
    epochs); a decimal side widens to decimal; only genuinely
    floating inputs use double (the caller is already in the float
    domain there). Non-numeric (e.g. timestamp) raises: convert to an
    epoch number first so tolerance arithmetic is well-defined."""
    ln, rn = lt.typeName(), rt.typeName()
    if ln not in _NUMERIC or rn not in _NUMERIC:
        raise TypeError(
            f"asof_join time columns must be numeric (epoch), got {lt} / {rt}; "
            "cast timestamps to epoch seconds/micros first"
        )
    if ln in _INTEGRAL and rn in _INTEGRAL:
        return "bigint"
    if "decimal" in (ln, rn) and "float" not in (ln, rn) and "double" not in (ln, rn):
        # widen to the widest input scale (a fixed scale would truncate
        # or NULL-on-overflow finer-grained decimal epochs)
        scale = max(t.scale for t in (lt, rt) if t.typeName() == "decimal")
        return f"decimal(38,{scale})"
    return "double"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    tolerance: int | float | None = None,
    right_cols: list[str] | None = None,
    tie_break: Column | str | None = None,
    direction: str = "backward",
    salt_buckets: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_time] <= left[left_time]`` (backward, the
    reference's shape) or the earliest right row with
    ``right[right_time] >= left[left_time]`` (forward); with
    ``tolerance``, the time gap is bounded by it (same units as the
    time columns). Unmatched left rows keep NULL right columns
    (left-outer, like the reference's LEFT JOIN at
    `transformations.sql:44-48`).

    ``on``         equi key(s)
    ``right_cols`` right payload columns to attach (default: all
                   non-key, non-time right columns)
    ``tie_break``  ordering among right rows with equal time (last
                   wins); kept in its NATIVE orderable type — no
                   silent cast (a non-numeric tie column orders by its
                   own type's semantics instead of becoming NULL)
    ``salt_buckets`` split each key's window into n salted
                   sub-partitions (hot-key mitigation, see module
                   docstring); identical results, bounded task size
    ``direction``  'backward' (latest right at-or-before, the
                   reference's shape), 'forward' (earliest right
                   at-or-after — backward on negated time, same plan),
                   or 'nearest' (closer of the two, backward wins a
                   distance tie; both frames evaluate over ONE sort,
                   still a single shuffle). Tolerance bounds the time
                   gap in every direction.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_time]
    left_cols = [c for c in left.columns]

    t_type = _common_time_type(
        left.schema[left_time].dataType, right.schema[right_time].dataType
    )
    if tolerance is not None and t_type == "bigint" and isinstance(tolerance, float):
        # keep the comparison in the time domain's own type: a raw float
        # literal would promote a bigint/decimal __t to double and
        # silently reintroduce the >2^53 precision loss the integral
        # path exists to avoid
        if not tolerance.is_integer():
            raise TypeError(
                f"fractional tolerance {tolerance!r} with integral time "
                "columns would force a lossy double comparison; pass an "
                "integral tolerance or cast the time columns to double"
            )
        tolerance = int(tolerance)
    tie = (
        F.col(tie_break)
        if isinstance(tie_break, str)
        else (tie_break if tie_break is not None else F.lit(0))
    )

    # forward = backward on negated time (UnaryMinus keeps the exact
    # bigint/decimal type, unlike a multiply, which would re-derive
    # decimal precision)
    def _t(col: str):
        e = F.col(col).cast(t_type)
        return (-e) if direction == "forward" else e

    r = right.select(
        *[F.col(k) for k in keys],
        _t(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.struct(
            _t(right_time).alias("__asof_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__rpay"),
    )
    # left rows sort after right rows at equal __t via __side, and each
    # left row's window frame is its own — the left-side tie value never
    # affects which right row wins, so NULL (of the tie's native type).
    l = left.select(
        *[F.col(k) for k in keys],
        _t(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        F.struct(*[F.col(c).alias(c) for c in left_cols]).alias("__lpay"),
    )
    # align schemas: right side gets a NULL left payload
    r = r.withColumn("__lpay", F.lit(None).cast(l.schema["__lpay"].dataType))

    part_cols = [F.col(k) for k in keys]
    if salt_buckets is not None:
        if salt_buckets < 2:
            raise ValueError(f"salt_buckets must be >= 2, got {salt_buckets}")
        # deterministic salt (no rand(): task retries must repartition
        # identically); right rows go to EVERY bucket so each salted
        # window still sees the key's full price history
        l = l.withColumn(
            "__bsalt",
            F.pmod(F.hash(F.col("__t"), F.col("__lpay")), F.lit(salt_buckets)),
        )
        r = r.withColumn(
            "__bsalt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
        part_cols.append(F.col("__bsalt"))

    order = [F.col("__t"), F.col("__side"), F.col("__tie")]
    w_back = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tol = F.lit(tolerance).cast(t_type) if tolerance is not None else None

    if direction == "nearest":
        # both frames over the SAME partitioning+sort: Spark evaluates
        # them in one WindowExec pass chain after a single shuffle.
        # Right rows at equal __t sort before left (__side), so the
        # backward frame owns distance-0 matches; the forward frame
        # sees strictly-later rights only (tie among those: first in
        # tie order, the mirror of backward's last-wins).
        w_fwd = (
            Window.partitionBy(*part_cols)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        u = (
            r.unionByName(l)
            .withColumn("__back", F.last("__rpay", ignorenulls=True).over(w_back))
            .withColumn("__fwd", F.first("__rpay", ignorenulls=True).over(w_fwd))
            .filter(F.col("__side") == 1)
        )
        back_d = F.col("__t") - F.col("__back.__asof_ts")
        fwd_d = F.col("__fwd.__asof_ts") - F.col("__t")
        back_ok = F.col("__back").isNotNull() & (
            F.lit(True) if tol is None else back_d <= tol
        )
        fwd_ok = F.col("__fwd").isNotNull() & (
            F.lit(True) if tol is None else fwd_d <= tol
        )
        matched = u.withColumn(
            "__match",
            F.when(
                back_ok & fwd_ok,
                F.when(fwd_d < back_d, F.col("__fwd")).otherwise(F.col("__back")),
            )
            .when(back_ok, F.col("__back"))
            .when(fwd_ok, F.col("__fwd")),
        )
    else:
        matched = (
            r.unionByName(l)
            .withColumn("__match", F.last("__rpay", ignorenulls=True).over(w_back))
            .filter(F.col("__side") == 1)
        )
        if tol is not None:
            matched = matched.withColumn(
                "__match",
                F.when(
                    F.col("__t") - F.col("__match.__asof_ts") <= tol,
                    F.col("__match"),
                ),
            )
    return matched.select(
        *[F.col(f"__lpay.{c}").alias(c) for c in left_cols],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )
