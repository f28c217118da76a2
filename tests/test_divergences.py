"""Documented divergences from the reference, pinned as executable
facts (KNOWN_LIMITS.md #1): the reference's two-pass as-of join fans
out on tied max timestamps; our union-window asof_join dedups with a
deterministic tie-break."""

import pyspark.sql.functions as F

from defi_features_data_pipeline_spark.operators import asof_join


def _tied_fixture(spark):
    events = spark.createDataFrame([("tok", 100)], "token string, ets long")
    prices = spark.createDataFrame(
        [("tok", 90, 1.0), ("tok", 90, 7.0)],  # tied max timestamp
        "token string, pts long, price double",
    )
    return events, prices


def test_reference_two_pass_fans_out_on_ties(spark):
    """The reference algorithm (`transformations.sql:2-13,44-48`):
    MAX(ts) per (event, token), then equi-join back — duplicates the
    event when two price rows share the max ts."""
    events, prices = _tied_fixture(spark)
    max_ts = (
        prices.join(events, "token")
        .filter((F.col("pts") <= F.col("ets")) & (F.col("ets") - F.col("pts") <= 604800))
        .groupBy("ets", "token")
        .agg(F.max("pts").alias("max_pts"))
    )
    two_pass = events.join(max_ts, ["token", "ets"], "left").join(
        prices,
        (F.col("pts") == F.col("max_pts")) & (prices.token == events.token),
        "left",
    )
    assert two_pass.count() == 2  # fan-out: one event row became two


def test_engine_asof_dedups_ties_deterministically(spark):
    events, prices = _tied_fixture(spark)
    out = asof_join(
        events, prices, on="token", left_time="ets", right_time="pts",
        tolerance=604800, right_cols=["price"], tie_break=F.col("price"),
    )
    rows = out.collect()
    assert len(rows) == 1          # no fan-out
    assert rows[0]["price"] == 7.0  # deterministic: max price among ties
