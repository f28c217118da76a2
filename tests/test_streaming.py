"""Structured-Streaming incremental layer (SURVEY §2.9): availableNow
file stream with checkpoint tracking — the streaming expression of the
reference's high-watermark INSERT."""

import os

import pyspark.sql.functions as F

from defi_features_data_pipeline_spark.streaming import stream_append_incremental


def test_available_now_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    df1 = spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], "id long, k string, v double")
    df1.write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    transform = lambda d: d.withColumn("v2", F.col("v") * 2)  # noqa: E731

    stream_append_incremental(spark, src, schema, transform, out, ckpt)
    assert spark.read.parquet(out).count() == 2

    # second run with no new files: nothing re-processed (exactly-once)
    stream_append_incremental(spark, src, schema, transform, out, ckpt)
    assert spark.read.parquet(out).count() == 2

    # new file arrives -> only the increment is processed
    spark.createDataFrame([(3, "c", 30.0)], "id long, k string, v double").write.mode(
        "append"
    ).parquet(src)
    stream_append_incremental(spark, src, schema, transform, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["v2"] for r in got.collect()} == {20.0, 40.0, 60.0}
    assert os.path.isdir(ckpt)


def test_windowed_streaming_aggregation(spark, tmp_path):
    """Watermark + windowed agg over a bounded file stream (memory sink)."""
    src = str(tmp_path / "evsrc")
    spark.createDataFrame(
        [(i, 1704067200 + i * 60, float(i)) for i in range(30)],
        "id long, epoch long, v double",
    ).withColumn("ts", F.timestamp_seconds(F.col("epoch"))).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT n, sv FROM win_agg ORDER BY sv").collect()
    assert sum(r["n"] for r in rows) == 30
    assert len(rows) == 3  # 30 minutes of events in 10-minute windows
