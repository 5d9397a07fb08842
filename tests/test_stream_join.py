"""Watermarked stream-stream interval join: the streaming form of
j9_interval_join — clicks joined to purchases within 30 minutes per user,
state bounded by watermark + interval on both sides."""

import datetime as dt

from pyspark.sql import functions as F

EVENT_DDL = "event_id long, ts timestamp, user_id long"


def _ts(minute):
    return dt.datetime(2024, 1, 1, 9, 0) + dt.timedelta(minutes=minute)


def test_stream_stream_interval_join(spark, tmp_path):
    clicks_dir = str(tmp_path / "clicks")
    buys_dir = str(tmp_path / "buys")
    sink = str(tmp_path / "joined")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, _ts(0), 7), (2, _ts(5), 7), (3, _ts(0), 8)], EVENT_DDL
    ).coalesce(1).write.parquet(clicks_dir)
    spark.createDataFrame(
        # in-window for click 1+2 (user 7); out-of-window late purchase;
        # user 8 purchase within window of click 3
        [(10, _ts(10), 7), (11, _ts(90), 7), (12, _ts(20), 8)], EVENT_DDL
    ).coalesce(1).write.parquet(buys_dir)

    clicks = (
        spark.readStream.schema(EVENT_DDL).parquet(clicks_dir)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"), "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    buys = (
        spark.readStream.schema(EVENT_DDL).parquet(buys_dir)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("click_id", "purchase_id", "user_id")

    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
    }
    # purchase 10 @9:10 joins clicks 1 (9:00) and 2 (9:05); purchase 11
    # @10:30 is outside every 30-min window; purchase 12 joins click 3
    assert got == {(1, 10), (2, 10), (3, 12)}
