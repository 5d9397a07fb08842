"""Bucketed-table co-location tests: the Q18-note fix — a join and a
groupBy on the bucket key must run without shuffle exchanges."""

import pytest
from pyspark.sql import functions as F

from chessmate_spark.ingest.bucketed import (
    read_table,
    shuffle_exchange_count,
    write_bucketed,
)


@pytest.fixture()
def bucketed_orders(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 37).alias("o_custkey"),
        (F.col("id") * 13 % 1000).cast("double").alias("o_totalprice"),
    )
    write_bucketed(df, "t_orders_bucketed", ["o_orderkey"], 8,
                   path=str(tmp_path / "t_orders_bucketed"))
    yield "t_orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_orders):
    t = read_table(spark, bucketed_orders)
    agg = t.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert shuffle_exchange_count(agg) == 0
    assert agg.count() == 1000


def test_join_on_bucket_key_has_no_exchange(spark, bucketed_orders, tmp_path):
    df2 = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), F.lit(1).alias("flag")
    )
    write_bucketed(df2, "t_orders_b2", ["o_orderkey"], 8,
                   path=str(tmp_path / "t_orders_b2"))
    try:
        # disable broadcast so the co-located sort-merge path is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = read_table(spark, bucketed_orders)
        b = read_table(spark, "t_orders_b2")
        joined = a.join(b, "o_orderkey")
        assert shuffle_exchange_count(joined) == 0
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_unbucketed_baseline_does_shuffle(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # a plain repartition-free groupBy on a non-bucketed source shuffles
    agg = df.groupBy("v").agg(F.count("*").alias("c"))
    assert shuffle_exchange_count(agg) >= 1


def test_q18_bucketed_twin_matches_unbucketed(spark):
    from chessmate_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    twin_rows = QUERIES["q18_bucketed_twin"][0](spark, sf).collect()
    base_rows = QUERIES["q18_large_orders"][0](spark, sf).collect()
    assert twin_rows == base_rows  # bucketing changes the plan, not the answer
