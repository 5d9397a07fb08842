"""As-of and range join operator tests."""

import datetime as dt

from pyspark.sql import functions as F

from chessmate_spark.operators.asof import asof_join, range_join


def _t(minute):
    return dt.datetime(2024, 1, 1, 12, 0) + dt.timedelta(minutes=minute)


def test_asof_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 7, _t(10)), (2, 7, _t(20)), (3, 8, _t(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _t(8), 1.0), (7, _t(15), 2.0), (7, _t(20), 3.0), (9, _t(1), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r.event_id: (r.asof_ts, r.v)
        for r in asof_join(
            left, right, by=["user_id"], right_cols=["v"]
        ).collect()
    }
    assert out[1] == (_t(8), 1.0)      # latest before 12:10 is 12:08
    assert out[2] == (_t(20), 3.0)     # equal timestamp counts (<=)
    assert out[3] == (None, None)      # user 8 has no right rows


def test_asof_inner_drops_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 7, _t(10)), (2, 8, _t(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _t(1), 1.0)], "user_id long, ts timestamp, v double"
    )
    out = asof_join(
        left, right, by=["user_id"], right_cols=["v"], how="inner"
    ).collect()
    assert [r.event_id for r in out] == [1]


def test_asof_null_payload_not_inherited(spark):
    # the matched right row has v = NULL: result must be NULL, not the
    # previous right row's value (struct carry, not per-column last())
    left = spark.createDataFrame(
        [(1, 7, _t(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _t(10), 1.0), (7, _t(20), None)],
        "user_id long, ts timestamp, v double",
    )
    row = asof_join(left, right, by=["user_id"], right_cols=["v"]).collect()[0]
    assert row.asof_ts == _t(20)
    assert row.v is None


def test_asof_duplicate_ts_ties_are_deterministic(spark):
    # two right rows at the same (key, ts): the greatest payload tuple wins,
    # every run
    left = spark.createDataFrame(
        [(1, 7, _t(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _t(20), 1.0), (7, _t(20), 5.0), (7, _t(20), 3.0)],
        "user_id long, ts timestamp, v double",
    )
    for _ in range(3):
        row = asof_join(
            left, right.repartition(4), by=["user_id"], right_cols=["v"]
        ).collect()[0]
        assert (row.asof_ts, row.v) == (_t(20), 5.0)


def test_asof_bigint_time_column(spark):
    # generic API: epoch-micros bigint time columns, not just timestamps
    left = spark.createDataFrame(
        [(1, 7, 1000), (2, 7, 50)], "event_id long, user_id long, t long"
    )
    right = spark.createDataFrame(
        [(7, 100, "a"), (7, 900, "b")], "user_id long, t long, tag string"
    )
    out = {
        r.event_id: (r.asof_ts, r.tag)
        for r in asof_join(
            left, right, by=["user_id"], left_ts="t", right_ts="t",
            right_cols=["tag"],
        ).collect()
    }
    assert out[1] == (900, "b")
    assert out[2] == (None, None)


def test_range_join_point_in_interval(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0)], "pid long, x double"
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0), (30, 4.0, 26.0)],
        "iid long, lo double, hi double",
    )
    out = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, "x", "lo", "hi", bucket_width=5.0
        ).collect()
    }
    assert out == {(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)}


def test_range_join_no_duplicate_candidates(spark):
    # an interval spanning many buckets still yields each pair once
    points = spark.createDataFrame([(1, 50.0)], "pid long, x double")
    intervals = spark.createDataFrame(
        [(9, 0.0, 100.0)], "iid long, lo double, hi double"
    )
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=1.0)
    assert out.count() == 1
