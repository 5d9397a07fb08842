"""Partition pruning: a day filter must reach PartitionFilters and cut
the file list to the matching day only."""

from __future__ import annotations

import datetime as dt

from chessmate_spark.ingest.partitioned import (
    files_read,
    partition_filters,
    with_day_partition,
    write_partitioned,
)


def _events(spark, days=5, per_day=20):
    rows = []
    eid = 0
    for d in range(days):
        for i in range(per_day):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 3, 1 + d, 8, i),
                    eid % 7,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    ddl = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    return spark.createDataFrame(rows, ddl)


def test_day_filter_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "events_by_day")
    write_partitioned(
        with_day_partition(_events(spark)), path, ["day"]
    )
    table = spark.read.parquet(path)

    all_files = files_read(table)
    one_day = table.filter("day = DATE '2024-03-03'")
    # the filter must reach the scan as a PARTITION filter, not a data filter
    assert "day#" in partition_filters(one_day)
    assert "2024-03-03" in partition_filters(one_day)
    assert files_read(one_day) < all_files
    assert one_day.count() == 20

    # pruning must not change answers: day-derived filter vs ts-range scan
    by_ts = table.filter(
        "ts >= TIMESTAMP '2024-03-03 00:00:00' AND ts < TIMESTAMP '2024-03-04 00:00:00'"
    )
    assert one_day.count() == by_ts.count()


def test_range_filter_prunes_multiple_days(spark, tmp_path):
    path = str(tmp_path / "events_by_day2")
    write_partitioned(with_day_partition(_events(spark)), path, ["day"])
    table = spark.read.parquet(path)
    two_days = table.filter(
        "day BETWEEN DATE '2024-03-02' AND DATE '2024-03-03'"
    )
    assert two_days.count() == 40
    assert files_read(two_days) < files_read(table)


def test_dynamic_overwrite_replaces_only_touched_partition(spark, tmp_path):
    from chessmate_spark.ingest.partitioned import overwrite_one_partition

    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}", float(i)) for i in range(30)],
        "id long, day string, v double",
    )
    write_partitioned(base, path, ["day"])
    # partition-dir values come back type-inferred (DATE here) — compare
    # via str so the test pins semantics, not inference
    before = {
        str(r["day"]): r["n"]
        for r in spark.read.parquet(path).groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    # backfill day 2 only, with different rows
    newday = spark.createDataFrame(
        [(100 + i, "2024-01-02", -1.0) for i in range(4)],
        "id long, day string, v double",
    )
    overwrite_one_partition(newday, path, ["day"])
    after = spark.read.parquet(path)
    counts = {
        str(r["day"]): r["n"]
        for r in after.groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert counts["2024-01-02"] == 4          # replaced
    assert counts["2024-01-01"] == before["2024-01-01"]  # untouched
    assert counts["2024-01-03"] == before["2024-01-03"]  # untouched
    assert after.filter("day = '2024-01-02'").agg({"v": "max"}).first()[0] == -1.0
    # conf restored
    assert spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    ) != "dynamic"
