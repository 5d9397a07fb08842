"""Interchange connectors (CSV/JSONL round trips) and small-file
compaction: losslessness under hostile values, sizing rule, file-count
reduction with identical rows."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from chessmate_spark.ingest.compaction import (
    compact,
    data_files,
    plan_file_count,
)
from chessmate_spark.ingest.formats import roundtrip_csv, roundtrip_jsonl


@pytest.fixture()
def hostile(spark):
    """Rows engineered to break naive CSV/JSON writers: embedded commas,
    doubled quotes, newlines, the NULL token as data, NULLs, negative
    doubles, microsecond timestamps."""
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("txt", StringType(), True),
            StructField("val", DoubleType(), True),
            StructField("ts", TimestampNTZType(), True),
        ]
    )
    rows = [
        (1, 'comma, "quoted", done', -1.5, datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
        (2, "line\nbreak", 0.1, None),
        (3, None, None, datetime.datetime(1999, 12, 31, 23, 59, 59, 999999)),
        (4, "safe", 2.0, datetime.datetime(2024, 6, 1)),
        (5, "", 1e300, datetime.datetime(2024, 6, 1, 0, 0, 0, 1)),
    ]
    return spark.createDataFrame(rows, schema)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip_hostile_values(spark, hostile, tmp_path):
    back = roundtrip_csv(hostile, str(tmp_path / "csv"))
    assert _rows(back) == _rows(hostile)


def test_csv_null_token_limit_is_pinned(spark, tmp_path):
    """The documented CSV limit: a string equal to the \\N null token
    reads back as NULL (quoting cannot disambiguate); JSONL carries it."""
    df = spark.createDataFrame([(1, "\\N"), (2, None)], "id long, txt string")
    back = roundtrip_csv(df, str(tmp_path / "csv"))
    assert _rows(back) == [(1, None), (2, None)]
    jback = roundtrip_jsonl(df, str(tmp_path / "jsonl"))
    assert _rows(jback) == [(1, "\\N"), (2, None)]


def test_jsonl_roundtrip_hostile_values(spark, hostile, tmp_path):
    back = roundtrip_jsonl(hostile, str(tmp_path / "jsonl"))
    assert _rows(back) == _rows(hostile)


def test_plan_file_count():
    assert plan_file_count(0, 100) == 1
    assert plan_file_count(100, 100) == 1
    assert plan_file_count(101, 100) == 2
    assert plan_file_count(1000, 100) == 10
    with pytest.raises(ValueError):
        plan_file_count(100, 0)


def test_compact_reduces_files_keeps_rows(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(0, 10_000).withColumn("pay", F.md5(F.col("id").cast("string")))
    df.repartition(16).write.parquet(src)
    assert len(data_files(src)) == 16
    total = sum(sz for _p, sz in data_files(src))
    n = compact(spark, src, dst, target_file_bytes=total // 2 + 1)
    assert n == 2
    assert len(data_files(dst)) == 2
    assert _rows(spark.read.parquet(dst)) == _rows(df)


def test_compact_split_requires_opt_in(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(0, 1000).withColumn("pay", F.md5(F.col("id").cast("string")))
    df.coalesce(1).write.parquet(src)
    # tiny target would mean MORE files; without allow_split it stays put
    n = compact(spark, src, str(tmp_path / "d1"), target_file_bytes=1024)
    assert n == 1
    n2 = compact(
        spark, src, str(tmp_path / "d2"), target_file_bytes=1024, allow_split=True
    )
    assert n2 > 1
    assert len(data_files(str(tmp_path / "d2"))) == n2
    assert _rows(spark.read.parquet(str(tmp_path / "d2"))) == _rows(df)
