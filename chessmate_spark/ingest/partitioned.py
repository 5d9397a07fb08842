"""Partition-layout helpers: directory partitioning for partition pruning.

bucketed.py buys shuffle-free JOINS; this buys scan-free FILTERS.  A fact
table written `partitionBy(day)` turns every day-ranged query into a scan
of only the matching directories — at 100 TB/yr that is the difference
between reading 100 TB and reading 300 GB for a one-day query.  The
helpers wrap the write and the verification that a filtered scan actually
pruned (the check the brief's "did the filter reach the scan?" question
asks for, made executable).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: List[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet hive-partitioned by ``partition_cols``."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def with_day_partition(
    events: DataFrame, ts_col: str = "ts", day_col: str = "day"
) -> DataFrame:
    """Derive the partition column the canonical way (date truncation).

    Works for TIMESTAMP and TIMESTAMP_NTZ inputs alike.
    """
    return events.withColumn(day_col, F.to_date(F.col(ts_col)))


def files_read(df: DataFrame) -> int:
    """Number of distinct data files the query actually reads — the
    ground-truth pruning verdict (a day-filtered scan over a
    day-partitioned table must touch only that day's files)."""
    return df.select(F.input_file_name().alias("f")).distinct().count()


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters the scan will apply (empty string = no
    pruning).  Greppable verification for tests and plan audits."""
    text = df._jdf.queryExecution().executedPlan().toString()
    for line in text.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""
