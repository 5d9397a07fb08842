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


def _walk_executed_plan(plan, visit) -> None:
    """THE executed-plan walker (round-13 review: files_read and
    shuffle_records_written had diverging hand-rolled copies — fixes
    landed in one and not the other).  Calls ``visit(node, name)`` on
    every physical node, following the links ``children()`` does not
    expose:

    * ``AdaptiveSparkPlanExec`` → its current ``executedPlan()``;
    * AQE ``*QueryStageExec`` wrappers → their wrapped ``plan()``;
    * ``InMemoryTableScan`` → the relation's ``cachedPlan()``, visited
      ONCE per distinct cached plan (the cacheManager dedupes entries
      by plan equality; two scans over equal cached plans ARE one
      cache entry).  Identity is confirmed with ``.equals()`` against
      the already-visited plans — structural ``hashCode`` alone is a
      first-pass filter, because a hash collision between two DISTINCT
      cache entries would silently skip one subtree and undercount
      (round-13 ADVICE);
    * ``ReusedExchange`` is NOT descended: it points at an exchange
      that appears (and is visited) elsewhere in the tree.

    No blanket ``node.child()`` fallback: py4j's ``hasattr`` is
    constant-true, so the old guard fired a throwing Py4J round trip
    on every true leaf and its bare except could mask real traversal
    failures as an undercounted metric."""
    # hashCode -> list of visited cachedPlan JavaObjects with that hash:
    # the hash is only a bucket key; equality is confirmed with
    # .equals(), so a hash collision between two distinct cache entries
    # cannot silently skip one subtree (round-13 ADVICE)
    seen_caches: dict = {}

    def walk(node):
        name = node.getClass().getSimpleName()
        if name.startswith("ReusedExchange"):
            return
        visit(node, name)
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif name.endswith("QueryStageExec"):
            walk(node.plan())
        elif name.startswith("InMemoryTableScan"):
            try:
                cached = node.relation().cachedPlan()
            except Exception:
                return
            bucket = seen_caches.setdefault(cached.hashCode(), [])
            if not any(cached.equals(prev) for prev in bucket):
                bucket.append(cached)
                walk(cached)

    walk(plan)


def files_read(df: DataFrame) -> int:
    """Number of data files the scan will actually READ after partition
    pruning — the ground-truth pruning verdict.

    Taken from the FileSourceScan's post-pruning "number of files read"
    metric, not from ``input_file_name()`` over surviving rows: the latter
    only sees files that produced output rows, so it would report
    "pruned" even when a broken filter pushdown scanned every file."""
    df.collect()  # metrics are populated by execution
    total = 0

    def visit(node, name):
        nonlocal total
        if name.startswith("FileSourceScan"):
            metrics = node.metrics()
            if metrics.contains("numFiles"):
                total += metrics.apply("numFiles").value()

    _walk_executed_plan(df._jdf.queryExecution().executedPlan(), visit)
    return int(total)


def shuffle_records_written(df: DataFrame) -> int:
    """Total records written through shuffle exchanges while computing
    ``df`` — the ground-truth "how much actually moved" number for
    scale audits (the wall clock alone is action-scheduling-dominated
    on small inputs and cannot see an O(existing)-vs-O(batch) exchange
    difference; this can).

    Runs a ``collect()`` to populate metrics, then walks the executed
    plan (``_walk_executed_plan`` — AQE stages, cached subtrees once,
    reused exchanges skipped) summing each ShuffleExchange's
    ``shuffleRecordsWritten`` metric.  Broadcast exchanges have no
    shuffle-write metrics and naturally count zero — exactly right: a
    broadcast is the thing the batch-bounded band join buys."""
    df.collect()
    total = 0

    def visit(node, name):
        nonlocal total
        if name.startswith("ShuffleExchange"):
            metrics = node.metrics()
            if metrics.contains("shuffleRecordsWritten"):
                total += metrics.apply("shuffleRecordsWritten").value()

    _walk_executed_plan(df._jdf.queryExecution().executedPlan(), visit)
    return int(total)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters the scan will apply (empty string = no
    pruning).  Greppable verification for tests and plan audits."""
    text = df._jdf.queryExecution().executedPlan().toString()
    for line in text.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""


def overwrite_one_partition(
    df_new: DataFrame, path: str, partition_cols: List[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df_new``, leaving every other directory untouched — the
    INSERT OVERWRITE PARTITION semantics a daily backfill needs (static
    overwrite mode would truncate the WHOLE table first, the classic
    lost-history accident).  Conf is set for the write and restored:
    partitionOverwriteMode is session-global in Spark and leaving it
    flipped would silently change other writers' semantics."""
    spark = df_new.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        df_new.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            path
        )
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
