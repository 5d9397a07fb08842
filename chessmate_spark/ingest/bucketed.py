"""Bucketed table helpers: co-located joins/aggregations without exchanges.

The relational sink's scale lever (EXPLAIN.md's Q18 note): persisting a
fact table bucketed by its join/group key lets every later
join-on-that-key or groupBy-that-key run with ZERO shuffle — the scan is
already hash-partitioned.  Spark bucketing rides the session catalog
(`saveAsTable`), so these helpers wrap the catalog plumbing and the
verification that a plan actually dropped its exchanges.

At 100 TB this is the difference between re-shuffling lineitem per query
and paying the shuffle once at ingest.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
    path: Optional[str] = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``path`` makes it an external table at that location (tests point this
    at a tmpdir; production points at the lake)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def ensure_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int,
    sort_cols: Optional[List[str]] = None,
    path: Optional[str] = None,
) -> None:
    """``write_bucketed`` once; later calls with the same table name are
    no-ops.  This IS the bucketing contract — the shuffle is paid at
    INGEST, not per query — so consumers (q18_bucketed_twin, repeated
    bench runs) must not re-pay the write.  Callers own naming: the
    table name must encode everything the data depends on (the entries
    embed the sf-dir token), because an existing table is trusted as-is.

    External paths are made SESSION-unique
    (``<path>-pid<pid>-<uuid8>``): the catalog that gates the rewrite
    is per-session, so concurrent Spark processes — or multiple
    sessions within one process — would otherwise both see
    ``tableExists=False`` and race overwriting a shared location; a
    shared path buys nothing, since a fresh session rewrites
    regardless.  Cost: one table copy per live session under the
    parent dir; copies of DEAD processes are reaped on entry, live
    same-process siblings persist until the process exits.
    """
    import glob
    import os
    import re
    import shutil
    import uuid

    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        return
    if path is not None:
        # reap siblings left by DEAD processes first, or every run
        # leaks a full table copy under the shared parent dir
        # (glob.escape: a path containing glob metacharacters must not
        # silently match nothing and defeat the reaping)
        for stale in glob.glob(glob.escape(path) + "-pid*"):
            m = re.search(r"-pid(\d+)(-[0-9a-f]{8})?$", stale)
            if not m:
                continue
            pid = int(m.group(1))
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, 0)  # raises if the owner is gone
            except ProcessLookupError:
                shutil.rmtree(stale, ignore_errors=True)
            except PermissionError:
                pass  # alive under another uid: leave it
        # pid + random suffix: pid isolates processes, the suffix
        # isolates multiple SparkSessions WITHIN one process (each has
        # its own catalog, so both would otherwise see
        # tableExists=False and overwrite one shared directory)
        path = f"{path}-pid{os.getpid()}-{uuid.uuid4().hex[:8]}"
    write_bucketed(
        df, table, bucket_cols, n_buckets, sort_cols=sort_cols, path=path
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the final physical plan —
    the thing bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
