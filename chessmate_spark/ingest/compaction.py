"""Small-file compaction: rewrite a table at a target file size.

The 100 TB failure mode this addresses: streaming sinks and
fine-grained partition writes accumulate thousands of KB-sized parquet
files; every downstream scan then pays one task + one footer read per
file, and the NameNode/listing cost grows unbounded.  The fix is a
periodic rewrite at a target file size (the OPTIMIZE/compaction step
every lakehouse runs).  Sizing from the SOURCE BYTES, not row counts:
list the input files, divide by the target, coalesce/repartition to
that file count, rewrite.

`coalesce` (narrow, no shuffle) when shrinking the file count —
compaction's common case — and `repartition` (one shuffle) only when
the caller asks to split oversized files, where new boundaries require
redistribution.  Reference parity: the snapshot/maintenance surface
(SURVEY §2.1 S9); layout siblings: ingest/partitioned.py (pruning),
ingest/zorder.py (clustering), ingest/bucketed.py (co-location).
"""

from __future__ import annotations

import math
import os
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession


def data_files(path: str) -> List[Tuple[str, int]]:
    """(file, bytes) for every parquet data file under ``path``
    (recursive, so partitioned layouts count too)."""
    out = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith("."):
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def plan_file_count(total_bytes: int, target_file_bytes: int) -> int:
    """ceil(total/target), minimum 1 — pure so the sizing rule is
    unit-testable without a filesystem."""
    if target_file_bytes <= 0:
        raise ValueError(f"target_file_bytes must be > 0, got {target_file_bytes}")
    return max(1, math.ceil(total_bytes / target_file_bytes))


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    allow_split: bool = False,
) -> int:
    """Rewrite ``src_path`` into ``dst_path`` at ~``target_file_bytes``
    per file; returns the ACTUAL file count written.

    Compaction (fewer files) is a shuffle-free ``coalesce``; splitting
    (more files than the read yields) needs a ``repartition`` and is
    opt-in via ``allow_split`` because the shuffle is the expensive
    path.  The achievable count is bounded by the READ's partitioning,
    not the source file count: the parquet reader packs small files
    into <= maxPartitionBytes splits, so ``coalesce`` can only lower
    that number — the return value is derived from the written output,
    never the plan.
    """
    files = data_files(src_path)
    if not files:
        # an empty partition directory is a legitimate state for a
        # maintenance job to meet: nothing to compact, nothing written
        return 0
    total = sum(sz for _p, sz in files)
    n = plan_file_count(total, target_file_bytes)
    df: DataFrame = spark.read.parquet(src_path)
    read_parts = df.rdd.getNumPartitions()
    if n < read_parts:
        df = df.coalesce(n)
    elif n > read_parts and allow_split:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst_path)
    return len(data_files(dst_path))
