"""Bounded-memory frequency sketches: Misra-Gries heavy hitters.

The exact heavy-hitter paths (a15's partial+final count, the GroupState
stream in streaming/structured.py) hold one counter per DISTINCT key —
fine for thousands of users, unbounded at billions.  This module is the
capped-state twin: per-partition Misra-Gries summaries of fixed capacity
``m``, merged with one tiny shuffle.

Guarantees (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
PODS 2012 — the generalized subtract-the-cut merge used here):
  * each per-partition summary holds ≤ m counters, and every counter
    underestimates its key's true partition count by at most n_p / m
    (n_p = rows in that partition);
  * summing summaries across partitions keeps the bound additive:
    true(key) - N/m  ≤  est(key)  ≤  true(key)   over N total rows —
    so every key with true count > N/m is GUARANTEED present in the
    merged summary, and top-k by estimate is exact whenever the k-th and
    (k+1)-th true counts differ by more than N/m;
  * when a partition sees ≤ m distinct keys, its summary is its exact
    count map — at the test scale factors the sketch output is therefore
    bit-identical to the exact aggregate, which is what lets the entry
    share a15's oracle.

Scale shape (100 TB): the mapInPandas pass streams Arrow batches through
a pandas Series capped at m entries — O(m) memory regardless of
partition size; the merge shuffles ≤ m rows per partition (bytes, not
payloads) and ends in one TakeOrderedAndProject.  Reference parity: same
queue/worker metrics surface as A8/Q1 (embedding_worker.ml:65-93).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_trim(s: pd.Series, capacity: int) -> pd.Series:
    """Misra-Gries decrement: if more than ``capacity`` counters live,
    subtract the (capacity+1)-th largest count from all and drop the
    non-positive — at most ``capacity`` survive, each reduced by the
    same amount (the error the bound accounts for)."""
    if len(s) <= capacity:
        return s
    cut = s.nlargest(capacity + 1).iloc[-1]
    s = s - cut
    return s[s > 0]


def mg_partition_summaries(
    df: DataFrame, key_col: str = "user_id", capacity: int = 4096
) -> DataFrame:
    """One Misra-Gries summary per input partition: ≤ ``capacity`` rows
    of (key, mg_count), built by streaming the partition's Arrow batches
    through a capped pandas Series — never a per-row Python loop."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = pd.Series(dtype="int64")
        for pdf in batches:
            s = s.add(pdf[key_col].value_counts(), fill_value=0)
            s = _mg_trim(s, capacity)
        yield pd.DataFrame(
            {key_col: s.index.to_numpy(), "mg_count": s.to_numpy("int64")}
        )

    field = df.schema[key_col]
    out_schema = f"{key_col} {field.dataType.simpleString()}, mg_count long"
    return df.select(key_col).mapInPandas(summarize, out_schema)


def heavy_hitters_sketch(
    df: DataFrame,
    key_col: str = "user_id",
    k: int = 20,
    capacity: int = 4096,
) -> DataFrame:
    """Top-k keys by estimated count from merged per-partition
    Misra-Gries summaries — the bounded-state twin of
    streaming/structured.heavy_hitters_batch.

    The only shuffle moves ≤ capacity rows per partition; the final
    orderBy().limit() compiles to TakeOrderedAndProject.  Estimates are
    exact when every partition sees ≤ capacity distinct keys, else
    underestimate by at most N/capacity (see module docstring).
    """
    summaries = mg_partition_summaries(df, key_col, capacity)
    return (
        summaries.groupBy(key_col)
        .agg(F.sum("mg_count").alias("event_count"))
        .orderBy(F.desc("event_count"), F.asc(key_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the point-query
# frequency sibling of the sketch family (HLL cardinality a18, GK
# quantiles a21, Misra-Gries top-k a15_sketch): fixed depth x width
# counter grid, est(key) = min over rows of the key's bucket counter.
# Never undercounts; overcounts by at most (e/width)*N with probability
# 1 - exp(-depth).  Hashes are md5-derived (engine-portable, the repo's
# convention), so the sketch is bit-deterministic and oracle-checkable.


def _cm_bucket(key, j: int, width: int, family: str = "md5"):
    # "md5": the one md5-prefix-to-bigint convention in the codebase
    # (hashing._hash60) so the bucket derivation can't drift from the
    # oracle SQL that mirrors it (a29 exposes these estimates).
    # "xxhash64": the JVM-native family for consumers whose OUTPUT is
    # invariant to the hash family — countmin_prefilter's gate is
    # lossless for ANY upper-bound sketch, and four md5(string)+conv
    # per row per pass dominated t26's task time (round 14).  pmod:
    # xxhash64 is signed.
    if family == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(j), key), F.lit(width))
    from ..functions.hashing import _hash60

    return _hash60(F.lit(f"cm{j}"), key.cast("string")) % width


def countmin_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512,
    family: str = "md5",
) -> DataFrame:
    """The CMS as a (depth, bucket, cnt) DataFrame — depth*width rows
    total regardless of corpus size.

    Scale shape: ONE scan explodes each row into its ``depth`` bucket
    coordinates; the groupBy's map-side combine collapses to at most
    depth*width rows per task before the single exchange.  The sketch
    is mergeable by construction (counts add), which is exactly what
    partial aggregation exploits."""
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                _cm_bucket(F.col(key_col), j, width, family).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(coords).alias("c"))
        .select("c.depth", "c.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def countmin_estimate(
    probes: DataFrame, cms: DataFrame, key_col: str,
    depth: int = 4, width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]`` against a
    ``countmin_table`` frame: join each probe's depth coordinates to the
    sketch (the probe side is tiny and broadcasts; the sketch is
    depth*width rows), min over depth.

    The sketch frame stores only NON-zero cells, so the join is LEFT
    with a 0 fill: a probe key the corpus never touched hits empty
    buckets and must estimate 0 (and a key whose buckets are only
    partially populated takes min over zeros, not over the populated
    subset) — an inner join would instead drop or inflate such keys."""
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                _cm_bucket(F.col(key_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probe_coords = probes.select(
        F.col(key_col), F.explode(coords).alias("c")
    ).select(key_col, "c.depth", "c.bucket")
    return (
        probe_coords.join(cms, ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
                "est_cnt"
            )
        )
    )


# Auto-width cap for countmin_prefilter: each per-depth sketch slice
# carries at most min(width, distinct non-empty cells) (bucket, cnt)
# rows, and the probe broadcasts one slice per depth — 2^20 cells keeps
# every forced broadcast <= ~16 MB serialized, safely inside Spark's
# broadcast limits on any executor sizing.
_CM_PREFILTER_MAX_WIDTH = 1 << 20


def countmin_prefilter(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: "int | None" = None,
) -> DataFrame:
    """Classic two-pass heavy-hitter PRE-FILTER (Cormode & Muthukrishnan
    2005 §4): pass 1 builds the CMS over ``df[key_col]``; pass 2 rescans
    ``df`` and keeps only rows whose key's ESTIMATE reaches
    ``min_count``.  CMS never undercounts, so every true heavy key
    survives — the filter is LOSSLESS for the downstream exact count
    (identity contract, the d16 bloom pattern); false positives pass
    through and are eliminated by that exact stage.

    Scale shape: the probe is per-ROW — each row's ``depth`` bucket
    coordinates LEFT-join the sketch's per-depth slices, all BROADCAST
    (bounded: auto width caps at ``_CM_PREFILTER_MAX_WIDTH`` cells per
    depth, <= ~16 MB serialized per slice — a width request beyond the
    cap raises instead of force-broadcasting an unbounded frame), and
    the estimate is ``least()`` over the joined counters — so light
    rows are dropped at the SCAN with zero exchanges, and only the
    heavy-suspect sliver reaches the exact aggregation's shuffle.

    ``width=None`` auto-sizes to the next power of two >= the stream's
    row count (one extra count action), capped as above: per-cell load
    stays <= 1 while the cap is slack, so P(light key estimates >=
    min_count) ~ collision^depth stays small.  SELECTIVITY contract at
    the cap: expected overcount per cell is N/width, so the gate stays
    sharp while N/width << min_count and decays gracefully toward
    "everything is a suspect" beyond N ≈ cap·min_count — correctness
    is unaffected either way (estimates remain upper bounds; the exact
    stage re-pays its full shuffle, i.e. the gate degrades to a no-op,
    never to a wrong answer).  Heavy-hitter gating at a tiny absolute
    threshold over a quadrillion-key stream fundamentally needs
    width ~ N/min_count memory — beyond the cap, pre-partition the
    stream (by shard/source) and gate per shard.

    ``df`` must be deterministic (same contract as
    ``bloom_prune_anti_join``): it is evaluated once per pass.
    """
    if width is None:
        n = df.count()
        width = 1
        while width < max(n, 512):
            width <<= 1
        if width > _CM_PREFILTER_MAX_WIDTH:
            # no silent caps: the caller's selectivity contract changes
            # here (gate sharpness decays once N/width ~ min_count)
            import warnings

            warnings.warn(
                f"countmin_prefilter auto width capped at "
                f"{_CM_PREFILTER_MAX_WIDTH} for a {n}-row stream; gate "
                f"selectivity decays once rows >> cap*min_count — "
                f"pre-partition the stream and gate per shard",
                stacklevel=2,
            )
            width = _CM_PREFILTER_MAX_WIDTH
    elif width > _CM_PREFILTER_MAX_WIDTH:
        raise ValueError(
            f"width={width} exceeds the broadcastable cap "
            f"{_CM_PREFILTER_MAX_WIDTH}; shard the stream and gate per "
            "shard instead of force-broadcasting an unbounded sketch"
        )
    # working columns use a reserved prefix: a caller frame already
    # carrying one would either raise an ambiguous-reference error or
    # have its column silently dropped, breaking the row-passthrough
    # contract — fail loudly instead
    _pfx = "_cm_prefilter_"
    clash = [c for c in df.columns if c.startswith(_pfx)]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with countmin_prefilter's "
            f"reserved working prefix {_pfx!r}; rename them first"
        )
    cms = countmin_table(df, key_col, depth=depth, width=width,
                         family="xxhash64")
    est_cols = []
    out = df
    for j in range(depth):
        slice_j = cms.filter(F.col("depth") == j).select(
            F.col("bucket").alias(f"{_pfx}b{j}"),
            F.col("cnt").alias(f"{_pfx}cnt{j}"),
        )
        out = out.withColumn(
            f"{_pfx}b{j}",
            _cm_bucket(F.col(key_col), j, width, family="xxhash64"),
        ).join(F.broadcast(slice_j), f"{_pfx}b{j}", "left")
        # empty buckets estimate 0 (sketch stores non-zero cells only)
        est_cols.append(
            F.coalesce(F.col(f"{_pfx}cnt{j}"), F.lit(0).cast("bigint"))
        )
    est = F.least(*est_cols) if depth > 1 else est_cols[0]
    # NULL keys hash to NULL buckets — the sketch never counts them and
    # the probe joins nothing, so est would read 0 and silently drop a
    # group the ungated exact aggregation WOULD emit (NULL is a groupBy
    # key).  Lossless contract: NULL-key rows are unconditional
    # suspects; the exact stage decides their fate exactly as ungated.
    keep = F.col(key_col).isNull() | (est >= F.lit(min_count))
    return out.filter(keep).drop(
        *[c for j in range(depth) for c in (f"{_pfx}b{j}", f"{_pfx}cnt{j}")]
    )
