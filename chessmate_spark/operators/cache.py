"""Agent-evaluation cache as a keyed table (SURVEY §1.5).

The reference caches GPT evaluations in an in-memory LRU or Redis keyed by
an MD5 digest over (cleaned_text, keywords, limit, rating triple,
opening_slug, result, pgn) — agent_cache.ml:14-36.  The Spark analog is a
keyed Parquet/Delta table:

* the **key** is the same digest, computed as a column expression (F14
  md5 over a canonical '|'-joined rendering; the PGN contributes via its
  own md5 so the key row stays narrow);
* **lookup** is a broadcast left join of the request batch against the
  cache table — hits carry the cached evaluation, misses flow to the
  evaluator stage;
* **merge** is first-writer-wins SCD-0 (anti-join + union), the same
  pattern as the player upsert (S5) — idempotent under replays, and a
  Delta ``MERGE INTO ... WHEN NOT MATCHED`` in production.

Batch semantics replace LRU eviction: a cache *table* is pruned by age or
partition retention, not by reference recency.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_MARK = " "


def _canon(col: Column) -> Column:
    """NULL-safe canonical text: NULL and '' must key differently."""
    return F.coalesce(col.cast("string"), F.lit(_NULL_MARK))


def agent_cache_key(
    cleaned_text: Column,
    keywords: Column,
    limit: Column,
    white_min: Column,
    black_min: Column,
    max_rating_delta: Column,
    opening_slug: Column,
    result: Column,
    pgn: Column,
) -> Column:
    """The cache digest (agent_cache.ml:14-36 key layout, engine-defined
    rendering): md5 of the '|'-joined canonical fields; the pgn field is
    pre-hashed so wide game text never rides through the shuffle."""
    return F.md5(
        F.concat_ws(
            "|",
            _canon(cleaned_text),
            _canon(F.concat_ws(",", keywords)),
            _canon(limit),
            _canon(white_min),
            _canon(black_min),
            _canon(max_rating_delta),
            _canon(opening_slug),
            _canon(result),
            F.md5(F.coalesce(pgn, F.lit(""))),
        )
    )


def cache_lookup(
    requests: DataFrame,
    cache: Optional[DataFrame],
    key_col: str = "cache_key",
    value_cols: Optional[list] = None,
) -> DataFrame:
    """Broadcast left join against the cache table; adds ``cache_hit`` and
    the cached value columns (NULL on miss).  The cache side is broadcast —
    a cache bigger than broadcast range should be pre-bucketed on the key
    instead (uniform md5 keys ⇒ no skew)."""
    if cache is None:
        out = requests.withColumn("cache_hit", F.lit(False))
        for c in value_cols or []:
            out = out.withColumn(c, F.lit(None).cast("double"))
        return out
    value_cols = value_cols or [
        c for c in cache.columns if c != key_col
    ]
    # hit = explicit row marker from the cache side, NOT value nullness —
    # a cached row whose first value column is legitimately NULL is still
    # a hit.
    cached = cache.select(
        F.col(key_col),
        F.lit(True).alias("_cache_marker"),
        *[F.col(c).alias(f"_cached_{c}") for c in value_cols],
    )
    out = (
        requests.join(F.broadcast(cached), key_col, "left")
        .withColumn("cache_hit", F.coalesce(F.col("_cache_marker"), F.lit(False)))
        .drop("_cache_marker")
    )
    for c in value_cols:
        out = out.withColumn(c, F.col(f"_cached_{c}")).drop(f"_cached_{c}")
    return out


def cache_merge(
    cache: Optional[DataFrame],
    new_entries: DataFrame,
    key_col: str = "cache_key",
) -> DataFrame:
    """First-writer-wins merge of new entries into the cache table.

    Duplicate keys inside ``new_entries`` collapse deterministically to the
    min-valued row.  In production this is Delta ``MERGE WHEN NOT MATCHED``.
    """
    value_cols = [c for c in new_entries.columns if c != key_col]
    deduped = new_entries.groupBy(key_col).agg(
        *[F.min(c).alias(c) for c in value_cols]
    )
    if cache is None:
        return deduped
    fresh = deduped.join(cache.select(key_col), key_col, "left_anti")
    return cache.unionByName(fresh)
