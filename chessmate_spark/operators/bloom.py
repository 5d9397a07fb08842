"""Bloom-filter semi-join reduction: shed fact rows BEFORE the shuffle.

The classic 100 TB join problem: the dim side is too big to broadcast as
rows (millions of keys × wide payloads), yet most fact rows match nothing
and still pay the full shuffle before the join can drop them.  A Bloom
filter of the dim keys is a few hundred KiB regardless of payload width;
broadcasting it and testing fact keys map-side sheds the non-matching
rows before any exchange.  No false negatives — every true match
survives — so `bloom prune → exact join` equals the plain join exactly,
which is what the j14 oracle checks.

Public technique throughout: Bloom (CACM 1970) bit array, the
Kirsch-Mitzenmacher double-hashing scheme (ESA 2006: position_i =
h1 + i*h2 mod m needs only two base hashes for k probe positions), and
Spark's own `xxhash64` as the base hash so both build and probe sides
hash JVM-side.  Spark's runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) does this implicitly
for some shapes; this operator is the explicit, plan-visible form the
reference's payload-filter push (SURVEY §2.8 V3) maps onto when the
filter set outgrows a broadcast list.

Scale shape:
  * build — one narrow pass over dim: xxhash64 twice per key (JVM),
    per-partition numpy bitmaps (m/8 bytes each, O(m) memory however big
    the partition), OR-merged through a single coalesced task so the
    driver collects exactly ONE bitmap, never per-partition copies;
  * probe — bitmap rides the closure (Arrow-batched pandas_udf, vector
    gather per batch); fact side stays fully distributed, zero shuffle
    added, and the exchange that follows moves only survivors.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_H1_SEED = 0x51_7C_C1
_H2_SEED = 0xB10_0F


def _base_hashes(key: Column) -> Tuple[Column, Column]:
    """Two independent 64-bit base hashes, computed JVM-side."""
    return (
        F.xxhash64(key, F.lit(_H1_SEED)),
        F.xxhash64(key, F.lit(_H2_SEED)),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) probe positions via Kirsch-Mitzenmacher double hashing.

    uint64 arithmetic so the signed xxhash64 values wrap instead of
    overflowing; h2 is forced odd so the k positions cycle through
    distinct residues even when m is a power of two.
    """
    u1 = h1.astype(np.uint64)
    u2 = h2.astype(np.uint64) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((u1[:, None] + i[None, :] * u2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_build(dim: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5) -> bytes:
    """Build the bit array from ``dim[key_col]`` distributedly.

    Stage 1 sets bits per input partition (numpy bitmap, O(m_bits/8)
    memory each); stage 2 ORs the per-partition bitmaps inside one
    coalesced task, so the collect returns a single m_bits/8-byte row no
    matter how many partitions the dim scan has.  NULL keys are skipped:
    an equi-join never matches NULL, so they must not set bits.
    """
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h1, h2 = _base_hashes(F.col(key_col))
    hashed = dim.where(F.col(key_col).isNotNull()).select(
        h1.alias("_cm_h1"), h2.alias("_cm_h2")
    )

    n_bytes = m_bits // 8

    def set_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            pos = _positions(
                pdf["_cm_h1"].to_numpy(), pdf["_cm_h2"].to_numpy(), m_bits, k
            ).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            for raw in pdf["bits"]:
                acc |= np.frombuffer(raw, dtype=np.uint8)
        yield pd.DataFrame({"bits": [acc.tobytes()]})

    # repartition(1), NOT coalesce(1): coalesce is a narrow dependency,
    # which would fuse the whole build (scan + hash + set_bits) into ONE
    # task and run it sequentially.  repartition shuffles only the tiny
    # per-partition bitmaps (m/8 bytes each) into the merge task, leaving
    # stage 1 fully parallel.
    partials = hashed.mapInPandas(set_bits, "bits binary")
    merged = partials.repartition(1).mapInPandas(or_merge, "bits binary")
    rows = merged.collect()
    return rows[0]["bits"] if rows else b"\x00" * n_bytes


def bloom_might_contain(
    key: Column, bitmap: bytes, m_bits: int, k: int = 5
) -> Column:
    """Boolean membership test against a built bitmap.

    The two base hashes run JVM-side; the Arrow-batched pandas_udf only
    gathers bits (one (batch, k) numpy gather + reduce per batch).
    False for NULL keys (join semantics).  May return true for absent
    keys (false positives) — callers MUST follow with the exact join or
    an exact membership check; never treat this as the final predicate.
    """
    bits = np.frombuffer(bitmap, dtype=np.uint8)
    if len(bits) * 8 != m_bits:
        raise ValueError(f"bitmap is {len(bits) * 8} bits, expected {m_bits}")

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if not len(h1):
            return pd.Series([], dtype="boolean")
        pos = _positions(h1.to_numpy(), h2.to_numpy(), m_bits, k)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    c1, c2 = _base_hashes(key)
    return F.when(key.isNull(), F.lit(False)).otherwise(probe(c1, c2))


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a Bloom pre-filter on the fact side.

    Semantics are identical to ``fact.join(dim, fact[fact_key] ==
    dim[dim_key], how)`` — the filter only discards rows the join would
    discard anyway (no false negatives), and the exact join downstream
    removes any false positives.  Only inner/semi shapes qualify: an
    outer join must keep non-matching fact rows, so pruning them would
    change the answer.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom pruning only preserves inner/semi semantics, got {how!r}"
        )
    bitmap = bloom_build(dim, dim_key, m_bits=m_bits, k=k)
    pruned = fact.where(
        bloom_might_contain(F.col(fact_key), bitmap, m_bits, k=k)
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


def bloom_prune_anti_join(
    fact: DataFrame,
    drop: DataFrame,
    fact_key: str,
    drop_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
    persist_fact: bool = False,
) -> DataFrame:
    """Exact ``fact LEFT ANTI drop`` with a Bloom split on the fact side
    — the drop-list form of ``bloom_prune_join`` (dedup resolution's
    shape, d10: corpus minus non-canonical ids).

    An anti join inverts the pruning direction: rows the bloom proves
    ABSENT from the drop-list are kept immediately (no exchange at
    all); only the might-contain suspects — true drops plus false
    positives, a sliver of the corpus at any realistic dup rate — go
    through the exact anti join.  No false negatives means every true
    drop-list member lands in the suspect branch and is removed
    exactly, so the union equals the plain anti join row-for-row.

    This is the 100 TB form once the drop-list outgrows a broadcast:
    the broadcast anti join ships the whole list to every executor and
    still scans the corpus once; this ships ONE bitmap (m_bits/8 bytes,
    collected once) and shrinks the anti-join exchange from corpus-size
    to suspect-size.  Cost: the corpus scan feeds two filter branches
    (definite-keep, suspect) — two pruned scans or one exchange-reused
    scan under AQE, either far below the avoided shuffle.

    ``fact`` must be DETERMINISTIC (same contract as ``_lsh_pairs``'s
    cache note): the plan evaluates it twice — once per branch — so a
    source containing ``rand()``-derived columns, an unordered
    ``limit()``, or sampling could disagree between the two scans and
    the union would drop or duplicate rows relative to the plain anti
    join.  For such inputs pass ``persist_fact=True``, which pins ONE
    materialization both branches read (costs a persist of the corpus
    projection).  The pinned frame rides the returned DataFrame: after
    materializing the result, call ``release_persisted_fact(result)``
    to free the executor cache — without it a long-lived session leaks
    one cached corpus projection per call."""
    if persist_fact:
        fact = fact.persist()
    bitmap = bloom_build(drop, drop_key, m_bits=m_bits, k=k)
    might = bloom_might_contain(F.col(fact_key), bitmap, m_bits, k=k)
    # NULL fact keys: bloom says False -> kept directly, matching anti
    # join semantics (a NULL key never equi-matches the drop side)
    kept_fast = fact.where(~might)
    suspects = fact.where(might)
    kept_slow = suspects.join(
        drop, suspects[fact_key] == drop[drop_key], "left_anti"
    )
    out = kept_fast.unionByName(kept_slow)
    if persist_fact:
        out._bloom_pinned_fact = fact
    return out


def release_pinned(result: DataFrame, attr: str) -> bool:
    """Shared release for persist-pin handles (``_bloom_pinned_fact``,
    ``_pq_pinned_corpus``): unpersist and clear; False when nothing was
    pinned under ``attr`` so callers can release unconditionally.

    THE PIN RIDES THE EXACT RETURNED OBJECT: any transformation
    (``.select()``, ``.filter()``, ...) returns a NEW DataFrame without
    the attribute, so either release on the object the operator
    returned, or carry the handle yourself
    (``handle = result._bloom_pinned_fact``) before transforming."""
    pinned = getattr(result, attr, None)
    if pinned is None:
        return False
    pinned.unpersist()
    setattr(result, attr, None)
    return True


def release_persisted_fact(result: DataFrame) -> bool:
    """Unpersist the fact frame pinned by
    ``bloom_prune_anti_join(..., persist_fact=True)``.

    Call AFTER the result has been materialized (collected / written) —
    unpersisting earlier just re-evaluates both branches from source,
    reopening the determinism hazard persist_fact exists to close.
    Call it on the DataFrame object this module RETURNED (see
    ``release_pinned``: transformations drop the pin attribute).
    Returns True when a pinned frame was released, False when the
    result carried none (persist_fact was False, or already released) —
    callers can release unconditionally."""
    return release_pinned(result, "_bloom_pinned_fact")
