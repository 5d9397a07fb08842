"""V5 deterministic fallback embedding — the engine-defined stable hash.

The reference's fallback embedder (query_embedding_provider.ml:19-42) maps
each dimension i to the mean over tokens of ``(|hash (token, i)| mod 10_000)
/ 10_000`` clamped to [0,1].  OCaml's ``Hashtbl.hash`` is not portable
(SURVEY §7.3), so this engine *defines* its stable hash family:

    base(token)      = int(md5('v5:' || token)[:15 hex], 16) mod P      (P = 2^31-1)
    bucket(token, i) = ((a_i * base(token) + b_i) mod P) mod 10_000
    dim_i            = clamp01( Σ_tokens bucket(token, i) / 10_000 / n )

with (a_i, b_i) the deterministic universal-hash constants of
``hashing.universal_constants(dim, "v5dim")``.  One md5 per token (not per
token×dimension) keeps the 1536-dim production path tractable; the per-dim
work is two integer mulmods.  The per-dimension sum runs over integers —
exact in any engine and accumulation order — so Spark, DuckDB, and Python
produce bit-identical vectors.  Three equivalent forms are provided: pure
Python (driver-side query vectors), a Spark Column expression (JVM-side, no
Python UDF), and a DuckDB SQL fragment (the correctness oracle).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache as _lru_cache
from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MINHASH_PRIME as _P
from .hashing import universal_constants

DEFAULT_DIM = 16  # test dimension per FIXTURES.md; production uses 1536


def _v5_constants(dim: int):
    return universal_constants(dim, "v5dim")


@_lru_cache(maxsize=1 << 16)
def v5_base(token: str) -> int:
    # pure function of the token; token frequency is Zipf in real text, so
    # caching removes the vast majority of md5 calls per worker process
    digest = hashlib.md5(f"v5:{token}".encode("utf-8")).hexdigest()
    return int(digest[:15], 16) % _P


def hash_bucket_int(token: str, index: int, _consts_cache={}) -> int:
    consts = _consts_cache.setdefault(index + 1, _v5_constants(index + 1))
    a, b = consts[index]
    return ((a * v5_base(token) + b) % _P) % 10_000


def hash_bucket(token: str, index: int) -> float:
    return hash_bucket_int(token, index) / 10_000.0


def deterministic_embedding(tokens: Sequence[str], dim: int = DEFAULT_DIM) -> List[float]:
    """Driver-side V5: mean of hash buckets per dimension, clamped [0,1]."""
    toks = list(tokens)
    if not toks:
        return [0.0] * dim
    n = float(len(toks))
    consts = _v5_constants(dim)
    bases = [v5_base(t) for t in toks]
    out: List[float] = []
    for a, b in consts:
        total = sum(((a * h + b) % _P) % 10_000 for h in bases)
        out.append(min(1.0, max(0.0, total / 10_000.0 / n)))
    return out


def v5_base_expr(token: Column) -> Column:
    digest = F.md5(F.concat(F.lit("v5:"), token))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % _P


def deterministic_embedding_expr(tokens: Column, dim: int = DEFAULT_DIM) -> Column:
    """Distributed V5 over an array<string> column → array<double> of ``dim``.

    Pure SQL expressions (md5/conv/aggregate/transform) — stays JVM-side.
    Empty/null token arrays embed to the zero vector.
    """
    # SINGLE aggregate pass with an array<bigint> accumulator: one md5 per
    # token total.  The per-dim form (dim separate F.aggregate calls) is a
    # trap — Catalyst does not share the inner transform() across sibling
    # aggregate expressions, so every dimension re-hashed every token
    # (dim× md5 work; measured 3-5× slower at dim=8, ~100× at the
    # production dim=1536).  Integer sums regroup exactly, so the output
    # is bit-identical to the per-dim form and to the oracle.
    hashed = F.transform(tokens, v5_base_expr)
    consts = _v5_constants(dim)
    zero_acc = F.array(*[F.lit(0).cast("bigint") for _ in consts])
    totals = F.aggregate(
        hashed,
        zero_acc,
        lambda acc, h: F.array(
            *[
                F.element_at(acc, i + 1)
                + ((F.lit(a) * h + F.lit(b)) % _P) % 10_000
                for i, (a, b) in enumerate(consts)
            ]
        ),
    )
    n = F.size(tokens).cast("double")
    vec = F.transform(
        totals,
        lambda t: F.least(
            F.greatest(t.cast("double") / F.lit(10_000.0) / n, F.lit(0.0)),
            F.lit(1.0),
        ),
    )
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return F.when(tokens.isNull() | (F.size(tokens) == 0), zero).otherwise(vec)


# Routing boundary between the two bit-identical V5 forms, measured on
# the sf0.1 corpus (5k docs) and the 10x corpus (50k docs, dim=1536 —
# SCALE_SMOKE.json `v5_dim1536`): the pure-expression plan wins or ties
# through dim≈64 (no Python boundary, fuses with surrounding JVM
# expressions), the Arrow-batched pandas UDF wins decisively above
# (dim=128: 10.0s vs 6.0s; dim=256: 12.3s vs 4.6s; dim=1536: 441.8s vs
# 30.3s — the per-dim element updates in the interpreted HOF fold scale
# with dim, the numpy broadcast does not).
V5_EXPR_MAX_DIM = 64


def v5_embedding_column(tokens: Column, dim: int = DEFAULT_DIM) -> Column:
    """The V5 embedding with the measured width routing applied: the
    expression form at narrow dims, the Arrow-batched pandas UDF at the
    production width (reference dim 1536).  Both forms are bit-identical
    (tests/test_vector_pandas.py), so routing never changes answers."""
    if dim <= V5_EXPR_MAX_DIM:
        return deterministic_embedding_expr(tokens, dim)
    from .vector_pandas import v5_embedding_udf

    return v5_embedding_udf(dim)(tokens)


def active_context_key() -> int:
    """Cache key tying a Py4J-backed Column tree to the JVM that built
    it (round-14 ADVICE): a cached unresolved Column references gateway
    objects of ONE SparkContext — after a stop/relaunch in the same
    process (long-lived services, test harnesses) the old tree points
    at a dead gateway and every use fails opaquely.  Keying the cache
    on the active context's identity makes a restarted context rebuild
    its trees; the old entries age out of the LRU."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return id(sc) if sc is not None else 0


@_lru_cache(maxsize=32)
def _v5_fen_embedding_column(dim: int, ctx_key: int) -> Column:
    from .text import tokenize_sources

    return v5_embedding_column(tokenize_sources(F.col("fen")), dim)


def v5_fen_embedding_column(dim: int = DEFAULT_DIM) -> Column:
    """The drain/sink embedding column over the ``fen`` field, cached per
    (dim, active SparkContext): building the dim-wide aggregate lambda
    costs O(dim) Py4J calls (~0.3 s of pure driver time at dim=16), and
    the tree is an immutable name-based unresolved expression, so one
    instance is safely shared by every plan that selects it — within
    the JVM that built it (see ``active_context_key``)."""
    return _v5_fen_embedding_column(dim, active_context_key())


def duckdb_bucket_sql(a: int, b: int, base_sql: str = None) -> str:
    base = base_sql or (
        f"(('0x' || substring(md5('v5:' || t), 1, 15))::BIGINT % {_P})"
    )
    return f"((({a} * {base} + {b}) % {_P}) % 10000)"


def deterministic_embedding_duckdb_sql(tokens_sql: str, dim: int = DEFAULT_DIM) -> str:
    """DuckDB SQL fragment computing the same embedding from a LIST(VARCHAR)
    expression ``tokens_sql`` — used by the correctness oracle."""
    dims = ", ".join(
        "least(greatest(CAST(list_sum(list_transform("
        + tokens_sql
        + f", t -> {duckdb_bucket_sql(a, b)})) AS DOUBLE)"
        f" / 10000.0 / len({tokens_sql}), 0.0), 1.0)"
        for a, b in _v5_constants(dim)
    )
    return f"""
    CASE WHEN {tokens_sql} IS NULL OR len({tokens_sql}) = 0
         THEN [0.0 FOR i IN range({dim})]
         ELSE [{dims}]
    END
    """
