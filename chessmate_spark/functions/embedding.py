"""V5 deterministic fallback embedding — the engine-defined stable hash.

The reference's fallback embedder (query_embedding_provider.ml:19-42) maps
each dimension i to the mean over tokens of ``(|hash (token, i)| mod 10_000)
/ 10_000`` clamped to [0,1].  OCaml's ``Hashtbl.hash`` is not portable
(SURVEY §7.3), so this engine *defines* its stable hash:

    bucket(token, i) = (int(md5(token || ':' || i)[:8 hex], 16) % 10000) / 10000.0

MD5 is available identically in Python (hashlib), Spark (``md5``/``conv``) and
DuckDB (``md5``/hex cast), which makes the entire vector path reproducible and
oracle-checkable without any external service.  Three equivalent forms are
provided: pure Python (driver-side query vectors), a Spark Column expression
(distributed, JVM-side — no Python UDF), and a DuckDB SQL fragment (oracle).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIM = 16  # test dimension per FIXTURES.md; production uses 1536


def hash_bucket_int(token: str, index: int) -> int:
    digest = hashlib.md5(f"{token}:{index}".encode("utf-8")).hexdigest()
    return int(digest[:8], 16) % 10_000


def hash_bucket(token: str, index: int) -> float:
    return hash_bucket_int(token, index) / 10_000.0


def deterministic_embedding(tokens: Sequence[str], dim: int = DEFAULT_DIM) -> List[float]:
    """Driver-side V5: mean of hash buckets per dimension, clamped [0,1].

    The per-dimension sum runs over *integer* buckets (exact in any engine /
    accumulation order); only the final division is floating-point — this
    keeps Spark, DuckDB and Python bit-identical.
    """
    toks = list(tokens)
    if not toks:
        return [0.0] * dim
    n = float(len(toks))
    out: List[float] = []
    for i in range(dim):
        total = sum(hash_bucket_int(t, i) for t in toks)
        out.append(min(1.0, max(0.0, total / 10_000.0 / n)))
    return out


def _bucket_int_expr(token: Column, index: Column) -> Column:
    digest = F.md5(F.concat(token, F.lit(":"), index.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % 10_000


def deterministic_embedding_expr(tokens: Column, dim: int = DEFAULT_DIM) -> Column:
    """Distributed V5 over an array<string> column → array<double> of ``dim``.

    Pure SQL expressions (md5/conv/aggregate/transform) — stays JVM-side.
    Empty/null token arrays embed to the zero vector.
    """
    def one_dim(i: Column) -> Column:
        total = F.aggregate(
            tokens,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + _bucket_int_expr(t, i),
        )
        mean = total.cast("double") / F.lit(10_000.0) / F.size(tokens).cast("double")
        return F.least(F.greatest(mean, F.lit(0.0)), F.lit(1.0))

    vec = F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), one_dim)
    zero = F.array(*[F.lit(0.0) for _ in range(dim)])
    return F.when(tokens.isNull() | (F.size(tokens) == 0), zero).otherwise(vec)


def deterministic_embedding_duckdb_sql(tokens_sql: str, dim: int = DEFAULT_DIM) -> str:
    """DuckDB SQL fragment computing the same embedding from a LIST(VARCHAR)
    expression ``tokens_sql`` — used by the correctness oracle."""
    bucket = (
        "(('0x' || substring(md5(t || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT"
        " % 10000)"
    )
    return f"""
    CASE WHEN {tokens_sql} IS NULL OR len({tokens_sql}) = 0
         THEN [0.0 FOR i IN range({dim})]
         ELSE [
            least(greatest(
              CAST(list_sum(list_transform({tokens_sql}, t -> {bucket})) AS DOUBLE)
                / 10000.0 / len({tokens_sql}),
              0.0), 1.0)
            FOR i IN range({dim})
         ]
    END
    """
