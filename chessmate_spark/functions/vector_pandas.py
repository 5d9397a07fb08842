"""Arrow-batched vector math (pandas UDFs) for wide-embedding hot paths.

No ``from __future__ import annotations`` here: pandas_udf resolves the
type hints from the function signature, and stringified hints defeat it.

Each batch is one numpy matrix operation — the 10-100x-over-row-at-a-time
path the brief mandates when Python is unavoidable.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def nearest_cells_udf(centroids: np.ndarray, nprobe: int):
    """array<float> -> array<int>: indices of the ``nprobe`` nearest
    centroids by L2, nearest first.  One matmul per Arrow batch."""
    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(1)

    @pandas_udf(ArrayType(IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # np.stack([]) raises; a zero-row partition is legal
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        d = (X**2).sum(1, keepdims=True) + c_sq - 2.0 * X @ c.T
        if nprobe == 1:
            idx = d.argmin(1)[:, None]
        else:
            take = min(nprobe, d.shape[1])
            part = np.argpartition(d, take - 1, axis=1)[:, :take]
            order = np.take_along_axis(d, part, axis=1).argsort(1)
            idx = np.take_along_axis(part, order, axis=1)
        return pd.Series([row.tolist() for row in idx])

    return cells


@pandas_udf(DoubleType())
def pandas_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine similarity over two array<float> columns, vectorized
    per Arrow batch.  Alternative to the zip_with/aggregate expression when
    vectors are wide (HOFs evaluate interpreted; numpy does not)."""
    if len(a) == 0:  # np.stack([]) raises; a zero-row partition is legal
        return pd.Series([], dtype=np.float64)
    A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
    B = np.stack([np.asarray(x, dtype=np.float64) for x in b])
    dots = (A * B).sum(1)
    denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(out)


def v5_embedding_udf(dim, token_budget=None):
    """array<string> tokens -> array<double>: the V5 deterministic
    embedding (functions/embedding.py) as an Arrow-batched pandas UDF.

    Bit-identical to ``deterministic_embedding_expr``: the same md5 base
    per token (lru-cached Python md5), the same universal-hash bucket
    arithmetic in uint64 (a*base + b < 2^62, no overflow), integer sums
    regrouped exactly, one final float division per dimension.  Each
    Arrow batch is processed in token-budgeted numpy blocks so the
    (tokens x dim) bucket matrix stays O(block) regardless of batch
    size.  At the production width (dim=1536) this replaces ~dim
    interpreted HOF element updates per token with one numpy
    broadcast-multiply — see EXPLAIN.md for the measured routing rule
    vs the expression form."""
    from .embedding import _v5_constants, v5_base
    from .hashing import MINHASH_PRIME

    consts = np.asarray(_v5_constants(dim), dtype=np.uint64)
    A, B = consts[:, 0], consts[:, 1]
    P = np.uint64(MINHASH_PRIME)
    TEN_K = np.uint64(10_000)
    if token_budget is None:
        token_budget = max(1, (1 << 23) // max(dim, 1))  # block ~64 MiB
    token_budget = max(1, int(token_budget))
    zero = [0.0] * dim

    @pandas_udf(ArrayType(DoubleType()))
    def embed(tokens: pd.Series) -> pd.Series:
        rows = list(tokens)
        out = [None] * len(rows)
        i = 0
        while i < len(rows):
            j, total = i, 0
            while j < len(rows):
                t = rows[j]
                n = 0 if t is None else len(t)
                if total and total + n > token_budget:
                    break
                total += n
                j += 1
            flat, lens = [], []
            for idx, r in enumerate(rows[i:j]):
                if r is None or len(r) == 0:
                    lens.append(0)
                elif any(t is None for t in r):
                    # match the expression form exactly: a NULL token
                    # poisons the whole fold (md5(NULL) is NULL), and
                    # the final clamp's greatest(NULL, 0.0) resolves to
                    # 0.0 (greatest/least skip NULLs) — so the output
                    # is the ZERO vector, never a hash of 'None'
                    lens.append(0)
                else:
                    lens.append(len(r))
                    flat.extend(r)
            if flat:
                bases = np.fromiter(
                    (v5_base(t) for t in flat),
                    dtype=np.uint64,
                    count=len(flat),
                )
                buckets = (
                    (bases[:, None] * A[None, :] + B[None, :]) % P
                ) % TEN_K
                csum = np.zeros((len(flat) + 1, dim), dtype=np.uint64)
                np.cumsum(buckets, axis=0, out=csum[1:])
                starts = np.concatenate(([0], np.cumsum(lens)))
            for k, n in enumerate(lens):
                if n == 0:
                    out[i + k] = zero
                else:
                    tot = csum[starts[k + 1]] - csum[starts[k]]
                    out[i + k] = np.minimum(
                        1.0, tot.astype(np.float64) / 10_000.0 / n
                    ).tolist()
            i = j
        return pd.Series(out)

    return embed


def signatures_udf(planes):
    """(n_tables, n_planes, dim) hyperplanes -> UDF: array<float> ->
    array<long>, the per-table sign-bit signatures packed as integers.

    Replaces n_tables*n_planes interpreted zip_with/aggregate dot products
    per row with ONE numpy matmul per Arrow batch."""
    T, P, D = planes.shape
    flat = planes.reshape(T * P, D).astype(np.float64)
    weights = (1 << np.arange(P)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # np.stack([]) raises; a zero-row partition is legal
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (X @ flat.T) >= 0
        ints = bits.reshape(len(X), T, P).astype(np.int64) @ weights
        return pd.Series([row.tolist() for row in ints])

    return sigs


def portable_signatures_udf(planes_int, n_tables, n_planes, quant):
    """Integer-exact sibling of ``signatures_udf`` for the PORTABLE
    hyperplane family (functions/hashing.py portable_hyperplanes): the
    vector is quantized to ``q_i = floor(v_i * quant + 0.5)`` (BIGINT —
    the portable_round grid), the dot products ``q · c`` run in int64
    (|q|<=quant*|v|, |c|<=scale: 64-dim unit-ish vectors stay far below
    2^63, and integer sums are associativity-free, so a SQL mirror
    computing the same products in any order lands on the SAME sign —
    no float summation-order hazard), and each table's sign bits pack
    little-endian into one bigint band value."""
    T, P = n_tables, n_planes
    flat = np.asarray(planes_int, dtype=np.int64)
    weights = (1 << np.arange(P)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # np.stack([]) raises; a zero-row partition is legal
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        Q = np.floor(X * quant + 0.5).astype(np.int64)
        # int64 exactness bound: |sum_i q_i * c_i| <= dim * max|q| *
        # scale must stay under 2^63 or numpy wraps SILENTLY (DuckDB
        # would error loudly — the engines would then disagree).  At
        # quant=scale=1e6 and dim 64 this allows |v| up to ~1.4e5 —
        # any real embedding passes; a mis-scaled caller fails here.
        dim = flat.shape[1]
        limit = (1 << 62) // (int(np.abs(flat).max()) * dim + 1)
        assert int(np.abs(Q).max(initial=0)) <= limit, (
            "portable signature overflow: quantized vector magnitude "
            f"{int(np.abs(Q).max(initial=0))} exceeds the int64-exact "
            f"bound {limit} — rescale the vectors or lower quant"
        )
        bits = (Q @ flat.T) >= 0
        ints = bits.reshape(len(X), T, P).astype(np.int64) @ weights
        return pd.Series([row.tolist() for row in ints])

    return sigs


def _pq_codes_matrix(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(rows, dim) -> (rows, m) int32 nearest-centroid indices per
    subspace.  One matmul per subspace; argmin ||x - c||^2 ==
    argmax (x.c - ||c||^2/2)."""
    m, ksub, dsub = books.shape
    out = np.empty((len(X), m), dtype=np.int32)
    for sub in range(m):
        Xs = X[:, sub * dsub : (sub + 1) * dsub]
        half_sq = 0.5 * (books[sub] ** 2).sum(1)
        out[:, sub] = (Xs @ books[sub].T - half_sq).argmax(1)
    return out


def pq_encode_udf(codebooks: np.ndarray, packed: bool = False):
    """array<float> -> product-quantization codes — each vector
    L2-normalized, then per SUBSPACE the nearest codebook centroid
    index.  One matmul per (subspace, Arrow batch).

    ``packed=False``: array<int> (one 4-byte element per code).
    ``packed=True``: binary — ksub <= 256 means one BYTE per code, so
    the codes column the ADC scan moves is m bytes per vector instead
    of an m-element int array (the real payload shrink is recorded by
    scripts/scale_smoke.py --pq-bytes, not claimed from the 32x
    float->byte arithmetic)."""
    books = codebooks.astype(np.float64)
    m, ksub, _dsub = books.shape
    if packed and ksub > 256:
        raise ValueError(f"packed codes need ksub <= 256, got {ksub}")

    if packed:

        @pandas_udf(BinaryType())
        def encode(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:  # np.stack([]) raises on empty partitions
                return pd.Series([], dtype=object)
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            codes = _pq_codes_matrix(X / norms[:, None], books)
            return pd.Series(
                [row.tobytes() for row in codes.astype(np.uint8)]
            )

        return encode

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack([]) raises; a zero-row partition is legal
            return pd.Series([], dtype=object)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        codes = _pq_codes_matrix(X / norms[:, None], books)
        return pd.Series(list(codes))

    return encode


def ivfpq_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """array<float> -> struct(cell int, codes binary): the IVFADC corpus
    index row (Jégou et al. 2011 §V).  Each vector is L2-normalized,
    assigned to its nearest coarse centroid (trained in normalized
    space), and the RESIDUAL x_norm - centroid[cell] is PQ-encoded with
    residual-trained codebooks.  One combined pass: the vector crosses
    the Arrow boundary once and never again (cell + codes are all the
    ADC scan reads)."""
    c = centroids.astype(np.float64)
    books = codebooks.astype(np.float64)
    m, ksub, _dsub = books.shape
    if ksub > 256:
        raise ValueError(f"packed codes need ksub <= 256, got {ksub}")
    c_sq = (c**2).sum(1)
    fields = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("codes", BinaryType()),
        ]
    )

    @pandas_udf(fields)
    def encode(vs: pd.Series) -> pd.DataFrame:
        if len(vs) == 0:  # np.stack([]) raises on empty partitions
            return pd.DataFrame(
                {
                    "cell": pd.Series([], dtype="int32"),
                    "codes": pd.Series([], dtype=object),
                }
            )
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        X = X / norms[:, None]
        d = (X**2).sum(1, keepdims=True) + c_sq - 2.0 * X @ c.T
        assign = d.argmin(1)
        codes = _pq_codes_matrix(X - c[assign], books)
        return pd.DataFrame(
            {
                "cell": assign.astype(np.int32),
                "codes": [row.tobytes() for row in codes.astype(np.uint8)],
            }
        )

    return encode
