"""Arrow-batched vector math (pandas UDFs) for wide-embedding hot paths.

No ``from __future__ import annotations`` here: pandas_udf resolves the
type hints from the function signature, and stringified hints defeat it.

Each batch is one numpy matrix operation — the 10-100x-over-row-at-a-time
path the brief mandates when Python is unavoidable.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType


def nearest_cells_udf(centroids: np.ndarray, nprobe: int):
    """array<float> -> array<int>: indices of the ``nprobe`` nearest
    centroids by L2, nearest first.  One matmul per Arrow batch."""
    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(1)

    @pandas_udf(ArrayType(IntegerType()))
    def cells(v: pd.Series) -> pd.Series:
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
    A = np.stack([np.asarray(x, dtype=np.float64) for x in a])
    B = np.stack([np.asarray(x, dtype=np.float64) for x in b])
    dots = (A * B).sum(1)
    denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(out)


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
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (X @ flat.T) >= 0
        ints = bits.reshape(len(X), T, P).astype(np.int64) @ weights
        return pd.Series([row.tolist() for row in ints])

    return sigs
