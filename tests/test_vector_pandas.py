"""Parity of the Arrow-batched V5 embedding UDF with the expression form.

The routing rule (EXPLAIN.md): narrow dims use the pure-expression plan,
the production width (1536) uses the pandas UDF — both must be
BIT-identical to the driver-side reference, or the routing choice would
change query answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from chessmate_spark.functions.embedding import (
    deterministic_embedding,
    deterministic_embedding_expr,
)
from chessmate_spark.functions.vector_pandas import v5_embedding_udf

TOKEN_ROWS = [
    (["kings", "indian", "defense"],),
    (["a"],),
    ([],),
    (None,),
    (["sicilian"] * 40 + ["najdorf", "variation"],),
    (["zz", "yy", "xx", "ww"],),
    # a NULL element poisons the fold (md5(NULL) is NULL) and the final
    # clamp resolves greatest(NULL, 0.0) to 0.0 — both forms must emit
    # the ZERO vector, never a hash of the string 'None'
    (["a", None, "b"],),
]

SCHEMA = StructType([StructField("toks", ArrayType(StringType()), True)])


def _frame(spark):
    return spark.createDataFrame(TOKEN_ROWS, SCHEMA)


def test_pandas_v5_bit_identical_to_expression(spark):
    for dim in (8, 16):
        df = _frame(spark).select(
            deterministic_embedding_expr(F.col("toks"), dim).alias("e"),
            v5_embedding_udf(dim)(F.col("toks")).alias("p"),
        )
        for row in df.collect():
            assert row["e"] == row["p"]  # exact float equality


def test_pandas_v5_matches_driver_reference_at_production_dim(spark):
    dim = 1536
    rows = _frame(spark).select(
        "toks", v5_embedding_udf(dim)(F.col("toks")).alias("p")
    ).collect()
    for row in rows:
        toks = row["toks"]
        if toks and any(t is None for t in toks):
            # SQL NULL-poisoning + clamp semantics; the pure-Python
            # reference has no NULL notion, so pin the zero vector
            assert row["p"] == [0.0] * dim
            continue
        expected = deterministic_embedding(toks or [], dim)
        assert row["p"] == expected


def test_pandas_v5_block_boundary_regroups_exactly(spark):
    """A tiny explicit token budget forces the Arrow batch to split into
    MANY numpy blocks (50 rows x 5 tokens at budget 7 -> a block every
    one-to-two rows), exercising the csum/starts block bookkeeping the
    default 2M-token budget never reaches at test scale; every row must
    still match the expression form exactly."""
    dim = 4
    udf = v5_embedding_udf(dim, token_budget=7)
    # i%8+3 -> rows of 3..10 tokens: several EXCEED the budget of 7,
    # exercising the single-oversized-row block branch too
    big = [(["tok%d" % (i % 7)] * (i % 8 + 3),) for i in range(50)]
    df = spark.createDataFrame(big, SCHEMA).select(
        "toks",
        udf(F.col("toks")).alias("p"),
        deterministic_embedding_expr(F.col("toks"), dim).alias("e"),
    )
    rows = df.collect()
    assert len(rows) == 50
    for row in rows:
        assert row["p"] == row["e"]


def test_all_batch_udfs_tolerate_empty_batches():
    # np.stack([]) raises ValueError; a zero-row Arrow batch (empty
    # partition after a selective filter) must not fail the task
    # (ADVICE r7 on pq_encode_udf; guard applied to every sibling)
    import numpy as np
    import pandas as pd

    from chessmate_spark.functions.vector_pandas import (
        nearest_cells_udf,
        pandas_cosine,
        pq_encode_udf,
        signatures_udf,
    )

    from chessmate_spark.functions.vector_pandas import ivfpq_encode_udf

    empty = pd.Series([], dtype=object)
    cents = np.eye(4, dtype=np.float64)
    assert len(nearest_cells_udf(cents, 2).func(empty)) == 0
    assert len(pandas_cosine.func(empty, empty)) == 0
    planes = np.ones((2, 3, 4), dtype=np.float64)
    assert len(signatures_udf(planes).func(empty)) == 0
    books = np.ones((2, 4, 2), dtype=np.float64)
    assert len(pq_encode_udf(books).func(empty)) == 0
    assert len(pq_encode_udf(books, packed=True).func(empty)) == 0
    assert len(ivfpq_encode_udf(cents, books).func(empty)) == 0
