"""Edge-case pins for the hashing layer (ADVICE round-5 items).

A minhash signature must be all-NULL whenever NO element contributed —
empty array, NULL array, or (the latent hazard) a non-empty array whose
elements are all NULL: the fold's sentinel init must never leak as a
signature, or two degenerate docs would LSH-collide on it.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from chessmate_spark.functions.hashing import MINHASH_PRIME, minhash_expr

SCHEMA = StructType([StructField("sh", ArrayType(StringType(), True), True)])


def test_minhash_degenerate_inputs_all_null_signature(spark):
    rows = [([],), (None,), ([None],), ([None, None],)]
    out = spark.createDataFrame(rows, SCHEMA).select(
        minhash_expr(F.col("sh"), 4).alias("sig")
    ).collect()
    for r in out:
        assert r["sig"] == [None, None, None, None], r


def test_minhash_mixed_null_elements_ignore_nulls(spark):
    """A NULL element beside real ones contributes nothing — the
    signature equals the one from the non-null elements alone, and no
    slot ever equals the sentinel."""
    rows = [(["abc", None, "def"],), (["abc", "def"],)]
    out = spark.createDataFrame(rows, SCHEMA).select(
        minhash_expr(F.col("sh"), 8).alias("sig")
    ).collect()
    assert out[0]["sig"] == out[1]["sig"]
    assert all(v is not None and v < MINHASH_PRIME for v in out[0]["sig"])
