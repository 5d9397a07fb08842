"""Salted join: output identity vs the plain join, inner and left."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.operators.skew import salted_join


@pytest.fixture()
def frames(spark):
    # skewed fact: key 1 dominates; key 99 has no dim match
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else 99, float(i)) for i in range(200)],
        ["row_id", "k", "val"],
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold")], ["dk", "name"]
    )
    return fact, dim


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_inner_matches_plain_join(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "inner")
    salted = salted_join(fact, dim, "k", "dk", salt_on=["row_id"], salts=4)
    cols = ["row_id", "k", "val", "dk", "name"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_left_keeps_unmatched_rows_once(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, fact["k"] == dim["dk"], "left")
    salted = salted_join(
        fact, dim, "k", "dk", salt_on=["row_id"], salts=4, how="left"
    )
    cols = ["row_id", "k", "val", "dk", "name"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)
    assert salted.count() == fact.count()


def test_salt_column_not_leaked(spark, frames):
    fact, dim = frames
    out = salted_join(fact, dim, "k", "dk", salt_on=["row_id"], salts=4)
    assert all(not c.startswith("_cm_salt") for c in out.columns)


def test_rejects_unsupported_how(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", "dk", salt_on=["row_id"], how="full")


def test_rejects_nonpositive_salts(spark, frames):
    fact, dim = frames
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", "dk", salt_on=["row_id"], salts=0)


def test_rejects_reserved_salt_column(spark, frames):
    fact, dim = frames
    poisoned = fact.withColumn("_cm_salt", fact["row_id"])
    with pytest.raises(ValueError, match="_cm_salt"):
        salted_join(poisoned, dim, "k", "dk", salt_on=["row_id"])
    with pytest.raises(ValueError, match="_cm_salt"):
        salted_join(
            fact, dim.withColumn("_cm_salt", dim["dk"]), "k", "dk",
            salt_on=["row_id"],
        )
