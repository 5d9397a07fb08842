"""Deterministic shuffle/shard operator: permutation, reproducibility,
balance, decorrelation, and the shard-partitioned writer layout."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.operators.ordering import (
    shuffle_shards,
    write_shuffled_shards,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_output_is_a_permutation_with_dense_positions(spark, docs):
    out = shuffle_shards(docs, "doc_id", n_shards=4)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # positions are dense 1..n per shard
    per_shard = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
        )
        .collect()
    )
    assert len(per_shard) == 4
    for row in per_shard:
        assert (row["lo"], row["hi"]) == (1, row["n"])


def test_assignment_is_reproducible_and_salt_sensitive(spark, docs):
    a = {
        (r["doc_id"]): (r["shard"], r["shard_pos"])
        for r in shuffle_shards(docs, "doc_id", 4).collect()
    }
    b = {
        (r["doc_id"]): (r["shard"], r["shard_pos"])
        for r in shuffle_shards(docs, "doc_id", 4).collect()
    }
    assert a == b  # no rand() anywhere
    c = {
        (r["doc_id"]): (r["shard"], r["shard_pos"])
        for r in shuffle_shards(docs, "doc_id", 4, salt="other:").collect()
    }
    assert a != c  # a different salt is a different permutation


def test_shards_are_balanced_and_decorrelated(spark, docs):
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", 4)
    sizes = {r["shard"]: r["n"] for r in
             out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    for size in sizes.values():
        assert abs(size - n / 4) < n * 0.15  # md5 spreads uniformly
    # input order must not survive: consecutive doc_ids land apart
    first_shard = {
        r["doc_id"]: r["shard"]
        for r in out.filter(F.col("doc_id") < 20).collect()
    }
    assert len(set(first_shard.values())) > 1


def test_rejects_bad_shard_count(spark, docs):
    with pytest.raises(ValueError):
        shuffle_shards(docs, "doc_id", 0)


def test_writer_produces_partitioned_ordered_layout(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_shuffled_shards(docs.limit(200), path, "doc_id", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) \
        == {0, 1, 2, 3}
    # a single shard directory read yields that shard only, positions dense
    one = spark.read.parquet(f"{path}/shard=2")
    pos = sorted(r["shard_pos"] for r in one.collect())
    assert pos == list(range(1, len(pos) + 1))
