"""Keyed agent-cache table: digest keys, lookup, first-writer-wins merge."""

from pyspark.sql import functions as F

from chessmate_spark.operators.cache import (
    agent_cache_key,
    cache_lookup,
    cache_merge,
)


def _requests(spark):
    df = spark.createDataFrame(
        [
            (1, "find kings indian", ["kings", "indian"], "pgn-a"),
            (2, "find sicilian", ["sicilian"], "pgn-b"),
            (3, "find kings indian", ["kings", "indian"], "pgn-a"),
        ],
        "id long, cleaned string, kw array<string>, pgn string",
    )
    return df.withColumn(
        "cache_key",
        agent_cache_key(
            F.col("cleaned"), F.col("kw"), F.lit(50),
            F.lit(None).cast("int"), F.lit(None).cast("int"), F.lit(None).cast("int"),
            F.lit(None).cast("string"), F.lit("1-0"), F.col("pgn"),
        ),
    )


def test_key_is_deterministic_and_input_sensitive(spark):
    rows = {r["id"]: r["cache_key"] for r in _requests(spark).collect()}
    assert rows[1] == rows[3]  # identical plan+pgn → identical key
    assert rows[1] != rows[2]


def test_lookup_without_cache_is_all_miss(spark):
    out = cache_lookup(
        _requests(spark).select("id", "cache_key"), None,
        value_cols=["agent_score"],
    )
    assert all(not r["cache_hit"] for r in out.collect())


def test_merge_first_writer_wins_and_lookup_hits(spark):
    req = _requests(spark)
    first = req.filter(F.col("id") == 1).select(
        "cache_key", F.lit(0.8).alias("agent_score")
    )
    cache = cache_merge(None, first)
    # second write to the same key must NOT overwrite
    again = req.filter(F.col("id") == 3).select(
        "cache_key", F.lit(0.1).alias("agent_score")
    )
    cache = cache_merge(cache, again)
    assert cache.count() == 1
    out = cache_lookup(
        req.select("id", "cache_key"), cache, value_cols=["agent_score"]
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["cache_hit"] and by_id[1]["agent_score"] == 0.8
    assert by_id[3]["cache_hit"] and by_id[3]["agent_score"] == 0.8
    assert not by_id[2]["cache_hit"]
