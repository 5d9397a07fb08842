"""Deterministic corpus shuffling + sharding (training-data ordering).

Before pretraining, a corpus is globally shuffled and cut into shards so
every data-parallel reader streams an unbiased mix.  ``rand()`` cannot do
this job at scale: re-running the pipeline (task retry, incremental
backfill, resumed run) must land every document in the SAME shard at the
SAME position, or readers lose exactly-once semantics over the corpus.

The operator derives a 60-bit pseudorandom key from ``md5(salt || id)``
— the same integer-from-md5 arithmetic the engine's minhash family and
stratified sampler use, replayable bit-for-bit in DuckDB — then

  * ``shard``     = key mod n_shards          (which file/reader gets it)
  * ``shard_pos`` = rank of (key, id) in shard (its position in the file)

Plan shape at 100 TB: one hash exchange on ``shard`` + an in-partition
sort — exactly the physical work a distributed shard writer must do (each
task sorts and writes one shard, positions are file order).  There is NO
global sort: ordering is only ever per shard, which is all a per-reader
stream needs.  The md5 key decorrelates input order from output order, so
adjacent source documents (same crawl, same domain) scatter uniformly
across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(id_col: str, salt: str = "shfl:"):
    """60-bit deterministic pseudorandom key: first 15 md5 hex digits of
    ``salt || id`` as an integer (fits bigint, engine-portable)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("bigint")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shfl:",
) -> DataFrame:
    """Input rows + (shard, shard_pos): a reproducible global shuffle cut
    into ``n_shards`` balanced, internally-ordered shards."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = shuffle_key(id_col, salt)
    w = Window.partitionBy("shard").orderBy(
        F.col("_shfl_key").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_shfl_key", key)
        .withColumn("shard", F.col("_shfl_key") % n_shards)
        .withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
        .drop("_shfl_key")
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    salt: str = "shfl:",
) -> None:
    """Materialize the shuffle as a shard-partitioned parquet layout:
    one directory per shard, rows ordered by shard_pos within each file
    (``sortWithinPartitions`` after a shard repartition keeps the write
    single-pass — the exchange IS the shard assignment)."""
    out = shuffle_shards(df, id_col, n_shards, salt)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def shard_manifest(spark, path: str, id_col: str = "doc_id") -> dict:
    """Integrity manifest for a sharded corpus write: per-shard row count
    and an ORDER-INSENSITIVE content fingerprint (bit-xor of xxhash64
    over the id column — commutative, so file/partition layout cannot
    change it), plus corpus totals.

    The consumer contract every training run wants before reading 10k
    shard files at 100 TB: (a) did the write complete (shards dense,
    totals match the report), (b) is this EXACTLY the corpus a previous
    run trained on (fingerprints equal) — answered from one column-pruned
    scan, no data comparison.  Determinism note: the xor fingerprint
    pairs with the deterministic shuffle (no rand() anywhere in the
    pipeline), so two runs over the same input produce byte-equal
    manifests."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    per_shard = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(f"bit_xor(xxhash64({id_col}))").alias("fp"),
        )
        .orderBy("shard")
        .collect()
    )
    shards = {
        int(r["shard"]): {"rows": int(r["rows"]), "fingerprint": int(r["fp"])}
        for r in per_shard
    }
    total_fp = 0
    for v in shards.values():
        total_fp ^= v["fingerprint"]
    return {
        "n_shards": len(shards),
        "total_rows": sum(v["rows"] for v in shards.values()),
        "total_fingerprint": total_fp,
        "shards": shards,
    }


def write_shard_manifest(spark, path: str, id_col: str = "doc_id") -> dict:
    """Compute and persist the manifest as ``_MANIFEST.json`` inside the
    shard directory; returns it."""
    import json
    import os

    manifest = shard_manifest(spark, path, id_col)
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return manifest
