"""End-to-end corpus curation pipeline: the LLM-training-data DAG every
operator family in this repo exists to serve, composed as ONE lazy Spark
plan chain — validate → exact-dedup → near-dup resolve → PII scrub →
quality gate → deterministic shuffle/shard write.

Run it:
    python -m chessmate_spark.pipeline [sf_dir] [out_dir]

Each stage is the already-oracle-checked operator (entries d1, d2/d8/d10,
d13 for the optional semantic stage, t2, t7, t9 — see SURVEY §2 addendum); the pipeline contributes the
COMPOSITION: stages share one SparkSession, intermediate frames stay
distributed (the only driver-side values are the per-stage counts in the
report), and the final write is the shard-partitioned layout
`write_shuffled_shards` materializes.  At 100 TB every stage keeps its
individually-audited plan shape — nothing in the composition adds a
shuffle beyond what the stages themselves declare.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import exact_duplicates, minhash_lsh_candidates
from .operators.graph import dup_clusters
from .operators.ordering import write_shuffled_shards
from .operators.textan import pii_scrub, quality_score


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.35,
    n_shards: int = 8,
    source_cap: int | None = None,
    semantic_dedup: bool = False,
    semantic_threshold: float = 0.35,
    signature_store_path: str | None = None,
    batch_id: int | None = None,
    docs: DataFrame | None = None,
) -> Dict[str, int]:
    """Run the curation DAG over ``{sf_dir}/documents.parquet`` and write
    training shards to ``out_dir``; returns the per-stage row counts
    (monotonically non-increasing — each stage only drops rows).

    INCREMENTAL MODE (round 12): pass ``signature_store_path`` (a
    commit-log signature store directory, created on first use) and a
    monotonic ``batch_id`` to treat the input as ONE ingest increment:
    the near-dup stage runs against the persisted store instead of
    within-corpus only (``ingest/dedup_lifecycle.dedup_increment``), so
    a document near-duplicating ANY earlier increment's doc is dropped
    too (cross-increment exact dups included — jaccard 1.0 clears any
    threshold), and the batch's signature state is appended to the
    store exactly once (commit-log txn marker = ``batch_id``; a
    replayed batch re-curates identically without double-appending).
    The report gains ``store_version`` (0 on a detected replay).
    ``docs`` overrides the input frame — how a caller feeds ONE
    increment's documents (any frame with the documents schema) instead
    of the whole table."""
    # validated BEFORE the first Spark action: a misuse must fail in
    # microseconds, not after a full corpus-scan count
    incremental = signature_store_path is not None
    if incremental and batch_id is None:
        raise ValueError(
            "incremental mode needs a monotonic batch_id for the "
            "store's exactly-once txn marker"
        )
    report: Dict[str, int] = {}
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    report["input"] = docs.count()

    # 1. structural validation (t13's checks as a filter)
    valid = docs.filter(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & F.col("doc_id").isNotNull()
    )
    report["valid"] = valid.count()

    # 2. exact dedup: drop every non-canonical member of a hash group
    exact_drop = (
        exact_duplicates(valid, "doc_id", "text")
        .select(F.explode("ids").alias("doc_id"), "canonical_id")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
    )
    exact_kept = valid.join(F.broadcast(exact_drop), "doc_id", "left_anti")
    report["exact_deduped"] = exact_kept.count()

    # 3. near-dup resolution: MinHash-LSH pairs → clusters → keep
    # canonical.  The dial is planner-ROUTED (round 11): at a prunable
    # threshold minhash_route returns the corpus-planned banding; at
    # this DAG's declared 0.1 the planner proves pruning infeasible and
    # returns the (16, 4) fallback — the tractability compromise, with
    # plan.detection_at_threshold as the recall disclosure (same
    # routing as the d2/d12 entries, without their static-oracle
    # tripwire: the DAG has no mirrored oracle to protect, so a future
    # prunable threshold just takes the planned dial).
    from .operators.dedup import minhash_route

    hashes, bands, _plan = minhash_route(report["exact_deduped"], 0.1)
    if incremental:
        # near-dup vs the PERSISTED store + within-batch (the lifecycle
        # loop): every flagged batch doc drops; its best match — an
        # earlier increment's doc or an earlier doc of this batch —
        # stays canonical (d1's min-id rule inside dedup_increment).
        # The store dial is validated against (hashes, bands)'s
        # num_hashes by the increment's one-row probe, so a dial drift
        # across increments fails loudly instead of mis-banding.
        from .ingest.dedup_lifecycle import dedup_increment, open_signature_store

        store = open_signature_store(spark, signature_store_path)
        inc = dedup_increment(
            store, exact_kept, "doc_id", "text", batch_id=batch_id,
            shingle_n=3, num_hashes=hashes, bands=bands, min_jaccard=0.1,
        )
        near_drop = inc.duplicates.select("doc_id")
        report["store_version"] = inc.appended_version or 0
    else:
        pairs = minhash_lsh_candidates(
            exact_kept, "doc_id", "text",
            shingle_n=3, num_hashes=hashes, bands=bands, min_jaccard=0.1,
        )
        near_drop = (
            dup_clusters(pairs).filter(~F.col("is_canonical")).select("doc_id")
        )
    near_kept = exact_kept.join(F.broadcast(near_drop), "doc_id", "left_anti")
    report["near_deduped"] = near_kept.count()

    # 3b. optional semantic dedup (SemDeDup, d13's operator): embedding
    # near-dups that share no text shingles still collapse here.  The
    # embeddings table keys by vec_id == doc_id; only vectors for
    # still-kept docs enter, and the drop-list is ids-only like every
    # other dedup stage.
    if semantic_dedup:
        from .operators.dedup import semantic_neardup_pairs

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb_kept = emb.join(
            near_kept.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        sem_pairs = semantic_neardup_pairs(
            emb_kept, "vec_id", "embedding", semantic_threshold,
            n_clusters=8, n_probe=4,
        )
        sem_drop = (
            dup_clusters(sem_pairs)
            .filter(~F.col("is_canonical"))
            .select("doc_id")
        )
        near_kept = near_kept.join(
            F.broadcast(sem_drop), "doc_id", "left_anti"
        )
        report["semantic_deduped"] = near_kept.count()

    # 4. PII scrub (audit counts dropped here; t7's entry pins the bytes)
    scrubbed = near_kept.join(
        pii_scrub(near_kept, "doc_id", "text").select(
            "doc_id", "scrubbed_text"
        ),
        "doc_id",
    ).select(
        "doc_id",
        F.col("scrubbed_text").alias("text"),
        "lang",
        "source",
        "n_chars",
    )

    # 5. quality gate
    gated = scrubbed.join(
        quality_score(scrubbed, "doc_id", "text").select("doc_id", "quality"),
        "doc_id",
    ).filter(F.col("quality") >= min_quality)
    report["quality_gated"] = gated.count()

    # 5b. optional per-source cap (t17's no-source-dominates guard):
    # deterministic md5 order, reproducible across runs — never rand()
    if source_cap is not None:
        from pyspark.sql import Window

        order_key = F.md5(
            F.concat(F.lit("cap:"), F.col("doc_id").cast("string"))
        )
        rk = F.row_number().over(
            Window.partitionBy("source").orderBy(order_key, F.col("doc_id"))
        )
        gated = (
            gated.withColumn("_rk", rk)
            .filter(F.col("_rk") <= source_cap)
            .drop("_rk")
        )
        report["source_capped"] = gated.count()

    # 6. deterministic shuffle + shard-partitioned write
    write_shuffled_shards(
        gated.select("doc_id", "text", "lang", "source", "quality"),
        out_dir,
        "doc_id",
        n_shards,
    )
    # integrity manifest: per-shard counts + order-insensitive content
    # fingerprints, persisted beside the shards (_MANIFEST.json) so a
    # consumer can verify completeness and corpus identity from one
    # column-pruned scan
    from .operators.ordering import write_shard_manifest

    manifest = write_shard_manifest(spark, out_dir, "doc_id")
    report["written"] = manifest["total_rows"]
    report["shards"] = manifest["n_shards"]
    return report


def main() -> None:
    import json
    import sys

    from .session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark(app_name="chessmate_curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = curate_corpus(spark, sf_dir, out_dir)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
