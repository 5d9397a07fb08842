"""End-to-end curation pipeline net: stage monotonicity, write/read
round-trip, and bit-level determinism across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from chessmate_spark.pipeline import curate_corpus

SF_DIR = "/root/testdata/sf0.001"


def _content_hash(spark, path):
    df = spark.read.parquet(path)
    return (
        df.select(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.col("text"),
                    F.col("shard").cast("string"),
                    F.col("shard_pos").cast("string"),
                )
            ).alias("h")
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
        .collect()[0][0]
    )


def test_curation_pipeline_stages_and_determinism(spark, tmp_path):
    out1 = str(tmp_path / "run1")
    report = curate_corpus(spark, SF_DIR, out1)

    # stages only drop rows, and every kept row is written
    assert (
        report["input"]
        >= report["valid"]
        >= report["exact_deduped"]
        >= report["near_deduped"]
        >= report["quality_gated"]
        == report["written"]
        > 0
    )
    assert report["shards"] == 8

    # written layout: shard column partitions the output; shard_pos is a
    # dense per-shard sequence starting at 0
    df = spark.read.parquet(out1)
    per_shard = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
        )
        .collect()
    )
    for r in per_shard:  # row_number is 1-based: dense 1..n per shard
        assert r["lo"] == 1
        assert r["hi"] == r["n"]

    # survivors are scrubbed: no raw emails survive in written text
    assert df.filter(F.col("text").rlike(r"[\w.]+@[\w.]+")).count() == 0

    # byte-level determinism: a second run writes identical content
    out2 = str(tmp_path / "run2")
    report2 = curate_corpus(spark, SF_DIR, out2)
    assert report2 == report
    assert _content_hash(spark, out1) == _content_hash(spark, out2)


def test_source_cap_stage_bounds_every_source(spark, tmp_path):
    from chessmate_spark.pipeline import curate_corpus

    out = str(tmp_path / "capped")
    report = curate_corpus(
        spark, "/root/testdata/sf0.001", out, source_cap=3
    )
    assert report["source_capped"] <= report["quality_gated"]
    written = spark.read.parquet(out)
    from pyspark.sql import functions as F

    per_source = written.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 3 for r in per_source)


def test_semantic_dedup_stage_drops_embedding_neardups(spark, tmp_path):
    from chessmate_spark.pipeline import curate_corpus

    out_a = str(tmp_path / "with_sem")
    rep = curate_corpus(
        spark, "/root/testdata/sf0.001", out_a, semantic_dedup=True
    )
    # stage is between near-dedup and the quality gate and only drops
    assert rep["semantic_deduped"] <= rep["near_deduped"]
    assert rep["written"] <= rep["semantic_deduped"]
    # it must actually fire on this fixture (embeddings contain near-dups)
    assert rep["semantic_deduped"] < rep["near_deduped"]
    # deterministic across runs
    out_b = str(tmp_path / "with_sem2")
    rep2 = curate_corpus(
        spark, "/root/testdata/sf0.001", out_b, semantic_dedup=True
    )
    assert rep == rep2


def test_incremental_curation_lifecycle(spark, tmp_path):
    """Round 12 (verdict #1): the curation DAG in INCREMENTAL mode —
    two increments through one commit-log-backed signature store.
    Increment 2's near-dup stage must drop docs duplicating increment
    1's corpus (cross-increment dedup the batch-local DAG cannot see),
    the store must gain exactly one version per batch, and a REPLAY of
    a batch must re-curate identically without appending state."""
    from chessmate_spark.ingest.dedup_lifecycle import open_signature_store
    from chessmate_spark.pipeline import curate_corpus

    store_path = str(tmp_path / "sig_store")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    half0 = docs.filter(F.col("doc_id") % 2 == 0)
    half1 = docs.filter(F.col("doc_id") % 2 == 1)

    rep0 = curate_corpus(
        spark, SF_DIR, str(tmp_path / "inc0"),
        signature_store_path=store_path, batch_id=0, docs=half0,
    )
    assert rep0["store_version"] == 1
    rep1 = curate_corpus(
        spark, SF_DIR, str(tmp_path / "inc1"),
        signature_store_path=store_path, batch_id=1, docs=half1,
    )
    assert rep1["store_version"] == 2

    # cross-increment dedup fired: half1 curated incrementally keeps
    # FEWER docs than half1 curated alone (its cross-half near-dups
    # survive a batch-local run but drop against the store)
    rep1_solo = curate_corpus(
        spark, SF_DIR, str(tmp_path / "solo1"), docs=half1
    )
    assert rep1["near_deduped"] < rep1_solo["near_deduped"]

    # the store mirrors the exact-deduped corpus of both increments,
    # appended exactly once each
    store = open_signature_store(spark, store_path)
    assert store.latest_version() == 2
    assert store.read().count() == (
        rep0["exact_deduped"] + rep1["exact_deduped"]
    )

    # replay of batch 1: identical curation output, NO state append
    rep1_replay = curate_corpus(
        spark, SF_DIR, str(tmp_path / "inc1b"),
        signature_store_path=store_path, batch_id=1, docs=half1,
    )
    assert rep1_replay["store_version"] == 0  # replay detected
    assert store.latest_version() == 2
    assert {k: v for k, v in rep1_replay.items() if k != "store_version"} \
        == {k: v for k, v in rep1.items() if k != "store_version"}
    assert _content_hash(spark, str(tmp_path / "inc1")) == _content_hash(
        spark, str(tmp_path / "inc1b")
    )

    # missing batch_id fails loudly
    import pytest

    with pytest.raises(ValueError, match="batch_id"):
        curate_corpus(
            spark, SF_DIR, str(tmp_path / "bad"),
            signature_store_path=store_path, docs=half1,
        )


def test_shard_manifest_integrity_and_determinism(spark, tmp_path):
    import json

    from chessmate_spark.pipeline import curate_corpus

    out_a, out_b = str(tmp_path / "ma"), str(tmp_path / "mb")
    rep_a = curate_corpus(spark, "/root/testdata/sf0.001", out_a)
    rep_b = curate_corpus(spark, "/root/testdata/sf0.001", out_b)
    with open(f"{out_a}/_MANIFEST.json") as fh:
        m_a = json.load(fh)
    with open(f"{out_b}/_MANIFEST.json") as fh:
        m_b = json.load(fh)
    # byte-equal manifests across runs (deterministic shuffle + xor fp)
    assert m_a == m_b
    assert m_a["total_rows"] == rep_a["written"] == rep_b["written"]
    assert m_a["n_shards"] == rep_a["shards"]
    # fingerprint is order-insensitive but content-sensitive: dropping a
    # shard changes the total
    assert m_a["total_fingerprint"] != 0
    partial = {
        k: v for k, v in m_a["shards"].items() if int(k) != 0
    }
    fp = 0
    for v in partial.values():
        fp ^= v["fingerprint"]
    assert fp != m_a["total_fingerprint"]
