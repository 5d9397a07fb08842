"""A8 worker metrics + S8 collection bootstrap tests
(embedding_worker.ml:30-93, repo_qdrant.ml:172-216)."""

import pytest

from chessmate_spark.streaming.metrics import (
    WorkerMetrics,
    ensure_collection,
    worker_rates_frame,
)


def test_rates_arithmetic():
    m = WorkerMetrics(start_time=100.0)
    for i in range(10):
        m.update(failed=(i == 0), fen_length=50.0)
    processed, failed, jobs_per_min, chars_per_sec = m.snapshot(now=160.0)
    assert (processed, failed) == (10, 1)
    assert jobs_per_min == pytest.approx(10.0)      # 10 jobs / 1 min
    assert chars_per_sec == pytest.approx(500 / 60)


def test_elapsed_floor_prevents_div_by_zero():
    m = WorkerMetrics(start_time=100.0)
    m.update(failed=False, fen_length=10.0)
    _, _, jobs_per_min, chars_per_sec = m.snapshot(now=100.0)
    assert jobs_per_min == pytest.approx(1 / (0.001 / 60))
    assert chars_per_sec == pytest.approx(10 / 0.001)


def test_exposition_format():
    m = WorkerMetrics(start_time=0.0)
    m.update(failed=False, fen_length=45.0)
    body = m.exposition(now=60.0)
    assert body.splitlines() == [
        "embedding_jobs_processed_total 1",
        "embedding_jobs_failed_total 0",
        "embedding_worker_jobs_per_min 1.000000",
        "embedding_worker_characters_per_sec 0.750000",
    ]


def test_rates_frame_schema(spark):
    m = WorkerMetrics(start_time=0.0)
    df = worker_rates_frame(spark, m, now=1.0)
    assert df.columns == ["processed", "failed", "jobs_per_min", "chars_per_sec"]
    assert df.count() == 1


def test_ensure_collection_creates_then_noops(spark, tmp_path):
    root = str(tmp_path / "collections")
    first = ensure_collection(spark, root, "positions", vector_size=16)
    assert first["created"] is True
    assert first["vectors"] == {"size": 16, "distance": "Cosine"}
    assert set(first["payload_schema"]) == {
        "game_id", "fen", "white", "black", "opening_slug",
    }
    again = ensure_collection(spark, root, "positions", vector_size=16)
    assert again["created"] is False
    # the empty collection is readable with the right schema
    df = spark.read.parquet(first["location"])
    assert "embedding" in df.columns and df.count() == 0


def test_ensure_collection_rejects_config_mismatch(spark, tmp_path):
    root = str(tmp_path / "collections")
    ensure_collection(spark, root, "positions", vector_size=16)
    with pytest.raises(ValueError, match="vector config"):
        ensure_collection(spark, root, "positions", vector_size=32)
