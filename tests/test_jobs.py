"""Embedding-jobs queue pipeline tests (Q1-Q6) — lifecycle expectations from
the reference's test_integration.ml:50-88 (claim→complete→vectorized)."""

import pathlib

import pytest
from pyspark.sql import functions as F

from chessmate_spark.ingest import ingest_pgn_text
from chessmate_spark.streaming import JobsState, claim_batch, drain_jobs, prune_stale_jobs

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def drained(spark):
    raw = (FIXTURES / "sample_game.pgn").read_text() + "\n" + (
        FIXTURES / "annotated_game.pgn"
    ).read_text()
    ingest = ingest_pgn_text(spark, raw)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions,
        ingest.games,
        ingest.players,
        batch_size=4,
        dim=8,
    )
    return ingest, state


def test_claim_is_oldest_first(spark, drained):
    ingest, _ = drained
    claimed = claim_batch(ingest.embedding_jobs, 3).collect()
    seqs = [r["enqueued_seq"] for r in claimed]
    assert seqs == sorted(seqs)
    assert len(claimed) == 3


def test_drain_completes_all_jobs(drained):
    ingest, state = drained
    statuses = {r["status"] for r in state.jobs.collect()}
    assert statuses == {"completed"}
    assert state.jobs.filter(F.col("attempts") != 1).count() == 0
    # 6 + 16 positions at batch size 4 → ceil(22/4) = 6 batches
    assert state.batches_run == 6


def test_vectors_match_positions(drained):
    ingest, state = drained
    vectors = state.position_vectors
    assert vectors.count() == ingest.positions.count()
    row = vectors.first()
    assert len(row["embedding"]) == 8
    assert row["vector_id"] is not None and len(row["vector_id"]) == 32
    # payload carries the denormalized game/player fields (J2)
    assert {"white", "black", "opening_slug", "eco", "result"} <= set(vectors.columns)


def test_vector_id_is_md5_of_fen(drained):
    ingest, state = drained
    joined = state.position_vectors.join(
        ingest.positions.select(F.col("id").alias("position_id"), F.col("fen").alias("pfen")),
        "position_id",
    )
    mismatches = joined.filter(F.md5(F.col("pfen")) != F.col("vector_id")).count()
    assert mismatches == 0


def test_prune_stale_jobs(drained):
    ingest, state = drained
    # re-ingest: fresh pending jobs for positions that already have vectors
    fresh = ingest.embedding_jobs
    pruned = prune_stale_jobs(fresh, state.position_vectors)
    assert pruned.filter(F.col("status") == "pending").count() == 0
