"""Ingest pipeline integration tests — expectations lifted from the
reference's test_integration.ml:21-48 (1 game, 2 players, 6 positions,
6 pending jobs for the sample fixture)."""

import pathlib

import pytest

from chessmate_spark.ingest import ingest_pgn_text

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def sample_result(spark):
    raw = (FIXTURES / "sample_game.pgn").read_text()
    return ingest_pgn_text(spark, raw)


def test_sample_game_counts(sample_result):
    counts = sample_result.counts()
    assert counts == {
        "games": 1,
        "players": 2,
        "positions": 6,
        "embedding_jobs": 6,
        "corrupt": 0,
    }


def test_sample_positions_content(sample_result):
    rows = sample_result.positions.orderBy("ply").collect()
    assert [r["san"] for r in rows] == ["e4", "e5", "Nf3", "Nc6", "Bb5", "a6"]
    assert rows[0]["fen"].startswith(
        "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b"
    )
    assert [r["side_to_move"] for r in rows] == [
        "black", "white", "black", "white", "black", "white",
    ]
    assert [r["move_number"] for r in rows] == [1, 1, 2, 2, 3, 3]


def test_sample_game_metadata(sample_result):
    game = sample_result.games.first()
    assert game["event"] == "Test Event"
    assert str(game["played_on"]) == "2024-01-01"
    assert game["result"] == "1-0"
    assert game["white_player_id"] is not None
    assert game["black_player_id"] is not None


def test_jobs_are_pending_with_order(sample_result):
    jobs = sample_result.embedding_jobs.orderBy("enqueued_seq").collect()
    assert all(j["status"] == "pending" for j in jobs)
    assert [j["position_id"] for j in jobs] == sorted(j["position_id"] for j in jobs)


def test_multi_game_with_corrupt_chunk(spark):
    raw = (FIXTURES / "malformed_twic.pgn").read_text()
    result = ingest_pgn_text(spark, raw)
    counts = result.counts()
    assert counts["games"] == 2
    assert counts["corrupt"] == 1
    corrupt = result.corrupt.first()
    assert "header" in corrupt["error"].lower() or "moves" in corrupt["error"].lower()


def test_player_upsert_against_existing(spark):
    raw = (FIXTURES / "sample_game.pgn").read_text()
    first = ingest_pgn_text(spark, raw)
    again = ingest_pgn_text(spark, raw, existing_players=first.players)
    # same two players, not duplicated
    assert again.players.count() == 2
    assert set(r["name"] for r in again.players.collect()) == {
        "Sample White", "Sample Black",
    }


def test_backpressure_guard(spark):
    raw = (FIXTURES / "sample_game.pgn").read_text()
    with pytest.raises(RuntimeError, match="queue too deep"):
        ingest_pgn_text(spark, raw, max_pending_jobs=10, pending_jobs=11)
