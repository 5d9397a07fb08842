"""Serving shim tests: answer_question + CLI replicate a README-shaped
query session end-to-end on fixture data (reference chessmate_api.ml
query_handler, search_command.ml rendering)."""

import json
from pathlib import Path

import pytest

from chessmate_spark.query import (
    ServingError,
    answer_question,
    format_response_text,
)

FIXTURES = Path(__file__).parent / "fixtures"

CANONICAL_QUESTION = (
    "Find King's Indian games where White is 2500 and Black is"
    " 100 points lower"
)


@pytest.fixture(scope="module")
def tables(spark):
    from chessmate_spark.ingest import ingest_pgn_text
    from chessmate_spark.plans.hybrid import HybridTables
    from chessmate_spark.plans.queries import _CHESS_FIXTURE
    from chessmate_spark.streaming import JobsState, drain_jobs

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    return HybridTables(
        games=ingest.games, players=ingest.players,
        position_vectors=state.position_vectors,
    )


def test_canonical_question_payload(spark, tables):
    payload = answer_question(spark, tables, CANONICAL_QUESTION, dim=8)
    assert payload["question"] == CANONICAL_QUESTION
    assert payload["agent_status"] == "disabled"
    assert payload["total"] == 1
    assert payload["has_more"] is False
    assert payload["offset"] == 0
    assert payload["limit"] == 50
    # plan echo (chessmate_api.ml:386-414)
    plan = payload["plan"]
    assert {(f["field"], f["value"]) for f in plan["filters"]} == {
        ("eco_range", "E60-E99"),
        ("opening", "kings_indian_defense"),
    }
    assert plan["rating"]["max_rating_delta"] == 100
    # result document (chessmate_api.ml:77-115)
    (result,) = payload["results"]
    assert result["game_id"] == 2
    assert result["white"] == "Strong, Player"
    assert result["black"] == "Weaker, Player"
    assert result["year"] == 2023
    assert result["opening_name"] == "King's Indian Defense"
    assert result["eco"] == "E62"
    assert result["synopsis"] == (
        "Strong, Player vs Weaker, Player — KID Match (1-0)"
    )
    assert result["score"] == pytest.approx(0.81647, abs=1e-5)
    assert result["vector_score"] == pytest.approx(0.977516, abs=1e-5)
    assert result["keyword_score"] == pytest.approx(0.333333, abs=1e-5)
    assert result["agent_score"] is None
    assert result["agent_themes"] == []
    # summary (result_formatter.ml:8-16)
    assert payload["summary"] == (
        "#2 Strong, Player vs Weaker, Player (score 0.82)"
    )


def test_empty_result_summary_and_pagination(spark, tables):
    payload = answer_question(
        spark, tables, "games in the grunfeld defense", limit=5, offset=2,
        dim=8,
    )
    assert payload["limit"] == 5
    assert payload["offset"] == 2
    if not payload["results"]:
        assert payload["summary"] == (
            "No games matched the requested filters."
        )
    text = format_response_text(payload)
    assert "Limit: 5" in text and "Offset: 2" in text


def test_text_rendering_shape(spark, tables):
    payload = answer_question(spark, tables, CANONICAL_QUESTION, dim=8)
    text = format_response_text(payload)
    lines = text.splitlines()
    assert lines[0].startswith("Summary: #2 Strong, Player")
    assert "Total matches: 1" in lines
    assert "Has more: no" in lines
    assert "Agent status: disabled" in lines
    assert "Filters: eco_range=E60-E99, opening=kings_indian_defense" in lines
    assert "Ratings: max_rating_delta=100" in lines
    assert any(
        line.startswith(
            "1. #2 Strong, Player vs Weaker, Player"
            " [King's Indian Defense] score 0.82"
        )
        for line in lines
    )


@pytest.mark.parametrize(
    "kwargs,message",
    [
        ({"question": "   "}, "question parameter missing"),
        ({"question": "x", "limit": 0}, "limit must be >= 1"),
        ({"question": "x", "limit": 501}, "limit must be <= 500"),
        ({"question": "x", "offset": -1}, "offset must be >= 0"),
        ({"question": "x", "limit": "ten"}, "limit must be an integer"),
    ],
)
def test_request_validation_errors(spark, tables, kwargs, message):
    with pytest.raises(ServingError, match=message):
        answer_question(spark, tables, **kwargs)


def test_cli_json_session(spark, capsys):
    from chessmate_spark.query.__main__ import main

    rc = main(
        [
            "Show me games in the King's Indian Defense",
            "--pgn", str(FIXTURES / "sample_game.pgn"),
            "--pgn", str(FIXTURES / "extended_sample_game.pgn"),
            "--limit", "5",
            "--json",
        ],
        spark=spark,
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["limit"] == 5
    assert payload["agent_status"] == "disabled"
    assert isinstance(payload["results"], list)


def test_cli_rejects_bad_limit(spark, capsys):
    from chessmate_spark.query.__main__ import main

    rc = main(
        [
            "anything",
            "--pgn", str(FIXTURES / "sample_game.pgn"),
            "--limit", "0",
        ],
        spark=spark,
    )
    assert rc == 1
    assert "limit must be >= 1" in capsys.readouterr().err


def test_timings_channel(spark, tables):
    """The opt-in per-action timing channel (SERVE_BENCH's breakdown):
    all expected keys land, every value is a non-negative float, and
    omitting the dict changes nothing."""
    timings = {}
    payload = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, timings=timings
    )
    assert payload["total"] == 1
    assert set(timings) == {
        "analyse_s", "build_summaries_s", "count_total_s",
        "build_page_s", "count_returned_s", "collect_page_s", "format_s",
    }
    assert all(isinstance(v, float) and v >= 0 for v in timings.values())
