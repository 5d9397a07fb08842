"""PGN parser tests — reference parity: test_chess_parsing.ml parsing suite."""

import pathlib

import pytest

from chessmate_spark.chess import PgnError, iter_games, parse_game, parse_games, split_games
from chessmate_spark.chess.pgn import strip_comments

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _read(name):
    return (FIXTURES / name).read_text()


def test_parse_sample_game():
    game = parse_game(_read("sample_game.pgn"))
    assert game.headers["Event"] == "Test Event"
    assert game.headers["Result"] == "1-0"
    assert game.ply_count == 6
    assert [m.san for m in game.moves] == ["e4", "e5", "Nf3", "Nc6", "Bb5", "a6"]
    assert [m.turn for m in game.moves] == [1, 1, 2, 2, 3, 3]
    assert [m.ply for m in game.moves] == [1, 2, 3, 4, 5, 6]


def test_parse_annotated_game_strips_comments_and_escapes():
    game = parse_game(_read("annotated_game.pgn"))
    assert game.ply_count == 16
    assert game.moves[0].san == "e4!!"
    assert game.moves[2].san == "Nf3!?"
    assert game.moves[4].san == "Bb5?!"
    assert game.moves[8].san == "O-O"


def test_parse_extended_game_drops_nags_and_variations():
    game = parse_game(_read("extended_sample_game.pgn"))
    assert game.ply_count == 77
    assert game.headers["WhiteElo"] == "2568"
    assert game.headers["TEST_TAG_1"] == "VALUE_TEST_TAG_1"
    sans = [m.san for m in game.moves]
    assert "$1" not in sans
    assert "Bg2" not in sans  # variation content must not leak into mainline


def test_moves_without_numbers_get_sequential_plies():
    game = parse_game('[Event "X"]\n\ne4 e5 Nf3 *')
    assert [(m.san, m.turn, m.ply) for m in game.moves] == [
        ("e4", 1, 1),
        ("e5", 1, 2),
        ("Nf3", 2, 3),
    ]


def test_result_token_stops_move_parsing():
    game = parse_game('[Event "X"]\n\n1. e4 e5 1-0 2. Nf3')
    assert game.ply_count == 2


def test_empty_body_is_error():
    with pytest.raises(PgnError, match="No moves"):
        parse_game('[Event "X"]\n[Site "Y"]\n\n')


def test_strip_comments_handles_all_forms():
    text = "a {brace} b (paren) c ; line\nd\n% escape line\ne"
    cleaned = strip_comments(text)
    assert "brace" not in cleaned and "paren" not in cleaned
    assert "line" not in cleaned and "escape" not in cleaned
    for ch in ("a", "b", "c", "d", "e"):
        assert ch in cleaned


def test_split_games_on_event_after_moves():
    raw = _read("sample_game.pgn") + "\n" + _read("annotated_game.pgn")
    chunks = split_games(raw)
    assert len(chunks) == 2
    assert chunks[0].startswith('[Event "Test Event"]')
    # consecutive header blocks without intervening moves stay together
    two_headers = '[Event "A"]\n[Event "B"]\n\n1. e4 e5 *'
    assert len(split_games(two_headers)) == 1


def test_malformed_twic_reports_per_game_error():
    results = list(iter_games(_read("malformed_twic.pgn")))
    assert len(results) == 3
    idx, raw, parsed, error = results[1]
    assert idx == 2
    assert parsed is None and error is not None
    assert "editorial commentary" in raw or "Broken" in raw
    # surrounding games still parse
    assert results[0][3] is None and results[2][3] is None
    assert results[0][2].ply_count == 4
    assert results[2][2].ply_count == 4


def test_parse_games_tags_error_with_game_index():
    with pytest.raises(PgnError, match="game #2"):
        parse_games(_read("malformed_twic.pgn"))
