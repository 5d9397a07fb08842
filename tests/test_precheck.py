"""S11 TWIC precheck parity tests (twic_precheck_command.ml:31-89)."""

from chessmate_spark.chess.precheck import (
    precheck_game,
    precheck_text,
    truncate_preview,
)

GOOD = '[Event "G"]\n[Result "1-0"]\n\n1. e4 e5 1-0'
NO_MOVES = '[Event "E"]\n[Result "*"]\n\n*'
NO_RESULT = '[Event "N"]\n\n1. d4 d5'
BAD_RESULT = '[Event "B"]\n[Result "2-0"]\n\n1. c4 c5'
BROKEN = '[Event "X"\n1. f4 *'


def test_clean_game_has_no_issues():
    assert precheck_game(GOOD) == []


def test_no_moves_detected():
    issues = precheck_game(NO_MOVES)
    assert [p for p, _ in issues] == ["No moves detected"]


def test_missing_result():
    issues = precheck_game(NO_RESULT)
    assert [p for p, _ in issues] == ["Missing [Result] tag"]


def test_unexpected_result_token():
    issues = precheck_game(BAD_RESULT)
    assert [p for p, _ in issues] == ["Unexpected result token '2-0'"]


def test_parse_error_is_reported_not_raised():
    issues = precheck_game(BROKEN)
    assert len(issues) == 1
    assert issues[0][0].startswith("Parse error:")
    assert issues[0][1].startswith("Clean up or remove")


def test_combined_no_moves_and_missing_result():
    issues = precheck_game('[Event "Z"]')
    assert [p for p, _ in issues] == ["No moves detected", "Missing [Result] tag"]


def test_preview_truncation_at_80_chars():
    short = "x" * 80
    assert truncate_preview(f"  {short}  ") == short
    long = "y" * 100
    out = truncate_preview(long)
    assert out == "y" * 80 + "…"
    assert len(out) == 81


def test_precheck_text_indexes_and_orders_issues():
    text = "\n\n".join([GOOD, NO_MOVES, NO_RESULT])
    rows = precheck_text(text)
    assert [(g, p, prob) for g, p, prob, _, _ in rows] == [
        (2, 1, "No moves detected"),
        (3, 1, "Missing [Result] tag"),
    ]
