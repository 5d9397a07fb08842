"""FEN validator goldens — lifted from the reference's test_fen.ml:15-60
and FIXTURES.md item 7."""

import pytest

from chessmate_spark.chess import FenError, fen_md5, normalize_fen

INITIAL = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"


def test_initial_position_normalizes():
    assert normalize_fen(INITIAL) == INITIAL


def test_whitespace_sloppy_fen_normalizes():
    sloppy = "  rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR   w  KQkq  -  0  1 "
    assert normalize_fen(sloppy) == INITIAL


def test_castling_reordered_canonically():
    fen = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w qkQK - 0 1"
    assert normalize_fen(fen).split(" ")[2] == "KQkq"


def test_en_passant_file_lowercased():
    fen = "rnbqkbnr/pppppppp/8/8/3P4/8/PPP1PPPP/RNBQKBNR b KQkq D3 0 1"
    assert normalize_fen(fen).split(" ")[3] == "d3"


@pytest.mark.parametrize(
    "fen,reason",
    [
        ("", "non-empty"),
        ("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq -", "six"),
        # 9 squares in a rank
        ("rnbqkbnr1/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1", "squares"),
        # missing white king
        ("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQ1BNR w KQkq - 0 1", "king"),
        # pawn on back rank
        ("Pnbqkbnr/pppppppp/8/8/8/8/PPPP1PPP/RNBQKBNR w KQkq - 0 1", "pawn"),
        # nine pawns
        ("rnbqkbnr/pppppppp/8/8/8/P7/PPPPPPPP/RNBQKBN1 w KQkq - 0 1", "pawns"),
        # en passant rank inconsistent with side to move
        ("rnbqkbnr/pppppppp/8/8/3P4/8/PPP1PPPP/RNBQKBNR w KQkq d3 0 1", "inconsistent"),
        # duplicate castling rights
        ("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KKqq - 0 1", "duplicates"),
        # invalid active color
        ("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR x KQkq - 0 1", "active color"),
        # fullmove must be >= 1
        ("rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 0", ">= 1"),
    ],
)
def test_invalid_fens_rejected(fen, reason):
    with pytest.raises(FenError, match=""):
        normalize_fen(fen)


def test_fen_md5_stable():
    assert fen_md5("abc") == "900150983cd24fb0d6963f7d28e17f72"
