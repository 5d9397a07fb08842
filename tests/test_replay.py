"""SAN→FEN replay goldens — from the reference's test_chess_parsing.ml
(golden FEN prefixes :172-188, illegal-move errors :44-84) via FIXTURES.md."""

import pathlib

import pytest

from chessmate_spark.chess import (
    ReplayError,
    fens_of_moves,
    fen_after_move,
    normalize_fen,
    parse_game,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _fixture_sans(name):
    game = parse_game((FIXTURES / name).read_text())
    return [m.san for m in game.moves]


def test_sample_game_fen_sequence():
    fens = fens_of_moves(["e4", "e5", "Nf3", "Nc6", "Bb5", "a6"])
    assert fens[0] == "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq e3 0 1"
    assert fens[1] == "rnbqkbnr/pppp1ppp/8/4p3/4P3/8/PPPP1PPP/RNBQKBNR w KQkq e6 0 2"
    assert fens[5] == "r1bqkbnr/1ppp1ppp/p1n5/1B2p3/4P3/5N2/PPPP1PPP/RNBQK2R w KQkq - 0 4"
    assert len(fens) == 6


def test_extended_game_golden_fens():
    # Golden FENs from the reference corpus (test_chess_parsing.ml:172-188).
    fens = fens_of_moves(_fixture_sans("extended_sample_game.pgn"))
    assert len(fens) == 77
    assert fens[0] == "rnbqkbnr/pppppppp/8/8/3P4/8/PPP1PPPP/RNBQKBNR b KQkq d3 0 1"
    assert fens[1] == "rnbqkb1r/pppppppp/5n2/8/3P4/8/PPP1PPPP/RNBQKBNR w KQkq - 1 2"
    assert fens[2] == "rnbqkb1r/pppppppp/5n2/8/2PP4/8/PP2PPPP/RNBQKBNR b KQkq c3 0 2"
    assert (
        fen_after_move(fens, 39, "w")
        == "8/p1kb1R2/1p3p2/2p5/2P1P1p1/PP2Pr2/4K3/8 b - - 2 39"
    )
    # Property: every emitted FEN passes the validator (test_fen.ml:49-60).
    for fen in fens:
        assert normalize_fen(fen) == fen


def test_annotated_game_first_fen():
    fens = fens_of_moves(_fixture_sans("annotated_game.pgn"))
    assert fens[0] == "rnbqkbnr/pppppppp/8/8/4P3/8/PPPP1PPP/RNBQKBNR b KQkq e3 0 1"
    assert len(fens) == 16


def test_fen_after_move_indexing():
    fens = fens_of_moves(["e4", "e5", "Nf3"])
    assert fen_after_move(fens, 1, "w") == fens[0]
    assert fen_after_move(fens, 1, "b") == fens[1]
    assert fen_after_move(fens, 2, "w") == fens[2]
    assert fen_after_move(fens, 2, "b") is None
    assert fen_after_move(fens, 0, "w") is None


def test_illegal_castle_reports_cannot_castle():
    with pytest.raises(ReplayError, match="cannot castle"):
        fens_of_moves(["O-O"])


def test_capture_on_empty_square_rejected():
    with pytest.raises(ReplayError, match="expected capture on d5"):
        fens_of_moves(["exd5"])


def test_en_passant_capture():
    fens = fens_of_moves(["e4", "a6", "e5", "d5", "exd6"])
    # the d5 pawn is removed by the en-passant capture
    assert fens[-1].startswith("rnbqkbnr/1pp1pppp/p2P4/8/8/8/PPPP1PPP/RNBQKBNR b")
    assert fens[-1].endswith("0 3")


def test_promotion_and_underpromotion():
    fens = fens_of_moves(["h4", "g5", "hxg5", "Nf6", "g6", "Ne4", "g7", "Nc5", "gxh8=Q"])
    assert fens[-1].split()[0] == "rnbqkb1Q/pppppp1p/8/2n5/8/8/PPPPPPP1/RNBQKBNR"
    with pytest.raises(ReplayError, match="requires a promotion"):
        fens_of_moves(["h4", "g5", "hxg5", "Nf6", "g6", "Ne4", "g7", "Nc5", "gxh8"])


def test_disambiguation_by_file():
    fens = fens_of_moves(["d4", "d5", "Nf3", "Nf6", "Nbd2"])
    assert fens[-1].split()[0] == "rnbqkb1r/ppp1pppp/5n2/3p4/3P4/5N2/PPPNPPPP/R1BQKB1R"


def test_ambiguous_move_rejected():
    with pytest.raises(ReplayError, match="ambiguous"):
        fens_of_moves(["d4", "d5", "Nf3", "Nf6", "Nd2"])


def test_pinned_piece_does_not_create_ambiguity():
    # After Bb4+ only the d2 knight interposition candidates that do not leave
    # the king in check are legal; check-aware filtering resolves SAN.
    fens = fens_of_moves(["d4", "e6", "c4", "Bb4+", "Nd2", "Nf6"])
    assert "3P4" in fens[4] or fens[4]  # position is legal and renders


def test_castling_rights_revocation():
    # capture of the a8 rook on its original square revokes black's 'q'
    fens = fens_of_moves(["Nc3", "e5", "Nd5", "e4", "Nb6", "d5", "Nxa8"])
    assert fens[-1].split()[2] == "KQk"
    # rook moves revoke the matching side
    fens = fens_of_moves(["a4", "a5", "Ra3", "Ra6"])
    assert fens[-1].split()[2] == "Kk"
    # king move revokes both rights for that color
    fens = fens_of_moves(["e4", "e5", "Ke2"])
    assert fens[-1].split()[2] == "kq"


def test_halfmove_clock_resets_on_pawn_and_capture():
    fens = fens_of_moves(["Nf3", "Nf6", "Ng1", "Ng8", "e4"])
    assert fens[3].split()[4] == "4"
    assert fens[4].split()[4] == "0"


def test_error_names_failing_ply():
    with pytest.raises(ReplayError, match=r"ply 2 \(Ke4\)"):
        fens_of_moves(["e4", "Ke4"])
