"""FEN validation / normalization.

Semantics match the reference validator (reference: lib/chess/fen.ml:27-171):
six space-separated fields; 8 ranks x 8 squares; exactly one king per side;
at most eight pawns per side; no pawns on ranks 1/8; castling availability
deduplicated and re-ordered canonically as KQkq; en-passant square must sit on
rank 6 when white is to move and rank 3 when black is to move; halfmove clock
>= 0; fullmove number >= 1.  ``normalize_fen`` returns the canonical string or
raises ``FenError`` with a human-readable reason.
"""

from __future__ import annotations

import hashlib

PIECE_CHARS = frozenset("prnbqkPRNBQK")
CASTLING_ORDER = "KQkq"


class FenError(ValueError):
    """Raised when a FEN string fails validation."""


def _validate_placement(placement: str) -> None:
    ranks = placement.split("/")
    if len(ranks) != 8:
        raise FenError("piece placement must have 8 ranks")
    white_kings = black_kings = white_pawns = black_pawns = 0
    for idx, rank in enumerate(ranks):
        total = 0
        for ch in rank:
            if ch.isdigit():
                value = int(ch)
                if value <= 0 or value > 8:
                    raise FenError(
                        f"rank {idx + 1} contains invalid digit '{ch}'"
                    )
                total += value
            elif ch in PIECE_CHARS:
                if ch == "K":
                    white_kings += 1
                elif ch == "k":
                    black_kings += 1
                elif ch == "P":
                    if idx == 0 or idx == 7:
                        raise FenError(
                            f"rank {idx + 1} contains a white pawn on an invalid rank"
                        )
                    white_pawns += 1
                elif ch == "p":
                    if idx == 0 or idx == 7:
                        raise FenError(
                            f"rank {idx + 1} contains a black pawn on an invalid rank"
                        )
                    black_pawns += 1
                total += 1
            else:
                raise FenError(
                    f"rank {idx + 1} contains invalid character '{ch}'"
                )
        if total != 8:
            raise FenError(
                f"rank {idx + 1} describes {total} squares (expected 8)"
            )
    if white_kings != 1 or black_kings != 1:
        raise FenError(
            "FEN must contain exactly one white king and one black king"
        )
    if white_pawns > 8 or black_pawns > 8:
        raise FenError("FEN cannot contain more than eight pawns per side")


def _normalize_castling(castling: str) -> str:
    if castling == "-":
        return "-"
    for ch in castling:
        if ch not in CASTLING_ORDER:
            raise FenError(f"invalid castling availability '{castling}'")
    if len(set(castling)) != len(castling):
        raise FenError(
            f"castling availability '{castling}' contains duplicates"
        )
    ordered = "".join(ch for ch in CASTLING_ORDER if ch in castling)
    if not ordered:
        raise FenError("castling availability must be '-' when no rights remain")
    return ordered


def _normalize_en_passant(active: str, square: str) -> str:
    if square == "-":
        return "-"
    if len(square) != 2:
        raise FenError(f"invalid en passant square '{square}'")
    file_ch = square[0].lower()
    rank_ch = square[1]
    if not ("a" <= file_ch <= "h"):
        raise FenError(f"en passant file '{square[0]}' is invalid")
    if not rank_ch.isdigit():
        raise FenError(f"en passant rank '{rank_ch}' is invalid")
    expected = "6" if active == "w" else "3"
    if rank_ch != expected:
        raise FenError(
            f"en passant square '{square}' inconsistent with active color"
        )
    return file_ch + rank_ch


def normalize_fen(fen: str) -> str:
    """Validate ``fen`` and return its canonical form (raises FenError)."""
    trimmed = fen.strip()
    if not trimmed:
        raise FenError("FEN must be non-empty")
    parts = [p for p in trimmed.split(" ") if p]
    if len(parts) != 6:
        raise FenError("FEN must consist of exactly six space-separated fields")
    placement, active, castling, en_passant, halfmove, fullmove = parts
    _validate_placement(placement)
    if active not in ("w", "b"):
        raise FenError(f"invalid active color '{active}'")
    castling = _normalize_castling(castling)
    en_passant = _normalize_en_passant(active, en_passant)
    try:
        half = int(halfmove)
    except ValueError:
        raise FenError("halfmove clock must be an integer") from None
    if half < 0:
        raise FenError("halfmove clock must be non-negative")
    try:
        full = int(fullmove)
    except ValueError:
        raise FenError("fullmove number must be an integer") from None
    if full < 1:
        raise FenError("fullmove number must be >= 1")
    return " ".join([placement, active, castling, en_passant, halfmove, fullmove])


def fen_md5(fen: str) -> str:
    """Hex MD5 of a FEN — the engine's stable vector id (reference: fen.ml:172)."""
    return hashlib.md5(fen.encode("utf-8")).hexdigest()
