"""SAN → FEN replay engine.

Replays a SAN move list from the standard initial position and emits the FEN
after every half-move (capability parity with reference: lib/chess/pgn_to_fen.ml:8-707,
``fens_of_moves``).  This is an original full-legality implementation: piece
geometry + path clearing, pawn pushes / double steps / captures / en passant /
promotion (required on the last rank), castling (rights + occupancy + rook
presence + no castling through or out of check), disambiguation by file/rank,
check-aware candidate filtering (pinned pieces never create ambiguity),
halfmove clock (reset on pawn move or capture), fullmove number, en-passant
target tracking, and castling-right revocation on king/rook moves and rook
captures.

Error-message parity (checked by the reference's tests,
test_chess_parsing.ml:44-84): illegal castling errors contain ``cannot
castle``; a pawn "capture" onto an empty square reports ``expected capture on
<square>``.

Board representation: 64-slot list, index = rank * 8 + file, rank 0 == rank 1.
Pieces are single chars, uppercase = white.  Designed to run row-parallel as a
Spark UDF: state is sequential *within* a game, games replay independently.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Tuple

WHITE = "w"
BLACK = "b"

_SAN_SUFFIX_RE = re.compile(r"(?:[!?]+|[+#])+$")
_EP_SUFFIX_RE = re.compile(r"\s*e\.p\.?$", re.IGNORECASE)
_PIECE_MOVE_RE = re.compile(
    r"^([KQRBN])([a-h])?([1-8])?(x)?([a-h][1-8])$"
)
_PAWN_MOVE_RE = re.compile(r"^([a-h])?(x)?([a-h][1-8])(?:=([QRBN]))?$")

_KNIGHT_DELTAS = ((1, 2), (2, 1), (2, -1), (1, -2), (-1, -2), (-2, -1), (-2, 1), (-1, 2))
_KING_DELTAS = ((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1))
_BISHOP_DIRS = ((1, 1), (1, -1), (-1, 1), (-1, -1))
_ROOK_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1))

INITIAL_FEN = "rnbqkbnr/pppppppp/8/8/8/8/PPPPPPPP/RNBQKBNR w KQkq - 0 1"


class ReplayError(ValueError):
    """Raised when a SAN move cannot be applied to the current position."""


def _sq(file: int, rank: int) -> int:
    return rank * 8 + file


def _sq_name(index: int) -> str:
    return "abcdefgh"[index % 8] + str(index // 8 + 1)


def _parse_sq(name: str) -> int:
    return _sq("abcdefgh".index(name[0]), int(name[1]) - 1)


class Position:
    """Mutable position state for sequential SAN replay of one game."""

    __slots__ = ("board", "turn", "castling", "ep", "halfmove", "fullmove")

    def __init__(self) -> None:
        self.board: List[Optional[str]] = [None] * 64
        back = "RNBQKBNR"
        for f in range(8):
            self.board[_sq(f, 0)] = back[f]
            self.board[_sq(f, 1)] = "P"
            self.board[_sq(f, 6)] = "p"
            self.board[_sq(f, 7)] = back[f].lower()
        self.turn = WHITE
        self.castling = {"K", "Q", "k", "q"}
        self.ep: Optional[int] = None
        self.halfmove = 0
        self.fullmove = 1

    # -- rendering ---------------------------------------------------------

    def to_fen(self) -> str:
        rows = []
        for rank in range(7, -1, -1):
            run = 0
            row = []
            for file in range(8):
                piece = self.board[_sq(file, rank)]
                if piece is None:
                    run += 1
                else:
                    if run:
                        row.append(str(run))
                        run = 0
                    row.append(piece)
            if run:
                row.append(str(run))
            rows.append("".join(row))
        castling = "".join(c for c in "KQkq" if c in self.castling) or "-"
        ep = _sq_name(self.ep) if self.ep is not None else "-"
        return " ".join(
            [
                "/".join(rows),
                self.turn,
                castling,
                ep,
                str(self.halfmove),
                str(self.fullmove),
            ]
        )

    # -- attack / legality -------------------------------------------------

    def _is_own(self, piece: Optional[str], color: str) -> bool:
        if piece is None:
            return False
        return piece.isupper() if color == WHITE else piece.islower()

    def _king_square(self, color: str) -> int:
        king = "K" if color == WHITE else "k"
        return self.board.index(king)

    def _attacked_by(self, sq: int, color: str) -> bool:
        """True if ``color`` attacks ``sq``."""
        file, rank = sq % 8, sq // 8
        board = self.board
        pawn = "P" if color == WHITE else "p"
        pawn_dr = 1 if color == WHITE else -1
        for df in (-1, 1):
            f, r = file + df, rank - pawn_dr
            if 0 <= f < 8 and 0 <= r < 8 and board[_sq(f, r)] == pawn:
                return True
        knight = "N" if color == WHITE else "n"
        for df, dr in _KNIGHT_DELTAS:
            f, r = file + df, rank + dr
            if 0 <= f < 8 and 0 <= r < 8 and board[_sq(f, r)] == knight:
                return True
        king = "K" if color == WHITE else "k"
        for df, dr in _KING_DELTAS:
            f, r = file + df, rank + dr
            if 0 <= f < 8 and 0 <= r < 8 and board[_sq(f, r)] == king:
                return True
        queen = "Q" if color == WHITE else "q"
        bishop = "B" if color == WHITE else "b"
        rook = "R" if color == WHITE else "r"
        for dirs, sliders in ((_BISHOP_DIRS, (bishop, queen)), (_ROOK_DIRS, (rook, queen))):
            for df, dr in dirs:
                f, r = file + df, rank + dr
                while 0 <= f < 8 and 0 <= r < 8:
                    piece = board[_sq(f, r)]
                    if piece is not None:
                        if piece in sliders:
                            return True
                        break
                    f += df
                    r += dr
        return False

    def _in_check(self, color: str) -> bool:
        other = BLACK if color == WHITE else WHITE
        return self._attacked_by(self._king_square(color), other)

    def _path_clear(self, src: int, dst: int) -> bool:
        sf, sr = src % 8, src // 8
        df, dr = dst % 8, dst // 8
        step_f = (df > sf) - (df < sf)
        step_r = (dr > sr) - (dr < sr)
        f, r = sf + step_f, sr + step_r
        while (f, r) != (df, dr):
            if self.board[_sq(f, r)] is not None:
                return False
            f += step_f
            r += step_r
        return True

    def _geometric_reach(self, kind: str, src: int, dst: int) -> bool:
        sf, sr = src % 8, src // 8
        df, dr = dst % 8, dst // 8
        adf, adr = abs(df - sf), abs(dr - sr)
        if kind == "N":
            return (adf, adr) in ((1, 2), (2, 1))
        if kind == "K":
            return max(adf, adr) == 1
        if kind == "B":
            return adf == adr and adf > 0 and self._path_clear(src, dst)
        if kind == "R":
            return (adf == 0) != (adr == 0) and self._path_clear(src, dst)
        if kind == "Q":
            return (
                (adf == adr and adf > 0) or ((adf == 0) != (adr == 0))
            ) and self._path_clear(src, dst)
        raise ReplayError(f"unknown piece kind '{kind}'")

    # -- move application --------------------------------------------------

    def _apply_raw(
        self,
        src: int,
        dst: int,
        *,
        promotion: Optional[str] = None,
        ep_capture: bool = False,
    ) -> None:
        """Move piece src→dst on the raw board (no side-effect bookkeeping)."""
        piece = self.board[src]
        self.board[src] = None
        if ep_capture:
            captured_sq = _sq(dst % 8, src // 8)
            self.board[captured_sq] = None
        if promotion is not None:
            piece = promotion if self.turn == WHITE else promotion.lower()
        self.board[dst] = piece

    def _would_leave_check(
        self,
        src: int,
        dst: int,
        *,
        promotion: Optional[str] = None,
        ep_capture: bool = False,
    ) -> bool:
        saved = list(self.board)
        self._apply_raw(src, dst, promotion=promotion, ep_capture=ep_capture)
        in_check = self._in_check(self.turn)
        self.board = saved
        return in_check

    def _revoke_castling(self, square: int) -> None:
        rights = {
            _sq(4, 0): ("K", "Q"),
            _sq(0, 0): ("Q",),
            _sq(7, 0): ("K",),
            _sq(4, 7): ("k", "q"),
            _sq(0, 7): ("q",),
            _sq(7, 7): ("k",),
        }.get(square, ())
        for right in rights:
            self.castling.discard(right)

    def _finish_move(self, *, pawn_or_capture: bool, new_ep: Optional[int]) -> None:
        self.ep = new_ep
        self.halfmove = 0 if pawn_or_capture else self.halfmove + 1
        if self.turn == BLACK:
            self.fullmove += 1
        self.turn = BLACK if self.turn == WHITE else WHITE

    def _castle(self, side: str) -> None:
        color = self.turn
        rank = 0 if color == WHITE else 7
        right = ("K" if side == "K" else "Q")
        right = right if color == WHITE else right.lower()
        if right not in self.castling:
            raise ReplayError(
                f"{'white' if color == WHITE else 'black'} cannot castle "
                f"{'kingside' if side == 'K' else 'queenside'}: right not available"
            )
        king_src = _sq(4, rank)
        rook_src = _sq(7 if side == "K" else 0, rank)
        king_dst = _sq(6 if side == "K" else 2, rank)
        rook_dst = _sq(5 if side == "K" else 3, rank)
        king = "K" if color == WHITE else "k"
        rook = "R" if color == WHITE else "r"
        if self.board[king_src] != king or self.board[rook_src] != rook:
            raise ReplayError(
                f"cannot castle: king or rook not on its original square"
            )
        between = range(min(king_src, rook_src) + 1, max(king_src, rook_src))
        if any(self.board[s] is not None for s in between):
            raise ReplayError("cannot castle: squares between king and rook occupied")
        other = BLACK if color == WHITE else WHITE
        path = (king_src, (king_src + king_dst) // 2, king_dst)
        if any(self._attacked_by(s, other) for s in path):
            raise ReplayError("cannot castle: king passes through an attacked square")
        self.board[king_src] = None
        self.board[rook_src] = None
        self.board[king_dst] = king
        self.board[rook_dst] = rook
        self._revoke_castling(king_src)
        self._finish_move(pawn_or_capture=False, new_ep=None)

    def _pawn_candidates(
        self, src_file: Optional[int], dst: int, is_capture: bool
    ) -> List[Tuple[int, bool]]:
        """(src, is_ep_capture) candidates for a pawn move to ``dst``."""
        color = self.turn
        pawn = "P" if color == WHITE else "p"
        direction = 1 if color == WHITE else -1
        df, dr = dst % 8, dst // 8
        out: List[Tuple[int, bool]] = []
        if is_capture:
            target = self.board[dst]
            if target is None and self.ep != dst:
                raise ReplayError(
                    f"expected capture on {_sq_name(dst)} but the square is empty"
                )
            for sf in (df - 1, df + 1):
                if src_file is not None and sf != src_file:
                    continue
                sr = dr - direction
                if 0 <= sf < 8 and 0 <= sr < 8 and self.board[_sq(sf, sr)] == pawn:
                    if target is not None and not self._is_own(target, color):
                        out.append((_sq(sf, sr), False))
                    elif target is None and self.ep == dst:
                        out.append((_sq(sf, sr), True))
        else:
            sr = dr - direction
            if 0 <= sr < 8 and self.board[_sq(df, sr)] == pawn and self.board[dst] is None:
                out.append((_sq(df, sr), False))
            start_rank = 1 if color == WHITE else 6
            double_rank = 3 if color == WHITE else 4
            if (
                dr == double_rank
                and self.board[dst] is None
                and self.board[_sq(df, dr - direction)] is None
                and self.board[_sq(df, start_rank)] == pawn
            ):
                out.append((_sq(df, start_rank), False))
        return out

    def _apply_pawn(self, san: str, match: re.Match) -> None:
        src_file_ch, capture, dst_name, promotion = match.groups()
        dst = _parse_sq(dst_name)
        dr = dst // 8
        color = self.turn
        last_rank = 7 if color == WHITE else 0
        if dr == last_rank and promotion is None:
            raise ReplayError(f"pawn move {san} requires a promotion piece")
        if dr != last_rank and promotion is not None:
            raise ReplayError(f"pawn move {san} cannot promote before the last rank")
        src_file = "abcdefgh".index(src_file_ch) if src_file_ch else None
        if capture and src_file is None:
            raise ReplayError(f"pawn capture {san} must name the source file")
        candidates = self._pawn_candidates(src_file, dst, bool(capture))
        legal = [
            (src, ep)
            for src, ep in candidates
            if not self._would_leave_check(src, dst, promotion=promotion, ep_capture=ep)
        ]
        if not legal:
            raise ReplayError(f"no legal pawn move matches {san}")
        if len(legal) > 1:
            raise ReplayError(f"ambiguous pawn move {san}")
        src, ep_capture = legal[0]
        is_double = abs(dst // 8 - src // 8) == 2
        new_ep = _sq(dst % 8, (dst // 8 + src // 8) // 2) if is_double else None
        captured = self.board[dst] is not None or ep_capture
        if captured:
            self._revoke_castling(dst)
        self._apply_raw(src, dst, promotion=promotion, ep_capture=ep_capture)
        self._finish_move(pawn_or_capture=True, new_ep=new_ep)
        # pawn moves always reset the clock; `captured` only matters for rook rights

    def _apply_piece(self, san: str, match: re.Match) -> None:
        kind, dis_file, dis_rank, capture, dst_name = match.groups()
        dst = _parse_sq(dst_name)
        color = self.turn
        piece = kind if color == WHITE else kind.lower()
        target = self.board[dst]
        if target is not None and self._is_own(target, color):
            raise ReplayError(f"{san}: destination occupied by own piece")
        if capture and target is None:
            raise ReplayError(
                f"expected capture on {_sq_name(dst)} but the square is empty"
            )
        candidates = []
        for src, board_piece in enumerate(self.board):
            if board_piece != piece:
                continue
            if dis_file and src % 8 != "abcdefgh".index(dis_file):
                continue
            if dis_rank and src // 8 != int(dis_rank) - 1:
                continue
            if not self._geometric_reach(kind, src, dst):
                continue
            if self._would_leave_check(src, dst):
                continue
            candidates.append(src)
        if not candidates:
            raise ReplayError(f"no legal move matches {san}")
        if len(candidates) > 1:
            raise ReplayError(f"ambiguous move {san}")
        src = candidates[0]
        if target is not None:
            self._revoke_castling(dst)
        if kind in ("K", "R"):
            self._revoke_castling(src)
        self._apply_raw(src, dst)
        self._finish_move(pawn_or_capture=target is not None, new_ep=None)

    def apply_san(self, san: str) -> None:
        cleaned = _EP_SUFFIX_RE.sub("", san.strip())
        cleaned = _SAN_SUFFIX_RE.sub("", cleaned)
        if not cleaned:
            raise ReplayError(f"empty SAN token '{san}'")
        castle = cleaned.replace("0", "O")
        if castle in ("O-O", "O-O-O"):
            self._castle("K" if castle == "O-O" else "Q")
            return
        piece_match = _PIECE_MOVE_RE.match(cleaned)
        if piece_match:
            self._apply_piece(cleaned, piece_match)
            return
        pawn_match = _PAWN_MOVE_RE.match(cleaned)
        if pawn_match:
            self._apply_pawn(cleaned, pawn_match)
            return
        raise ReplayError(f"unparseable SAN token '{san}'")


def fens_of_moves(sans: Iterable[str]) -> List[str]:
    """Replay SAN moves from the initial position; FEN after each half-move.

    Raises ``ReplayError`` naming the failing ply on the first illegal move
    (reference parity: pgn_to_fen.ml ``fens_of_moves``).
    """
    position = Position()
    fens: List[str] = []
    for idx, san in enumerate(sans):
        try:
            position.apply_san(san)
        except ReplayError as exc:
            raise ReplayError(f"ply {idx + 1} ({san}): {exc}") from None
        fens.append(position.to_fen())
    return fens


def fen_after_move(fens: List[str], move_number: int, color: str) -> Optional[str]:
    """FEN after white/black move ``move_number`` (reference: pgn_to_fen.ml:692-707).

    White move n -> index 2*(n-1); black move n -> index 2*(n-1)+1.
    """
    if move_number < 1:
        return None
    index = 2 * (move_number - 1) + (1 if color == BLACK else 0)
    if 0 <= index < len(fens):
        return fens[index]
    return None
