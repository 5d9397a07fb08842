"""PGN parsing: comment stripping, header extraction, SAN tokenization, and
multi-game splitting with per-game error routing.

Capability parity with reference: lib/chess/pgn_parser.ml:42-329.
Semantics preserved:
  * ``{...}`` brace comments, ``(...)`` variations, ``;`` comments to EOL and
    ``%``-escaped lines (at line start) are stripped before tokenizing.
  * Headers are ``[Key "Value"]`` lines; surrounding quotes removed.
  * Move tokens drop move numbers (``12.``/``12...`` prefixes) and NAGs
    (``$n``); tokenizing stops at a result token (1-0, 0-1, 1/2-1/2, *).
  * Ply is 1-based; white moves have odd ply; ``turn`` is the move number.
  * The multi-game splitter starts a new game at a ``[Event`` line only after
    move tokens were seen, so consecutive header blocks stay together; parse
    errors are routed per game and never abort the file.

Designed to run distributed: ``split_games`` is a pure text→chunks function
usable inside a Spark flatMap/UDF; parse errors surface as per-record error
values (corrupt-record channel) rather than exceptions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Tuple

RESULT_TOKENS = frozenset({"1-0", "0-1", "1/2-1/2", "*"})


class PgnError(ValueError):
    """Raised (or carried as an error record) when a PGN game fails to parse."""


@dataclass
class Move:
    san: str
    turn: int
    ply: int


@dataclass
class ParsedGame:
    headers: Dict[str, str] = field(default_factory=dict)
    moves: List[Move] = field(default_factory=list)

    def header(self, key: str) -> Optional[str]:
        return self.headers.get(key)

    @property
    def ply_count(self) -> int:
        return len(self.moves)

    @property
    def result(self) -> Optional[str]:
        return self.headers.get("Result")


def strip_comments(text: str) -> str:
    """Remove {} comments, () variations, ; line comments, % escape lines."""
    out: List[str] = []
    state = "normal"
    line_start = True
    for ch in text:
        if state == "normal":
            if ch == "{":
                state = "brace"
            elif ch == "(":
                state = "paren"
            elif ch == ";":
                state = "line"
            elif ch == "%" and line_start:
                state = "percent"
            else:
                out.append(ch)
        elif state == "brace":
            if ch == "}":
                state = "normal"
        elif state == "paren":
            if ch == ")":
                state = "normal"
        else:  # line / percent comment
            if ch == "\n":
                out.append(ch)
                state = "normal"
        line_start = ch == "\n"
    return "".join(out)


def _parse_header_line(line: str) -> Tuple[str, str]:
    if not (line.startswith("[") and line.endswith("]")):
        raise PgnError(f"Invalid PGN header line: {line}")
    inner = line[1:-1].strip()
    if not inner:
        raise PgnError(f"Invalid PGN header line: {line}")
    key, _, value_raw = inner.partition(" ")
    value = value_raw.strip()
    if len(value) >= 2 and value[0] == '"' and value[-1] == '"':
        value = value[1:-1]
    return key, value


def _parse_moves(move_text: str) -> List[Move]:
    tokens = move_text.split()
    if not tokens:
        raise PgnError("No moves found in PGN body")
    moves: List[Move] = []
    current_turn = 0
    ply = 0
    for token in tokens:
        token = token.strip()
        if not token:
            continue
        if token in RESULT_TOKENS:
            break
        if token.startswith("$"):
            continue
        new_turn = 0
        body = token
        digits = 0
        while digits < len(token) and token[digits].isdigit():
            digits += 1
        if digits:
            try:
                new_turn = int(token[:digits])
                body = token[digits:]
            except ValueError:
                new_turn = 0
        body = body.lstrip(".").strip()
        if not body:
            if new_turn > 0:
                current_turn = new_turn
            continue
        ply += 1
        effective_turn = new_turn if new_turn > 0 else (ply + 1) // 2
        moves.append(Move(san=body, turn=effective_turn, ply=ply))
        current_turn = effective_turn + 1 if ply % 2 == 0 else effective_turn
    return moves


def parse_game(raw_pgn: str) -> ParsedGame:
    """Parse one PGN game into headers + SAN moves (raises PgnError)."""
    sanitized = strip_comments(raw_pgn)
    headers: Dict[str, str] = {}
    move_lines: List[str] = []
    in_moves = False
    for line in sanitized.splitlines():
        trimmed = line.strip()
        if not trimmed:
            continue
        if not in_moves and trimmed.startswith("["):
            key, value = _parse_header_line(trimmed)
            headers[key] = value
        else:
            in_moves = True
            move_lines.append(trimmed)
    moves = _parse_moves(" ".join(move_lines))
    if not moves:
        raise PgnError("PGN contained no moves")
    return ParsedGame(headers=headers, moves=moves)


def split_games(raw: str) -> List[str]:
    """Split a multi-game PGN text into per-game chunks.

    A new game starts at a line beginning with ``[Event`` only once the
    current chunk has seen non-header (move) lines, so multi-header blocks
    aren't split apart (reference: pgn_parser.ml:204-260).
    """
    chunks: List[str] = []
    current: List[str] = []
    have_moves = False
    for line in raw.splitlines():
        trimmed = line.strip()
        is_header = trimmed.startswith("[")
        is_event = trimmed.startswith("[Event")
        has_move_token = not is_header and bool(trimmed)
        if is_event and have_moves and current:
            chunk = "\n".join(current).strip()
            if chunk:
                chunks.append(chunk)
            current = [line]
            have_moves = False
        else:
            current.append(line)
            have_moves = have_moves or has_move_token
    tail = "\n".join(current).strip()
    if tail:
        chunks.append(tail)
    return chunks


def iter_games(raw: str) -> Iterator[Tuple[int, str, Optional[ParsedGame], Optional[str]]]:
    """Yield ``(index, raw_game, parsed_or_None, error_or_None)`` per game.

    Errors never abort iteration (corrupt-record channel semantics —
    reference: pgn_parser.ml fold_games error handler).
    """
    for index, chunk in enumerate(split_games(raw), start=1):
        try:
            yield index, chunk, parse_game(chunk), None
        except PgnError as exc:
            yield index, chunk, None, str(exc)


def parse_games(raw: str) -> List[ParsedGame]:
    """Parse all games; raises on the first malformed game (tagged by index)."""
    games: List[ParsedGame] = []
    for index, _raw_game, parsed, error in iter_games(raw):
        if error is not None:
            raise PgnError(f"PGN game #{index}: {error}")
        assert parsed is not None
        games.append(parsed)
    return games
