"""TWIC drop precheck (S11): flag malformed PGNs before bulk ingest.

Reference: lib/cli/twic_precheck_command.ml:31-89 — per game, report
  * "No moves detected" when the parsed move list is empty,
  * "Missing [Result] tag" when no Result header is present,
  * "Unexpected result token '<r>'" when the Result header is not one of
    1-0 / 0-1 / 1/2-1/2 / *,
  * "Parse error: <msg>" when the game does not parse at all,
each with a fix hint and an 80-char preview of the raw block.

The pure per-game validator lives here; the distributed operator
(`chessmate_spark.ingest.twic_precheck`) fans game chunks across executors
with mapInPandas, exactly like the ingest parser.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .pgn import (
    PgnError,
    RESULT_TOKENS,
    _parse_header_line,
    _parse_moves,
    split_games,
    strip_comments,
)

NO_MOVES = "No moves detected"
NO_MOVES_HINT = "Remove the block or ensure the move list is present."
MISSING_RESULT = "Missing [Result] tag"
MISSING_RESULT_HINT = (
    'Add a [Result "1-0"/"0-1"/"1/2-1/2" or "*"] tag before the moves.'
)
BAD_RESULT_HINT = "Use one of 1-0, 0-1, 1/2-1/2, or *."
PARSE_ERROR_HINT = "Clean up or remove this entry (often a TWIC editorial note)."

PREVIEW_CHARS = 80


def truncate_preview(raw: str) -> str:
    """Strip and cap the raw block at 80 chars (+ ellipsis), per reference."""
    condensed = raw.strip()
    if len(condensed) <= PREVIEW_CHARS:
        return condensed
    return condensed[:PREVIEW_CHARS] + "…"


def _lenient_parse(raw_pgn: str) -> Tuple[Dict[str, str], List[str]]:
    """Headers + SAN moves, tolerating an EMPTY move list (unlike
    ``parse_game``, which raises — the precheck must tell "no moves" apart
    from "does not parse")."""
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
    move_text = " ".join(move_lines)
    if not move_text.split():
        return headers, []
    moves = [m.san for m in _parse_moves(move_text)]
    return headers, moves


def precheck_game(raw_pgn: str) -> List[Tuple[str, str]]:
    """(problem, hint) pairs for one raw game block; [] when clean."""
    try:
        headers, moves = _lenient_parse(raw_pgn)
    except PgnError as exc:
        return [(f"Parse error: {exc}", PARSE_ERROR_HINT)]
    issues: List[Tuple[str, str]] = []
    if not moves:
        issues.append((NO_MOVES, NO_MOVES_HINT))
    result: Optional[str] = headers.get("Result")
    if result is None:
        issues.append((MISSING_RESULT, MISSING_RESULT_HINT))
    elif result not in RESULT_TOKENS:
        issues.append((f"Unexpected result token '{result}'", BAD_RESULT_HINT))
    return issues


def precheck_text(raw: str) -> List[Tuple[int, int, str, str, str]]:
    """Pure driver-side precheck of a multi-game PGN text:
    (game_no, problem_no, problem, hint, preview) rows, 1-indexed."""
    rows: List[Tuple[int, int, str, str, str]] = []
    for game_no, chunk in enumerate(split_games(raw), start=1):
        issues = precheck_game(chunk)
        if issues:
            preview = truncate_preview(chunk)
            for problem_no, (problem, hint) in enumerate(issues, start=1):
                rows.append((game_no, problem_no, problem, hint, preview))
    return rows
