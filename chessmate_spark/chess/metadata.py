"""PGN headers → game metadata projection.

Capability parity with reference: lib/chess/game_metadata.ml:39-123.
Key semantics:
  * PGN dates ``YYYY.MM.DD`` normalize to ``YYYY-MM-DD``; ``?`` wildcards in
    month/day default to ``01``; a wildcard or non-numeric year yields None;
    strings that don't split into 3 dot-parts pass through trimmed.
  * ``opening_name`` prefers the ``Opening`` header, else the ECO catalogue
    canonical name; ``opening_slug`` slugs the opening name, else the
    catalogue slug for the ECO code.
  * Empty/whitespace header values become None; player names default to "".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

from . import openings


@dataclass(frozen=True)
class Player:
    name: str = ""
    fide_id: Optional[str] = None
    rating: Optional[int] = None


@dataclass(frozen=True)
class GameMetadata:
    event: Optional[str] = None
    site: Optional[str] = None
    date: Optional[str] = None
    round: Optional[str] = None
    white: Player = Player()
    black: Player = Player()
    eco_code: Optional[str] = None
    opening_name: Optional[str] = None
    opening_slug: Optional[str] = None
    result: Optional[str] = None


def _sanitize(value: Optional[str]) -> Optional[str]:
    if value is None:
        return None
    trimmed = value.strip()
    return trimmed or None


def _parse_int(value: Optional[str]) -> Optional[int]:
    if value is None:
        return None
    trimmed = value.strip()
    if not trimmed:
        return None
    try:
        return int(trimmed)
    except ValueError:
        return None


def normalize_date(raw: Optional[str]) -> Optional[str]:
    """Normalize a PGN date header (game_metadata.ml:39-71 semantics)."""
    if raw is None:
        return None
    trimmed = raw.strip()
    if not trimmed:
        return None
    parts = trimmed.split(".")
    if len(parts) != 3:
        return trimmed
    yyyy, mm, dd = (p.strip() for p in parts)
    if not yyyy or "?" in yyyy or not yyyy.isdigit():
        return None

    def canonical(part: str, default: str = "01") -> str:
        if not part or "?" in part or not part.isdigit():
            return default
        if len(part) == 1:
            return "0" + part
        if len(part) == 2:
            return part
        return default

    return f"{yyyy}-{canonical(mm)}-{canonical(dd)}"


def _player(headers: Dict[str, str], name_key: str, elo_key: str, fide_key: str) -> Player:
    return Player(
        name=_sanitize(headers.get(name_key)) or "",
        rating=_parse_int(headers.get(elo_key)),
        fide_id=_sanitize(headers.get(fide_key)),
    )


def metadata_of_headers(headers: Dict[str, str]) -> GameMetadata:
    eco_code = _sanitize(headers.get("ECO"))
    opening_header = _sanitize(headers.get("Opening"))
    canonical_from_eco = (
        openings.canonical_name_of_eco(eco_code) if eco_code else None
    )
    opening_name = opening_header or canonical_from_eco
    if opening_name is not None:
        opening_slug: Optional[str] = openings.slugify(opening_name)
    elif eco_code is not None:
        opening_slug = openings.slug_of_eco(eco_code)
    else:
        opening_slug = None
    return GameMetadata(
        event=_sanitize(headers.get("Event")),
        site=_sanitize(headers.get("Site")),
        date=normalize_date(headers.get("Date")),
        round=_sanitize(headers.get("Round")),
        white=_player(headers, "White", "WhiteElo", "WhiteFideId"),
        black=_player(headers, "Black", "BlackElo", "BlackFideId"),
        eco_code=eco_code,
        opening_name=opening_name,
        opening_slug=opening_slug,
        result=_sanitize(headers.get("Result")),
    )
