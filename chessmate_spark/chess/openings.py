"""ECO opening catalogue + slug/synonym helpers.

The 14-entry ECO-range catalogue reproduces the reference's table exactly
(reference: lib/chess/openings.ml:59-115) — it is data, required byte-identical
for parity.  ``slugify`` lowercases, deletes apostrophes, and joins alphanumeric
runs with ``_`` (openings.ml:3-15); ``sanitize_phrase`` keeps alphanumerics and
whitespace (openings.ml:17-23); synonyms additionally map ``grünfeld`` →
``gruenfeld`` (openings.ml:25-27 — byte-level, not full Unicode folding).

At the Spark layer this catalogue becomes a broadcast dimension table for the
ECO range join (see chessmate_spark.operators.relational).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple


def slugify(name: str) -> str:
    out: List[str] = []
    pending_sep = False
    for ch in name.lower():
        if ch.isalnum() and ch.isascii():
            if pending_sep and out:
                out.append("_")
            out.append(ch)
            pending_sep = False
        elif ch == "'":
            continue
        else:
            pending_sep = True
    return "".join(out)


def sanitize_phrase(phrase: str) -> str:
    out: List[str] = []
    for ch in phrase.lower():
        if ch.isalnum() and ch.isascii():
            out.append(ch)
        elif ch.isspace():
            out.append(" ")
    return "".join(out).strip()


def normalize_synonym(synonym: str) -> str:
    return sanitize_phrase(synonym).replace("grünfeld", "gruenfeld")


def normalize_eco(eco: str) -> str:
    return eco.strip().upper()


def eco_in_range(eco: str, start_code: str, end_code: str) -> bool:
    return start_code <= eco <= end_code


def eco_range_string(start_code: str, end_code: str) -> str:
    return start_code if start_code == end_code else f"{start_code}-{end_code}"


@dataclass(frozen=True)
class Entry:
    eco_start: str
    eco_end: str
    canonical: str
    slug: str
    synonyms: Tuple[str, ...]


def _entry(start: str, end: str, canonical: str, synonyms: List[str]) -> Entry:
    return Entry(
        eco_start=normalize_eco(start),
        eco_end=normalize_eco(end),
        canonical=canonical,
        slug=slugify(canonical),
        synonyms=tuple(s for s in (normalize_synonym(x) for x in synonyms) if s),
    )


ALL: Tuple[Entry, ...] = (
    _entry("A00", "A39", "White first moves other than 1.e4, 1.d4",
           ["White first moves other than 1.e4, 1.d4"]),
    _entry("A40", "A44",
           "1.d4 without 1...d5, 1...Nf6 or 1...f5: Atypical replies to 1.d4",
           ["1.d4 without 1...d5, 1...Nf6 or 1...f5: Atypical replies to 1.d4"]),
    _entry("A45", "A49", "1.d4 Nf6 without 2.c4: Atypical replies to 1...Nf6",
           ["1.d4 Nf6 without 2.c4: Atypical replies to 1...Nf6"]),
    _entry("A50", "A79",
           "1.d4 Nf6 2.c4 without 2...e6 or 2...g6: Atypical Indian systems",
           ["1.d4 Nf6 2.c4 without 2...e6 or 2...g6: Atypical Indian systems"]),
    _entry("A80", "A99", "Dutch Defense", ["dutch defense", "dutch defence", "dutch"]),
    _entry("B00", "B09", "1.e4 without 1...c6, 1...c5, 1...e6, 1...e5",
           ["1.e4 without 1...c6, 1...c5, 1...e6, 1...e5"]),
    _entry("B10", "B19", "Caro-Kann Defense", ["caro kann", "caro-kann", "carokann"]),
    _entry("B20", "B99", "Sicilian Defense",
           ["sicilian", "sicilian defence", "sicilian defense",
            "sicilian najdorf", "najdorf"]),
    _entry("C00", "C19", "French Defense", ["french defense", "french defence", "french"]),
    _entry("C20", "C99", "1.e4 e5: Double King Pawn games",
           ["1.e4 e5: Double King Pawn games"]),
    _entry("D00", "D69", "1.d4 d5: Double Queen Pawn games",
           ["1.d4 d5: Double Queen Pawn games"]),
    _entry("D70", "D99", "Grunfeld Defense",
           ["grunfeld", "gruenfeld defense", "grunfeld defence"]),
    _entry("E00", "E59", "1.d4 Nf6 2.c4 e6: Indian systems with ...e6",
           ["1.d4 Nf6 2.c4 e6: Indian systems with ...e6"]),
    _entry("E60", "E99", "King's Indian Defense",
           ["king's indian", "kings indian", "kings indian defense",
            "kings indian defence"]),
)


def canonical_name_of_eco(eco: str) -> Optional[str]:
    eco = normalize_eco(eco)
    for entry in ALL:
        if eco_in_range(eco, entry.eco_start, entry.eco_end):
            return entry.canonical
    return None


def slug_of_eco(eco: str) -> Optional[str]:
    eco = normalize_eco(eco)
    for entry in ALL:
        if eco_in_range(eco, entry.eco_start, entry.eco_end):
            return entry.slug
    return None


def filters_for_text(text: str) -> List[Tuple[str, str]]:
    """Opening filters implied by synonym substrings of ``text``.

    Returns deduped, sorted (field, value) pairs — ``opening`` (slug) and
    ``eco_range`` per matched catalogue entry (openings.ml:131-153).
    """
    normalized = sanitize_phrase(text)
    filters = set()
    for entry in ALL:
        if any(syn in normalized for syn in entry.synonyms):
            filters.add(("opening", entry.slug))
            filters.add(
                ("eco_range", eco_range_string(entry.eco_start, entry.eco_end))
            )
    return sorted(filters)
