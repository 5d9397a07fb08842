"""Natural-language question → deterministic query plan (driver-side).

Capability parity with reference: lib/query/query_intent.ml.  This is query
compilation, not a data-path UDF — it runs once per question on the driver and
produces the plan the Spark operators consume.

Semantics preserved exactly (tested against the reference's expectations,
test_query.ml:8-56):
  * ``normalize``: ASCII alphanumerics lowercased, apostrophes deleted,
    everything else → space, trimmed (byte-level, not Unicode-folded).
  * natural-language limit: an int token 1..50 qualifies when preceded by
    top/first/show/list/give/find/return or followed by game(s).
  * phrase → filter mapping (endgame/middlegame → phase; sacrifice/tactics/
    queenside majority/king attack → theme; white win → 1-0 etc.).
  * opening synonym matching via the catalogue (openings.filters_for_text).
  * keyword extraction: drop ~60 stopwords and tokens ≤ 2 chars, preserving
    first-seen order.
  * rating parse: stateful scan with color context, a 5-token lookbehind for
    min-context words, 3-token lookahead for difference words, and
    ``N ... lower/less`` → max_rating_delta.
  * limit clamped to [1, 500] (default 50); offset ≥ 0 (default 0).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..chess import openings

DEFAULT_LIMIT = 50
MAX_LIMIT = 500
DEFAULT_OFFSET = 0

STOPWORDS = frozenset(
    """a an and any attack at be between by can find for games game give how i
    in is list me more of on over please points return show than that the
    those to with would where which about looking need who wins win players
    player rated rating elo lower higher least most top best favourite
    favorite""".split()
)

_NUMBER_WORDS = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5, "six": 6,
    "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11, "twelve": 12,
    "thirteen": 13, "fourteen": 14, "fifteen": 15, "sixteen": 16,
    "seventeen": 17, "eighteen": 18, "nineteen": 19, "twenty": 20,
    "thirty": 30, "forty": 40, "fifty": 50, "hundred": 100,
}

_LIMIT_QUALIFIERS = frozenset({"top", "first", "show", "list", "give", "find", "return"})
_DIFFERENCE_WORDS = frozenset({"lower", "less", "higher", "greater", "more", "fewer"})
_MIN_CONTEXT_WORDS = frozenset(
    {"least", "minimum", "min", "over", "above", "atleast", "at_least", ">="}
)
_RATING_CONTEXT_WORDS = frozenset({"points", "elo", "rating", "ratings", "rated"})

_PHRASE_FILTERS: Tuple[Tuple[Tuple[str, ...], Tuple[str, str]], ...] = (
    (("endgame", "end game"), ("phase", "endgame")),
    (("middle game", "middlegame"), ("phase", "middlegame")),
    (("queenside majority", "queenside pawn majority"), ("theme", "queenside_majority")),
    (("sacrifice", "sacrifices"), ("theme", "sacrifice")),
    (("tactical", "tactics"), ("theme", "tactics")),
    (("attacking the king", "king attack"), ("theme", "king_attack")),
)


@dataclass(frozen=True)
class RatingFilter:
    white_min: Optional[int] = None
    black_min: Optional[int] = None
    max_rating_delta: Optional[int] = None


@dataclass(frozen=True)
class MetadataFilter:
    field: str
    value: str


@dataclass(frozen=True)
class Request:
    text: str
    limit: Optional[int] = None
    offset: Optional[int] = None


@dataclass(frozen=True)
class QueryPlan:
    original: Request
    cleaned_text: str
    keywords: Tuple[str, ...]
    filters: Tuple[MetadataFilter, ...]
    rating: RatingFilter
    limit: int
    offset: int

    @property
    def phases(self) -> List[str]:
        return sorted({f.value for f in self.filters if f.field == "phase"})

    @property
    def themes(self) -> List[str]:
        return sorted({f.value for f in self.filters if f.field == "theme"})


def normalize(text: str) -> str:
    out: List[str] = []
    for ch in text:
        if ch.isalnum() and ch.isascii():
            out.append(ch.lower())
        elif ch == "'":
            continue
        else:
            out.append(" ")
    return "".join(out).strip()


def tokenize(text: str) -> List[str]:
    return [tok for tok in text.split(" ") if tok]


def int_of_token(token: str) -> Optional[int]:
    if not token:
        return None
    if token.isdigit():
        try:
            return int(token)
        except ValueError:
            return None
    return _NUMBER_WORDS.get(token)


def limit_from_tokens(tokens: List[str]) -> Optional[int]:
    prev: Optional[str] = None
    for idx, token in enumerate(tokens):
        value = int_of_token(token)
        if value is not None and 0 < value <= 50:
            nxt = tokens[idx + 1] if idx + 1 < len(tokens) else None
            qualifies = (prev in _LIMIT_QUALIFIERS) or (nxt in ("games", "game"))
            if qualifies:
                return value
        prev = token
    return None


def _dedup_filters(filters: List[MetadataFilter]) -> Tuple[MetadataFilter, ...]:
    return tuple(
        MetadataFilter(f, v)
        for f, v in sorted({(flt.field, flt.value) for flt in filters})
    )


def metadata_from_phrases(cleaned: str) -> List[MetadataFilter]:
    manual = [
        MetadataFilter(field, value)
        for variants, (field, value) in _PHRASE_FILTERS
        if any(phrase in cleaned for phrase in variants)
    ]
    opening = [MetadataFilter(f, v) for f, v in openings.filters_for_text(cleaned)]
    return list(_dedup_filters(manual + opening))


def result_filters(cleaned: str) -> List[MetadataFilter]:
    out: List[MetadataFilter] = []
    if "white win" in cleaned or "white victory" in cleaned:
        out.append(MetadataFilter("result", "1-0"))
    if "black win" in cleaned or "black victory" in cleaned:
        out.append(MetadataFilter("result", "0-1"))
    if "draw" in cleaned or "drawn" in cleaned:
        out.append(MetadataFilter("result", "1/2-1/2"))
    return list(_dedup_filters(out))


def extract_keywords(tokens: List[str]) -> List[str]:
    seen = set()
    out: List[str] = []
    for token in tokens:
        if token in STOPWORDS or len(token) <= 2 or token in seen:
            continue
        seen.add(token)
        out.append(token)
    return out


def parse_rating(tokens: List[str]) -> RatingFilter:
    white_min: Optional[int] = None
    black_min: Optional[int] = None
    max_delta: Optional[int] = None
    color: Optional[str] = None
    pending: Optional[int] = None
    previous: List[str] = []  # most-recent-first window of 5
    for idx, token in enumerate(tokens):
        if token == "white":
            color = "white"
        elif token == "black":
            color = "black"
        value = int_of_token(token)
        if value is not None:
            diff_context = any(t in _DIFFERENCE_WORDS for t in tokens[idx + 1 : idx + 4])
            min_context = any(t in _MIN_CONTEXT_WORDS for t in previous)
            if not diff_context and min_context:
                if color == "white":
                    white_min = value if white_min is None else max(white_min, value)
                elif color == "black":
                    black_min = value if black_min is None else max(black_min, value)
            pending = value
        else:
            if token in ("lower", "less") and pending is not None:
                max_delta = pending
            if token not in _RATING_CONTEXT_WORDS:
                pending = None
        previous = [token] + previous[:4]
    return RatingFilter(white_min=white_min, black_min=black_min, max_rating_delta=max_delta)


def analyse(request: Request) -> QueryPlan:
    cleaned = normalize(request.text)
    tokens = tokenize(cleaned)
    natural_limit = limit_from_tokens(tokens)

    def clamp(value: int) -> int:
        return max(1, min(MAX_LIMIT, value))

    if request.limit is not None:
        limit = clamp(request.limit)
    elif natural_limit is not None:
        limit = clamp(natural_limit)
    else:
        limit = DEFAULT_LIMIT
    offset = max(0, request.offset if request.offset is not None else DEFAULT_OFFSET)
    filters = _dedup_filters(
        metadata_from_phrases(cleaned) + result_filters(cleaned)
    )
    return QueryPlan(
        original=request,
        cleaned_text=cleaned,
        keywords=tuple(extract_keywords(tokens)),
        filters=filters,
        rating=parse_rating(tokens),
        limit=limit,
        offset=offset,
    )
