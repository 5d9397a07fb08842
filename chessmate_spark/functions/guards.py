"""Small pure guards used around the agent path, as JVM column expressions.

F23 PGN truncation  — agent_evaluator.ml:29-33 (3000-char cap + marker)
F24 sanitizer       — lib/core/sanitizer.ml (secret/DSN redaction)
X5 theme classifier — position_features.ml:5-25 (tags → theme enum)

All three also exist as pure-Python mirrors for driver-side use (request
prep, log scrubbing) with identical semantics.
"""

from __future__ import annotations

import re
from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_PGN_CHARS = 3000
PGN_TRUNCATION_MARKER = "\n... [PGN truncated]"

REDACTION = "[redacted]"
SANITIZE_PATTERNS: List[str] = [
    "sk-[A-Za-z0-9_-]{8,}",
    "gpt-[A-Za-z0-9_-]{8,}",
    "OPENAI_API_KEY=[^\\s]+",
    "DATABASE_URL=[^\\s]+",
    "postgres://[^\\s]+",
    "postgresql://[^\\s]+",
    "redis://[^\\s]+",
    "AGENT_API_KEY=[^\\s]+",
]

THEME_UNKNOWN = "unknown"
THEME_KINGSIDE = "kingside_attack"
THEME_QUEENSIDE = "queenside_majority"
THEME_CENTRAL = "central_break"


# --- F23: PGN truncation ----------------------------------------------------

def truncate_pgn(col: Column, max_chars: int = MAX_PGN_CHARS) -> Column:
    """Cap the PGN payload sent to the evaluator; append the marker."""
    return F.when(F.length(col) <= max_chars, col).otherwise(
        F.concat(F.substring(col, 1, max_chars), F.lit(PGN_TRUNCATION_MARKER))
    )


def truncate_pgn_py(pgn: str, max_chars: int = MAX_PGN_CHARS) -> str:
    if len(pgn) <= max_chars:
        return pgn
    return pgn[:max_chars] + PGN_TRUNCATION_MARKER


# --- F24: secret sanitizer --------------------------------------------------

def sanitize(col: Column) -> Column:
    """Redact API keys / DSNs before a string reaches logs or responses."""
    out = col
    for pattern in SANITIZE_PATTERNS:
        out = F.regexp_replace(out, pattern, REDACTION)
    return out


_COMPILED = [re.compile(p) for p in SANITIZE_PATTERNS]


def sanitize_py(text: str) -> str:
    for rx in _COMPILED:
        text = rx.sub(REDACTION, text)
    return text


# --- X5: theme classifier ---------------------------------------------------

def _tags_contain(tags: Column, needle: str) -> Column:
    return F.exists(
        tags, lambda t: F.contains(F.lower(F.trim(t)), F.lit(needle))
    )


def classify_theme(tags: Column) -> Column:
    """tags array<string> → theme enum, priority queenside majority >
    kingside attack > central break > unknown (position_features.ml:5-25)."""
    return (
        F.when(_tags_contain(tags, "queenside majority"), F.lit(THEME_QUEENSIDE))
        .when(_tags_contain(tags, "kingside attack"), F.lit(THEME_KINGSIDE))
        .when(_tags_contain(tags, "central break"), F.lit(THEME_CENTRAL))
        .otherwise(F.lit(THEME_UNKNOWN))
    )


def classify_theme_py(tags: Sequence[str]) -> str:
    downcased = [t.strip().lower() for t in tags]
    if any("queenside majority" in t for t in downcased):
        return THEME_QUEENSIDE
    if any("kingside attack" in t for t in downcased):
        return THEME_KINGSIDE
    if any("central break" in t for t in downcased):
        return THEME_CENTRAL
    return THEME_UNKNOWN


# --- X7: evaluator effort/verbosity selection -------------------------------

EFFORT_HIGH = "high"
EFFORT_MEDIUM = "medium"
VERBOSITY_LOW = "low"
VERBOSITY_MEDIUM = "medium"


def effort_for_plan(plan) -> str:
    """agent_evaluator.ml:35-42: theme-filtered or keyword-heavy (>=4)
    plans get High reasoning effort, everything else Medium."""
    has_theme = any(f.field.lower() == "theme" for f in plan.filters)
    if has_theme or len(plan.keywords) >= 4:
        return EFFORT_HIGH
    return EFFORT_MEDIUM


def verbosity_for_plan(plan) -> str:
    """agent_evaluator.ml:44-49: simple plans (<=1 filter, <=2 keywords)
    get Low verbosity, everything else Medium."""
    if len(plan.filters) <= 1 and len(plan.keywords) <= 2:
        return VERBOSITY_LOW
    return VERBOSITY_MEDIUM
