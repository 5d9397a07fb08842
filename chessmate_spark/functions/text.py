"""Text Column expressions — all JVM-side (whole-stage codegen), no Python UDFs.

Spark-first forms of the reference's scalar text functions:
  F1 normalize (query_intent.ml:95-102), F2 tokenize (:104-106),
  F3 slugify (openings.ml:3-15), F13 tokenize_sources
  (hybrid_executor.ml:83-119).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_question(col: Column) -> Column:
    """F1: lowercase, delete apostrophes, non-alnum → space, trim."""
    lowered = F.lower(col)
    no_apostrophe = F.regexp_replace(lowered, "'", "")
    spaced = F.regexp_replace(no_apostrophe, "[^a-z0-9]+", " ")
    return F.trim(spaced)


def tokenize_expr(col: Column) -> Column:
    """F2: split on spaces, drop empties."""
    return F.filter(F.split(col, " "), lambda x: x != F.lit(""))


def norm_tokens_expr(col: Column) -> Column:
    """Shared corpus normalization (dedup, decontamination, repetition):
    lowercase → non-alnum runs → single space → trim → tokenize.  The
    DuckDB oracles mirror this exactly (_DUCK_NORM_TOKENS); keep the two
    definitions in lockstep."""
    return tokenize_expr(
        F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))
    )


def unicode_norm_tokens_expr(col: Column) -> Column:
    """UTF-8-safe corpus tokenizer (opt-in): lowercase → runs of
    non-letter/non-digit (Unicode ``\\p{L}\\p{N}`` classes) → single
    space → trim → tokenize.

    The default ``norm_tokens_expr`` is deliberately byte-ASCII for
    reference parity (openings.ml:25-27, SURVEY §7.3's Unicode note) —
    right for the chess surface, but it mangles any non-Latin corpus
    (every non-ASCII byte becomes a separator).  The LLM-pipeline
    operators (vocabulary, token ids, BPE, LM scoring) accept a
    ``tokenizer="unicode"`` parameter that routes here.  Java and RE2
    both implement ``\\p{L}``/``\\p{N}`` and both engines lowercase
    Unicode-aware, so the DuckDB oracle mirrors this exactly
    (_DUCK_UNICODE_TOKS)."""
    return tokenize_expr(
        F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}\p{N}]+", " "))
    )


def slugify_expr(col: Column) -> Column:
    """F3: lowercase, delete apostrophes, alnum runs joined by '_'."""
    lowered = F.lower(col)
    no_apostrophe = F.regexp_replace(lowered, "'", "")
    underscored = F.regexp_replace(no_apostrophe, "[^a-z0-9]+", "_")
    return F.regexp_replace(underscored, "(^_+|_+$)", "")


def tokenize_sources(*cols: Column) -> Column:
    """F13: sorted, deduped, lowercase alnum tokens of length >= 3 across
    source columns (null columns contribute nothing)."""
    joined = F.lower(F.concat_ws(" ", *cols))
    tokens = F.split(joined, "[^a-z0-9]+")
    long_enough = F.filter(tokens, lambda x: F.length(x) >= 3)
    return F.array_sort(F.array_distinct(long_enough))
