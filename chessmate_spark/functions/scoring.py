"""Hybrid scoring as SQL expressions (no UDFs — these run in the hot path).

Reference formulas:
  A4 keyword overlap (hybrid_executor.ml:127-133)
  A5 fallback vector score (hybrid_executor.ml:134-144)
  F20 clamp (hybrid_planner.ml:9,68-70)
  F21 weighted blend 0.75*vector + 0.25*keyword; agent blend
      min(1, 0.6*base + 0.4*agent) (hybrid_planner.ml:13; hybrid_executor.ml:236-239)
  P12 rating_matches (hybrid_executor.ml:62-81)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

VECTOR_WEIGHT = 0.75
KEYWORD_WEIGHT = 0.25
AGENT_BASE_WEIGHT = 0.6
AGENT_WEIGHT = 0.4


def portable_round(col: Column, digits: int = 6) -> Column:
    """Round-half-up implemented as floor(x*10^d + 0.5)/10^d.

    Spark's ``round`` (BigDecimal HALF_UP over the shortest decimal repr) and
    DuckDB's ``round`` (double multiply + std::round) disagree at FP
    half-boundaries; this floor form evaluates identically in both engines
    given bit-identical inputs, which is what the correctness oracle needs.
    """
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def clamp01(col: Column) -> Column:
    """F20: NaN/±inf → 0.0, clamp to [0, 1]."""
    finite = F.when(F.isnan(col) | (F.abs(col) == float("inf")), F.lit(0.0)).otherwise(col)
    return F.least(F.greatest(finite, F.lit(0.0)), F.lit(1.0))


def keyword_overlap(token_set: Column, keywords: Sequence[str]) -> Column:
    """A4: |plan.keywords ∩ tokens| / max(1, |plan.keywords|)."""
    if not keywords:
        return F.lit(0.0)
    kw = F.array(*[F.lit(k) for k in keywords])
    matches = F.size(F.array_intersect(kw, token_set))
    return matches.cast("double") / F.lit(float(max(1, len(keywords))))


def fallback_vector_score(
    rating_match: Column, n_filters: int, matched_filters: Column
) -> Column:
    """A5: 0.0 on rating mismatch; 0.6 with no filters; else
    0.4 + 0.6 * matched/len(filters)."""
    if n_filters == 0:
        scored = F.lit(0.6)
    else:
        scored = F.lit(0.4) + F.lit(0.6) * matched_filters.cast("double") / F.lit(
            float(n_filters)
        )
    return F.when(~rating_match, F.lit(0.0)).otherwise(scored)


def blend_scores(vector: Column, keyword: Column, agent: Optional[Column] = None) -> Column:
    """F21: base = 0.75*vector + 0.25*keyword; with agent present,
    min(1, 0.6*base + 0.4*agent)."""
    base = F.lit(VECTOR_WEIGHT) * vector + F.lit(KEYWORD_WEIGHT) * keyword
    if agent is None:
        return base
    blended = F.lit(AGENT_BASE_WEIGHT) * base + F.lit(AGENT_WEIGHT) * agent
    return F.when(agent.isNull(), base).otherwise(F.least(F.lit(1.0), blended))


def rating_matches(
    white_rating: Column,
    black_rating: Column,
    white_min: Optional[int],
    black_min: Optional[int],
    max_delta: Optional[int],
) -> Column:
    """P12: thresholds require the rating present; delta requires both."""
    cond = F.lit(True)
    if white_min is not None:
        cond = cond & white_rating.isNotNull() & (white_rating >= F.lit(white_min))
    if black_min is not None:
        cond = cond & black_rating.isNotNull() & (black_rating >= F.lit(black_min))
    if max_delta is not None:
        cond = (
            cond
            & white_rating.isNotNull()
            & black_rating.isNotNull()
            & (F.abs(white_rating - black_rating) <= F.lit(max_delta))
        )
    return cond
