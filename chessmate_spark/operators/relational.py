"""Relational search: plan filters → joined/filtered/paged game summaries.

Spark-first re-expression of the reference's dynamic WHERE compilation
(repo_postgres_caqti.ml:137-205) + the games⟕players×2 summary join
(:265-292) + deterministic pagination (:289-303).

Scale notes:
  * ``players`` is a dimension table → broadcast hash join (J1), no shuffle.
  * Filters are plain Column predicates, so Catalyst pushes them into the
    parquet scan (PushedFilters) before the join.
  * Pagination: ``orderBy().limit(offset+limit)`` compiles to
    TakeOrderedAndProject (per-partition top-k + single merge, no global
    sort shuffle); the row_number window then runs on ≤ offset+limit rows.
    OFFSET deep-paging is inherently ordinal — for 100 TB use keyset
    pagination (filter on last-seen (played_on, id)) which this function
    also supports via ``after``.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..query.intent import QueryPlan


def game_summaries(games: DataFrame, players: DataFrame) -> DataFrame:
    """J1: games ⟕ players(white) ⟕ players(black), COALESCE'd names."""
    white = players.select(
        F.col("id").alias("_w_id"),
        F.col("name").alias("_w_name"),
        F.col("fide_id").alias("white_fide_id"),
    )
    black = players.select(
        F.col("id").alias("_b_id"),
        F.col("name").alias("_b_name"),
        F.col("fide_id").alias("black_fide_id"),
    )
    return (
        games.join(F.broadcast(white), games["white_player_id"] == white["_w_id"], "left")
        .join(F.broadcast(black), games["black_player_id"] == black["_b_id"], "left")
        .withColumn("white", F.coalesce(F.col("_w_name"), F.lit("")))
        .withColumn("black", F.coalesce(F.col("_b_name"), F.lit("")))
        .drop("_w_id", "_w_name", "_b_id", "_b_name")
    )


def _eco_predicate(value: str) -> Column:
    """P5/P6: exact ECO or lexicographic range 'C00-C19' (F22 normalization)."""
    normalized = value.strip().upper()
    parts = normalized.split("-")
    if len(parts) == 2 and parts[0] and parts[1]:
        return F.upper(F.col("eco_code")).between(parts[0], parts[1])
    return F.upper(F.col("eco_code")) == F.lit(normalized)


def compile_predicate(plan: QueryPlan) -> Column:
    """P1-P10: whitelisted filter fields → one AND predicate.

    Unknown fields are silently ignored (repo_postgres_caqti.ml:148-154,
    verified by the reference's test_sql_filters.ml).
    """
    cond = F.lit(True)
    for flt in plan.filters:
        field = flt.field.lower()
        if field in ("opening", "opening_slug"):
            cond = cond & (
                F.lower(F.col("opening_slug")) == F.lit(flt.value.strip().lower())
            )
        elif field == "event":
            cond = cond & (F.lower(F.col("event")) == F.lit(flt.value.strip().lower()))
        elif field == "result":
            cond = cond & (F.col("result") == F.lit(flt.value))
        elif field == "white_player":
            cond = cond & (F.lower(F.col("white")) == F.lit(flt.value.strip().lower()))
        elif field == "black_player":
            cond = cond & (F.lower(F.col("black")) == F.lit(flt.value.strip().lower()))
        elif field == "eco":
            cond = cond & _eco_predicate(flt.value)
        elif field == "eco_range":
            cond = cond & _eco_predicate(flt.value)
        elif field == "vector_only":
            truthy = flt.value.strip().lower() in ("true", "1", "yes")
            falsy = flt.value.strip().lower() in ("false", "0", "no")
            if truthy:
                cond = cond & F.col("vector_id").isNotNull()
            elif falsy:
                cond = cond & F.col("vector_id").isNull()
        # phase/theme filters apply to the vector side (hybrid_planner.ml:27-53)
    rating = plan.rating
    if rating.white_min is not None:
        cond = cond & (F.col("white_rating") >= F.lit(rating.white_min))
    if rating.black_min is not None:
        cond = cond & (F.col("black_rating") >= F.lit(rating.black_min))
    if rating.max_rating_delta is not None:
        cond = (
            cond
            & F.col("white_rating").isNotNull()
            & F.col("black_rating").isNotNull()
            & (
                F.abs(F.col("white_rating") - F.col("black_rating"))
                <= F.lit(rating.max_rating_delta)
            )
        )
    return cond


def paginate(
    df: DataFrame,
    order_cols: list[Column],
    limit: int,
    offset: int = 0,
    after: Optional[Column] = None,
) -> DataFrame:
    """O1: deterministic page. ``after`` enables keyset pagination at scale."""
    if after is not None:
        df = df.filter(after)
        offset = 0
    bounded = df.orderBy(*order_cols).limit(offset + limit)
    if offset == 0:
        return bounded
    window = Window.orderBy(*order_cols)
    return (
        bounded.withColumn("_rn", F.row_number().over(window))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )


def search_games(
    games: DataFrame, players: DataFrame, plan: QueryPlan
) -> Tuple[DataFrame, int]:
    """Filtered summary page + total count sharing one plan (A1 + O1).

    The filtered join is computed ONCE: the frame is persisted, the count
    action populates the cache, the page reads from it, and the cache is
    released before returning (the page itself is materialized first — it
    is at most ``limit`` rows, so the checkpoint is cheap at any scale).
    """
    summaries = (
        game_summaries(games, players)
        .filter(compile_predicate(plan))
        .persist()
    )
    try:
        total = summaries.count()
        page = paginate(
            summaries,
            [F.col("played_on").desc_nulls_last(), F.col("id").desc()],
            plan.limit,
            plan.offset,
        ).localCheckpoint(eager=True)
    finally:
        summaries.unpersist()
    return page, total
