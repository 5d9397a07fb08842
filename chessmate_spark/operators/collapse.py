"""A3/V4: per-game collapse of vector hits.

Reference semantics (hybrid_planner.ml:110-142): group scored points by
payload.game_id; score = max(score); phases/themes/keywords = lowercased,
deduped, sorted union.  One groupBy → map-side partial aggregation then a
single shuffle on game_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merged_array(col: str) -> F.Column:
    flat = F.flatten(F.collect_list(col))
    lowered = F.transform(flat, F.lower)
    return F.array_sort(F.array_distinct(lowered))


def collapse_hits_by_game(
    hits: DataFrame,
    game_col: str = "game_id",
    extra_keys: tuple = (),
) -> DataFrame:
    """hits(game_id, score, phases, themes, keywords) → one row per game.

    ``extra_keys`` prepend grouping columns — the batch serving path
    collapses per (question_id, game_id) with the same merge semantics."""
    return hits.groupBy(*extra_keys, game_col).agg(
        F.max("score").alias("score"),
        _merged_array("phases").alias("phases"),
        _merged_array("themes").alias("themes"),
        _merged_array("keywords").alias("keywords"),
    )
