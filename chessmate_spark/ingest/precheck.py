"""Distributed TWIC precheck (S11): chunks fan out via mapInPandas, the
pure validator (chess/precheck.py) runs per game, issues come back as a
DataFrame — the Spark re-expression of twic_precheck_command.ml:31-89's
fold over games.

Scale shape: splitting a PGN dump is a linear scan (driver- or
mapPartitions-side per file); validation — the expensive part on a real
TWIC drop — is embarrassingly parallel across chunks, so the same operator
handles one file or a 100 TB archive partitioned by file.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..chess.pgn import split_games
from ..chess.precheck import precheck_game, truncate_preview

ISSUE_SCHEMA = (
    "game_no int, problem_no int, problem string, hint string, preview string"
)


def _precheck_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for game_no, raw in zip(pdf["game_no"], pdf["raw"]):
            issues = precheck_game(raw)
            if issues:
                preview = truncate_preview(raw)
                for problem_no, (problem, hint) in enumerate(issues, start=1):
                    rows.append((int(game_no), problem_no, problem, hint, preview))
        yield pd.DataFrame(
            rows, columns=["game_no", "problem_no", "problem", "hint", "preview"]
        )


def twic_precheck_chunks(chunks: DataFrame) -> DataFrame:
    """chunks(game_no int, raw string) → issues DataFrame (empty = clean)."""
    return chunks.mapInPandas(_precheck_batches, ISSUE_SCHEMA)


def twic_precheck(spark: SparkSession, raw_text: str) -> DataFrame:
    """Precheck a multi-game PGN text (driver-side split, distributed scan)."""
    chunks = split_games(raw_text)
    df = spark.createDataFrame(
        [(i + 1, chunk) for i, chunk in enumerate(chunks)],
        "game_no int, raw string",
    ).repartition(
        max(1, min(len(chunks), spark.sparkContext.defaultParallelism))
    )
    return twic_precheck_chunks(df)
