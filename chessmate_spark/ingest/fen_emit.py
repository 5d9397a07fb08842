"""S12: FEN emitter (pgn→fen) — the `chessmate pgn-to-fen` CLI as a
distributed operator (reference: bin/main.ml:143-153,
lib/cli/pgn_to_fen_command.ml): every half-move's FEN, in game order.

Same fan-out shape as ingest/precheck: driver-side split, mapInPandas
replay across executors, one output row per ply.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..chess.pgn import parse_game, split_games
from ..chess.replay import fens_of_moves

FEN_SCHEMA = "game_no int, ply int, san string, fen string"


def _emit_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for game_no, raw in zip(pdf["game_no"], pdf["raw"]):
            game = parse_game(raw)
            sans = [m.san for m in game.moves]
            for ply, (san, fen) in enumerate(
                zip(sans, fens_of_moves(sans)), start=1
            ):
                rows.append((int(game_no), ply, san, fen))
        yield pd.DataFrame(rows, columns=["game_no", "ply", "san", "fen"])


def emit_fens(spark: SparkSession, raw_text: str) -> DataFrame:
    """Multi-game PGN text → (game_no, ply, san, fen) rows."""
    chunks = split_games(raw_text)
    df = spark.createDataFrame(
        [(i + 1, chunk) for i, chunk in enumerate(chunks)],
        "game_no int, raw string",
    ).repartition(
        max(1, min(len(chunks), spark.sparkContext.defaultParallelism))
    )
    return df.mapInPandas(_emit_batches, FEN_SCHEMA)


def write_fens(df: DataFrame, path: str) -> None:
    """The CLI's file mode: one FEN per line, game/ply ordered."""
    (
        df.orderBy("game_no", "ply")
        .select("fen")
        .coalesce(1)
        .write.mode("errorifexists")
        .text(path)
    )
