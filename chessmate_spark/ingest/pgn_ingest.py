"""PGN → games / players / positions / embedding_jobs batch ingest.

Spark-first re-expression of the reference's ingest path (SURVEY §3.2):
split (S1) → parse (S2/X4) → metadata (S3) → SAN→FEN replay (X1) → validate
(X2) → explode positions → derive players (S5 upsert semantics) and
embedding jobs (S6).  Parse/replay is sequential *within* a game and
parallel *across* games, so the heavy X1 engine runs inside ``mapInPandas``
(Arrow-batched) over game chunks; everything after is DataFrame ops.

Corrupt-record channel: games that fail to parse or replay land in a
``corrupt`` DataFrame with the error string — per-game errors never abort
the file (reference: ingest_command.ml:71-77).

Scale notes: the splitter itself is a pure text→chunks function; for
multi-TB PGN dumps feed it per-file via ``spark.read.text`` +
``input_file_name`` grouping or a custom record delimiter, then reuse
everything from ``ingest_chunks`` down unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..chess.fen import FenError, normalize_fen
from ..chess.metadata import metadata_of_headers
from ..chess.pgn import PgnError, parse_game, split_games
from ..chess.replay import ReplayError, fens_of_moves

PARSED_SCHEMA = (
    "game_id long, event string, site string, played_on string, round string,"
    " white_name string, white_fide_id string, white_rating int,"
    " black_name string, black_fide_id string, black_rating int,"
    " eco_code string, opening_name string, opening_slug string,"
    " result string, pgn string, sans array<string>, fens array<string>,"
    " error string"
)


def _parse_chunk(game_id: int, raw: str) -> dict:
    base = {
        "game_id": game_id, "event": None, "site": None, "played_on": None,
        "round": None, "white_name": None, "white_fide_id": None,
        "white_rating": None, "black_name": None, "black_fide_id": None,
        "black_rating": None, "eco_code": None, "opening_name": None,
        "opening_slug": None, "result": None, "pgn": raw, "sans": None,
        "fens": None, "error": None,
    }
    try:
        game = parse_game(raw)
        meta = metadata_of_headers(game.headers)
        sans = [m.san for m in game.moves]
        fens = fens_of_moves(sans)
        if len(fens) != len(sans):
            raise ReplayError(
                f"move/FEN cardinality mismatch: {len(sans)} vs {len(fens)}"
            )
        fens = [normalize_fen(f) for f in fens]
        base.update(
            event=meta.event, site=meta.site, played_on=meta.date,
            round=meta.round, white_name=meta.white.name,
            white_fide_id=meta.white.fide_id, white_rating=meta.white.rating,
            black_name=meta.black.name, black_fide_id=meta.black.fide_id,
            black_rating=meta.black.rating, eco_code=meta.eco_code,
            opening_name=meta.opening_name, opening_slug=meta.opening_slug,
            result=meta.result, sans=sans, fens=fens,
        )
    except (PgnError, ReplayError, FenError) as exc:
        base["error"] = str(exc)
    return base


def _parse_batches(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in iterator:
        rows = [_parse_chunk(int(r.game_id), r.raw) for r in pdf.itertuples()]
        yield pd.DataFrame(
            rows,
            columns=[
                "game_id", "event", "site", "played_on", "round",
                "white_name", "white_fide_id", "white_rating",
                "black_name", "black_fide_id", "black_rating",
                "eco_code", "opening_name", "opening_slug", "result",
                "pgn", "sans", "fens", "error",
            ],
        )


@dataclass
class IngestResult:
    games: DataFrame
    players: DataFrame
    positions: DataFrame
    embedding_jobs: DataFrame
    corrupt: DataFrame

    def counts(self) -> dict:
        return {
            "games": self.games.count(),
            "players": self.players.count(),
            "positions": self.positions.count(),
            "embedding_jobs": self.embedding_jobs.count(),
            "corrupt": self.corrupt.count(),
        }


def ingest_chunks(
    chunks: DataFrame,
    existing_players: Optional[DataFrame] = None,
    max_pending_jobs: Optional[int] = None,
    pending_jobs: int = 0,
) -> IngestResult:
    """chunks(game_id long, raw string) → the four relational tables.

    ``max_pending_jobs`` implements the Q5 backpressure guard
    (ingest_command.ml:27-44): ingest refuses when the queue is too deep.
    """
    if max_pending_jobs is not None and 0 < max_pending_jobs <= pending_jobs:
        raise RuntimeError(
            f"embedding queue too deep ({pending_jobs} >= {max_pending_jobs});"
            " ingest aborted"
        )
    parsed = chunks.mapInPandas(_parse_batches, PARSED_SCHEMA).persist()
    ok = parsed.filter(F.col("error").isNull())
    corrupt = parsed.filter(F.col("error").isNotNull()).select(
        "game_id", "pgn", "error"
    )

    games = ok.select(
        F.col("game_id").alias("id"),
        "event", "site",
        F.to_date("played_on").alias("played_on"),
        "round", "eco_code", "result",
        "white_rating", "black_rating",
        F.lit("{}").alias("tags"),
        "opening_name", "opening_slug", "pgn",
        "white_name", "white_fide_id", "black_name", "black_fide_id",
    )

    # S5 player upsert: union both colors, drop empties, dedupe by
    # (fide_id else name), anti-join against the existing dimension, then
    # assign dense ids after the existing max — SCD-0 merge semantics.
    new_players = (
        ok.select(
            F.col("white_name").alias("name"),
            F.col("white_fide_id").alias("fide_id"),
            F.col("white_rating").alias("rating_peak"),
        )
        .unionByName(
            ok.select(
                F.col("black_name").alias("name"),
                F.col("black_fide_id").alias("fide_id"),
                F.col("black_rating").alias("rating_peak"),
            )
        )
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .withColumn("_key", F.coalesce(F.col("fide_id"), F.col("name")))
        .groupBy("_key")
        .agg(
            F.min("name").alias("name"),
            F.min("fide_id").alias("fide_id"),
            F.max("rating_peak").alias("rating_peak"),
        )
    )
    if existing_players is not None:
        keyed_existing = existing_players.withColumn(
            "_key", F.coalesce(F.col("fide_id"), F.col("name"))
        )
        new_players = new_players.join(
            keyed_existing.select("_key"), "_key", "left_anti"
        )
        id_offset = existing_players.agg(F.coalesce(F.max("id"), F.lit(0))).first()[0]
    else:
        id_offset = 0
    players = new_players.withColumn(
        "id",
        F.row_number().over(Window.orderBy("_key")) + F.lit(id_offset),
    ).select("id", "name", "fide_id", "rating_peak")
    if existing_players is not None:
        players = existing_players.select(
            "id", "name", "fide_id", "rating_peak"
        ).unionByName(players)

    # link games to player ids through the same (fide_id else name) key
    white_dim = players.select(
        F.coalesce(F.col("fide_id"), F.col("name")).alias("_wk"),
        F.col("id").alias("white_player_id"),
    )
    black_dim = players.select(
        F.coalesce(F.col("fide_id"), F.col("name")).alias("_bk"),
        F.col("id").alias("black_player_id"),
    )
    games = (
        games.withColumn(
            "_wkey", F.coalesce(F.col("white_fide_id"), F.col("white_name"))
        )
        .withColumn(
            "_bkey", F.coalesce(F.col("black_fide_id"), F.col("black_name"))
        )
        .join(F.broadcast(white_dim), F.col("_wkey") == F.col("_wk"), "left")
        .join(F.broadcast(black_dim), F.col("_bkey") == F.col("_bk"), "left")
        .drop("_wk", "_bk", "_wkey", "_bkey", "white_name", "white_fide_id",
              "black_name", "black_fide_id")
    )

    # X1 output exploded into positions; UNIQUE(game_id, ply) holds by
    # construction (posexplode of a per-game array)
    exploded = ok.select(
        "game_id",
        F.posexplode(F.arrays_zip(F.col("sans"), F.col("fens"))).alias("_pos", "_mv"),
    ).select(
        "game_id",
        (F.col("_pos") + 1).alias("ply"),
        F.col("_mv.sans").alias("san"),
        F.col("_mv.fens").alias("fen"),
    )
    positions = exploded.select(
        (F.col("game_id") * 10_000 + F.col("ply")).alias("id"),
        "game_id", "ply",
        ((F.col("ply") + 1) / 2).cast("int").alias("move_number"),
        # odd ply = white just moved → black to move in the resulting FEN
        F.when(F.col("ply") % 2 == 1, F.lit("black"))
        .otherwise(F.lit("white"))
        .alias("side_to_move"),
        "fen", "san",
        F.lit(None).cast("int").alias("eval_cp"),
        F.lit(None).cast("string").alias("vector_id"),
        F.lit("{}").alias("tags"),
    )

    embedding_jobs = positions.select(
        F.col("id").alias("id"),
        F.col("id").alias("position_id"),
        "fen",
        F.lit("pending").alias("status"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("last_error"),
        # deterministic total claim order (O6): enqueued in position order
        F.col("id").alias("enqueued_seq"),
        F.lit(None).cast("timestamp").alias("started_at"),
        F.lit(None).cast("timestamp").alias("completed_at"),
    )

    return IngestResult(
        games=games,
        players=players,
        positions=positions,
        embedding_jobs=embedding_jobs,
        corrupt=corrupt,
    )


def ingest_pgn_text(
    spark: SparkSession,
    raw_text: str,
    existing_players: Optional[DataFrame] = None,
    max_pending_jobs: Optional[int] = None,
    pending_jobs: int = 0,
) -> IngestResult:
    """Ingest a multi-game PGN text (driver-side split, distributed parse)."""
    chunks = split_games(raw_text)
    df = spark.createDataFrame(
        [(i + 1, chunk) for i, chunk in enumerate(chunks)],
        "game_id long, raw string",
    ).repartition(max(1, min(len(chunks), spark.sparkContext.defaultParallelism)))
    return ingest_chunks(
        df,
        existing_players=existing_players,
        max_pending_jobs=max_pending_jobs,
        pending_jobs=pending_jobs,
    )
