"""``python -m chessmate_spark.query`` — the reference CLI's ``query``
command (bin/main.ml:273 → lib/query/search_command.ml), self-contained:
ingest PGN corpora, build the vector side, answer the question, print the
terminal rendering (or raw JSON with ``--json``) — the README.md:259-288
session shape against local files instead of a running HTTP API.

    python -m chessmate_spark.query "Show me 5 random games" \
        --pgn tests/fixtures/extended_sample_game.pgn [--limit N] \
        [--offset N] [--json] [--dim 8]

``--serve [--port P]`` starts the HTTP front instead (query/http.py —
the reference's Opium routes: /query, /health, /metrics, /openapi.yaml;
chessmate_api.ml:809-827), serving the same ingested tables:

    python -m chessmate_spark.query --serve --port 8080 \
        --pgn tests/fixtures/extended_sample_game.pgn
    curl 'http://localhost:8080/query?q=Show+me+games&limit=3'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import List, Optional

from pyspark.sql import SparkSession

from .serve import ServingError, answer_question, format_response_text


def _build_tables(spark: SparkSession, pgn_paths: List[str], dim: int):
    from ..ingest import ingest_pgn_text
    from ..plans.hybrid import HybridTables
    from ..streaming import JobsState, drain_jobs

    text = "\n\n".join(
        Path(p).read_text(encoding="utf-8") for p in pgn_paths
    )
    ingest = ingest_pgn_text(spark, text)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions,
        ingest.games,
        ingest.players,
        batch_size=64,
        dim=dim,
    )
    return HybridTables(
        games=ingest.games,
        players=ingest.players,
        position_vectors=state.position_vectors,
    )


def main(
    argv: Optional[List[str]] = None, spark: Optional[SparkSession] = None
) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m chessmate_spark.query",
        description="Answer a natural-language chess question over PGN files",
    )
    parser.add_argument(
        "question", nargs="?", default=None,
        help="natural-language question (omit with --serve)",
    )
    parser.add_argument(
        "--serve", action="store_true",
        help="start the HTTP front instead of answering one question",
    )
    parser.add_argument(
        "--port", type=int, default=8080, help="HTTP port for --serve"
    )
    parser.add_argument(
        "--pgn",
        action="append",
        required=True,
        help="PGN file to ingest (repeatable)",
    )
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--offset", type=int, default=None)
    parser.add_argument(
        "--dim", type=int, default=8, help="embedding dimension"
    )
    parser.add_argument(
        "--json", action="store_true", help="print the raw JSON payload"
    )
    args = parser.parse_args(argv)

    own_session = spark is None
    if own_session:
        from ..session import get_spark

        spark = get_spark(app_name="chessmate_spark_query")
        spark.sparkContext.setLogLevel("ERROR")
    try:
        tables = _build_tables(spark, args.pgn, args.dim)
        if args.serve:
            from ..functions.rate_limiter import RateLimiter
            from .http import ChessmateApi

            api = ChessmateApi(
                spark, tables,
                limiter=RateLimiter(tokens_per_minute=600, bucket_size=60),
                dim=args.dim,
            )
            port = api.start(port=args.port)
            print(f"chessmate-spark API listening on :{port}", flush=True)
            try:
                while True:
                    import time as _time

                    _time.sleep(3600)
            except KeyboardInterrupt:
                api.stop()
            return 0
        if args.question is None:
            print("Error: question required without --serve", file=sys.stderr)
            return 1
        payload = answer_question(
            spark,
            tables,
            args.question,
            limit=args.limit,
            offset=args.offset,
            dim=args.dim,
        )
    except (ServingError, OSError) as exc:
        print(f"Error: {exc}", file=sys.stderr)
        return 1
    finally:
        if own_session:
            spark.stop()
    if args.json:
        print(json.dumps(payload))
    else:
        print(format_response_text(payload))
    return 0


if __name__ == "__main__":
    sys.exit(main())
