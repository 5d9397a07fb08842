"""Hybrid executor end-to-end: ingest fixtures → drain jobs → canonical
question → ranked results (SURVEY §3.1 pipeline; scoring expectations from
test_query.ml)."""

import pathlib

import pytest
from pyspark.sql import functions as F

from chessmate_spark.ingest import ingest_pgn_text
from chessmate_spark.plans.hybrid import HybridTables, execute, query_vector
from chessmate_spark.query import Request, analyse
from chessmate_spark.streaming import JobsState, drain_jobs

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

KID_PGN = """[Event "KID Match"]
[Site "Testville"]
[Date "2023.05.05"]
[White "Strong, Player"]
[Black "Weaker, Player"]
[Result "1-0"]
[WhiteElo "2600"]
[BlackElo "2520"]
[ECO "E62"]
[Opening "King's Indian Defense"]

1. d4 Nf6 2. c4 g6 3. Nc3 Bg7 4. e4 d6 5. Nf3 O-O 1-0
"""

LOWRATED_PGN = """[Event "Open B"]
[Site "Testville"]
[Date "2023.06.01"]
[White "Casual, One"]
[Black "Casual, Two"]
[Result "0-1"]
[WhiteElo "1900"]
[BlackElo "1890"]
[ECO "B20"]

1. e4 c5 2. Nf3 d6 0-1
"""


@pytest.fixture(scope="module")
def tables(spark):
    raw = KID_PGN + "\n" + LOWRATED_PGN
    ingest = ingest_pgn_text(spark, raw)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    return HybridTables(
        games=ingest.games, players=ingest.players,
        position_vectors=state.position_vectors,
    )


def test_canonical_question_filters_and_ranks(tables):
    plan = analyse(Request(
        text="Find top 3 King's Indian games where white is rated at least 2500"
    ))
    execution = execute(tables, plan, dim=8)
    rows = execution.results.collect()
    # only the KID game passes opening+rating filters
    assert execution.total == 1
    assert len(rows) == 1
    assert rows[0]["white"] == "Strong, Player"
    assert 0.0 <= rows[0]["total_score"] <= 1.0
    assert rows[0]["vector_score"] > 0.0
    assert not execution.has_more
    assert execution.warnings == []


def test_unfiltered_question_scores_everything(tables):
    plan = analyse(Request(text="show me games"))
    execution = execute(tables, plan, dim=8)
    rows = execution.results.collect()
    assert execution.total == 2
    assert len(rows) == 2
    # ranked by blended score descending
    scores = [r["total_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_degradation_without_vectors(tables):
    plan = analyse(Request(text="sicilian games"))
    no_vec = HybridTables(games=tables.games, players=tables.players)
    execution = execute(no_vec, plan, dim=8)
    assert execution.warnings and "fallback" in execution.warnings[0]
    rows = execution.results.collect()
    # fallback scoring path still answers (A5)
    assert len(rows) == 1
    assert rows[0]["vector_score"] > 0.0


def test_rating_mismatch_zeroes_vector_score(tables):
    plan = analyse(Request(text="games where white is rated at least 2550"))
    execution = execute(tables, plan, dim=8)
    # only KID white (2600) passes; the SQL filter removed the other game
    assert execution.total == 1


def test_pagination_has_more(tables):
    plan = analyse(Request(text="show me games", limit=1))
    execution = execute(tables, plan, dim=8)
    assert execution.total == 2
    assert execution.has_more


def test_query_vector_deterministic():
    plan = analyse(Request(text="kings indian endgame"))
    v1 = query_vector(plan, 8)
    v2 = query_vector(plan, 8)
    assert v1 == v2
    assert len(v1) == 8 and all(0.0 <= x <= 1.0 for x in v1)


# --- keyset deep-offset serving page (round-7 #7) ---


def _summaries_like(spark, n=200, null_every=7):
    """A frame with the serving page's sort columns: unique id, dates
    with a NULL tail (played_on DESC NULLS LAST, id DESC order)."""
    import datetime as dt

    rows = [
        (
            i,
            None
            if i % null_every == 0
            else dt.date(2020, 1, 1) + dt.timedelta(days=i % 23),
            f"g{i}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, played_on date, label string")


@pytest.mark.parametrize("offset", [0, 1, 37, 120, 199, 200, 500])
def test_keyset_page_identical_to_offset_page(spark, offset):
    from pyspark.sql import functions as F

    from chessmate_spark.operators.relational import paginate
    from chessmate_spark.plans.hybrid import _keyset_page

    df = _summaries_like(spark)
    order = [F.col("played_on").desc_nulls_last(), F.col("id").desc()]
    limit = 10
    via_offset = paginate(df, order, limit, offset).collect()
    via_keyset = _keyset_page(df, limit, offset).collect()
    assert via_keyset == via_offset


def test_execute_keyset_path_matches_offset_path(spark, tables):
    from chessmate_spark.plans.hybrid import execute
    from chessmate_spark.query.intent import Request, analyse

    plan = analyse(Request(text="games", limit=2, offset=1))
    by_offset = execute(tables, plan, dim=8, keyset_threshold=10**9)
    by_keyset = execute(tables, plan, dim=8, keyset_threshold=0)
    assert by_keyset.results.collect() == by_offset.results.collect()
    assert by_keyset.total == by_offset.total
    assert by_keyset.has_more == by_offset.has_more
