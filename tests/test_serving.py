"""Serving shim tests: answer_question + CLI replicate a README-shaped
query session end-to-end on fixture data (reference chessmate_api.ml
query_handler, search_command.ml rendering)."""

import json
from pathlib import Path

import pytest

from chessmate_spark.query import (
    ServingError,
    answer_question,
    format_response_text,
)

FIXTURES = Path(__file__).parent / "fixtures"

CANONICAL_QUESTION = (
    "Find King's Indian games where White is 2500 and Black is"
    " 100 points lower"
)


@pytest.fixture(scope="module")
def tables(spark):
    from chessmate_spark.ingest import ingest_pgn_text
    from chessmate_spark.plans.hybrid import HybridTables
    from chessmate_spark.plans.queries import _CHESS_FIXTURE
    from chessmate_spark.streaming import JobsState, drain_jobs

    ingest = ingest_pgn_text(spark, _CHESS_FIXTURE)
    state = drain_jobs(
        JobsState(jobs=ingest.embedding_jobs),
        ingest.positions, ingest.games, ingest.players,
        batch_size=8, dim=8,
    )
    return HybridTables(
        games=ingest.games, players=ingest.players,
        position_vectors=state.position_vectors,
    )


def test_canonical_question_payload(spark, tables):
    payload = answer_question(spark, tables, CANONICAL_QUESTION, dim=8)
    assert payload["question"] == CANONICAL_QUESTION
    assert payload["agent_status"] == "disabled"
    assert payload["total"] == 1
    assert payload["has_more"] is False
    assert payload["offset"] == 0
    assert payload["limit"] == 50
    # plan echo (chessmate_api.ml:386-414)
    plan = payload["plan"]
    assert {(f["field"], f["value"]) for f in plan["filters"]} == {
        ("eco_range", "E60-E99"),
        ("opening", "kings_indian_defense"),
    }
    assert plan["rating"]["max_rating_delta"] == 100
    # result document (chessmate_api.ml:77-115)
    (result,) = payload["results"]
    assert result["game_id"] == 2
    assert result["white"] == "Strong, Player"
    assert result["black"] == "Weaker, Player"
    assert result["year"] == 2023
    assert result["opening_name"] == "King's Indian Defense"
    assert result["eco"] == "E62"
    assert result["synopsis"] == (
        "Strong, Player vs Weaker, Player — KID Match (1-0)"
    )
    assert result["score"] == pytest.approx(0.81647, abs=1e-5)
    assert result["vector_score"] == pytest.approx(0.977516, abs=1e-5)
    assert result["keyword_score"] == pytest.approx(0.333333, abs=1e-5)
    assert result["agent_score"] is None
    assert result["agent_themes"] == []
    # summary (result_formatter.ml:8-16)
    assert payload["summary"] == (
        "#2 Strong, Player vs Weaker, Player (score 0.82)"
    )


def test_empty_result_summary_and_pagination(spark, tables):
    payload = answer_question(
        spark, tables, "games in the grunfeld defense", limit=5, offset=2,
        dim=8,
    )
    assert payload["limit"] == 5
    assert payload["offset"] == 2
    if not payload["results"]:
        assert payload["summary"] == (
            "No games matched the requested filters."
        )
    text = format_response_text(payload)
    assert "Limit: 5" in text and "Offset: 2" in text


def test_text_rendering_shape(spark, tables):
    payload = answer_question(spark, tables, CANONICAL_QUESTION, dim=8)
    text = format_response_text(payload)
    lines = text.splitlines()
    assert lines[0].startswith("Summary: #2 Strong, Player")
    assert "Total matches: 1" in lines
    assert "Has more: no" in lines
    assert "Agent status: disabled" in lines
    assert "Filters: eco_range=E60-E99, opening=kings_indian_defense" in lines
    assert "Ratings: max_rating_delta=100" in lines
    assert any(
        line.startswith(
            "1. #2 Strong, Player vs Weaker, Player"
            " [King's Indian Defense] score 0.82"
        )
        for line in lines
    )


@pytest.mark.parametrize(
    "kwargs,message",
    [
        ({"question": "   "}, "question parameter missing"),
        ({"question": "x", "limit": 0}, "limit must be >= 1"),
        ({"question": "x", "limit": 501}, "limit must be <= 500"),
        ({"question": "x", "offset": -1}, "offset must be >= 0"),
        ({"question": "x", "limit": "ten"}, "limit must be an integer"),
    ],
)
def test_request_validation_errors(spark, tables, kwargs, message):
    with pytest.raises(ServingError, match=message):
        answer_question(spark, tables, **kwargs)


def test_cli_json_session(spark, capsys):
    from chessmate_spark.query.__main__ import main

    rc = main(
        [
            "Show me games in the King's Indian Defense",
            "--pgn", str(FIXTURES / "sample_game.pgn"),
            "--pgn", str(FIXTURES / "extended_sample_game.pgn"),
            "--limit", "5",
            "--json",
        ],
        spark=spark,
    )
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert payload["limit"] == 5
    assert payload["agent_status"] == "disabled"
    assert isinstance(payload["results"], list)


def test_cli_rejects_bad_limit(spark, capsys):
    from chessmate_spark.query.__main__ import main

    rc = main(
        [
            "anything",
            "--pgn", str(FIXTURES / "sample_game.pgn"),
            "--limit", "0",
        ],
        spark=spark,
    )
    assert rc == 1
    assert "limit must be >= 1" in capsys.readouterr().err


def test_timings_channel(spark, tables):
    """The opt-in per-action timing channel (SERVE_BENCH's breakdown):
    all expected keys land, every value is a non-negative float, and
    omitting the dict changes nothing."""
    timings = {}
    payload = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, timings=timings
    )
    assert payload["total"] == 1
    # no count_returned_s: the serving path derives returned/has_more
    # from the collected page (round 11 — one fewer Spark action)
    assert set(timings) == {
        "analyse_s", "build_summaries_s", "count_total_s",
        "build_page_s", "collect_page_s", "format_s",
    }
    assert all(isinstance(v, float) and v >= 0 for v in timings.values())


def test_plan_cache_reuses_compiled_frames(spark, tables):
    """The serving warmth path (round 11): a caller-owned plan cache
    makes repeat requests skip driver-side plan construction (the
    build timings read 0.0 on the hit) while producing a payload
    identical to the uncached call — actions still run, results are
    never cached."""
    cache = {}
    cold = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == 1
    timings = {}
    warm = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache,
        timings=timings,
    )
    assert len(cache) == 1
    assert warm == cold
    assert timings["build_summaries_s"] == 0.0
    assert timings["build_page_s"] == 0.0
    uncached = answer_question(spark, tables, CANONICAL_QUESTION, dim=8)
    assert uncached == warm
    # a different question compiles (and caches) its own entry
    answer_question(spark, tables, "show me 3 games", dim=8,
                    plan_cache=cache)
    assert len(cache) == 2


def test_plan_cache_eviction_bound(spark, tables):
    """The cache never grows past PLAN_CACHE_MAX (oldest-first
    eviction) — checked structurally by pre-filling a full dict."""
    from chessmate_spark.plans.hybrid import PLAN_CACHE_MAX

    cache = {("sentinel", i): None for i in range(PLAN_CACHE_MAX)}
    answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == PLAN_CACHE_MAX
    assert ("sentinel", 0) not in cache  # oldest evicted


def test_plan_cache_warm_hit_skips_count_action(spark, tables):
    """Round 12 (verdict #5): under the immutable-snapshot contract the
    total for a plan key is invariant, so the warm path memoizes it and
    pays ONE Spark action (the page collect) — count_total_s reads 0.0
    on the hit and the payload stays identical."""
    cache = {}
    cold_t = {}
    cold = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache,
        timings=cold_t,
    )
    assert cold_t["count_total_s"] > 0.0
    warm_t = {}
    warm = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache,
        timings=warm_t,
    )
    assert warm_t["count_total_s"] == 0.0  # memoized, no action ran
    assert warm == cold


def test_plan_cache_snapshot_swap_misses(spark, tables):
    """Round 12 (verdict #3): the tables' identity is part of the cache
    key, so reusing one cache dict across DIFFERENT table snapshots
    compiles fresh lineages instead of silently serving stale ones."""
    from chessmate_spark.plans.hybrid import HybridTables

    cache = {}
    first = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == 1
    # a new snapshot: same data, DIFFERENT frame objects — plus a real
    # mutation (one game dropped) that a stale-lineage bug would hide
    swapped = HybridTables(
        games=tables.games.filter("id <> 2"),
        players=tables.players.select("*"),
        position_vectors=tables.position_vectors.select("*"),
    )
    second = answer_question(
        spark, swapped, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == 2  # fresh entry, not a stale hit
    assert first["total"] == 1 and second["total"] == 0


def test_plan_cache_entry_pins_frames_not_wrapper(spark, tables):
    """Round-13 ADVICE: HybridTables is MUTABLE, so a cache entry that
    pinned the wrapper would not pin the frames the id()-based key
    hashes — reassigning ``tables.games`` could free the old frame
    while its entry lived, and a new frame at the recycled address
    could stale-hit.  The entry now pins the frame triple itself:
    in-place mutation misses (fresh compile, fresh total), and the old
    entry's key frames stay referenced by the cache for the entry's
    whole lifetime."""
    import gc

    from chessmate_spark.plans.hybrid import HybridTables

    snap = HybridTables(
        games=tables.games.select("*"),
        players=tables.players.select("*"),
        position_vectors=tables.position_vectors.select("*"),
    )
    cache = {}
    first = answer_question(
        spark, snap, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == 1
    old_games_id = id(snap.games)
    # in-place mutation, the exact ADVICE hazard: the only external
    # reference to the old frame dies here — the cache entry's pin is
    # now what keeps its id from being recycled
    snap.games = tables.games.filter("id <> 2")
    gc.collect()
    pinned = {id(f) for entry in cache.values() for f in entry[0]}
    assert old_games_id in pinned, (
        "entry pins the wrapper, not the frames — GC can recycle the "
        "old frame's id while its key lives"
    )
    second = answer_question(
        spark, snap, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert len(cache) == 2  # the mutated snapshot MISSED
    assert first["total"] == 1 and second["total"] == 0


def test_plan_cache_degraded_compile_not_cached(spark, tables, monkeypatch):
    """Round 12 (verdict #3): a TRANSIENT vector_hits compile failure
    (the V7 degradation branch) must not freeze a degraded plan in the
    cache — the next request recompiles and serves the healthy plan."""
    from chessmate_spark.plans import hybrid as hy

    cache = {}
    real_vector_hits = hy.vector_hits
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient vector backend hiccup")
        return real_vector_hits(*args, **kwargs)

    monkeypatch.setattr(hy, "vector_hits", flaky)
    degraded = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert any("Vector search unavailable" in w
               for w in degraded.get("warnings", []))
    assert len(cache) == 0  # the degraded compile was NOT cached
    healthy = answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8, plan_cache=cache
    )
    assert "warnings" not in healthy
    assert len(cache) == 1
    assert healthy == answer_question(
        spark, tables, CANONICAL_QUESTION, dim=8
    )


# --- batch serving (round 8): N questions, one DataFrame program ---

BATCH_QUESTIONS = [
    CANONICAL_QUESTION,
    "Show me Sicilian games",
    "games won by white",
    "Find King's Indian games",
    "show me 3 games",
]


def test_batch_answer_payload_identical_to_sequential(spark, tables):
    """The verdict's correctness contract: batch_answer over a question
    set must be payload-identical to the per-question loop — same plan
    echo, same ordered result documents, same totals/has_more/summary/
    warnings per question."""
    from chessmate_spark.query import batch_answer

    sequential = [
        answer_question(spark, tables, q, dim=8) for q in BATCH_QUESTIONS
    ]
    batched = batch_answer(spark, tables, BATCH_QUESTIONS, dim=8)
    assert len(batched) == len(sequential)
    for got, want in zip(batched, sequential):
        assert got == want


def test_batch_answer_without_vectors_degrades_like_sequential(spark, tables):
    from chessmate_spark.plans.hybrid import HybridTables
    from chessmate_spark.query import batch_answer

    no_vec = HybridTables(
        games=tables.games, players=tables.players, position_vectors=None
    )
    qs = BATCH_QUESTIONS[:3]
    sequential = [answer_question(spark, no_vec, q, dim=8) for q in qs]
    batched = batch_answer(spark, no_vec, qs, dim=8)
    assert batched == sequential
    assert all("fallback" in b["warnings"][0] for b in batched)


def test_batch_answer_validates_each_question(spark, tables):
    from chessmate_spark.query import batch_answer

    with pytest.raises(ServingError, match="question parameter missing"):
        batch_answer(spark, tables, [CANONICAL_QUESTION, "   "], dim=8)
    assert batch_answer(spark, tables, [], dim=8) == []


def test_batch_answer_action_economy(spark, tables):
    """The reason batch serving exists: the whole batch runs in a
    CONSTANT number of Spark jobs (checkpoint, totals, collect — plus
    any AQE sub-jobs) regardless of N, while the sequential path pays
    four actions per question."""
    import json as _json
    import urllib.request

    from chessmate_spark.query import batch_answer

    ui = spark.sparkContext.uiWebUrl

    def n_jobs():
        # Max job id, not len(jobs): the UI store evicts past
        # spark.ui.retainedJobs (default 1000), so under a long-lived
        # session (full-suite run) list length saturates and deltas
        # read garbage. Job ids are monotonic and eviction-proof.
        app = _json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications")
        )[0]["id"]
        jobs = _json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/jobs"
            )
        )
        return max((j["jobId"] for j in jobs), default=0)

    batch_answer(spark, tables, BATCH_QUESTIONS, dim=8)  # warm (lazy inits)
    before = n_jobs()
    batch_answer(spark, tables, BATCH_QUESTIONS, dim=8)
    used_batch = n_jobs() - before
    before = n_jobs()
    for q in BATCH_QUESTIONS:
        answer_question(spark, tables, q, dim=8)
    used_seq = n_jobs() - before
    # 3 driver ACTIONS, but AQE materializes each exchange of the
    # union's branches as its own sub-job (measured ~31 for N=5,
    # without the per-action Py4J/scheduler round-trip the sequential
    # path pays ~42 actions/210 jobs for) — pin the relative economy,
    # which is what batching exists to buy
    assert used_batch * 3 <= used_seq, (used_batch, used_seq)


def test_batch_execute_handbuilt_plan_parity_edges(spark, tables):
    """Review-pass regressions: (a) filter values with non-space
    whitespace must normalize like Python str.strip() (F.trim only
    strips ASCII spaces); (b) an UNPARSEABLE vector_only value is
    ignored by compile_predicate and must be ignored by the batch
    precheck too, not raise."""
    from chessmate_spark.plans.hybrid import execute
    from chessmate_spark.plans.hybrid_batch import batch_execute
    from chessmate_spark.query.intent import (
        MetadataFilter,
        QueryPlan,
        RatingFilter,
        Request,
    )

    def plan(filters):
        return QueryPlan(
            original=Request(text="x"), cleaned_text="x",
            keywords=(), filters=tuple(filters),
            rating=RatingFilter(None, None, None), limit=10, offset=0,
        )

    plans = [
        plan([MetadataFilter("opening", "kings_indian_defense\t")]),
        plan([MetadataFilter("vector_only", "maybe")]),
    ]
    ex = batch_execute(tables, plans, dim=8)
    rows = ex.results.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["question_id"], set()).add(r["id"])
    for i, p in enumerate(plans):
        seq = execute(tables, p, dim=8)
        seq_ids = {r["id"] for r in seq.results.collect()}
        assert by_q.get(i, set()) == seq_ids, (i, by_q.get(i), seq_ids)
        assert ex.totals[i] == seq.total, (i, ex.totals[i], seq.total)
