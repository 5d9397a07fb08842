"""Embedding-jobs queue pipeline (Q1-Q7): the reference's micro-batch worker
re-expressed as deterministic batch iterations.

Reference semantics (SURVEY §2.9 / §3.3): claim oldest-first batches of
pending jobs (Q1, ``FOR UPDATE SKIP LOCKED`` is moot under a single logical
writer — idempotency comes from the deterministic vector_id = md5(fen), F14),
embed each FEN (V5 deterministic embedding), build the denormalized payload
row (J2 4-way join), append to ``position_vectors`` (S7), and transition job
status (Q2/Q3).  ``Trigger.AvailableNow`` semantics: iterate until the
pending set is empty.

On a production deployment the same functions run inside a Structured
Streaming ``foreachBatch`` over a Delta jobs table; the claim/transition
steps become ``MERGE INTO`` on the job keys, which is exactly-once because
vector ids are content hashes (re-processing a job overwrites the same row).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.embedding import v5_fen_embedding_column

VECTOR_DIM_DEFAULT = 16


@dataclass
class JobsState:
    jobs: DataFrame
    position_vectors: Optional[DataFrame] = None
    batches_run: int = 0


def claim_batch(jobs: DataFrame, batch_size: int) -> DataFrame:
    """Q1: oldest-first deterministic claim of pending jobs.

    DETERMINISM CONTRACT: drain_jobs re-reads lazily-checkpointed frames
    derived from this claim; the total order (enqueued_seq, id) is what
    guarantees every re-computation selects the SAME batch.  Any future
    claim strategy that is not a pure deterministic function of ``jobs``
    (sampling, rand-tiebreaks, time-based cuts) must flip the drain loop's
    ``claimed`` checkpoint to eager=True or batches can silently diverge
    between consumers.
    """
    return (
        jobs.filter(F.col("status") == "pending")
        .orderBy(F.col("enqueued_seq").asc(), F.col("id").asc())
        .limit(batch_size)
    )


# lookup-side projections, hoisted for the same reason as _payload_columns:
# name-based immutable trees, rebuilt per drain iteration otherwise.
# Built lazily (not at module scope) because Column construction needs an
# active SparkContext; keyed on the active context's identity so a
# stopped-and-relaunched JVM rebuilds the trees instead of serving dead
# gateway references (round-14 ADVICE — see embedding.active_context_key).
@lru_cache(maxsize=2)
def _lookup_columns_for(ctx_key: int) -> Tuple:
    pos = (
        F.col("id").alias("position_id"), F.col("game_id"), F.col("ply"),
        F.col("san"), F.col("side_to_move"), F.col("tags").alias("_pos_tags"),
    )
    gm = (
        F.col("id").alias("game_id"), F.col("opening_slug"),
        F.col("opening_name"), F.col("eco_code").alias("eco"), F.col("result"),
        F.col("white_rating").alias("white_elo"),
        F.col("black_rating").alias("black_elo"),
        F.col("white_player_id"), F.col("black_player_id"),
    )
    white = (F.col("id").alias("_wid"), F.col("name").alias("white"))
    black = (F.col("id").alias("_bid"), F.col("name").alias("black"))
    return pos, gm, white, black


def _lookup_columns() -> Tuple:
    from ..functions.embedding import active_context_key

    return _lookup_columns_for(active_context_key())


@lru_cache(maxsize=8)
def _payload_columns_for(dim: int, ctx_key: int) -> Tuple:
    """The payload projection's Column trees, cached per (dim, active
    SparkContext): all are name-based unresolved expressions (no frame
    reference), so one set is shared across every drain iteration within
    the JVM that built it (round-14 ADVICE — a restarted context must
    rebuild, see embedding.active_context_key).  Rebuilding them each
    call cost ~0.35 s of pure Py4J driver time per batch (the embedding
    lambda alone is O(dim) calls) — measured round 14 on the fixture
    drain."""
    tags_schema = "phases array<string>, themes array<string>, keywords array<string>"
    parsed_tags = F.from_json(F.col("_pos_tags"), tags_schema)
    arr = lambda field: F.coalesce(parsed_tags[field], F.array().cast("array<string>"))
    return (
        F.md5(F.col("fen")).alias("vector_id"),
        v5_fen_embedding_column(dim).alias("embedding"),
        F.col("game_id"), F.col("position_id"), F.col("ply"),
        arr("phases").alias("phases"),
        arr("themes").alias("themes"),
        arr("keywords").alias("keywords"),
        F.col("san"), F.col("side_to_move"), F.col("opening_slug"),
        F.col("opening_name"), F.col("eco"), F.col("result"),
        F.col("white_elo"), F.col("black_elo"), F.col("white"),
        F.col("black"), F.col("fen"),
    )


def build_payload(
    claimed: DataFrame,
    positions: DataFrame,
    games: DataFrame,
    players: DataFrame,
    dim: int = VECTOR_DIM_DEFAULT,
) -> DataFrame:
    """J2 + V5: jobs ⋈ positions ⋈ games ⟕ players×2 + embedding columns.

    The FEN is embedded through the engine's deterministic V5 hash over its
    whitespace tokens — reproducible without any external service
    (query_embedding_provider.ml:19-42 fallback path, promoted to default).
    """
    pos_cols, gm_cols, white_cols, black_cols = _lookup_columns()
    pos = positions.select(*pos_cols)
    gm = games.select(*gm_cols)
    white = players.select(*white_cols)
    black = players.select(*black_cols)
    joined = (
        claimed.select("position_id", "fen")
        .join(pos, "position_id")
        .join(F.broadcast(gm), "game_id", "left")
        .join(F.broadcast(white), F.col("white_player_id") == F.col("_wid"), "left")
        .join(F.broadcast(black), F.col("black_player_id") == F.col("_bid"), "left")
        .drop("_wid", "_bid", "white_player_id", "black_player_id")
    )
    from ..functions.embedding import active_context_key

    return joined.select(*_payload_columns_for(dim, active_context_key()))


def apply_transitions(
    jobs: DataFrame, claimed: DataFrame, failed_ids: Optional[DataFrame] = None
) -> DataFrame:
    """Q2/Q3: claimed jobs → completed (or failed), attempts += 1."""
    done = claimed.select(F.col("id").alias("_done_id"))
    jobs = (
        jobs.join(F.broadcast(done), jobs["id"] == done["_done_id"], "left")
        .withColumn(
            "status",
            F.when(F.col("_done_id").isNotNull(), F.lit("completed")).otherwise(
                F.col("status")
            ),
        )
        .withColumn(
            "attempts",
            F.when(F.col("_done_id").isNotNull(), F.col("attempts") + 1).otherwise(
                F.col("attempts")
            ),
        )
        .drop("_done_id")
    )
    return jobs


def drain_jobs(
    state: JobsState,
    positions: DataFrame,
    games: DataFrame,
    players: DataFrame,
    batch_size: int = 16,
    dim: int = VECTOR_DIM_DEFAULT,
    max_batches: int = 10_000,
) -> JobsState:
    """Q4 availableNow loop: claim → embed → payload → append → transition,
    until the pending queue is empty."""
    # Each iteration derives jobs_{i+1} from jobs_i by a join; without
    # truncation the logical plan nests one join per batch and Catalyst
    # re-analysis grows exponentially (observed: batch 5 planning 30x batch
    # 1).  localCheckpoint cuts the lineage each step — the micro-batch
    # state handoff that a Delta MERGE gives for free in production.
    # lazy checkpoints: the truncation that stops plan nesting comes from
    # the checkpoint NODE, not from eager materialization.  The take(1)
    # probe (plus the checkpoint's own missing-partition job) materializes
    # the claim each iteration; payload/jobs checkpoints defer their
    # materialization to the downstream consumers instead of paying a
    # blocking job here — fewer, later jobs, not literally one
    jobs = state.jobs.localCheckpoint(eager=False)
    # the three payload lookup sides are re-joined EVERY iteration; without
    # their own truncation each build_payload re-analyzes the full upstream
    # lineage (for PGN ingest: the whole mapInPandas parse chain) once per
    # batch — measured ~0.5 s of pure driver planning per iteration on the
    # fixture drain (round 14).  Lazy checkpoints materialize on first use
    # inside batch 1 and every later batch plans against a checkpoint leaf.
    positions = positions.localCheckpoint(eager=False)
    games = games.localCheckpoint(eager=False)
    players = players.localCheckpoint(eager=False)
    vectors = state.position_vectors
    batches = state.batches_run
    while batches < max_batches:
        # eager=True for `claimed` only: it fans out to three consumers
        # (the emptiness probe, build_payload, apply_transitions), so a
        # single blocking materialization pins one authoritative batch —
        # correctness no longer leans on claim_batch's determinism
        # contract.  The other checkpoints stay lazy (single-consumer).
        claimed = claim_batch(jobs, batch_size).localCheckpoint(eager=True)
        if not claimed.take(1):
            break
        payload = build_payload(claimed, positions, games, players, dim)
        batch_vectors = payload.localCheckpoint(eager=False)
        vectors = (
            batch_vectors if vectors is None else vectors.unionByName(batch_vectors)
        )
        jobs = apply_transitions(jobs, claimed).localCheckpoint(eager=False)
        batches += 1
    # propagate vector ids into positions happens at read time via join Q6
    return JobsState(jobs=jobs, position_vectors=vectors, batches_run=batches)


def prune_stale_jobs(jobs: DataFrame, position_vectors: DataFrame) -> DataFrame:
    """Q6: mark pending jobs completed when their position already has a
    vector (re-ingest hygiene, prune_pending_jobs.sh:29-44)."""
    vectored = position_vectors.select(
        F.col("position_id").alias("_vpos")
    ).distinct()
    return (
        jobs.join(F.broadcast(vectored), jobs["position_id"] == F.col("_vpos"), "left")
        .withColumn(
            "status",
            F.when(
                (F.col("status") == "pending") & F.col("_vpos").isNotNull(),
                F.lit("completed"),
            ).otherwise(F.col("status")),
        )
        .drop("_vpos")
    )
