"""Structured Streaming pipelines: the reference's micro-batch queue worker
(Q1-Q4, embedding_worker.ml:95-156) and late-data event aggregation, as real
``readStream``/``writeStream`` programs.

Two streams:

* **Embedding worker** — the jobs/positions pipeline as a checkpointed file
  stream.  ``positions`` is an append-only table (new parquet files land as
  ingest batches commit); the stream picks up exactly the new files, embeds
  each FEN through the engine's deterministic V5 hash, and appends
  ``(vector_id, embedding, …)`` rows to ``position_vectors``.  Exactly-once
  comes from the checkpoint (file-source offsets are committed atomically
  with the sink epoch) plus content-hash ids (vector_id = md5(fen), F14) —
  replays overwrite the same logical row, the same idempotency argument the
  reference makes for SKIP LOCKED + attempts (repo_postgres_caqti.ml:414-434).
  ``Trigger.AvailableNow`` reproduces the worker's ``--exit-after-empty``
  drain loop; a processing-time trigger turns the same program into the
  long-running daemon.

* **Windowed event counts** — watermark + tumbling-window aggregation over
  the ``events`` table (A7's fixed-interval counts generalized to event-time
  windows with late-data semantics the reference never had).  Append output
  mode: a window row is emitted once, when the watermark passes its end —
  late rows inside the watermark still count; older ones are dropped.

At 100 TB the same code runs unchanged: the file source lists only new
files per batch (``maxFilesPerTrigger`` bounds batch width), state for the
window agg is per-(window, event_type) — small and bounded by the watermark
horizon — and every transformation here is a JVM-side expression.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.embedding import v5_fen_embedding_column

POSITIONS_DDL = (
    "id long, game_id long, ply int, move_number int, side_to_move string,"
    " fen string, san string"
)

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def embed_positions(batch: DataFrame, dim: int = 16) -> DataFrame:
    """positions → position_vectors rows (V5 embedding, content-hash id).

    Pure column expressions — reused identically by the batch drain
    (streaming/jobs.py) and the stream below; one definition, two triggers.
    """
    return batch.select(
        F.md5(F.col("fen")).alias("vector_id"),
        v5_fen_embedding_column(dim).alias("embedding"),
        F.col("game_id"),
        F.col("id").alias("position_id"),
        "ply",
        "san",
        "side_to_move",
        "fen",
    )


def run_embedding_stream(
    spark: SparkSession,
    positions_path: str,
    vectors_path: str,
    checkpoint_path: str,
    dim: int = 16,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
) -> StreamingQuery:
    """The embedding worker as a Structured Streaming job over the
    append-only positions table.  Returns the started query; callers
    ``awaitTermination()`` (availableNow) or manage the daemon lifecycle."""
    reader = spark.readStream.schema(POSITIONS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    positions = reader.parquet(positions_path)

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        # foreachBatch: the Q2 "complete" transition is implicit — a
        # position is vectorized iff its row exists in the sink, which Q6
        # (prune_stale_jobs) and the hybrid read path join on.
        embed_positions(batch, dim).write.mode("append").parquet(vectors_path)

    writer = (
        positions.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="2 seconds")
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "20 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (streaming A7);
    pass ``slide_duration`` < ``window_duration`` for the HOPPING form
    (a26's batch twin): each event expands into duration/slide windows
    before the same partial+final aggregation.

    Works on both a streaming and a batch DataFrame (the batch form is the
    oracle: same expressions, no watermark pruning)."""
    with_mark = (
        events.withWatermark("ts", watermark_delay)
        if events.isStreaming
        else events
    )
    win = (
        F.window("ts", window_duration, slide_duration)
        if slide_duration
        else F.window("ts", window_duration)
    )
    return (
        with_mark.groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            # decimal-exact accumulation → cast double: bit-identical result
            # regardless of partition/accumulation order (oracle parity)
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


def run_windowed_events_stream(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    window_duration: str = "10 minutes",
    watermark_delay: str = "20 minutes",
    slide_duration: str | None = None,
) -> StreamingQuery:
    """File-source → watermarked window agg → append-mode parquet sink.

    Append mode emits each window exactly once, after the watermark passes
    its end — the late-data contract the brief's streaming section asks
    for.  With ``slide_duration`` set, the same contract holds per HOPPING
    window (each emitted once, at its own close)."""
    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    agg = windowed_event_counts(
        events, window_duration, watermark_delay, slide_duration
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def dedup_events(
    events: DataFrame,
    key_cols: tuple = ("event_id",),
    watermark_delay: str = "20 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact-dedup twin of operators/dedup.exact_duplicates:
    keep the first occurrence of each key, drop repeats whose event time
    falls within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark window — O(distinct keys per horizon), not O(all keys ever)
    — which is what makes exactly-once ingest dedup viable on an
    unbounded 100 TB/day stream.  On a batch frame it degrades to plain
    dropDuplicates (the oracle form).
    """
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark_delay
        ).dropDuplicatesWithinWatermark(list(key_cols))
    # Batch twin: plain dropDuplicates keeps an ARBITRARY row per key,
    # which can disagree with the stream's first-arriving row on non-key
    # payload columns.  Pick deterministically instead: earliest event
    # time per key (the batch analogue of "first-arriving"), with a
    # stable full-row hash tiebreak so same-timestamp duplicates don't
    # reintroduce nondeterminism.
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(ts_col).asc_nulls_last(),
        F.xxhash64(F.struct(*[F.col(c) for c in events.columns])),
    )
    return (
        events.withColumn("_cm_rn", F.row_number().over(w))
        .filter(F.col("_cm_rn") == 1)
        .drop("_cm_rn")
    )


def run_dedup_stream(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    key_cols: tuple = ("event_id",),
    watermark_delay: str = "20 minutes",
) -> StreamingQuery:
    """File-source → watermark-bounded dedup → append parquet sink."""
    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    deduped = dedup_events(events, key_cols, watermark_delay)
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


HH_SCHEMA = "user_id long, event_count long"


def heavy_hitters_batch(events: DataFrame, k: int = 20) -> DataFrame:
    """Batch twin of the stateful heavy-hitter stream: top-k users by
    event count, deterministic tiebreak on user_id."""
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .orderBy(F.desc("event_count"), F.asc("user_id"))
        .limit(k)
    )


def run_heavy_hitters_stream(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Stateful running per-user event counts: GroupState holds one
    counter per user, updated each micro-batch and emitted with the batch
    (update-style over an append sink — the LATEST row per user wins).

    State size is O(distinct users), independent of event volume, and the
    counters survive restarts through the checkpoint — draining the same
    source twice continues the counts instead of restarting them.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        new_rows = sum(len(p) for p in pdfs)
        if state.exists:
            (count,) = state.get
        else:
            count = 0
        count += new_rows
        state.update((count,))
        yield pd.DataFrame({"user_id": [user_id], "event_count": [count]})

    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    counts = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=HH_SCHEMA,
        stateStructType="count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_heavy_hitters(spark: SparkSession, output_path: str) -> DataFrame:
    """Read contract for the exact heavy-hitter sink: the stream appends
    one row per (user, micro-batch) — running counts, so the LATEST (=
    maximum, counts are monotone) row per user is the current state.  A
    naive read of the sink double-counts; consumers go through this
    helper (or replicate its max-per-user) instead."""
    raw = spark.read.schema(HH_SCHEMA).parquet(output_path)
    return raw.groupBy("user_id").agg(
        F.max("event_count").alias("event_count")
    )


HH_SKETCH_SCHEMA = "bucket long, user_id long, est_count long, emit_seq long"


def run_heavy_hitters_sketch_stream(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    n_buckets: int = 64,
    capacity: int = 256,
) -> StreamingQuery:
    """Bounded-state twin of ``run_heavy_hitters_stream``: Misra-Gries
    summaries (operators/sketch.py) keyed by ``hash(user) % n_buckets``
    instead of per-user GroupState.

    State is O(n_buckets x capacity) TOTAL — independent of distinct
    users — which is what caps the exact stream's O(distinct users)
    state at the billions-of-users regime.  Every user with true count
    > N/(capacity) per bucket stream is guaranteed present (module
    docstring of operators/sketch.py); with ≤ capacity distinct users
    per bucket the summaries are exact, which is how the tests pin the
    twin against the exact batch top-k.

    Each micro-batch a bucket emits its FULL current summary stamped
    with (bucket, emit_seq); ``read_heavy_hitters_sketch`` keeps only
    each bucket's final emit, so earlier (stale) snapshots can never
    double-count — the read contract the exact sink lacked until
    ``read_heavy_hitters``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.sketch import _mg_trim

    def update(key, pdfs, state: GroupState):
        (bucket,) = key
        if state.exists:
            keys, counts, seq = state.get
            s = pd.Series(
                pd.array(counts, dtype="int64"),
                index=pd.Index(keys, dtype="int64"),
            )
        else:
            s, seq = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            s = s.add(pdf["user_id"].value_counts(), fill_value=0)
            s = _mg_trim(s, capacity)
        seq += 1
        state.update(
            (
                [int(i) for i in s.index],
                [int(c) for c in s.to_numpy()],
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "user_id": s.index.to_numpy("int64"),
                "est_count": s.to_numpy("int64"),
                "emit_seq": seq,
            }
        )

    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    bucketed = events.withColumn(
        "_bkt", F.pmod(F.xxhash64(F.col("user_id")), F.lit(n_buckets))
    )
    counts = bucketed.groupBy("_bkt").applyInPandasWithState(
        update,
        outputStructType=HH_SKETCH_SCHEMA,
        stateStructType="keys array<long>, counts array<long>, seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_heavy_hitters_sketch(
    spark: SparkSession, output_path: str, k: int = 20
) -> DataFrame:
    """Final top-k from the sketch sink: keep each bucket's LAST emitted
    summary (max emit_seq per bucket — a user lives in exactly one
    bucket, so this is the current global summary), then top-k."""
    raw = spark.read.schema(HH_SKETCH_SCHEMA).parquet(output_path)
    latest = raw.groupBy("bucket").agg(F.max("emit_seq").alias("emit_seq"))
    return (
        raw.join(F.broadcast(latest), ["bucket", "emit_seq"])
        .select("user_id", F.col("est_count").alias("event_count"))
        .orderBy(F.desc("event_count"), F.asc("user_id"))
        .limit(k)
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "120 minutes",
    watermark_delay: str = "20 minutes",
) -> DataFrame:
    """Native ``session_window`` sessionization (a20's operator): per-user
    gap-merged sessions with start / last-event-time / event count.

    Works identically on a batch frame and a watermarked stream — this is
    the one sessionization form Structured Streaming executes
    incrementally (MergingSessions + watermark state eviction), which the
    lag/cumsum form (sessions.sessionize_batch) cannot.  ``session_end``
    reports the true last-event time (session_window's end = last + gap,
    so the gap is subtracted back).
    """
    src = events.withWatermark("ts", watermark_delay) if events.isStreaming else events
    grouped = src.groupBy(
        "user_id", F.session_window("ts", gap).alias("sw")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return grouped.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        (F.col("sw.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
        "n_events",
    )


def run_session_window_stream(
    spark: SparkSession,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    gap: str = "30 minutes",
    watermark_delay: str = "5 minutes",
) -> StreamingQuery:
    """File-source → watermarked session_window agg → append parquet sink.

    Append mode emits each session exactly once, after the watermark
    passes session end + gap (no more events can merge into it) — the
    incremental-execution proof for the a20 batch entry.  State per open
    session is one (start, end, count) triple, evicted at finalization.
    """
    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    agg = session_window_counts(events, gap, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """The per-event-type moments dim the z-score scorer joins against —
    computed from a HISTORIC batch (yesterday's events), one partial+final
    aggregation; a27_zscore_outliers builds the identical dim."""
    return events.groupBy("event_type").agg(
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("sd"),
    )


def zscore_outliers_stream(
    events: DataFrame, stats: DataFrame, threshold: float = 3.0
) -> DataFrame:
    """Streaming anomaly scoring: STREAM-STATIC broadcast join of live
    events against a precomputed moments dim, |z| > threshold filter —
    the online twin of a27_zscore_outliers (identical expressions, so
    replaying the batch through the stream with the batch's own stats
    yields the batch answer row-for-row).

    Stateless: no watermark, no GroupState — each micro-batch is enriched
    via a broadcast hash join and filtered in place, so the operator
    scales with per-trigger volume only.  The static side is re-read per
    micro-batch by Structured Streaming's stream-static join contract;
    at production scale it's a small parquet dim refreshed by the batch
    job (the classic lambda handoff)."""
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > F.lit(threshold))
        .select(
            "event_id",
            "event_type",
            "ts",
            F.col("value"),
            (z).alias("zscore"),
        )
    )


def run_zscore_stream(
    spark: SparkSession,
    events_path: str,
    stats: DataFrame,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 3.0,
) -> StreamingQuery:
    """File-source → stream-static broadcast enrichment → append parquet
    sink.  Append mode with no aggregation: each anomalous event emits
    exactly once, in the drain that reads its file."""
    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    scored = zscore_outliers_stream(events, stats, threshold)
    return (
        scored.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
