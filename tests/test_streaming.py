"""Structured Streaming tests: checkpointed exactly-once embedding stream,
watermarked windowed aggregation with late-data semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from chessmate_spark.streaming.structured import (
    EVENTS_DDL,
    POSITIONS_DDL,
    embed_positions,
    run_embedding_stream,
    run_windowed_events_stream,
    windowed_event_counts,
)


def _positions_rows(start_id, n):
    return [
        (
            start_id + i,
            100 + (start_id + i) % 3,
            i + 1,
            (i // 2) + 1,
            "w" if i % 2 == 0 else "b",
            f"8/8/8/8/8/8/8/K{start_id + i}k w - - 0 1",
            "e4",
        )
        for i in range(n)
    ]


def test_embedding_stream_exactly_once(spark, tmp_path):
    pos_dir = str(tmp_path / "positions")
    vec_dir = str(tmp_path / "vectors")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(_positions_rows(0, 6), POSITIONS_DDL).write.mode(
        "append"
    ).parquet(pos_dir)
    q = run_embedding_stream(spark, pos_dir, vec_dir, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(vec_dir)
    assert first.count() == 6

    # second batch of files: only the NEW files are processed on restart
    spark.createDataFrame(_positions_rows(6, 4), POSITIONS_DDL).write.mode(
        "append"
    ).parquet(pos_dir)
    q = run_embedding_stream(spark, pos_dir, vec_dir, ckpt)
    q.awaitTermination()
    vectors = spark.read.parquet(vec_dir)
    assert vectors.count() == 10
    # no duplicate processing: content-hash ids are unique per position here
    assert vectors.select("vector_id").distinct().count() == 10


def test_embed_positions_matches_batch_drain_shape(spark):
    batch = spark.createDataFrame(_positions_rows(0, 3), POSITIONS_DDL)
    out = embed_positions(batch, dim=16)
    rows = out.collect()
    assert {len(r["embedding"]) for r in rows} == {16}
    assert all(len(r["vector_id"]) == 32 for r in rows)


def _event(eid, minute, etype="click", value=1.0, second=0):
    return (
        eid,
        dt.datetime(2024, 1, 1, 0, minute, second),
        7,
        etype,
        value,
        "{}",
    )


def test_windowed_stream_append_and_late_data(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        _event(0, 1),
        _event(1, 5),
        _event(2, 12),
        _event(3, 31),  # advances watermark to 00:26 (delay 5m)
    ]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_windowed_events_stream(
        spark, ev_dir, out_dir, ckpt,
        window_duration="10 minutes", watermark_delay="5 minutes",
    )
    q.awaitTermination()
    emitted = {
        (r["window_start"].minute, r["event_count"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # windows [00:00,00:10) and [00:10,00:20) are final; [00:30,...) is open
    assert (0, 2) in emitted
    assert (10, 1) in emitted
    assert not any(start == 30 for start, _ in emitted)

    # batch 2: one too-late row (window long closed — dropped) and one new
    # row advancing the watermark past the 00:30 window
    batch2 = [
        _event(4, 3),   # late beyond watermark: ignored
        _event(5, 46),  # watermark → 00:41, closes [00:30,00:40)
    ]
    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_windowed_events_stream(
        spark, ev_dir, out_dir, ckpt,
        window_duration="10 minutes", watermark_delay="5 minutes",
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    by_start = {}
    for r in rows:
        by_start.setdefault(r["window_start"].minute, 0)
        by_start[r["window_start"].minute] += r["event_count"]
    # closed window unchanged (late row dropped), 00:30 window now emitted
    assert by_start[0] == 2
    assert by_start[30] == 1


def test_windowed_counts_batch_oracle(spark):
    events = spark.createDataFrame(
        [_event(0, 1), _event(1, 5, "view"), _event(2, 12)], EVENTS_DDL
    )
    rows = {
        (r["window_start"].minute, r["event_type"]): r["event_count"]
        for r in windowed_event_counts(events).collect()
    }
    assert rows[(0, "click")] == 1
    assert rows[(0, "view")] == 1
    assert rows[(10, "click")] == 1


def test_dedup_stream_drops_repeats_within_watermark(spark, tmp_path):
    from chessmate_spark.streaming.structured import run_dedup_stream

    ev_dir = str(tmp_path / "dd_events")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")

    batch1 = [
        _event(1, 1),
        _event(1, 2),   # same key, later time: dropped
        _event(2, 3),
        _event(3, 5),
    ]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_dedup_stream(spark, ev_dir, out_dir, ckpt, watermark_delay="20 minutes")
    q.awaitTermination()
    ids = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert ids == [1, 2, 3]

    # next micro-batch: a repeat of key 1 within the watermark horizon is
    # suppressed by checkpointed state; a fresh key passes
    batch2 = [_event(1, 6), _event(4, 7)]
    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_dedup_stream(spark, ev_dir, out_dir, ckpt, watermark_delay="20 minutes")
    q.awaitTermination()
    ids = sorted(r["event_id"] for r in spark.read.parquet(out_dir).collect())
    assert ids == [1, 2, 3, 4]


def test_dedup_batch_form_matches_dropduplicates(spark):
    from chessmate_spark.streaming.structured import dedup_events

    df = spark.createDataFrame(
        [_event(1, 1), _event(1, 2), _event(2, 3)], EVENTS_DDL
    )
    assert dedup_events(df).count() == 2


def test_dedup_batch_form_keeps_earliest_row_per_key(spark):
    """The batch twin must agree with the stream's first-arriving rule on
    payload columns, not keep an arbitrary row (ADVICE round-4): earliest
    ts wins, deterministically."""
    from chessmate_spark.streaming.structured import dedup_events

    df = spark.createDataFrame(
        [
            _event(1, 5, etype="late", value=9.0),
            _event(1, 1, etype="first", value=1.0),
            _event(2, 3, etype="only", value=2.0),
        ],
        EVENTS_DDL,
    )
    rows = {r["event_id"]: r for r in dedup_events(df).collect()}
    assert rows[1]["event_type"] == "first" and rows[1]["value"] == 1.0
    assert rows[2]["event_type"] == "only"


def test_heavy_hitter_state_survives_restart(spark, tmp_path):
    from chessmate_spark.streaming.structured import run_heavy_hitters_stream

    ev_dir = str(tmp_path / "hh_events")
    out_dir = str(tmp_path / "hh_out")
    ckpt = str(tmp_path / "hh_ckpt")

    def write(rows):
        spark.createDataFrame(rows, EVENTS_DDL).write.mode("append").parquet(ev_dir)

    def latest_counts():
        # the sink's documented read contract: one row per user
        from chessmate_spark.streaming.structured import read_heavy_hitters

        return {
            r["user_id"]: r["event_count"]
            for r in read_heavy_hitters(spark, out_dir).collect()
        }

    write([_event(i, 1) for i in range(3)])          # user 7 x3
    q = run_heavy_hitters_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    assert latest_counts() == {7: 3}

    # second drain: checkpointed GroupState continues the count
    write([_event(10 + i, 2) for i in range(2)])     # user 7 x2 more
    q = run_heavy_hitters_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    assert latest_counts() == {7: 5}


def test_heavy_hitters_batch_topk(spark):
    from chessmate_spark.streaming.structured import heavy_hitters_batch

    rows = []
    for uid, n in ((1, 5), (2, 3), (3, 3), (4, 1)):
        for j in range(n):
            rows.append((len(rows), dt.datetime(2024, 1, 1, 0, j), uid,
                         "click", 1.0, "{}"))
    df = spark.createDataFrame(rows, EVENTS_DDL)
    got = [(r["user_id"], r["event_count"])
           for r in heavy_hitters_batch(df, k=3).collect()]
    assert got == [(1, 5), (2, 3), (3, 3)]
