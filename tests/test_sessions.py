"""Gap-sessionization tests: batch lag/cumsum form + the
applyInPandasWithState streaming form (emit-on-watermark-close)."""

import datetime as dt

from chessmate_spark.streaming.sessions import sessionize_batch, sessionize_stream

EVENT_DDL = "event_id long, ts timestamp, user_id long"


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(
        minutes=minute, seconds=second
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, EVENT_DDL)


def test_batch_sessionization_gap_splits(spark):
    rows = [
        (1, _ts(0), 7),
        (2, _ts(5), 7),       # same session (gap 5 < 30)
        (3, _ts(50), 7),      # new session (gap 45 > 30)
        (4, _ts(0), 8),       # other user independent
    ]
    out = sessionize_batch(_events(spark, rows), gap_minutes=30).collect()
    got = [(r.user_id, r.session_no, r.n_events) for r in out]
    assert got == [(7, 1, 2), (7, 2, 1), (8, 1, 1)]
    assert out[0].session_start == _ts(0)
    assert out[0].session_end == _ts(5)


def test_batch_sessionization_boundary_is_strict_gap(spark):
    # exactly 30 minutes apart -> SAME session (strictly-greater splits)
    rows = [(1, _ts(0), 7), (2, _ts(30), 7), (3, _ts(60, 1), 7)]
    out = sessionize_batch(_events(spark, rows), gap_minutes=30).collect()
    assert [(r.session_no, r.n_events) for r in out] == [(1, 2), (2, 1)]


def test_stream_emits_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "events")
    sink = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: a burst for user 7 at 10:00-10:05
    _events(spark, [(1, _ts(0), 7), (2, _ts(5), 7)]).coalesce(1).write.mode("append").parquet(src)
    # batch 2 (separate file): user 7 again two hours later + a late-ish
    # user-8 event; advances the watermark far past the first session
    _events(spark, [(3, _ts(120), 7), (4, _ts(121), 8)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.schema(EVENT_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in spark.read.parquet(sink).collect()
    }
    # the 10:00-10:05 session closed (watermark reached ~12:00); the 12:00
    # sessions are still open in state and must NOT have been emitted
    assert emitted == {(7, 2, _ts(0), _ts(5))}


def test_stream_state_is_one_tuple_per_user(spark, tmp_path):
    # many events, one user: state stays a single open-session tuple and
    # every gap break inside a batch emits immediately
    src = str(tmp_path / "events")
    sink = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, _ts(i * 45), 7) for i in range(4)]  # every 45 min > 30 gap
    _events(spark, rows).coalesce(1).write.mode("append").parquet(src)
    _events(spark, [(99, _ts(400), 7)]).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EVENT_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(sink)
    # the first three 45-min-apart singles closed inside/after batch 1; the
    # 4th closed when batch 2's event advanced the watermark past its gap
    assert out.count() == 4
    assert out.agg({"n_events": "sum"}).collect()[0][0] == 4
