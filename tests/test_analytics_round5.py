"""Round-5 analytics nets: incremental session_window streaming (the
execution-model proof behind the a20 batch entry), SCD2 interval
invariants, and funnel monotonicity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chessmate_spark.plans.queries import QUERIES
from chessmate_spark.streaming.structured import (
    EVENTS_DDL,
    run_session_window_stream,
    session_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _event(eid, minute, user=1):
    return (
        eid,
        BASE + dt.timedelta(minutes=minute),
        user,
        "view",
        1.0,
        "{}",
    )


def test_session_window_stream_emits_closed_sessions_incrementally(
    spark, tmp_path
):
    """Sessions finalize exactly once, when the watermark passes
    last-event + gap; open sessions stay unemitted across restarts."""
    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # session A: minutes 0 and 5 (gap 30 → ends 05:00); the minute-200
    # event advances the watermark (delay 5m) to 195 > 35, closing A.
    batch1 = [_event(0, 0), _event(1, 5), _event(2, 200)]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_session_window_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    (a,) = rows
    assert a["n_events"] == 2
    assert a["session_start"] == BASE
    assert a["session_end"] == BASE + dt.timedelta(minutes=5)

    # batch 2: minute-202 event MERGES into the open minute-200 session
    # (within gap); minute 400 closes it. Emitted session must contain
    # both events — proof the open-session state survived the restart.
    batch2 = [_event(3, 202), _event(4, 400)]
    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_session_window_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    rows = {r["session_start"].minute: r for r in spark.read.parquet(out_dir).collect()}
    assert rows[20]["n_events"] == 2  # minutes 200+202 merged (200 % 60 = 20)
    assert rows[20]["session_end"] == BASE + dt.timedelta(minutes=202)
    # session A not re-emitted
    assert len(rows) == 2


def test_session_window_stream_total_matches_batch_form(spark, tmp_path):
    """Union of incrementally emitted sessions == batch session_window
    over the full event set (for sessions the watermark has closed)."""
    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = [
        _event(i, m, user=u)
        for i, (u, m) in enumerate(
            [(1, 0), (1, 10), (1, 100), (2, 3), (2, 50), (1, 500), (2, 500)]
        )
    ]
    spark.createDataFrame(events, EVENTS_DDL).write.parquet(ev_dir)
    q = run_session_window_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = session_window_counts(
        spark.createDataFrame(events, EVENTS_DDL), gap="30 minutes"
    )
    # the minute-500 sessions are still open in the stream; everything
    # the watermark closed must match the batch result exactly
    closed_batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
        if r["session_start"] < BASE + dt.timedelta(minutes=500)
    }
    assert streamed == closed_batch


def test_scd2_intervals_partition_each_users_timeline(spark):
    """j11 invariants: versions are 1..n dense per user, valid_from is
    strictly increasing, each valid_to equals the NEXT valid_from
    (half-open intervals tile the timeline), exactly one open row per
    user, and consecutive rows never share a state."""
    df = QUERIES["j11_scd2_history"][0](spark, SF_DIR)
    rows = df.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, history in by_user.items():
        history.sort(key=lambda r: r["version"])
        assert [r["version"] for r in history] == list(
            range(1, len(history) + 1)
        )
        opens = [r for r in history if r["is_current"]]
        assert len(opens) == 1 and opens[0] is history[-1]
        for prev, nxt in zip(history, history[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["valid_from"] < nxt["valid_from"]
            assert prev["state"] != nxt["state"]
        assert history[-1]["valid_to"] is None


def test_scd2_change_count_matches_raw_transitions(spark):
    """Row count per user == number of state transitions in the raw
    ordered event stream (collapse correctness)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy(
        "user_id", "ts", "event_id"
    )
    transitions = {}
    last = {}
    for r in ev.collect():
        u = r["user_id"]
        if u not in last or last[u] != r["event_type"]:
            transitions[u] = transitions.get(u, 0) + 1
        last[u] = r["event_type"]
    df = QUERIES["j11_scd2_history"][0](spark, SF_DIR)
    counts = {
        r["user_id"]: r["n"]
        for r in df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == transitions


def test_funnel_is_monotone_and_bounded(spark):
    """a22: each funnel step is a subset of the previous one."""
    (row,) = QUERIES["a22_funnel"][0](spark, SF_DIR).collect()
    assert row["n_view"] >= row["n_click"] >= row["n_purchase"] >= 0
    if row["n_view"]:
        assert 0.0 <= row["conversion"] <= 1.0


def test_retention_week0_covers_every_user(spark):
    """a23: every user appears in their own cohort's week-0 cell, so
    summed week-0 counts == total distinct users; offsets non-negative."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    rows = QUERIES["a23_retention"][0](spark, SF_DIR).collect()
    assert all(r["week_offset"] >= 0 for r in rows)
    week0 = sum(r["n_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users


def test_scd2_stream_emits_closed_versions_matching_batch(spark, tmp_path):
    """Stream twin of j11: drains emit exactly the CLOSED versions the
    batch form reports, and the open version survives restarts in state
    (its version counter continues, not restarts)."""
    from chessmate_spark.streaming.scd2 import run_scd2_stream

    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _ev(eid, minute, etype, user=1):
        return (
            eid,
            BASE + dt.timedelta(minutes=minute),
            user,
            etype,
            1.0,
            "{}",
        )

    batch1 = [
        _ev(0, 0, "view"),
        _ev(1, 5, "view"),
        _ev(2, 10, "click"),
        _ev(3, 0, "signup", user=2),
    ]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_scd2_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    assert {(r["user_id"], r["version"], r["state"]) for r in rows} == {
        (1, 1, "view")
    }
    (r,) = rows
    assert r["valid_from"] == BASE
    assert r["valid_to"] == BASE + dt.timedelta(minutes=10)

    # restart: user1 stays 'click' then changes to 'error'; user2's open
    # 'signup' version closes — both must continue their version counters
    batch2 = [
        _ev(4, 15, "click"),
        _ev(5, 20, "error"),
        _ev(6, 30, "purchase", user=2),
    ]
    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_scd2_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    emitted = {
        (r["user_id"], r["version"], r["state"],
         r["valid_from"], r["valid_to"])
        for r in spark.read.parquet(out_dir).collect()
    }

    # batch twin over the union: closed versions == everything j11
    # reports with is_current = false
    all_events = spark.createDataFrame(batch1 + batch2, EVENTS_DDL)
    sf_twin = str(tmp_path / "sf_twin")
    all_events.write.parquet(f"{sf_twin}/events.parquet")
    batch_rows = QUERIES["j11_scd2_history"][0](spark, sf_twin).collect()
    batch_closed = {
        (r["user_id"], r["version"], r["state"],
         r["valid_from"], r["valid_to"])
        for r in batch_rows
        if not r["is_current"]
    }
    assert emitted == batch_closed


def test_hopping_window_stream_emits_each_window_once(spark, tmp_path):
    """Streaming twin of a26: 10-min windows sliding every 5 min — each
    event lands in two windows, every closed window is emitted exactly
    once, and the still-open windows stay back until a later drain."""
    from chessmate_spark.streaming.structured import (
        run_windowed_events_stream,
    )

    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [_event(0, 1), _event(1, 7), _event(2, 60)]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_windowed_events_stream(
        spark, ev_dir, out_dir, ckpt,
        window_duration="10 minutes", watermark_delay="5 minutes",
        slide_duration="5 minutes",
    )
    q.awaitTermination()
    emitted = {
        (r["window_start"].minute, r["event_count"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # minute-1 event → windows [55',05') and [00,10); minute-7 → [00,10)
    # and [05,15). Watermark (60-5=55) closed all of them.
    assert (55, 1) in emitted
    assert (0, 2) in emitted
    assert (5, 1) in emitted
    # the minute-60 event's windows ([55,65), [60,70)) are still open
    assert not any(start in (60,) for start, _ in emitted)
    assert len(emitted) == 3


def test_funnel_stream_matches_batch_and_survives_restart(spark, tmp_path):
    """Stream twin of a22: conversions emit exactly once, in the drain
    whose events complete the funnel; mid-funnel progress survives the
    restart; converted-user set equals the batch form's n_purchase."""
    from chessmate_spark.streaming.funnel import run_funnel_stream

    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _ev(eid, minute, etype, user):
        return (
            eid,
            BASE + dt.timedelta(minutes=minute),
            user,
            etype,
            1.0,
            "{}",
        )

    # user 1 completes across the restart; user 2's click misses the 24h
    # step window; user 3 purchases before clicking (no conversion)
    batch1 = [
        _ev(0, 0, "view", 1),
        _ev(1, 30, "click", 1),
        _ev(2, 0, "view", 2),
        _ev(3, 0, "view", 3),
        _ev(4, 10, "purchase", 3),
    ]
    batch2 = [
        _ev(5, 60, "purchase", 1),
        _ev(6, 60 * 30, "click", 2),
        _ev(7, 90, "click", 3),
    ]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_funnel_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 0  # nothing complete yet

    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(
        ev_dir
    )
    q = run_funnel_stream(spark, ev_dir, out_dir, ckpt)
    q.awaitTermination()
    rows = spark.read.parquet(out_dir).collect()
    assert {(r["user_id"],) for r in rows} == {(1,)}
    (c,) = rows
    assert c["t_view"] == BASE
    assert c["t_click"] == BASE + dt.timedelta(minutes=30)
    assert c["t_purchase"] == BASE + dt.timedelta(minutes=60)

    # batch twin over the union agrees on the conversion count
    sf_twin = str(tmp_path / "sf_twin")
    spark.createDataFrame(batch1 + batch2, EVENTS_DDL).write.parquet(
        f"{sf_twin}/events.parquet"
    )
    (b,) = QUERIES["a22_funnel"][0](spark, sf_twin).collect()
    assert b["n_purchase"] == len(rows) == 1
