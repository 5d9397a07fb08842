"""NULL-heavy property tests for the composed join/session operators.

Hypothesis generates rows WITH NULL keys, NULL timestamps, and empty
(lo > hi) intervals; each example is checked against an oracle — a pure
三-valued-logic Python reference for the joins, DuckDB running the
identical window program for sessionization — so the operators' NULL
semantics are pinned, not assumed.
"""

import datetime as dt

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chessmate_spark.operators.asof import interval_join, range_join
from chessmate_spark.streaming.sessions import sessionize_batch

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

_opt_val = st.one_of(st.none(), st.integers(min_value=-40, max_value=40))
_opt_key = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
_opt_sec = st.one_of(st.none(), st.integers(min_value=0, max_value=7200))

_points = st.lists(_opt_val, max_size=8)
_intervals = st.lists(st.tuples(_opt_val, _opt_val), max_size=6)
_events = st.lists(st.tuples(_opt_key, _opt_sec), min_size=0, max_size=12)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ts(seconds):
    return None if seconds is None else BASE + dt.timedelta(seconds=seconds)


@given(points=_points, intervals=_intervals)
@_SETTINGS
def test_range_join_null_and_empty_intervals(spark, points, intervals):
    pdf = spark.createDataFrame(
        [(i, None if x is None else float(x)) for i, x in enumerate(points)],
        "pid long, x double",
    )
    idf = spark.createDataFrame(
        [
            (
                i,
                None if lo is None else float(lo),
                None if hi is None else float(hi),
            )
            for i, (lo, hi) in enumerate(intervals)
        ],
        "iid long, lo double, hi double",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "x", "lo", "hi", bucket_width=5.0).collect()
    }
    # oracle: SQL BETWEEN under three-valued logic — NULL anywhere means
    # no match; lo > hi is an empty interval
    want = {
        (pi, ii)
        for pi, x in enumerate(points)
        for ii, (lo, hi) in enumerate(intervals)
        if x is not None and lo is not None and hi is not None
        and lo <= x <= hi
    }
    assert got == want


@given(clicks=_events, purchases=_events)
@_SETTINGS
def test_interval_join_null_keys_and_ts(spark, clicks, purchases):
    cdf = spark.createDataFrame(
        [(i, u, _ts(s)) for i, (u, s) in enumerate(clicks)],
        "click_id long, user_id long, click_ts timestamp",
    )
    pdf = spark.createDataFrame(
        [(i, u, _ts(s)) for i, (u, s) in enumerate(purchases)],
        "purchase_id long, p_user_id long, purchase_ts timestamp",
    )
    got = {
        (r.click_id, r.purchase_id)
        for r in interval_join(
            cdf, pdf, "user_id", "p_user_id",
            "click_ts", "purchase_ts", "30 MINUTES",
        ).collect()
    }
    want = {
        (ci, pi)
        for ci, (cu, cs) in enumerate(clicks)
        for pi, (pu, ps) in enumerate(purchases)
        if cu is not None and pu is not None and cu == pu
        and cs is not None and ps is not None
        and cs <= ps < cs + 1800
    }
    assert got == want


def _duckdb_sessions(rows, gap_minutes):
    """The a10 window program run by DuckDB on the same rows — NULLS FIRST
    ordering pinned to match Spark's asc default."""
    df = pd.DataFrame(
        {
            "user_id": pd.array(
                [u for u, _ in rows], dtype="Int64"
            ),
            "ts": pd.Series(
                [pd.Timestamp(_ts(s)) if s is not None else pd.NaT
                 for _, s in rows],
                dtype="datetime64[us]",
            ),
            "event_id": range(len(rows)),
        }
    )
    con = duckdb.connect()
    con.register("ev", df)
    out = con.execute(
        f"""
        WITH ordered AS (
          SELECT user_id, ts, event_id,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id
                     ORDER BY ts NULLS FIRST, event_id) AS prev_us
          FROM ev),
        flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN prev_us IS NULL
                           OR epoch_us(ts) - prev_us
                              > CAST({gap_minutes} AS BIGINT) * 60 * 1000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM ordered),
        numbered AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id
                     ORDER BY ts NULLS FIRST, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged)
        SELECT user_id, session_no, min(ts) AS session_start,
               max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id NULLS FIRST, session_no
        """
    ).fetchall()
    con.close()
    return out


def _norm(value):
    if value is None or value is pd.NaT or (
        isinstance(value, float) and pd.isna(value)
    ):
        return None
    if isinstance(value, (pd.Timestamp, dt.datetime)):
        return pd.Timestamp(value).to_pydatetime().replace(tzinfo=None)
    return int(value)


@given(rows=_events)
@_SETTINGS
def test_sessionize_batch_null_keys_and_ts(spark, rows):
    ev = spark.createDataFrame(
        [(u, _ts(s), i) for i, (u, s) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long",
    )
    got = sorted(
        (
            (
                _norm(r["user_id"]), _norm(r["session_no"]),
                _norm(r["session_start"]), _norm(r["session_end"]),
                _norm(r["n_events"]),
            )
            for r in sessionize_batch(ev, gap_minutes=30).collect()
        ),
        key=repr,  # total order even with None/datetime mixtures
    )
    want = sorted(
        (
            tuple(_norm(v) for v in row)
            for row in _duckdb_sessions(rows, 30)
        ),
        key=repr,
    )
    assert got == want
