"""Event sessionization: gap-based session windows, batch + stateful stream.

Batch form: the classic lag/cumulative-sum decorrelation — a per-user
window marks gap breaks, a running sum numbers sessions, one groupBy
collapses them.  Two shuffles total (both on user_id; AQE coalesces), no
UDF, fully oracle-checkable.

Streaming form: `applyInPandasWithState` with an event-time timeout — the
open session lives in GroupState keyed by user_id; a session is emitted
when the watermark passes its end + gap (i.e. it can no longer grow).
This is the custom-stateful-operator pattern the built-in session_window
generalizes from; implementing it by hand keeps the state schema explicit
and lets per-session aggregates be arbitrary Python.

State size: O(active users), independent of event volume — each group
holds exactly one open session tuple.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp,"
    " n_events long"
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """(user_id, session_no, session_start, session_end, n_events) — a new
    session starts when the gap to the previous event exceeds
    ``gap_minutes``.  Gap comparison in integral microseconds so the oracle
    agrees at boundaries."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike (unix_micros
    # rejects NTZ, which is how parquet timestamp[us] columns arrive), and a
    # µs difference is timezone-free either way.
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_ts, F.col(ts_col)) > gap_us),
        1,
    ).otherwise(0)
    numbered = events.withColumn("_new", new_sess).withColumn(
        "session_no",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy(user_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(user_col, "session_no")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap sessions via applyInPandasWithState (event-time
    timeout).  Emits each session ONCE, when the watermark proves it
    closed; open sessions ride in GroupState."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_us, end_us, n = state.get
                closed.append((user_id, start_us, end_us, n))
                state.remove()
        elif len(rows):
            ts_us = (
                pd.to_datetime(rows[ts_col]).astype("int64") // 1000
            ).sort_values()
            if state.exists:
                start_us, end_us, n = state.get
            else:
                start_us, end_us, n = None, None, 0
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    start_us, end_us, n = t, t, 1
                elif t - end_us > gap_us:
                    closed.append((user_id, start_us, end_us, n))
                    start_us, end_us, n = t, t, 1
                else:
                    end_us = max(end_us, t)
                    n += 1
            state.update((start_us, end_us, n))
            # wake up when the watermark passes the session close boundary
            state.setTimeoutTimestamp(end_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] * 1000 for c in closed]
                    ),
                    "session_end": pd.to_datetime([c[2] * 1000 for c in closed]),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start_us long, end_us long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
