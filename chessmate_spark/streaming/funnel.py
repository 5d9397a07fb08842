"""Streaming conversion funnel — the stateful stream twin of the batch
`a22_funnel` entry (plans/queries.py), same earliest-qualifying-progression
semantics: view → click within the step window → purchase within the step
window of the click.

Each user's GroupState is one compact progress triple; a CONVERSION row is
emitted exactly once, in the micro-batch whose events complete step 3 —
the shape a live product-analytics pipeline needs (react to conversions
now, not at the end-of-day batch).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame

FUNNEL_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp,"
    " t_purchase timestamp"
)

_STEP1 = "view"
_STEP2 = "click"
_STEP3 = "purchase"


def funnel_stream(
    events: DataFrame,
    step_window_hours: int = 24,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel progression in GroupState: (t1, t2, done).

    Earliest-qualifying semantics exactly as the batch form computes
    them: t1 = first view; t2 = first click in (t1, t1 + W]; conversion
    = first purchase in (t2, t2 + W].  Events are folded in event-time
    order within each micro-batch; the CDC-log per-key ordering contract
    across batches is the same one scd2_stream documents.

    State is three numbers per user — O(distinct users), independent of
    event volume — and a converted user's state collapses to a `done`
    marker so repeat purchases emit nothing.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    window_us = step_window_hours * 3600 * 1_000_000

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = (
            pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        )
        if not len(rows):
            return
        rows = rows.sort_values(ts_col, kind="mergesort")
        ts_us = pd.to_datetime(rows[ts_col]).astype("int64") // 1000
        if state.exists:
            t1, t2, done = state.get
        else:
            t1, t2, done = None, None, 0
        conversions = []
        for t, etype in zip(ts_us, rows[type_col]):
            if done:
                break
            t = int(t)
            if t1 is None:
                if etype == _STEP1:
                    t1 = t
            elif t2 is None:
                if etype == _STEP2 and t1 < t <= t1 + window_us:
                    t2 = t
            else:
                if etype == _STEP3 and t2 < t <= t2 + window_us:
                    conversions.append((user_id, t1, t2, t))
                    done = 1
        state.update((t1, t2, done))
        if conversions:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in conversions],
                    "t_view": pd.to_datetime(
                        [c[1] * 1000 for c in conversions]
                    ),
                    "t_click": pd.to_datetime(
                        [c[2] * 1000 for c in conversions]
                    ),
                    "t_purchase": pd.to_datetime(
                        [c[3] * 1000 for c in conversions]
                    ),
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType="t1 long, t2 long, done integer",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_funnel_stream(
    spark,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    step_window_hours: int = 24,
):
    """File-source → stateful funnel fold → append parquet sink; one row
    per converted user, emitted in the drain that observed the
    completing purchase (state survives restarts via the checkpoint)."""
    from .structured import EVENTS_DDL

    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    return (
        funnel_stream(events, step_window_hours)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
