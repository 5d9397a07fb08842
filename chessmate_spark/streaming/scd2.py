"""Streaming SCD2 (type-2 dimension) maintenance — the stateful stream
twin of the batch `j11_scd2_history` entry (plans/queries.py), following
the repo's batch↔stream twin pattern (sessions.py, structured.py).

Reference analogue: the player-upsert history the ingest service keeps
(HendrikReh/chessmate services/ingest) — here generalized to any keyed
change stream, materialized incrementally.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame

SCD2_SCHEMA = (
    "user_id long, version long, state string,"
    " valid_from timestamp, valid_to timestamp"
)


def scd2_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
) -> DataFrame:
    """Incremental type-2 history: GroupState holds each key's OPEN
    version (current state, valid_from, version counter); every observed
    state CHANGE emits the closed interval [valid_from, change_ts) in
    append mode, exactly once.

    Contract (the standard CDC-log assumption): the source delivers each
    key's events in event-time order across micro-batches (Kafka per-key
    ordering / CDC logs guarantee this).  Within a micro-batch, rows are
    sorted by (ts) before folding, so intra-batch disorder is absorbed.

    State per key is ONE (state, valid_from_us, version) triple —
    O(distinct keys), independent of event volume; closed versions leave
    through the sink immediately.  The batch twin (j11) additionally
    reports the open version with ``is_current=true``; here the open
    version lives in state until its closing change arrives — a
    snapshot-read helper would union the sink with the state store's
    open rows (same read-contract note as read_heavy_hitters).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
        closed = []
        if state.exists:
            cur, from_us, version = state.get
        else:
            cur, from_us, version = None, None, 0
        for t, s in zip(ts_us, rows[state_col]):
            t = int(t)
            if cur is None:
                cur, from_us, version = s, t, 1
            elif s != cur:
                closed.append((user_id, version, cur, from_us, t))
                cur, from_us, version = s, t, version + 1
        state.update((cur, from_us, version))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "version": [c[1] for c in closed],
                    "state": [c[2] for c in closed],
                    "valid_from": pd.to_datetime(
                        [c[3] * 1000 for c in closed]
                    ),
                    "valid_to": pd.to_datetime([c[4] * 1000 for c in closed]),
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SCD2_SCHEMA,
            stateStructType="cur string, from_us long, version long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_scd2_stream(
    spark,
    events_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
):
    """File-source → stateful SCD2 fold → append parquet sink
    (availableNow drain; open versions persist in the checkpointed state
    across restarts and close in later drains)."""
    from .structured import EVENTS_DDL

    events = spark.readStream.schema(EVENTS_DDL).parquet(events_path)
    return (
        scd2_stream(events, watermark)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
