"""Timestamp-type duality: events operators must work on TIMESTAMP_NTZ
(how parquet timestamp[us] arrives) AND TIMESTAMP, with identical
results.

Round-3 regression class: the driver's testdata switched events.ts from
INT64 TIMESTAMP(NANOS) to timestamp[us]/NTZ and an NTZ-intolerant
expression (unix_micros) aborted the whole bench.  This pins every
events-consuming builder against both types.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chessmate_spark.plans.queries import QUERIES, _events

SF_DIR = "/root/testdata/sf0.001"

EVENTS_ENTRIES = [
    "a7_windowed_counts",
    "a9_windowed_event_counts",
    "a10_user_sessions",
    "a11_percentiles",
    "j7_asof_join",
    "j8_range_join",
    "j9_interval_join",
    "a33_windowed_drift",
]


def test_events_read_is_ntz_here(spark):
    dt = dict(_events(spark, SF_DIR).dtypes)["ts"]
    assert dt in ("timestamp_ntz", "timestamp")


@pytest.mark.parametrize("name", EVENTS_ENTRIES)
def test_builders_tolerate_both_timestamp_types(spark, name, monkeypatch):
    builder, _ = QUERIES[name]
    native = builder(spark, SF_DIR).collect()

    # rebuild with ts force-cast to the OTHER timestamp type
    native_type = dict(_events(spark, SF_DIR).dtypes)["ts"]
    other = "timestamp" if native_type == "timestamp_ntz" else "timestamp_ntz"

    import chessmate_spark.plans.queries as qmod

    real_events = qmod._events

    def flipped(s, sf):
        ev = real_events(s, sf)
        return ev.withColumn("ts", F.col("ts").cast(other))

    monkeypatch.setattr(qmod, "_events", flipped)
    try:
        flipped_rows = builder(spark, SF_DIR).collect()
    finally:
        monkeypatch.setattr(qmod, "_events", real_events)

    # session tz is UTC, so NTZ<->LTZ casts preserve the instant and every
    # value — including emitted timestamp columns — must agree stringwise
    def canon(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert canon(native) == canon(flipped_rows)
