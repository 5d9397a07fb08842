"""Misra-Gries heavy-hitter sketch: exactness regime, guarantee regime,
and the bounded-state streaming twin (bucketed MG state, cross-restart
continuation, snapshot read contract)."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest
from pyspark.sql import functions as F

from chessmate_spark.operators.sketch import heavy_hitters_sketch, mg_partition_summaries
from chessmate_spark.streaming.structured import (
    EVENTS_DDL,
    heavy_hitters_batch,
    read_heavy_hitters_sketch,
    run_heavy_hitters_sketch_stream,
)


def _users_df(spark, user_ids, partitions=4):
    rows = [(uid,) for uid in user_ids]
    return spark.createDataFrame(rows, "user_id long").repartition(partitions)


def test_sketch_exact_when_capacity_exceeds_distinct_keys(spark):
    # 1 user with 50 events, 10 with 10, 30 with 1 — capacity 64 never trims.
    user_ids = [1] * 50 + [u for u in range(2, 12) for _ in range(10)] + list(
        range(100, 130)
    )
    df = _users_df(spark, user_ids)
    got = [
        (r["user_id"], r["event_count"])
        for r in heavy_hitters_sketch(df, k=5, capacity=64).collect()
    ]
    exact = sorted(
        Counter(user_ids).items(), key=lambda kv: (-kv[1], kv[0])
    )[:5]
    assert got == exact


def test_sketch_guarantee_finds_heavy_key_under_tiny_capacity(spark):
    """ε-deficiency: a key holding >1/capacity of all mass must survive
    trimming no matter how many distinct light keys flood the summary."""
    heavy = [7] * 4000                      # 4000 of 14000 rows ≈ 29%
    light = list(range(1000, 11000))        # 10000 distinct singletons
    df = _users_df(spark, heavy + light, partitions=8)
    n = len(heavy) + len(light)
    capacity = 16
    rows = {
        r["user_id"]: r["event_count"]
        for r in heavy_hitters_sketch(df, k=3, capacity=capacity).collect()
    }
    assert 7 in rows
    # underestimate bounded by N/capacity, never overestimate
    assert len(heavy) - n / capacity <= rows[7] <= len(heavy)


def test_partition_summaries_capped_at_capacity(spark):
    # Zipf-ish mix: some repeated keys so summaries are non-empty, far
    # more distinct keys than capacity so trimming engages.
    user_ids = [u for u in range(50) for _ in range(20)] + list(range(1000, 6000))
    df = _users_df(spark, user_ids, partitions=4)
    summaries = mg_partition_summaries(df, capacity=32)
    # one summary frame per input partition, each <= capacity rows
    n = summaries.count()
    assert 0 < n <= 4 * 32


def test_sketch_rejects_bad_capacity(spark):
    df = _users_df(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        heavy_hitters_sketch(df, capacity=0)


def _event(eid, minute, uid):
    return (eid, dt.datetime(2024, 1, 1, 0, minute), uid, "click", 1.0, "{}")


def test_sketch_stream_matches_exact_batch_and_survives_restart(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [_event(i, 1, uid) for i, uid in enumerate([1] * 5 + [2] * 3 + [3])]
    spark.createDataFrame(batch1, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_heavy_hitters_sketch_stream(
        spark, ev_dir, out_dir, ckpt, n_buckets=4, capacity=64
    )
    q.awaitTermination()

    # restart over new data: counters must CONTINUE from the checkpoint
    batch2 = [_event(100 + i, 2, uid) for i, uid in enumerate([2] * 4 + [4] * 2)]
    spark.createDataFrame(batch2, EVENTS_DDL).write.mode("append").parquet(ev_dir)
    q = run_heavy_hitters_sketch_stream(
        spark, ev_dir, out_dir, ckpt, n_buckets=4, capacity=64
    )
    q.awaitTermination()

    events = spark.createDataFrame(batch1 + batch2, EVENTS_DDL)
    exact = [
        (r["user_id"], r["event_count"])
        for r in heavy_hitters_batch(events, k=4).collect()
    ]
    got = [
        (r["user_id"], r["event_count"])
        for r in read_heavy_hitters_sketch(spark, out_dir, k=4).collect()
    ]
    assert got == exact  # capacity ≥ distinct users per bucket → exact


# -- driver-side property tests (pure pandas, no Spark session) -----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:
    import pandas as pd

    from chessmate_spark.operators.sketch import _mg_trim

    def _mg_run(values, capacity, chunk=97):
        """Reference single-partition MG over arbitrary batch splits."""
        s = pd.Series(dtype="int64")
        for i in range(0, len(values), chunk):
            batch = pd.Series(values[i : i + chunk]).value_counts()
            s = s.add(batch, fill_value=0)
            s = _mg_trim(s, capacity)
        return s

    @settings(max_examples=60, deadline=None)
    @given(
        values=st.lists(st.integers(min_value=0, max_value=40), max_size=600),
        capacity=st.integers(min_value=1, max_value=24),
    )
    def test_mg_bound_holds_for_any_input_and_capacity(values, capacity):
        """The Misra-Gries invariant the merge relies on:
        true - n/capacity <= estimate <= true, and <= capacity counters."""
        s = _mg_run(values, capacity)
        assert len(s) <= capacity
        true = Counter(values)
        n = len(values)
        for key, est in s.items():
            assert est <= true[key]
            assert est >= true[key] - n / capacity - 1e-9
        # keys absent from the summary must also satisfy the lower bound
        for key, cnt in true.items():
            if key not in s.index:
                assert cnt <= n / capacity + 1e-9

    @settings(max_examples=30, deadline=None)
    @given(
        heavy_reps=st.integers(min_value=50, max_value=200),
        noise=st.lists(
            st.integers(min_value=100, max_value=4000), max_size=300
        ),
    )
    def test_mg_always_retains_a_majority_key(heavy_reps, noise):
        values = [7] * heavy_reps + noise
        capacity = 8
        if heavy_reps <= len(values) / capacity:
            return  # below the guarantee threshold, nothing to assert
        s = _mg_run(values, capacity)
        assert 7 in s.index


# --------------------------------------------------------------------------
# Count-Min sketch (round 6)


def test_countmin_never_undercounts_and_bounds_overcount(spark):
    from chessmate_spark.operators.sketch import (
        countmin_estimate,
        countmin_table,
    )

    # zipf-ish skew: key k appears ~600/k times
    rows = [(f"u{k}",) for k in range(1, 40) for _ in range(600 // k)]
    df = spark.createDataFrame(rows, "key string")
    n = df.count()
    depth, width = 4, 256
    cms = countmin_table(df, "key", depth=depth, width=width)
    # the sketch is exactly depth*width cells at most
    assert cms.count() <= depth * width
    probes = df.distinct()
    est = {
        r["key"]: r["est_cnt"]
        for r in countmin_estimate(
            probes, cms, "key", depth=depth, width=width
        ).collect()
    }
    true = {f"u{k}": 600 // k for k in range(1, 40)}
    import math

    bound = math.e / width * n  # CMS overcount bound per row, prob 1-e^-d
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)  # NEVER undercounts
        # generous deterministic sanity ceiling: 8x the e/width*N bound
        assert est[k] <= t + 8 * bound, (k, est[k], t, bound)


def test_countmin_is_deterministic_across_runs(spark):
    from chessmate_spark.operators.sketch import (
        countmin_estimate,
        countmin_table,
    )

    rows = [(f"k{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, "key string")
    outs = []
    for _ in range(2):
        cms = countmin_table(df, "key", depth=3, width=64)
        est = countmin_estimate(df.distinct(), cms, "key", depth=3, width=64)
        outs.append(sorted((r["key"], r["est_cnt"]) for r in est.collect()))
    assert outs[0] == outs[1]


# --- countmin_prefilter: the two-pass heavy-hitter gate (t26) ---


def test_prefilter_lossless_for_heavy_keys(spark):
    """CMS never undercounts, so every key with true count >= min_count
    must survive the gate — even under a deliberately tiny sketch."""
    from chessmate_spark.operators.sketch import countmin_prefilter

    rows = [("hot",)] * 10 + [("warm",)] * 3 + [
        (f"cold{i}",) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "k string")
    # width 8: heavy collision pressure — false POSITIVES allowed,
    # false negatives never
    kept = countmin_prefilter(df, "k", min_count=3, depth=4, width=8)
    counts = {r["k"]: r["cnt"] for r in kept.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts.get("hot") == 10
    assert counts.get("warm") == 3


def test_prefilter_drops_light_tail_at_ample_width(spark):
    from chessmate_spark.operators.sketch import countmin_prefilter

    rows = [("hot",)] * 5 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    kept = countmin_prefilter(df, "k", min_count=3, depth=4, width=4096)
    got = {r["k"] for r in kept.select("k").distinct().collect()}
    assert "hot" in got
    # ample width: the light tail should essentially vanish (a handful
    # of collision survivors are tolerated, not the whole tail)
    assert len(got) <= 5


def test_prefilter_schema_and_row_passthrough(spark):
    """Surviving rows keep the input schema and multiplicity — the gate
    filters, it must not aggregate or project."""
    from chessmate_spark.operators.sketch import countmin_prefilter

    rows = [(1, "hot"), (2, "hot"), (3, "hot"), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id int, k string")
    kept = countmin_prefilter(df, "k", min_count=3, depth=3, width=1024)
    assert kept.columns == ["doc_id", "k"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]


def test_t26_identity_with_t14(spark):
    """The gated plan must be output-identical to the exact t14 entry
    (shared-oracle contract) at test scale."""
    from chessmate_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["t14_boilerplate_ngrams"][0](spark, sf).collect()
    gated = QUERIES["t26_boilerplate_cms_gate"][0](spark, sf).collect()
    assert gated == exact


def test_prefilter_auto_width_capped_and_explicit_over_cap_rejected(spark):
    from chessmate_spark.operators.sketch import (
        _CM_PREFILTER_MAX_WIDTH,
        countmin_prefilter,
    )

    df = spark.createDataFrame([("k",)], "k string")
    with pytest.raises(ValueError):
        countmin_prefilter(
            df, "k", min_count=2, width=_CM_PREFILTER_MAX_WIDTH * 2
        )
    # auto width on a tiny stream stays small and functional
    kept = countmin_prefilter(df, "k", min_count=1)
    assert kept.count() == 1


def test_prefilter_null_keys_pass_through(spark):
    """NULL keys never enter the sketch (NULL buckets) — they must pass
    to the exact stage unconditionally or the gated pipeline diverges
    from the ungated one on any nullable key column."""
    from chessmate_spark.operators.sketch import countmin_prefilter

    rows = [(None,)] * 5 + [("hot",)] * 4 + [("solo",)]
    df = spark.createDataFrame(rows, "k string")
    kept = countmin_prefilter(df, "k", min_count=3, depth=3, width=1024)
    exact = (
        kept.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 3)
    )
    got = {(r["k"], r["c"]) for r in exact.collect()}
    assert got == {(None, 5), ("hot", 4)}
