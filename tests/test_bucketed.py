"""Bucketed-table co-location tests: the Q18-note fix — a join and a
groupBy on the bucket key must run without shuffle exchanges."""

import pytest
from pyspark.sql import functions as F

from chessmate_spark.ingest.bucketed import (
    read_table,
    shuffle_exchange_count,
    write_bucketed,
)


@pytest.fixture()
def bucketed_orders(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 37).alias("o_custkey"),
        (F.col("id") * 13 % 1000).cast("double").alias("o_totalprice"),
    )
    write_bucketed(df, "t_orders_bucketed", ["o_orderkey"], 8,
                   path=str(tmp_path / "t_orders_bucketed"))
    yield "t_orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_orders):
    t = read_table(spark, bucketed_orders)
    agg = t.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
    assert shuffle_exchange_count(agg) == 0
    assert agg.count() == 1000


def test_join_on_bucket_key_has_no_exchange(spark, bucketed_orders, tmp_path):
    df2 = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), F.lit(1).alias("flag")
    )
    write_bucketed(df2, "t_orders_b2", ["o_orderkey"], 8,
                   path=str(tmp_path / "t_orders_b2"))
    try:
        # disable broadcast so the co-located sort-merge path is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = read_table(spark, bucketed_orders)
        b = read_table(spark, "t_orders_b2")
        joined = a.join(b, "o_orderkey")
        assert shuffle_exchange_count(joined) == 0
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b2")


def test_unbucketed_baseline_does_shuffle(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    # a plain repartition-free groupBy on a non-bucketed source shuffles
    agg = df.groupBy("v").agg(F.count("*").alias("c"))
    assert shuffle_exchange_count(agg) >= 1


def test_q18_bucketed_twin_matches_unbucketed(spark):
    from chessmate_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    twin_rows = QUERIES["q18_bucketed_twin"][0](spark, sf).collect()
    base_rows = QUERIES["q18_large_orders"][0](spark, sf).collect()
    assert twin_rows == base_rows  # bucketing changes the plan, not the answer


# --- ownership-lease reaping (ADVICE round 6: a bare os.kill(pid, 0)
# probe reaps LIVE sibling tables across pid namespaces on a shared
# filesystem and leaks dirs on pid reuse) ---


def _make_lease(d, **over):
    import json
    import os
    import pathlib
    import socket

    from chessmate_spark.ingest import bucketed as B

    lease = {
        "host": socket.gethostname(),
        "boot_id": B._boot_id(),
        "pid": os.getpid(),
        "start_time": B._proc_start_time(os.getpid()),
    }
    lease.update(over)
    pathlib.Path(B._lease_path(str(d))).write_text(json.dumps(lease))


def test_lease_live_owner_not_reaped(tmp_path):
    import os

    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid99999999-deadbeef"
    d.mkdir()
    # lease says: this very process owns it (alive, same start time)
    _make_lease(d)
    assert not B._lease_owner_dead(str(d), os.getpid())


def test_lease_dead_pid_reaped(tmp_path):
    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid99999999-deadbeef"
    d.mkdir()
    _make_lease(d, pid=99999999)  # beyond pid_max: guaranteed gone
    assert B._lease_owner_dead(str(d), 99999999)


def test_lease_pid_reuse_detected(tmp_path):
    import os

    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid1-00000000"
    d.mkdir()
    # pid 1 is alive, but the recorded start time can't match init's:
    # the original owner is dead and the pid was recycled -> reapable
    _make_lease(d, pid=os.getpid(), start_time="0")
    assert B._lease_owner_dead(str(d), os.getpid())


def test_lease_foreign_host_never_reaped(tmp_path):
    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid99999999-deadbeef"
    d.mkdir()
    # dead pid locally, but the lease belongs to ANOTHER host sharing
    # the filesystem: not ours to judge
    _make_lease(d, host="some-other-host", pid=99999999)
    assert not B._lease_owner_dead(str(d), 99999999)


def test_lease_foreign_boot_never_reaped(tmp_path):
    import os

    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid1-00000000"
    d.mkdir()
    # same hostname, different boot_id: indistinguishable from a LIVE
    # session on another machine sharing the hostname + filesystem
    # (cloned VMs), so never reaped — leak beats data loss
    _make_lease(d, pid=os.getpid(), boot_id="not-this-boot")
    assert not B._lease_owner_dead(str(d), os.getpid())


def test_legacy_dir_without_lease_conservative(tmp_path):
    import os

    from chessmate_spark.ingest import bucketed as B

    live = tmp_path / f"tbl-pid{os.getpid()}-cafecafe"
    live.mkdir()
    assert not B._lease_owner_dead(str(live), os.getpid())
    dead = tmp_path / "tbl-pid99999999-cafecafe"
    dead.mkdir()
    assert B._lease_owner_dead(str(dead), 99999999)


def test_ensure_bucketed_writes_lease(spark, tmp_path):
    import json
    import os

    from chessmate_spark.ingest import bucketed as B

    df = spark.range(10).select(F.col("id").alias("k"))
    try:
        B.ensure_bucketed(df, "t_lease_probe", ["k"], 2,
                          path=str(tmp_path / "t_lease_probe"))
        locs = [p for p in os.listdir(tmp_path)
                if p.startswith("t_lease_probe")
                and not p.endswith(B._LEASE_SUFFIX)]
        assert len(locs) == 1
        lease = json.loads(
            (tmp_path / (locs[0] + B._LEASE_SUFFIX)).read_text()
        )
        assert lease["pid"] == os.getpid()
        assert lease["start_time"] == B._proc_start_time(os.getpid())
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lease_probe")


def test_malformed_lease_falls_back_conservative(tmp_path):
    import os

    from chessmate_spark.ingest import bucketed as B

    # syntactically valid JSON that is not an object
    d1 = tmp_path / f"tbl-pid{os.getpid()}-aaaaaaaa"
    d1.mkdir()
    import pathlib
    pathlib.Path(B._lease_path(str(d1))).write_text("[]")
    assert not B._lease_owner_dead(str(d1), os.getpid())  # owner alive
    d2 = tmp_path / "tbl-pid99999999-bbbbbbbb"
    d2.mkdir()
    pathlib.Path(B._lease_path(str(d2))).write_text('"just a string"')
    assert B._lease_owner_dead(str(d2), 99999999)  # legacy probe: dead
    # object lease missing boot_id on a matching host: boot identity
    # unverifiable -> degrade to the pid probe (dead pid reaps) rather
    # than disabling reaping wholesale on /proc-less hosts
    d3 = tmp_path / "tbl-pid99999999-cccccccc"
    d3.mkdir()
    pathlib.Path(B._lease_path(str(d3))).write_text(
        '{"host": "%s", "pid": null}' % __import__("socket").gethostname())
    assert B._lease_owner_dead(str(d3), 99999999)
    # matching boot_id but null pid: falls back to the name-derived pid
    # without crashing — dead pid reaps
    d4 = tmp_path / "tbl-pid99999999-dddddddd"
    d4.mkdir()
    _make_lease(d4, pid=None, start_time=None)
    assert B._lease_owner_dead(str(d4), 99999999)


def test_orphan_lease_of_dead_owner_cleaned(spark, tmp_path):
    """A lease whose table dir never appeared (owner died before the
    write started) is removed by the reap loop; a live owner's orphan
    lease is kept (its write may be in flight)."""
    import os
    import pathlib

    from chessmate_spark.ingest import bucketed as B

    parent = str(tmp_path / "t_orphan")
    dead = f"{parent}-pid99999999-eeeeeeee"
    _make_lease(pathlib.Path(dead), pid=99999999, start_time="1")
    live = f"{parent}-pid{os.getpid()}-ffffffff"
    _make_lease(pathlib.Path(live))
    df = spark.range(5).select(F.col("id").alias("k"))
    try:
        B.ensure_bucketed(df, "t_orphan_probe", ["k"], 2, path=parent)
        assert not os.path.exists(B._lease_path(dead))
        assert os.path.exists(B._lease_path(live))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orphan_probe")


def test_legacy_in_dir_lease_still_honored(tmp_path):
    """Dirs leased by the earlier in-dir scheme keep their protection:
    a live foreign-looking owner is not reaped, a dead one is."""
    import json
    import os
    import socket

    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid99999999-11111111"
    d.mkdir()
    (d / "_OWNER_LEASE.json").write_text(json.dumps({
        "host": socket.gethostname(), "boot_id": B._boot_id(),
        "pid": os.getpid(),
        "start_time": B._proc_start_time(os.getpid()),
    }))
    # in-dir lease says a LIVE process owns it, even though the dir
    # name's pid is dead: must not reap
    assert not B._lease_owner_dead(str(d), 99999999)


def test_lease_overflow_pid_conservative_not_crash(tmp_path):
    # ADVICE r8: a corrupt lease pid outside the C int range makes
    # os.kill raise OverflowError, which the malformed-lease net must
    # swallow — 'malformed lease -> conservative probe', never a crash
    # for every session sharing the parent path
    import os

    from chessmate_spark.ingest import bucketed as B

    d = tmp_path / "tbl-pid1-00000000"
    d.mkdir()
    _make_lease(d, pid=10**30)
    # conservative probe on the name pid (this process, alive) -> keep
    assert not B._lease_owner_dead(str(d), os.getpid())
