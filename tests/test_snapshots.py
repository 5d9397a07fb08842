"""S9 snapshot create/list/restore tests (repo_qdrant.ml:262-343)."""

import pytest

from pyspark.sql import functions as F

from chessmate_spark.streaming.snapshots import SnapshotManager


@pytest.fixture()
def mgr(spark, tmp_path):
    return SnapshotManager(spark, str(tmp_path / "snapshots"))


def test_create_list_restore_roundtrip(spark, mgr):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    info = mgr.create(df, "vectors", snapshot_name="before-reindex")
    assert info.name == "before-reindex"
    assert info.size_bytes > 0
    listed = mgr.list("vectors")
    assert [s.name for s in listed] == ["before-reindex"]
    restored = mgr.restore(info.location)
    assert restored.count() == 100
    assert restored.agg(F.sum("v")).collect()[0][0] == 9900


def test_auto_naming_increments(spark, mgr):
    df = spark.range(5)
    a = mgr.create(df, "vectors")
    b = mgr.create(df, "vectors")
    assert a.name == "vectors-snap-0001"
    assert b.name == "vectors-snap-0002"
    assert [s.name for s in mgr.list("vectors")] == [a.name, b.name]


def test_snapshots_are_immutable(spark, mgr):
    df = spark.range(5)
    info = mgr.create(df, "vectors", snapshot_name="fixed")
    with pytest.raises(FileExistsError):
        mgr.create(df, "vectors", snapshot_name="fixed")
    # the original content is untouched
    assert mgr.restore(info.location).count() == 5


def test_list_empty_collection(mgr):
    assert mgr.list("nothing") == []


def test_restore_missing_location(mgr):
    with pytest.raises(FileNotFoundError):
        mgr.restore("/nonexistent/snapshot/path")


def test_snapshot_isolates_from_source_changes(spark, mgr, tmp_path):
    src = tmp_path / "live"
    spark.range(10).write.parquet(str(src))
    live = spark.read.parquet(str(src))
    info = mgr.create(live, "positions")
    # "collection" moves on: overwrite live data with fewer rows
    spark.range(3).write.mode("overwrite").parquet(str(src))
    assert mgr.restore(info.location).count() == 10


def test_journal_records_creates_with_notes(spark, mgr):
    df = spark.range(3)
    mgr.create(df, "vectors", note="before reindex")
    mgr.create(df, "vectors")          # no note
    mgr.create(df, "vectors", note="  ")  # blank note dropped
    journal = mgr.read_journal("vectors")
    assert [r["name"] for r in journal] == [
        "vectors-snap-0001", "vectors-snap-0002", "vectors-snap-0003"
    ]
    assert journal[0]["note"] == "before reindex"
    assert "note" not in journal[1]
    assert "note" not in journal[2]
    assert all(r["recorded_at"] for r in journal)


def test_journal_empty_for_unknown_collection(mgr):
    assert mgr.read_journal("nothing") == []
