"""CommitLogTable: the optimistic-concurrency multi-writer protocol
(ingest/commit_log.py).  The claims under test, per the round-7 verdict
task: two interleaved writers produce a serializable history (the loser
retries/rebases, no lost rows), readers never see a torn table, and
pinned-version reads are time-travel-equivalent to SnapshotManager."""

from __future__ import annotations

import os
import threading

import pytest

from chessmate_spark.ingest.commit_log import (
    CommitConflict,
    CommitLogTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CAST(id * 10 AS LONG) AS val"
    )


def test_append_read_roundtrip(spark, tmp_path):
    t = CommitLogTable(spark, str(tmp_path / "t"))
    assert t.latest_version() == 0
    v1 = t.append(_df(spark, 0, 5))
    assert v1 == 1
    v2 = t.append(_df(spark, 5, 8))
    assert v2 == 2
    assert {r["id"] for r in t.read().collect()} == set(range(8))
    assert {r["id"] for r in t.read(1).collect()} == set(range(5))


def test_interleaved_writers_serializable_no_lost_rows(spark, tmp_path):
    """The verdict's exact scenario: A and B both read head v1; A
    commits first; B's claim of v2 fails and REBASES onto A's commit —
    the final table holds every row from both writers, and the history
    is the serial order A then B."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))  # v1, the common base both writers read

    pending_b = t.begin_append(_df(spark, 100, 110))  # B stages at head=v1
    va = t.append(_df(spark, 50, 60))  # A wins v2
    vb = pending_b.commit()  # B detects the conflict, rebases to v3
    assert (va, vb) == (2, 3)
    got = {r["id"] for r in t.read().collect()}
    assert got == set(range(10)) | set(range(50, 60)) | set(range(100, 110))
    # serializable history: v2 == base + A, v3 == v2 + B
    assert {r["id"] for r in t.read(2).collect()} == set(range(10)) | set(
        range(50, 60)
    )
    actions = [(m["version"], m["parent"]) for m in t.history()]
    assert actions == [(1, 0), (2, 1), (3, 2)]


def test_threaded_contention_all_rows_survive(spark, tmp_path):
    """8 writers × genuine thread interleaving: every append lands in
    some serial position, versions are contiguous, zero rows lost."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 1))
    errors = []

    def writer(i):
        try:
            CommitLogTable(spark, str(tmp_path / "t")).append(
                _df(spark, 1000 * (i + 1), 1000 * (i + 1) + 10)
            )
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    assert t.versions() == list(range(1, 10))  # contiguous, no gaps
    got = {r["id"] for r in t.read().collect()}
    expect = {0} | {
        1000 * (i + 1) + j for i in range(8) for j in range(10)
    }
    assert got == expect


def test_overwrite_conflict_raises_not_rebases(spark, tmp_path):
    """A lost overwrite must surface, never silently drop the winner's
    commit (the lost-update anomaly)."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    head = t.latest_version()
    t.append(_df(spark, 5, 10))  # someone else moves the table
    with pytest.raises(CommitConflict):
        t.overwrite(_df(spark, 90, 95), expected_version=head)
    # unguarded overwrite of the CURRENT head succeeds and replaces
    v = t.overwrite(_df(spark, 90, 95))
    assert {r["id"] for r in t.read(v).collect()} == set(range(90, 95))
    # pinned read of the pre-overwrite version is untouched (snapshot
    # isolation: old versions are immutable)
    assert {r["id"] for r in t.read(2).collect()} == set(range(10))


def test_reader_pinned_during_concurrent_commits(spark, tmp_path):
    """A plan built against version N keeps reading N's files after
    later commits — the 'readers never see a torn table' half: the
    manifest appears atomically and data files are immutable."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    pinned = t.read(1)
    t.append(_df(spark, 5, 10))
    t.overwrite(_df(spark, 100, 101))
    assert {r["id"] for r in pinned.collect()} == set(range(5))


def test_schema_mismatch_append_refused(spark, tmp_path):
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    other = spark.range(0, 3).selectExpr("CAST(id AS STRING) AS id")
    with pytest.raises(ValueError, match="schema"):
        t.append(other)
    # overwrite IS the schema-change path
    v = t.overwrite(other)
    assert t.read(v).schema["id"].dataType.simpleString() == "string"


def test_vacuum_removes_only_orphans(spark, tmp_path):
    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    # a writer that died after staging: files exist, no manifest
    t._stage(_df(spark, 900, 905))
    removed = t.vacuum(retention_seconds=0)
    assert len(removed) == 1
    assert {r["id"] for r in t.read().collect()} == set(range(5))
    assert t.vacuum(retention_seconds=0) == []  # idempotent


def test_vacuum_reclaims_orphaned_temp_manifests(spark, tmp_path):
    """A writer killed between the .tmp-* manifest write and os.link
    leaves the temp file in _commits/ forever; vacuum must reclaim it
    (versions() already skips dot-files, so reads are unaffected)."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    commits = t._commits_dir()
    orphan = os.path.join(commits, ".tmp-deadbeef")
    with open(orphan, "w") as fh:
        fh.write("{}")
    removed = t.vacuum(retention_seconds=0)
    assert [r for r in removed if ".tmp-" in r]
    assert not os.path.exists(orphan)
    assert {r["id"] for r in t.read().collect()} == set(range(5))
    assert t.vacuum(retention_seconds=0) == []


def test_time_travel_parity_with_snapshot_manager(spark, tmp_path):
    """read(version) must equal a SnapshotManager snapshot taken at
    that moment — the commit log subsumes the snapshot time-travel
    contract (same rows, same schema) while adding multi-writer
    semantics on top."""
    from chessmate_spark.streaming.snapshots import SnapshotManager

    t = CommitLogTable(spark, str(tmp_path / "t"))
    mgr = SnapshotManager(spark, str(tmp_path / "snaps"))
    t.append(_df(spark, 0, 5))
    snap = mgr.create(t.read(1), "tbl", note="at v1")
    t.append(_df(spark, 5, 9))
    t.overwrite(_df(spark, 50, 52))
    restored = mgr.restore(snap.location)
    via_log = t.read(1)
    assert restored.schema == via_log.schema
    assert sorted(map(tuple, restored.collect())) == sorted(
        map(tuple, via_log.collect())
    )


def test_empty_append_and_empty_table_read(spark, tmp_path):
    t = CommitLogTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read()
    v = t.append(_df(spark, 0, 0))  # zero-row commit is a real version
    assert v == 1
    assert t.read(1).count() == 0
    assert [f.name for f in t.read(1).schema.fields] == ["id", "val"]


def test_append_idempotent_replay_skipped(spark, tmp_path):
    """The txnAppId/txnVersion contract: the first (app, version)
    commits; an exact replay is detected and skipped (returns None, no
    new version, no duplicate rows); versions are monotonic per app so
    an OLDER version replayed after a newer one is also skipped."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    v = t.append_idempotent(_df(spark, 0, 5), "app", 0)
    assert v == 1
    assert t.append_idempotent(_df(spark, 0, 5), "app", 0) is None
    v = t.append_idempotent(_df(spark, 5, 8), "app", 1)
    assert v == 2
    # restart from an older checkpoint: batch 0 replays AFTER batch 1
    assert t.append_idempotent(_df(spark, 0, 5), "app", 0) is None
    assert t.latest_version() == 2
    assert sorted(r["id"] for r in t.read().collect()) == list(range(8))
    # the txn marker is in the manifest (restart recovery reads it)
    assert t.manifest(1)["txn"] == {"app_id": "app", "version": 0}
    assert t.txn_version("app") == 1
    assert t.txn_version("other") is None


def test_append_idempotent_apps_are_independent(spark, tmp_path):
    """Two producers with distinct app_ids share version numbers
    without colliding; plain appends (no txn) never affect either."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    assert t.append_idempotent(_df(spark, 0, 2), "a", 0) == 1
    assert t.append_idempotent(_df(spark, 2, 4), "b", 0) == 2
    t.append(_df(spark, 4, 6))  # non-txn writer interleaves freely
    assert t.append_idempotent(_df(spark, 6, 8), "a", 1) == 4
    assert t.append_idempotent(_df(spark, 0, 2), "a", 0) is None
    assert t.append_idempotent(_df(spark, 2, 4), "b", 0) is None
    assert sorted(r["id"] for r in t.read().collect()) == list(range(8))


def test_append_idempotent_race_rechecked_in_claim_loop(spark, tmp_path):
    """A duplicate of the SAME txn landing between this writer's
    staging and its claim (two foreachBatch replicas racing) must not
    double-append: the claim loop re-checks the txn marker after every
    lost race, so the loser returns None and its staged files become
    vacuum()-reclaimable orphans."""
    t = CommitLogTable(spark, str(tmp_path / "t"))
    pending = t.begin_append(_df(spark, 0, 4))
    pending.txn = {"app_id": "app", "version": 0}
    # the concurrent duplicate wins the txn first
    assert t.append_idempotent(_df(spark, 0, 4), "app", 0) == 1
    assert pending.commit() is None
    assert t.latest_version() == 1
    assert sorted(r["id"] for r in t.read().collect()) == list(range(4))
    # the loser's orphaned staging dir (retention=0: test KNOWS no
    # writer is in flight)
    assert len(t.vacuum(retention_seconds=0)) == 1


def test_append_idempotent_int_app_id_normalized(spark, tmp_path):
    """Manifests store str(app_id); a raw int id must hit the SAME txn
    high-water mark on both the pre-staging fast path and txn_version —
    otherwise every replay stages a full parquet write just to be
    skipped in the claim loop, orphaning a staging dir per replay."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"))
    assert t.append_idempotent(_df(spark, 0, 3), 7, 0) == 1
    data_root = str(tmp_path / "t" / "data")
    before = len(os.listdir(data_root))
    assert t.append_idempotent(_df(spark, 0, 3), 7, 0) is None
    assert len(os.listdir(data_root)) == before  # fast path: no staging
    assert t.txn_version(7) == 0
    assert t.txn_version("7") == 0


def test_pending_commit_txn_normalized_at_write(spark, tmp_path):
    """The write boundary normalizes: a raw int app_id set directly on
    a PendingCommit writes a str marker, so both (str-normalizing)
    readers match it and a replay skips before staging."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"))
    p = t.begin_append(_df(spark, 0, 4))
    p.txn = {"app_id": 42, "version": 3}
    assert p.commit() == 1
    assert t.manifest(1)["txn"] == {"app_id": "42", "version": 3}
    assert t.txn_version(42) == 3
    data_root = str(tmp_path / "t" / "data")
    before = len(os.listdir(data_root))
    assert t.append_idempotent(_df(spark, 0, 4), 42, 3) is None
    assert len(os.listdir(data_root)) == before


# -- round-9: checkpointed metadata (verdict #1) and vacuum retention
# (verdict #6) -----------------------------------------------------------


def _metadata_append(t, tmp_path, template_rel, schema, n):
    """Drive ``n`` appends paying only the METADATA cost: each version
    references a fresh copy of one already-staged parquet dir, so the
    loop measures the commit protocol (manifest/checkpoint I/O), not
    Spark write throughput — exactly the long-lived-streaming-sink
    shape the round-8 verdict flagged as O(N^2)."""
    import os
    import shutil
    import uuid

    from chessmate_spark.ingest.commit_log import PendingCommit

    template = os.path.join(str(tmp_path / "t"), template_rel)
    for _ in range(n):
        rel = os.path.join("data", uuid.uuid4().hex)
        shutil.copytree(template, os.path.join(str(tmp_path / "t"), rel))
        assert PendingCommit(t, "append", [rel], schema).commit() is not None


def test_checkpoint_bounds_manifest_size_and_reads(spark, tmp_path):
    """The round-8 verdict's O(N^2) finding, closed: after 1,000+
    appends (a) every manifest is O(1) bytes (lists only its own add),
    (b) total manifest bytes are O(N), (c) a commit late in the history
    does the same bounded number of metadata reads as an early one, and
    (d) read()/txn_version() reconstruct from one checkpoint + at most
    checkpoint_interval tail manifests."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=10)
    df = _df(spark, 0, 2)
    t.append(df)  # v1: the one REAL staged write, reused as template
    template_rel = t.manifest(1)["add"][0]
    _metadata_append(t, tmp_path, template_rel, df.schema, 1049)
    head = t.latest_version()
    assert head == 1050

    commits = t._commits_dir()
    sizes = [
        os.path.getsize(os.path.join(commits, f"{v:020d}.json"))
        for v in (1, 100, 1000, head)
    ]
    # every manifest lists ONE staged dir: bytes are flat, not ~ version
    assert max(sizes) < 2048
    assert max(sizes) - min(sizes) < 256

    # reads-per-commit is flat: an append at head≈1050 touches the head
    # manifest + (every interval-th commit) one checkpoint fold — never
    # the whole history
    t.reset_metadata_reads()
    _metadata_append(t, tmp_path, template_rel, df.schema, 1)
    late_reads = t.metadata_reads
    assert late_reads <= t.checkpoint_interval + 5

    # reconstruction is checkpoint + bounded tail at ANY version
    t.reset_metadata_reads()
    files, _ = t._state_at(1045)
    assert t.metadata_reads <= t.checkpoint_interval + 5
    assert len(files) == 1045  # one dir per version: nothing dropped

    # the data itself round-trips: 1051 versions x 2 rows
    assert t.read().count() == 2 * t.latest_version()
    # time travel at and just past a checkpoint boundary
    assert t.read(10).count() == 20
    assert t.read(11).count() == 22


def test_checkpoint_folds_txn_high_water_marks(spark, tmp_path):
    """append_idempotent's replay check must be O(interval) via the
    checkpoint's folded txns map — including a replay of a batch that
    committed BEFORE the newest checkpoint (the restart-from-older-
    checkpoint case crossing a checkpoint boundary)."""
    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=4)
    for b in range(10):
        assert t.append_idempotent(_df(spark, b, b + 1), "app", b) == b + 1
    # checkpoints exist at 4 and 8; batch 2's marker lives only in the
    # pre-checkpoint tail that the fold must have absorbed
    assert t._checkpoint_versions() == [4, 8]
    assert t._read_checkpoint(8)["txns"] == {"app": 7}
    t.reset_metadata_reads()
    assert t.append_idempotent(_df(spark, 2, 3), "app", 2) is None
    assert t.metadata_reads <= t.checkpoint_interval + 5
    assert t.txn_version("app") == 9
    assert t.read().count() == 10  # exactly once despite the replay


def test_checkpoint_survives_overwrite_reset(spark, tmp_path):
    """An overwrite between checkpoints resets the FILE fold but keeps
    txn markers (Delta posture: SetTransaction survives data
    replacement); reads on both sides of the overwrite stay correct."""
    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=3)
    t.append_idempotent(_df(spark, 0, 5), "app", 0)  # v1
    t.append(_df(spark, 5, 8))  # v2
    t.overwrite(_df(spark, 100, 102))  # v3 — checkpoint fires here
    t.append(_df(spark, 102, 104))  # v4
    assert 3 in t._checkpoint_versions()
    assert {r["id"] for r in t.read().collect()} == {100, 101, 102, 103}
    assert {r["id"] for r in t.read(2).collect()} == set(range(8))
    assert t.txn_version("app") == 0  # marker survives the overwrite
    # replay after overwrite is still detected (no duplicate rows)
    assert t.append_idempotent(_df(spark, 0, 5), "app", 0) is None


def test_legacy_full_file_set_manifest_still_readable(spark, tmp_path):
    """Pre-checkpoint manifests listed the COMPLETE file set under
    ``files``; the fold treats one as a reset, so a table whose early
    history predates the delta format keeps reading correctly."""
    import json
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))  # v1
    t.append(_df(spark, 5, 8))  # v2
    # rewrite v2's manifest into the legacy shape (files = full set)
    m2 = t.manifest(2)
    m1 = t.manifest(1)
    legacy = {k: v for k, v in m2.items() if k != "add"}
    legacy["files"] = m1["add"] + m2["add"]
    with open(os.path.join(t._commits_dir(), f"{2:020d}.json"), "w") as fh:
        json.dump(legacy, fh)
    t.append(_df(spark, 8, 10))  # v3: new-format delta on legacy base
    assert {r["id"] for r in t.read().collect()} == set(range(10))
    assert {r["id"] for r in t.read(2).collect()} == set(range(8))
    # vacuum still sees legacy-referenced dirs as live
    assert t.vacuum(retention_seconds=0) == []
    assert {r["id"] for r in t.read().collect()} == set(range(10))


def test_vacuum_retention_spares_in_flight_writer(spark, tmp_path):
    """Verdict #6: vacuum with the default retention window must NOT
    reclaim a mid-commit writer's freshly staged dir — the pending
    commit survives vacuum and still lands; a genuinely old orphan
    (mtime back-dated past the window) is reclaimed in the same run."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    # an old dead writer's orphan: stage, then age it past the window
    old_rel = t._stage(_df(spark, 900, 905))
    old_full = os.path.join(str(tmp_path / "t"), old_rel)
    os.utime(old_full, (1, 1))
    # a LIVE writer mid-commit: staged seconds ago, manifest not linked
    pending = t.begin_append(_df(spark, 50, 55))
    removed = t.vacuum()  # default retention
    assert removed == [old_rel]
    assert pending.commit() == 2  # the in-flight commit still lands
    assert {r["id"] for r in t.read().collect()} == set(range(5)) | set(
        range(50, 55)
    )
    # a young .tmp manifest is likewise spared; an aged one is not
    young_tmp = os.path.join(t._commits_dir(), ".tmp-live")
    with open(young_tmp, "w") as fh:
        fh.write("{}")
    assert t.vacuum() == []
    os.utime(young_tmp, (1, 1))
    assert t.vacuum() == [os.path.join("_commits", ".tmp-live")]


def test_commit_fails_loudly_when_stage_vacuumed(spark, tmp_path):
    """Round-9 review: a begin_append held open past the retention
    window loses its staged dirs to vacuum(); commit() must then FAIL
    (the staged-paths-exist guard) instead of linking a manifest that
    references deleted files — which would be silent data loss
    surfacing only at read()."""
    import os

    import pytest

    t = CommitLogTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    pending = t.begin_append(_df(spark, 50, 55))
    # the writer stalls past the retention window: age its staged dir
    staged_full = os.path.join(str(tmp_path / "t"), pending.staged[0])
    os.utime(staged_full, (1, 1))
    removed = t.vacuum()  # default retention reclaims the aged stage
    assert pending.staged[0] in removed
    with pytest.raises(CommitConflict, match="no longer exists"):
        pending.commit()
    # the table is untouched: head is still v1 with the original rows
    assert t.latest_version() == 1
    assert {r["id"] for r in t.read().collect()} == set(range(5))


def test_vacuum_prunes_superseded_checkpoints(spark, tmp_path):
    """Round-9 review: each checkpoint stores the complete file set at
    its version, so unpruned checkpoints re-grow O(N^2/interval) total
    metadata bytes.  vacuum() keeps the newest ``keep_checkpoints`` and
    prunes the rest (once past retention); pruning is output-invisible
    — the latest read is unchanged and DEEP time travel (a version
    older than every surviving checkpoint) folds from version 0 and
    still answers correctly."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=2)
    for i in range(10):
        t.append(_df(spark, i * 10, i * 10 + 3))
    assert t._checkpoint_versions() == [2, 4, 6, 8, 10]
    before_deep = {r["id"] for r in t.read(version=3).collect()}
    before_head = {r["id"] for r in t.read().collect()}
    removed = t.vacuum(retention_seconds=0)
    assert t._checkpoint_versions() == [8, 10]
    assert any("checkpoint" in r for r in removed)
    # reads unchanged: head via the surviving checkpoints, v3 via the
    # full manifest fold (no checkpoint <= 3 survives)
    assert {r["id"] for r in t.read().collect()} == before_head
    assert {r["id"] for r in t.read(version=3).collect()} == before_deep
    # keep_checkpoints floors at 1: the newest always survives
    t.vacuum(retention_seconds=0, keep_checkpoints=0)
    assert t._checkpoint_versions() == [10]


def test_expire_versions_bounds_log_and_frees_history(spark, tmp_path):
    """expire_versions (the Delta logRetentionDuration posture): the
    manifest log itself is bounded — manifests older than the newest
    checkpoint covering the keep_last window are deleted.  Surviving
    versions stay readable (including ones between the expiry floor
    and the next checkpoint), expired versions fail with a clear
    error, txn high-water marks survive via the checkpoint fold, data
    referenced ONLY by expired versions becomes vacuum-reclaimable,
    and live data is protected by the checkpoint file lists joining
    vacuum's reference fold."""
    import os

    import pytest

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    t.append(_df(spark, 0, 3))                      # v1
    t.append_idempotent(_df(spark, 10, 13), "app", 7)   # v2, txn marker
    pre_overwrite_dirs = [t.manifest(1)["add"][0], t.manifest(2)["add"][0]]
    t.overwrite(_df(spark, 100, 103))               # v3 drops v1/v2 data
    for i in range(3, 25):
        t.append(_df(spark, i * 10, i * 10 + 2))    # v4..v25
    assert t.latest_version() == 25
    head_rows = {r["id"] for r in t.read().collect()}
    v16_rows = {r["id"] for r in t.read(version=16).collect()}

    removed = t.expire_versions(keep_last=8)
    # newest checkpoint <= 25-8+1=18 is 15: manifests 1..14 expire
    assert t.versions()[0] == 15
    assert len(removed) == 14
    # surviving reads unchanged — including v16 (floor < 16 < next ckpt)
    assert {r["id"] for r in t.read().collect()} == head_rows
    assert {r["id"] for r in t.read(version=16).collect()} == v16_rows
    with pytest.raises(FileNotFoundError, match="expired"):
        t.read(version=3)
    # txn high-water marks folded through checkpoints survive expiry:
    # the same (app, version) is still a replay, nothing double-appends
    assert t.append_idempotent(_df(spark, 900, 903), "app", 7) is None
    assert {r["id"] for r in t.read().collect()} == head_rows

    # vacuum after expiry: the pre-overwrite dirs (referenced only by
    # expired manifests) are reclaimed; live data survives because the
    # checkpoints' file lists join the reference fold
    reclaimed = t.vacuum(retention_seconds=0)
    assert set(pre_overwrite_dirs) <= set(reclaimed)
    assert {r["id"] for r in t.read().collect()} == head_rows
    # the floor checkpoint (15) is load-bearing and never pruned while
    # floor > 1, even though only the newest 2 are otherwise kept
    assert 15 in t._checkpoint_versions()
    assert {r["id"] for r in t.read(version=16).collect()} == v16_rows


def test_expire_versions_noop_without_covering_checkpoint(spark, tmp_path):
    """No checkpoint at or below head - keep_last + 1 -> no-op (never
    delete a manifest a read might need to fold from scratch)."""
    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=10)
    for i in range(5):
        t.append(_df(spark, i * 10, i * 10 + 2))
    assert t.expire_versions(keep_last=2) == []
    assert t.versions()[0] == 1
    import pytest

    with pytest.raises(ValueError):
        t.expire_versions(keep_last=0)


def test_expire_crash_prefix_leaves_consistent_log(spark, tmp_path):
    """expire_versions deletes manifests NEWEST-first, so a crash
    mid-run leaves segments this module fully handles: the intact
    prefix stays readable (fold from scratch), the deleted middle
    fails with the clear expired error, the suffix reads via its
    (protected) base checkpoint, vacuum never prunes that base, and a
    re-run of expire completes the job."""
    import os

    import pytest

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(25):
        t.append(_df(spark, i * 10, i * 10 + 2))
    # simulate the crash prefix of expire(keep_last=8) (cut=15,
    # newest-first): manifests 14..8 deleted, 1..7 still present
    for v in range(14, 7, -1):
        os.unlink(
            os.path.join(t._commits_dir(), f"{v:020d}.json")
        )
    assert t.versions() == list(range(1, 8)) + list(range(15, 26))
    # prefix folds from scratch / ckpt 5; suffix via base ckpt 15
    assert t.read(version=3).count() == 6
    assert t.read(version=7).count() == 14
    assert t.read(version=16).count() == 32
    with pytest.raises(FileNotFoundError, match="expired"):
        t.read(version=10)
    # ckpt 15 is the suffix segment's base -> protected; 5/10 are
    # redundant accelerators -> prunable
    assert t._segment_bases() == ({15}, [])
    t.vacuum(retention_seconds=0)
    assert 15 in t._checkpoint_versions()
    assert t.read(version=16).count() == 32
    assert t.read(version=3).count() == 6  # prefix still foldable
    # a re-run completes the expiry
    t.expire_versions(keep_last=8)
    assert t.versions()[0] == 15


def test_vacuum_aborts_when_load_bearing_checkpoint_missing(spark, tmp_path):
    """A missing base checkpoint of an expired-prefix segment must
    ABORT vacuum (continuing would drop that segment's live files from
    the reference fold and reclaim live data); reads of the segment
    fail with the clear missing-base error rather than a bare
    missing-manifest one."""
    import os

    import pytest

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(12):
        t.append(_df(spark, i * 10, i * 10 + 2))
    t.expire_versions(keep_last=3)  # cut=10: manifests 1..9 expired
    assert t.versions()[0] == 10
    os.unlink(os.path.join(t._commits_dir(), f"{10:020d}.checkpoint.json"))
    # also drop the hint so the scan path (not a stale hint) is tested
    os.unlink(os.path.join(t._commits_dir(), "_last_checkpoint"))
    with pytest.raises(RuntimeError, match="load-bearing checkpoint"):
        t.vacuum(retention_seconds=0)
    # the segment's reads fail with the real story too: the fold from
    # the (lower, gap-crossing) checkpoint hits an expired manifest
    with pytest.raises(RuntimeError, match="cannot reconstruct"):
        t.read(version=10)


def test_repair_drops_only_unreadable_versions(spark, tmp_path):
    """Round-9 ADVICE: a lost base checkpoint used to wedge vacuum()
    forever.  repair_unreadable_segments() drops exactly the versions
    that already had no reconstruction path — those below the damaged
    segment's first surviving checkpoint — after which reads of the
    surviving versions and vacuum() work again."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(23):
        t.append(_df(spark, i * 10, i * 10 + 2))
    t.expire_versions(keep_last=5)  # cut=15: manifests 1..14 expired
    assert t.versions()[0] == 15
    os.unlink(os.path.join(t._commits_dir(), f"{15:020d}.checkpoint.json"))
    with pytest.raises(RuntimeError, match="load-bearing checkpoint"):
        t.vacuum(retention_seconds=0)
    removed = t.repair_unreadable_segments()
    # versions 15..19 had no base; 20 (a surviving checkpoint) rescues
    # 20..23
    assert sorted(int(p.split("/")[-1][:-5]) for p in removed) == [
        15, 16, 17, 18, 19,
    ]
    assert t.versions() == [20, 21, 22, 23]
    assert t.read().count() == 23 * 2  # head still has every append's rows
    assert t.read(version=20).count() == 20 * 2
    with pytest.raises(FileNotFoundError):
        t.read(version=17)  # now an ordinary expired version
    t.vacuum(retention_seconds=0)  # unwedged
    assert t.read().count() == 23 * 2  # vacuum touched no live data
    assert t.repair_unreadable_segments() == []  # healthy log: no-op


def test_repair_drops_whole_segment_without_any_checkpoint(spark, tmp_path):
    """A damaged segment with NO surviving checkpoint is dropped
    entirely — the head was already unreadable; repair makes the loss
    explicit (empty log here) instead of leaving vacuum wedged."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(12):
        t.append(_df(spark, i * 10, i * 10 + 2))
    t.expire_versions(keep_last=3)  # cut=10
    os.unlink(os.path.join(t._commits_dir(), f"{10:020d}.checkpoint.json"))
    os.unlink(os.path.join(t._commits_dir(), "_last_checkpoint"))
    with pytest.raises(RuntimeError):
        t.read(version=12)
    removed = t.repair_unreadable_segments()
    # versions 10..12, plus the stale v5 checkpoint (above the new
    # head 0 — left behind it would poison a reborn log's v5)
    assert len(removed) == 4
    assert t.versions() == []
    assert t.latest_version() == 0
    t.vacuum(retention_seconds=0)  # reclaims everything, no abort
    import os as _os

    assert _os.listdir(_os.path.join(str(tmp_path / "t"), "data")) == []


def _metadata_sink_table(spark, tmp_path, **kwargs):
    """A CommitLogTable whose staging cost is one copytree — the
    _metadata_append posture applied to the sink path: drive the REAL
    append_idempotent/policy protocol for hundreds of micro-batches
    while paying metadata cost only (Spark parquet write throughput is
    tested elsewhere)."""
    import shutil
    import uuid

    t = CommitLogTable(spark, str(tmp_path / "t"), **kwargs)
    t.append(_df(spark, 0, 2))  # v1: the one REAL staged write
    template = os.path.join(str(tmp_path / "t"), t.manifest(1)["add"][0])

    def fast_stage(df):
        rel = os.path.join("data", uuid.uuid4().hex)
        shutil.copytree(template, os.path.join(str(tmp_path / "t"), rel))
        return rel

    t._stage = fast_stage
    return t


def test_retention_policy_bounds_metadata_over_500_batches(spark, tmp_path):
    """Round-9 verdict #2: retention wired into the sink.  500
    micro-batches through streaming_commit_sink with an attached
    RetentionPolicy keep the on-disk manifest+checkpoint FILE COUNT
    bounded (a policy-free week-long 30 s stream accumulates ~20k),
    while exactly-once replay detection survives every expiry —
    including a replay racing right behind a policy run, whose txn
    marker now lives only in the folded checkpoints."""
    from chessmate_spark.ingest.commit_log import (
        RetentionPolicy,
        streaming_commit_sink,
    )

    t = _metadata_sink_table(spark, tmp_path, checkpoint_interval=5)
    # retention_seconds=0: this sink is the table's only writer
    sink = streaming_commit_sink(
        t,
        "stream_app",
        RetentionPolicy(
            every_n_commits=10, keep_last=10, retention_seconds=0
        ),
    )
    df = _df(spark, 0, 2)
    bound = 45  # ~ keep_last + every_n + interval + checkpoints + hint
    peak = 0
    for batch_id in range(500):
        assert sink(df, batch_id) is not None
        if batch_id % 25 == 24:
            n_files = len(os.listdir(t._commits_dir()))
            peak = max(peak, n_files)
            assert n_files <= bound, (batch_id, n_files)
    assert peak > 0
    head = t.latest_version()
    assert head == 501  # v1 template + 500 micro-batches

    # the file count is FLAT, not merely sublinear: a second 100
    # batches cannot grow the peak footprint
    for batch_id in range(500, 600):
        sink(df, batch_id)
    assert len(os.listdir(t._commits_dir())) <= bound

    # exactly-once survives expiry: batch 250's manifest is long
    # expired, its marker folded through the checkpoints
    assert t.txn_version("stream_app") == 599
    head = t.latest_version()
    assert sink(df, 250) is None
    assert sink(df, 599) is None
    assert t.latest_version() == head

    # a replay landing IMMEDIATELY after maintenance passes (the
    # policy-run-races-replayed-batch window) — and the RESTART case:
    # a fresh sink closure (new driver life) must keep maintaining,
    # which the persistent manifest-count trigger guarantees
    sink = streaming_commit_sink(
        t,
        "stream_app",
        RetentionPolicy(
            every_n_commits=10, keep_last=10, retention_seconds=0
        ),
    )
    for batch_id in range(600, 610):
        sink(df, batch_id)
    assert len(os.listdir(t._commits_dir())) <= bound  # restart-proof
    assert t.latest_version() == 611  # 610 was a trigger point
    assert sink(df, 609) is None
    assert t.txn_version("stream_app") == 609

    # no rows were ever dropped by retention: every committed batch's
    # 2 rows are present exactly once
    assert t.read().count() == 2 * t.latest_version()


def test_retention_policy_replay_never_triggers_maintenance(
    spark, tmp_path
):
    """A replayed batch commits nothing, so it must not consult the
    policy at all (maintenance is keyed on the persistent manifest
    count, and only a COMMITTED batch reaches the check)."""
    from chessmate_spark.ingest.commit_log import (
        RetentionPolicy,
        streaming_commit_sink,
    )

    t = _metadata_sink_table(spark, tmp_path, checkpoint_interval=2)
    policy = RetentionPolicy(
        every_n_commits=2, keep_last=2, retention_seconds=0
    )
    ran = []
    orig = policy.maintain
    policy.maintain = lambda table: ran.append(orig(table)) or True
    sink = streaming_commit_sink(t, "app", policy)
    df = _df(spark, 0, 2)
    for batch_id in range(6):
        sink(df, batch_id)
    # consulted once per committed batch; fires whenever the manifest
    # count reaches keep_last + every_n (= 4)
    assert len(ran) == 6
    assert any(ran)
    before = len(ran)
    assert sink(df, 3) is None  # replay
    assert len(ran) == before  # maintenance not even consulted


def test_retention_cadence_survives_interleaved_writer(spark, tmp_path):
    """Round-10 review: a version-modulo cadence breaks under a second
    writer — e.g. alternating commits keep the stream's versions
    permanently odd, so version % 2 NEVER fires and manifests grow
    unboundedly.  The cadence is the sink's own committed-batch count,
    so maintenance fires on schedule regardless of interleaving."""
    from chessmate_spark.ingest.commit_log import (
        RetentionPolicy,
        streaming_commit_sink,
    )

    t = _metadata_sink_table(spark, tmp_path, checkpoint_interval=2)
    policy = RetentionPolicy(
        every_n_commits=2, keep_last=2, retention_seconds=0
    )
    ran = []
    orig = policy.maintain
    policy.maintain = lambda table: ran.append(orig(table)) or True
    sink = streaming_commit_sink(t, "app", policy)
    df = _df(spark, 0, 2)
    for batch_id in range(6):
        t.append(df)  # the interleaved OTHER writer
        sink(df, batch_id)  # stream versions are always even here
    # maintenance RAN repeatedly (the count-based trigger sees the
    # other writer's manifests too — the on-disk bound is what is
    # being enforced), and the manifest count stays bounded
    assert len(ran) == 6 and any(ran)
    assert len(t.versions()) <= 2 + 2 + 2  # keep_last + slack + interval
    assert t.read().count() == 2 * t.latest_version()


def test_retention_policy_validates(spark):
    from chessmate_spark.ingest.commit_log import RetentionPolicy

    with pytest.raises(ValueError):
        RetentionPolicy(every_n_commits=0)
    with pytest.raises(ValueError):
        RetentionPolicy(keep_last=0)


def test_checkpoint_at_segment_start_minus_one_serves_segment(
    spark, tmp_path
):
    """Round-10 review: a power-loss gap can leave a segment [s..e]
    whose manifest at the checkpointed cut is gone but whose s-1
    checkpoint survives — _state_at folds that checkpoint forward
    through the segment's intact manifests, so every surviving version
    IS readable.  vacuum() must treat the s-1 checkpoint as the
    (protected) base instead of aborting, and
    repair_unreadable_segments() must not touch the segment (it used
    to delete all of it below the first in-segment checkpoint,
    destroying readable history)."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(23):
        t.append(_df(spark, i * 10, i * 10 + 2))
    t.expire_versions(keep_last=5)  # cut=15: versions 15..23 survive
    # simulate the power-loss gap: manifest 15 lost, checkpoint 15
    # survives -> segment [16..23] with its base at s-1 = 15
    os.unlink(os.path.join(t._commits_dir(), f"{15:020d}.json"))
    assert t.versions()[0] == 16
    assert t.read(version=16).count() == 16 * 2  # folds from ckpt 15
    assert t.read().count() == 23 * 2
    assert t.repair_unreadable_segments() == []  # nothing is damaged
    t.vacuum(retention_seconds=0)  # no abort; ckpt 15 is protected
    assert t.read(version=16).count() == 16 * 2  # still readable
    assert t.read().count() == 23 * 2
    assert 15 in t._checkpoint_versions()  # the base was never pruned


def test_repair_removes_stale_checkpoints_for_rebirth(spark, tmp_path):
    """Round-10 review: dropping a whole segment used to leave its
    checkpoints (and the _last_checkpoint hint) behind; a REBORN log
    reusing those version numbers would fold the old life's file list
    into new reads — silently wrong rows, made permanent by
    _write_checkpoint's EEXIST tolerance.  Repair now removes
    checkpoints past the new head, so the rebirth is clean."""
    import os

    t = CommitLogTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(12):
        t.append(_df(spark, i * 10, i * 10 + 2))
    t.expire_versions(keep_last=3)  # cut=10
    os.unlink(os.path.join(t._commits_dir(), f"{10:020d}.checkpoint.json"))
    os.unlink(os.path.join(t._commits_dir(), "_last_checkpoint"))
    removed = t.repair_unreadable_segments()
    assert t.versions() == []  # whole segment dropped
    # the stale accelerator checkpoint (v5, above the new head 0) went
    # with it — left behind it would poison version 5 of the next life
    assert t._checkpoint_versions() == []
    assert any(p.endswith(".checkpoint.json") for p in removed)
    # rebirth: fresh appends take versions 1.. and read THEIR rows
    for i in range(6):
        t.append(_df(spark, 1000 + i, 1000 + i + 1))
    assert t.versions()[0] == 1
    assert t.read(version=5).count() == 5  # new life's v5, not the old
    rows = {r["id"] for r in t.read().collect()}
    assert rows == {1000 + i for i in range(6)}  # no old-life rows


def test_cells_route_empty_train_returns_empty(spark):
    """Round-10 review: the empty-train early return in _cell_paired
    lost the _rowid/_e_rowid columns the caller now selects — the
    cells route crashed on an empty corpus instead of returning the
    empty flagged set."""
    from chessmate_spark.operators.dedup import semantic_decontaminate

    tr = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    ev = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<double>"
    )
    out = semantic_decontaminate(
        tr, ev, "vec_id", "embedding", 0.5, route="cells"
    )
    assert out.count() == 0
    assert out.columns == [
        "vec_id", "n_matches", "max_cos", "contaminated_by"
    ]
