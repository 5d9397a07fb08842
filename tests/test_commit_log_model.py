"""Model-based randomized-interleaving test of the commit log's
maintenance triple (round-9 verdict #8): the pairwise races
(expire↔vacuum, vacuum↔writer, replay↔append) each have a targeted
test in test_commit_log.py; THIS locks in the module invariants under
arbitrary three-way maintenance-vs-writer-vs-reader interleavings — a
seeded-random sequence of append / append_idempotent / overwrite /
held-open PendingCommit / expire_versions / vacuum / reads per
schedule, ≥1k schedules, checked against an in-memory model of the
expected visible versions.

Every operation here pays METADATA cost only (the _metadata_append
posture: staging copies one pre-written template parquet dir), so a
thousand schedules of ~18 ops run in seconds-per-hundred, and the
invariants checked are exactly the docstrings' claims:

  I1  versions() only ever loses a PREFIX (expiry) — the head never
      regresses, surviving versions keep their numbers.
  I2  _state_at(v) succeeds for every visible v and returns exactly
      the file count the model predicts (appends accumulate,
      overwrite resets — fold integrity across checkpoints, expiry
      and checkpoint pruning).
  I3  every data directory referenced by any visible version exists
      on disk after every vacuum() — maintenance never reclaims live
      data, no matter how it interleaves with writers.
  I4  txn_version(app) equals the model's per-app high-water mark,
      and a replayed (app, version <= hwm) append_idempotent is a
      no-op — exactly-once survives expiry folding the markers into
      checkpoints.
  I5  a PendingCommit held across a vacuum(retention_seconds=0)
      either commits (staged dir survived) or raises CommitConflict
      LOUDLY (staged dir reclaimed) — never a silent manifest whose
      files are gone; which of the two is fully predicted by whether
      a vacuum ran while it was held.
  I6  the final head read().count() equals the model (data-level
      spot check, sampled schedules to keep Spark out of the hot
      loop).
  I7  (damage-mode schedules — odd seeds) after randomly deleting
      checkpoint files mid-schedule, every read either returns the
      MODEL-CORRECT state or raises loudly (RuntimeError) — never a
      wrong answer — and after repair_unreadable_segments() the log is
      consistent again: vacuum() succeeds and every surviving version
      folds to its model file count (the round-10 repair paths under
      randomized three-way interleaving, including the s-1 segment
      base and the stale-checkpoint rebirth cleanup).
"""

from __future__ import annotations

import os
import random
import shutil
import uuid

import pytest

from chessmate_spark.ingest.commit_log import (
    CommitConflict,
    CommitLogTable,
    PendingCommit,
)

N_SCHEDULES = int(os.environ.get("CM_MODEL_SCHEDULES", "1000"))
OPS_PER_SCHEDULE = 18
ROWS_PER_COMMIT = 2  # the template holds 2 rows


@pytest.fixture(scope="module")
def template(spark, tmp_path_factory):
    """One REAL staged parquet dir + its schema, copied by every
    schedule's stager — the only Spark write in the whole test."""
    base = tmp_path_factory.mktemp("cm_model_template")
    df = spark.range(0, ROWS_PER_COMMIT).selectExpr(
        "id", "CAST(id * 10 AS LONG) AS val"
    )
    boot = CommitLogTable(spark, str(base / "boot"))
    boot.append(df)
    rel = boot.manifest(1)["add"][0]
    return os.path.join(str(base / "boot"), rel), df.schema


class _Model:
    """Expected state: per-version file counts, per-app txn marks."""

    def __init__(self):
        self.nfiles = {}  # version -> expected file count at version
        self.txns = {}  # app -> high-water mark
        self.head = 0

    def commit(self, action, txn=None):
        self.head += 1
        prev = self.nfiles.get(self.head - 1, 0)
        self.nfiles[self.head] = 1 if action == "overwrite" else prev + 1
        if txn is not None:
            self.txns[txn[0]] = txn[1]
        return self.head


def _stager(table_path, template_rel):
    def fast_stage(df):
        rel = os.path.join("data", uuid.uuid4().hex)
        shutil.copytree(template_rel, os.path.join(table_path, rel))
        return rel

    return fast_stage


def _check_invariants(t, model, visible_before, damaged=False):
    visible = t.versions()
    # I1: between checks, versions only DISAPPEAR as a prefix (expiry)
    # and only APPEAR past the old head (commits); never regresses
    assert visible == sorted(visible)
    removed = [v for v in visible_before if v not in set(visible)]
    assert removed == visible_before[: len(removed)], (
        visible_before,
        visible,
    )
    if visible_before:
        added = [v for v in visible if v not in set(visible_before)]
        assert all(v > visible_before[-1] for v in added)
        assert visible and visible[-1] >= visible_before[-1]
    # I2 + I3 (+ I7): every visible version folds with the predicted
    # file count and every referenced data dir exists on disk; with
    # checkpoint damage a fold may instead fail LOUDLY — but only then,
    # and it must never return a wrong count
    for v in visible:
        try:
            files, _ = t._state_at(v)
        except RuntimeError:
            assert damaged, f"loud fold failure without damage at v{v}"
            continue
        assert len(files) == model.nfiles[v], (v, len(files))
        for rel in files:
            assert os.path.isdir(os.path.join(t.path, rel)), (v, rel)
    # I4: per-app high-water marks match the model at the head
    for app, hwm in model.txns.items():
        try:
            assert t.txn_version(app) == hwm, app
        except RuntimeError:
            assert damaged, "loud txn fold failure without damage"
    return visible



def _resync_after_repair(t, model):
    """A whole-segment repair drop can lower the head (the docstring's
    explicit worst case): version numbers below the drop get REUSED by
    the next life, and the folded txn marks regress with the head.
    The model follows the table here — the repair contract is 'the
    loss is explicit', not 'nothing moved'."""
    head = t.latest_version()
    if head < model.head:
        model.head = head
        for app in list(model.txns):
            got = t.txn_version(app)
            if got is None:
                del model.txns[app]
            else:
                model.txns[app] = got


def _run_schedule(spark, template, tmp_path, seed):
    rng = random.Random(seed)
    template_rel, schema = template
    root = os.path.join(str(tmp_path), f"t{seed}")
    t = CommitLogTable(
        spark, root, checkpoint_interval=rng.choice([1, 2, 3, 5])
    )
    t._stage = _stager(t.path, template_rel)
    model = _Model()
    pending = None  # (PendingCommit, vacuumed_since_staged)
    visible = []

    ops = ["append", "idem", "overwrite", "expire", "vacuum",
           "hold", "commit_held", "check"]
    weights = [4, 4, 2, 2, 2, 1, 2, 3]
    damage_mode = seed % 2 == 1  # odd seeds may delete checkpoints
    damaged = False
    if damage_mode:
        ops = ops + ["damage_ckpt", "repair"]
        weights = weights + [2, 2]
    for _ in range(OPS_PER_SCHEDULE):
        op = rng.choices(ops, weights)[0]
        if op == "append":
            t.append(spark.createDataFrame([], schema))
            model.commit("append")
        elif op == "idem":
            app = rng.choice(["a", "b"])
            hwm = model.txns.get(app)
            # the replay check folds the head state, so with checkpoint
            # damage the whole call may fail LOUDLY before writing
            # anything — allowed only while damaged (fail-loud, never
            # wrong), and the model then stays put
            if hwm is not None and rng.random() < 0.4:
                version = rng.randint(0, hwm)  # a REPLAY
                try:
                    got = t.append_idempotent(
                        spark.createDataFrame([], schema), app, version
                    )
                except RuntimeError:
                    assert damaged, "loud idem failure without damage"
                else:
                    assert got is None
            else:
                version = (hwm or 0) + rng.randint(1, 3)
                try:
                    got = t.append_idempotent(
                        spark.createDataFrame([], schema), app, version
                    )
                except RuntimeError:
                    assert damaged, "loud idem failure without damage"
                else:
                    assert got == model.commit(
                        "append", txn=(app, version)
                    )
        elif op == "overwrite":
            t.overwrite(spark.createDataFrame([], schema))
            model.commit("overwrite")
        elif op == "expire":
            t.expire_versions(keep_last=rng.randint(1, 5))
        elif op == "vacuum":
            try:
                t.vacuum(
                    retention_seconds=0,
                    keep_checkpoints=rng.randint(1, 2),
                )
            except RuntimeError:
                # the load-bearing-checkpoint abort: allowed only while
                # damaged, and reclamation stays wedged until repair
                assert damaged, "vacuum abort without damage"
            else:
                if pending is not None:
                    pending = (pending[0], True)
        elif op == "hold" and pending is None:
            pc = t.begin_append(spark.createDataFrame([], schema))
            pending = (pc, False)
        elif op == "commit_held" and pending is not None:
            pc, vacuumed = pending
            pending = None
            staged_alive = all(
                os.path.isdir(os.path.join(t.path, rel))
                for rel in pc.staged
            )
            if staged_alive:
                assert pc.commit() == model.commit("append")
            else:
                # I5: reclaimed stage fails LOUDLY, and only a vacuum
                # while held can have reclaimed it
                assert vacuumed
                with pytest.raises(CommitConflict):
                    pc.commit()
        elif op == "damage_ckpt":
            ckpts = t._checkpoint_versions()
            if ckpts:
                victim = rng.choice(ckpts)
                os.unlink(os.path.join(
                    t._commits_dir(), f"{victim:020d}.checkpoint.json"
                ))
                damaged = True
        elif op == "repair":
            t.repair_unreadable_segments()
            _resync_after_repair(t, model)
            # I7: repair returns the log to a consistent state — the
            # maintenance paths are unwedged and every surviving
            # version folds (checked below with damaged=False)
            t.vacuum(retention_seconds=0)
            if pending is not None:
                pending = (pending[0], True)
            damaged = False
            visible = _check_invariants(t, model, t.versions())
        elif op == "check":
            visible = _check_invariants(
                t, model, visible or t.versions(), damaged=damaged
            )
    if damaged:
        # end every damage-mode schedule healthy: repair + vacuum must
        # restore full invariants no matter what was deleted
        t.repair_unreadable_segments()
        _resync_after_repair(t, model)
        t.vacuum(retention_seconds=0)
        if pending is not None:
            pending = (pending[0], True)
        visible = t.versions()
    visible = _check_invariants(t, model, visible or t.versions())
    return t, model


def test_maintenance_writer_reader_interleavings(spark, tmp_path, template):
    data_checked = 0
    for seed in range(N_SCHEDULES):
        t, model = _run_schedule(spark, template, tmp_path, seed)
        if seed % 200 == 0 and t.versions():
            # I6: sampled data-level check — the head's rows are the
            # template replicated once per expected file (the head can
            # be below model.head after a damage-mode whole-segment
            # repair drop)
            head = t.versions()[-1]
            expected = ROWS_PER_COMMIT * model.nfiles[head]
            assert t.read().count() == expected, seed
            data_checked += 1
        # free the schedule's table before the next one
        shutil.rmtree(t.path, ignore_errors=True)
    assert data_checked >= N_SCHEDULES // 200
