"""Commit-log-backed incremental dedup lifecycle — the loop a 100 TB
pipeline actually runs day to day:

    ingest batch → dedup against the persisted signature store →
    append the batch's state to the store EXACTLY ONCE → repeat.

Each increment pays one corpus scan for the BATCH only (the store holds
every earlier document's ``(_id, _shingles, _sig)`` state, computed once
per document lifetime — ``operators/dedup.py minhash_signature_state``),
and the state append rides the commit log's txn markers
(``append_idempotent``), so a replayed batch — a restarted driver, an
at-least-once upstream queue — cannot double-append its state: the
store always mirrors the ingested corpus exactly once, whatever the
delivery semantics upstream.

Reference analog: the re-ingest hygiene the reference gets from
scripts/prune_pending_jobs.sh plus vector-id idempotency on re-ingest
(SURVEY §2.9 Q6) — there the guarded resource is the jobs queue /
vector store; here it is the dedup state itself.

Scale shape (round 13): the batch's band table is BROADCAST into the
band-bucket join, so the store side streams map-side — no exchange
carries existing-side band rows and nothing corpus-sized is persisted
per increment; the exact-verify exchange is candidate-pruned
(broadcast semi-join by default; bloom opt-in past broadcast size);
the state append writes O(batch) rows through one commit-log
transaction.  The only corpus-sized work per increment is two
column-pruned scans of the store's parquet state.

Dial stability contract: every increment must run the SAME
``(shingle_n, num_hashes)`` the store was built with — the store
persists its dial and the increment validates it with a one-row probe,
so a drifted dial (e.g. a corpus-adaptive banding stepping a decade
bracket) fails loudly instead of silently banding mismatched
signatures.  A pipeline that wants adaptive banding re-bands FROM the
stored signatures (bands must divide ``num_hashes``); a changed
``num_hashes``/``shingle_n`` means a store rebuild — the same contract
an IVF index has with its frozen centroids (v14).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    incremental_minhash_dedup,
    minhash_signature_state,
)
from .commit_log import CommitLogTable

# One txn app-id per signature store: batch ids are the monotonic txn
# versions, so the commit log's replay check is the exactly-once gate.
SIGNATURE_STORE_APP = "minhash-signature-store"

# Verify-scan pruning pays one extra Spark action per increment (the
# candidate-bucket collect that builds the IN filter), so it engages
# only when the store is big enough for skipped row groups to buy more
# than that action costs.  The gate is MEASURED, not assumed — parquet
# footer row counts, a driver-side metadata read (the graph/BPE
# driver-route convention).  256k rows ≈ tens of MB of shingle arrays;
# below that the whole store scans in a couple of tasks either way.
_VERIFY_PRUNE_MIN_ROWS = 1 << 18


def _dial_meta(
    shingle_n: int,
    num_hashes: int,
    bands: "Optional[int]" = None,
    bucket_count: "Optional[int]" = None,
) -> dict:
    """The store's dial as commit-manifest metadata — recorded on every
    append so later increments can validate the dial with a driver-side
    manifest read instead of a one-row Spark probe (round 14; the dial
    columns in the state rows remain the fallback for stores written
    before the metadata existed).

    Round 15 adds the LAYOUT dials: ``bands`` (the banding the rows'
    precomputed ``_bands`` keys were built with — recorded only while
    EVERY append so far used the same value, so a re-banded increment
    poisons it to None and later increments fall back to expression
    banding from ``_sig``) and ``bucket_count`` (the id-hash modulus of
    the ``_bucket`` clustering column — fixed at store creation)."""
    dial = {"shingle_n": int(shingle_n), "num_hashes": int(num_hashes)}
    if bands is not None:
        dial["bands"] = int(bands)
    if bucket_count is not None:
        dial["bucket_count"] = int(bucket_count)
    return {"dial": dial}


def _manifest_dial(store: CommitLogTable, version: int) -> "Optional[dict]":
    """The dial recorded in ``version``'s manifest metadata, or None
    when the manifest is missing/pre-round-14 (no ``meta.dial``)."""
    if version <= 0:
        return None
    try:
        return (store.manifest(version).get("meta") or {}).get("dial")
    except FileNotFoundError:
        return None


def _store_layout(
    store: CommitLogTable, version: int, bands: int
) -> "tuple[Optional[int], Optional[int], Optional[int]]":
    """(state_bands, state_buckets, meta_bands) describing how the next
    batch's state must be built against the store at ``version`` — all
    driver-side manifest reads, zero Spark jobs.

    * EMPTY store: full round-15 layout — precomputed ``_bands`` for
      the increment's banding, ``_bucket`` at the env-sized modulus.
    * Store whose schema carries the layout columns: match them (the
      append schema must equal the table schema); ``_bands`` is built
      with the increment's ``bands``, and ``meta_bands`` says whether
      EVERY prior append used that same banding (the induction
      ``_dial_meta`` documents) — when it differs, the recorded value
      poisons to None so no later increment trusts mixed keys.
    * LEGACY store (no layout columns): build the legacy shape — a
      widened append would be refused by the commit log's schema
      equality check.
    """
    from ..operators.dedup import sig_store_buckets

    if version <= 0:
        return int(bands), sig_store_buckets(), None
    try:
        fields = {
            f["name"]
            for f in store.manifest(version)["schema"].get("fields", [])
        }
    except FileNotFoundError:
        fields = set()
    dial = _manifest_dial(store, version) or {}
    state_bands = int(bands) if "_bands" in fields else None
    state_buckets = (
        int(dial["bucket_count"])
        if "_bucket" in fields and dial.get("bucket_count") is not None
        else None
    )
    meta_bands = dial.get("bands")
    return state_bands, state_buckets, meta_bands


def _store_bucket_count(
    store: CommitLogTable, version: int
) -> "Optional[int]":
    """The ``_bucket`` modulus for appends against the store at
    ``version`` — env-sized for a fresh store, the recorded value for
    a round-15 store, None for a legacy layout."""
    _, buckets, _ = _store_layout(store, version, bands=4)
    return buckets


def open_signature_store(
    spark: SparkSession, path: str, checkpoint_interval: int = 10
) -> CommitLogTable:
    """The signature store as a commit-log table at ``path`` — creates
    the directory layout on first open; any number of writers across
    processes may hold instances (the commit log's multi-writer
    contract).  Staged state is range-clustered by the ``_bucket``
    id-hash column (round 15) so an increment's verify scan prunes to
    candidate row groups; stores whose state predates the column stage
    exactly as before (``cluster_by`` is a no-op without the column)."""
    return CommitLogTable(
        spark, path, checkpoint_interval, cluster_by="_bucket"
    )


def bootstrap_store(
    store: CommitLogTable,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    app_id: str = SIGNATURE_STORE_APP,
    batch_id: int = 0,
    bands: int = 4,
) -> Optional[int]:
    """Seed a signature store with an already-curated corpus's state
    WITHOUT a dedup pass — the backfill path (the corpus was deduped by
    d2/d8 when it was assembled; re-verifying it against itself at
    bootstrap would be a full-corpus job, not an increment).  One
    corpus scan, one commit-log transaction, exactly-once under
    ``(app_id, batch_id)`` like any increment — a replayed bootstrap
    is skipped, not double-appended.  ``bands`` sizes the precomputed
    ``_bands`` keys (round 15) — pass the banding the increments will
    run, or they fall back to re-banding from ``_sig``."""
    head = store.latest_version()
    state_bands, bucket_count, meta_bands = _store_layout(
        store, head, bands
    )
    rec_bands = (
        state_bands
        if head == 0 or meta_bands == state_bands
        else None
    )
    state = minhash_signature_state(
        corpus, id_col, text_col, shingle_n, num_hashes,
        bands=state_bands, bucket_count=bucket_count,
    )
    return store.append_idempotent(
        state, app_id, batch_id, snapshot=head,
        meta=_dial_meta(shingle_n, num_hashes, rec_bands, bucket_count),
    )


@dataclass
class DedupIncrement:
    """Result of one lifecycle increment.

    ``duplicates`` is MATERIALIZED (localCheckpoint) before the state
    append runs, so it is pinned to the pre-append store snapshot;
    ``appended_version`` is the commit-log version the batch's state
    landed as, or None when the commit log detected a REPLAY (this
    ``batch_id`` already committed) and skipped the append."""

    duplicates: DataFrame
    appended_version: Optional[int]
    batch_id: int


def _version_before_txn(
    store: CommitLogTable, app_id: str, batch_id: int
) -> int:
    """The commit-log version the ORIGINAL increment for
    ``(app_id, batch_id)`` read.  Preferred source: the ``snapshot``
    field the original increment recorded in its own txn marker (round
    13, closing the ADVICE hazard) — exact even when a CONCURRENT
    append landed between the original's ``latest_version()`` read and
    its claim, because ``append_idempotent`` rebases on conflict and
    the commit's parent then differs from the version actually read.
    Fallback for pre-round-13 manifests (no ``snapshot`` field): the
    commit's parent, correct under a single writer per store.
    O(versions) manifest walk — replays are the rare path; fails
    loudly when the original commit's manifest has been expired (the
    snapshot needed to reproduce the original output no longer exists,
    and a silent head-read would produce DIFFERENT output for the same
    batch_id)."""
    app_id = str(app_id)
    for v in reversed(store.versions()):
        t = store.manifest(v).get("txn") or {}
        if (
            str(t.get("app_id")) == app_id
            and int(t.get("version", -1)) == int(batch_id)
        ):
            snap = t.get("snapshot")
            return int(snap) if snap is not None else v - 1
    raise LookupError(
        f"no committed manifest carries txn ({app_id}, {batch_id}) — "
        "the original increment's commit was expired or never landed; "
        "cannot reproduce its snapshot"
    )


def dedup_increment(
    store: CommitLogTable,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    batch_id: int,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    app_id: str = SIGNATURE_STORE_APP,
    prune: str = "broadcast",
    band_join: str = "broadcast",
) -> DedupIncrement:
    """ONE turn of the production loop: dedup ``batch`` against the
    store's current snapshot (plus within-batch, d1's min-id rule),
    then append the batch's signature state exactly once under
    ``(app_id, batch_id)``.

    ``batch_id`` must be monotonic per store (ingest sequence numbers,
    streaming batch ids) — a replayed id is detected by the commit log
    and the append is skipped, so the whole call is IDEMPOTENT even
    when LATER batches have already committed: a detected replay reads
    the store AT THE VERSION the original increment read (commit-log
    time travel via the batch's own txn manifest), not the head, so
    the duplicates frame recomputes identically to the original run —
    the restart-from-older-checkpoint case ``append_idempotent``'s
    ``>=`` check documents.

    The store holds the FULL ingested corpus's state (duplicates
    included, exactly as it was handed in): that is what makes N
    increments equal the from-scratch recompute over the concatenated
    batches — a batch doc whose best match is an earlier DUPLICATE
    still resolves to the same flag either way (the d28 entry pins this
    against a two-increment DuckDB mirror).  A kept-only store is a
    caller policy: filter the batch before calling.

    The batch's shingle scan is paid ONCE: its state frame is persisted,
    feeds the increment (``batch_state=``), and is the exact frame the
    append stages to parquet.

    ``prune``/``band_join`` forward to
    :func:`incremental_minhash_dedup` — both default to the broadcast
    postures (batch-bounded band join, candidate-bounded verify);
    the shuffle/bloom alternates exist for a batch or candidate set
    past broadcast size, at which point the job is a backfill."""
    prior = store.txn_version(app_id)
    if prior is not None and prior >= batch_id:
        # REPLAY: pin the snapshot the original increment read —
        # recorded in the batch's own txn manifest (parent-of-commit
        # fallback for pre-round-13 stores) — so the recompute is
        # identical even though later batches have since landed
        snap = _version_before_txn(store, app_id, batch_id)
    else:
        snap = store.latest_version()
    # layout decision BEFORE the batch state is built (round 15): the
    # append schema must equal the store's, so a legacy store keeps
    # the legacy shape while a round-15 store carries precomputed
    # ``_bands`` (this increment's banding) and the ``_bucket``
    # clustering column at the store's recorded modulus
    state_bands, bucket_count, meta_bands = _store_layout(
        store, snap, bands
    )
    b_state = minhash_signature_state(
        batch, id_col, text_col, shingle_n, num_hashes,
        bands=state_bands, bucket_count=bucket_count,
    ).persist()
    try:
        # dial validation (round 14): the batch's state is built RIGHT
        # HERE with the increment's own dial, so its one-row probe is a
        # tautology; the store's dial is proven by the manifest
        # metadata recorded at append time when available (a mismatch
        # fails loudly without any Spark job), and only a pre-metadata
        # store still pays the one-row probe.
        dial = {"shingle_n": int(shingle_n), "num_hashes": int(num_hashes)}
        stored_dial = _manifest_dial(store, snap)
        stored_core = (
            {k: stored_dial.get(k) for k in ("shingle_n", "num_hashes")}
            if stored_dial is not None
            else None
        )
        if stored_core is not None and stored_core != dial:
            raise AssertionError(
                f"signature store at {store.path} was built with dial "
                f"{stored_core} but the increment runs {dial}: banding "
                "mismatched signatures is meaningless — rebuild the "
                "store or match the dial"
            )
        validate_dials = snap > 0 and stored_dial is None
        if snap == 0:
            existing_state = b_state.filter(F.lit(False))
        else:
            # the batch's OWN ids are excluded from the existing side
            # (broadcast anti join — the batch is the small side by
            # construction): belt-and-braces against a batch whose ids
            # already reached the store outside this txn (e.g. a
            # bootstrap append); for a fresh batch it is a no-op (ids
            # are unique across increments, the store contract)
            existing_state = store.read(snap).join(
                F.broadcast(b_state.select("_id")), "_id", "left_anti"
            )
        # the store's precomputed band keys are only trusted when EVERY
        # prior append recorded this increment's banding (the
        # _dial_meta induction); the _bucket pruning needs the store's
        # recorded modulus.  Both fall back losslessly.
        use_stored_bands = (
            snap == 0 and state_bands is not None
        ) or (snap > 0 and meta_bands == int(bands))
        prune_buckets = (
            bucket_count
            if snap > 0
            and bucket_count is not None
            and store.count_rows(snap) >= _VERIFY_PRUNE_MIN_ROWS
            else None
        )
        dupes = incremental_minhash_dedup(
            None, batch, id_col, text_col,
            shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
            min_jaccard=min_jaccard,
            existing_state=existing_state, batch_state=b_state,
            prune=prune, band_join=band_join,
            validate_state_dials=validate_dials,
            stored_bands=use_stored_bands,
            store_bucket_count=prune_buckets,
        )
        # record the snapshot ACTUALLY read in the txn marker: a
        # concurrent commit landing between latest_version() and the
        # append's (rebasing) claim makes the commit's parent differ
        # from the version this increment deduped against, and a replay
        # pinned to the parent would recompute against the WRONG
        # snapshot (round-13 ADVICE)
        rec_bands = (
            state_bands
            if snap == 0 or meta_bands == state_bands
            else None
        )
        version = store.append_idempotent(
            b_state, app_id, batch_id, snapshot=snap,
            meta=_dial_meta(
                shingle_n, num_hashes, rec_bands, bucket_count
            ),
        )
    finally:
        b_state.unpersist()
    return DedupIncrement(
        duplicates=dupes, appended_version=version, batch_id=batch_id
    )
