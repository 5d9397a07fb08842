"""Similarity search operators: exact cosine top-k, k-NN join, LSH scale path.

V2 (reference: repo_qdrant.ml:132-170) re-expressed as a batch DataFrame
program: optional payload pre-filter (V3) → cosine expression → top-k.

Scale design:
  * ``brute_force_topk``: one query vector as a literal — the similarity is a
    per-row expression (codegen), top-k is TakeOrderedAndProject.  Scales
    linearly with corpus size across executors; this is the exactness
    baseline and the oracle path.
  * ``cosine_knn_join``: many queries × big corpus.  The query side is
    broadcast (dimension-table pattern); corpus stays partition-parallel, so
    no shuffle of the big side.  Grouped top-k shuffles only the
    (query_id, candidate) pairs that survive ``pre_filter``.
  * ``lsh_bucketed_topk``: random-hyperplane LSH (Charikar 2002).  Signatures
    are computed JVM-side from literal hyperplanes (deterministic seed);
    corpus and queries bucket-join on (table, signature) so only colliding
    pairs are scored — the 100 TB path when brute force is too wide.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localframe import local_frame

from ..functions.vector import cosine_similarity, query_vector_lit
from .topk import topk, topk_per_group


def brute_force_topk(
    vectors: DataFrame,
    query_vec: Sequence[float],
    k: int,
    id_cols: List[str],
    vec_col: str = "embedding",
    pre_filter: Optional[Column] = None,
    sim_col: str = "score",
) -> DataFrame:
    """Exact cosine top-k of one query against the corpus (V2+V3)."""
    if pre_filter is not None:
        vectors = vectors.filter(pre_filter)
    scored = vectors.withColumn(
        sim_col, cosine_similarity(F.col(vec_col), query_vector_lit(query_vec))
    )
    order = [F.col(sim_col).desc()] + [F.col(c).asc() for c in id_cols]
    return topk(scored.select(*id_cols, sim_col), order, k)


def cosine_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    sim_col: str = "score",
) -> DataFrame:
    """Top-k corpus neighbors per query row (broadcast the query side)."""
    q = queries.select(
        F.col(query_id).alias("_q_id"), F.col(query_vec).alias("_q_vec")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    scored = joined.withColumn(
        sim_col, cosine_similarity(F.col(corpus_vec), F.col("_q_vec"))
    )
    ranked = topk_per_group(
        scored.select(F.col("_q_id").alias(query_id), F.col(corpus_id), F.col(sim_col)),
        [query_id],
        [F.col(sim_col).desc(), F.col(corpus_id).asc()],
        k,
    )
    return ranked.drop("rank")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim))


def _signature_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature as a compact string, e.g. '1011...'."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    query_vector_lit(plane.tolist()),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    sim_col: str = "score",
) -> DataFrame:
    """Approximate k-NN join: candidates from LSH bucket collisions across
    ``n_tables`` hash tables, exact cosine re-rank within candidates.

    Recall grows with n_tables; cost grows with bucket collision width.
    Both sides shuffle only on (table, signature) — never a cross join.
    All n_tables*n_planes sign bits come from ONE numpy matmul per Arrow
    batch (signatures_udf), then posexplode fans each row into its table
    buckets — one scan per side regardless of n_tables.
    """
    from ..functions.vector_pandas import signatures_udf

    planes = np.stack(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )
    sigs = signatures_udf(planes)
    c_all = corpus.select(
        F.col(corpus_id).alias("_c_id"),
        F.col(corpus_vec).alias("_c_vec"),
        F.posexplode(sigs(F.col(corpus_vec))).alias("_table", "_sig"),
    )
    q_all = queries.select(
        F.col(query_id).alias("_q_id"),
        F.col(query_vec).alias("_q_vec"),
        F.posexplode(sigs(F.col(query_vec))).alias("_table", "_sig"),
    )
    candidates = (
        c_all.join(q_all, ["_table", "_sig"])
        .select("_q_id", "_c_id", "_q_vec", "_c_vec")
        .dropDuplicates(["_q_id", "_c_id"])
    )
    scored = candidates.withColumn(
        sim_col, cosine_similarity(F.col("_c_vec"), F.col("_q_vec"))
    )
    ranked = topk_per_group(
        scored.select(
            F.col("_q_id").alias(query_id), F.col("_c_id").alias(corpus_id), F.col(sim_col)
        ),
        [query_id],
        [F.col(sim_col).desc(), F.col(corpus_id).asc()],
        k,
    )
    return ranked.drop("rank")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer cells + nprobe search
# ---------------------------------------------------------------------------

def auto_nlist(corpus_rows: int) -> int:
    """FAISS rule of thumb: nlist ≈ sqrt(N), clamped to a sane range."""
    return max(8, min(65536, int(corpus_rows**0.5)))


def _driver_sample_matrix(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    sample_size: int,
    seed: int,
    corpus_rows: int,
) -> np.ndarray:
    """The ONE deterministic driver-side training sample every
    codebook/centroid trainer here draws: hash-mod filter on the id
    column (one column-pruned scan, NO global sort, NO shuffle) then
    orderBy+limit.  The orderBy matters: it compiles to
    TakeOrderedAndProject over the ~2x-sample survivors — cheap — and
    makes the sample SET deterministic (a bare ``limit()`` keeps
    whichever partitions answer first, so two runs could train
    different centroids and every bucketed dedup/ANN entry built on
    them would flap).  Shared by ``train_ivf_centroids`` and
    ``train_pq_codebooks`` so the determinism contract cannot diverge
    between the two trainers."""
    # keep ~2x sample_size survivors so the limit rarely truncates unevenly
    mod = max(1, corpus_rows // max(1, sample_size // 2))
    sampled = corpus.filter(
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(mod)) == 0
    )
    pdf = (
        sampled.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .toPandas()
    )
    if len(pdf) == 0:
        # tiny/skewed corpora can leave the hash-mod filter with zero
        # survivors; fall back to an unfiltered top-k — still one scan
        pdf = (
            corpus.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample_size)
            .toPandas()
        )
    return np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    nlist: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    corpus_rows: Optional[int] = None,
    normalize: bool = False,
    sample_matrix: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Lloyd k-means over a driver-side sample → (nlist, dim) centroids.

    The sample is tiny relative to the corpus (IVF centroid training always
    is — FAISS trains on ~(39*nlist..256*nlist) points); see
    ``_driver_sample_matrix`` for the determinism contract.

    ``normalize=True`` trains in L2-normalized space — the IVFADC
    composition uses this so the coarse cells, the PQ residuals, and
    the inner-product LUTs all live in the same (cosine) geometry.

    ``sample_matrix`` (round 14): the RAW (un-normalized) sample drawn
    by ``_driver_sample_matrix`` with the same (sample_size, seed) —
    the IVFADC build draws it ONCE and hands it to both trainers, so
    the second training scan (one Spark action per build) disappears;
    bit-identical because both trainers drew the identical deterministic
    sample anyway.
    """
    if sample_matrix is not None:
        X = sample_matrix
    else:
        if corpus_rows is None:
            corpus_rows = corpus.count()
        X = _driver_sample_matrix(
            corpus, id_col, vec_col, sample_size, seed, corpus_rows
        )
    if normalize:
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        X = X / norms[:, None]
    rng = np.random.RandomState(seed)
    centroids = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    x_sq = (X**2).sum(1, keepdims=True)
    # BLOCKED assignment: the auto-sized SemDeDup path passes sample x
    # nlist up to 131k x 3360 — an unblocked (sample, nlist) distance
    # matrix is ~3.5 GB of driver temporaries per iteration.  Blocking
    # caps it at ~128 MB and is bit-identical (per-row argmin is
    # independent of blocking; the centroid update is untouched).
    for _ in range(iters):
        c_sq = (centroids**2).sum(1)
        assign = np.empty(len(X), dtype=np.int64)
        block = max(1, (1 << 24) // max(len(centroids), 1))
        for lo in range(0, len(X), block):
            xb = X[lo : lo + block]
            d = x_sq[lo : lo + block] + c_sq - 2.0 * xb @ centroids.T
            assign[lo : lo + block] = d.argmin(1)
        if len(centroids) >= 256:
            # segmented update (round 14): the per-centroid boolean mask
            # is O(nlist * sample) per iteration — at the auto-sized
            # SemDeDup shape (131k x 3360) that is ~1.5 s/iter of pure
            # masking.  Stable argsort groups members contiguously in
            # ascending row order — exactly the order the boolean mask
            # yields — so each segment's .mean(0) sees the same rows in
            # the same order and the update is bit-identical (probed:
            # (131072,3360,64) -> identical, 3x faster).  Below 256
            # centroids the sort+copy overhead outweighs the masking,
            # so the loop form stays (also bit-identical).
            order = np.argsort(assign, kind="stable")
            Xs = X[order]
            a_sorted = assign[order]
            starts = np.flatnonzero(
                np.r_[True, a_sorted[1:] != a_sorted[:-1]]
            )
            ends = np.r_[starts[1:], len(a_sorted)]
            for s, e in zip(starts, ends):
                centroids[a_sorted[s]] = Xs[s:e].mean(0)
        else:
            for j in range(len(centroids)):
                members = X[assign == j]
                if len(members):
                    centroids[j] = members.mean(0)
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    nlist: Optional[int] = None,
    nprobe: int = 4,
    centroids: Optional[np.ndarray] = None,
    sim_col: str = "score",
    seed: int = 42,
    broadcast_queries: bool = True,
    salt: int = 8,
) -> DataFrame:
    """IVF approximate k-NN join (FAISS IndexIVFFlat semantics, batch form):
    corpus rows live in their nearest-centroid cell; each query probes its
    ``nprobe`` nearest cells; exact cosine re-ranks within probed cells.

    Scale shape (the 100 TB contract):
      * ``nlist`` defaults to ``auto_nlist`` (≈sqrt(corpus)) so cell
        population — and with it candidate width — shrinks as the corpus
        grows, instead of a fixed handful of giant cells.
      * ``broadcast_queries=True`` (the common few-queries × huge-corpus
        case): the probed query side is broadcast, so the corpus NEVER
        shuffles — parallelism is the corpus partitioning, not the cell-id
        cardinality.
      * ``broadcast_queries=False`` (huge query batch): shuffle join on a
        SALTED cell key ``(cell, hash(id) % salt)`` so one hot cell spreads
        over ``salt`` tasks instead of pinning a single reducer.
    Recall grows with nprobe (nprobe = nlist ⇒ exact search).
    """
    from ..functions.vector_pandas import nearest_cells_udf

    if centroids is None:
        # the count action happens only when training is actually needed;
        # caller-supplied centroids skip both (nlist is unused after that)
        corpus_rows = corpus.count()
        if nlist is None:
            nlist = auto_nlist(corpus_rows)
        centroids = train_ivf_centroids(
            corpus, corpus_id, corpus_vec, nlist=nlist, seed=seed,
            corpus_rows=corpus_rows,
        )
    c_cells = corpus.select(
        F.col(corpus_id).alias("_c_id"), F.col(corpus_vec).alias("_c_vec"),
        F.element_at(nearest_cells_udf(centroids, 1)(F.col(corpus_vec)), 1).alias(
            "_cell"
        ),
    )
    q_cells = queries.select(
        F.col(query_id).alias("_q_id"), F.col(query_vec).alias("_q_vec"),
        F.explode(nearest_cells_udf(centroids, nprobe)(F.col(query_vec))).alias(
            "_cell"
        ),
    )
    if broadcast_queries:
        candidates = c_cells.join(F.broadcast(q_cells), "_cell")
    else:
        c_salted = c_cells.withColumn(
            "_salt", F.pmod(F.xxhash64("_c_id"), F.lit(salt)).cast("int")
        )
        q_salted = q_cells.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        candidates = c_salted.join(q_salted, ["_cell", "_salt"]).drop("_salt")
    scored = candidates.withColumn(
        sim_col, cosine_similarity(F.col("_c_vec"), F.col("_q_vec"))
    )
    ranked = topk_per_group(
        scored.select(
            F.col("_q_id").alias(query_id),
            F.col("_c_id").alias(corpus_id),
            F.col(sim_col),
        ),
        [query_id],
        [F.col(sim_col).desc(), F.col(corpus_id).asc()],
        k,
    )
    return ranked.drop("rank")


def save_centroids(centroids: np.ndarray, path: str) -> None:
    """Persist a trained IVF index (the centroid matrix) as parquet — the
    index artifact lives in the lake next to the data, so probes across
    sessions/jobs skip retraining (FAISS write_index analog)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "cell": pa.array(range(len(centroids)), type=pa.int32()),
            "centroid": pa.array(
                [row.astype("float64").tolist() for row in centroids],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(table, path)


def load_centroids(path: str) -> np.ndarray:
    """Load a persisted IVF centroid matrix (ordered by cell id)."""
    import pyarrow.parquet as pq

    table = pq.read_table(path).sort_by("cell")
    return np.array(table.column("centroid").to_pylist(), dtype="float64")


def save_pq_codebooks(codebooks: np.ndarray, path: str) -> None:
    """Persist ``(m, ksub, dsub)`` PQ codebooks as parquet rows
    ``(sub, code, centroid)`` — float64 round-trips parquet exactly, so
    a loaded index reproduces the in-memory search bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    m, ksub, _ = codebooks.shape
    table = pa.table(
        {
            "sub": pa.array(
                [s for s in range(m) for _ in range(ksub)], type=pa.int32()
            ),
            "code": pa.array(
                [c for _ in range(m) for c in range(ksub)], type=pa.int32()
            ),
            "centroid": pa.array(
                [
                    codebooks[s, c].astype("float64").tolist()
                    for s in range(m)
                    for c in range(ksub)
                ],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(table, path)


def load_pq_codebooks(path: str) -> np.ndarray:
    """Load persisted PQ codebooks back to ``(m, ksub, dsub)``."""
    import pyarrow.parquet as pq

    table = pq.read_table(path).sort_by([("sub", "ascending"), ("code", "ascending")])
    subs = table.column("sub").to_pylist()
    cents = table.column("centroid").to_pylist()
    m = subs[-1] + 1
    ksub = len(subs) // m
    return np.array(cents, dtype="float64").reshape(m, ksub, -1)


def _encode_codes(
    rows: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
) -> DataFrame:
    """(id, cell, codes) via the combined Arrow encode pass — THE single
    definition of the codes-table schema; build and append both write
    through here, so their parquet schemas cannot diverge."""
    from ..functions.vector_pandas import ivfpq_encode_udf

    encode = ivfpq_encode_udf(centroids, codebooks)
    return rows.select(
        F.col(corpus_id), encode(F.col(corpus_vec)).alias("_idx")
    ).select(
        F.col(corpus_id),
        F.col("_idx.cell").alias("cell"),
        F.col("_idx.codes").alias("codes"),
    )


def build_ivfpq_index(
    corpus: DataFrame,
    corpus_id: str,
    index_dir: str,
    corpus_vec: str = "embedding",
    nlist: Optional[int] = None,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    persist_corpus: bool = False,
) -> None:
    """The BUILD half of the production ANN posture (FAISS
    write_index analog, split build/serve jobs): train the coarse
    centroids and residual PQ codebooks, encode the corpus, and write
    the three index artifacts under ``index_dir``:

      * ``centroids.parquet``  — (cell, centroid)        [driver-size]
      * ``codebooks.parquet``  — (sub, code, centroid)    [driver-size]
      * ``codes/``             — (id, cell, codes binary) [corpus-size,
                                 written distributed]

    The expensive parts — the training sample scan and the one Arrow
    encode pass over every vector — happen HERE, once; any number of
    later serve jobs (``load_ivfpq_index`` + ``ivfpq_topk(codes=...)``)
    reuse the artifacts without retraining or re-encoding.  Everything
    is deterministic (seeded sample, Lloyd, stable argmin), and floats
    persist exactly, so serve-from-disk output is bit-identical to an
    inline run with the same parameters.

    ``corpus`` must be DETERMINISTIC (the build evaluates it four
    times: count, the two training sample scans, and the encode+write)
    — the same contract as ``ivfpq_topk``.  ``persist_corpus=True``
    pins one best-effort materialization (saves three source rescans at
    moderate scale; best-effort because Spark recomputes lost cached
    partitions from lineage — a truly nondeterministic source needs a
    deterministic snapshot first, e.g. ``localCheckpoint``).  The
    default streams four column-pruned scans, the right posture when
    the corpus exceeds cluster cache capacity — the build job's
    advertised scale."""
    corpus = corpus.select(corpus_id, corpus_vec)
    if persist_corpus:
        corpus = corpus.persist()
    try:
        corpus_rows = corpus.count()
        if nlist is None:
            nlist = auto_nlist(corpus_rows)
        # one training sample serves both trainers (round 14): the two
        # draws were the identical deterministic (size, seed) sample, so
        # sharing the matrix drops one Spark action per build,
        # bit-identically
        sample = _driver_sample_matrix(
            corpus, corpus_id, corpus_vec, 4096, seed, corpus_rows
        )
        centroids = train_ivf_centroids(
            corpus, corpus_id, corpus_vec, nlist=nlist, seed=seed,
            corpus_rows=corpus_rows, normalize=True,
            sample_matrix=sample,
        )
        codebooks = train_pq_codebooks(
            corpus, corpus_id, corpus_vec, m=m, ksub=ksub, seed=seed,
            corpus_rows=corpus_rows, coarse_centroids=centroids,
            sample_matrix=sample,
        )
        os.makedirs(index_dir, exist_ok=True)
        save_centroids(
            centroids, os.path.join(index_dir, "centroids.parquet")
        )
        save_pq_codebooks(
            codebooks, os.path.join(index_dir, "codebooks.parquet")
        )
        codes = _encode_codes(
            corpus, corpus_id, corpus_vec, centroids, codebooks
        )
        # REBALANCE before the write (guide §6): the encode pass runs at
        # the corpus's parallelism, but the ~17-byte code rows are 2-3
        # orders of magnitude narrower than the vectors — without a
        # rebalance the codes land as one tiny file per encode task and
        # every serve scan pays per-file open cost.  AQE sizes the
        # output from the actual bytes (one file here; advisory-size
        # files at corpus scale).
        codes.hint("rebalance").write.mode("overwrite").parquet(
            os.path.join(index_dir, "codes")
        )
        # build-time cell-occupancy baseline (round 12): the reference
        # histogram `ivfpq_cell_drift` compares against after appends.
        # Computed from the WRITTEN codes (one cheap column-pruned
        # rescan of nlist-cardinality data) so the baseline is exactly
        # what the build committed, not a re-evaluation of the corpus.
        corpus.sparkSession.read.parquet(
            os.path.join(index_dir, "codes")
        ).groupBy("cell").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "cell_histogram.parquet")
        )
    finally:
        if persist_corpus:
            corpus.unpersist()


def load_ivfpq_index(spark: SparkSession, index_dir: str):
    """Load a persisted IVFADC index: ``(centroids, codebooks,
    codes_df)`` — pass all three to ``ivfpq_topk`` to serve without
    retraining or re-encoding."""
    centroids = load_centroids(os.path.join(index_dir, "centroids.parquet"))
    codebooks = load_pq_codebooks(
        os.path.join(index_dir, "codebooks.parquet")
    )
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    return centroids, codebooks, codes


def append_to_ivfpq_index(
    new_rows: DataFrame,
    corpus_id: str,
    index_dir: str,
    corpus_vec: str = "embedding",
) -> None:
    """The MAINTAIN half of the index lifecycle (FAISS ``index.add``
    analog; build → serve → APPEND): encode new vectors with the
    EXISTING centroids and codebooks — no retraining, exactly FAISS's
    add semantics, so the index geometry stays frozen at build time —
    and append their (id, cell, codes) rows to the distributed codes
    table.  Serving from the appended index is bit-identical to
    encoding the grown corpus inline with the SAME frozen model
    (pinned in tests), which is the correctness contract that makes
    incremental maintenance safe: append changes WHAT is indexed,
    never HOW.

    Quality note (FAISS's too): appended vectors are quantized by
    codebooks trained on the ORIGINAL distribution — fine for
    stationary corpora; distribution drift is the production reindex
    trigger, and the build/append split is exactly what makes that
    reindex a background job.

    Scale shape: one column-pruned scan of the new rows through the
    same combined Arrow encode pass as the build, written distributed
    with ``mode("append")`` — cost scales with the DELTA, not the
    index (the entire point vs rebuild).  Concurrency contract:
    parquet append is single-writer (two simultaneous appenders can
    interleave safely only because files are immutable, but a reader
    racing the append may see a partial delta); concurrent maintainers
    should write through ``ingest.commit_log.CommitLogTable`` instead,
    which serializes appends and keeps readers snapshot-isolated."""
    centroids = load_centroids(os.path.join(index_dir, "centroids.parquet"))
    codebooks = load_pq_codebooks(
        os.path.join(index_dir, "codebooks.parquet")
    )
    codes_dir = os.path.join(index_dir, "codes")
    # fail FAST on an id-column mismatch: parquet append with a
    # different id name would land a second schema in the same dir and
    # load_ivfpq_index (schema from one footer) would surface the other
    # file's rows with a NULL id — a silently corrupted index
    existing = new_rows.sparkSession.read.parquet(codes_dir).schema
    expected_names = [corpus_id, "cell", "codes"]
    if list(existing.names) != expected_names:
        raise ValueError(
            f"codes table at {codes_dir} has columns {list(existing.names)};"
            f" append would write {expected_names} — pass corpus_id="
            f"{existing.names[0]!r} (the name the build used)"
        )
    # name alone is not the schema: an id of the same name but a
    # different TYPE (e.g. a string-typed delta from CSV) would still
    # land a second physical schema in codes/ and surface as corrupt
    # ids at read time — compare the id field's type too
    new_id_type = new_rows.schema[corpus_id].dataType
    old_id_type = existing[corpus_id].dataType
    if new_id_type != old_id_type:
        raise ValueError(
            f"codes table at {codes_dir} has {corpus_id}: "
            f"{old_id_type.simpleString()}; the append's {corpus_id} is "
            f"{new_id_type.simpleString()} — cast the delta's id column "
            f"to the build's type before appending"
        )
    codes = _encode_codes(
        new_rows, corpus_id, corpus_vec, centroids, codebooks
    )
    codes.write.mode("append").parquet(codes_dir)


# The MEASURED retrain trigger for an appended IVFPQ index (round 12,
# SCALE_SMOKE `ann_drift`, the committed curve): recall decay under
# drifted appends is already material at the FIRST append step —
# recall 0.78 vs the stationary 1.0 at the same step — where
# cell-occupancy PSI reads only 0.15, so the a32 "shifted" band (0.25)
# fires too late for this use.  The "moderate" boundary (0.1) catches
# that first decayed step with a ~40x margin over stationary append
# noise (PSI 0.003 after doubling the corpus with same-distribution
# rows), so 0.1 is the trigger: poll `ivfpq_cell_drift` after appends
# and reindex at psi >= this value.
IVFPQ_RETRAIN_PSI = 0.1


def ivfpq_cell_drift(
    spark: SparkSession, index_dir: str, epsilon: float = 1e-4
) -> "tuple[float, str]":
    """Population-stability index of the codes table's CURRENT cell
    occupancy vs the build-time baseline (``cell_histogram.parquet``,
    written by ``build_ivfpq_index``) — the drift signal that answers
    ``append_to_ivfpq_index``'s quality note: appends encode with
    frozen centroids/codebooks, fine while the distribution is
    stationary; this measures when it stops being stationary, FROM THE
    INDEX'S OWN ARTIFACTS (no corpus rescan — one column-pruned scan of
    codes/ for an nlist-bucket histogram).

    Same PSI conventions as a32's ``audit.distribution_drift``: per-cell
    shares, a side's absent bucket takes ``epsilon``, natural log,
    ``sum((cur - base) * ln(cur / base))``.  Returns ``(psi, verdict)``
    with the a32 bands — 'stable' (< 0.1), 'moderate' (< 0.25),
    'shifted' (>= 0.25).  The RETRAIN point is ``IVFPQ_RETRAIN_PSI``
    (0.1, the stable/moderate boundary) — deliberately tighter than the
    'shifted' band because the measured decay curve (SCALE_SMOKE
    ``ann_drift``, committed) shows recall already down 0.22 at the
    first drifted append step (0.78 vs the stationary 1.0), where PSI
    reads 0.15: waiting for 0.25 would serve a decayed index; 0.1
    still clears stationary append noise (~0.003) by ~40x, so it
    cannot false-fire on a stationary corpus.

    Indexes built before the histogram artifact existed raise loudly —
    rebuild (or write the baseline by hand) before trusting the
    signal."""
    hist_path = os.path.join(index_dir, "cell_histogram.parquet")
    if not os.path.exists(hist_path):
        raise FileNotFoundError(
            f"{hist_path} is missing: the index predates the build-time "
            "cell-occupancy baseline — rebuild with build_ivfpq_index "
            "(round 12+) to enable drift detection"
        )
    base_rows = spark.read.parquet(hist_path).collect()
    cur_rows = (
        spark.read.parquet(os.path.join(index_dir, "codes"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    return _psi_verdict(
        {r["cell"]: r["n"] for r in base_rows},
        {r["cell"]: r["n"] for r in cur_rows},
        epsilon,
    )


def _psi_verdict(
    base: dict, cur: dict, epsilon: float = 1e-4
) -> "tuple[float, str]":
    """THE cell-occupancy PSI arithmetic (shared by the in-place
    ``ivfpq_cell_drift`` and the snapshot-isolated
    ``ann_snapshot.snapshot_drift`` so the two drift readings cannot
    diverge): per-cell shares, a side's absent bucket takes
    ``epsilon``, natural log, ``sum((cur - base) * ln(cur / base))``;
    verdict uses a32's bands."""
    import math

    tb = sum(base.values())
    tc = sum(cur.values())
    psi = 0.0
    for cell in set(base) | set(cur):
        fb = base[cell] / tb if cell in base and tb else epsilon
        fc = cur[cell] / tc if cell in cur and tc else epsilon
        psi += (fc - fb) * math.log(fc / fb)
    verdict = (
        "stable" if psi < 0.1 else ("moderate" if psi < 0.25 else "shifted")
    )
    return psi, verdict


def maintain_ivfpq_index(
    new_rows: DataFrame,
    corpus_id: str,
    index_dir: str,
    corpus: DataFrame,
    corpus_vec: str = "embedding",
    retrain_psi: float = IVFPQ_RETRAIN_PSI,
    seed: int = 42,
) -> dict:
    """One MAINTAINER turn of the index lifecycle — the loop the
    build/append split and the drift trigger exist to serve:

        append the delta with the frozen model → poll
        ``ivfpq_cell_drift`` → REBUILD in place when the trigger fires.

    ``corpus`` is the full current corpus INCLUDING ``new_rows`` (the
    index artifacts hold codes, not vectors, so only the caller can
    retrain) — it is only evaluated on the rebuild branch.  A rebuild
    retrains centroids/codebooks on the drifted distribution WITH THE
    INDEX'S OWN GEOMETRY — nlist/m/ksub are read from the existing
    centroids/codebooks artifacts, never from caller defaults, so a
    maintainer turn can change what the index describes but never its
    cell count or code size — re-encodes everything, and rewrites the
    drift baseline, so the next turn's PSI starts from 0: exactly the
    background-reindex posture ``append_to_ivfpq_index``'s quality
    note describes, automated at the measured trigger
    (``IVFPQ_RETRAIN_PSI``; SCALE_SMOKE ``ann_drift`` pins that it
    fires at/before any material recall decay and never on stationary
    appends).  A deliberate geometry change is a manual
    ``build_ivfpq_index`` call.

    Returns ``{"action": "appended"|"rebuilt", "psi": ..., "verdict":
    ...}`` — psi/verdict are the POST-APPEND reading that made the
    decision.

    Concurrency contract (the append's, tightened): artifacts are
    overwritten IN PLACE, so the rebuild is safe only with no
    concurrent reader of the same directory — a server's lazily-loaded
    codes frame re-lists parquet files per action, so a rebuild racing
    a query can fail the read or, worse, decode new codes with the
    old loaded codebooks.  The single-process build → maintain →
    reload loop (the smoke's and tests') needs none of that; anything
    with concurrent readers should use the SNAPSHOT-ISOLATED form
    (round 13): ``operators/ann_snapshot.py`` — immutable versioned
    model dirs, a commit-log codes table, an atomic CURRENT pointer
    flip — whose ``snapshot_maintain`` is this function's drop-in
    with readers pinned row-identically through rebuilds."""
    append_to_ivfpq_index(new_rows, corpus_id, index_dir, corpus_vec)
    psi, verdict = ivfpq_cell_drift(new_rows.sparkSession, index_dir)
    if psi >= retrain_psi:
        centroids = load_centroids(
            os.path.join(index_dir, "centroids.parquet")
        )
        codebooks = load_pq_codebooks(
            os.path.join(index_dir, "codebooks.parquet")
        )
        m, ksub, _ = codebooks.shape
        build_ivfpq_index(
            corpus, corpus_id, index_dir, corpus_vec,
            nlist=len(centroids), m=int(m), ksub=int(ksub), seed=seed,
        )
        return {"action": "rebuilt", "psi": psi, "verdict": verdict}
    return {"action": "appended", "psi": psi, "verdict": verdict}


# --------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid, TPAMI 2011 — "Product
# Quantization for Nearest Neighbor Search"; FAISS IndexPQ semantics).
# The memory side of the ANN story: IVF/LSH cut WHICH vectors a query
# touches, PQ cuts what each touched vector COSTS — dim float32 per
# vector compresses to m code bytes (32x conceptually at dim=64/m=8),
# and the approximate-scoring scan moves CODES only.  MEASURED payload
# (SCALE_SMOKE.json `pq_bytes`, scripts/scale_smoke.py --pq-bytes):
# packed codes shuffle ~18x smaller than vectors and ~2x smaller than
# array<int> codes; on PARQUET the array<int> form is smaller than
# packed binary (dictionary encoding) while both are ~20-30x below
# vectors — pick array codes when the scan is the bottleneck, packed
# when the shuffle/memory is.


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
    corpus_rows: Optional[int] = None,
    coarse_centroids: Optional[np.ndarray] = None,
    sample_matrix: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Per-subspace Lloyd k-means over ONE driver-side sample →
    ``(m, ksub, dim/m)`` codebooks.  ``sample_matrix`` as in
    ``train_ivf_centroids``: the caller's pre-drawn raw sample (same
    (sample_size, seed) draw), saving this trainer's scan.

    Vectors are L2-NORMALIZED before splitting, so inner product over
    reconstructed subvectors approximates cosine (the IndexPQ-with-
    METRIC_INNER_PRODUCT posture).  The sample is the same
    deterministic hash-mod + orderBy-limit draw as
    ``train_ivf_centroids`` (one column-pruned scan, no shuffle, stable
    across runs); each subspace's k-means runs on a (sample, dim/m)
    slice — driver cost is m small Lloyd loops, independent of corpus
    size.

    ``coarse_centroids`` (IVFADC, Jégou et al. 2011 §V by_residual):
    when given, each normalized sample vector is assigned to its
    nearest coarse centroid and the codebooks are trained on the
    RESIDUALS x_norm - centroid[cell] — residual energy is far below
    vector energy, so the same ksub spends its quantization budget on
    a much smaller space."""
    if sample_matrix is not None:
        X = sample_matrix
    else:
        if corpus_rows is None:
            corpus_rows = corpus.count()
        X = _driver_sample_matrix(
            corpus, id_col, vec_col, sample_size, seed, corpus_rows
        )
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    X = X / norms[:, None]
    if coarse_centroids is not None:
        c = coarse_centroids.astype(np.float64)
        d = (
            (X**2).sum(1, keepdims=True)
            + (c**2).sum(1)
            - 2.0 * X @ c.T
        )
        X = X - c[d.argmin(1)]
    dim = X.shape[1]
    assert dim % m == 0, f"m={m} must divide dim={dim}"
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for sub in range(m):
        Xs = X[:, sub * dsub : (sub + 1) * dsub]
        k_eff = min(ksub, len(Xs))
        cents = Xs[rng.choice(len(Xs), size=k_eff, replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k_eff):
                mask = assign == c
                if mask.any():
                    cents[c] = Xs[mask].mean(0)
        if k_eff < ksub:  # degenerate tiny corpus: pad by repetition
            cents = np.vstack([cents] * ((ksub // k_eff) + 1))[:ksub]
        books[sub] = cents
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
    packed: bool = False,
) -> DataFrame:
    """``(id, codes)`` — each vector L2-normalized and quantized to its
    nearest centroid PER SUBSPACE (one Arrow batch matmul per subspace;
    vectors cross the Python boundary once).  ``codes`` is the
    compressed representation that is all the approximate-scoring scan
    ever moves: array<int> by default, or with ``packed=True`` a
    ``binary`` of m one-byte codes (ksub <= 256) — the production
    payload (measured codes-vs-vectors bytes: scripts/scale_smoke.py
    --pq-bytes)."""
    from ..functions.vector_pandas import pq_encode_udf

    encode = pq_encode_udf(codebooks, packed=packed)
    return df.select(
        F.col(id_col), encode(F.col(vec_col)).alias("codes")
    )


def _adc_sum(m: int, ksub: int, packed: bool) -> Column:
    """The ADC inner-product estimate: sum over subspaces of
    LUT[sub*ksub + code[sub]], as a pure JVM expression over the
    broadcast ``_lut`` column (element_at is 1-based).

    Packed codes are one byte per subspace; Spark has no direct
    byte->int indexing on binary, so the expression reads the hex
    rendering (``_hex = hex(codes)``, 2 chars per byte) via
    substring+conv — still whole-stage-codegen JVM, no Python."""
    if packed:

        def code_at(i: Column) -> Column:
            return F.conv(
                F.substring(F.col("_hex"), i * 2 + 1, F.lit(2)), 16, 10
            ).cast("int")

    else:

        def code_at(i: Column) -> Column:
            return F.element_at(F.col("codes"), i + 1)

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(
            F.col("_lut"), (i * ksub + code_at(i) + 1).cast("int")
        ),
    )


def pq_operating_point(n_corpus: int, k: int = 3) -> "tuple[int, int]":
    """Corpus-scaled (ksub, overfetch) ladder for the PQ/IVFADC family —
    the second-scale-factor counterpart of the LSH planner: a FIXED PQ
    operating point that holds a recall gate at one corpus size loses it
    at 10x, because on a near-uniform (worst-case, no subspace structure)
    corpus the cosine margins between rank-k and rank-k+overfetch
    neighbors shrink as the corpus grows, so both the codebook resolution
    and the exact-re-rank shortlist must grow with it.

    The rungs are MEASURED on the committed fixtures (worst of the five
    gate queries, recall@3):

    * n <= 800   -> (16, 32):   the historic sf0.01 point (gate green;
                    bit-stable since round 7).
    * n <= 8000  -> (64, 128):  at sf0.1 (2,000 vectors) the sf0.01
                    point reads 0.33 on its worst query — below the 0.6
                    gate (the round-10 second-sf sweep's finding); ksub
                    64 + shortlist 384 reads 1.0 on every query for flat
                    PQ and 0.67+ for IVFADC (whose residual miss is an
                    unprobed-cell effect, not a code-resolution one).
    * beyond     -> (256, 256): the committed IVFADC smoke sweep's
                    recommended ksub at 10x-smoke scale
                    (SCALE_SMOKE.json ann_recall, ksub=256 rung).

    Training cost scales with ksub (Lloyd over the hash-mod sample) and
    re-rank cost with the SHORTLIST (k*overfetch) — both stay
    corpus-fraction-bounded.  The rung constant is the shortlist, not
    overfetch: what the measurements fixed is how many ADC-ranked rows
    the exact re-rank must see (96 / 384 / 768), so overfetch is
    derived as ceil(shortlist/k) and a recall@10 caller gets the same
    measured shortlist, not 10/3 of it (at the k=3 the gate entries
    run, the rungs resolve to overfetch 32 / 128 / 256 exactly).
    Clustered corpora (the shape real embeddings have) hold 0.92-0.96
    recall at CONSTANT dials (SCALE_SMOKE ann_recall_clustered); this
    ladder is the worst-case posture the recall GATE entries run, not a
    claim that production dials must grow linearly."""
    import math

    k = max(1, k)
    if n_corpus <= 800:
        ksub, shortlist = 16, 96
    elif n_corpus <= 8000:
        ksub, shortlist = 64, 384
    else:
        ksub, shortlist = 256, 768
    return ksub, max(1, math.ceil(shortlist / k))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    overfetch: int = 8,
    codebooks: Optional[np.ndarray] = None,
    sim_col: str = "score",
    seed: int = 42,
    persist_corpus: bool = False,
    packed: Optional[bool] = None,
) -> DataFrame:
    """PQ approximate k-NN join with exact re-rank (FAISS IndexPQ + ADC):

    1. encode the corpus once — codes (m ints) replace vectors;
    2. per query, precompute the ADC lookup table LUT[sub, code] =
       <q_sub, centroid> (m*ksub doubles, built driver-side from the
       tiny broadcast query set);
    3. approximate score per (query, corpus) row is a pure JVM
       ``aggregate`` over the code array indexing the broadcast LUT —
       NO vector ever moves, no Python in the scan;
    4. keep ``k * overfetch`` candidates per query (window top-k), join
       their true vectors back, exact-cosine re-rank, emit top-k.

    Scale shape: the corpus is scanned once for encoding and once for
    ADC scoring (codes only); the exact re-rank touches k*overfetch
    vectors per query.  Recall < 1 by construction — the v7 pattern's
    recall gate is the correctness contract; overfetch is the dial.

    ``corpus`` must be DETERMINISTIC (the bloom_prune_anti_join
    contract): the plan evaluates it twice — once for the ADC code scan,
    once for the re-rank vector join — so a source containing
    ``rand()``-derived columns, an unordered ``limit()``, or sampling
    could encode one row set and re-rank another.  For such inputs pass
    ``persist_corpus=True``, which pins ONE materialization of the
    (id, vector) projection that both stages read; the pinned frame
    rides the returned DataFrame — call ``release_persisted_corpus``
    on the result after materializing it to free the executor cache.
    (``queries`` needs no such contract: it is collected exactly once
    below and both its uses derive from those rows.)"""
    from ..functions.vector import cosine_similarity

    if persist_corpus:
        corpus = corpus.select(corpus_id, corpus_vec).persist()
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, corpus_id, corpus_vec, m=m, ksub=ksub, seed=seed
        )
    m, ksub, _ = codebooks.shape
    if packed is None:
        # auto: packed bytes need one byte per code; larger codebooks
        # keep the array<int> form instead of failing a call that never
        # asked for packing
        packed = ksub <= 256
    codes = pq_encode(corpus, corpus_id, corpus_vec, codebooks, packed=packed)
    if packed:
        # hex rendering once per row; _adc_sum indexes it JVM-side
        codes = codes.withColumn("_hex", F.hex("codes"))

    # the query frame is evaluated EXACTLY ONCE (this collect): both the
    # ADC lookup tables and the re-rank query vectors derive from these
    # rows, so a nondeterministic queries source (sample(), unordered
    # limit()) cannot hand the two stages different vectors — the same
    # double-evaluation hazard bloom_prune_anti_join documents, closed
    # here structurally instead of contractually
    q_rows = queries.select(query_id, query_vec).collect()
    lut_rows = []
    for r in q_rows:
        qv = np.asarray(r[query_vec], dtype=np.float64)
        n = np.linalg.norm(qv)
        qv = qv / (n if n else 1.0)
        dsub = len(qv) // m
        lut = np.empty(m * ksub, dtype=np.float64)
        for sub in range(m):
            lut[sub * ksub : (sub + 1) * ksub] = (
                codebooks[sub] @ qv[sub * dsub : (sub + 1) * dsub]
            )
        lut_rows.append(
            (
                r[query_id],
                [float(x) for x in lut],
                [float(x) for x in r[query_vec]],
            )
        )
    spark = queries.sparkSession
    q_type = dict(queries.dtypes)[query_id]
    luts = local_frame(
        spark, lut_rows,
        f"_q_id {q_type}, _lut array<double>, _q_vec array<double>",
    )
    # ADC: sum over subspaces of LUT[sub*ksub + code[sub]] — pure
    # expression over the broadcast LUT (see _adc_sum)
    cand = (
        codes.crossJoin(F.broadcast(luts.select("_q_id", "_lut")))
        .withColumn("_adc", _adc_sum(m, ksub, packed))
    )
    shortlist = topk_per_group(
        cand.select("_q_id", F.col(corpus_id), "_adc"),
        ["_q_id"],
        [F.col("_adc").desc(), F.col(corpus_id).asc()],
        k * overfetch,
    ).drop("rank", "_adc")
    vecs = corpus.select(
        F.col(corpus_id), F.col(corpus_vec).alias("_c_vec")
    )
    # re-rank query vectors come from the SAME collected rows as the
    # LUTs (see above), never from re-evaluating `queries`
    qvecs = luts.select("_q_id", "_q_vec")
    rescored = (
        shortlist.join(vecs, corpus_id)
        .join(F.broadcast(qvecs), "_q_id")
        .withColumn(sim_col, cosine_similarity(F.col("_c_vec"), F.col("_q_vec")))
    )
    ranked = topk_per_group(
        rescored.select(
            F.col("_q_id").alias(query_id), F.col(corpus_id), F.col(sim_col)
        ),
        [query_id],
        [F.col(sim_col).desc(), F.col(corpus_id).asc()],
        k,
    )
    out = ranked.drop("rank")
    if persist_corpus:
        out._pq_pinned_corpus = corpus
    return out


def release_persisted_corpus(result: DataFrame) -> bool:
    """Unpersist the corpus projection pinned by
    ``pq_topk(..., persist_corpus=True)`` or ``ivfpq_topk``.  Call
    after the result has been materialized, ON THE OBJECT the operator
    returned — a ``.select()``/``.filter()`` yields a new DataFrame
    without the pin (bloom.release_pinned documents the contract;
    carry ``result._pq_pinned_corpus`` yourself before transforming).
    Returns False when nothing was pinned, so callers can release
    unconditionally."""
    from .bloom import release_pinned

    return release_pinned(result, "_pq_pinned_corpus")


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    nlist: Optional[int] = None,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    overfetch: int = 8,
    centroids: Optional[np.ndarray] = None,
    codebooks: Optional[np.ndarray] = None,
    codes: Optional[DataFrame] = None,
    sim_col: str = "score",
    seed: int = 42,
    persist_corpus: bool = False,
) -> DataFrame:
    """IVFADC approximate k-NN join (FAISS IndexIVFPQ; Jégou et al.
    2011 §V): the composition of both ANN cuts — IVF cells cut WHICH
    vectors a query touches, PQ codes cut what each touched vector
    COSTS.

    Index (one corpus scan, one combined Arrow pass): each vector is
    L2-normalized, assigned to its nearest coarse centroid (trained in
    normalized space), and its RESIDUAL x_norm - centroid[cell] is
    PQ-encoded with residual-trained codebooks into m packed bytes —
    the (id, cell, codes) row is all the search scan ever reads.

    Search: queries are collected ONCE (the pq_topk single-evaluation
    contract — LUTs, probe cells, and re-rank vectors all derive from
    the same rows).  Per query and per probed cell the driver emits
    (query, cell, LUT, <q, centroid_cell>); the broadcast of those
    rows equi-joins the codes table ON CELL — a BroadcastHashJoin that
    prunes the scan to nprobe/nlist of the corpus, vs pq_topk's
    all-rows cross join.  The ADC estimate is <q, centroid_cell> +
    sum_sub LUT[code] (exact decomposition of <q, x̂> under residual
    encoding), pure JVM.  Top k*overfetch per query re-rank with exact
    cosine; overfetch and nprobe are the two recall dials
    (nprobe=nlist + corpus-wide overfetch ⇒ exact).

    ``corpus`` must be DETERMINISTIC (evaluated twice: index scan +
    re-rank join) — ``persist_corpus=True`` pins one materialization;
    release with ``release_persisted_corpus``.

    ``codes`` (with ``centroids`` + ``codebooks``): serve from a
    PERSISTED index (``build_ivfpq_index`` / ``load_ivfpq_index``) —
    a ``(corpus_id, cell, codes binary)`` frame replaces the inline
    encode pass, so the corpus vectors are only touched by the exact
    re-rank join.  With one evaluation per artifact and float64
    persistence, serve-from-disk output is bit-identical to the inline
    run that built the index."""
    from ..functions.vector import cosine_similarity
    from ..functions.vector_pandas import ivfpq_encode_udf

    if codes is not None and (centroids is None or codebooks is None):
        raise ValueError(
            "codes= requires the centroids and codebooks that encoded it"
        )
    # with codes= the corpus appears once PER PLAN (the re-rank join),
    # but an explicit persist_corpus=True is still honored: the pin is
    # what keeps repeated ACTIONS on the result consistent for a
    # nondeterministic corpus (count() then collect() would otherwise
    # re-evaluate the source independently each time)
    if persist_corpus:
        corpus = corpus.select(corpus_id, corpus_vec).persist()
    if centroids is None or codebooks is None:
        corpus_rows = corpus.count()
        if nlist is None:
            nlist = auto_nlist(corpus_rows)
        # one deterministic sample serves whichever trainers run
        # (round 14): the draws were identical, so sharing the matrix
        # drops a Spark action bit-identically
        sample = _driver_sample_matrix(
            corpus, corpus_id, corpus_vec, 4096, seed, corpus_rows
        )
        if centroids is None:
            centroids = train_ivf_centroids(
                corpus, corpus_id, corpus_vec, nlist=nlist, seed=seed,
                corpus_rows=corpus_rows, normalize=True,
                sample_matrix=sample,
            )
        if codebooks is None:
            codebooks = train_pq_codebooks(
                corpus, corpus_id, corpus_vec, m=m, ksub=ksub, seed=seed,
                corpus_rows=corpus_rows, coarse_centroids=centroids,
                sample_matrix=sample,
            )
    m, ksub, _ = codebooks.shape
    nlist = len(centroids)
    nprobe = min(nprobe, nlist)

    if codes is None:
        encode = ivfpq_encode_udf(centroids, codebooks)
        codes = corpus.select(
            F.col(corpus_id), encode(F.col(corpus_vec)).alias("_idx")
        ).select(
            F.col(corpus_id),
            F.col("_idx.cell").alias("_cell"),
            F.hex(F.col("_idx.codes")).alias("_hex"),
        )
    else:
        codes = codes.select(
            F.col(corpus_id),
            F.col("cell").alias("_cell"),
            F.hex(F.col("codes")).alias("_hex"),
        )

    # ONE evaluation of the query frame feeds probe cells, LUTs, the
    # per-cell <q, centroid> term, and the re-rank vectors
    q_rows = queries.select(query_id, query_vec).collect()
    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(1)
    lut_rows = []
    qvec_rows = []
    for r in q_rows:
        qv = np.asarray(r[query_vec], dtype=np.float64)
        n = np.linalg.norm(qv)
        qv = qv / (n if n else 1.0)
        dsub = len(qv) // m
        lut = np.empty(m * ksub, dtype=np.float64)
        for sub in range(m):
            lut[sub * ksub : (sub + 1) * ksub] = (
                codebooks[sub] @ qv[sub * dsub : (sub + 1) * dsub]
            )
        lut_list = [float(x) for x in lut]
        d2 = (qv**2).sum() + c_sq - 2.0 * c @ qv
        for cell in np.argsort(d2, kind="stable")[:nprobe]:
            lut_rows.append(
                (
                    r[query_id],
                    int(cell),
                    lut_list,
                    float(c[cell] @ qv),
                )
            )
        qvec_rows.append((r[query_id], [float(x) for x in r[query_vec]]))
    spark = queries.sparkSession
    q_type = dict(queries.dtypes)[query_id]
    luts = local_frame(
        spark, lut_rows,
        f"_q_id {q_type}, _cell int, _lut array<double>, _qc double",
    )
    qvecs = local_frame(
        spark, qvec_rows, f"_q_id {q_type}, _q_vec array<double>"
    )

    # cell-pruned ADC: equi-join on _cell (broadcast), never a cross join
    cand = codes.join(F.broadcast(luts), "_cell").withColumn(
        "_adc", F.col("_qc") + _adc_sum(m, ksub, packed=True)
    )
    shortlist = topk_per_group(
        cand.select("_q_id", F.col(corpus_id), "_adc"),
        ["_q_id"],
        [F.col("_adc").desc(), F.col(corpus_id).asc()],
        k * overfetch,
    ).drop("rank", "_adc")
    vecs = corpus.select(
        F.col(corpus_id), F.col(corpus_vec).alias("_c_vec")
    )
    rescored = (
        shortlist.join(vecs, corpus_id)
        .join(F.broadcast(qvecs), "_q_id")
        .withColumn(
            sim_col, cosine_similarity(F.col("_c_vec"), F.col("_q_vec"))
        )
    )
    ranked = topk_per_group(
        rescored.select(
            F.col("_q_id").alias(query_id), F.col(corpus_id), F.col(sim_col)
        ),
        [query_id],
        [F.col(sim_col).desc(), F.col(corpus_id).asc()],
        k,
    )
    out = ranked.drop("rank")
    if persist_corpus:
        out._pq_pinned_corpus = corpus
    return out
