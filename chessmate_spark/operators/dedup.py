"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-aware:
  * exact:   md5(normalized text) → groupBy hash, keep the min-id canonical
             row.  One shuffle on the 32-hex digest (uniformly distributed —
             no skew).
  * MinHash+LSH: shingle → minhash signature → band buckets → self-join per
             bucket → exact Jaccard verify on candidates only (Broder 1997).
             The self-join shuffles on band-bucket keys, never all-pairs.
  * SimHash: 32/64-bit bit-majority fingerprint; near-dups share fingerprints
             (or low Hamming distance).
  * n-gram Jaccard: exact pairwise Jaccard within a blocking key (use on
             small blocks / as the oracle baseline).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_keys_expr_named,
    md5_expr,
    minhash_expr_named,
    simhash_expr,
    word_shingles_expr,
)
from ..functions.text import norm_tokens_expr


def _norm_tokens(text: Column) -> Column:
    return norm_tokens_expr(text)


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Exact-duplicate groups: (dup_hash, canonical_id, dup_count, ids)."""
    key = (
        md5_expr(F.concat_ws(" ", _norm_tokens(F.col(text_col))))
        if normalized
        else md5_expr(F.col(text_col))
    )
    hashed = df.select(F.col(id_col), key.alias("dup_hash"))
    return (
        hashed.groupBy("dup_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.array_sort(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via MinHash-LSH.

    rows-per-band = num_hashes / bands; collision threshold ≈
    (1/bands)^(1/rows).  Candidates are verified with exact shingle Jaccard.
    The default (16, 4) is an S-curve with midpoint ~0.707 — detection
    0.98 at Jaccard 0.9 but 0.23 at 0.5; for a RECALL TARGET at a given
    threshold size the banding with ``minhash_banding_plan`` (the
    Jaccard twin of ``lsh_plan_for``; its planned points are measured
    in SCALE_SMOKE `minhash_planner`).

    ``materialize=True`` (default) computes the pair set eagerly and
    releases the persisted shingle/band intermediates before returning —
    no executor storage leaks across invocations in a long-lived session.
    Pass ``materialize=False`` to get the lazy plan instead; the caller
    then owns the persisted intermediates' lifetime (one action, then a
    new invocation per corpus).
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    # shingle sets are computed ONCE and persisted — the pipeline references
    # them four times (signatures, sizes, and both sides of the intersection
    # join); without the persist Spark would recompute the md5 minhash work
    # per reference.
    shingled = df.select(
        F.col(id_col).alias("_id"),
        word_shingles_expr(_norm_tokens(F.col(text_col)), shingle_n).alias("_shingles"),
    ).persist()
    sig = shingled.withColumn(
        "_sig", minhash_expr_named("_shingles", num_hashes)
    )
    # candidates carry ONLY (id, band) — never the shingle arrays.  The
    # band self-join therefore shuffles a few bytes per row; this is what
    # keeps the operator viable when the corpus is 10^9 documents.
    banded = sig.select(
        "_id",
        F.explode(band_keys_expr_named("_sig", bands, rows)).alias("_band"),
    ).persist()
    pairs = (
        banded.select(F.col("_id").alias("id_a"), "_band")
        .join(banded.select(F.col("_id").alias("id_b"), "_band"), "_band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact-Jaccard verify on candidates only: each pair joins both
    # sides' shingle arrays off the persisted shingle table and the
    # intersection/union are array expressions — two joins, no explode,
    # no aggregate (round 14; see _pair_jaccard_arrays)
    out = _pair_jaccard_arrays(pairs, shingled, min_jaccard)
    if materialize:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            shingled.unpersist()
            banded.unpersist()
    return out


def _pair_jaccard_arrays(
    pairs: DataFrame, shingled: DataFrame, min_jaccard: float
) -> DataFrame:
    """Exact shingle-Jaccard verify of candidate ``(id_a, id_b)`` pairs
    straight off the ``(_id, _shingles)`` table: each side's DISTINCT
    shingle array (``word_shingles_expr`` guarantees distinctness)
    joins onto the pair row and |A∩B| / |A∪B| is one array expression.

    Round 14 (guide §2.4): this replaces the exploded ``(id, shingle)``
    verify chain — prune, explode, compound-key intersection join,
    groupBy count, two size joins — with TWO id-keyed joins and zero
    aggregates.  The exchanged bytes are the same (a doc's shingles
    move once per candidate pair either way: as one array row here, as
    |shingles| narrow rows there), but three shuffles and a hash
    aggregate disappear from the plan.  Output is identical to
    ``_candidate_intersections`` + ``_jaccard_from_inter``:
    ``array_intersect``/``array_union`` over distinct arrays ARE the
    set sizes the exploded count computed (|A∪B| = |A| + |B| − |A∩B|),
    and zero-overlap pairs are dropped explicitly (the inner
    intersection join dropped them implicitly)."""
    sh_a = shingled.select(
        F.col("_id").alias("id_a"), F.col("_shingles").alias("_sh_a")
    )
    sh_b = shingled.select(
        F.col("_id").alias("id_b"), F.col("_shingles").alias("_sh_b")
    )
    inter = F.size(F.array_intersect(F.col("_sh_a"), F.col("_sh_b")))
    union = F.size(F.array_union(F.col("_sh_a"), F.col("_sh_b")))
    return (
        pairs.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("_inter", inter)
        .withColumn("_union", union)
        .filter(F.col("_inter") > 0)
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double") / F.col("_union").cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select("id_a", "id_b", "jaccard")
    )


def _candidate_intersections(pairs: DataFrame, exploded: DataFrame) -> DataFrame:
    """|A∩B| for candidate (id_a, id_b) pairs from an exploded (_id, _sh)
    shingle table — the verify-stage join all candidate generators share."""
    with_a = pairs.join(exploded, pairs["id_a"] == exploded["_id"]).select(
        "id_a", "id_b", "_sh"
    )
    return (
        with_a.join(
            exploded.select(F.col("_id").alias("_idb"), F.col("_sh").alias("_shb")),
            (F.col("id_b") == F.col("_idb")) & (F.col("_sh") == F.col("_shb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )


def _jaccard_from_inter(
    inter: DataFrame, sizes: DataFrame, min_jaccard: float
) -> DataFrame:
    """(id_a, id_b, _inter) + per-id set sizes → thresholded exact
    Jaccard.  THE single definition of the similarity — the shared-oracle
    guarantee between the all-pairs, prefix-filtered, and minhash-verified
    joins depends on this living in exactly one place."""
    sz_a = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sz_a"))
    sz_b = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double")
            / (F.col("_sz_a") + F.col("_sz_b") - F.col("_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    block_col: Optional[str] = None,
    min_jaccard: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard pairs; all-pairs within a blocking key.

    Without LSH this is quadratic per block — keep blocks small (oracle
    baseline / final verify of LSH candidates).  ``materialize`` as in
    ``minhash_lsh_candidates``: eager result + released intermediates by
    default.
    """
    # Exploded token-join: |A∩B| falls out of a self-join on (block, shingle)
    # — pairs sharing no shingle never materialize, and no arrays travel
    # through shuffles.  This is the classic exact set-similarity join; for
    # thresholded workloads a prefix filter (PPJoin) can prune further.
    block = [F.col(block_col).alias("_block")] if block_col else []
    shingled = df.select(
        F.col(id_col).alias("_id"),
        *block,
        word_shingles_expr(_norm_tokens(F.col(text_col)), shingle_n).alias("_shingles"),
    ).persist()
    block_keys = ["_block"] if block_col else []
    sizes = shingled.select(*block_keys, "_id", F.size("_shingles").alias("_sz"))
    exploded = shingled.select(
        *block_keys, "_id", F.explode("_shingles").alias("_sh")
    )
    right = exploded.select(
        *[F.col(k) for k in block_keys],
        F.col("_id").alias("_idb"),
        F.col("_sh"),
    )
    inter = (
        exploded.join(right, block_keys + ["_sh"])
        .filter(F.col("_id") < F.col("_idb"))
        .groupBy(F.col("_id").alias("id_a"), F.col("_idb").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = _jaccard_from_inter(inter, sizes, min_jaccard)
    if materialize:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            shingled.unpersist()
    return out


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """(id, simhash) fingerprints; equal fingerprints ⇒ near-duplicates."""
    return df.select(
        F.col(id_col),
        simhash_expr(_norm_tokens(F.col(text_col)), bits).alias("simhash"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_digits: int = 6,
    max_side_rows: int = 500_000,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, score) for
    every unordered pair with cosine >= threshold.

    The right side is broadcast, so the left scans partition-parallel with
    no shuffle — correct whenever one side's (id, vector) projection fits in
    executor memory.  Beyond that, use ``embedding_neardup_lsh`` (candidates
    from hyperplane-LSH collisions, exact verify) — the 100 TB path.

    The score is rounded BEFORE thresholding so Spark and an external oracle
    agree at FP boundaries (floor-form rounding of the same IEEE double —
    verified mismatch-free against the sequential-fold form over every pair
    of the check corpus).

    Execution is a BLOCK MATRIX product: the right side is materialized
    once (the same driver-memory contract the broadcast nested-loop join
    had) and each corpus partition computes one `A @ B.T` per Arrow batch —
    ~5x over both the interpreted HOF fold and per-pair Arrow transfer.
    Quadratic OUTPUT is unchanged: this stays the oracle/verify baseline;
    ``embedding_neardup_lsh`` is the 100 TB path.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    n = df.count()
    if n > max_side_rows:
        raise ValueError(
            f"embedding_neardup_pairs materializes the (id, vector) side on "
            f"the driver; corpus has {n} rows > max_side_rows="
            f"{max_side_rows}. This operator is the exact oracle/verify "
            f"baseline — use embedding_neardup_lsh (bucketed candidates, "
            f"id-only shuffles) at scale, or raise max_side_rows explicitly "
            f"if the projection genuinely fits in driver memory."
        )
    side = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids_b = np.array([r[0] for r in side])
    B = np.stack([np.asarray(r[1], dtype=np.float64) for r in side])
    norms_b = np.linalg.norm(B, axis=1)
    safe_b = np.where(norms_b == 0.0, 1.0, norms_b)
    scale = 10.0 ** round_digits

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            A = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ids_a = pdf[id_col].to_numpy()
            norms_a = np.linalg.norm(A, axis=1)
            safe_a = np.where(norms_a == 0.0, 1.0, norms_a)
            S = (A @ B.T) / np.outer(safe_a, safe_b)
            S[norms_a == 0.0, :] = 0.0
            S[:, norms_b == 0.0] = 0.0
            S6 = np.floor(S * scale + 0.5) / scale
            ii, jj = np.where(S6 >= threshold)
            keep = ids_a[ii] < ids_b[jj]
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ii][keep],
                    "id_b": ids_b[jj][keep],
                    "score": S6[ii, jj][keep],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        batches, f"id_a {id_type}, id_b {id_type}, score double"
    )


def lsh_banding_for(n_rows: int) -> "tuple[int, int]":
    """The (n_planes, n_tables) autotune ladder for random-hyperplane
    LSH dedup: candidate volume is ~ n_tables · n² / 2^n_planes, so a
    FIXED plane count is quadratic in the corpus (the round-6 smoke
    caught the (4,16) point at 23x on 10x data).  Planes grow with
    log2(n) — each 10x of corpus adds ~3.3 planes, which multiplies the
    bucket count by ~10x and keeps CANDIDATE growth ~linear per decade;
    tables shrink toward a floor of 8.  ≤800 rows keeps the historic
    (3, 32) recall-1.0 operating point (the entry's oracle regime).
    Recall at a given similarity decays as planes rise — the documented
    recall/cost dial (SCALE_SMOKE.json records it per corpus); for
    LOW-threshold dedup on unclustered vectors prefer the k-means-cell
    strategy (semantic_neardup_pairs), whose cells ∝ N form is exactly
    linear.  This ladder is SIZE-only — it cannot see the similarity
    threshold; ``lsh_plan_for`` is the threshold-aware planner that
    sizes banding for a recall TARGET and reports whether LSH can prune
    at all at that threshold."""
    import math

    if n_rows <= 800:
        return 3, 32
    # cap 62: the per-table signature packs one bit per plane into an
    # int64 (vector_pandas.signatures_udf), so 62 is the representation
    # limit — it binds only beyond n ≈ 800·2^59, i.e. never, which is
    # the point: a lower cap (the round-6 property test caught 16)
    # silently reverts the ladder to quadratic candidates past the cap.
    # The practical recall dial tops out far earlier; low-threshold
    # dedup at scale should route to semantic_neardup_pairs instead.
    planes = min(62, 3 + math.ceil(math.log2(n_rows / 800)))
    tables = max(8, 32 >> (planes - 3))
    return planes, tables


class LshPlan:
    """Result of ``lsh_plan_for``: the cheapest (n_planes, n_tables)
    banding that reaches the recall target at the given threshold, plus
    the planner's cost estimates and its pruning verdict.  Frozen plain
    attributes (no dataclass import churn); comparisons in tests go
    through the attributes."""

    __slots__ = (
        "n_planes",
        "n_tables",
        "candidate_fraction",
        "est_bucket_pair_rows",
        "est_signature_rows",
        "prunes",
    )

    def __init__(
        self,
        n_planes: int,
        n_tables: int,
        candidate_fraction: float,
        est_bucket_pair_rows: float,
        est_signature_rows: int,
        prunes: bool,
    ) -> None:
        self.n_planes = n_planes
        self.n_tables = n_tables
        self.candidate_fraction = candidate_fraction
        self.est_bucket_pair_rows = est_bucket_pair_rows
        self.est_signature_rows = est_signature_rows
        self.prunes = prunes

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"LshPlan(planes={self.n_planes}, tables={self.n_tables}, "
            f"frac={self.candidate_fraction:.4f}, prunes={self.prunes})"
        )


def lsh_plan_for(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.9999,
    prune_fraction: float = 0.5,
    max_tables: int = 4096,
) -> LshPlan:
    """THRESHOLD-AWARE banding planner for random-hyperplane LSH dedup —
    the feasibility computation ``lsh_banding_for``'s size-only ladder
    cannot make.

    Theory (Charikar 2002 SimHash): two vectors at cosine ``s`` agree on
    one hyperplane bit with probability ``p(s) = 1 - arccos(s)/pi``, so a
    pair AT the threshold collides in a b-plane table with probability
    ``p_min**b`` and in at least one of T tables with
    ``1 - (1 - p_min**b)**T``.  Given a recall target the planner solves
    T(b) for each plane count, estimates the RANDOM-pair candidate mass
    under an isotropic prior (random bits agree with probability 1/2, so
    a random pair survives some table with ``1 - (1 - 0.5**b)**T`` — the
    planner's model, not a guarantee, exact for near-orthogonal corpora),
    and scores each b by estimated shuffled rows
    (``T*C(n,2)/2**b`` bucket pair rows + ``n*T`` signature rows),
    returning the cheapest PRUNING banding when any exists and the
    cheapest overall otherwise — so the returned plan always agrees
    with the verdict it carries.

    The verdict that matters is ``prunes``: whether ANY banding reaching
    the recall target keeps the random-candidate fraction below
    ``prune_fraction``.  The per-plane Bayes factor between a threshold
    pair and a random pair is ``p_min/0.5``, so pruning is feasible only
    when the threshold sits well above cosine 0 — measured on the sf0.1
    fixture corpus (2,000 near-uniform vectors, threshold 0.35, p_min =
    0.614): EVERY b in 1..62 that reaches recall 0.9999 yields candidate
    fraction >= 0.60 (1.2-2.0M distinct candidates of the 2.0M all-pairs)
    — recall-1.0 "LSH" at a low threshold IS all-pairs wearing a
    shuffle, and the planner says so instead of running it.  At
    threshold 0.8 (p_min = 0.795) the same target is met at fraction
    < 0.05 — the regime hyperplane LSH exists for.  Callers route: prune
    with the planned banding, or fall back to the exact/cells path
    (``embedding_neardup_pairs`` / ``semantic_neardup_pairs``)."""
    import math

    if n_rows < 2:
        return LshPlan(1, 1, 0.0, 0.0, n_rows, False)
    target_recall = min(max(target_recall, 0.5), 1 - 1e-12)
    s = min(max(threshold, -1.0), 1.0)
    p_min = 1.0 - math.acos(s) / math.pi
    n_pairs = n_rows * (n_rows - 1) / 2.0
    # two argmins over the feasible bandings: the cheapest overall and
    # the cheapest that PRUNES.  The verdict is the docstring's
    # ANY-banding feasibility question, so a pruning banding that is
    # not cost-minimal must still flip `prunes` — and since the caller
    # contract is "route on prunes and run the returned banding", the
    # returned plan is the cheapest PRUNING one whenever any exists
    # (the cost-minimal non-pruning plan would contradict the verdict
    # it ships with).  Note `prunes` is a CANDIDATE-VOLUME verdict: at
    # small n the pruning banding's signature volume can still exceed
    # the exact join's pair count — cost-sensitive callers compare
    # est_bucket_pair_rows + est_signature_rows against C(n,2).
    best = None
    best_cost = math.inf
    best_pruning = None
    best_pruning_cost = math.inf
    for b in range(1, 63):
        pb = p_min**b
        if pb <= 0.0:
            break
        if pb >= 1.0:
            tables = 1
        else:
            # log1p keeps the denominator exact for tiny pb, where
            # log(1.0 - pb) underflows to log(1.0) == 0
            denom = math.log1p(-pb)
            if denom == 0.0:
                continue
            tables = math.ceil(math.log(1.0 - target_recall) / denom)
        if tables < 1:
            tables = 1
        if tables > max_tables:
            continue
        frac = 1.0 - (1.0 - 0.5**b) ** tables
        bucket_rows = tables * n_pairs * (0.5**b)
        sig_rows = n_rows * tables
        cost = bucket_rows + sig_rows
        plan = LshPlan(b, tables, frac, bucket_rows, sig_rows,
                       frac < prune_fraction)
        if cost < best_cost:
            best_cost = cost
            best = plan
        if plan.prunes and cost < best_pruning_cost:
            best_pruning_cost = cost
            best_pruning = plan
    if best_pruning is not None:
        return best_pruning
    if best is None:
        # no banding within max_tables reaches the target: report the
        # infeasibility as a non-pruning plan at the densest point
        return LshPlan(1, max_tables, 1.0, n_pairs * max_tables / 2.0,
                       n_rows * max_tables, False)
    return best


class MinhashPlan:
    """Result of ``minhash_banding_plan``: the cheapest (num_hashes,
    bands, rows) banding reaching the recall target at the Jaccard
    threshold, with the S-curve diagnostics and the pruning verdict."""

    __slots__ = (
        "num_hashes",
        "bands",
        "rows",
        "detection_at_threshold",
        "background_fraction",
        "prunes",
    )

    def __init__(
        self,
        num_hashes: int,
        bands: int,
        rows: int,
        detection_at_threshold: float,
        background_fraction: float,
        prunes: bool,
    ) -> None:
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = rows
        self.detection_at_threshold = detection_at_threshold
        self.background_fraction = background_fraction
        self.prunes = prunes

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"MinhashPlan(hashes={self.num_hashes}, bands={self.bands}, "
            f"rows={self.rows}, det={self.detection_at_threshold:.4f}, "
            f"bg={self.background_fraction:.4f}, prunes={self.prunes})"
        )


def minhash_banding_plan(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.999,
    background_jaccard: float = 0.05,
    prune_fraction: float = 0.5,
    max_hashes: int = 512,
) -> MinhashPlan:
    """THRESHOLD-AWARE banding planner for MinHash-LSH — the Jaccard
    twin of ``lsh_plan_for``.  The fixed (num_hashes=16, bands=4)
    default is an S-curve with midpoint (1/4)^(1/4) ~ 0.707: detection
    at Jaccard 0.9 is 0.98 but at 0.5 only 0.23 and at 0.3 effectively
    zero — a LOW-threshold dedup run with the default dial silently
    misses most of its target pairs (the oracle entries still
    hash-match because the DuckDB oracle mirrors the same banding; the
    RECALL question lives here).

    Theory (Broder 1997 / the MMDS S-curve): a pair at Jaccard ``j``
    agrees on one r-row band with probability ``j**r`` and collides in
    at least one of b bands with ``1 - (1 - j**r)**b``.  Given a recall
    target the planner solves b(r) per row count, estimates the
    spurious-candidate mass at a BACKGROUND Jaccard (default 0.05 — the
    near-disjoint shingle overlap unrelated documents have; unlike
    hyperplane LSH there is no 1/2 collision floor, which is why
    MinHash prunes at thresholds cosine-LSH cannot), and scores each r
    by estimated work at the given corpus size — spurious verify pairs
    ``bg_frac * C(n,2)`` plus per-document signature and banded-row
    volume ``n * (r*b + b)`` — so a bigger corpus buys more rows per
    band (killing the background mass) exactly as FAISS-style planners
    trade memory for selectivity.  Returns the cheapest PRUNING plan
    when any exists and the cheapest overall otherwise, so the returned
    banding always agrees with its verdict (the lsh_plan_for contract).
    Empirical validation: SCALE_SMOKE `minhash_planner` measures the
    planned banding against planted known-Jaccard pairs next to the
    default dial."""
    import math

    target_recall = min(max(target_recall, 0.5), 1 - 1e-12)
    j = min(max(threshold, 1e-9), 1.0)
    bg = min(max(background_jaccard, 0.0), 1.0)
    if n_rows < 2:
        # degenerate corpus: no pairs exist, every banding's costs tie
        # near zero and the argmin would return a meaningless rows=1
        # banding flagged prunes=True on its 0.40 background fraction
        # (negative n_rows would even go negative-cost) — mirror
        # lsh_plan_for's small-n early return with the same (1, 1, 1)
        # shape and honest diagnostics the infeasible fallback uses
        return MinhashPlan(1, 1, 1, j, bg, False)
    n_pairs = n_rows * (n_rows - 1) / 2.0
    best = None
    best_cost = math.inf
    best_pruning = None
    best_pruning_cost = math.inf
    for rows in range(1, 65):
        jr = j**rows
        if jr >= 1.0:
            bands = 1
        else:
            denom = math.log1p(-jr)
            if denom == 0.0:
                continue
            bands = max(1, math.ceil(math.log(1.0 - target_recall) / denom))
        num_hashes = rows * bands
        if num_hashes > max_hashes:
            continue
        detection = 1.0 - (1.0 - jr) ** bands
        bg_frac = 1.0 - (1.0 - bg**rows) ** bands
        cost = bg_frac * n_pairs + n_rows * (num_hashes + bands)
        plan = MinhashPlan(
            num_hashes, bands, rows, detection, bg_frac,
            bg_frac < prune_fraction,
        )
        if cost < best_cost:
            best_cost = cost
            best = plan
        if plan.prunes and cost < best_pruning_cost:
            best_pruning_cost = cost
            best_pruning = plan
    if best_pruning is not None:
        return best_pruning
    if best is None:
        # threshold so low that every (rows, bands) combination reaching
        # the recall target blows the hash budget: report the densest
        # single-band plan with prunes hardcoded False — the verdict
        # contract promises a plan that REACHES the target prunes, and
        # this one does neither (the lsh_plan_for fallback convention;
        # the round-10 second review caught this returning a
        # background-only True)
        return MinhashPlan(1, 1, 1, j, bg, False)
    return best


def minhash_planned_dial(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.999,
) -> MinhashPlan:
    """``minhash_banding_plan`` quantized to DECADE representatives: the
    plan for ``rep = max(500, 5 * 10^k)`` where ``10^k <= n < 10^(k+1)``
    (the 500 floor is the gate corpus).  The dial becomes a
    deterministic STEP function of corpus size, so a static SQL oracle
    can mirror the dial choice with a bracket predicate on ``count(*)``
    — the property the d26 entry's DuckDB mirror needs, and the reason
    a runtime-planned dial is safe under a static oracle at all.

    Quantization is free with respect to recall: detection at the
    threshold depends only on (rows, bands), which any planned dial
    satisfies; corpus size only moves the cost argmin, and within one
    decade the argmin moves at most one rows-step (the committed
    brackets: (50, 25) through 999 docs, (156, 52) through 99,999,
    (432, 108) through 999,999 at threshold 0.5)."""
    rep = max(500, 5 * 10 ** (len(str(max(int(n_rows), 1))) - 1))
    return minhash_banding_plan(rep, threshold, target_recall=target_recall)


def hyperplane_planned_dial(
    n_rows: int,
    threshold: float,
    target_recall: float = 0.999,
) -> LshPlan:
    """``lsh_plan_for`` quantized to decade representatives — the cosine
    twin of :func:`minhash_planned_dial`, with the same purpose: the
    (planes, tables) dial becomes a deterministic STEP function of
    corpus size, so a static SQL oracle can mirror the dial choice with
    a ``count(*)`` bracket predicate (the d27 entry).  Recall at the
    threshold is dial-only, so quantization never costs the target;
    corpus size only moves the cost argmin.  Committed brackets at
    threshold 0.8 / recall 0.999: (9, 51) through 999 rows, (12, 105)
    through 9,999, (16, 267) through 99,999, (19, 535) through 999,999
    — candidate fraction FALLS with corpus size (0.095 → 0.001): the
    bigger corpus buys more planes exactly as MinHash buys more rows
    per band."""
    rep = max(500, 5 * 10 ** (len(str(max(int(n_rows), 1))) - 1))
    return lsh_plan_for(rep, threshold, target_recall=target_recall)


def minhash_route(
    n_rows: int,
    threshold: float,
    fallback: "tuple[int, int]" = (16, 4),
    target_recall: float = 0.999,
):
    """d7-style planner routing for the MinHash production entries
    (d2 ``_lsh_pairs``, d12 incremental): consult the banding planner
    and return ``(num_hashes, bands, plan)``.

    * prunable threshold — the decade-quantized planned dial: recall
      >= target at the threshold, background candidates bounded (the
      regime d24/d26 pin against their oracles).
    * non-prunable threshold (the planner PROVES every target-reaching
      banding admits >= half of all-pairs as background candidates —
      true at the production entries' declared 0.1, where the best
      banding is (66, 66, 1) at background fraction 0.97) — return the
      declared fallback dial: the tractability compromise (the planned
      dial would cost ~all-pairs, strictly worse than the exact
      d3-style blocked verify it was meant to avoid).  In this branch
      the returned ``plan`` documents the planner's REFUSAL — the best
      target-reaching banding and its near-all-pairs background
      fraction — NOT the fallback dial's own recall: callers can
      log/assert the refusal (``plan.prunes is False``, the d2/d12
      tripwire), but a caller wanting the recall figure for the dial
      ACTUALLY RUN must compute it with
      ``minhash_dial_diagnostics(*fallback, threshold)`` (at the
      production 0.1 that reads detection ~0.0004 — only strong
      near-dups surface, the semantics the mirrored oracles pin).
    """
    plan = minhash_planned_dial(n_rows, threshold, target_recall)
    if plan.prunes:
        return plan.num_hashes, plan.bands, plan
    return fallback[0], fallback[1], plan


def minhash_dial_diagnostics(
    num_hashes: int,
    bands: int,
    threshold: float,
    background_jaccard: float = 0.05,
    prune_fraction: float = 0.5,
) -> MinhashPlan:
    """Honest S-curve diagnostics for an ARBITRARY (num_hashes, bands)
    dial — the figure :func:`minhash_route`'s non-prunable branch does
    NOT return (its plan documents the planner's refusal, not the
    fallback actually run).  Same Broder/MMDS arithmetic as
    ``minhash_banding_plan``: detection ``1-(1-j^r)^b`` at the
    threshold, background candidate fraction at ``background_jaccard``,
    and the pruning verdict against ``prune_fraction``."""
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows = num_hashes // bands
    j = min(max(threshold, 1e-9), 1.0)
    bg = min(max(background_jaccard, 0.0), 1.0)
    detection = 1.0 - (1.0 - j**rows) ** bands
    bg_frac = 1.0 - (1.0 - bg**rows) ** bands
    return MinhashPlan(
        num_hashes, bands, rows, detection, bg_frac,
        bg_frac < prune_fraction,
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The bucket-collision CANDIDATE stage of ``embedding_neardup_lsh``,
    exposed on its own: deduped (id_a, id_b) pairs that collide on some
    (table, hyperplane-signature) bucket, BEFORE exact verification.

    Designed candidate volume is ~ ``n_tables · n² / 2^n_planes`` — the
    dial ``lsh_banding_for`` trades against recall.  The scale smoke
    counts this frame at both corpus scales so any wall-clock growth
    decomposes into (a) that designed volume and (b) plan cost per
    candidate; a superlinear (b) is a defect, a superlinear (a) is the
    ladder's documented quantization."""
    import numpy as np

    from ..functions.vector_pandas import signatures_udf
    from .similarity import _hyperplanes

    planes = np.stack(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )
    sigs = signatures_udf(planes)
    tagged = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(sigs(F.col(vec_col))).alias("_table", "_sig"),
    )
    right = tagged.select(
        F.col("_table"), F.col("_sig"), F.col("_id").alias("_idb")
    )
    return (
        tagged.join(right, ["_table", "_sig"])
        .filter(F.col("_id") < F.col("_idb"))
        .select(F.col("_id").alias("id_a"), F.col("_idb").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


# Verify-matrix broadcast budget (float64 ELEMENTS, not rows — the row
# gate must shrink as vectors widen): 2^24 elements = 128 MiB, i.e.
# ~262k vectors at dim 64 or ~10k at the 1536-d production width.
# Within budget the exact-cosine verify gathers rows from one broadcast
# matrix and candidate pairs cross the Python boundary as two ids;
# past it the two-join attach runs unchanged.
_VERIFY_MATRIX_MAX_ELEMS = 1 << 24


# Broadcast (id, vector) matrices handed to in-flight verify plans, per
# SparkContext id.  Each new broadcast-path call UNPERSISTS (not
# destroys) the earlier ones: executor-resident copies are reclaimed —
# a long-lived session holds at most one matrix's executor footprint —
# while an older, still-lazy verify plan stays executable (an
# unpersisted broadcast is re-shipped from the driver on next use; a
# destroyed one would fail).  Driver-side copies live until the
# SparkContext stops; at the 128 MiB gate that bound is explicit.
_VERIFY_BROADCASTS: dict = {}


def _register_verify_broadcast(sc, bc) -> None:
    key = id(sc)
    stale = _VERIFY_BROADCASTS.setdefault(key, [])
    for old in stale:
        try:
            old.unpersist(False)
        except Exception:  # noqa: BLE001 — a stopped context is fine
            pass
    stale.clear()
    stale.append(bc)


def embedding_neardup_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    round_digits: int = 6,
    candidates: Optional[DataFrame] = None,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Approximate near-dup pairs at scale: candidates are LSH bucket
    collisions (both sides shuffle only on (table, signature) — never
    all-pairs), then exact cosine verification.  Recall < 1 by construction;
    tests assert recall against ``embedding_neardup_pairs`` at test scale.

    Candidates carry ONLY (id_a, id_b) — the same discipline as the
    minhash pipeline: the bucket self-join and the pair dedup shuffle a
    few bytes per row, and the vectors are joined back AFTER dedup (the
    (id, vector) projection joins twice; at broadcast size those joins
    are shuffle-free).  Verification is the Arrow-batched numpy cosine:
    one hop per batch beats the interpreted HOF fold ~2x (measured; the
    opposite holds for the BNLJ exact variant, where pair generation is
    JVM-internal).

    ``candidates``: a precomputed (persisted) ``lsh_candidate_pairs``
    frame to verify INSTEAD of generating one — when given,
    ``dim``/``n_planes``/``n_tables``/``seed`` are ignored entirely and
    the caller owns the consistency between the frame and whatever
    dials produced it (the scale-smoke planner probe counts candidates
    from the same frame it then verifies; a stale frame with different
    dials would be verified without error).

    ``n_rows``: the corpus row count, when the caller already measured
    it (round-14 ADVICE) — gates the broadcast-matrix verify route
    WITHOUT the up-to-128 MiB probe collect, which otherwise runs (and
    is discarded) even when the corpus exceeds the gate and the
    two-join path must run anyway.
    """
    from ..functions.scoring import portable_round
    from ..functions.vector_pandas import pandas_cosine

    if candidates is not None:
        missing = {"id_a", "id_b"} - set(candidates.columns)
        assert not missing, (
            f"candidates frame lacks pair columns {sorted(missing)}: "
            "expected the (id_a, id_b) shape lsh_candidate_pairs returns"
        )
    pairs = candidates if candidates is not None else lsh_candidate_pairs(
        df, id_col, vec_col, dim=dim, n_planes=n_planes,
        n_tables=n_tables, seed=seed,
    )
    # Verify route (round 14, guide §8: decide with small rows, move big
    # rows once — here, move the big rows ZERO times): attaching vectors
    # to candidate pairs by two joins ships 2·dim doubles per candidate
    # through the exchange and the Arrow boundary (~1 KB/pair at dim 64;
    # ~hundreds of MB at bench candidate volumes) when the per-pair
    # decision needs only the two ids.  When the whole (id, vector)
    # projection fits a driver broadcast — the probe-collect doubles as
    # the gate, so the measured size decides, not an estimate — the
    # pairs stream ONLY (id_a, id_b) into an Arrow pass that gathers
    # both rows from the broadcast matrix and computes the identical
    # numpy expressions pandas_cosine runs (same float64 values, same
    # (A*B).sum(1) reduction: bit-identical scores).  Past the gate the
    # two-join plan below runs unchanged — the 10^9-row posture, where
    # the vector projection outgrows any broadcast.
    max_rows = _VERIFY_MATRIX_MAX_ELEMS // max(int(dim), 1)
    if n_rows is not None and n_rows > max_rows:
        # caller-measured count says the matrix cannot fit: skip the
        # probe collect entirely (round-14 ADVICE — the probe used to
        # pull up to 128 MiB of vectors only to discard them here)
        probe = None
    else:
        probe = (
            df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
            .limit(max_rows + 1)
            .collect()
        )
    if probe is not None and len(probe) <= max_rows:
        import numpy as np
        import pandas as pd

        ids_list = [r["_vid"] for r in probe]
        matrix = (
            np.stack([np.asarray(r["_v"], dtype=np.float64) for r in probe])
            if probe
            else np.zeros((0, 1))
        )
        sc = df.sparkSession.sparkContext
        bc = sc.broadcast((ids_list, matrix))
        _register_verify_broadcast(sc, bc)

        def _verify(batches):
            ids_l, M = bc.value
            idx = {v: i for i, v in enumerate(ids_l)}
            for pdf in batches:
                ia = pdf["id_a"].map(idx).to_numpy(dtype=np.int64)
                ib = pdf["id_b"].map(idx).to_numpy(dtype=np.int64)
                A, B = M[ia], M[ib]
                dots = (A * B).sum(1)
                denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
                out = np.where(
                    denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom)
                )
                yield pd.DataFrame(
                    {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "score": out}
                )

        id_t = dict(df.dtypes)[id_col]
        raw = pairs.select("id_a", "id_b").mapInPandas(
            _verify, f"id_a {id_t}, id_b {id_t}, score double"
        )
        scored = raw.select(
            "id_a", "id_b",
            portable_round(F.col("score"), round_digits).alias("score"),
        )
        return scored.filter(F.col("score") >= F.lit(threshold))
    vecs = df.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
    # no forced broadcast: AQE broadcasts the (id, vector) projection when
    # it fits and falls back to a key-partitioned join when it doesn't
    with_vecs = (
        pairs.join(
            vecs.select(F.col("_vid").alias("id_a"), F.col("_v").alias("_va")),
            "id_a",
        )
        .join(
            vecs.select(F.col("_vid").alias("id_b"), F.col("_v").alias("_vb")),
            "id_b",
        )
    )
    scored = with_vecs.select(
        "id_a",
        "id_b",
        portable_round(
            pandas_cosine(F.col("_va"), F.col("_vb")), round_digits
        ).alias("score"),
    )
    return scored.filter(F.col("score") >= F.lit(threshold))


def portable_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    quant: int = 1_000_000,
) -> DataFrame:
    """``lsh_candidate_pairs`` with the PORTABLE integer hyperplane family
    (functions/hashing.py ``portable_hyperplanes``): planes are md5-derived
    integers and signatures are exact int64 arithmetic on the quantized
    vector, so an independent SQL engine can reproduce every band value
    hash-for-hash — the property d25's oracle-pinned pruning arm needs
    (``signatures_udf``'s numpy-RandomState planes and float dot products
    cannot cross an engine boundary bit-exactly).

    Same plan shape as ``lsh_candidate_pairs``: signatures land once per
    row, the self-join shuffles (table, band-value) keys only, pairs are
    deduped before any vector is touched.
    """
    from ..functions.hashing import portable_hyperplanes
    from ..functions.vector_pandas import portable_signatures_udf

    planes = portable_hyperplanes(n_tables, n_planes, dim)
    sigs = portable_signatures_udf(planes, n_tables, n_planes, quant)
    tagged = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(sigs(F.col(vec_col))).alias("_table", "_sig"),
    )
    right = tagged.select(
        F.col("_table"), F.col("_sig"), F.col("_id").alias("_idb")
    )
    return (
        tagged.join(right, ["_table", "_sig"])
        .filter(F.col("_id") < F.col("_idb"))
        .select(F.col("_id").alias("id_a"), F.col("_idb").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def portable_hyperplane_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_planes: int,
    n_tables: int,
    quant: int = 1_000_000,
    round_digits: int = 6,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Planned-banding near-dup detection in the PRUNING regime with a
    fully portable candidate stage: ``portable_lsh_candidate_pairs``
    buckets, then the standard exact-cosine verification tail.  Callers
    size (n_planes, n_tables) with ``lsh_plan_for`` at their threshold;
    the d25 entry freezes the gate-corpus plan so a static SQL oracle
    can mirror the banding (the d24 convention).  ``n_rows`` forwards
    the caller's measured corpus count to the verify-route gate (see
    ``embedding_neardup_lsh``)."""
    cands = portable_lsh_candidate_pairs(
        df, id_col, vec_col, dim=dim, n_planes=n_planes,
        n_tables=n_tables, quant=quant,
    )
    return embedding_neardup_lsh(
        df, id_col, vec_col, threshold, dim=dim, round_digits=round_digits,
        candidates=cands, n_rows=n_rows,
    )


# id-hash bucket count for the signature store's clustered layout
# (round 15, VERDICT r14 #1): rows are range-clustered by
# ``_bucket = pmod(xxhash64(_id), N)`` at write, so an increment's
# verify pass prunes the store's heavy shingle scan to the row groups
# holding its candidate ids (parquet min/max stats; PushedFilters in
# the plan).  64 keeps bench-scale file counts trivial; a production
# store sizes it via SPARK_GRAFT_SIG_STORE_BUCKETS (recorded in the
# store's manifest metadata at write, READ BACK at increment time, so
# a later env change cannot mis-bucket the probe).
SIG_STORE_BUCKETS_DEFAULT = 64


def sig_store_buckets() -> int:
    import os

    return int(
        os.environ.get(
            "SPARK_GRAFT_SIG_STORE_BUCKETS", SIG_STORE_BUCKETS_DEFAULT
        )
    )


def _id_bucket(id_col: Column, buckets: int) -> Column:
    return F.pmod(F.xxhash64(id_col), F.lit(int(buckets))).cast("int")


def minhash_signature_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: Optional[int] = None,
    bucket_count: Optional[int] = None,
) -> DataFrame:
    """The PERSISTABLE per-document dedup state for incremental MinHash:
    ``(_id, _shingles, _sig)``.  A production pipeline writes this once
    per ingest (parquet / the commit log) and hands it back to
    :func:`incremental_minhash_dedup` via ``existing_state=`` on every
    later increment — the expensive per-document stages (the
    normalize/tokenize/shingle corpus scan and the one-md5-per-shingle
    base hash) are paid once per document LIFETIME instead of once per
    increment, and banding from the stored signature is pure expression
    arithmetic.  The schema is stable and columnar (array<string>,
    array<bigint>), so the store behaves like any parquet table
    (pruned, pushed, partitionable by ingest date).

    Contract: the state must have been built with the SAME
    ``shingle_n`` and ``num_hashes`` the increment runs with —
    signatures of different widths band differently and jaccard over
    different shingle grammars is meaningless.  The dial is therefore
    PERSISTED IN the state (``_shingle_n``/``_num_hashes`` literal
    columns — a few bytes after parquet RLE), and
    :func:`incremental_minhash_dedup` VALIDATES it with a one-row probe
    before banding: a store built with a different dial fails loudly
    instead of silently banding mismatched signature slices (the
    round-11 ADVICE hazard — the old check matched column names only).
    States written before round 12 lack the dial columns; the increment
    then still validates the signature WIDTH against ``num_hashes``
    (``F.size`` on the probe row), which catches every width mismatch
    but not a same-width different-``shingle_n`` store.

    Round 15 (VERDICT r14 #1 — per-increment store cost): two optional
    per-LIFETIME columns extend the state when the caller supplies the
    dials:

    * ``bands`` adds ``_bands`` — the banding keys PRECOMPUTED at write
      (``band_keys_expr`` over the fresh signature), so increments read
      them off the column-pruned scan instead of re-hashing every
      stored signature's band slices per increment.  Valid only for
      increments running the SAME ``bands`` dial; the store records it
      in manifest metadata and falls back to expression banding on a
      mismatch (re-banding from ``_sig`` stays the adaptive-dial path).
    * ``bucket_count`` adds ``_bucket = pmod(xxhash64(_id), N)`` — the
      clustering key the store's staged writes sort by, so the verify
      pass's shingle scan prunes to candidate row groups.
    """
    shingles = word_shingles_expr(
        norm_tokens_expr(F.col(text_col)), shingle_n
    )
    out = (
        df.select(F.col(id_col).alias("_id"), shingles.alias("_shingles"))
        .withColumn("_sig", minhash_expr_named("_shingles", num_hashes))
        .withColumn("_shingle_n", F.lit(int(shingle_n)))
        .withColumn("_num_hashes", F.lit(int(num_hashes)))
    )
    if bands is not None:
        assert num_hashes % int(bands) == 0, "bands must divide num_hashes"
        out = out.withColumn(
            "_bands",
            band_keys_expr_named(
                "_sig", int(bands), num_hashes // int(bands)
            ),
        )
    if bucket_count is not None:
        out = out.withColumn(
            "_bucket", _id_bucket(F.col("_id"), int(bucket_count))
        )
    return out


def _validate_state_dial(
    state: DataFrame, shingle_n: int, num_hashes: int
) -> None:
    """One-row probe validating a persisted signature store against the
    increment's dial (ADVICE round 12): signature width must equal
    ``num_hashes``, and when the store carries the round-12 dial
    columns, both persisted dial values must match exactly.  One tiny
    Spark action per increment; an empty store trivially passes (there
    is nothing to disagree with)."""
    cols = [F.size("_sig").alias("_w")]
    has_meta = {"_shingle_n", "_num_hashes"} <= set(state.columns)
    if has_meta:
        cols += [F.col("_shingle_n"), F.col("_num_hashes")]
    probe = state.select(*cols).head(1)
    if not probe:
        return
    row = probe[0]
    assert row["_w"] == num_hashes, (
        f"existing_state signatures are {row['_w']} hashes wide but the "
        f"increment runs num_hashes={num_hashes}: banding would slice "
        "mismatched signatures — rebuild the store or match the dial"
    )
    if has_meta:
        assert (
            row["_shingle_n"] == shingle_n
            and row["_num_hashes"] == num_hashes
        ), (
            f"existing_state was built with (shingle_n="
            f"{row['_shingle_n']}, num_hashes={row['_num_hashes']}) but "
            f"the increment runs (shingle_n={shingle_n}, num_hashes="
            f"{num_hashes}): jaccard over different shingle grammars is "
            "meaningless — rebuild the store or match the dial"
        )


def incremental_minhash_dedup(
    existing: Optional[DataFrame],
    batch: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    existing_state: Optional[DataFrame] = None,
    batch_state: Optional[DataFrame] = None,
    prune: str = "broadcast",
    band_join: str = "broadcast",
    validate_state_dials: bool = True,
    stored_bands: bool = False,
    store_bucket_count: Optional[int] = None,
) -> DataFrame:
    """Incremental near-dup detection: a NEW ingest batch against the
    ALREADY-INGESTED corpus (plus within-batch) — the form a 100 TB
    pipeline actually runs day to day: full-corpus re-dedup (d2/d8) is a
    backfill job, while every incremental drop decides only "is this new
    doc a duplicate of anything we already kept, or of an earlier doc in
    this batch?".

    Semantics: a batch doc x is a duplicate if some match m with exact
    shingle-Jaccard >= ``min_jaccard`` exists where m is an existing doc,
    OR m is a batch doc with m.id < x.id (first-in-batch stays canonical,
    d1's min-id rule).  Each duplicate reports its BEST match (max
    jaccard, tiebreak min matched id) with the match origin.

    Scale shape (round 13 — every per-increment exchange is now
    batch- or candidate-sized): the BATCH's band table is broadcast
    into the band-bucket join (``band_join="broadcast"``, the default
    — the batch is the small side by construction), so the existing
    corpus's band rows stream map-side and NO exchange carries
    existing-side band rows; ``band_join="shuffle"`` keeps the
    symmetric (id, band) bucket shuffle for a batch too large to
    broadcast (at which point the job is a backfill, d2's regime).
    The exact verify runs on candidates, never all-pairs; the
    best-match pick is a per-x window over candidate matches —
    partitioned by x, bounded by x's candidate count.  Round 14: the
    verify joins each candidate pair to BOTH sides' shingle arrays
    straight off the state scans and computes |A∩B|/|A∪B| as one
    array expression — the candidate pairs broadcast into the joins
    by default, so the state scans stream map-side and the only
    verify exchange is the candidate-bounded pair join
    (``prune="bloom"`` keeps a bitmap pre-filter for candidate sets
    past broadcast size — see ``_incremental_minhash_frames``); the
    exchange still carries O(candidates), never O(existing corpus).  In the ``existing_state``
    form nothing corpus-sized is persisted either: the state is
    parquet-backed, so the band pass and the verify pass each run one
    COLUMN-PRUNED scan of the store ((_id, _sig) and (_id, _shingles)
    respectively) instead of caching O(existing) shingle arrays per
    increment — the only corpus-sized work left in an increment.

    The existing side comes in ONE of two forms:

    * ``existing`` (a raw text frame) — self-contained: its
      shingle/signature state is recomputed this call.  Fine for
      one-shot jobs; a daily pipeline pays the full existing-corpus
      scan every increment.
    * ``existing_state`` (a :func:`minhash_signature_state` frame,
      usually read back from parquet) — the PRODUCTION form: each
      increment computes state for the BATCH only, never re-shingling
      the corpus, and shuffles only O(batch) band rows plus
      O(candidates) verify/pair rows; after the increment, append the
      batch's state to the store and the next increment starts from
      there.  Must have been built with the same
      ``shingle_n``/``num_hashes``.

    ``batch_state`` (optional, round 12): a precomputed
    :func:`minhash_signature_state` frame for the BATCH — the lifecycle
    wrapper (ingest/dedup_lifecycle.py) computes the batch's state once,
    persists it, runs the increment from it, and appends the SAME frame
    to the store, so the batch's shingle scan is paid once per lifetime
    too.  Validated against the dial like ``existing_state``.

    ``validate_state_dials=False`` (round 14) skips the one-row dial
    probes — two Spark actions per increment — when the CALLER has
    already proven the dial by other means: the lifecycle wrapper
    builds ``batch_state`` itself with the increment's own dial (the
    probe would be a tautology) and checks the store's dial against
    the commit-log manifest metadata recorded at append time (a
    driver-side JSON read instead of a Spark job).  Leave True for
    states of unproven provenance.

    Ids must be unique across both sides (true for any snapshot + delta
    of one corpus).

    The (num_hashes, bands) recall/threshold trade is the same S-curve
    as :func:`minhash_lsh_candidates` — size it with
    ``minhash_banding_plan`` when the dedup threshold sits below the
    default dial's ~0.707 midpoint.

    ``stored_bands``/``store_bucket_count`` (round 15, VERDICT r14 #1):
    set by the lifecycle wrapper when the store's manifest metadata
    proves its rows carry this increment's banding precomputed
    (``_bands``) and its files are clustered by ``_bucket`` — the band
    pass then reads stored keys instead of re-hashing every signature,
    and the verify pass prunes the shingle scan to candidate row
    groups.  Both default off; results are identical either way (the
    stored keys are the same expression evaluated at write time, and
    the bucket filter only removes rows no candidate references).
    """
    ex_side, b_side, cand, best = _incremental_minhash_frames(
        existing, batch, id_col, text_col,
        shingle_n, num_hashes, bands, min_jaccard, existing_state,
        batch_state, prune, band_join,
        validate_state_dials=validate_state_dials,
        stored_bands=stored_bands,
        store_bucket_count=store_bucket_count,
    )
    try:
        out = best.localCheckpoint(eager=True)
    finally:
        # ex_side is persisted only in the raw-`existing` form;
        # unpersist on the state-backed (never-persisted) frame is a
        # no-op
        ex_side.unpersist()
        b_side.unpersist()
        cand.unpersist()
    return out


# Bloom sizing for the incremental verify-corpus prune: the floor
# (2^20 bits = 128 KiB) holds ~10^5 candidate ids under 1% false-
# positive mass at k=5; past that the bitmap DOUBLES with the measured
# candidate-id count (>= ~10 bits/id) up to the cap — a fixed size
# would saturate at the ~1e8-id scale the bloom mode exists for, every
# probe would read true, and the verify corpus would silently revert
# to O(existing).  FPs only admit extra verify rows the exact
# equi-join drops, so the dial trades pruning, never correctness; at
# the cap (2^31 bits = 256 MiB broadcast, ~2e8 ids at 1% FP) the FP
# mass degrades gracefully instead of cliffing.
_INC_VERIFY_BLOOM_BITS = 1 << 20
_INC_VERIFY_BLOOM_MAX = 1 << 31
_INC_VERIFY_BLOOM_BITS_PER_ID = 10


def _incremental_minhash_frames(
    existing: Optional[DataFrame],
    batch: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int,
    num_hashes: int,
    bands: int,
    min_jaccard: float,
    existing_state: Optional[DataFrame],
    batch_state: Optional[DataFrame] = None,
    prune: str = "broadcast",
    band_join: str = "broadcast",
    validate_state_dials: bool = True,
    stored_bands: bool = False,
    store_bucket_count: Optional[int] = None,
):
    """Plan construction for :func:`incremental_minhash_dedup`, split
    out so tests can inspect the PRE-checkpoint plan (the public
    function localCheckpoints, which discards lineage).  Returns
    ``(ex_side, b_side, cand, best)`` — ``cand`` (the candidate pairs,
    O(candidates)) is always persisted; ``b_side`` (the batch's state,
    O(batch)) is persisted only when computed HERE (with
    ``batch_state=`` the caller owns its caching — the lifecycle
    persists the parent frame it also appends, and persisting the
    identity projection again would hold a second cached copy per
    increment); ``ex_side`` is persisted ONLY in the raw-``existing``
    form (the one-shot job, where the corpus state would otherwise be
    recomputed for the verify pass) and never in the
    ``existing_state`` form (the production store is parquet-backed —
    two column-pruned scans beat caching O(existing) shingle arrays
    per increment, and nothing corpus-sized may be persisted).  The
    CALLER owns their unpersist after materializing ``best``
    (unpersist on the never-persisted frames is a no-op).

    Band-join shape (round 13, closing the round-12 verdict's #1):
    ``band_join="broadcast"`` (default) broadcasts the BATCH's band
    table — O(batch × bands) narrow rows, the small side by
    construction — into the band-bucket join, so the existing side's
    band rows stream map-side from the state scan and NO exchange
    carries existing-side band rows (the plan shows a
    BroadcastHashJoin on ``_band`` and no
    ``hashpartitioning(_band)`` exchange; the only corpus-sized plan
    node left is the column-pruned state scan itself).
    ``band_join="shuffle"`` keeps the symmetric bucket shuffle for a
    batch too large to broadcast — but a batch of that size is d2's
    backfill regime, not an increment.

    The exact-verify stage is CANDIDATE-BOUNDED (round 12 closed the
    round-11 scale seam with a semi-join prune + shingle explode;
    round 14 collapsed it further): each candidate pair joins both
    sides' shingle arrays off the state scans and |A∩B|/|A∪B| is one
    array expression, so the only verify exchange carries candidate
    pairs with their arrays — O(candidates), never O(existing) —
    and no explode, count aggregate, or size join remains.  Output is
    provably identical (distinct arrays; inner joins on cand's ids
    admit exactly the candidate rows).

    ``prune`` picks the mechanism:

    * ``"broadcast"`` (default) — the candidate PAIRS broadcast as the
      build side of both verify joins, so the state scans stream
      map-side with no corpus-side exchange at all (round 14; the
      round-12 form additionally paid a semi-join probing pass before
      a shingle explode).  Everything stays inside the ONE final
      action, JVM-only.  Right choice while the candidate set fits a
      broadcast — bounded by the BATCH's candidate volume, megabytes
      for any daily increment.
    * ``"bloom"`` — d16's pattern: one m-bit bitmap over the candidate
      ids built in a separate first action, map-side pandas probe
      pre-filtering the verify rows to bloom suspects; the verify
      joins then run unhinted over suspect-bounded sides.  The
      extreme-scale posture for candidate sets past broadcast size
      (~1e8 ids); costs one extra Spark action + Python probe stages —
      pay it only when the broadcast would not fit.  False positives
      only admit rows the exact joins drop."""
    if prune not in ("broadcast", "bloom"):
        # validated BEFORE any persist is created, so a bad mode cannot
        # leak cached frames
        raise ValueError(f"unknown prune mode {prune!r}")
    if band_join not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown band_join mode {band_join!r}")
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    assert (existing is None) != (existing_state is None), (
        "pass exactly one of existing (raw text) or existing_state "
        "(a minhash_signature_state frame)"
    )
    rows = num_hashes // bands
    if existing_state is not None:
        missing = {"_id", "_shingles", "_sig"} - set(existing_state.columns)
        assert not missing, (
            f"existing_state lacks {sorted(missing)}: expected the "
            "(_id, _shingles, _sig) shape minhash_signature_state writes"
        )
        if validate_state_dials:
            _validate_state_dial(existing_state, shingle_n, num_hashes)
        # which per-lifetime columns may be trusted: the caller VOUCHES
        # for the dial match (stored_bands — manifest-metadata-proven
        # by the lifecycle wrapper); the bucket column is only useful
        # with its recorded count
        ex_has_bands = stored_bands and "_bands" in existing_state.columns
        ex_has_bucket = (
            store_bucket_count is not None
            and "_bucket" in existing_state.columns
        )
        ex_cols = ["_id", "_shingles", "_sig"]
        if ex_has_bands:
            ex_cols.append("_bands")
        if ex_has_bucket:
            ex_cols.append("_bucket")
        # NOT persisted: the store is parquet-backed, so the band pass
        # reads (_id, _sig|_bands) and the verify pass (_id, _shingles)
        # as two column-pruned scans — a persist here would cache
        # O(existing) shingle arrays per increment, the round-12 seam
        ex_state = existing_state.select(*ex_cols)
    else:
        # one-shot raw-text form: persisted, or the corpus would be
        # re-normalized/re-shingled/re-hashed for the verify pass.
        # Bands are computed WITH the state (one evaluation under the
        # persist) — trustworthy by construction, same expression.
        ex_state = minhash_signature_state(
            existing, id_col, text_col, shingle_n, num_hashes, bands=bands
        ).select("_id", "_shingles", "_sig", "_bands").persist()
        ex_has_bands = True
        ex_has_bucket = False
    if batch_state is not None:
        if validate_state_dials:
            _validate_state_dial(batch_state, shingle_n, num_hashes)
        b_has_bands = stored_bands and "_bands" in batch_state.columns
        # NOT persisted: the caller owns batch_state's caching (the
        # lifecycle persists the parent frame it also appends to the
        # store) — persisting the identity projection here would hold
        # a SECOND cached copy of the O(batch) arrays every increment
        # (round-13 review)
        b_cols = ["_id", "_shingles", "_sig"] + (
            ["_bands"] if b_has_bands else []
        )
        b_state = batch_state.select(*b_cols)
    else:
        b_state = minhash_signature_state(
            batch, id_col, text_col, shingle_n, num_hashes, bands=bands
        ).select("_id", "_shingles", "_sig", "_bands").persist()
        b_has_bands = True
    # band tables: the batch's is O(batch x bands) narrow rows (derived
    # twice from the persisted b_state — recomputing the explode beats
    # another cache entry); the existing side's streams straight off
    # the state scan and is never materialized.  Stored bands (when the
    # dial is proven) replace the per-increment re-hash of every
    # signature's band slices — the banding is computed once per
    # document lifetime, like the shingles and the signature itself.
    def _bands_of(frame: DataFrame, has_stored: bool):
        if has_stored:
            return F.explode(F.col("_bands"))
        return F.explode(band_keys_expr_named("_sig", bands, rows))

    b_band = b_state.select(
        "_id", _bands_of(b_state, b_has_bands).alias("_band")
    )
    ex_band = ex_state.select(
        F.col("_id").alias("_m"),
        F.lit("existing").alias("origin"),
        _bands_of(ex_state, ex_has_bands).alias("_band"),
    )
    bx = b_band.select(F.col("_id").alias("_x"), "_band")
    bm = ex_band.unionByName(
        b_band.select(
            F.col("_id").alias("_m"),
            F.lit("batch").alias("origin"),
            "_band",
        )
    )
    if band_join == "broadcast":
        # batch side on the BUILD side: the existing corpus's band
        # rows never shuffle — the probe streams map-side over the
        # column-pruned state scan
        pairs = bm.join(F.broadcast(bx), "_band")
    else:
        pairs = bm.join(bx, "_band")
    cand = (
        pairs.filter(
            (F.col("origin") == "existing")
            | (F.col("_m") < F.col("_x"))
        )
        .select("_x", "_m", "origin")
        .dropDuplicates(["_x", "_m"])
        .persist()
    )
    # exact verify (round 14, guide §2.4): each candidate pair joins
    # BOTH sides' shingle arrays straight off the column-pruned state
    # scans and |A∩B| / |A∪B| is one array expression — the round-12/13
    # chain (broadcast semi-join prune → shingle explode → compound-key
    # intersection join → groupBy count → two size joins) collapsed to
    # two id-keyed joins with zero aggregates and HALF the state scans
    # (the old plan derived exploded/sizes from the unpersisted pruned
    # frame twice each).  In the default broadcast mode the CANDIDATE
    # PAIRS are the broadcast build side of both joins, so the state
    # scans stream map-side — no corpus-side exchange at all, stronger
    # than the semi-join form, which still paid a probing pass before
    # the explode; the only exchange left is the candidate-bounded
    # (_x, _m) pair join.  prune="bloom" keeps the bitmap probe for
    # candidate sets past broadcast size: verify rows are pre-filtered
    # to bloom suspects and the joins run unhinted (shuffle joins over
    # suspect-bounded sides).  Output is provably identical: the
    # arrays are distinct (word_shingles_expr), |A∪B| = |A|+|B|−|A∩B|,
    # and zero-overlap pairs are dropped explicitly (the old inner
    # intersection join dropped them implicitly).
    ex_verify = ex_state
    if ex_has_bucket:
        # prune the store's HEAVY scan (the shingle arrays) to the row
        # groups holding candidate ids (round 15, VERDICT r14 #1): the
        # store's staged files are range-clustered by
        # pmod(xxhash64(_id), bucket_count), so an IN filter on the
        # handful of buckets the increment's existing-side candidates
        # hash into reaches the scan as a PushedFilter and parquet
        # min/max stats skip every untouched row group — the verify
        # scan reads O(candidate buckets / bucket_count) of the store
        # instead of O(existing).  Lossless by construction: every
        # candidate's bucket is in the collected set.  One tiny
        # driver collect over the (persisted) candidate frame, bounded
        # by bucket_count values.
        cand_buckets = sorted(
            r["_b"]
            for r in cand.filter(F.col("origin") == "existing")
            .select(
                _id_bucket(F.col("_m"), int(store_bucket_count)).alias("_b")
            )
            .distinct()
            .collect()
        )
        if cand_buckets:
            ex_verify = ex_state.filter(F.col("_bucket").isin(cand_buckets))
        else:
            ex_verify = ex_state.filter(F.lit(False))
    verify_base = ex_verify.select("_id", "_shingles").unionByName(
        b_state.select("_id", "_shingles")
    )
    if prune == "broadcast":
        verify_docs = verify_base
        hint = F.broadcast
    elif prune == "bloom":
        from .bloom import bloom_build, bloom_might_contain

        # every id participating in a candidate pair (both sides: _x
        # needs its shingles for the intersection too), out of ONE scan
        # of `cand`
        cand_ids = cand.select(
            F.explode(F.array("_x", "_m")).alias("_id")
        ).distinct()
        # the mode already pays a separate build action, so the sizing
        # count is one more cheap job over the (persisted) cand chain
        n_ids = cand_ids.count()
        m_bits = _INC_VERIFY_BLOOM_BITS
        while (
            m_bits < _INC_VERIFY_BLOOM_BITS_PER_ID * n_ids
            and m_bits < _INC_VERIFY_BLOOM_MAX
        ):
            m_bits <<= 1
        bitmap = bloom_build(
            cand_ids.withColumnRenamed("_id", "_cid"), "_cid",
            m_bits=m_bits,
        )
        verify_docs = verify_base.filter(
            bloom_might_contain(F.col("_id"), bitmap, m_bits)
        )
        hint = lambda df: df  # noqa: E731 — suspects shuffle unhinted
    sh_x = verify_docs.select(
        F.col("_id").alias("_x"), F.col("_shingles").alias("_shx")
    )
    sh_m = verify_docs.select(
        F.col("_id").alias("_m"), F.col("_shingles").alias("_shm")
    )
    xm = sh_x.join(hint(cand), "_x").select("_x", "_m", "origin", "_shx")
    mm = sh_m.join(hint(cand.select("_x", "_m")), "_m").select(
        "_x", "_m", "_shm"
    )
    inter = F.size(F.array_intersect(F.col("_shx"), F.col("_shm")))
    union = F.size(F.array_union(F.col("_shx"), F.col("_shm")))
    scored = (
        xm.join(mm, ["_x", "_m"])
        .withColumn("_inter", inter)
        .withColumn("_union", union)
        .filter(F.col("_inter") > 0)
        .withColumn(
            "jaccard",
            F.col("_inter").cast("double") / F.col("_union").cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )
    from pyspark.sql import Window

    best = (
        scored.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_x").orderBy(
                    F.desc("jaccard"), F.asc("_m")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_x").alias("doc_id"),
            F.col("_m").alias("matched_id"),
            "origin",
            "jaccard",
        )
    )
    return ex_state, b_state, cand, best


_MAX_CELL_TRAIN = 131_072  # honest driver-side trainer sample ceiling


def _cell_sizing(
    n_rows: int, n_clusters: Optional[int], target_cell_rows: int = 256
) -> "tuple[int, int]":
    """THE auto-sizing arithmetic for k-means cell stages (SemDeDup
    d13 and the d23 cell route share it, so the saturation guard
    cannot silently diverge): cells = max(8, ceil(N / target)) capped
    at max_train/39 (FAISS guidance: >= ~39 training points per
    centroid — past the cap the trainer sample saturates and cells
    degenerate), and the trainer sample scales with the cell count.
    An explicit ``n_clusters`` is honored as-is (the caller owns its
    sample budget) but the sample still scales to it."""
    import math

    cell_cap = max(8, _MAX_CELL_TRAIN // 39)
    if n_clusters is None:
        n_clusters = min(
            max(8, math.ceil(n_rows / target_cell_rows)), cell_cap
        )
    sample_size = min(_MAX_CELL_TRAIN, max(4096, 39 * n_clusters))
    return n_clusters, sample_size


def semantic_cell_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: Optional[int] = None,
    n_probe: int = 2,
    seed: int = 42,
    target_cell_rows: int = 256,
) -> "tuple[Optional[DataFrame], int, int]":
    """The CELL-ASSIGNMENT stage of ``semantic_neardup_pairs``, exposed
    on its own: returns ``(tagged, n_clusters, n_rows)`` where ``tagged``
    is the (_id, _cell, _v) frame each vector lands in for its
    ``n_probe`` nearest cells (None on empty input).

    Designed candidate volume is Σ_cells C(pop, 2) — the quantity the
    scale smoke counts at both corpus scales so wall-clock growth
    decomposes into designed comparisons vs plan cost (the d7
    decomposition's k-means sibling).

    Auto-sizing contract (``n_clusters=None``): cells =
    ``max(8, ceil(N / target_cell_rows))`` so the average cell
    population stays bounded — total comparisons LINEAR in N.  The
    centroid trainer's sample must scale with the cell count (FAISS
    guidance: >= ~39 training points per centroid) or auto-sized cells
    silently saturate at the sample size and the within-cell verify
    reverts to O(N²/sample).  The driver-side trainer is honest up to
    ~128k sample rows, so the AUTO path caps its cells at max_train/39,
    ending the linear regime at N ≈ cell_cap * target_cell_rows (~860k
    at defaults) — larger corpora should coarse-pre-partition (LSH
    bucket or metadata shard) and run SemDeDup per shard, the
    hierarchical form.  An EXPLICIT caller n_clusters is honored as-is
    (the caller owns its sample budget)."""
    import math

    from ..functions.vector_pandas import nearest_cells_udf
    from .similarity import train_ivf_centroids

    # ONE action serves empty-guard, auto-sizing, AND the trainer's
    # sample arithmetic (it previously recounted internally)
    n_rows = df.count()
    if n_rows == 0:
        return None, 0, 0
    n_clusters, sample_size = _cell_sizing(
        n_rows, n_clusters, target_cell_rows
    )
    centroids = train_ivf_centroids(
        df, id_col, vec_col, nlist=n_clusters, seed=seed,
        sample_size=sample_size, corpus_rows=n_rows,
    )
    cells = nearest_cells_udf(centroids, n_probe)
    tagged = df.select(
        F.col(id_col).alias("_id"),
        F.explode(cells(F.col(vec_col))).alias("_cell"),
        F.col(vec_col).alias("_v"),
    )
    return tagged, n_clusters, n_rows


def semantic_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_clusters: Optional[int] = None,
    n_probe: int = 2,
    seed: int = 42,
    round_digits: int = 6,
    target_cell_rows: int = 256,
    assignments: "Optional[tuple[Optional[DataFrame], int, int]]" = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means-cluster the
    embedding space, compare only within clusters (Abbas et al. 2023,
    "SemDeDup" — public literature; clustering bounds the quadratic
    verify to cluster populations instead of the corpus).

    Centroids train on a driver-side sample
    (similarity.train_ivf_centroids — one pruned scan, no shuffle);
    every vector lands in its ``n_probe`` nearest cells via one Arrow
    matmul; then ONE applyInPandas matmul per cell scores all in-cell
    pairs exactly.  Each vector crosses the Python boundary once per
    probed cell — the candidate-join alternative ships TWO vector
    copies per candidate pair (quadratic bytes in cell population;
    measured 8 s → 2 s at sf0.1).  n_probe ≥ 2 catches pairs straddling
    a cell boundary — recall < 1 remains possible by construction and
    is asserted against the exact pairs at test scale.

    Scaling contract (``n_clusters=None``, the default): the cell count
    auto-sizes to ``max(8, ceil(N / target_cell_rows))`` — cells grow
    PROPORTIONALLY with the corpus so the average cell population stays
    bounded, which is SemDeDup's own configuration (their cluster count
    tracks corpus size) and what keeps total comparisons
    O(N · p² · cell) — LINEAR in N.  A fixed cell count is quadratic
    (O(N²/c) — the round-6 smoke caught the entry at 49× on 10× data);
    cells ≈ √N is the often-quoted compromise but still N^1.5.  Hot
    cells remain the residual risk (salting cannot split an all-pairs
    group without losing cross-bucket pairs); the blocked matmul bounds
    a pathological cell's task memory to O(block · cell) while its
    quadratic time stays the price of the cell size.
    """
    import numpy as np
    import pandas as pd

    # `assignments`: a precomputed `semantic_cell_assignments` result —
    # the scale-smoke decomposition probe counts candidates from the
    # same tagging it then times, instead of re-paying the count action
    # and the driver-side k-means a second time
    if assignments is None:
        assignments = semantic_cell_assignments(
            df, id_col, vec_col, n_clusters=n_clusters, n_probe=n_probe,
            seed=seed, target_cell_rows=target_cell_rows,
        )
    tagged, n_clusters, n_rows = assignments
    if tagged is None:
        # nothing to train centroids on; emit the empty pair frame with
        # the contract schema instead of letting np.stack([]) blow up
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, score double"
        )

    scale = 10.0 ** round_digits
    id_type = df.schema[id_col].dataType.simpleString()

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # one matmul per cell: each vector enters the cell ONCE and all
        # pairwise scores come from X @ X.T — the per-pair alternative
        # (candidate join + row-wise cosine) ships TWO vector copies per
        # candidate pair through Arrow, which is quadratic bytes in cell
        # population; this is linear.
        pdf = pdf.sort_values("_id")
        ids = pdf["_id"].to_numpy()
        n = len(ids)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "score": []}).astype(
            {"id_a": ids.dtype, "id_b": ids.dtype, "score": "float64"}
        )
        if n < 2:
            return empty
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        # BLOCKED matmul: a hot cell must not allocate the full n x n
        # similarity matrix in one task — each pass scores a row block
        # against the whole cell, bounding memory to O(block * n) while
        # the quadratic time stays the price of the cell size
        block = max(1, (1 << 25) // max(n, 1))
        outs = []
        for lo in range(0, n, block):
            sims = Xn[lo : lo + block] @ Xn.T
            # portable_round semantics (floor(x*1e6 + 0.5) / 1e6)
            s = np.floor(sims * scale + 0.5) / scale
            ia, ib = np.nonzero(s >= threshold)
            ga = ia + lo
            # strict id inequality: upper triangle by POSITION plus a
            # value check, so duplicate input ids never emit self-pairs
            keep = (ga < ib) & (ids[ga] != ids[ib])
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[ga[keep]],
                            "id_b": ids[ib[keep]],
                            "score": s[ia[keep], ib[keep]],
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    out_schema = f"id_a {id_type}, id_b {id_type}, score double"
    pairs = tagged.groupBy("_cell").applyInPandas(cell_pairs, out_schema)
    # n_probe > 1 finds boundary pairs in several cells; scores are
    # deterministic per pair, so the dedup keeps identical rows
    return pairs.dropDuplicates(["id_a", "id_b"])


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    block_col: Optional[str] = None,
    min_jaccard: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Prefix-filtered exact set-similarity join — PPJoin's candidate
    pruning (Chaudhuri et al. ICDE 2006 SSJoin; Xiao et al. WWW 2008)
    applied to ``ngram_jaccard_pairs``: identical output, far fewer
    candidate pairs.

    The theorem: order every set by one GLOBAL token order (rarest
    first) and keep only each set's prefix of length
    ``|s| - ceil(t*|s|) + 1``; any pair with Jaccard >= t must collide
    on at least one PREFIX token, so joining on prefix tokens only is
    LOSSLESS while hot (frequent) shingles — exactly the ones that blow
    up the candidate count — drop out of the prefixes of large sets.
    Exact verification then computes true Jaccard on the survivors.

    Scale shape: the frequency dim is distinct-shingle-sized (its rank
    window is over TYPES, the t15 normalizer-dim note); the per-set
    prefix cut is one row_number window partitioned by document; the
    candidate self-join shuffles (id, prefix-token) pairs only.
    """
    t = min_jaccard
    block = [F.col(block_col).alias("_block")] if block_col else []
    block_keys = ["_block"] if block_col else []
    shingled = df.select(
        F.col(id_col).alias("_id"),
        *block,
        word_shingles_expr(_norm_tokens(F.col(text_col)), shingle_n).alias(
            "_shingles"
        ),
    )
    # persist only on the materialize path, where this function also
    # unpersists: a materialize=False caller gets a PURE lazy plan (for
    # inspection/composition) with no hidden cached state to leak
    if materialize:
        shingled = shingled.persist()
    sizes = shingled.select(
        *block_keys, "_id", F.size("_shingles").alias("_sz")
    )
    exploded = shingled.select(
        *block_keys, "_id", F.explode("_shingles").alias("_sh")
    )
    # global order: ascending document frequency, rarest first (ties by
    # token). (_df, _sh) IS the total order — materializing it as a
    # row_number rank would funnel every distinct shingle through one
    # Exchange SinglePartition task, so the per-doc window sorts by the
    # pair directly and the frequency dim stays a plain key-partitioned
    # aggregate
    from pyspark.sql import Window

    freq = exploded.groupBy("_sh").agg(F.count(F.lit(1)).alias("_df"))
    ex_rk = exploded.join(freq, "_sh")
    pos_w = Window.partitionBy("_id").orderBy(F.asc("_df"), F.asc("_sh"))
    with_pos = ex_rk.withColumn("_pos", F.row_number().over(pos_w)).join(
        sizes.select("_id", "_sz"), "_id"
    )
    # persisted on the materialize path: both sides of the candidate
    # self-join read this frame
    prefix = with_pos.filter(
        F.col("_pos") <= F.col("_sz") - F.ceil(F.lit(t) * F.col("_sz")) + 1
    ).select(*block_keys, "_id", "_sh")
    if materialize:
        prefix = prefix.persist()
    right = prefix.select(
        *[F.col(k) for k in block_keys],
        F.col("_id").alias("_idb"),
        F.col("_sh"),
    )
    cand = (
        prefix.join(right, block_keys + ["_sh"])
        .filter(F.col("_id") < F.col("_idb"))
        .select(F.col("_id").alias("id_a"), F.col("_idb").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verify on candidates — the array-expression verify (round
    # 14): candidates join both sides' shingle arrays off the persisted
    # shingle table, |A∩B|/|A∪B| in one projection (identical values to
    # the exploded-count form; see _pair_jaccard_arrays)
    out = _pair_jaccard_arrays(
        cand, shingled.select("_id", "_shingles"), t
    )
    if materialize:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            shingled.unpersist()
            prefix.unpersist()
    return out


def _rolling_gram_hashes(
    base: DataFrame, k: int, wide: bool = False
) -> DataFrame:
    """(_id, _pos, _gh) for every k-token rolling window of ``_t`` —
    each gram folds to a hash INSIDE the scan projection, so nothing
    downstream ever moves gram text.  Docs shorter than k emit no
    grams.

    ``wide=False``: ``_gh`` is one xxhash64 (8-byte exchanges) — enough
    for the MEASURE path, where a collision only over-counts.
    ``wide=True``: ``_gh`` is a struct of two independent xxhash64
    values (the second salts the input with a literal, giving a
    distinct keyed hash) — a 128-bit key for the RESOLVE path, where a
    collision would silently over-DROP non-duplicate content: at the
    advertised 100 TB posture (order 10^12-10^13 grams) the 64-bit
    birthday bound n^2/2^64 exceeds 1, while the 128-bit bound stays
    below 10^-12.  Exchanges carry 16 bytes instead of 8 — still hash
    rows, never gram text."""
    n = F.size("_t")

    def _h(i):
        g = F.concat_ws(" ", F.slice("_t", i + 1, k))
        if not wide:
            return F.xxhash64(g)
        return F.struct(
            F.xxhash64(g).alias("h1"),
            F.xxhash64(F.lit("salt2"), g).alias("h2"),
        )

    empty_t = "array<struct<h1:bigint,h2:bigint>>" if wide else "array<bigint>"
    gram_hashes = F.when(
        n >= k, F.transform(F.sequence(F.lit(0), n - k), _h)
    ).otherwise(F.array().cast(empty_t))
    return base.select(
        "_id", F.posexplode(gram_hashes).alias("_pos", "_gh")
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Exact substring (k-token span) duplication statistics — the
    distributed form of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), whose single-node tool builds a
    suffix array to find substrings repeated across the corpus.  Here
    every k-token rolling window of the normalized token stream is a
    gram; a gram occurring >= ``min_count`` times corpus-wide (their
    "appears more than once", counting within-document repeats) marks
    its k-token span as duplicated.  Per document we report the number
    of duplicated window STARTS (``dup_grams``) and the length of the
    UNION of the duplicated spans (``dup_tokens`` — merged intervals,
    i.e. how many tokens sit inside at least one duplicated window),
    the quantity Lee et al. trim.  Granularity ladder: d1 whole-doc →
    d17 paragraph → this, token spans.

    Returns ``(id_col, n_tokens, n_grams, dup_grams, dup_tokens,
    dup_fraction)`` for documents with at least one duplicated span.

    Scale shape: gram text never leaves its scan task — each window is
    folded to xxhash64 inside the projection, so the corpus-scale
    exchanges carry int64 hashes, not k-token strings (8 bytes vs
    ~8x tokens); the frequency aggregate is partial+final, so a hot
    boilerplate gram collapses to one row per task BEFORE the shuffle
    (the d17 skew discipline); the mark-back is a hash-keyed shuffle
    join (AQE-skew-safe, nothing corpus-sized broadcasts); the span
    union is an in-group sorted-interval merge via ``F.aggregate`` —
    O(dup_grams) per doc with NO k-way position explode (the oracle's
    count-distinct-token trick is the O(n*k) toy-scale form of the same
    number).  Collision bound: two distinct grams sharing an xxhash64
    can only OVER-mark a span; P(any collision) < n_grams^2 / 2^64.

    ``materialize`` as in ``minhash_lsh_candidates``: eager per-doc
    result + released gram cache by default; ``False`` returns the
    pure lazy plan (for inspection/composition) and the caller accepts
    the double gram-projection evaluation.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        _norm_tokens(
            F.coalesce(F.col(text_col), F.lit(""))
        ).alias("_t"),  # NULL text == empty doc (the d17/oracle convention)
    )
    # base (the tokenized corpus) feeds the gram projection AND the
    # meta join below — persist it too, or every document is tokenized
    # twice per call (round-8 ADVICE).  Tradeoff: caching the token
    # arrays costs ~corpus memory (MEMORY_AND_DISK spills past it) to
    # save a second full tokenization scan — the right trade whenever
    # tokenization dominates, which it does (regex split + lowercase
    # over every byte vs a column projection)
    if materialize:
        base = base.persist()
    n = F.size("_t")
    # the gram projection (tokenize + per-window slice/concat/xxhash64)
    # is the operator's dominant cost and feeds BOTH the frequency
    # aggregate and the mark-back join probe — persist it once (the
    # minhash_lsh_candidates discipline); materialize=True computes the
    # small per-doc result eagerly and releases the cache
    grams = _rolling_gram_hashes(base, k)
    if materialize:
        grams = grams.persist()
    dup_hashes = (
        grams.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_gh")
    )
    marked = grams.join(dup_hashes, "_gh").select("_id", "_pos")
    # positions are unique per doc by construction, so collect_set is a
    # dup-free gather and its size equals the marked-row count
    per_doc = marked.groupBy("_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_grams"),
        F.array_sort(F.collect_set("_pos")).alias("_ps"),
    )
    zero = F.struct(
        F.lit(0).cast("bigint").alias("cov"),
        F.lit(-1).cast("bigint").alias("end"),
    )
    dup_tokens = F.aggregate(
        F.col("_ps"),
        zero,
        lambda acc, p: F.struct(
            (
                acc["cov"]
                + F.greatest(
                    F.lit(0).cast("bigint"),
                    (p + F.lit(k)).cast("bigint")
                    - F.greatest(acc["end"], p.cast("bigint")),
                )
            ).alias("cov"),
            F.greatest(acc["end"], (p + F.lit(k)).cast("bigint")).alias(
                "end"
            ),
        ),
        lambda acc: acc["cov"],
    )
    meta = base.select(
        "_id",
        n.cast("bigint").alias("n_tokens"),
        F.greatest(n - k + 1, F.lit(0)).cast("bigint").alias("n_grams"),
    )
    out = meta.join(per_doc, "_id").select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "n_grams",
        "dup_grams",
        dup_tokens.alias("dup_tokens"),
        (dup_tokens.cast("double") / F.col("n_tokens")).alias(
            "dup_fraction"
        ),
    )
    if materialize:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            # unpersist even when the checkpoint action fails — the
            # corpus-scale gram/token caches must not outlive the call
            grams.unpersist()
            base.unpersist()
    return out


def substring_dedup_resolve(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    materialize: bool = True,
) -> DataFrame:
    """Exact substring dedup RESOLUTION — the trimming step of Lee et
    al. 2022 that ``substring_dup_stats`` only measures: every
    duplicated k-token window occurrence EXCEPT the corpus-first one
    (min (doc_id, pos) per gram — within-doc repeats resolve the same
    way) is dropped; each document is reassembled from its surviving
    tokens and the cleaned text is md5-pinned (d17's paragraph-level
    contract at token granularity).  The first occurrence always
    survives, so no content is lost from the corpus — only repeats.

    Returns ``(id_col, n_tokens, n_kept, n_dropped, clean_md5)`` for
    ALL documents (untouched docs keep their full text), ordered by
    nothing — callers order.

    Scale shape: shares ``_rolling_gram_hashes`` (hash-only exchanges);
    first-occurrence resolution is groupBy(gh).agg(min(struct(doc,
    pos)), count) — partial+final, hot grams collapse map-side (the
    d17 discipline); the drop-window mark-back is a hash-keyed join;
    per-doc reassembly is pure array arithmetic in one projection
    (flatten drop starts to covered indices, array_except against the
    index range, element_at gather) — no per-token explode, no second
    corpus shuffle beyond the per-doc drop-start gather.  Unlike the
    measure path, the gram key here is 128-bit (``wide=True``: a struct
    of two independently-keyed xxhash64 values): this path MUTATES the
    corpus, and at trillions of grams the 64-bit birthday bound exceeds
    1 — a collision would silently over-drop non-duplicate content the
    sf-scale exact-string oracle could never see (round-8 ADVICE).  The
    128-bit bound stays < 1e-12 at 10^13 grams.  ``materialize`` as in
    ``substring_dup_stats``.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        _norm_tokens(
            F.coalesce(F.col(text_col), F.lit(""))
        ).alias("_t"),  # NULL text == empty doc (the d17/oracle convention)
    )
    # persist the tokenized corpus too: it feeds the gram projection AND
    # the final reassembly join — without this every doc is tokenized
    # twice (round-8 ADVICE; see substring_dup_stats for the tradeoff)
    if materialize:
        base = base.persist()
    grams = _rolling_gram_hashes(base, k, wide=True)
    if materialize:  # grams feeds the firsts aggregate AND the join probe
        grams = grams.persist()
    # struct field order IS the resolution order: (_id, _pos) = corpus
    # order, so min() picks the first occurrence by (doc, pos)
    firsts = grams.groupBy("_gh").agg(
        F.min(F.struct("_id", "_pos")).alias("_f"),
        F.count(F.lit(1)).alias("_c"),
    )
    dropw = (
        grams.join(firsts.filter(F.col("_c") >= min_count), "_gh")
        .filter(
            ~(
                (F.col("_id") == F.col("_f._id"))
                & (F.col("_pos") == F.col("_f._pos"))
            )
        )
        .select("_id", "_pos")
    )
    per_doc = dropw.groupBy("_id").agg(
        F.collect_set("_pos").alias("_ps")
    )
    n = F.size("_t").cast("bigint")
    ps = F.coalesce(
        F.col("_ps"), F.array().cast("array<int>")
    )
    dropped_idx = F.array_distinct(
        F.flatten(
            F.transform(
                ps,
                lambda p: F.sequence(
                    p.cast("bigint"), p.cast("bigint") + F.lit(k - 1)
                ),
            )
        )
    )
    all_idx = F.when(n > 0, F.sequence(F.lit(0).cast("bigint"), n - 1)).otherwise(
        F.array().cast("array<bigint>")
    )
    # array_except preserves the order of its first argument (and the
    # index range is built ascending), so the gather below reassembles
    # tokens in original document order
    kept_idx = F.array_except(all_idx, dropped_idx)
    kept_tokens = F.transform(
        kept_idx, lambda i: F.element_at("_t", (i + 1).cast("int"))
    )
    out = base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        n.alias("n_tokens"),
        F.size(kept_idx).cast("bigint").alias("n_kept"),
        (n - F.size(kept_idx)).cast("bigint").alias("n_dropped"),
        F.md5(F.concat_ws(" ", kept_tokens)).alias("clean_md5"),
    )
    if materialize:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            grams.unpersist()
            base.unpersist()
    return out


def semantic_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    route: str = "broadcast",
    n_clusters: Optional[int] = None,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Semantic eval-set decontamination — the embedding-space twin of
    ``textan.decontaminate`` (d9's lexical shingle overlap): flag every
    training row whose vector is within ``threshold`` cosine of ANY
    benchmark row.  Lexical decontamination misses paraphrases; this is
    the second scrub modern pipelines run against held-out benchmarks
    (the d13/SemDeDup similarity notion applied to the d9 task).

    Returns ``(id_col, n_matches, max_cos, contaminated_by)`` for
    flagged rows only — count of benchmark hits, the best cosine, and
    the smallest matching benchmark id.  The cosine is rounded (the
    portable floor form) BEFORE thresholding — d6's actual convention
    (embedding_neardup_pairs: "rounded BEFORE thresholding so Spark
    and an external oracle agree at FP boundaries"); thresholding raw
    would let a pair within 1 ulp of the threshold flag in one engine
    and not the other.

    ``route="broadcast"`` (the default — decontamination is an
    EXACTNESS contract, so the exact route must be what callers get
    unless they opt out): benchmarks are dimension-sized by
    nature (thousands of rows against a corpus of billions), so the
    eval side BROADCASTS and the corpus is scanned exactly once — the
    cosine is a per-(row, benchmark) JVM expression on the broadcast
    nested-loop, the flag aggregate is partial+final on the corpus id,
    and nothing corpus-sized shuffles.  EXACT.

    ``route="cells"``: the past-broadcast posture — d13's k-means cell
    assignment applied to BOTH sides (centroids trained on the train
    corpus; each vector lands in its ``n_probe`` nearest cells), pairs
    compared only within shared cells.  Unlike the d16/d19 bloom
    routes this is NOT output-invisible at partial probe: recall is
    the ``n_probe`` dial exactly as in ``semantic_neardup_pairs``, the
    flagged set is always a SUBSET of the broadcast route's, and
    ``n_probe == n_clusters`` reproduces it exactly (every vector in
    every cell) — both contracts are pinned in tests.

    When to switch (SCALE_SMOKE ``route_crossover``, measured on a
    clustered mixture-of-Gaussians corpus in a 4 GiB worker): the
    cells route wins once the eval set reaches ~10% of the corpus
    (eval 2k vs 20k vectors: 23.0 s vs broadcast's 38.8 s; at eval
    20k, 184.2 s vs 380.6 s) — the broadcast crossJoin's
    eval × corpus cosine work grows past the cell-pruned candidate
    set + the k-means training cost.  Cell routing is a CLUSTERING
    bet: on a near-uniform corpus the probed cells overlap so much
    that nothing sheds (measured 307 s vs 38 s — pure overhead), the
    same worst case IVF has; stay on broadcast there at any eval size.

    ``route="auto"`` (OPT-IN, round 12 — round 11 briefly made it the
    default, but auto can select the subset-approximate cells route,
    and a decontamination operator must not weaken its exactness
    guarantee silently; when auto does pick cells at partial probe it
    now emits a ``UserWarning`` saying so): encode the crossover
    measurement as the routing decision instead of a docstring a user
    must find.  Cheap observables only — two counts, and (past the
    crossover thresholds) a sampled cluster-shed ESTIMATE:

    * eval under ``_AUTO_EVAL_FRAC`` of the corpus, or total pair work
      under ``_AUTO_MIN_PAIRS`` → broadcast (the measured win regime,
      and the EXACT route — the gate entries land here by
      construction).
    * otherwise train the cells route's own centroids once and
      estimate the candidate fraction from sampled multi-probe
      assignments (sum over cells of train-share × eval-share — this
      measures the clustering bet directly: a skewed/overlapping
      assignment on near-uniform corpora reads high and keeps
      broadcast; a genuinely clustered corpus reads low and routes to
      cells, re-using the already-trained centroids).  Cells at
      partial probe is subset-approximate exactly as ``route="cells"``
      documents.

    The chosen route is exposed on the result as ``._auto_route``;
    explicit ``"broadcast"``/``"cells"`` remain as overrides.
    """
    from ..functions.scoring import portable_round
    from ..functions.vector import cosine_from_norms, l2_norm

    if route not in ("auto", "broadcast", "cells"):
        raise ValueError(f"unknown route {route!r}")
    # norms once per ROW, not per pair: cosine_from_norms is
    # FP-identical to cosine_similarity at a third of the interpreted
    # HOF cost on the (corpus x benchmark) hot path
    tr = train.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_n_t")
    )
    ev = eval_df.select(
        F.col(id_col).alias("_e_id"),
        F.col(vec_col).alias("_e_vec"),
        l2_norm(F.col(vec_col)).alias("_n_e"),
    )
    centroids = None
    if route == "auto":
        route, centroids = _decontam_auto_route(
            tr, ev, id_col, vec_col, n_clusters, n_probe, seed
        )
        if route == "cells" and n_probe < len(centroids):
            import warnings as _warnings

            _warnings.warn(
                "semantic_decontaminate(route='auto') selected the "
                f"cells route at partial probe (n_probe={n_probe} < "
                f"{len(centroids)} cells): the flagged set is a SUBSET "
                "of the exact broadcast result; pass route='broadcast' "
                "for the exact scrub",
                UserWarning,
                stacklevel=2,
            )
    if route == "cells":
        pairs = _cell_paired(
            tr, ev, id_col, vec_col, n_clusters, n_probe, seed,
            centroids=centroids,
        )
    else:
        pairs = tr.crossJoin(F.broadcast(ev))
    cos = cosine_from_norms(
        F.col(vec_col), F.col("_e_vec"), F.col("_n_t"), F.col("_n_e")
    )
    # score ONCE in the projection, threshold the rounded column
    extra = ["_rowid", "_e_rowid"] if route == "cells" else []
    scored = pairs.select(
        id_col, F.col("_e_id"),
        portable_round(cos, 6).alias("_cos"),
        *extra,
    )
    hits = scored.filter(F.col("_cos") >= F.lit(threshold))
    if route == "cells":
        # multi-cell collision dedupe, AFTER scoring and thresholding:
        # the deduped rows are (ids, cos) — ~50 B — instead of pair
        # rows still carrying both vectors (~1.1 KB at dim 64), and
        # only the HITS reach the exchange.  Measured (round-10 route
        # crossover, 4g worker): deduping vector-bearing pairs OOMed at
        # eval=20k on the clustered corpus while the broadcast route
        # survived — the exact inversion of the route's purpose.  The
        # duplicate scores are bit-identical (same vectors in every
        # shared cell), so keeping one per (train row, eval row) is
        # payload-invisible.
        hits = hits.dropDuplicates(["_rowid", "_e_rowid"]).drop(
            "_rowid", "_e_rowid"
        )
    out = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.max("_cos").alias("max_cos"),
        F.min("_e_id").alias("contaminated_by"),
    )
    out._auto_route = route
    return out


# route="auto" dials, all from the committed route_crossover measurement
# (clustered mixture corpus, 4 GiB worker): cells won from eval ~10% of
# a 20k corpus; below ~1e7 pair-cosines the broadcast crossJoin finished
# in seconds and cell machinery is pure overhead; the shed estimate must
# clear half of all-pairs before the clustering bet is worth taking
# (mirrors the planners' prune_fraction convention).
_AUTO_EVAL_FRAC = 0.10
_AUTO_MIN_PAIRS = 10_000_000
_AUTO_SHED_MAX = 0.5
_AUTO_SAMPLE = 1_024


def _decontam_auto_route(
    tr: DataFrame,
    ev: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: Optional[int],
    n_probe: int,
    seed: int,
):
    """Resolve ``route="auto"`` for :func:`semantic_decontaminate` from
    cheap observables.  Returns ``(route, centroids)`` — centroids are
    non-None only when cells is chosen, so `_cell_paired` re-uses the
    training this probe already paid for instead of training twice."""
    import numpy as np

    from .similarity import train_ivf_centroids

    n_t = tr.count()
    n_e = ev.count()
    if (
        n_t == 0
        or n_e == 0
        or n_e < _AUTO_EVAL_FRAC * n_t
        or n_t * n_e < _AUTO_MIN_PAIRS
    ):
        return "broadcast", None
    nlist, sample_size = _cell_sizing(n_t, n_clusters)
    centroids = train_ivf_centroids(
        tr, id_col, vec_col, nlist=nlist, seed=seed,
        sample_size=sample_size, corpus_rows=n_t,
    )
    n_probe_eff = min(n_probe, len(centroids))

    def shares(df, col, n_rows):
        frac = min(1.0, (4 * _AUTO_SAMPLE) / max(n_rows, 1))
        rows = (
            df.select(col).sample(False, frac, seed)
            .limit(_AUTO_SAMPLE).collect()
        )
        if not rows:
            # a pathologically unlucky sample (possible only at tiny n,
            # which the work floor already routed to broadcast) reads as
            # fully concentrated — the conservative, exact choice
            return None
        X = np.array([list(r[0]) for r in rows], dtype=np.float64)
        # squared-Euclidean nearest cells — the nearest_cells_udf metric
        d = (
            (X * X).sum(1)[:, None]
            - 2.0 * X @ centroids.T
            + (centroids * centroids).sum(1)[None, :]
        )
        take = min(n_probe_eff, d.shape[1])
        idx = np.argpartition(d, take - 1, axis=1)[:, :take]
        share = np.bincount(idx.ravel(), minlength=len(centroids))
        return share / max(len(X), 1)

    p_t = shares(tr, vec_col, n_t)
    p_e = shares(ev, "_e_vec", n_e)
    if p_t is None or p_e is None:
        return "broadcast", None
    # expected candidate pairs / (n_t * n_e): the clustering bet,
    # measured on THIS corpus's actual assignment skew
    frac_est = float((p_t * p_e).sum())
    if frac_est < _AUTO_SHED_MAX:
        return "cells", centroids
    return "broadcast", None


def _cell_paired(
    tr: DataFrame,
    ev: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: Optional[int],
    n_probe: int,
    seed: int,
    centroids=None,
) -> DataFrame:
    """(train row, eval row) candidate pairs via shared k-means cells —
    the decontamination form of d13's candidate stage: ONE set of
    centroids (trained on the train corpus, the big side) tags both
    frames with their n_probe nearest cells; the join is cell-keyed
    (id-and-vector rows shuffle only into their few cells, never
    all-pairs).  Multi-cell collisions dedupe per (train ROW, eval
    ROW) — BOTH sides get a row nonce assigned BEFORE their cell
    explode, so duplicate ids (same id, different vectors) on either
    side each keep their own candidates exactly as the broadcast
    route's crossJoin counts them (round-8 ADVICE fixed the train
    side; the round-9 review found the eval side had the same
    collapse: two eval rows sharing an id would dedupe to one
    arbitrary candidate, undercounting n_matches and able to drop a
    flag the broadcast route raises)."""
    from ..functions.vector_pandas import nearest_cells_udf
    from .similarity import train_ivf_centroids

    # ONE definition of each side's pre-explode projection (the nonce
    # is per PRE-explode row: stable within the plan, never leaves this
    # function, only compared for equality) — the empty-train early
    # return and the normal path both build from these, so their
    # column sets cannot desync (round-10: the early return crashed the
    # route on an empty corpus after the rowids were added to only the
    # normal path)
    t_proj = tr.select(
        F.monotonically_increasing_id().alias("_rowid"),
        F.col(id_col),
        F.col(vec_col),
        "_n_t",
    )
    e_proj = ev.select(
        F.monotonically_increasing_id().alias("_e_rowid"),
        "_e_id",
        "_e_vec",
        "_n_e",
    )
    n_rows = tr.count()
    if n_rows == 0:
        # no candidates; an empty cell-route equals the empty exact set
        return t_proj.crossJoin(e_proj.limit(0))
    # shared sizing with semantic_cell_assignments: the cell cap and
    # sample scaling are what keep this route from degenerating at the
    # past-broadcast scale it exists for (trainer saturation -> giant
    # cells -> candidate blow-up)
    n_clusters, sample_size = _cell_sizing(n_rows, n_clusters)
    if centroids is None:
        centroids = train_ivf_centroids(
            tr, id_col, vec_col, nlist=n_clusters, seed=seed,
            sample_size=sample_size, corpus_rows=n_rows,
        )
    # a caller-supplied centroid matrix (the auto-route probe's) was
    # trained with this same sizing, so the probe and the join agree
    n_probe = min(n_probe, len(centroids))
    cells = nearest_cells_udf(centroids, n_probe)
    t_tag = t_proj.select(
        "_rowid",
        id_col,
        vec_col,
        "_n_t",
        F.explode(cells(F.col(vec_col))).alias("_cell"),
    )
    e_tag = e_proj.select(
        "_e_rowid",
        "_e_id",
        "_e_vec",
        "_n_e",
        F.explode(cells(F.col("_e_vec"))).alias("_cell"),
    )
    # NO pair dedupe here: a (train row, eval row) pair sharing several
    # probed cells is deduped by the CALLER after scoring+thresholding,
    # when the row is ids+cos (~50 B) instead of two dim-width vectors
    # (~1.1 KB) — deduping here put the vector-bearing pairs through
    # the exchange and OOMed a 4 GiB worker at eval=20k (round-10 route
    # crossover) while the broadcast route survived.  The rowids ride
    # out so the caller's dedupe counts duplicate-id rows on either
    # side exactly as the broadcast crossJoin does.
    return t_tag.join(e_tag, "_cell").select(
        "_rowid", id_col, vec_col, "_n_t",
        "_e_rowid", "_e_id", "_e_vec", "_n_e",
    )
