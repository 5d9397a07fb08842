"""Round-8 additions: exact substring dedup (d21) and its resolution /
trimming twin (d22) — Lee et al. 2022 EXACTSUBSTR — plus
reciprocal-rank fusion (v13, Cormack et al. 2009).

The oracle entries pin end-to-end values at sf0.01; these tests pin the
operator-level semantics a value hash can't localize — the interval
merge, the min_count contract, short-doc exclusion, first-occurrence
survival — against brute-force Python references, plus the plan-shape
scale claims.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from chessmate_spark.operators.dedup import substring_dup_stats
from chessmate_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


# --- brute-force reference: O(n*k) exact span-union, gram strings ---


def _norm(text: str) -> list:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _reference(corpus: dict, k: int, min_count: int = 2) -> dict:
    grams: dict = {}
    for doc_id, text in corpus.items():
        toks = _norm(text)
        for i in range(max(len(toks) - k + 1, 0)):
            g = " ".join(toks[i : i + k])
            grams.setdefault(g, []).append((doc_id, i))
    dup = {g for g, occ in grams.items() if len(occ) >= min_count}
    out = {}
    for doc_id, text in corpus.items():
        toks = _norm(text)
        starts = [
            i
            for i in range(max(len(toks) - k + 1, 0))
            if " ".join(toks[i : i + k]) in dup
        ]
        if not starts:
            continue
        covered = set()
        for p in starts:
            covered.update(range(p, p + k))
        out[doc_id] = {
            "n_tokens": len(toks),
            "n_grams": max(len(toks) - k + 1, 0),
            "dup_grams": len(starts),
            "dup_tokens": len(covered),
        }
    return out


def _run(spark, corpus: dict, k: int, min_count: int = 2) -> dict:
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, text string"
    )
    rows = substring_dup_stats(
        df, "doc_id", "text", k=k, min_count=min_count
    ).collect()
    return {
        r["doc_id"]: {
            "n_tokens": r["n_tokens"],
            "n_grams": r["n_grams"],
            "dup_grams": r["dup_grams"],
            "dup_tokens": r["dup_tokens"],
        }
        for r in rows
    }


def _words(lo, hi):
    return " ".join(f"w{i}" for i in range(lo, hi))


def test_shared_span_at_different_offsets_merges_intervals(spark):
    # docs 1 and 2 share tokens w100..w111 (12 tokens) at different
    # offsets: with k=4 that is 9 duplicated window starts per doc whose
    # union is exactly the 12 shared tokens — the merge must not count
    # overlapping windows twice.
    shared = _words(100, 112)
    corpus = {
        1: _words(0, 10) + " " + shared + " " + _words(20, 30),
        2: shared + " " + _words(40, 60),
        3: _words(60, 99),  # no duplication anywhere
    }
    got = _run(spark, corpus, k=4)
    assert got == _reference(corpus, k=4)
    assert got[1]["dup_grams"] == 9
    assert got[1]["dup_tokens"] == 12
    assert 3 not in got


def test_disjoint_spans_sum_and_adjacent_spans_merge(spark):
    # doc 1 shares two DISJOINT 4-token spans with docs 2 and 3 -> union
    # is 8 tokens; doc 4 shares two ADJACENT spans with doc 5 -> one
    # 8-token run, still 8 (boundary windows between the two spans are
    # themselves shared, so the run is continuous in doc 4 and 5).
    a, b = _words(200, 204), _words(300, 304)
    corpus = {
        1: a + " " + _words(0, 7) + " " + b,
        2: _words(50, 61) + " " + a,
        3: b + " " + _words(70, 80),
        4: _words(400, 408),
        5: _words(400, 408) + " " + _words(500, 510),
    }
    got = _run(spark, corpus, k=4)
    assert got == _reference(corpus, k=4)
    assert got[1]["dup_tokens"] == 8
    assert got[4]["dup_tokens"] == 8


def test_within_doc_repetition_counts_toward_min_count(spark):
    # Lee et al. count ANY second occurrence, including within one doc:
    # a doc repeating its own 4-token phrase is flagged with no partner.
    phrase = _words(600, 604)
    corpus = {
        1: phrase + " " + _words(0, 10) + " " + phrase,
        2: _words(20, 40),
    }
    got = _run(spark, corpus, k=4)
    assert got == _reference(corpus, k=4)
    assert 1 in got and 2 not in got
    # min_count=3 un-flags it (two occurrences only)
    assert _run(spark, corpus, k=4, min_count=3) == {}


def test_short_docs_and_normalization(spark):
    # docs shorter than k have zero grams and can never be flagged; the
    # shared normalization (case/punctuation) applies before gramming.
    corpus = {
        1: "Alpha, Beta; GAMMA delta epsilon!",
        2: "alpha beta gamma delta zeta",
        3: "too short",  # 2 tokens < k
        4: "too short",  # exact dup of 3, still below k
    }
    got = _run(spark, corpus, k=4)
    assert got == _reference(corpus, k=4)
    assert got[1]["dup_grams"] == 1  # "alpha beta gamma delta"
    assert got[1]["dup_tokens"] == 4
    assert 3 not in got and 4 not in got


def test_randomized_corpus_matches_reference(spark):
    # deterministic pseudo-random corpus over a tiny vocabulary so
    # repeated k-grams arise by chance; exact parity with the reference.
    state = 12345
    vocab = [f"v{i}" for i in range(7)]
    corpus = {}
    for doc_id in range(30):
        toks = []
        for _ in range(25):
            state = (state * 1103515245 + 12345) % (2**31)
            toks.append(vocab[state % len(vocab)])
        corpus[doc_id] = " ".join(toks)
    assert _run(spark, corpus, k=5) == _reference(corpus, k=5)


def test_d21_plan_never_shuffles_gram_text(spark):
    """d21's scale claim: grams fold to xxhash64 inside the scan
    projection, so no Exchange carries the token array or any gram
    string — every wide exchange keys int64 hashes or doc ids.
    Inspected on the materialize=False lazy plan (the default path
    checkpoints eagerly, which would hide the exchanges)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = substring_dup_stats(
        docs, "doc_id", "text", k=8, materialize=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "_t" not in line and "concat_ws" not in line, line


def test_v13_fusion_arithmetic_and_ordering(spark):
    """Every output row's rrf_score must equal the recomputed
    1/(60+rank) sum from its own rank columns (exact float equality —
    same IEEE ops), ranks must be within the list depth, and the output
    must be sorted by (score desc, doc_id asc)."""
    rows = QUERIES["v13_rrf_fusion"][0](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["bm25_rank"] is not None or r["cos_rank"] is not None
        expect = 0.0
        if r["bm25_rank"] is not None:
            assert 1 <= r["bm25_rank"] <= 50
            expect += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] is not None:
            assert 1 <= r["cos_rank"] <= 50
            expect += 1.0 / (60 + r["cos_rank"])
        assert r["rrf_score"] == expect, r
    keys = [(-r["rrf_score"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # fusion is real: at least one doc carries BOTH ranks at sf0.001
    assert any(
        r["bm25_rank"] is not None and r["cos_rank"] is not None
        for r in rows
    )


def test_v13_candidate_lists_are_constant_size_cuts(spark):
    """v13's scale claim: the only global sorts feeding the rank windows
    are TakeOrderedAndProject cuts to the constant list depth — the
    corpus is never globally sorted as rows."""
    df = QUERIES["v13_rrf_fusion"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    # no full-corpus Sort outside the 50-row rank windows: every Sort
    # node must sit above a GlobalLimit/TakeOrdered boundary, which in
    # this plan means no Exchange rangepartitioning (a distributed
    # row sort) anywhere
    assert "rangepartitioning" not in plan, plan


# --- d22: substring dedup RESOLUTION (trimming) ---


def _reference_resolve(corpus: dict, k: int, min_count: int = 2) -> dict:
    import hashlib

    grams: dict = {}
    for doc_id in sorted(corpus):
        toks = _norm(corpus[doc_id])
        for i in range(max(len(toks) - k + 1, 0)):
            g = " ".join(toks[i : i + k])
            grams.setdefault(g, []).append((doc_id, i))
    drop: dict = {}
    for g, occ in grams.items():
        if len(occ) >= min_count:
            for doc_id, pos in sorted(occ)[1:]:  # corpus-first survives
                drop.setdefault(doc_id, set()).update(range(pos, pos + k))
    out = {}
    for doc_id in corpus:
        toks = _norm(corpus[doc_id])
        kept = [
            t
            for i, t in enumerate(toks)
            if i not in drop.get(doc_id, set())
        ]
        out[doc_id] = {
            "n_tokens": len(toks),
            "n_kept": len(kept),
            "n_dropped": len(toks) - len(kept),
            "clean_md5": hashlib.md5(
                " ".join(kept).encode()
            ).hexdigest(),
        }
    return out


def _run_resolve(spark, corpus: dict, k: int, min_count: int = 2) -> dict:
    from chessmate_spark.operators.dedup import substring_dedup_resolve

    df = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, text string"
    )
    rows = substring_dedup_resolve(
        df, "doc_id", "text", k=k, min_count=min_count
    ).collect()
    return {
        r["doc_id"]: {
            "n_tokens": r["n_tokens"],
            "n_kept": r["n_kept"],
            "n_dropped": r["n_dropped"],
            "clean_md5": r["clean_md5"],
        }
        for r in rows
    }


def test_resolve_first_occurrence_survives_exact_dup_collapses(spark):
    # doc 1 and doc 2 are exact copies (>= k tokens): the lower doc_id
    # holds every gram's first occurrence, so doc 1 keeps ALL tokens and
    # doc 2 drops ALL; doc 3 is untouched.
    body = _words(0, 12)
    corpus = {1: body, 2: body, 3: _words(100, 120)}
    got = _run_resolve(spark, corpus, k=4)
    assert got == _reference_resolve(corpus, k=4)
    assert got[1]["n_dropped"] == 0
    assert got[2]["n_kept"] == 0
    assert got[3]["n_dropped"] == 0
    import hashlib

    # survivor keeps the full normalized body; the collapsed copy is empty
    assert got[1]["clean_md5"] == hashlib.md5(body.encode()).hexdigest()
    assert got[2]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_resolve_partial_overlap_trims_only_repeat_side(spark):
    # doc 2 repeats doc 1's middle span: doc 1 (first occurrence) keeps
    # everything; doc 2 loses exactly the shared-window coverage.
    shared = _words(200, 210)
    corpus = {
        1: _words(0, 5) + " " + shared + " " + _words(20, 25),
        2: _words(50, 55) + " " + shared + " " + _words(60, 70),
    }
    got = _run_resolve(spark, corpus, k=4)
    ref = _reference_resolve(corpus, k=4)
    assert got == ref
    assert got[1]["n_dropped"] == 0
    assert got[2]["n_dropped"] == 10  # the shared 10-token span


def test_resolve_within_doc_repeat_keeps_first_copy(spark):
    phrase = _words(300, 304)
    corpus = {7: phrase + " " + _words(0, 10) + " " + phrase}
    got = _run_resolve(spark, corpus, k=4)
    ref = _reference_resolve(corpus, k=4)
    assert got == ref
    assert got[7]["n_dropped"] == 4  # only the second copy drops


def test_resolve_randomized_matches_reference(spark):
    state = 777
    vocab = [f"v{i}" for i in range(6)]
    corpus = {}
    for doc_id in range(25):
        toks = []
        for _ in range(20):
            state = (state * 1103515245 + 12345) % (2**31)
            toks.append(vocab[state % len(vocab)])
        corpus[doc_id] = " ".join(toks)
    assert _run_resolve(spark, corpus, k=5) == _reference_resolve(
        corpus, k=5
    )


def test_resolve_stats_consistency(spark):
    """Cross-twin invariant: a doc's resolve-dropped count can never
    exceed its stats-measured duplicated-span coverage (resolution
    spares first occurrences; stats counts them)."""
    state = 4242
    vocab = [f"w{i}" for i in range(8)]
    corpus = {}
    for doc_id in range(20):
        toks = []
        for _ in range(30):
            state = (state * 1103515245 + 12345) % (2**31)
            toks.append(vocab[state % len(vocab)])
        corpus[doc_id] = " ".join(toks)
    stats = _run(spark, corpus, k=5)
    resolve = _run_resolve(spark, corpus, k=5)
    for doc_id, r in resolve.items():
        cap = stats.get(doc_id, {}).get("dup_tokens", 0)
        assert r["n_dropped"] <= cap, (doc_id, r, stats.get(doc_id))


def test_null_text_is_empty_doc_in_both_operators(spark):
    """Review regression: NULL text must behave as the empty document
    (the d17/oracle coalesce convention) — n_tokens 0, nothing flagged,
    resolve row (0, 0, 0, md5('')) — not NULL n_tokens."""
    import hashlib

    df = spark.createDataFrame(
        [(1, None), (2, _words(0, 12)), (3, _words(0, 12))],
        "doc_id bigint, text string",
    )
    stats = substring_dup_stats(df, "doc_id", "text", k=4).collect()
    assert {r["doc_id"] for r in stats} == {2, 3}
    from chessmate_spark.operators.dedup import substring_dedup_resolve

    res = {
        r["doc_id"]: r
        for r in substring_dedup_resolve(df, "doc_id", "text", k=4).collect()
    }
    assert res[1]["n_tokens"] == 0
    assert res[1]["n_kept"] == 0
    assert res[1]["n_dropped"] == 0
    assert res[1]["clean_md5"] == hashlib.md5(b"").hexdigest()


# --- d23: semantic decontamination ---


def test_semantic_decontaminate_semantics_and_plan(spark):
    """Hand-built benchmark: train rows at known cosines to the eval
    vectors; the flag set, match counts, and best-match id must be
    exact, the cosine must be ROUNDED before thresholding (d6's
    FP-boundary convention — doc 5 sits at raw 0.4999996, which only
    flags because the rounded value is exactly 0.5), and the plan must
    broadcast the eval side (no SortMergeJoin — the corpus is scanned
    once, nothing corpus-sized shuffles)."""
    import math

    from chessmate_spark.operators.dedup import semantic_decontaminate

    c = 0.4999996  # rounds to 0.500000; raw is below the threshold
    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),      # cos 1.0 to eval 100, 0.0 to 101
            (2, [0.6, 0.8]),      # cos 0.6 to 100, 0.8 to 101
            (3, [0.0, -1.0]),     # cos 0.0 / -1.0 -> clean at 0.5
            (4, [0.0, 0.0]),      # zero vector -> cosine 0.0 -> clean
            # boundary case: cos to eval 100 is c (flags only via
            # rounding); the NEGATIVE second component keeps the cos
            # to eval 101 below zero so exactly one match fires
            (5, [c, -math.sqrt(1.0 - c * c)]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = semantic_decontaminate(train, ev, "vec_id", "embedding", 0.5)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 5}
    assert rows[5]["n_matches"] == 1
    assert rows[5]["max_cos"] == 0.5  # rounded-then-thresholded
    assert rows[1]["n_matches"] == 1
    assert rows[1]["max_cos"] == 1.0
    assert rows[1]["contaminated_by"] == 100
    assert rows[2]["n_matches"] == 2  # both evals within 0.5
    assert rows[2]["max_cos"] == 0.8
    assert rows[2]["contaminated_by"] == 100
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "Broadcast" in plan, plan


def test_semantic_decontaminate_cell_route_contracts(spark):
    """The past-broadcast route's two pinned contracts: at partial
    probe the flagged set (and every per-row match count) is a SUBSET
    of the exact broadcast route's; at n_probe == n_clusters it
    reproduces the broadcast output exactly (every vector lands in
    every cell)."""
    from chessmate_spark.operators.dedup import semantic_decontaminate

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 97 != 0)
    ev = emb.filter(F.col("vec_id") % 97 == 0)
    exact = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.35
        ).collect()
    }
    assert exact  # the fixture has contamination at this threshold
    full = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.35,
            route="cells", n_clusters=8, n_probe=8,
        ).collect()
    }
    assert {k: tuple(v) for k, v in full.items()} == {
        k: tuple(v) for k, v in exact.items()
    }
    partial = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.35,
            route="cells", n_clusters=8, n_probe=2,
        ).collect()
    }
    assert set(partial) <= set(exact)
    for k, r in partial.items():
        assert r["n_matches"] <= exact[k]["n_matches"]
        assert r["max_cos"] <= exact[k]["max_cos"]


def test_semantic_decontaminate_cell_route_duplicate_train_ids(spark):
    """Round-8 ADVICE: with DUPLICATE train ids (same id, different
    vectors) the cells route used to dedupe candidates on the id alone
    and collapse rows the broadcast route counts separately, breaking
    the n_probe == n_clusters == exact contract.  The row nonce fix
    must count each physical row's hits exactly as broadcast does."""
    from chessmate_spark.operators.dedup import semantic_decontaminate

    # id 1 twice with near-orthogonal vectors; both near some eval row
    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]),
            (3, [0.5, 0.5, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [
            (100, [1.0, 0.05, 0.0, 0.0]),
            (101, [0.05, 1.0, 0.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    exact = {
        r["vec_id"]: tuple(r)
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.6
        ).collect()
    }
    # both copies of id 1 hit (one eval row each): n_matches must be 2
    assert exact[1][1] == 2
    cells = {
        r["vec_id"]: tuple(r)
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.6,
            route="cells", n_clusters=2, n_probe=2,
        ).collect()
    }
    assert cells == exact


def test_semantic_decontaminate_cell_route_duplicate_eval_ids(spark):
    """Round-9 review: the train side got the row nonce (round-8
    ADVICE) but the eval side kept deduping on _e_id alone — two eval
    rows sharing an id (same id, different vectors) collapsed to one
    arbitrary candidate, undercounting n_matches and able to drop a
    flag the broadcast route raises.  Both sides now carry nonces; the
    n_probe == n_clusters == exact contract must hold under duplicate
    ids on EITHER side."""
    from chessmate_spark.operators.dedup import semantic_decontaminate

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    # eval id 100 appears TWICE with near-orthogonal vectors: train row
    # 1 matches only the first copy, train row 2 only the second — the
    # old id-keyed dedupe kept one arbitrary copy and could silently
    # unflag one of them
    ev = spark.createDataFrame(
        [
            (100, [1.0, 0.05, 0.0, 0.0]),
            (100, [0.05, 1.0, 0.0, 0.0]),
            (101, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    exact = {
        r["vec_id"]: tuple(r)
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.6
        ).collect()
    }
    # all three train rows flag; train rows 1 and 2 each hit one copy
    assert set(exact) == {1, 2, 3}
    assert exact[1][1] == 1 and exact[2][1] == 1
    cells = {
        r["vec_id"]: tuple(r)
        for r in semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.6,
            route="cells", n_clusters=2, n_probe=2,
        ).collect()
    }
    assert cells == exact


def test_semantic_decontaminate_auto_route_broadcast_side(spark):
    """route='auto' (opt-in since round 12 — the default is the exact
    broadcast route): a dimension-sized eval set (the d23 shape — ~1%
    of the corpus) stays on the exact broadcast route, and the result
    is row-identical to the explicit override."""
    from chessmate_spark.operators.dedup import semantic_decontaminate

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 97 != 0)
    ev = emb.filter(F.col("vec_id") % 97 == 0)
    auto = semantic_decontaminate(
        train, ev, "vec_id", "embedding", 0.35, route="auto"
    )
    assert auto._auto_route == "broadcast"
    explicit = semantic_decontaminate(
        train, ev, "vec_id", "embedding", 0.35, route="broadcast"
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_semantic_decontaminate_auto_route_cells_side(spark, monkeypatch):
    """The cells side of the crossover, reached by dialing the work
    floors down (the measured 20k-corpus point is not buildable in a
    unit test): on an obviously clustered corpus auto must take the
    cells route — re-using the centroids its shed probe trained — and
    match the explicit cells override row-for-row."""
    import numpy as np

    from chessmate_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_AUTO_MIN_PAIRS", 1_000)
    rng = np.random.default_rng(11)
    # 24 well-separated clusters: balanced 2-probe shares give an
    # estimated candidate fraction ~ n_probe^2/24 = 0.17, clearly under
    # the 0.5 shed gate (8 clusters would sit exactly AT the gate)
    centers = rng.normal(size=(24, 8)) * 10.0
    rows = []
    for i in range(480):
        c = centers[i % 24]
        rows.append((i, (c + rng.normal(size=8) * 0.05).tolist()))
    train = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    ev = spark.createDataFrame(
        rows[: 80], "vec_id bigint, embedding array<double>"
    ).select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    # n_clusters matches the true cluster count (the default sizing
    # gives 8 cells at this toy scale, where 2-probe candidates honestly
    # ARE ~half of all-pairs and auto correctly refuses)
    import pytest as _pytest

    # the approximate pick must be LOUD (round-12 ADVICE): auto-cells
    # at partial probe warns that the flagged set is a subset
    with _pytest.warns(UserWarning, match="partial probe"):
        auto = dd.semantic_decontaminate(
            train, ev, "vec_id", "embedding", 0.9,
            route="auto", n_clusters=24,
        )
    assert auto._auto_route == "cells"
    explicit = dd.semantic_decontaminate(
        train, ev, "vec_id", "embedding", 0.9, route="cells", n_clusters=24
    )
    got_auto = sorted(map(tuple, auto.collect()))
    got_cells = sorted(map(tuple, explicit.collect()))
    assert got_auto == got_cells
    assert got_auto  # the plants guarantee contamination exists


def test_semantic_decontaminate_auto_route_degenerate_corpus(spark, monkeypatch):
    """A corpus whose vectors all share one cell (identical vectors)
    concentrates the sampled assignment — the shed estimate reads ~n_probe
    and auto must refuse the clustering bet even past the work floors."""
    from chessmate_spark.operators import dedup as dd

    monkeypatch.setattr(dd, "_AUTO_MIN_PAIRS", 1_000)
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(300)]
    train = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    ev = spark.createDataFrame(
        rows[:60], "vec_id bigint, embedding array<double>"
    ).select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    auto = dd.semantic_decontaminate(
        train, ev, "vec_id", "embedding", 0.9, route="auto"
    )
    assert auto._auto_route == "broadcast"
