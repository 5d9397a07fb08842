"""Round-5b corpus-pipeline nets: boilerplate n-gram detection (t14),
grouped z-score outliers (a27), temperature mixing weights (t15), and
mean-pool dimensionality reduction (v9) — invariant checks beyond the
DuckDB oracle parity the driver records."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from chessmate_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _run(name, spark, sf_dir=SF_DIR):
    fn, _ = QUERIES[name]
    return fn(spark, sf_dir)


def test_boilerplate_ngrams_are_5grams_at_threshold(spark):
    rows = _run("t14_boilerplate_ngrams", spark).collect()
    assert rows, "sf0.001 corpus should still repeat some 5-grams"
    seen = set()
    for r in rows:
        assert len(r["ngram"].split(" ")) == 5
        assert r["doc_count"] >= 3
        assert r["ngram"] not in seen
        seen.add(r["ngram"])


def test_boilerplate_ngram_count_matches_manual_recount(spark):
    """Recount one reported gram by brute force over the raw corpus."""
    rows = _run("t14_boilerplate_ngrams", spark).collect()
    gram = rows[0]["ngram"]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    n = 0
    for d in docs:
        toks = d["text"].lower().split(" ")
        grams = {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        }
        if gram in grams:
            n += 1
    assert n == rows[0]["doc_count"]


def test_zscore_outliers_exceed_threshold_and_match_group_moments(spark):
    out = _run("a27_zscore_outliers", spark)
    rows = out.collect()
    assert rows
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids))
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stats = {
        r["event_type"]: (r["m"], r["sd"])
        for r in ev.groupBy("event_type")
        .agg(
            F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
        )
        .collect()
    }
    for r in rows:
        assert abs(r["zscore"]) > 3.0
        m, sd = stats[r["event_type"]]
        expect = (r["value"] - m) / sd
        assert math.isclose(r["zscore"], expect, abs_tol=5e-6)


def test_mixing_weights_normalize_and_follow_mass(spark):
    rows = _run("t15_mixing_weights", spark).collect()
    assert rows
    total = sum(r["weight"] for r in rows)
    assert abs(total - 1.0) < len(rows) * 1e-6
    by_mass = sorted(rows, key=lambda r: r["char_mass"])
    weights = [r["weight"] for r in by_mass]
    assert weights == sorted(weights), "weight must be monotone in mass"
    # alpha < 1 compresses the ratio: weight ratio < mass ratio.
    lo, hi = by_mass[0], by_mass[-1]
    if lo["char_mass"] < hi["char_mass"] and lo["weight"] > 0:
        assert (
            hi["weight"] / lo["weight"]
            < hi["char_mass"] / lo["char_mass"] + 1e-9
        )


def test_embedding_pool_matches_numpy_block_means(spark):
    out = _run("v9_embedding_pool", spark)
    rows = out.filter(F.col("vec_id") < 3).collect()
    assert len(rows) == 3 * 16
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 3)
        .collect()
    }
    for r in rows:
        block = emb[r["vec_id"]][r["dim"] * 4 : r["dim"] * 4 + 4]
        assert math.isclose(
            r["pooled"], float(block.mean()), abs_tol=5e-7
        )


def test_embedding_pool_plan_is_shuffle_free(spark):
    """The pooling transform itself must not exchange: only the
    presentation sort may appear."""
    fn, _ = QUERIES["v9_embedding_pool"]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange")
    # _spread's repartition + the final orderBy range exchange are the
    # only legal exchanges; the pooling math adds none.
    assert n_exchanges <= 2, plan


def test_incremental_dedup_agrees_with_full_pair_set(spark):
    """d12 must be derivable from d2's full-corpus pairs: a batch (odd)
    doc is reported iff the full pair set contains a qualifying match
    (even partner, or smaller odd partner), and the reported match is
    the best one."""
    from chessmate_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_candidates(
            docs, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
        ).collect()
    }
    expected = {}
    for (a, b), j in full.items():
        for x, m in ((a, b), (b, a)):
            if x % 2 == 1 and (m % 2 == 0 or m < x):
                cur = expected.get(x)
                if cur is None or (j, -m) > (cur[1], -cur[0]):
                    expected[x] = (m, j)
    got = {
        r["doc_id"]: (r["matched_id"], r["origin"], r["jaccard"])
        for r in _run("d12_incremental_dedup", spark).collect()
    }
    assert set(got) == set(expected)
    for x, (m, origin, j) in got.items():
        em, ej = expected[x]
        assert m == em
        assert math.isclose(j, ej, abs_tol=2e-6)
        assert origin == ("existing" if m % 2 == 0 else "batch")


def test_zscore_stream_twin_equals_batch_across_restart(spark, tmp_path):
    """Replaying the fixture through the stream-static twin (two drains,
    restart between) reproduces a27's batch answer row-for-row when the
    stream scores against the batch-computed stats dim."""
    from chessmate_spark.streaming.structured import (
        event_type_stats,
        run_zscore_stream,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    stats = event_type_stats(ev)
    ev_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.mode("append").parquet(ev_dir)
    run_zscore_stream(spark, ev_dir, stats, out_dir, ckpt).awaitTermination()
    n_first = spark.read.parquet(out_dir).count()
    second.write.mode("append").parquet(ev_dir)
    run_zscore_stream(spark, ev_dir, stats, out_dir, ckpt).awaitTermination()

    got = {
        r["event_id"]: r["zscore"]
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        r["event_id"]: r["zscore"]
        for r in _run("a27_zscore_outliers", spark).collect()
    }
    assert n_first < len(got), "second drain must add rows, not reprocess"
    assert set(got) == set(batch)
    for eid, z in batch.items():
        assert math.isclose(got[eid], z, abs_tol=5e-6)


def test_cdc_merge_clause_semantics_on_tiny_frame(spark):
    from chessmate_spark.operators.merge import cdc_merge

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (2, "update", "b2", 99.0),   # matched update
            (3, "delete", None, None),   # matched delete
            (5, "insert", "e", 50.0),    # unmatched insert
            (1, "insert", "dup", -1.0),  # insert of existing key: no-op
            (9, "update", "x", 0.0),     # update of missing key: ignored
            (8, "delete", None, None),   # delete of missing key: ignored
        ],
        "k int, op string, name string, bal double",
    )
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in cdc_merge(target, changes, "k").collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 99.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_waveform_resample_preserves_endpoints_and_matches_numpy(spark):
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < 3)
        .collect()
    }
    rows = (
        _run("m6_waveform_resample", spark)
        .filter(F.col("vec_id") < 3)
        .collect()
    )
    assert len(rows) == 3 * 48
    for vid, a in emb.items():
        expect = np.interp(
            np.arange(48) * 63.0 / 47.0, np.arange(64), a
        )
        got = sorted(
            (r["sample_idx"], r["value"]) for r in rows if r["vec_id"] == vid
        )
        assert math.isclose(got[0][1], a[0], abs_tol=5e-7)
        assert math.isclose(got[-1][1], a[63], abs_tol=5e-7)
        for (i, v), e in zip(got, expect):
            assert math.isclose(v, e, abs_tol=5e-6), (vid, i)


def test_bigram_logprob_matches_python_recomputation(spark):
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        if r["text"]
    }
    uni, c2 = {}, {}
    for toks in docs.values():
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    V = len(uni)
    rows = _run("t16_bigram_logprob", spark).collect()
    assert len(rows) == sum(1 for t in docs.values() if len(t) >= 2)
    for r in rows[:50]:
        toks = docs[r["doc_id"]]
        scores = [
            -math.log((c2[(a, b)] + 1.0) / (uni[a] + V))
            for a, b in zip(toks, toks[1:])
        ]
        assert r["n_bigrams"] == len(scores)
        assert math.isclose(
            r["avg_neg_logprob"], sum(scores) / len(scores), abs_tol=5e-6
        )


def test_source_cap_exact_k_and_deterministic(spark):
    rows1 = _run("t17_source_cap", spark).collect()
    rows2 = _run("t17_source_cap", spark).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
    from collections import Counter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got = Counter(r["source"] for r in rows1)
    for src, n in per_source.items():
        assert got[src] == min(10, n)


def test_incremental_dedup_state_backed_equals_self_contained(spark, tmp_path):
    """The production form (round 11): a PERSISTED
    minhash_signature_state store must yield byte-identical increments
    to the self-contained recompute, including after a parquet
    round-trip (what an actual pipeline reads back), and a
    two-increment run against the appended store must equal the
    recompute-from-scratch of the same split."""
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signature_state,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    def rows_of(df):
        return sorted(map(tuple, df.collect()))

    self_contained = rows_of(
        incremental_minhash_dedup(
            existing, batch, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
        )
    )
    store_path = str(tmp_path / "sig_store")
    minhash_signature_state(
        existing, "doc_id", "text", shingle_n=3, num_hashes=16
    ).write.parquet(store_path)
    state_backed = rows_of(
        incremental_minhash_dedup(
            None, batch, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
            existing_state=spark.read.parquet(store_path),
        )
    )
    assert state_backed == self_contained

    # two increments: corpus thirds — store grows by appending each
    # batch's own state, and increment 2 against the appended store
    # equals the from-scratch run over (third0 ∪ third1) vs third2
    t0 = docs.filter(F.col("doc_id") % 3 == 0)
    t1 = docs.filter(F.col("doc_id") % 3 == 1)
    t2 = docs.filter(F.col("doc_id") % 3 == 2)
    minhash_signature_state(
        t0, "doc_id", "text", shingle_n=3, num_hashes=16
    ).write.mode("overwrite").parquet(store_path)
    # increment 1 runs (not asserted — its output is the t0-vs-t1 case
    # already covered above); afterwards t1's state joins the store
    minhash_signature_state(
        t1, "doc_id", "text", shingle_n=3, num_hashes=16
    ).write.mode("append").parquet(store_path)
    inc2 = rows_of(
        incremental_minhash_dedup(
            None, t2, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
            existing_state=spark.read.parquet(store_path),
        )
    )
    scratch = rows_of(
        incremental_minhash_dedup(
            t0.unionByName(t1), t2, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
        )
    )
    assert inc2 == scratch
    assert inc2  # the fixture has cross-third duplicates


def test_incremental_dedup_state_contract_errors(spark):
    import pytest
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import incremental_minhash_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(10)
    with pytest.raises(AssertionError, match="exactly one"):
        incremental_minhash_dedup(None, docs, "doc_id", "text")
    with pytest.raises(AssertionError, match="exactly one"):
        incremental_minhash_dedup(
            docs, docs, "doc_id", "text", existing_state=docs
        )
    with pytest.raises(AssertionError, match="_sig"):
        incremental_minhash_dedup(
            None, docs, "doc_id", "text",
            existing_state=docs.select(F.col("doc_id").alias("_id")),
        )


def test_incremental_dedup_state_dial_validation(spark):
    """Round-12 ADVICE: a store built with a DIFFERENT dial must fail
    loudly instead of silently banding mismatched signature slices —
    the dial is persisted in the state (``_shingle_n``/``_num_hashes``)
    and validated by a one-row probe; a pre-round-12 store (no dial
    columns) still gets the signature-width check."""
    import pytest
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signature_state,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    existing = docs.filter(F.col("doc_id") % 2 == 0)

    # width mismatch: store at 32 hashes, increment at 16
    wide = minhash_signature_state(
        existing, "doc_id", "text", shingle_n=3, num_hashes=32
    )
    with pytest.raises(AssertionError, match="32 hashes wide"):
        incremental_minhash_dedup(
            None, batch, "doc_id", "text",
            num_hashes=16, bands=4, existing_state=wide,
        )

    # same width, different shingle grammar: only the persisted dial
    # catches this (signatures are 16 long either way)
    grammar = minhash_signature_state(
        existing, "doc_id", "text", shingle_n=5, num_hashes=16
    )
    with pytest.raises(AssertionError, match="shingle grammars"):
        incremental_minhash_dedup(
            None, batch, "doc_id", "text",
            shingle_n=3, num_hashes=16, bands=4, existing_state=grammar,
        )

    # legacy store (no dial columns): width check still runs — and a
    # width-matched legacy store passes
    legacy = minhash_signature_state(
        existing, "doc_id", "text", shingle_n=3, num_hashes=16
    ).select("_id", "_shingles", "_sig")
    out = incremental_minhash_dedup(
        None, batch, "doc_id", "text",
        shingle_n=3, num_hashes=16, bands=4, existing_state=legacy,
    )
    assert out.columns == ["doc_id", "matched_id", "origin", "jaccard"]
    legacy_wide = minhash_signature_state(
        existing, "doc_id", "text", shingle_n=3, num_hashes=32
    ).select("_id", "_shingles", "_sig")
    with pytest.raises(AssertionError, match="32 hashes wide"):
        incremental_minhash_dedup(
            None, batch, "doc_id", "text",
            num_hashes=16, bands=4, existing_state=legacy_wide,
        )

    # an EMPTY store trivially passes (nothing to disagree with)
    empty = wide.filter(F.lit(False))
    incremental_minhash_dedup(
        None, batch, "doc_id", "text",
        shingle_n=3, num_hashes=16, bands=4, existing_state=empty,
    )


def test_incremental_verify_exchange_candidate_bounded(spark):
    """Round 12 closed the round-11 scale seam (semi-join prune before
    the verify explode); round 14 collapsed the verify to array joins:
    the candidate pairs BROADCAST into both shingle-array joins, so
    the state scans stream map-side and no exchange carries corpus
    rows.  Asserted on the pre-checkpoint physical plan for BOTH prune
    mechanisms: the default broadcast form carries the verify through
    BroadcastHashJoins (zero Python stages, no explode-side shuffle of
    the corpus); the bloom form (the past-broadcast posture) shows the
    Arrow-batched probe filter.  Both produce output identical to the
    public entry's (which the d12 oracle pins independently)."""
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import (
        _incremental_minhash_frames,
        incremental_minhash_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    results = {}
    for mode in ("broadcast", "bloom"):
        shingled, banded, cand, best = _incremental_minhash_frames(
            existing, batch, "doc_id", "text", 3, 16, 4, 0.1, None,
            prune=mode,
        )
        try:
            plan = best._jdf.queryExecution().executedPlan().toString()
            if mode == "broadcast":
                # the candidate pairs are the broadcast build side of
                # the verify joins; the array verify has no explode and
                # no (id, shingle) compound-key shuffle
                assert "BroadcastHashJoin" in plan, plan
                assert "array_intersect" in plan, plan
                assert "Generate explode(_shingles" not in plan, plan
                # the default path stays JVM-only
                assert "ArrowEvalPython" not in plan, plan
                assert "BatchEvalPython" not in plan, plan
            else:
                # the bloom probe is the ONLY python eval here — its
                # presence proves the verify corpus is filtered before
                # the explode/join stages
                assert (
                    "ArrowEvalPython" in plan or "BatchEvalPython" in plan
                ), plan
            results[mode] = sorted(map(tuple, best.collect()))
        finally:
            shingled.unpersist()
            banded.unpersist()
            cand.unpersist()
    assert results["broadcast"] == results["bloom"]
    public = sorted(
        map(
            tuple,
            incremental_minhash_dedup(
                existing, batch, "doc_id", "text",
                shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
            ).collect(),
        )
    )
    assert results["broadcast"] == public
    assert public  # the fixture has cross-half duplicates

    import pytest

    with pytest.raises(ValueError, match="prune"):
        incremental_minhash_dedup(
            existing, batch, "doc_id", "text", prune="nope"
        )


def test_incremental_band_exchange_batch_bounded(spark, tmp_path):
    """Round 13 (the round-12 verdict's #1): the band-bucket join must
    BROADCAST the batch's band table so NO exchange carries
    existing-side band rows — the plan shows a BroadcastHashJoin on
    ``_band`` and no ``hashpartitioning(_band)`` exchange, with
    auto-broadcast DISABLED so the operator's own hint (not the
    planner's size estimate) is what carries it.  The state-backed
    form must also persist nothing corpus-sized (the round-12 shape
    cached O(existing) exploded band rows per increment).  The
    ``band_join="shuffle"`` escape hatch re-plans the symmetric
    bucket shuffle (the exchange reappears) with identical output."""
    import pytest
    from pyspark.sql import functions as F

    from chessmate_spark.operators.dedup import (
        _incremental_minhash_frames,
        incremental_minhash_dedup,
        minhash_signature_state,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store_path = str(tmp_path / "band_store")
    minhash_signature_state(
        existing, "doc_id", "text", shingle_n=3, num_hashes=16
    ).write.parquet(store_path)
    state = spark.read.parquet(store_path)

    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results = {}
        for mode in ("broadcast", "shuffle"):
            ex_side, b_side, cand, best = _incremental_minhash_frames(
                None, batch, "doc_id", "text", 3, 16, 4, 0.1, state,
                band_join=mode,
            )
            try:
                plan = best._jdf.queryExecution().executedPlan().toString()
                if mode == "broadcast":
                    assert "hashpartitioning(_band" not in plan, plan
                    assert "BroadcastHashJoin [_band" in plan, plan
                    # nothing corpus-sized is persisted in the
                    # state-backed form: the store side streams off the
                    # column-pruned parquet scan
                    assert ex_side.storageLevel.useMemory is False
                    assert ex_side.storageLevel.useDisk is False
                else:
                    assert "hashpartitioning(_band" in plan, plan
                results[mode] = sorted(map(tuple, best.collect()))
            finally:
                ex_side.unpersist()
                b_side.unpersist()
                cand.unpersist()
        assert results["broadcast"] == results["shuffle"]
        assert results["broadcast"]  # the fixture has cross-half dupes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    with pytest.raises(ValueError, match="band_join"):
        incremental_minhash_dedup(
            existing, batch, "doc_id", "text", band_join="nope"
        )


def test_incremental_shuffle_rows_flat_under_corpus_growth(spark, tmp_path):
    """The metric the wall clock cannot see (round 13): total shuffle
    records written by one increment must stay FLAT as the existing
    corpus grows, provided the candidate set stays flat — the replicas
    added here are text-salted so they cannot match the batch.  This
    is the executable form of 'no exchange carries existing-side band
    rows': before round 13 the band bucket join shuffled O(existing x
    bands) rows and this ratio read ~Nx."""
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.partitioned import shuffle_records_written
    from chessmate_spark.operators.dedup import (
        _incremental_minhash_frames,
        minhash_signature_state,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 2 == 1).limit(40).select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    )
    stats = {}
    for label, frac in (("x1", 1), ("x8", 8)):
        base = docs.filter(F.col("doc_id") % 2 == 0)
        if frac == 1:
            ex = base
        else:
            # replica 0 keeps the real text (the batch's match set);
            # replicas 1..7 are salted garbage that bands elsewhere
            ex = base.crossJoin(
                spark.range(frac).toDF("_r")
            ).select(
                (F.col("doc_id") * 10 + F.col("_r")).alias("doc_id"),
                F.when(F.col("_r") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.sha2(F.concat_ws("-", "doc_id", "_r"), 256),
                        F.col("text").substr(1, 5),
                    )
                ).alias("text"),
            )
        store_path = str(tmp_path / f"growth_{label}")
        minhash_signature_state(
            ex, "doc_id", "text", shingle_n=3, num_hashes=16
        ).write.parquet(store_path)
        state = spark.read.parquet(store_path)
        ex_side, b_side, cand, best = _incremental_minhash_frames(
            None, batch, "doc_id", "text", 3, 16, 4, 0.1, state
        )
        try:
            stats[label] = {
                "rows": shuffle_records_written(best),
                "cand": cand.count(),
                "existing": state.count(),
            }
        finally:
            ex_side.unpersist()
            b_side.unpersist()
            cand.unpersist()
    assert stats["x8"]["existing"] == 8 * stats["x1"]["existing"]
    # candidate sets must match for the comparison to mean anything
    assert stats["x8"]["cand"] == stats["x1"]["cand"]
    # flat within noise: an O(existing) exchange would read ~8x here
    assert stats["x8"]["rows"] <= 1.5 * stats["x1"]["rows"], stats


def test_dedup_increment_replay_after_later_batches(spark, tmp_path):
    """Round-12 review finding: a replay that arrives AFTER later
    batches committed (restart from an older checkpoint) must read the
    store at the version the ORIGINAL increment read — commit-log time
    travel via the batch's own txn manifest — not the head, or the
    recompute flags batch-1 docs against batch-2 state and 'replayed
    batch recomputes identically' silently breaks."""
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.dedup_lifecycle import (
        dedup_increment,
        open_signature_store,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    thirds = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    store = open_signature_store(spark, str(tmp_path / "store"))

    incs = [
        dedup_increment(
            store, thirds[k], "doc_id", "text", batch_id=k,
            num_hashes=16, bands=4, min_jaccard=0.1,
        )
        for k in range(3)
    ]
    assert [i.appended_version for i in incs] == [1, 2, 3]

    # replay batch 1 with batches 2 (and 0) already in the store: no
    # append, and the duplicates frame equals the ORIGINAL increment-1
    # output (which never saw third-2's state)
    replay = dedup_increment(
        store, thirds[1], "doc_id", "text", batch_id=1,
        num_hashes=16, bands=4, min_jaccard=0.1,
    )
    assert replay.appended_version is None
    assert store.latest_version() == 3
    assert sorted(map(tuple, replay.duplicates.collect())) == sorted(
        map(tuple, incs[1].duplicates.collect())
    )

    # an unknown batch_id below the high-water mark with no matching
    # txn manifest fails loudly instead of reading some snapshot
    import pytest

    store2 = open_signature_store(spark, str(tmp_path / "store2"))
    dedup_increment(
        store2, thirds[0], "doc_id", "text", batch_id=5,
        num_hashes=16, bands=4, min_jaccard=0.1,
    )
    with pytest.raises(LookupError, match="txn"):
        dedup_increment(
            store2, thirds[1], "doc_id", "text", batch_id=2,
            num_hashes=16, bands=4, min_jaccard=0.1,
        )


def test_bootstrap_store_equals_increment_seeding(spark, tmp_path):
    """Round 13: ``bootstrap_store`` (the backfill path — seed a store
    from an already-curated corpus WITHOUT a dedup pass) must leave the
    store in exactly the state a batch-0 ``dedup_increment`` would
    (same rows, same txn marker), be exactly-once under replay, and
    feed later increments identically."""
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.dedup_lifecycle import (
        bootstrap_store,
        dedup_increment,
        open_signature_store,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    boot = open_signature_store(spark, str(tmp_path / "boot"))
    assert bootstrap_store(boot, seed, "doc_id", "text") == 1
    # replay of the bootstrap: skipped, not double-appended
    assert bootstrap_store(boot, seed, "doc_id", "text") is None
    assert boot.latest_version() == 1

    inc_store = open_signature_store(spark, str(tmp_path / "inc"))
    dedup_increment(
        inc_store, seed, "doc_id", "text", batch_id=0,
        num_hashes=16, bands=4, min_jaccard=0.1,
    )
    # same store contents either way (dedup_increment appends the full
    # batch state, duplicates included — the store contract)
    def rows_of(store):
        return sorted(
            (r["_id"], tuple(r["_sig"])) for r in store.read().collect()
        )

    assert rows_of(boot) == rows_of(inc_store)

    # and a later increment against the bootstrapped store equals the
    # increment against the dedup_increment-seeded one
    out_boot = sorted(map(tuple, dedup_increment(
        boot, batch, "doc_id", "text", batch_id=1,
        num_hashes=16, bands=4, min_jaccard=0.1,
    ).duplicates.collect()))
    out_inc = sorted(map(tuple, dedup_increment(
        inc_store, batch, "doc_id", "text", batch_id=1,
        num_hashes=16, bands=4, min_jaccard=0.1,
    ).duplicates.collect()))
    assert out_boot == out_inc
    assert out_boot  # the fixture has cross-half duplicates


def test_dedup_increment_replay_pins_recorded_snapshot(spark, tmp_path):
    """Round-13 ADVICE: append_idempotent REBASES on conflict, so a
    concurrent commit landing between an increment's
    ``latest_version()`` read and its claim makes the commit's PARENT
    differ from the snapshot the increment actually deduped against.
    The increment now records the read version in its txn marker and
    replays pin to THAT — a parent-pinned replay would recompute
    against the interloper's rows and silently break 'replayed batch
    recomputes identically'.  The interloper here is adversarial:
    byte-identical texts under SMALLER ids, so a wrong-snapshot replay
    would flip every best-match id."""
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.dedup_lifecycle import (
        SIGNATURE_STORE_APP,
        dedup_increment,
        open_signature_store,
    )
    from chessmate_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signature_state,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    batch0 = docs.filter(F.col("doc_id") % 2 == 0)
    batch1 = docs.filter(F.col("doc_id") % 2 == 1)
    store = open_signature_store(spark, str(tmp_path / "store"))
    assert dedup_increment(
        store, batch0, "doc_id", "text", batch_id=0,
        num_hashes=16, bands=4, min_jaccard=0.1,
    ).appended_version == 1

    # the ORIGINAL increment 1, interleaved by hand: read v1, dedup,
    # then a CONCURRENT writer (different app) commits v2 before the
    # append claims — the append rebases and lands as v3 with parent 2
    snap_read = store.latest_version()
    assert snap_read == 1
    # hand-rolled states match the store's round-15 layout (precomputed
    # _bands + _bucket clustering column), as any correct concurrent
    # writer's would — the commit log refuses mismatched append schemas
    from chessmate_spark.operators.dedup import sig_store_buckets

    b1_state = minhash_signature_state(
        batch1, "doc_id", "text", shingle_n=3, num_hashes=16,
        bands=4, bucket_count=sig_store_buckets(),
    )
    original = sorted(map(tuple, incremental_minhash_dedup(
        None, batch1, "doc_id", "text",
        shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
        existing_state=store.read(snap_read),
    ).collect()))
    interloper = minhash_signature_state(
        batch1.select(
            (F.col("doc_id") - F.lit(10_000_000)).alias("doc_id"), "text"
        ),
        "doc_id", "text", shingle_n=3, num_hashes=16,
        bands=4, bucket_count=sig_store_buckets(),
    )
    assert store.append(interloper) == 2  # the concurrent commit
    assert store.append_idempotent(
        b1_state, SIGNATURE_STORE_APP, 1, snapshot=snap_read
    ) == 3
    assert store.manifest(3)["txn"]["snapshot"] == 1
    assert store.manifest(3)["parent"] == 2  # rebase happened

    # replay of batch 1: must recompute against v1 (recorded), not the
    # parent v2 — the interloper's duplicate texts under smaller ids
    # would otherwise win every best-match tiebreak
    replay = dedup_increment(
        store, batch1, "doc_id", "text", batch_id=1,
        num_hashes=16, bands=4, min_jaccard=0.1,
    )
    assert replay.appended_version is None
    assert sorted(map(tuple, replay.duplicates.collect())) == original
    assert original  # the fixture has cross-half duplicates
    # and no replayed match points at the interloper's id range
    assert all(r[1] > -10_000_000 + 1_000_000 for r in original)


def test_minhash_dial_diagnostics_fallback_disclosure():
    """Round-12 ADVICE: minhash_route's non-prunable branch returns the
    planner's REFUSAL, not the fallback's recall — the honest figure
    for the dial actually run comes from minhash_dial_diagnostics."""
    from chessmate_spark.operators.dedup import (
        minhash_dial_diagnostics,
        minhash_route,
    )

    h, b, refusal = minhash_route(5_000, 0.1)
    assert (h, b) == (16, 4) and not refusal.prunes
    # the refusal documents the planner's best banding (near-all-pairs
    # background), NOT the (16, 4) dial's S-curve
    assert refusal.background_fraction > 0.9
    fb = minhash_dial_diagnostics(h, b, 0.1)
    assert (fb.num_hashes, fb.bands, fb.rows) == (16, 4, 4)
    # detection 1-(1-0.1^4)^4 ~ 4e-4: only strong near-dups surface
    assert 1e-4 < fb.detection_at_threshold < 1e-3
    # and at a prunable threshold the two agree by construction
    h2, b2, plan2 = minhash_route(500, 0.5)
    agree = minhash_dial_diagnostics(h2, b2, 0.5)
    assert abs(
        agree.detection_at_threshold - plan2.detection_at_threshold
    ) < 1e-12


def test_dedup_increment_manifest_dial_guard(spark, tmp_path):
    """Round 14: the lifecycle records the store's (shingle_n,
    num_hashes) dial in every commit's manifest metadata, so a later
    increment validates the dial with a driver-side manifest read — a
    MISMATCHED dial fails loudly before any Spark job runs, and the
    recorded metadata is what future increments skip the one-row probe
    on."""
    import pytest
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.dedup_lifecycle import (
        _manifest_dial,
        dedup_increment,
        open_signature_store,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    store = open_signature_store(spark, str(tmp_path / "store"))
    inc = dedup_increment(
        store, docs.filter(F.col("doc_id") < 30), "doc_id", "text",
        batch_id=1, shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
    )
    assert inc.appended_version == 1
    # the dial landed in the manifest metadata (round 15 adds the
    # layout dials: the recorded banding and the _bucket modulus)
    dial = _manifest_dial(store, 1)
    assert dial["shingle_n"] == 3 and dial["num_hashes"] == 16
    assert dial["bands"] == 4 and dial["bucket_count"] >= 1
    # a mismatched dial is refused from the MANIFEST (loudly, before
    # any banding)
    with pytest.raises(AssertionError, match="dial"):
        dedup_increment(
            store, docs.filter(F.col("doc_id") >= 30), "doc_id", "text",
            batch_id=2, shingle_n=4, num_hashes=16, bands=4,
            min_jaccard=0.1,
        )
    # the matched dial proceeds and appends
    inc2 = dedup_increment(
        store, docs.filter(F.col("doc_id") >= 30), "doc_id", "text",
        batch_id=2, shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
    )
    assert inc2.appended_version == 2


def test_store_layout_routes_identical_and_pruned(spark, tmp_path):
    """Round 15 (VERDICT r14 #1): the signature store's per-lifetime
    layout — precomputed ``_bands`` keys and the ``_bucket`` clustering
    column — must change PLANS only, never results.  Three increments
    through a round-15 store are compared row-for-row against the same
    increments run with the layout disabled (expression banding from
    ``_sig``, unpruned verify scan); the verify plan must carry the
    ``_bucket`` IN-filter down to the store scan."""
    from pyspark.sql import functions as F

    from chessmate_spark.ingest.dedup_lifecycle import (
        dedup_increment,
        open_signature_store,
    )
    from chessmate_spark.operators.dedup import (
        _incremental_minhash_frames,
        sig_store_buckets,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 240)
    )

    def run(root, **kw):
        store = open_signature_store(spark, str(tmp_path / root))
        outs = []
        for k in range(3):
            inc = dedup_increment(
                store, docs.filter(F.col("doc_id") % 3 == k),
                "doc_id", "text", batch_id=k,
                shingle_n=3, num_hashes=16, bands=4, min_jaccard=0.1,
                **kw,
            )
            outs.extend(
                sorted(map(tuple, inc.duplicates.collect()))
            )
        return store, outs

    # force the prune gate OPEN at fixture scale (it is row-count-gated
    # in production — pruning pays only past ~256k stored rows)
    import chessmate_spark.ingest.dedup_lifecycle as dl

    orig_gate = dl._VERIFY_PRUNE_MIN_ROWS
    dl._VERIFY_PRUNE_MIN_ROWS = 0
    try:
        store_a, with_layout = run("layout")
    finally:
        dl._VERIFY_PRUNE_MIN_ROWS = orig_gate
    # the disabled route: same store machinery, but the increment is
    # forced onto the legacy read path (expression bands, no pruning)
    orig = dl._store_layout

    def no_layout(store, version, bands):
        sb, bc, mb = orig(store, version, bands)
        return sb, bc, None  # meta_bands None => stored bands untrusted

    dl._store_layout = no_layout
    try:
        # monkey-route: bucket pruning off via store_bucket_count=None
        import chessmate_spark.operators.dedup as dd

        orig_frames = dd._incremental_minhash_frames

        def frames_no_prune(*a, **kw):
            kw["stored_bands"] = False
            kw["store_bucket_count"] = None
            return orig_frames(*a, **kw)

        dd._incremental_minhash_frames = frames_no_prune
        dl.incremental_minhash_dedup.__globals__[
            "_incremental_minhash_frames"
        ] = frames_no_prune
        _, without_layout = run("legacy")
    finally:
        dl._store_layout = orig
        dd._incremental_minhash_frames = orig_frames
        dl.incremental_minhash_dedup.__globals__[
            "_incremental_minhash_frames"
        ] = orig_frames

    assert with_layout == without_layout and len(with_layout) > 0

    # plan evidence: the verify pass's store scan carries the _bucket
    # IN-filter as a pushed data filter (the clustered layout's stats
    # make it a row-group skip at scale)
    batch3 = docs.filter(F.col("doc_id") % 3 == 0).limit(20)
    ex_state = store_a.read()
    from chessmate_spark.operators.dedup import (
        minhash_signature_state,
    )

    b_state = minhash_signature_state(
        batch3, "doc_id", "text", 3, 16,
        bands=4, bucket_count=sig_store_buckets(),
    )
    _, _, _, best = _incremental_minhash_frames(
        None, batch3, "doc_id", "text", 3, 16, 4, 0.1,
        ex_state, b_state,
        stored_bands=True, store_bucket_count=sig_store_buckets(),
    )
    plan = best._sc._jvm.PythonSQLUtils.explainString(
        best._jdf.queryExecution(), "formatted"
    )
    assert "_bucket" in plan and "PushedFilters" in plan
    assert "_bands" in plan  # stored band keys, not re-hashed slices
