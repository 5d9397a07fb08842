"""Similarity operator tests: exact kNN vs LSH recall, collapse semantics."""

import pytest
from pyspark.sql import functions as F

from chessmate_spark.operators.collapse import collapse_hits_by_game
from chessmate_spark.operators.similarity import (
    brute_force_topk,
    cosine_knn_join,
    lsh_bucketed_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_brute_force_topk_deterministic(spark, emb):
    q = [0.1] * 64
    a = brute_force_topk(emb, q, 10, ["vec_id"]).collect()
    b = brute_force_topk(emb, q, 10, ["vec_id"]).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    scores = [r["score"] for r in a]
    assert scores == sorted(scores, reverse=True)


def test_lsh_recall_against_exact(spark, emb):
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").filter(
        F.col("query_id") < 10
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 10
    )
    exact = cosine_knn_join(queries, corpus, 3, "query_id", "neighbor_id")
    approx = lsh_bucketed_topk(
        queries, corpus, 3, 64, "query_id", "neighbor_id",
        n_planes=4, n_tables=8,
    )
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # deterministic (seeded planes): pin a floor well under the observed value
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_collapse_hits(spark):
    hits = spark.createDataFrame(
        [
            (1, 0.9, ["Opening"], ["Tactics"], ["kw1"]),
            (1, 0.7, ["endgame"], [], ["KW1", "kw2"]),
            (2, 0.5, [], [], []),
        ],
        "game_id long, score double, phases array<string>,"
        " themes array<string>, keywords array<string>",
    )
    rows = {r["game_id"]: r for r in collapse_hits_by_game(hits).collect()}
    assert rows[1]["score"] == 0.9
    assert rows[1]["phases"] == ["endgame", "opening"]
    assert rows[1]["themes"] == ["tactics"]
    assert rows[1]["keywords"] == ["kw1", "kw2"]
    assert rows[2]["score"] == 0.5


def test_embedding_neardup_lsh_recall(spark, emb):
    from chessmate_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    thr = 0.35
    exact = embedding_neardup_pairs(emb, "vec_id", "embedding", thr)
    approx = embedding_neardup_lsh(emb, "vec_id", "embedding", thr, dim=64)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    approx_pairs = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    assert approx_pairs <= exact_pairs  # verify step admits no false positives
    recall = len(exact_pairs & approx_pairs) / max(1, len(exact_pairs))
    assert recall >= 0.5, f"near-dup LSH recall too low: {recall}"


def test_embedding_neardup_exact_gate_raises_at_scale(spark, emb):
    import pytest

    from chessmate_spark.operators.dedup import embedding_neardup_pairs

    with pytest.raises(ValueError, match="embedding_neardup_lsh"):
        embedding_neardup_pairs(
            emb, "vec_id", "embedding", 0.35, max_side_rows=3
        )


def test_ivf_recall_against_exact(spark, emb):
    from chessmate_spark.operators.similarity import ivf_topk

    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").filter(
        F.col("query_id") < 10
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 10
    )
    exact = cosine_knn_join(queries, corpus, 3, "query_id", "neighbor_id")
    approx = ivf_topk(
        queries, corpus, 3, "query_id", "neighbor_id", nlist=8, nprobe=4
    )
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_full_probe_is_exact(spark, emb):
    from chessmate_spark.operators.similarity import ivf_topk

    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").filter(
        F.col("query_id") < 5
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding").filter(
        F.col("neighbor_id") >= 5
    )
    exact = cosine_knn_join(queries, corpus, 3, "query_id", "neighbor_id")
    full = ivf_topk(
        queries, corpus, 3, "query_id", "neighbor_id", nlist=4, nprobe=4
    )
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    full_pairs = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert full_pairs == exact_pairs


def test_ivf_index_persistence_roundtrip(spark, tmp_path):
    """Train once, persist, reload: probes with the loaded index return
    the same results and skip retraining."""
    import numpy as np

    from chessmate_spark.operators.similarity import (
        ivf_topk,
        load_centroids,
        save_centroids,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    corpus = spark.createDataFrame(
        [(i, rng.rand(8).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + j, rng.rand(8).tolist()) for j in range(3)],
        "qid long, embedding array<double>",
    )
    trained = train_ivf_centroids(corpus, "vec_id", nlist=8, seed=7)
    path = str(tmp_path / "ivf_index.parquet")
    save_centroids(trained, path)
    loaded = load_centroids(path)
    assert np.allclose(trained, loaded)

    def run(cents):
        return sorted(
            (r["qid"], r["vec_id"], round(r["score"], 9))
            for r in ivf_topk(
                queries, corpus, 5, "qid", "vec_id",
                nprobe=3, centroids=cents,
            ).collect()
        )

    assert run(trained) == run(loaded)


def test_semantic_neardup_subset_and_deterministic(spark, emb):
    from chessmate_spark.operators.dedup import (
        embedding_neardup_pairs,
        semantic_neardup_pairs,
    )

    thr = 0.35
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            emb, "vec_id", "embedding", thr
        ).collect()
    }
    sem = semantic_neardup_pairs(
        emb, "vec_id", "embedding", thr, n_clusters=8, n_probe=4
    )
    got = {(r["id_a"], r["id_b"]) for r in sem.collect()}
    # verify step admits no false positives; cell bucketing bounds recall
    assert got <= exact
    recall = len(got & exact) / max(1, len(exact))
    assert recall >= 0.8, f"semantic near-dup recall too low: {recall}"
    # deterministic training (sorted sample) => identical reruns
    again = {
        (r["id_a"], r["id_b"])
        for r in semantic_neardup_pairs(
            emb, "vec_id", "embedding", thr, n_clusters=8, n_probe=4
        ).collect()
    }
    assert got == again


def test_semantic_neardup_no_self_pairs_on_duplicate_ids(spark):
    from chessmate_spark.operators.dedup import semantic_neardup_pairs

    # same id appears twice with identical vectors (upstream failed to
    # dedup): must not emit an (id, id) self-pair
    rows = [(1, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = semantic_neardup_pairs(
        df, "vec_id", "embedding", 0.9, n_clusters=2, n_probe=2
    ).collect()
    assert all(r["id_a"] != r["id_b"] for r in got)
    assert {(r["id_a"], r["id_b"]) for r in got} == {(1, 2)}


# --- product quantization (v10) ---


def test_pq_encode_shape_and_determinism(spark, emb):
    from chessmate_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, "vec_id", "embedding", m=8, ksub=16)
    assert books.shape == (8, 16, 8)  # dim 64 / m 8
    books2 = train_pq_codebooks(emb, "vec_id", "embedding", m=8, ksub=16)
    assert (books == books2).all()  # deterministic sample + Lloyd
    codes = pq_encode(emb, "vec_id", "embedding", books).collect()
    assert len(codes) == emb.count()
    for r in codes[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    again = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(emb, "vec_id", "embedding", books).collect()
    }
    assert all(again[r["vec_id"]] == r["codes"] for r in codes)


def test_pq_recall_against_exact(spark, emb):
    """The v10 operating point must clear the entry's per-query floor
    at test scale (worst case for PQ: near-uniform vectors)."""
    from chessmate_spark.operators.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_knn_join(
            queries, corpus, k=3, query_id="query_id",
            corpus_id="neighbor_id",
        ).select("query_id", "neighbor_id").collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            queries, corpus, k=3, query_id="query_id",
            corpus_id="neighbor_id", m=8, ksub=16, overfetch=32,
        ).select("query_id", "neighbor_id").collect()
    }
    per_q = {q: 0 for q in range(5)}
    for q, _ in got & exact:
        per_q[q] += 1
    assert all(h / 3 >= 0.6 for h in per_q.values()), per_q


def test_pq_full_overfetch_is_exact(spark, emb):
    """overfetch covering the whole corpus makes the exact re-rank see
    every row — PQ must then equal exact kNN (the nprobe=nlist analog)."""
    from chessmate_spark.operators.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    n = corpus.count()
    exact = cosine_knn_join(
        queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
    ).select("query_id", "neighbor_id").collect()
    full = pq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", m=8, ksub=16, overfetch=(n // 3) + 1,
    ).select("query_id", "neighbor_id").collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))


def test_pq_persist_corpus_pin_and_release(spark, emb):
    # persist_corpus pins ONE (id, vector) materialization for both the
    # ADC encode scan and the re-rank join (ADVICE r7: corpus is
    # otherwise evaluated twice with no determinism contract)
    from chessmate_spark.operators.similarity import (
        pq_topk,
        release_persisted_corpus,
    )

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    plain = pq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", m=8, ksub=16, overfetch=8,
    ).collect()
    pinned_res = pq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", m=8, ksub=16, overfetch=8,
        persist_corpus=True,
    )
    assert sorted(map(tuple, pinned_res.collect())) == sorted(
        map(tuple, plain)
    )
    pinned = pinned_res._pq_pinned_corpus
    assert pinned.storageLevel.useMemory
    assert release_persisted_corpus(pinned_res) is True
    assert not pinned.storageLevel.useMemory
    assert release_persisted_corpus(pinned_res) is False


def test_ivfpq_recall_against_exact(spark, emb):
    """v11's operating point must clear the per-query floor at test
    scale (near-uniform vectors: worst case for BOTH cuts at once)."""
    from chessmate_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_knn_join(
            queries, corpus, k=3, query_id="query_id",
            corpus_id="neighbor_id",
        ).select("query_id", "neighbor_id").collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_topk(
            queries, corpus, k=3, query_id="query_id",
            corpus_id="neighbor_id", nlist=8, nprobe=7, m=8, ksub=16,
            overfetch=32,
        ).select("query_id", "neighbor_id").collect()
    }
    per_q = {q: 0 for q in range(5)}
    for q, _ in got & exact:
        per_q[q] += 1
    assert all(h / 3 >= 0.6 for h in per_q.values()), per_q


def test_ivfpq_full_probe_full_overfetch_is_exact(spark, emb):
    """nprobe=nlist + corpus-wide overfetch makes the exact re-rank see
    every row — IVFADC must then equal exact kNN (both dials open)."""
    from chessmate_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    n = corpus.count()
    exact = cosine_knn_join(
        queries, corpus, k=3, query_id="query_id", corpus_id="neighbor_id"
    ).select("query_id", "neighbor_id").collect()
    full = ivfpq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", nlist=8, nprobe=8, m=8, ksub=16,
        overfetch=(n // 3) + 1,
    ).select("query_id", "neighbor_id").collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))


def test_ivfpq_deterministic_across_runs(spark, emb):
    """Training sample, Lloyd loops, stable cell argsort, ADC ordering:
    two independent builds must emit identical rows (the recall gate
    cannot flap)."""
    from chessmate_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        nlist=8, nprobe=4, m=8, ksub=16, overfetch=8,
    )
    a = sorted(map(tuple, ivfpq_topk(queries, corpus, **kw).collect()))
    b = sorted(map(tuple, ivfpq_topk(queries, corpus, **kw).collect()))
    assert a == b


def test_pq_packed_codes_match_array_codes(spark, emb):
    """packed=True changes the payload (binary m bytes vs array<int>),
    never the answer: identical codes, identical top-k."""
    from chessmate_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(emb, "vec_id", "embedding", m=8, ksub=16)
    arr = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, "vec_id", "embedding", books).collect()
    }
    pak = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(
            emb, "vec_id", "embedding", books, packed=True
        ).collect()
    }
    assert arr == pak  # byte-for-byte the same code sequence
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        m=8, ksub=16, overfetch=8,
    )
    packed = sorted(map(tuple, pq_topk(queries, corpus, **kw).collect()))
    unpacked = sorted(
        map(tuple, pq_topk(queries, corpus, packed=False, **kw).collect())
    )
    assert packed == unpacked


def test_ivfpq_persist_corpus_pin_and_release(spark, emb):
    from chessmate_spark.operators.similarity import (
        ivfpq_topk,
        release_persisted_corpus,
    )

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        nlist=8, nprobe=4, m=8, ksub=16, overfetch=8,
    )
    plain = sorted(map(tuple, ivfpq_topk(queries, corpus, **kw).collect()))
    res = ivfpq_topk(queries, corpus, persist_corpus=True, **kw)
    assert sorted(map(tuple, res.collect())) == plain
    pinned = res._pq_pinned_corpus
    assert pinned.storageLevel.useMemory
    assert release_persisted_corpus(res) is True
    assert not pinned.storageLevel.useMemory
    assert release_persisted_corpus(res) is False


def test_pq_topk_large_ksub_falls_back_to_array_codes(spark, emb):
    """packed defaults to auto: ksub > 256 keeps the array<int> form
    instead of raising for a caller who never asked for packing."""
    from chessmate_spark.operators.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 2).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    out = pq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", m=8, ksub=300, overfetch=4,
    ).collect()
    assert len(out) > 0


def test_ivfpq_index_persist_roundtrip_identical(spark, emb, tmp_path):
    """build_ivfpq_index -> load_ivfpq_index -> ivfpq_topk(codes=...)
    must equal the inline run bit-for-bit: float64 round-trips parquet
    exactly and every stage is deterministic, so serve-from-disk is
    output-invisible (the v12 contract)."""
    from chessmate_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        nprobe=4, overfetch=8,
    )
    inline = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, corpus, nlist=8, m=8, ksub=16, **kw
            ).collect(),
        )
    )
    idx = str(tmp_path / "index")
    build_ivfpq_index(corpus, "neighbor_id", idx, nlist=8, m=8, ksub=16)
    centroids, codebooks, codes = load_ivfpq_index(spark, idx)
    served = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, corpus,
                centroids=centroids, codebooks=codebooks, codes=codes,
                **kw,
            ).collect(),
        )
    )
    assert served == inline


def test_pq_codebooks_save_load_exact(tmp_path):
    """Codebook persistence is exact: (m, ksub, dsub) float64 in == out."""
    import numpy as np

    from chessmate_spark.operators.similarity import (
        load_pq_codebooks,
        save_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    books = rng.randn(4, 16, 8)
    p = str(tmp_path / "books.parquet")
    save_pq_codebooks(books, p)
    loaded = load_pq_codebooks(p)
    assert loaded.shape == books.shape
    assert np.array_equal(loaded, books)


def test_ivfpq_codes_requires_its_codebooks(spark, emb):
    """codes= without the centroids/codebooks that encoded it is a
    contract violation, not a silent retrain (which would score codes
    against MISMATCHED LUTs)."""
    import pytest as _pytest

    from chessmate_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 2).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    fake_codes = corpus.select(
        "neighbor_id",
        F.lit(0).alias("cell"),
        F.lit(b"\x00").alias("codes"),
    )
    with _pytest.raises(ValueError, match="codes="):
        ivfpq_topk(
            queries, corpus, k=3, query_id="query_id",
            corpus_id="neighbor_id", codes=fake_codes,
        )


def test_ivfpq_persist_corpus_honored_with_codes(spark, emb, tmp_path):
    """An EXPLICIT persist_corpus=True is honored even when serving
    from persisted codes: with codes= the corpus appears once per plan,
    but the pin is what keeps repeated ACTIONS consistent for a
    nondeterministic corpus — silently dropping it would lose that.
    Default (no flag): nothing pinned, release returns False."""
    from chessmate_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
        release_persisted_corpus,
    )

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 2).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    build_ivfpq_index(corpus, "neighbor_id", idx, nlist=8, m=8, ksub=16)
    c, b, codes = load_ivfpq_index(spark, idx)
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        centroids=c, codebooks=b, codes=codes,
    )
    out = ivfpq_topk(queries, corpus, persist_corpus=True, **kw)
    pin = out._pq_pinned_corpus
    out.collect()
    assert pin.storageLevel.useMemory
    assert release_persisted_corpus(out) is True
    assert not pin.storageLevel.useMemory
    plain = ivfpq_topk(queries, corpus, **kw)
    plain.collect()
    assert release_persisted_corpus(plain) is False


def test_ivfpq_append_identical_to_inline_frozen_model(spark, emb, tmp_path):
    """v14's contract: build on the old slice, APPEND the new slice,
    serve — row-identical to ivfpq_topk over the grown corpus with the
    SAME frozen centroids/codebooks (append changes WHAT is indexed,
    never HOW), and the appended codes equal the inline encode of the
    new rows."""
    from chessmate_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    old = corpus.filter(F.col("neighbor_id") < 40)
    new = corpus.filter(F.col("neighbor_id") >= 40)
    idx = str(tmp_path / "index")
    build_ivfpq_index(old, "neighbor_id", idx, nlist=8, m=8, ksub=16)
    n_old = spark.read.parquet(f"{idx}/codes").count()
    append_to_ivfpq_index(new, "neighbor_id", idx)
    centroids, codebooks, codes = load_ivfpq_index(spark, idx)
    # delta landed, nothing lost, ids disjoint-union
    assert codes.count() == corpus.count()
    assert n_old == old.count()
    assert codes.select("neighbor_id").distinct().count() == corpus.count()
    kw = dict(
        k=3, query_id="query_id", corpus_id="neighbor_id",
        nprobe=4, overfetch=8,
    )
    served = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, corpus,
                centroids=centroids, codebooks=codebooks, codes=codes,
                **kw,
            ).collect(),
        )
    )
    inline = sorted(
        map(
            tuple,
            ivfpq_topk(
                queries, corpus,
                centroids=centroids, codebooks=codebooks,
                **kw,
            ).collect(),
        )
    )
    assert served == inline
    # the appended rows are genuinely searchable: a query that IS one of
    # the new vectors must find itself (cosine 1.0 beats everything)
    self_q = new.limit(1).select(
        F.col("neighbor_id").alias("query_id"), "embedding"
    )
    self_id = self_q.first()["query_id"]
    hit = ivfpq_topk(
        self_q, corpus,
        centroids=centroids, codebooks=codebooks, codes=codes,
        k=1, query_id="query_id", corpus_id="neighbor_id",
        nprobe=8, overfetch=32,
    ).first()
    assert hit["neighbor_id"] == self_id


def test_ivfpq_cell_drift_trigger(spark, tmp_path):
    """Round 12 (verdict #4): the cell-occupancy PSI retrain trigger —
    a stationary append keeps PSI in the stable band; an append drawn
    from a SHIFTED distribution (mass the frozen centroids never saw)
    crosses IVFPQ_RETRAIN_PSI; an index without the build-time baseline
    histogram fails loudly."""
    import numpy as np
    import pytest

    from chessmate_spark.operators.similarity import (
        IVFPQ_RETRAIN_PSI,
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivfpq_cell_drift,
    )

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(8, 16)) * 6.0

    def mixture(n, id0, seed, shift=0.0):
        r = np.random.default_rng(seed)
        labels = r.integers(0, len(centers), size=n)
        x = centers[labels] + r.normal(size=(n, 16)) * 1.5 + shift
        return spark.createDataFrame(
            [(int(id0 + i), [float(v) for v in x[i]]) for i in range(n)],
            "vec_id bigint, embedding array<float>",
        )

    base = mixture(600, 0, 1)
    idx = str(tmp_path / "index")
    build_ivfpq_index(base, "vec_id", idx, nlist=8, m=8, ksub=16)
    psi0, verdict0 = ivfpq_cell_drift(spark, idx)
    assert psi0 == 0.0 and verdict0 == "stable"  # codes == baseline

    # stationary append: same mixture, fresh draws — stays below trigger
    append_to_ivfpq_index(mixture(300, 10_000, 2), "vec_id", idx)
    psi_s, verdict_s = ivfpq_cell_drift(spark, idx)
    assert psi_s < IVFPQ_RETRAIN_PSI, (psi_s, verdict_s)

    # drifted append: displaced mass crowds cells the build barely used
    append_to_ivfpq_index(
        mixture(300, 20_000, 3, shift=25.0), "vec_id", idx
    )
    psi_d, verdict_d = ivfpq_cell_drift(spark, idx)
    assert psi_d >= IVFPQ_RETRAIN_PSI, (psi_d, verdict_d)
    assert psi_d > psi_s

    # pre-round-12 index (no baseline artifact) fails loudly
    import shutil

    shutil.rmtree(f"{idx}/cell_histogram.parquet")
    with pytest.raises(FileNotFoundError, match="cell_histogram"):
        ivfpq_cell_drift(spark, idx)


def test_maintain_ivfpq_index_rebuilds_on_drift(spark, tmp_path):
    """Round 12: the automated maintainer turn — stationary deltas
    APPEND (frozen model, baseline untouched); a drifted delta crosses
    the trigger and REBUILDS in place, after which the drift baseline
    reads 0 and the codes table covers the full corpus."""
    import numpy as np

    from chessmate_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_cell_drift,
        load_ivfpq_index,
        maintain_ivfpq_index,
    )

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(8, 16)) * 6.0

    def mixture(n, id0, seed, shift=0.0):
        r = np.random.default_rng(seed)
        labels = r.integers(0, len(centers), size=n)
        x = centers[labels] + r.normal(size=(n, 16)) * 1.5 + shift
        return spark.createDataFrame(
            [(int(id0 + i), [float(v) for v in x[i]]) for i in range(n)],
            "vec_id bigint, embedding array<float>",
        )

    base = mixture(600, 0, 1)
    idx = str(tmp_path / "index")
    build_ivfpq_index(base, "vec_id", idx, nlist=8, m=8, ksub=16)

    stationary = mixture(300, 10_000, 2)
    corpus1 = base.unionByName(stationary)
    turn1 = maintain_ivfpq_index(stationary, "vec_id", idx, corpus1)
    assert turn1["action"] == "appended", turn1

    # a 600-row drifted delta (~40% of the grown corpus): comfortably
    # past the trigger — a 300-row one measured psi 0.098, right AT the
    # 0.1 boundary, which is the trigger working as sized, not a test
    # subject
    drifted = mixture(600, 20_000, 3, shift=25.0)
    corpus2 = corpus1.unionByName(drifted)
    turn2 = maintain_ivfpq_index(drifted, "vec_id", idx, corpus2)
    assert turn2["action"] == "rebuilt", turn2
    assert turn2["psi"] > turn1["psi"]

    # the rebuild retrained on the drifted distribution and reset the
    # baseline: drift reads zero, codes cover the whole corpus, and the
    # index GEOMETRY is preserved (nlist/m/ksub from the artifacts, not
    # caller defaults)
    psi_after, verdict_after = ivfpq_cell_drift(spark, idx)
    assert psi_after == 0.0 and verdict_after == "stable"
    centroids, codebooks, codes = load_ivfpq_index(spark, idx)
    assert codes.count() == corpus2.count()
    assert len(centroids) == 8
    assert codebooks.shape[:2] == (8, 16)


def test_ivfpq_append_rejects_mismatched_id_column(spark, emb, tmp_path):
    """Review regression: appending under a different id-column name
    would land a second schema in codes/ and silently corrupt the index
    at read time — it must fail fast instead."""
    import pytest

    from chessmate_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )

    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    build_ivfpq_index(
        corpus.filter(F.col("neighbor_id") < 40),
        "neighbor_id", idx, nlist=8, m=8, ksub=16,
    )
    renamed = corpus.filter(F.col("neighbor_id") >= 40).select(
        F.col("neighbor_id").alias("other_id"), "embedding"
    )
    with pytest.raises(ValueError, match="neighbor_id"):
        append_to_ivfpq_index(renamed, "other_id", idx)


def test_ivfpq_append_rejects_mismatched_id_type(spark, emb, tmp_path):
    """Review regression: same id NAME but a different TYPE (a
    string-typed delta) must also fail fast — a name-only guard would
    land a second physical schema in codes/."""
    import pytest

    from chessmate_spark.operators.similarity import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )

    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    build_ivfpq_index(
        corpus.filter(F.col("neighbor_id") < 40),
        "neighbor_id", idx, nlist=8, m=8, ksub=16,
    )
    stringy = corpus.filter(F.col("neighbor_id") >= 40).select(
        F.col("neighbor_id").cast("string").alias("neighbor_id"),
        "embedding",
    )
    with pytest.raises(ValueError, match="cast the delta"):
        append_to_ivfpq_index(stringy, "neighbor_id", idx)


def test_portable_signatures_match_independent_python_mirror(spark, emb):
    """The d25 portability contract: band values from the Arrow-batched
    numpy path must equal an independent pure-Python recomputation from
    the md5 definition (the same arithmetic the DuckDB oracle runs) —
    int64-exact, no summation-order hazard to tolerate."""
    import hashlib

    from chessmate_spark.functions.hashing import portable_hyperplanes
    from chessmate_spark.functions.vector_pandas import (
        portable_signatures_udf,
    )

    T, P, D, QUANT = 3, 5, 64, 1_000_000
    planes = portable_hyperplanes(T, P, D)
    sigs = portable_signatures_udf(planes, T, P, QUANT)
    sample = emb.filter(F.col("vec_id") < 8).select(
        "vec_id", sigs(F.col("embedding")).alias("sig")
    )
    got = {r["vec_id"]: r["sig"] for r in sample.collect()}
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8).collect()
    }
    mod = 2_000_001
    for vid, v in vecs.items():
        q = [int(__import__("math").floor(float(x) * QUANT + 0.5)) for x in v]
        expect = []
        for t in range(T):
            val = 0
            for p in range(P):
                dot = 0
                for i in range(D):
                    h = int(
                        hashlib.md5(f"hp:{t}:{p}:{i}".encode()).hexdigest()[:15],
                        16,
                    )
                    dot += q[i] * (h % mod - 1_000_000)
                if dot >= 0:
                    val |= 1 << p
            expect.append(val)
        assert got[vid] == expect, f"vec {vid}: {got[vid]} != {expect}"


def test_portable_hyperplane_neardup_pruning_regime(spark, emb):
    """The planner's pruning arm end-to-end: planted twins at cos ~0.92
    are all recovered at threshold 0.8 with the planned (9, 51) banding,
    no false positives (exact verify), and the candidate stage actually
    PRUNES (candidate pairs well below all-pairs)."""
    from chessmate_spark.operators.dedup import (
        lsh_plan_for,
        portable_hyperplane_neardup,
        portable_lsh_candidate_pairs,
    )

    plan = lsh_plan_for(550, 0.8, target_recall=0.999)
    assert plan.prunes and (plan.n_planes, plan.n_tables) == (9, 51)

    base = emb.select(
        F.col("vec_id").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    twins = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("id"),
        F.transform(
            "embedding", lambda x, i: x.cast("double") + (i % 3 - 1) * 0.05
        ).alias("v"),
    )
    aug = base.unionByName(twins)
    out = portable_hyperplane_neardup(
        aug, "id", "v", 0.8, dim=64,
        n_planes=plan.n_planes, n_tables=plan.n_tables,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    planted = {(i, i + 1000000) for i in range(20)}
    assert planted <= pairs, f"missing planted pairs: {planted - pairs}"
    # exact verify: every returned pair really clears the threshold
    for r in out.collect():
        assert r["score"] >= 0.8
    n = aug.count()
    cand = portable_lsh_candidate_pairs(
        aug, "id", "v", dim=64, n_planes=plan.n_planes,
        n_tables=plan.n_tables,
    ).count()
    assert cand < 0.2 * n * (n - 1) / 2, (
        f"candidate stage did not prune: {cand} of {n*(n-1)//2} pairs"
    )


def test_lsh_verify_routes_bit_identical(spark, monkeypatch):
    """Round-14: the broadcast-matrix exact-cosine verify (pairs cross
    the Python boundary as two ids) must be BIT-identical to the
    two-join pandas_cosine attach it replaces — same float64 gathers,
    same (A*B).sum(1) reduction, same portable rounding."""
    import random

    from chessmate_spark.operators import dedup as dd

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    rows.append((300, [0.0] * 16))  # zero-norm guard parity
    rows.append((301, rows[5][1]))  # an exact duplicate pair
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(8)

    fast = sorted(
        map(
            tuple,
            dd.embedding_neardup_lsh(
                df, "id", "v", 0.2, dim=16, n_planes=3, n_tables=8
            ).collect(),
        )
    )
    monkeypatch.setattr(dd, "_VERIFY_MATRIX_MAX_ELEMS", 0)
    slow = sorted(
        map(
            tuple,
            dd.embedding_neardup_lsh(
                df, "id", "v", 0.2, dim=16, n_planes=3, n_tables=8
            ).collect(),
        )
    )
    assert fast == slow and len(fast) > 0


def test_verify_gate_skips_probe_with_caller_count(spark, monkeypatch):
    """Round-14 ADVICE: when the caller passes a measured n_rows ABOVE
    the matrix gate, the probe collect (up to 128 MiB of vectors) must
    be skipped entirely and the two-join path taken — identical rows,
    zero driver collect."""
    import random

    from chessmate_spark.operators import dedup as dd

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(4)

    via_matrix = sorted(
        map(
            tuple,
            dd.embedding_neardup_lsh(
                df, "id", "v", 0.2, dim=16, n_planes=3, n_tables=8,
                n_rows=120,
            ).collect(),
        )
    )
    # n_rows past the gate: the probe collect must not run at all
    calls = {"n": 0}
    orig = dd.DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(dd.DataFrame, "collect", counting_collect)
    routed = dd.embedding_neardup_lsh(
        df, "id", "v", 0.2, dim=16, n_planes=3, n_tables=8,
        n_rows=dd._VERIFY_MATRIX_MAX_ELEMS,  # far past the gate
    )
    assert calls["n"] == 0, "probe collect ran despite a past-gate n_rows"
    monkeypatch.setattr(dd.DataFrame, "collect", orig)
    via_joins = sorted(map(tuple, routed.collect()))
    assert via_matrix == via_joins and len(via_matrix) > 0
