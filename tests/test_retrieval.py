"""batch_bm25_retrieval (operators/retrieval.py): the t25 core
generalized to an external (query_id, term) frame, with the bloom route
for term tables past broadcast size (round-7 verdict #5).

The t25 entry itself stays oracle-checked (it passes its
vocabulary-derived frame WITH df); these tests pin the generalized
surface: external frames, df attachment, and the broadcast == bloom
identity contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from chessmate_spark.operators.retrieval import batch_bm25_retrieval

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _external_queries(spark):
    # hand-built queries: common corpus words, one rare word, one term
    # absent from the corpus entirely, and a duplicated (query, term)
    # row that must contribute once
    rows = [
        (0, "the"), (0, "of"), (0, "the"),
        (1, "data"), (1, "model"),
        (2, "nosuchterm_xyzzy"), (2, "the"),
    ]
    return spark.createDataFrame(rows, "query_id int, term string")


def test_external_frame_broadcast_route(spark):
    docs = _docs(spark)
    out = batch_bm25_retrieval(docs, _external_queries(spark), k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    # query 2's only corpus term is 'the' — it still ranks documents
    assert by_q.get(2), out
    # ranks are 1..k, scores non-increasing within a query
    for q, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_micro"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_duplicate_query_terms_contribute_once(spark):
    docs = _docs(spark)
    dup = _external_queries(spark)
    deduped = spark.createDataFrame(
        [(0, "the"), (0, "of")], "query_id int, term string"
    )
    a = batch_bm25_retrieval(docs, dup, k=5)
    b = batch_bm25_retrieval(docs, deduped, k=5)
    rows_a = sorted(
        map(tuple, a.filter(F.col("query_id") == 0).collect())
    )
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_bloom_route_identical_to_broadcast(spark):
    """The identity contract: routing through the bloom split changes
    the plan, never the rows (the bloom_prune_join guarantee, plus the
    suspect-side df computation being exact for every query term)."""
    docs = _docs(spark)
    q = _external_queries(spark)
    bc = batch_bm25_retrieval(docs, q, k=5, route="broadcast")
    bl = batch_bm25_retrieval(docs, q, k=5, route="bloom")
    assert sorted(map(tuple, bc.collect())) == sorted(
        map(tuple, bl.collect())
    )
    # tiny bitmap (64 bits) forces false positives into the suspect
    # branch; the exact join must still discard them
    bl_tiny = batch_bm25_retrieval(
        docs, q, k=5, route="bloom", m_bits=64, n_hashes=2
    )
    assert sorted(map(tuple, bc.collect())) == sorted(
        map(tuple, bl_tiny.collect())
    )


def test_bloom_route_plan_does_not_broadcast_query_terms(spark):
    """The fallback's reason to exist: past broadcast size the
    retrieval join must NOT ship the term table to every executor.
    With auto-broadcast disabled (the statistics regime of a table
    that genuinely outgrew the threshold), the bloom route's static
    plan sort-merges the PRUNED postings against the term table —
    while the broadcast route still explicitly broadcasts the query
    side (the F.broadcast hint survives the disabled threshold) and
    never sort-merges its retrieval join."""
    docs = _docs(spark)
    q = _external_queries(spark)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bc_plan = (
            batch_bm25_retrieval(docs, q, k=5, route="broadcast")
            ._jdf.queryExecution().executedPlan().toString()
        )
        bl_plan = (
            batch_bm25_retrieval(docs, q, k=5, route="bloom")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    # broadcast route: the hinted retrieval join stays a broadcast join
    assert "BroadcastHashJoin [term" in bc_plan or (
        "BroadcastHashJoin" in bc_plan and "_q_term" in bc_plan
    ), bc_plan
    # bloom route: the term table is never built into a broadcast
    # relation; the suspect-sized exact join shuffles both sides
    assert "SortMergeJoin" in bl_plan, bl_plan
    assert "BroadcastHashJoin [term" not in bl_plan, bl_plan


def test_prefiltered_df_matches_attached_df(spark):
    """A frame WITHOUT df must score identically to the same frame with
    the corpus df pre-attached (the t25 entry's form)."""
    docs = _docs(spark)
    q = spark.createDataFrame(
        [(0, "the"), (1, "of"), (1, "data")], "query_id int, term string"
    )
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    from chessmate_spark.functions.text import tokenize_expr

    df_tbl = (
        docs.select(
            F.explode(F.array_distinct(tokenize_expr(text))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    q_with = q.join(df_tbl, "term").select("query_id", "term", "df")
    a = batch_bm25_retrieval(docs, q, k=5)
    b = batch_bm25_retrieval(docs, q_with, k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bad_route_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        batch_bm25_retrieval(
            _docs(spark), _external_queries(spark), route="shuffle"
        )


def test_persist_queries_pins_the_persisted_frame(spark):
    """persist_queries must attach the frame that was actually
    persisted: when the query frame lacks df, both routes rebind
    qterms to a derived join, and pinning THAT makes release a no-op
    while the cached projection leaks for the session."""
    from chessmate_spark.operators.bloom import release_pinned

    docs = _docs(spark)
    for route in ("broadcast", "bloom"):
        out = batch_bm25_retrieval(
            docs, _external_queries(spark), k=3, route=route,
            persist_queries=True,
        )
        pinned = out._retrieval_pinned_queries
        assert pinned is not None
        out.collect()
        assert pinned.storageLevel.useMemory, (
            route, pinned.storageLevel
        )
        assert release_pinned(out, "_retrieval_pinned_queries")
        assert not pinned.storageLevel.useMemory
        assert not release_pinned(out, "_retrieval_pinned_queries")


def test_auto_route_picks_broadcast_below_term_floor(spark):
    """route='auto' (the default) on a small query frame must pick the
    broadcast route and be row-identical to the explicit override."""
    docs = _docs(spark)
    q = _external_queries(spark)
    auto = batch_bm25_retrieval(docs, q, k=3)
    assert auto._auto_route == "broadcast"
    explicit = batch_bm25_retrieval(docs, q, k=3, route="broadcast")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_auto_route_picks_bloom_past_term_floor(spark):
    """The other side of the crossover, reached by dialing the floor
    down (the measurement's 8M-term switch point is not buildable in a
    unit test): auto must pick bloom and stay row-identical to the
    explicit bloom route — the output-invariance the route contract
    promises."""
    docs = _docs(spark)
    q = _external_queries(spark)
    auto = batch_bm25_retrieval(docs, q, k=3, auto_bloom_terms=1)
    assert auto._auto_route == "bloom"
    explicit = batch_bm25_retrieval(docs, q, k=3, route="bloom")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
