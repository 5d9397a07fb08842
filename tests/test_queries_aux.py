"""Cross-checks between query-inventory twins that share semantics but
not plans.

a17_ntile_quartiles (global-sort ntile, the exact-semantics pin) vs
a17_cohort_cutoffs (percentile-cutoff cohorts, the scale-safe plan):
rank-based and value-based quartiles can only disagree where a row sits
exactly at an interpolated boundary, so per-bucket counts match within 1
and the extreme buckets share min/max with the ntile form.
"""

from __future__ import annotations

import re

from chessmate_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark, name):
    return QUERIES[name][0](spark, SF_DIR).collect()


def test_cohort_cutoffs_matches_ntile_within_boundary_ties(spark):
    ntile = {r["quartile"]: r for r in _rows(spark, "a17_ntile_quartiles")}
    cohort = {r["cohort"]: r for r in _rows(spark, "a17_cohort_cutoffs")}
    assert set(ntile) == set(cohort) == {1, 2, 3, 4}
    assert sum(r["n_customers"] for r in ntile.values()) == sum(
        r["n_customers"] for r in cohort.values()
    )
    for b in (1, 2, 3, 4):
        assert abs(ntile[b]["n_customers"] - cohort[b]["n_customers"]) <= 1
    # The global extremes are boundary-independent.
    assert cohort[1]["max_bal"] == ntile[1]["max_bal"]
    assert cohort[4]["min_bal"] == ntile[4]["min_bal"]


def test_cohort_cutoffs_plan_has_no_row_level_global_sort(spark):
    """The twin exists to kill a17's single-partition row sort: the only
    SinglePartition exchange allowed in its plan is the partial-percentile
    state merge (ObjectHashAggregate), never a Sort over table rows."""
    df = QUERIES["a17_cohort_cutoffs"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no ntile/global window at all
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # The consumer right above the exchange must be the percentile
        # merge, not a Sort.
        above = lines[max(0, i - 2) : i]
        assert any("Aggregate" in a for a in above), plan
    assert not re.search(r"Sort .*c_acctbal", plan), plan


def test_bloom_prune_plan_filters_before_exchange(spark):
    """j14's contract: the bloom membership filter runs on the fact SCAN
    side, below any exchange — the probe must shed rows before the join
    shuffle, or the operator is pointless at scale."""
    df = QUERIES["j14_bloom_prune_join"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the Arrow-batched probe appears as an eval-python node; everything
    # from it down to the orders scan must contain no Exchange
    probe_idx = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    assert probe_idx, plan
    scan_idx = [
        i for i, l in enumerate(lines)
        if "Scan parquet" in l and "orders" in l
    ]
    assert scan_idx, plan
    between = lines[probe_idx[0]: scan_idx[-1] + 1]
    assert not any("Exchange" in l for l in between), plan


def test_prefix_join_plan_has_no_single_partition_exchange(spark):
    """d15's rarest-first order is (_df, _sh) inside the per-doc window —
    materializing it as a global row_number rank would funnel every
    distinct shingle through one task (the round-5 scale-killer). The
    unmaterialized plan must carry zero SinglePartition exchanges."""
    from chessmate_spark.operators.dedup import ngram_jaccard_pairs_prefix

    from pyspark.sql import functions as F

    # filter, not limit(): a GlobalLimit on the input would itself plan
    # an Exchange SinglePartition and mask what this test pins
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    out = ngram_jaccard_pairs_prefix(
        docs, "doc_id", "text", min_jaccard=0.5, materialize=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_semantic_dedup_plan_never_shuffles_vectors(spark):
    """d13's candidate stage moves (cell, id) pairs only: no Exchange in
    the plan may carry the embedding column."""
    df = QUERIES["d13_semantic_dedup"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "embedding" not in line, line


# --- round-7 plan pins: the new entries' scale claims, asserted at
# plan time so a regression shows as a test failure, not a slow run ---


def test_t25_retrieval_join_broadcasts_query_terms(spark):
    """t25's scale claim: posting lists never reshuffle for the
    retrieval join — the query-term and stats sides are broadcast, so
    the plan carries no SortMergeJoin and at least two broadcast
    exchanges; the only hash exchanges key the aggregations (postings
    build, df build, per-(query,doc) score), never a join side."""
    df = QUERIES["t25_batch_bm25_retrieval"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastExchange") >= 2, plan


def test_t26_gate_probe_is_exchange_free_until_exact_stage(spark):
    """t26's scale claim: the per-row sketch probe joins BROADCAST
    slices — between the first probe join and the documents scan there
    must be no shuffle Exchange (the stream is filtered at the scan);
    the plan's only wide exchanges belong to the sketch build and the
    exact aggregation of survivors."""
    df = QUERIES["t26_boilerplate_cms_gate"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    # 4 sketch slices -> at least 4 broadcast exchanges on the probe path
    assert plan.count("BroadcastExchange") >= 4, plan


def test_d18_resolution_anti_join_is_broadcast(spark):
    """d18's scale claim: the surviving-corpus step is ONE broadcast
    LEFT ANTI against the drop-list — the embeddings scan must not
    shuffle for it (no SortMergeJoin anti, no exchange keyed on the
    corpus side of the anti join)."""
    df = QUERIES["d18_semantic_dedup_resolve"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin LeftAnti" not in plan, plan


def test_v10_adc_scoring_has_no_python_and_no_vector_shuffle(spark):
    """v10's scale claim: ADC scoring is pure JVM over broadcast LUTs —
    the candidate-generation segment (codes cross-join LUTs through the
    shortlist window) contains exactly one Python node (the encode UDF
    at the scan) and the only corpus-side exchange keys the top-k
    window, which carries (query, id, score) rows, never vectors."""
    from chessmate_spark.operators.similarity import pq_topk

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    out = pq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", m=8, ksub=16, overfetch=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # encode UDF once per corpus branch (shortlist + re-rank lineage);
    # ADC itself must not add Python nodes
    assert plan.count("ArrowEvalPython") <= 2, plan
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python


# --- round-8 plan pins ---


def test_v11_ivfpq_adc_is_cell_pruned_jvm_only(spark):
    """v11's scale claim: the ADC stage is cell-pruned and JVM-only —
    the codes scan equi-joins the broadcast (query, cell, LUT) rows on
    cell (a BroadcastHashJoin, never the cross join v10 pays), Python
    appears only at the two Arrow boundaries (combined encode at the
    scan; nothing row-at-a-time), and no corpus-side exchange carries
    the embedding column before the re-rank join."""
    from chessmate_spark.operators.similarity import ivfpq_topk

    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    out = ivfpq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", nlist=8, nprobe=4, m=8, ksub=16,
        overfetch=4,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # combined encode UDF once per corpus branch (shortlist + re-rank
    # lineage); ADC adds no Python
    assert plan.count("ArrowEvalPython") <= 2, plan
    assert "BatchEvalPython" not in plan, plan


def test_v12_serve_from_index_plan_has_no_python(spark, tmp_path):
    """v12's scale claim: serving from a persisted index never runs
    Python — the encode UDF belongs to the BUILD job only, so the serve
    plan (codes scan -> broadcast LUT equi-join -> JVM ADC -> exact
    re-rank) must contain zero Arrow/Batch eval nodes and stay
    cell-pruned (BroadcastHashJoin, no cross join)."""
    from pyspark.sql import functions as F

    from chessmate_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
        load_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    idx = str(tmp_path / "index")
    build_ivfpq_index(corpus, "neighbor_id", idx, nlist=8, m=8, ksub=16)
    centroids, codebooks, codes = load_ivfpq_index(spark, idx)
    out = ivfpq_topk(
        queries, corpus, k=3, query_id="query_id",
        corpus_id="neighbor_id", nprobe=4, overfetch=8,
        centroids=centroids, codebooks=codebooks, codes=codes,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
