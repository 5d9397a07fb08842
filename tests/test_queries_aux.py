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
