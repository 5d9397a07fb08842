#!/usr/bin/env python
"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output contract: the FULL payload (with per-query seconds) goes to
bench_out.local.json (untracked; `--commit` instead overwrites the
committed bench_out.json AND resyncs the SURVEY/EXPLAIN prose blocks,
`--out PATH` redirects) and is printed as one JSON line for humans; the
LAST stdout line is a SHORT JSON record {"metric", "value", "unit",
"sf", "n_queries", "queries_file"} so a tail-window parser always sees
the headline number even when per-query timings make the full line long
(round 2's full line outgrew the driver's tail window and parsed null).

Per-query time = logical plan build + full execution (collect), measured
after one warm-up action so JVM/codegen startup isn't charged to query 1.

Timing is MIN-OF-K per query (default k=2, `SPARK_GRAFT_BENCH_REPEATS=1`
opts back into the single-shot form): a co-tenant transient can only ADD
time, so the min of independent runs is the robust estimator of the
tree's true cost.  Round 7's committed single-shot artifact read 271 s
on a tree whose repeated cost was ~175 s — a 1.5x uniform host-load
inflation that took a full judge rerun to adjudicate; min-of-2 bounds
that failure mode at the cost of one extra suite pass (the same lesson
scale_smoke's linearity probe adopted the same round).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chessmate_spark.session import get_spark  # noqa: E402
from chessmate_spark.plans.queries import QUERIES  # noqa: E402

# Headline set: the scan/join/agg-heavy and operator-representative queries.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "o1_pagination",
    "o4_topk_per_group",
    "j1_left_join_summaries",
    "j3_semi_join",
    "j6_anti_join",
    "j7_asof_join",
    "j8_range_join",
    "j9_interval_join",
    "a6_status_histogram",
    "a7_windowed_counts",
    "u1_distinct_pairs",
    "u5_set_operations",
    "f16_json_extraction",
    "v2_cosine_topk",
    "v2_knn_join",
    "v4_hit_collapse",
    "v5_deterministic_embedding",
    "v1_client_embedding",
    "hybrid_search_documents",
    "t1_token_counts",
    "t2_quality_score",
    "t3_language_id",
    "f13_tokenize_sources",
    "a4_keyword_overlap",
    "d1_exact_dedup_groups",
    "d2_minhash_lsh_pairs",
    "d3_ngram_jaccard_pairs",
    "d4_simhash",
    "q6_revenue_change",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q18_large_orders",
    "q18_bucketed_twin",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q8_market_share",
    "q9_product_profit",
    "q11_value_concentration",
    "q12_priority_linestatus",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "d5_document_fingerprint",
    # d6_embedding_neardup is the exact all-pairs ORACLE baseline: its plan
    # collects the (id, vector) corpus to the driver for a block matmul,
    # which cannot be a headline claim at 100 TB.  d7 stays as the
    # ROUTED entry: its lsh_plan_for planner proves hyperplane LSH
    # cannot prune at the fixture's 0.35 threshold (>=60% of all-pairs
    # survive any recall-0.9999 banding), so past gate scale it takes
    # the guarded exact path; at prunable thresholds it runs LSH with
    # the planned banding.  The 100 TB low-threshold route is the
    # k-means-cells family (d13), benchmarked below.
    "d7_embedding_neardup_lsh",
    "d8_dup_clusters",
    # planner-sized minhash dedup: the (50, 25) operating point frozen
    # at the gate-corpus plan (see the entry docstring)
    "d24_minhash_planned_dedup",
    "d25_hyperplane_planned_neardup",
    "d26_minhash_adaptive_dedup",
    "d27_hyperplane_adaptive_neardup",
    # round 12: the commit-log-backed incremental dedup lifecycle
    "d28_incremental_lifecycle",
    "t4_stratified_sample",
    "t5_sequence_pack",
    "t6_repetition_score",
    "t7_pii_scrub",
    "t8_chunk_documents",
    "t9_corpus_shuffle",
    "t10_vocabulary",
    "a18_approx_distinct",
    "d9_decontaminate",
    "v8_embedding_quantize",
    "j10_salted_skew_join",
    "v6_lsh_ann",
    "v7_ivf_ann",
    "v10_pq_ann",
    "v11_ivfpq_ann",
    "a9_windowed_event_counts",
    "a10_user_sessions",
    "a11_percentiles",
    "a13_rollup_revenue",
    "a19_cube_revenue",
    "a14_moving_avg",
    "a15_heavy_hitters",
    "a15_heavy_hitters_sketch",
    "a16_pivot_revenue",
    "a17_ntile_quartiles",
    "a17_cohort_cutoffs",
    "m1_binary_features",
    "m2_image_decode_stub",
    "m3_byte_entropy",
    "m4_frame_sample",
    "o5_result_formatting",
    "a1_count_filtered",
    "p6_range_filter",
    "p10_rating_delta",
    "f3_slugify",
    "f4_date_normalization",
    "f7_eco_catalogue",
    "f19_opening_prettifier",
    "serve_query_canonical",
    "serve_query_batch",
    "chess_jobs_drain",
    # chess_jobs_stream is excluded like d6: it runs a real checkpointed
    # Structured Streaming query against tmp dirs — correctness-checked by
    # the driver harness, but its checkpoint setup/teardown wall-clock is
    # not a query-engine number.
    "x7_agent_blend",
    "x8_agent_cache",
    "x9_agent_guarded",
    "s11_twic_precheck",
    "s12_fen_emitter",
    "q6_job_prune",
    "a8_worker_rates",
    "f17_json_results",
    "f23_pgn_truncation",
    "f24_sanitizer",
    "x5_theme_classifier",
    "chess_ingest_positions",
    "chess_ingest_batch",
    "chess_hybrid_canonical",
    "d10_dedup_resolve",
    "t11_unigram_logprob",
    "t12_tfidf_search",
    "j11_scd2_history",
    "a20_session_window_native",
    "a21_approx_quantile_gate",
    "t13_quality_audit",
    "a22_funnel",
    "a23_retention",
    "j12_fuzzy_match_counts",
    "a24_time_range_avg",
    "m5_waveform_features",
    "a25_grouped_correlation",
    "a26_hopping_counts",
    "d11_pagerank_dupgraph",
    "t14_boilerplate_ngrams",
    "a27_zscore_outliers",
    "t15_mixing_weights",
    "v9_embedding_pool",
    "d12_incremental_dedup",
    "j13_cdc_merge",
    "m6_waveform_resample",
    "t16_bigram_logprob",
    "t17_source_cap",
    "j14_bloom_prune_join",
    "s13_csv_roundtrip",
    "s14_jsonl_roundtrip",
    "d13_semantic_dedup",
    "a28_group_regression",
    "s15_orc_roundtrip",
    "m7_entropy_arrow",
    "m8_image_resize_stub",
    "t18_token_ids",
    "d14_dup_weights",
    "d15_jaccard_prefix_join",
    "t19_mixture_sample",
    "t20_bpe_merges",
    "t21_unicode_token_ids",
    "t22_unicode_bpe",
    "d16_dedup_resolve_bloom",
    "d17_paragraph_dedup",
    "a29_countmin_gate",
    "s16_corrupt_record_channel",
    "t23_inverted_index",
    "t24_bm25_search",
    "t25_batch_bm25_retrieval",
    "t26_boilerplate_cms_gate",
    "d18_semantic_dedup_resolve",
    "d19_semantic_resolve_bloom",
    "s17_commit_log_serializable",
    "v12_ann_index_persist",
    "d21_substring_dedup",
    "v13_rrf_fusion",
    "a31_constraint_audit",
    "d22_substring_dedup_resolve",
    "v14_ann_index_append",
    "d23_semantic_decontaminate",
    # round 13: snapshot-isolated index lifecycle (build -> pinned
    # reader -> forced rebuild -> isolation + recall gates)
    "v15_ann_snapshot_lifecycle",
    # round 9: drift audits + schema-evolution read
    "a32_drift_psi",
    "s19_schema_evolution",
    "a33_windowed_drift",
    # round 10: categorical windowed drift (two counted scans)
    "a34_windowed_drift_categorical",
    # x10_chunk_udtf is excluded: it is the UDTF extension-surface proof
    # (per-row Python by design); t8_chunk_documents IS the production
    # path for those semantics and is benchmarked above.
    # j15_stream_interval_join is excluded like chess_jobs_stream: a real
    # checkpointed streaming run whose setup/teardown wall-clock is not a
    # query-engine number; j9_interval_join is its batch plan and is
    # benchmarked above.
]

# Documented exclusions, one reason each.  tests/test_bench_coverage.py
# enforces HEADLINE ∪ EXCLUDED == queries() exactly (and disjoint), so a
# future inventory entry cannot silently join neither list.
EXCLUDED = {
    "d6_embedding_neardup": (
        "exact all-pairs oracle baseline (driver-side matmul behind a "
        "corpus-size guard); d7_embedding_neardup_lsh benchmarks the "
        "planner-routed entry and d13_semantic_dedup the low-threshold "
        "scale path"
    ),
    "chess_jobs_stream": (
        "real checkpointed Structured Streaming run; checkpoint "
        "setup/teardown wall-clock is not a query-engine number"
    ),
    "x10_chunk_udtf": (
        "UDTF extension-surface proof (per-row Python by design); "
        "t8_chunk_documents is the production plan for the same semantics"
    ),
    "j15_stream_interval_join": (
        "real checkpointed stream-stream join run; j9_interval_join is "
        "its batch plan and is benchmarked"
    ),
    "d20_stream_dedup": (
        "real checkpointed streaming dedup run; d1_exact_dedup_groups is "
        "the batch dedup plan and is benchmarked"
    ),
    "s18_stream_commit_log_sink": (
        "real checkpointed stream into the commit log; "
        "s17_commit_log_serializable benches the commit protocol itself"
    ),
}


def main() -> None:
    import argparse

    # Round-8 verdict finding: a bare rerun used to overwrite the
    # COMMITTED bench_out.json (the file test_prose_consistency pins the
    # SURVEY/EXPLAIN BENCH blocks to), leaving the tree failing pytest
    # until a checkout.  A measurement must not mutate the record it is
    # judged against: fresh runs now land in the untracked
    # bench_out.local.json; `--commit` is the explicit act of updating
    # the pinned artifact AND regenerating the prose blocks in one step.
    parser = argparse.ArgumentParser(description=__doc__)
    group = parser.add_mutually_exclusive_group()
    group.add_argument(
        "--commit",
        action="store_true",
        help="overwrite the committed bench_out.json and resync the "
        "SURVEY/EXPLAIN BENCH prose blocks from it",
    )
    group.add_argument(
        "--out",
        help="write the full record to this path instead of "
        "bench_out.local.json",
    )
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    spark = get_spark(app_name="chessmate_spark_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch the biggest table so JVM startup isn't charged to q1,
    # and run one trivial mapInPandas so the Python worker pool forks now
    # instead of inside the first Arrow-stage query.  Round 15 (verdict
    # item #4, additions-only): the forked workers also PRE-IMPORT the
    # heavy modules the suite's Arrow UDFs actually use — numpy/pandas
    # and the vector_pandas module — because the measured ~8 s
    # first-Arrow-entry tax was module import time inside reused
    # workers, which the bare-lambda warmup did not cover.  Warmup
    # fidelity only; the timing loop below is untouched.
    def _warm_arrow(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        from chessmate_spark.functions import vector_pandas  # noqa: F401

        for b in batches:
            yield b

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        _warm_arrow, "id long"
    ).count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    timings = {}
    errors = {}
    flaky = {}
    for name in HEADLINE:
        # min-of-k: each rep rebuilds the plan from the registry (plan
        # analysis is part of the charged cost) and fully collects; the
        # min survives as long as ONE rep ran clean
        best = None
        last_err = None
        n_failed = 0
        for _ in range(repeats):
            start = time.perf_counter()
            # a single broken query must not erase the whole bench record
            # (round 3's record was lost to one AnalysisException at build
            # time); the registry lookup stays inside too — a renamed entry
            # is the same failure mode as a broken one
            try:
                builder, _oracle = QUERIES[name]
                df = builder(spark, sf_dir)
                rows = df.collect()
                del rows
                elapsed = time.perf_counter() - start
                best = elapsed if best is None else min(best, elapsed)
            except Exception as exc:  # noqa: BLE001
                last_err = f"{type(exc).__name__}: {exc}"[:500]
                n_failed += 1
        if best is not None:
            timings[name] = round(best, 4)
            if last_err is not None:
                # an INTERMITTENT failure must not vanish just because
                # another rep succeeded: record it visibly (the record
                # stays complete — the min is a real clean run — but a
                # flaky entry is a finding, not noise)
                flaky[name] = f"{n_failed}/{repeats} reps failed: {last_err}"
                print(f"BENCH FLAKY {name}: {flaky[name]}", file=sys.stderr)
        else:
            errors[name] = last_err
            print(f"BENCH ERROR {name}: {last_err}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "repeats": repeats,
        "timing": f"min-of-{repeats}",
        # False = some queries errored, so `value` sums a SMALLER suite and
        # must not be compared against other rounds' totals
        "complete": not errors,
    }
    if errors:
        full["errors"] = errors
    if flaky:
        full["flaky"] = flaky
    root = os.path.dirname(os.path.abspath(__file__))
    if args.out:
        out_path = args.out
    elif args.commit:
        out_path = os.path.join(root, "bench_out.json")
    else:
        out_path = os.path.join(root, "bench_out.local.json")
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    if args.commit:
        # artifact + prose move together or not at all: a --commit run
        # that updated the artifact but left stale prose would recreate
        # the exact drift the pinning test exists to catch
        sys.path.insert(0, os.path.join(root, "scripts"))
        import sync_bench_prose

        rc = sync_bench_prose.sync(write=True)
        if rc != 0:
            # fail LOUDLY: the artifact is already overwritten, and
            # exiting 0 here would ship exactly the artifact/prose
            # drift --commit exists to prevent (e.g. a doc lost its
            # BENCH marker block)
            raise SystemExit(
                f"--commit: prose resync failed (rc={rc}) — artifact "
                "updated but a BENCH block was not; restore the marker "
                "and rerun sync_bench_prose --write"
            )
    print(json.dumps(full))
    # short record LAST: always inside any output tail window
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "repeats": repeats,
                "n_queries": len(timings),
                "n_errors": len(errors),
                "n_flaky": len(flaky),
                "complete": not errors,
                "queries_file": os.path.basename(out_path),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
