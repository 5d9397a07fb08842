"""Empty-input robustness: every representative builder must plan and
execute over schema-only (zero-row) tables — returning empty results,
never crashing.  Production pipelines hit this on fresh partitions,
filtered-to-nothing date ranges, and first-run bootstraps."""

from __future__ import annotations

import pytest

import chessmate_spark.plans.queries as qmod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Representative slice of every operator family; chess fixtures excluded
# (they ingest their own PGN fixture, not these tables).
# Scalar/rollup aggregates legitimately return one all-NULL/zero row on
# empty input; everything else must return exactly zero rows.
SCALAR_ENTRIES = [
    "a13_rollup_revenue",
    "a16_pivot_revenue",
    "a18_approx_distinct",
    "a19_cube_revenue",
    "a22_funnel",
]

ENTRIES = [
    "q1_pricing_summary",
    "q18_large_orders",
    "a15_heavy_hitters",
    "a17_ntile_quartiles",
    "a17_cohort_cutoffs",
    "u5_set_operations",
    "j1_left_join_summaries",
    "j6_anti_join",
    "j7_asof_join",
    "j8_range_join",
    "j10_salted_skew_join",
    "a10_user_sessions",
    "a11_percentiles",
    "a14_moving_avg",
    "o4_topk_per_group",
    "d1_exact_dedup_groups",
    "d2_minhash_lsh_pairs",
    "d8_dup_clusters",
    "d9_decontaminate",
    "t1_token_counts",
    "t4_stratified_sample",
    "t5_sequence_pack",
    "t6_repetition_score",
    "t7_pii_scrub",
    "t8_chunk_documents",
    "t9_corpus_shuffle",
    "t10_vocabulary",
    "v2_cosine_topk",
    "v5_deterministic_embedding",
    "v8_embedding_quantize",
    "m1_binary_features",
    "m4_frame_sample",
    "d10_dedup_resolve",
    "t11_unigram_logprob",
    "t12_tfidf_search",
    "j11_scd2_history",
    "a20_session_window_native",
    "a21_approx_quantile_gate",
    "t13_quality_audit",
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
    "x10_chunk_udtf",
    "j15_stream_interval_join",
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
    "d20_stream_dedup",
    "s18_stream_commit_log_sink",
    "d19_semantic_resolve_bloom",
    "s17_commit_log_serializable",
    "d21_substring_dedup",
    "v13_rrf_fusion",
    "d22_substring_dedup_resolve",
    "d23_semantic_decontaminate",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", ENTRIES)
def test_builders_return_nothing_on_empty_tables(spark, empty_sf, name):
    builder, _ = qmod.QUERIES[name]
    assert builder(spark, empty_sf).collect() == []


@pytest.mark.parametrize("name", SCALAR_ENTRIES)
def test_scalar_builders_survive_empty_tables(spark, empty_sf, name):
    builder, _ = qmod.QUERIES[name]
    assert len(builder(spark, empty_sf).collect()) <= 1
