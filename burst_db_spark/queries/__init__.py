"""Query catalog: importing this package registers every query.

Each module binds operators from ``burst_db_spark.operators`` to the
synthetic tables (TESTDATA.md) and supplies the DuckDB oracle SQL used by
the driver's correctness gate.

Imports fail soft: a broken module loses its own queries (loudly, on
stderr) instead of taking the whole driver contract down.
"""

from __future__ import annotations

import importlib
import sys

_MODULES = (
    "advanced",
    "composite",
    "core",
    "extra",
    "extra2",
    "extra3",
    "extra4",
    "extra5",
    "pipeline_pack",
    "pipeline_text",
    "retrieval",
    "round4",
    "round5",
    "round5b",
    "round5c",
    "round6",
    "round7",
    "scalars",
    "similarity",
    "skewq",
    "slayer",
    "spatial",
    "textops",
    "tpch2",
    "windows",
    "windows2",
)

for _m in _MODULES:
    try:
        importlib.import_module(f"burst_db_spark.queries.{_m}")
    except Exception as e:  # pragma: no cover - defensive
        print(
            f"burst_db_spark.queries.{_m} failed to load: {e!r}",
            file=sys.stderr,
        )

# The driver's correctness gate samples a PREFIX of the registration order
# (exactly 50 rows/round, measured r1-r6). Round-7 rotation policy
# (executes the round-6 queue item #1, COVERAGE.md "Round-7 queue"):
#   1. knn_cosine_ivf_learned leads — the round-6 arithmetic casualty
#      (position 51 in r6, promised pole position);
#   2. the 11 round-6 queries follow: all strict + pytest green in r6 but
#      never driver-sampled — new-query driver evidence outranks
#      refreshing locally-verified rows (the r5-verdict-endorsed rule);
#   3. the 18 NEW round-7 queries register directly behind them (same
#      rule: they are the round's load-bearing additions);
#   4. the remaining 20 slots go to the oldest evidence block — rows
#      whose last driver green is r3 (48 such rows exist; the 20 with
#      the most distinct machinery are taken, family-duplicates defer);
#   5. the 28 deferred r3 rows sit immediately behind the cut and lead
#      round 8 together with whatever round 7 adds late. All 28 have an
#      in-prefix sibling covering their machinery (a3_union_envelope for
#      the a3 family, j16 for j12, s14 for the zarr reads,
#      dd_embedding_nn for multiprobe, t_weighted/stratified for the
#      sampling trio, ...) and all are strict-green on current data.
#   6. the multimodal rotation slot is double-covered this round:
#      mm_audio_windows (r6 block) and mm_video_framesample (new).
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- pole position: the r6 arithmetic casualty (rows-only by design) --
    "knn_cosine_ivf_learned",
    # -- round-6 queries: strict+pytest green, never driver-sampled --
    "s14_zarr_py_writer",
    "stream_zarr_append_sink",
    "g4_cc_iterative",
    "f_arrow_udf_normalize",
    "mm_audio_windows",          # the mm_* rotation slot, counted
    "t_weighted_sample",
    "a31_countmin_merge",
    "knn_ivf_learned_exhaustive",
    "f_recursive_cte_gapfill",
    "s15_schema_evolution",
    "j16_asof_tolerance",
    # -- NEW round-7 queries --
    "a32_kmv_distinct",
    "t_paragraph_dedup",
    "knn_int8_quantized",
    "p12_dynamic_partition_pruning",
    "o6_range_partitioned_sort",
    "f_map_gauntlet",
    "t_containment_join",
    "mm_video_framesample",
    "t_containment_survivors",
    "stream_kmv_sketch",
    "a33_exact_median_2pass",
    "a34_grouped_ols",
    "w15_interval_coalesce",
    "f_try_arithmetic",
    "w16_resample_ohlc",
    "u6_dq_checks",
    "stream_ohlc_complete",
    "knn_ivf_int8_funnel",
    # -- oldest evidence: last driver green r3 (20 of 48; rest defer) --
    "stream_session_counts",
    "ep2_burst_catalog",
    "frame_lookup",
    "a2_dissolve_multiagg",
    "f4_missing_dates",
    "f_json_props",
    "p2_filter_isin",
    "j2_fact_dim_broadcast",
    "q1_pricing_summary",
    "u1_unpivot_union",
    "o5_topk_per_group",
    "dd_embedding_nn",
    "w_running_sum",
    "p9_spatial_intersect",
    "j7_spatial_join",
    "a3_union_envelope",
    "utm_epsg_classify",
    "j_spatial_knn",
    "a14_spatial_mean",
    "s1_sqlite_roundtrip",
    # ---- 50-slot prefix cut line ----
    "s4_csv_glob_multifile",
    "s9_xml_bursts",
    "k5_partitioned_append_roundtrip",
    "f_string_gauntlet",
    "t_pack_sequences",
    "t_curriculum_buckets",
    "s8_rangezip_roundtrip",
    "s10_stac_paged",
    "t_repetition_stats",
    "t_stratified_sample",
    # -- deferred r3 rows: lead round 8 (each has an in-prefix sibling) --
    "q5_local_supplier_volume",
    "a3_dissolve_union_area",
    "a3_union_polygon",
    "j12_asof_join",
    "u2_array_ops",
    "s11_zarr_cube",
    "s11_zarr_coords",
    "knn_cosine_ivf_multiprobe",
    "t_decontaminate_bloom",
    "mm_bmp_resize",
    "k7_bucketed_colocated_join",
    "mm_frame_sample",
    "k8_compact_roundtrip",
    "dd_embedding_nn_multiprobe",
    "k1_gpkg_roundtrip",
    "stream_corpus_dedup",
    "t_cap_per_source",
    "t_temperature_mix",
    # -- r6-sampled rows (all green r6) --
    "stream_watermark_append",
    "stream_stream_join",
    "mm_features",
    "f_variant_props",
    "g3_bfs_hops",
    "a5_string_agg_distinct",
    "a8_first_seen",
    "a9_count_per_day",
    "a10_multi_minmax",
    "a11_named_agg_pct",
    "a15_summary_stats",
    "a16_percentiles",
    "o1_topk_orders",
    "u2_reconcile_snapshots",
    "u3_union_all",
    "w1_first_value",
    "w4_run_length",
    "w6_water_year",
    "w7_first_significant_block",
    "f_regex_extract",
    "ep1_frame_partition",
    "w5_reference_dates",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "dd_simhash",
    "dd_corpus_survivors",
    "dd_dedup_clusters",
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "f_conditional_gauntlet",
    "f_date_gauntlet",
    "f_math_gauntlet",
    "s2_csv_infer_roundtrip",
    "s3_csv_schema_semicolon",
    "s6_geojson_roundtrip",
    "s7_envelope_roundtrip",
    "stream_daily_counts",
    "a17_cube",
    "t_decontaminate",
    "t_fingerprint",
    "t_lang_guess",
    "t_quality_filter",
    "t_quality_score",
    "t_redact_pii",
    "t_top_tfidf",
    "ep1_minimal_db",
    "skew_salted_count",
    "t_token_stats",
    "t_split_assign",
    # -- round-5 block (all driver-green r5) --
    "q4_order_priority",
    "q17_small_qty_revenue",
    "q21_suppliers_waiting",
    "t_bpe_reconstruction",
    "k6_metadata_roundtrip",
    "k4_geojson_simplified",
    "q12_late_priority",
    "q16_supplier_cnt",
    "q18_large_volume",
    "q20_part_shippers",
    "q22_global_sales_opportunity",
    "p6_epsg_sentinel_filter",
    "t_chunk_documents",
    "t_lm_quality_gate",
    "g2_triangle_stats",
    "w12_linear_interpolation",
    "stream_upsert_snapshot",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "a24_moment_stats",
    "a25_grouping_sets",
    "t_token_budget_mix",
    "t_ngram_overlap_score",
    "f_array_gauntlet",
    "w13_ntile_quartiles",
    "u4_full_outer_reconcile",
    "s12_orc_roundtrip",
    "f_udtf_sentences",
    "w2c_dynamic_gap_sessions",
    "t_curation_mix_pipeline",
    "a26_bool_aggregates",
    "j14_fuzzy_name_join",
    "dd_jaccard_prefix_join",
    "a27_hll_union_merge",
    "a28_zscore_outliers",
    "w14_ewma_halflife",
    "j15_null_safe_join",
    "u5_intersect_except",
    "a29_value_histogram",
    "s13_zarr_python_datasource",
    # -- behind the prefix: r4-green spares --
    "w2_sessionize",
    "w3_batch_labels",
    "w_lag_delta",
    "w_rolling_1d",
    "a13_weekly_window",
    "w2b_session_window_batch",
    "dd_semdedup",
    "dd_span_dedup",
    "t_inverted_index",
    "t_bm25_search",
    "t_bigram_lm_score",
    "knn_pq_adc",
    "geo_zorder_code",
    "dd_embedding_nn_exact_audit",
    "t_bpe_merges",
    "mm_wav_roundtrip",
    "dd_lsh_cluster_dedup",
    "t_docs_minhash_pipeline",
    "j13_range_interval_join",
    "a18_hll_distinct",
    "t_ngram_lm_perplexity",
    "w9_cume_dist_family",
    "q3_shipping_priority",
    "q10_returned_items",
    "stream_interval_counts",
    "t_bpe_encode",
    "a19_approx_percentile",
    "a20_heavy_hitters",
    "t_phrase_search",
    "a21_hopping_window",
    "dd_lsh_quality_audit",
    "a22_rollup",
    "w10_scd2_intervals",
    "g1_pagerank3",
    "w11_funnel",
    "a23_cohort_retention",
    "group_by_all",
    "pivot_by_type",
    "p1_projection_minimal",
    "p3_filter_range",
    "p4_filter_bool_combo",
    "p7_blackout_anti_join",
    "p10_dedup_distinct",
    "j1_region_rollup",
    "j4_join_using",
    "j6_left_join_fillna",
    "j9_update_join",
    "j10_range_join",
    "a1_dedup_latest",
    "a4_round_avg_cast",
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
