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
    "round8",
    "round9",
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
# (exactly 50 rows/round, measured r1-r8). Round-9 rotation policy
# (executes VERDICT r8 "Next round" items #1/#2):
#   1. the ten round-9 queries lead (the r5-verdict-endorsed rule:
#      new-query driver evidence outranks refreshing verified rows) —
#      the r8-planned trio (dd_docs_cascade_pipeline /
#      j18_point_in_interval_dpp / t_minhash_recall_curve) plus the
#      r9 additions (dd_minhash_incremental / dd_source_overlap_matrix /
#      stream_decontaminate_bloom / a38_sliding_kmv_distinct /
#      p13_late_materialization / t_lsh_band_config_sweep /
#      dd_embedding_nn_directed), all in queries/round9.py;
#   2. ALL 39 rows whose latest driver evidence is r4 rotate in: the 25
#      remaining names of the staged r4 block (its first 3 were sampled
#      r8 when the prefix slipped past the three then-unimplemented
#      names) plus the 14 unstaged r4 stragglers the r8 verdict lists;
#   3. the OLDEST r5-evidence row fills the remaining slot. After
#      CORRECTNESS_r09 nothing in the registry carries evidence older
#      than r5; the rest of the r5 block is staged directly behind the
#      cut to lead round 10.
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    "dd_docs_cascade_pipeline",
    "j18_point_in_interval_dpp",
    "t_minhash_recall_curve",
    "dd_minhash_incremental",
    "dd_source_overlap_matrix",
    "stream_decontaminate_bloom",
    "a38_sliding_kmv_distinct",
    "p13_late_materialization",
    "t_lsh_band_config_sweep",
    "dd_embedding_nn_directed",
    # -- r4-evidence rows: the 25-name tail of the staged block --
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
    # -- r4-evidence rows: the 14 unstaged stragglers --
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
    # -- oldest r5-evidence rows: head of the round-5 block --
    "q4_order_priority",
    # ---- 50-slot prefix cut line ----
    # -- rest of the r5 block: staged to lead round 10 --
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
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
