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
    "scalars",
    "similarity",
    "skewq",
    "slayer",
    "spatial",
    "textops",
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
# (rounds 1-3: exactly the first 50). Round-4 rotation policy:
#   1. NEW round-4 queries lead (no green row exists for them at all);
#   2. then the 9 queries that have NEVER received a driver row (the 8
#      late-round-3 additions + the embedding-audit baseline);
#   3. then the 5 NTZ-repaired window queries (their r4 implementation
#      path — catalog normalization — has no driver evidence, and
#      w2_sessionize is the round-3 red row to flip);
#   4. then the r1-green rows the driver has never re-sampled, so every
#      registered oracle query eventually gets a fresh row;
#   5. one multimodal row stays in every round's prefix (codec
#      regressions must surface).
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- NTZ-repaired this round (w2 = the r3 red row to flip) --
    "w2_sessionize",
    "w3_batch_labels",
    "w_lag_delta",
    "w_rolling_1d",
    "a13_weekly_window",
    "w2b_session_window_batch",
    # -- never driver-checked (8 late-r3 + the audit baseline) --
    "dd_semdedup",
    "dd_span_dedup",
    "t_inverted_index",
    "t_bm25_search",
    "t_bigram_lm_score",
    "knn_pq_adc",
    "geo_zorder_code",
    "dd_embedding_nn_exact_audit",
    "t_bpe_merges",            # rows-only: weaker check, but first evidence
    # -- multimodal rotation slot --
    "mm_wav_roundtrip",
    # -- new in round 4 --
    "dd_lsh_cluster_dedup",    # new: LSH pairs -> clusters -> survivors end-to-end
    "t_docs_minhash_pipeline", # new: full corpus-clean composition
    "j13_range_interval_join", # new: binned interval join (no IN-list expand)
    "a18_hll_distinct",        # new: approx_count_distinct vs exact oracle bound
    "t_ngram_lm_perplexity",   # new: trigram backoff scoring
    "w9_cume_dist_family",     # new: cumulative-distribution window gauntlet
    "q3_shipping_priority",    # new: TPC-H Q3 3-way join + top-k
    "q10_returned_items",      # new: TPC-H Q10 revenue rollup
    "stream_interval_counts",  # new: stream-static binned interval join
    "t_bpe_encode",            # new: tokenizer application (rows-only)
    "a19_approx_percentile",   # new: GK quantile sketch rank-bound check
    "a20_heavy_hitters",       # new: freqItems no-false-negative check
    "t_phrase_search",         # new: positional phrase match
    "a21_hopping_window",      # new: native sliding windows
    "dd_lsh_quality_audit",    # new: driver-checked LSH recall
    "a22_rollup",              # new: ROLLUP + GROUPING bit vector
    "w10_scd2_intervals",      # new: SCD2 validity intervals
    "g1_pagerank3",            # new: bit-exact bounded PageRank
    "w11_funnel",              # new: ordered conversion funnel
    "a23_cohort_retention",    # new: cohort-retention matrix
    # -- r1-green, never re-sampled since round 1 --
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
    "a5_string_agg_distinct",
    "a8_first_seen",
    "a9_count_per_day",
    "a10_multi_minmax",
    "a11_named_agg_pct",
    "a15_summary_stats",
    "o1_topk_orders",
    "u2_reconcile_snapshots",
    "u3_union_all",
    "w1_first_value",
    "w4_run_length",
    "w6_water_year",
    "w7_first_significant_block",
    "a16_percentiles",
    "f_regex_extract",
    # -- behind the 50-slot prefix: r2/r3-green spares, then rows-only --
    "t_pack_sequences",
    "j7_spatial_join",
    "j_spatial_knn",
    "j12_asof_join",
    "u2_array_ops",
    "s1_sqlite_roundtrip",
    "stream_session_counts",
    "t_curriculum_buckets",
    "dd_embedding_nn",
    "a3_union_polygon",
    "s8_rangezip_roundtrip",
    "s10_stac_paged",
    "t_repetition_stats",
    "t_stratified_sample",
    "s11_zarr_cube",
    "knn_cosine_ivf_multiprobe",
    "t_decontaminate_bloom",
    "mm_bmp_resize",
    "k7_bucketed_colocated_join",
    "mm_frame_sample",
    "k8_compact_roundtrip",
    "mm_features",
    "dd_embedding_nn_multiprobe",
    "k1_gpkg_roundtrip",
    "stream_corpus_dedup",
    "s11_zarr_coords",
    "t_cap_per_source",
    "t_temperature_mix",
    "frame_lookup",
    "q1_pricing_summary",
    "p2_filter_isin",
    "j2_fact_dim_broadcast",
    "a2_dissolve_multiagg",
    "o5_topk_per_group",
    "u1_unpivot_union",
    "f4_missing_dates",
    "f_json_props",
    "p9_spatial_intersect",
    "a3_union_envelope",
    "a3_dissolve_union_area",
    "utm_epsg_classify",
    "a14_spatial_mean",
    "ep2_burst_catalog",
    "q5_local_supplier_volume",
    "w_running_sum",
    "s4_csv_glob_multifile",
    "s9_xml_bursts",
    "k5_partitioned_append_roundtrip",
    "f_string_gauntlet",
    "ep1_minimal_db",          # rows-only by design
    "knn_cosine_ivf_learned",  # rows-only by design
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
