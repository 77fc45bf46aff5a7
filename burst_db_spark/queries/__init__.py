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
    "round10",
    "round11",
    "round12",
    "round13",
    "round14",
    "round15",
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
# (exactly 50 rows/round, measured r1-r12). Round-13 rotation policy
# (executes VERDICT r12 "Next round" item #1, extended for this round's
# promotions and additions):
#   1. the 13 round-12 additions — the only green-oracle rows with NO
#      driver evidence in any CORRECTNESS_r*.json — lead, exactly as
#      staged last round;
#   2. t_bpe_merges / t_bpe_encode: promoted THIS round from rows-only
#      to full unrolled-CTE oracles (plans/bpe_oracle.py, VERDICT #5) —
#      first-ever hash-checked driver sample; knn_cosine_ivf_learned
#      (the one remaining rows-only row) rides along for its first
#      driver rows-evidence;
#   3. w4/w6/w7: the r6-evidence block staged behind last round's cut;
#   4. the 13 round-13 additions (funnel assignment, AC shorts path,
#      robust aggs, dup-ngram spans, DoReMi, curve-sink roundtrip,
#      NB confusion, Moore-Lewis, HITS, Page-Hinkley batch+stream,
#      Gopher ablation, dup-cluster distribution) — strict-verified at
#      sf0.01 this round, driver evidence lands now;
#   5. t_substring_dedup: its plan changed this round (the BNLJ shorts
#      branch became the data-dependent AC path) — resample;
#   6. fill to exactly 50 with the oldest-evidence (r7) block,
#      alphabetical.
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- the 13 round-12 additions (no driver evidence yet) --
    "dd_d4_diversify",
    "knn_kmeans_unrolled",
    "t_soft_dedup_weights",
    "t_hill_tail_index",
    "t_ccnet_buckets",
    "t_gopher_rules",
    "t_char_entropy",
    "dd_cluster_bcubed_audit",
    "a46_weighted_median",
    "w21_cusum_drift",
    "t_token_gini",
    "o7_hilbert_layout",
    "stream_cusum",
    # -- oracle-promoted THIS round (plans/bpe_oracle.py, VERDICT #5) --
    "t_bpe_merges",
    "t_bpe_encode",
    # -- the one remaining rows-only row: first driver rows-evidence --
    "knn_cosine_ivf_learned",
    # -- r6-evidence block staged behind last round's cut --
    "w4_run_length",
    "w6_water_year",
    "w7_first_significant_block",
    # -- round-13 additions (strict-verified sf0.01 this round) --
    "knn_hier_assign",
    "t_substring_dedup_shorts",
    "a47_winsorized_mean",
    "a48_mad_outliers",
    "t_dup_ngram_spans",
    "t_doremi_weights",
    "o8_curve_sorted_roundtrip",
    "t_nb_domain_confusion",
    "t_moore_lewis_select",
    "g5_hits_unrolled",
    "w22_page_hinkley",
    "stream_page_hinkley",
    "t_gopher_ablation",
    "dd_dup_cluster_size_dist",
    # -- plan changed THIS round (AC shorts path, VERDICT #2) --
    "t_substring_dedup",
    # -- fill to 50 with the OLDEST driver evidence (r7 block) --
    "a14_spatial_mean",
    "a2_dissolve_multiagg",
    "a31_countmin_merge",
    "a32_kmv_distinct",
    "a33_exact_median_2pass",
    "a34_grouped_ols",
    "a3_union_envelope",
    "dd_embedding_nn",
    "ep2_burst_catalog",
    "f4_missing_dates",
    "f_arrow_udf_normalize",
    "f_json_props",
    "f_map_gauntlet",
    "f_recursive_cte_gapfill",
    "frame_lookup",
    "g4_cc_iterative",
    # ---- 50-slot prefix cut line ----
    "j16_asof_tolerance",
    "j2_fact_dim_broadcast",
    "j7_spatial_join",
    "j_spatial_knn",
    "knn_int8_quantized",
    "knn_ivf_int8_funnel",
    # -- r7-evidence remainder: staged to LEAD r14 --
    "knn_ivf_learned_exhaustive",
    "mm_audio_windows",
    "mm_video_framesample",
    "o5_topk_per_group",
    "o6_range_partitioned_sort",
    "p2_filter_isin",
    "p9_spatial_intersect",
    "q1_pricing_summary",
    "s14_zarr_py_writer",
    "s15_schema_evolution",
    "s1_sqlite_roundtrip",
    "stream_kmv_sketch",
    "stream_ohlc_complete",
    "stream_session_counts",
    "stream_zarr_append_sink",
    "t_containment_join",
    "t_containment_survivors",
    "t_paragraph_dedup",
    "t_weighted_sample",
    "u1_unpivot_union",
    "u6_dq_checks",
    "utm_epsg_classify",
    "w15_interval_coalesce",
    "w16_resample_ohlc",
    "w_running_sum",
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
