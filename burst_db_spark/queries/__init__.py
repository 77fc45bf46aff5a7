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
# (exactly 50 rows/round, measured r1-r10). Round-11 rotation policy
# (executes VERDICT r10 "Next round" items #2 and #7 EXACTLY as
# prescribed):
#   1. the 26 rows with NO driver evidence in any CORRECTNESS_r*.json
#      (the r10 new/changed + late additions), plus
#   2. w5_reference_dates and dd_source_overlap_matrix, whose r10
#      rewrites (recursive-CTE oracle promotion / de-quadration)
#      postdate their last driver sample, plus
#   3. dd_simhash — its voting kernel was de-exploded this round, plus
#   4. the 21 oldest (r6-evidence) rows, alphabetical,
#   filling the 50-slot prefix exactly → after CORRECTNESS_r11 every
#   registry row has driver evidence, none of it older than r6, and the
#   remaining r6 block is staged directly behind the cut for r12.
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- the 26 rows with NO driver evidence yet (r10 new/changed +
    # late additions; cumulative CORRECTNESS covers every other row) --
    "dd_source_overlap_exact_audit",
    "t_epoch_shard_shuffle",
    "dd_embedding_nn_incremental",
    "t_interleave_by_weight",
    "stream_minhash_incremental",
    "dd_delete_propagation",
    "w5b_reference_dates_events",
    "dd_snapshot_novelty",
    "t_padding_waste",
    "t_tokenizer_fertility",
    "dd_cluster_incremental",
    "t_winnow_fingerprints",
    "dd_winnow_overlap",
    "mm_image_dhash",
    "mm_image_neardup_pairs",
    "mm_audio_fingerprint",
    "mm_audio_neardup_pairs",
    "t_vocab_coverage",
    "a40_key_skew_report",
    "k8_compaction_plan",
    "mm_blob_byte_stats",
    "w19_event_transitions",
    "j19_join_cardinality_estimate",
    "f_pipe_syntax",
    "dd_winnow_clusters",
    "dd_simhash_neardup",
    # -- the 2 rows whose r10 rewrite postdates their last sample --
    "w5_reference_dates",       # promoted to recursive-CTE oracle in r10
    "dd_source_overlap_matrix",  # de-quadrated in r10
    # -- NEW this round --
    "t_span_scrub",
    # -- changed THIS round (de-exploded voting) --
    "dd_simhash",
    # -- fill to 50 with the OLDEST driver evidence (r6 block),
    # freshness floor: after r11, min evidence round >= r7 trajectory --
    "a10_multi_minmax",
    "a11_named_agg_pct",
    "a15_summary_stats",
    "a16_percentiles",
    "a17_cube",
    "a5_string_agg_distinct",
    "a8_first_seen",
    "a9_count_per_day",
    "dd_corpus_survivors",
    "dd_dedup_clusters",
    "dd_exact",
    "dd_minhash_lsh",
    "dd_ngram_jaccard",
    "ep1_frame_partition",
    "ep1_minimal_db",
    "f_conditional_gauntlet",
    "f_date_gauntlet",
    "f_math_gauntlet",
    "f_regex_extract",
    "f_variant_props",
    # ---- 50-slot prefix cut line ----
    # -- round-12 additions: staged to LEAD the r12 rotation --
    "t_dsir_importance",
    "t_cluster_safe_splits",
    "t_rrf_hybrid_search",
    "dd_hard_negatives",
    "w20_mean_shift_changepoint",
    "dd_ppjoin_positional",
    "t_dsir_bucket_audit",
    "t_select_curate_pipeline",
    "t_dsir_gumbel_sample",
    "mm_scene_cuts",
    "stream_mean_shift",
    "t_unimax_allocation",
    "a42_psi_drift",
    "dd_cluster_best_survivor",
    "t_pipeline_provenance",
    "knn_matryoshka_funnel",
    "a43_bootstrap_ci",
    "t_zipf_slope",
    "t_heaps_law",
    "t_pmi_collocations",
    "a44_ks_drift",
    "t_renyi_diversity",
    "t_mmr_rerank",
    "a45_mann_whitney",
    "t_good_turing",
    # -- then the remaining r6 block, oldest evidence first --
    "g3_bfs_hops",
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "o1_topk_orders",
    "s2_csv_infer_roundtrip",
    "s3_csv_schema_semicolon",
    "s6_geojson_roundtrip",
    "s7_envelope_roundtrip",
    "skew_salted_count",
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
