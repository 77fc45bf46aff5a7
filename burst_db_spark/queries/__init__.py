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
# (exactly 50 rows/round, measured r1-r11). Round-12 rotation policy
# (executes VERDICT r11 "Next round" items #1 and #2):
#   1. the 25 round-11 additions — the only rows with NO driver evidence
#      in any CORRECTNESS_r*.json — lead, exactly as staged last round;
#   2. ep1_frame_partition / ep1_minimal_db follow: their brand-new
#      recursive-CTE oracles (plans/ep1_oracle.py, VERDICT #1) must get
#      driver HASH evidence this round — these were the only rows the
#      record could ever render as `err`, now fully checkable;
#   3. w5b_reference_dates_events: its cogroup path gained a broadcast
#      fast path this round (VERDICT #3) — resample under the new plan;
#   4. fill to exactly 50 with the oldest-evidence (r6) block,
#      alphabetical; the 3 that don't fit (w4_run_length, w6_water_year,
#      w7_first_significant_block) are staged directly behind the cut to
#      lead r13 → after CORRECTNESS_r12 min evidence age is r6 for only
#      those 3 rows, r7+ for everything else.
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- the 25 round-11 additions (no driver evidence yet) --
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
    # -- oracle-promoted THIS round (plans/ep1_oracle.py): first-ever
    # hash-checked driver sample --
    "ep1_frame_partition",
    "ep1_minimal_db",
    # -- plan changed THIS round (broadcast fast path, VERDICT #3) --
    "w5b_reference_dates_events",
    # -- fill to 50 with the OLDEST driver evidence (r6 block) --
    "g3_bfs_hops",
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "o1_topk_orders",
    "s2_csv_infer_roundtrip",
    "s3_csv_schema_semicolon",
    "s6_geojson_roundtrip",
    "s7_envelope_roundtrip",
    "skew_salted_count",
    "stream_daily_counts",
    "t_decontaminate",
    "t_fingerprint",
    "t_lang_guess",
    "t_quality_filter",
    "t_quality_score",
    "t_redact_pii",
    "t_split_assign",
    "t_token_stats",
    "t_top_tfidf",
    "u2_reconcile_snapshots",
    "u3_union_all",
    "w1_first_value",
    # ---- 50-slot prefix cut line ----
    # -- round-12 additions + r6-evidence remainder: staged to LEAD r13 --
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
    "w4_run_length",
    "w6_water_year",
    "w7_first_significant_block",
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
