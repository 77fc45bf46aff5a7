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
# (rounds 1-2: exactly the first 50). Round-3 rotation policy:
#   1. everything CHANGED or NEW this round leads (it has no green row
#      for its current implementation);
#   2. then the r1-green families the driver has never re-sampled, so
#      every registered oracle query eventually has a fresh row;
#   3. then one representative per r2-green family;
#   4. rows-only queries (no oracle) and already-double-checked r2 rows
#      sit BEHIND the prefix — a sampled slot spent on a `no_oracle` row
#      is a wasted slot.
# Names not listed keep their module registration order after the
# prefix; unknown names are ignored (lets planned queries pre-register).
_SAMPLING_PRIORITY = (
    # -- changed or new in round 3 --
    "t_pack_sequences",        # oracle HUGEINT cast fix
    "j7_spatial_join",         # grid-cell equi-join rewrite
    "j_spatial_knn",           # grid-cell NN rewrite
    "j12_asof_join",           # struct-payload rewrite; never sampled
    "u2_array_ops",            # never sampled
    "s1_sqlite_roundtrip",     # sink bounds/decimal changes
    "stream_session_counts",   # new oracle this round
    "t_curriculum_buckets",    # range-partitioned rewrite
    "dd_embedding_nn",         # recall retuning
    "a3_union_polygon",        # new boundary-traced union query
    "s8_rangezip_roundtrip",   # new: partial-zip ranged extraction
    "s10_stac_paged",          # new: paged catalog walk
    "t_repetition_stats",      # new: Gopher repetition signals
    "t_stratified_sample",     # new: deterministic corpus mixing
    "s11_zarr_cube",           # new: real zarr store round-trip
    "knn_cosine_ivf_multiprobe",  # new: nprobe=2 IVF search
    "t_decontaminate_bloom",   # new: broadcast-Bloom decontamination
    "mm_bmp_resize",           # new: real BMP encode→decode→resize
    "k7_bucketed_colocated_join",  # new: exchange-free bucketed join
    "mm_frame_sample",         # new: frame-sampling plan query
    "k8_compact_roundtrip",    # new: small-file compaction
    "mm_features",             # changed: promoted rows-only -> oracle
    "dd_embedding_nn_multiprobe",  # new: Hamming-1 probed LSH bands
    "k1_gpkg_roundtrip",       # new: real GeoPackage artifact
    "stream_corpus_dedup",     # new: streaming == batch dedup manifest
    "s11_zarr_coords",         # new: zarr group + coord-value subset
    "t_cap_per_source",        # new: per-domain contribution cap
    "t_temperature_mix",       # new: sqrt temperature rebalancing
    # -- r1-green, never re-sampled --
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
    # -- r2-green representatives --
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
    "f_date_gauntlet",
    "f_math_gauntlet",
    "f_conditional_gauntlet",
    "t_token_stats",
    "t_quality_score",
    "t_lang_guess",
    "t_fingerprint",
    "t_top_tfidf",
    "t_decontaminate",
    "t_quality_filter",
    "t_split_assign",
    "t_redact_pii",
    "mm_wav_roundtrip",
    "stream_daily_counts",
    "dd_exact",
    "dd_minhash_lsh",
    # -- behind the 50-slot prefix: r2-green spares, then rows-only --
    "dd_dedup_clusters",
    "dd_simhash",
    "s2_csv_infer_roundtrip",
    "s3_csv_schema_semicolon",
    "s6_geojson_roundtrip",
    "s7_envelope_roundtrip",
    "dd_ngram_jaccard",
    "dd_corpus_survivors",
    "knn_cosine_brute",
    "knn_cosine_ivf",
    "skew_salted_count",
    "a13_weekly_window",
    "a17_cube",
    "w_rolling_1d",
    "ep1_minimal_db",          # rows-only by design
    "knn_cosine_ivf_learned",  # rows-only by design
)

from burst_db_spark.registry import set_order_prefix as _set_order_prefix  # noqa: E402

_set_order_prefix(_SAMPLING_PRIORITY)
