"""EP2 — `opera-db make-burst-catalog` composed from the operator
library over the domain fixtures (SURVEY.md §3 EP2;
create_cslc_burst_catalog.py:355-395).

The reference's CSV-spill middle section (thread_map per frame → per-frame
CSVs → duckdb glob re-scan, :237-283) disappears entirely: applyInPandas
and plain aggregations keep everything in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burst_db_spark.operators.filters import anti_join_intervals


def consistent_burst_catalog(
    acquisitions: DataFrame,
    frames: DataFrame,
    blackouts: DataFrame | None = None,
    key: str = "frame_fid",
    ts_col: str = "sensing_time",
) -> DataFrame:
    """The consistency engine: per-(frame, date) earliest acquisition,
    floored to the second, restricted to selected frames, minus blackout
    windows. Returns (frame_fid, sensing_date, first_time)."""
    joined = acquisitions.join(
        F.broadcast(frames.select(key)), key
    )
    per_day = joined.groupBy(key, F.to_date(ts_col).alias("sensing_date")).agg(
        F.date_trunc("second", F.min(ts_col)).alias("first_time")
    )
    if blackouts is not None:
        per_day = anti_join_intervals(
            per_day, blackouts, key, "first_time"
        )
    return per_day


def catalog_document(
    catalog: DataFrame,
    bridge: DataFrame,
    key: str = "frame_fid",
) -> DataFrame:
    """The consistent-burst-ids document rows
    (create_cslc_burst_catalog.py:319-334): per frame, the sorted burst
    id list and the sorted sensing time list — the long-form equivalent
    of the {frame_id: {burst_id_list, sensing_time_list}} JSON; feed to
    sources.json_docs.write_envelope for the artifact."""
    bursts = bridge.groupBy(key).agg(
        F.sort_array(F.collect_list("burst_id")).alias("burst_id_list")
    )
    times = catalog.groupBy(key).agg(
        F.sort_array(
            F.collect_list(F.date_format("first_time", "yyyy-MM-dd'T'HH:mm:ss"))
        ).alias("sensing_time_list")
    )
    return bursts.join(times, key)
