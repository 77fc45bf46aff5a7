"""EP3 — interactive frame queries (query_frame_db.py; SURVEY.md §3 EP3).

``lookup``: one frame's full record (member burst ids as a sorted list,
bbox, flags) — the J1+A5+A7 join-agg.
``intersect``: frames whose footprint intersects a probe geometry — the
two-phase bbox-then-exact filter (geo kernel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from burst_db_spark.geo.udfs import two_phase_intersect_filter


def lookup(frames: DataFrame, bridge: DataFrame, frame_fid: int) -> DataFrame:
    """Frame record + ordered member burst list
    (query_frame_db.py:34-58: 3-way join, GROUP_CONCAT, bbox agg)."""
    member = bridge.where(F.col("frame_fid") == frame_fid)
    ids = member.groupBy("frame_fid").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("burst_id"))).alias(
            "burst_ids"
        ),
        F.count("*").alias("n_bursts"),
    )
    return frames.where(F.col("frame_fid") == frame_fid).join(ids, "frame_fid")


def intersect(frames_with_geom: DataFrame, probe_wkt: str) -> DataFrame:
    """Frames intersecting the probe geometry (query_frame_db.py:86-129):
    bbox prefilter on the snapped bbox columns (parquet min/max pruning at
    scale) then exact Intersects refine."""
    return two_phase_intersect_filter(frames_with_geom, probe_wkt)
