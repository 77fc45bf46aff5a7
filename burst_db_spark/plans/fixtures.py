"""Deterministic synthetic burst-domain fixtures (FIXTURES.md shapes),
generated Spark-side with ``spark.range`` — no driver loops, scale-free.

Shapes follow /root/reference semantics:
- burst triplets: ogc_fid = 3*(burst_id-1) + {1,2,3} (frames.py:52-54)
- burst_id_jpl = t{track:03d}_{id:06d}_iw{1..3} (build_frame_db.py:37-47)
- tracks 1..175, ASCENDING/DESCENDING per track parity
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def burst_triplets(
    spark: SparkSession, n_triplets: int = 600, n_tracks: int = 12
) -> DataFrame:
    """One row per burst triplet (the dissolve output granularity):
    burst_id, track, orbit_pass, is_land, and a rectangular footprint
    derived deterministically from the id."""
    per_track = n_triplets // n_tracks
    df = spark.range(1, n_triplets + 1).withColumnRenamed("id", "burst_id")
    track = ((F.col("burst_id") - 1) / per_track).cast("int") + 1
    pos = (F.col("burst_id") - 1) % per_track  # position along the track
    # land pattern: two land runs per track with a water gap (exercises
    # run grouping, frames.py:214-260); short runs appear at track edges
    is_land = (
        ((pos >= 3) & (pos <= per_track * 2 // 5))
        | ((pos >= per_track * 3 // 5) & (pos <= per_track - 2))
    ).cast("int")
    lon = (F.col("burst_id") * 7 % 340 - 170).cast("double")
    lat = (pos * 150 / per_track - 75).cast("double")
    return df.select(
        "burst_id",
        track.alias("track"),
        pos.cast("int").alias("pos"),
        F.when(track % 2 == 0, "DESCENDING").otherwise("ASCENDING").alias(
            "orbit_pass"
        ),
        is_land.alias("is_land"),
        lon.alias("lon"),
        lat.alias("lat"),
    )


def burst_id_map(spark: SparkSession, n_triplets: int = 600, n_tracks: int = 12) -> DataFrame:
    """Per-burst rows (3 subswaths per triplet) with JPL ids and footprint
    WKT + snapped integer bbox — the burst_id_map shape (SURVEY §1.2)."""
    trip = burst_triplets(spark, n_triplets, n_tracks)
    sub = spark.range(1, 4).withColumnRenamed("id", "iw")
    df = trip.crossJoin(F.broadcast(sub))
    ogc_fid = (3 * (F.col("burst_id") - 1) + F.col("iw")).cast("long")
    jpl = F.format_string(
        "t%03d_%06d_iw%d", F.col("track"), F.col("burst_id"), F.col("iw")
    )
    xmin = F.col("lon") + (F.col("iw") - 1) * 0.9
    ymin = F.col("lat")
    xmax = xmin + 0.9
    ymax = ymin + 0.2
    wkt = F.format_string(
        "POLYGON ((%.4f %.4f, %.4f %.4f, %.4f %.4f, %.4f %.4f, %.4f %.4f))",
        xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin,
    )
    return df.select(
        ogc_fid.alias("ogc_fid"),
        "burst_id",
        F.col("track").alias("relative_orbit_number"),
        F.concat(F.lit("IW"), F.col("iw")).alias("subswath_name"),
        "orbit_pass",
        jpl.alias("burst_id_jpl"),
        "is_land",
        wkt.alias("geom_wkt"),
        xmin.alias("xmin"),
        ymin.alias("ymin"),
        xmax.alias("xmax"),
        ymax.alias("ymax"),
    )


def acquisitions(
    spark: SparkSession,
    frames: DataFrame,
    n_dates: int = 60,
    cadence_days: int = 12,
    gap_after: int = 30,
    gap_days: int = 900,
) -> DataFrame:
    """Per-frame sensing-time series with a mid-series multi-year gap for
    ~1/3 of frames (exercises sessionization + reference dates)."""
    dates = spark.range(n_dates).withColumnRenamed("id", "k")
    df = frames.select("frame_fid").distinct().crossJoin(dates)
    gap = F.when(
        (F.col("frame_fid") % 3 == 0) & (F.col("k") >= gap_after),
        F.lit(gap_days),
    ).otherwise(F.lit(0))
    ts = F.to_timestamp(F.lit("2016-07-01 00:00:00")) + F.make_interval(
        days=(F.col("k") * cadence_days + gap).cast("int")
    )
    return df.select(
        "frame_fid", ts.alias("sensing_time")
    ).withColumn("sensing_date", F.to_date("sensing_time"))
