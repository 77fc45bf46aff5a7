"""Bounding-box math as pure Column expressions — the scale path.

The reference carries snapped integer bboxes next to every geometry
(build_frame_db.py:409-450,465-469) precisely so queries can prune before
touching geometry. We do the same: bbox columns live in the table, bbox
predicates are plain comparisons (pushed into parquet row-group pruning /
min-max stats), and the exact geometry UDF only sees survivors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_intersects_expr(
    xmin_a: Column, ymin_a: Column, xmax_a: Column, ymax_a: Column,
    xmin_b: Column, ymin_b: Column, xmax_b: Column, ymax_b: Column,
) -> Column:
    """Closed-interval bbox overlap (MBR Intersects)."""
    return (
        (xmin_a <= xmax_b)
        & (xmax_a >= xmin_b)
        & (ymin_a <= ymax_b)
        & (ymax_a >= ymin_b)
    )


def snap_bbox_exprs(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column,
    snap: float = 30.0, margin: float = 5000.0,
) -> list[Column]:
    """Margin-padded, grid-snapped integer bbox
    (build_frame_db.py:439-444: FLOOR((x-margin)/snap)*snap etc.)."""
    return [
        (F.floor((xmin - margin) / snap) * snap).cast("int").alias("xmin"),
        (F.floor((ymin - margin) / snap) * snap).cast("int").alias("ymin"),
        (F.ceil((xmax + margin) / snap) * snap).cast("int").alias("xmax"),
        (F.ceil((ymax + margin) / snap) * snap).cast("int").alias("ymax"),
    ]


def utm_zone_expr(lon: Column, lat: Column) -> Column:
    """UTM zone number with the Norway (32V) and Svalbard (31X/33X/35X/
    37X) exceptions — ``utm.from_latlon`` zone semantics
    (build_frame_db.py:193-206 cites the same oddities), pure column math.
    """
    std = F.least(
        F.greatest(F.floor((lon + 180.0) / 6.0).cast("int") + 1, F.lit(1)),
        F.lit(60),
    )
    sval = (lat >= 72.0) & (lat <= 84.0)
    return (
        F.when(
            (lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0),
            F.lit(32),
        )
        .when(sval & (lon >= 0.0) & (lon < 9.0), F.lit(31))
        .when(sval & (lon >= 9.0) & (lon < 21.0), F.lit(33))
        .when(sval & (lon >= 21.0) & (lon < 33.0), F.lit(35))
        .when(sval & (lon >= 33.0) & (lon < 42.0), F.lit(37))
        .otherwise(std)
        .cast("int")
    )


def utm_epsg_expr(lon: Column, lat: Column) -> Column:
    """EPSG classification from lon/lat, pure column math
    (build_frame_db.py:27-32 polar thresholds; :222-249 UTM zone):
    lat > 75 → 3413 (polar north), lat < -60 → 3031 (polar south),
    else 326xx/327xx with zone from ``utm_zone_expr`` (incl. the
    Norway/Svalbard exception cells).
    """
    zone = utm_zone_expr(lon, lat)
    return (
        F.when(lat > 75.0, F.lit(3413))
        .when(lat < -60.0, F.lit(3031))
        .when(lat >= 0.0, F.lit(32600) + zone)
        .otherwise(F.lit(32700) + zone)
        .cast("int")
    )
