"""Greenland EPSG override (build_frame_db.py get_epsg_codes tail:
"Set all Greenland frames to EPSG:3413" via get_greenland_shape +
get_intersect_indicator).

The reference loads a packaged USGS shapefile; no such data ships here,
so the RULE is implemented against a coarse hand-digitized outline
(~15 vertices from public geography). The outline deliberately hugs the
coast from the OUTSIDE (a frame touching Greenland must hit it) while
staying clear of Iceland, Svalbard, and the Canadian archipelago; swap
``GREENLAND_WKT`` for the real shape's WKT in production and nothing
else changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lon lat pairs, counter-clockwise around the island, closed ring
GREENLAND_WKT = (
    "POLYGON (("
    "-48 59.5, -42 59, -40 62, -31 65.5, -24 69.5, -21 70, "
    "-17 74.5, -11 80.5, -16 84, -33 84.2, -47 83, -62 82.5, "
    "-69 80.5, -73 78.5, -68 76, -59 74.5, -55 69, -52 63, -48 59.5"
    "))"
)

NORTH_EPSG = 3413


def greenland_bbox() -> tuple[float, float, float, float]:
    from burst_db_spark.geo.predicates import envelope

    return envelope(GREENLAND_WKT)


def greenland_override_expr(
    geom_wkt: Column,
    xmin: Column,
    ymin: Column,
    xmax: Column,
    ymax: Column,
    epsg: Column,
) -> Column:
    """EPSG with the Greenland rule applied: frames whose footprint
    intersects the Greenland shape become 3413. Two-phase like every
    spatial filter here — a pure-column bbox prefilter gates the
    Arrow-batched intersects UDF so only candidates near Greenland pay
    the geometry test."""
    from burst_db_spark.geo.udfs import intersects_udf

    gx0, gy0, gx1, gy1 = greenland_bbox()
    near = (
        (xmin <= F.lit(gx1))
        & (xmax >= F.lit(gx0))
        & (ymin <= F.lit(gy1))
        & (ymax >= F.lit(gy0))
    )
    hit = F.when(near, intersects_udf(GREENLAND_WKT)(geom_wkt)).otherwise(
        F.lit(False)
    )
    return F.when(hit, F.lit(NORTH_EPSG)).otherwise(epsg).cast("int")
