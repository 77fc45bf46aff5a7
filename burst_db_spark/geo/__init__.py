"""Geo kernel: the only non-stock layer (SURVEY.md §7.1d).

shapely is not available in this image, so the kernel is pure Python /
numpy: a minimal WKT codec, planar predicates (point-in-polygon,
segment/polygon intersection), envelope/centroid/area, Douglas-Peucker
simplify — wrapped in Arrow-batched pandas UDFs for Spark, plus pure
Column bbox math (the scale path: bbox predicates push into parquet
row-group pruning; the exact UDF only refines survivors, mirroring the
reference's R-tree-then-Intersects two-phase filter,
query_frame_db.py:86-121).
"""

from burst_db_spark.geo.bbox import (  # noqa: F401
    bbox_intersects_expr,
    snap_bbox_exprs,
)
from burst_db_spark.geo.predicates import (  # noqa: F401
    Polygon,
    point_in_polygon,
    polygons_intersect,
)
from burst_db_spark.geo.wkt import parse_wkt, to_wkt  # noqa: F401
