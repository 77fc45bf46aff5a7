"""K4/S6 — GeoJSON FeatureCollection export + read.

The reference shells out to ogr2ogr with st_simplify
(create_2d_geojsons.py:48-90); here the simplify runs as a pandas UDF and
the features serialize with ``to_json`` — fully distributed until the
single-artifact assemble (GeoJSON is one bounded document by definition).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from burst_db_spark.geo.udfs import simplify_udf
from burst_db_spark.geo.wkt import parse_wkt


def _wkt_to_geojson_geom(wkt: str) -> dict:
    kind, coords = parse_wkt(wkt)
    if kind == "POINT":
        return {"type": "Point", "coordinates": list(coords)}
    rings = [
        [[list(pt) for pt in ring] for ring in poly] for poly in coords
    ]
    if kind == "POLYGON":
        return {"type": "Polygon", "coordinates": rings[0]}
    return {"type": "MultiPolygon", "coordinates": rings}


def feature_collection(
    df: DataFrame,
    wkt_col: str = "geom_wkt",
    properties: Sequence[str] = (),
    simplify_tolerance: float | None = None,
) -> str:
    """Assemble a GeoJSON FeatureCollection string; geometry optionally
    simplified (st_simplify analog) executor-side before collection."""
    if simplify_tolerance is not None:
        df = df.withColumn(wkt_col, simplify_udf(simplify_tolerance)(F.col(wkt_col)))
    cols = [wkt_col, *properties]
    feats = []
    for row in df.select(*cols).toLocalIterator():
        feats.append(
            {
                "type": "Feature",
                "geometry": _wkt_to_geojson_geom(row[wkt_col]),
                "properties": {p: row[p] for p in properties},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def write_geojson(
    df: DataFrame,
    path: str,
    wkt_col: str = "geom_wkt",
    properties: Sequence[str] = (),
    simplify_tolerance: float | None = None,
) -> None:
    with open(path, "w") as f:
        f.write(feature_collection(df, wkt_col, properties, simplify_tolerance))


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """S6: GeoJSON → (geom_wkt, properties...) long form."""
    from burst_db_spark.geo.wkt import to_wkt

    with open(path) as f:
        doc = json.load(f)
    rows = []
    for feat in doc.get("features", []):
        geom = feat["geometry"]
        if geom["type"] == "Polygon":
            coords = [[[tuple(pt) for pt in ring] for ring in geom["coordinates"]]]
        elif geom["type"] == "MultiPolygon":
            coords = [
                [[tuple(pt) for pt in ring] for ring in poly]
                for poly in geom["coordinates"]
            ]
        else:
            continue
        rows.append({"geom_wkt": to_wkt(coords), **feat.get("properties", {})})
    return spark.createDataFrame(rows)
