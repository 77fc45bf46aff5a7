from __future__ import annotations

import json

from burst_db_spark.sources import geojson as gj


def test_geojson_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
         (2, "MULTIPOLYGON (((5 5, 6 5, 6 6, 5 5)), ((8 8, 9 8, 9 9, 8 8)))")],
        "fid int, geom_wkt string",
    )
    path = str(tmp_path / "frames.geojson")
    gj.write_geojson(df, path, properties=["fid"])
    doc = json.loads(open(path).read())
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 2
    types = {f["geometry"]["type"] for f in doc["features"]}
    assert types == {"Polygon", "MultiPolygon"}

    back = gj.read_geojson(spark, path)
    rows = {r.fid: r.geom_wkt for r in back.collect()}
    assert rows[1].startswith("POLYGON")
    assert rows[2].startswith("MULTIPOLYGON")


def test_geojson_simplify(spark, tmp_path):
    # collinear midpoint dropped by the simplify UDF before export
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 5 0.001, 10 0, 10 10, 0 10, 0 0))")],
        "fid int, geom_wkt string",
    )
    path = str(tmp_path / "simplified.geojson")
    gj.write_geojson(df, path, properties=["fid"], simplify_tolerance=0.1)
    doc = json.loads(open(path).read())
    ring = doc["features"][0]["geometry"]["coordinates"][0]
    assert len(ring) == 5
