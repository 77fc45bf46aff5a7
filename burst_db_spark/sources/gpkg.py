"""GeoPackage (GPKG) writer/reader — the reference's primary artifact
format (``build_frame_db.py`` writes frames/bursts into a ``.gpkg``;
K1 in SURVEY.md §2.1), produced here with stdlib sqlite3 + a pure
WKB codec over the repo's WKT kernel. No GDAL/fiona required.

A GeoPackage is a SQLite database with (OGC 12-128r17, public spec):
- ``PRAGMA application_id = 0x47504B47`` ("GPKG");
- ``gpkg_spatial_ref_sys`` / ``gpkg_contents`` / ``gpkg_geometry_columns``
  metadata tables;
- feature tables whose geometry column holds GeoPackageBinary blobs:
  an 8-byte header (magic "GP", version, flags, srs_id) + optional
  envelope + standard WKB.

The writer is a driver-side single-file sink (same contract as
``sinks.write_sqlite`` — a SQLite artifact is single-writer by nature;
rows stream through ``toLocalIterator``, never a full collect). The
reader parses blobs back to WKT and hands Spark a distributed frame.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from burst_db_spark.geo.wkt import parse_wkt, to_wkt

_GPKG_APP_ID = 0x47504B47
_WGS84_DEF = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


# --- WKB codec (polygon / multipolygon, little-endian) ---------------------


def _wkb_ring(ring) -> bytes:
    out = [struct.pack("<I", len(ring))]
    for x, y in ring:
        out.append(struct.pack("<dd", x, y))
    return b"".join(out)


def _wkb_polygon(rings) -> bytes:
    return (
        b"\x01"
        + struct.pack("<II", 3, len(rings))
        + b"".join(_wkb_ring(r) for r in rings)
    )


def wkb_from_wkt(wkt: str) -> bytes:
    """WKT (POLYGON / MULTIPOLYGON) → little-endian WKB."""
    kind, coords = parse_wkt(wkt)
    if kind == "POLYGON":
        return _wkb_polygon(coords[0])
    if kind == "MULTIPOLYGON":
        return (
            b"\x01"
            + struct.pack("<II", 6, len(coords))
            + b"".join(_wkb_polygon(p) for p in coords)
        )
    raise ValueError(f"unsupported WKT type for GPKG: {kind}")


def _read_u32(buf: bytes, off: int, little: bool) -> int:
    return struct.unpack_from("<I" if little else ">I", buf, off)[0]


def _parse_wkb_polygon(buf: bytes, off: int):
    little = buf[off] == 1
    gtype = _read_u32(buf, off + 1, little)
    if gtype != 3:
        raise ValueError(f"expected WKB Polygon, got type {gtype}")
    n_rings = _read_u32(buf, off + 5, little)
    off += 9
    fmt = "<dd" if little else ">dd"
    rings = []
    for _ in range(n_rings):
        n = _read_u32(buf, off, little)
        off += 4
        ring = []
        for _ in range(n):
            x, y = struct.unpack_from(fmt, buf, off)
            ring.append((x, y))
            off += 16
        rings.append(ring)
    return rings, off


def wkt_from_wkb(buf: bytes, off: int = 0) -> str:
    little = buf[off] == 1
    gtype = _read_u32(buf, off + 1, little)
    if gtype == 3:
        rings, _ = _parse_wkb_polygon(buf, off)
        return to_wkt([rings])
    if gtype == 6:
        n = _read_u32(buf, off + 5, little)
        off += 9
        polys = []
        for _ in range(n):
            rings, off = _parse_wkb_polygon(buf, off)
            polys.append(rings)
        return to_wkt(polys, force_multi=True)
    raise ValueError(f"unsupported WKB type {gtype}")


# --- GeoPackageBinary envelope --------------------------------------------


def _envelope(wkt: str) -> tuple[float, float, float, float]:
    _, coords = parse_wkt(wkt)
    xs = [x for poly in coords for ring in poly for x, _ in ring]
    ys = [y for poly in coords for ring in poly for _, y in ring]
    return min(xs), max(xs), min(ys), max(ys)


def gpkg_blob(wkt: str, srs_id: int = 4326) -> bytes:
    """GeoPackageBinary: "GP" magic, version 0, flags (little-endian,
    envelope indicator 1 = [minx,maxx,miny,maxy]), srs_id, envelope,
    WKB."""
    flags = 0b00000011  # envelope=1 (<<1) | byte-order=little (1)
    xmin, xmax, ymin, ymax = _envelope(wkt)
    return (
        b"GP"
        + bytes([0, flags])
        + struct.pack("<i", srs_id)
        + struct.pack("<dddd", xmin, xmax, ymin, ymax)
        + wkb_from_wkt(wkt)
    )


def wkt_from_gpkg_blob(blob: bytes) -> str:
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob")
    flags = blob[3]
    if flags & 0b00010000:
        raise ValueError("empty-geometry GPKG blob")
    env = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
    return wkt_from_wkb(blob, 8 + env_len)


# --- GPKG write / read -----------------------------------------------------


def _init_gpkg(con: sqlite3.Connection) -> None:
    con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
    con.execute("PRAGMA user_version = 10300")
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
           srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
           organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
           definition TEXT NOT NULL, description TEXT)"""
    )
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_DEF, None),
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
        ],
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
           table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
           identifier TEXT UNIQUE, description TEXT DEFAULT '',
           last_change DATETIME NOT NULL DEFAULT
             (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
           min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
           srs_id INTEGER)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
           table_name TEXT NOT NULL, column_name TEXT NOT NULL,
           geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
           z TINYINT NOT NULL, m TINYINT NOT NULL,
           CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )


def write_gpkg(
    df: DataFrame,
    path: str,
    table: str,
    geom_col: str = "geom_wkt",
    properties: Sequence[str] | None = None,
    srs_id: int = 4326,
) -> None:
    """Feature table + full GPKG metadata from a DataFrame with a WKT
    geometry column. Driver-side streaming write (single-file artifact);
    gpkg_contents carries the dataset envelope, as the reference's
    frames/bursts layers do."""
    props = list(properties or [c for c in df.columns if c != geom_col])
    con = sqlite3.connect(path)
    try:
        _init_gpkg(con)
        con.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            "geom BLOB"
            + "".join(f', "{p}"' for p in props)
            + ")"
        )
        bounds = [None, None, None, None]
        rows = df.select(geom_col, *props).toLocalIterator()
        ins = (
            f'INSERT INTO "{table}" (geom'
            + "".join(f', "{p}"' for p in props)
            + f") VALUES (?{', ?' * len(props)})"
        )
        for r in rows:
            wkt = r[0]
            blob = gpkg_blob(wkt, srs_id)
            xmin, xmax, ymin, ymax = _envelope(wkt)
            bounds[0] = xmin if bounds[0] is None else min(bounds[0], xmin)
            bounds[1] = ymin if bounds[1] is None else min(bounds[1], ymin)
            bounds[2] = xmax if bounds[2] is None else max(bounds[2], xmax)
            bounds[3] = ymax if bounds[3] is None else max(bounds[3], ymax)
            con.execute(ins, (blob, *[r[i + 1] for i in range(len(props))]))
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (table, table, bounds[0], bounds[1], bounds[2], bounds[3], srs_id),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?, 'geom', 'MULTIPOLYGON', ?, 0, 0)",
            (table, srs_id),
        )
        con.commit()
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession, path: str, table: str
) -> DataFrame:
    """Feature table → DataFrame with the geometry back as WKT.

    Driver-side blob decode (artifact-scale, like the reference's GPKG
    consumers); parquet remains the native store for corpus-scale
    geometry."""
    con = sqlite3.connect(path)
    try:
        cols = [
            r[1]
            for r in con.execute(f'PRAGMA table_info("{table}")').fetchall()
        ]
        props = [c for c in cols if c not in ("fid", "geom")]
        sel = ", ".join(['"fid"', '"geom"'] + [f'"{p}"' for p in props])
        rows = []
        for r in con.execute(f'SELECT {sel} FROM "{table}" ORDER BY fid'):
            rows.append(
                (
                    r[0],
                    wkt_from_gpkg_blob(r[1]),
                    *[None if v is None else str(v) for v in r[2:]],
                )
            )
    finally:
        con.close()
    schema_cols = ["fid bigint", "geom_wkt string"] + [
        f"{p} string" for p in props
    ]
    return spark.createDataFrame(rows, ", ".join(schema_cols))
