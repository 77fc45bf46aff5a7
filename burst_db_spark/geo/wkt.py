"""Minimal WKT codec for POLYGON / MULTIPOLYGON / POINT (lon lat order).

Covers exactly the geometry text the reference reads/writes
(parse_bursts.py:737 WKT export; export_denormalized_db.py:166 WKT→GPKG).
Not a general OGC parser — no Z/M, no EMPTY, no GEOMETRYCOLLECTION.
"""

from __future__ import annotations

Ring = list[tuple[float, float]]
PolygonCoords = list[Ring]  # ring 0 = exterior, rest = holes
MultiPolygonCoords = list[PolygonCoords]


def _parse_ring(text: str) -> Ring:
    pts = []
    for pair in text.split(","):
        xs = pair.split()
        pts.append((float(xs[0]), float(xs[1])))
    return pts


def _strip_one_paren(text: str) -> str:
    """Remove exactly one enclosing balanced paren pair."""
    t = text.strip()
    if t.startswith("(") and t.endswith(")"):
        return t[1:-1]
    return t


def _split_level(text: str) -> list[str]:
    """Split comma-separated groups at the current paren depth, removing
    one paren level from each group."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [_strip_one_paren(p) for p in parts]


def parse_wkt(wkt: str) -> tuple[str, MultiPolygonCoords | tuple[float, float]]:
    """Return (kind, coords): kind ∈ {POINT, POLYGON, MULTIPOLYGON}.

    POLYGON and MULTIPOLYGON both return MultiPolygonCoords (a POLYGON is
    a 1-element multi) so downstream code handles one shape.
    """
    s = wkt.strip()
    head, _, body = s.partition("(")
    kind = head.strip().upper()
    body = body.rsplit(")", 1)[0]
    if kind == "POINT":
        x, y = body.split()
        return kind, (float(x), float(y))
    if kind == "POLYGON":
        rings = [_parse_ring(r) for r in _split_level(body)]
        return kind, [rings]
    if kind == "MULTIPOLYGON":
        polys = []
        for poly_text in _split_level(body):
            rings = [_parse_ring(r) for r in _split_level(poly_text)]
            polys.append(rings)
        return kind, polys
    raise ValueError(f"unsupported WKT kind: {kind!r}")


def _fmt(v: float) -> str:
    return f"{v:.10g}"


def _ring_wkt(ring: Ring) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + ")"


def to_wkt(polys: MultiPolygonCoords, force_multi: bool = False) -> str:
    if len(polys) == 1 and not force_multi:
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in polys[0]) + ")"
    inner = ", ".join(
        "(" + ", ".join(_ring_wkt(r) for r in rings) + ")" for rings in polys
    )
    return "MULTIPOLYGON (" + inner + ")"


def rect_wkt(xmin: float, ymin: float, xmax: float, ymax: float) -> str:
    """Axis-aligned rectangle polygon (closed ring, CCW)."""
    return to_wkt(
        [[[(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]]]
    )
