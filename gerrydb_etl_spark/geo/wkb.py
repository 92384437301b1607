"""Minimal WKB (well-known binary) codec: Point, Polygon,
MultiPolygon — little-endian, 2-D.

WKB is the reference's geometry storage contract (`shapely.wkb.dumps`
at pl_geo.py:244-245); shapely is not available in this environment,
so the codec is hand-rolled from the public OGC spec. Only the three
shapes the pipelines ship are supported; anything else raises.

Layout (little endian): 1 byte order, uint32 geom type
(1=Point, 3=Polygon, 6=MultiPolygon), then coordinates:
  Point:        x, y float64
  Polygon:      n_rings, then per ring n_points + points
  MultiPolygon: n_polys, then each polygon as a full WKB geometry
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
POLYGON = 3
MULTIPOLYGON = 6

_LE = "<"


def encode_point(x: float, y: float) -> bytes:
    return struct.pack(f"{_LE}BIdd", 1, POINT, x, y)


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings: list of (n, 2) float64 arrays, closed (first == last)."""
    out = [struct.pack(f"{_LE}BII", 1, POLYGON, len(rings))]
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)
        out.append(struct.pack(f"{_LE}I", len(arr)))
        out.append(arr.tobytes())
    return b"".join(out)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack(f"{_LE}BII", 1, MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(encode_polygon(rings))
    return b"".join(out)


def _read_header(buf: bytes, off: int) -> tuple[int, int]:
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from(f"{_LE}I", buf, off + 1)
    return gtype, off + 5


def _decode_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (n_rings,) = struct.unpack_from(f"{_LE}I", buf, off)
    off += 4
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from(f"{_LE}I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype=np.float64, count=n_pts * 2, offset=off)
        rings.append(arr.reshape(n_pts, 2).copy())
        off += n_pts * 16
    return rings, off


def decode(buf: bytes) -> tuple[int, object]:
    """Decode WKB -> (geom_type, payload):
    POINT -> (x, y); POLYGON -> [rings]; MULTIPOLYGON -> [[rings]]."""
    gtype, off = _read_header(buf, 0)
    if gtype == POINT:
        x, y = struct.unpack_from(f"{_LE}dd", buf, off)
        return POINT, (x, y)
    if gtype == POLYGON:
        rings, _ = _decode_polygon_body(buf, off)
        return POLYGON, rings
    if gtype == MULTIPOLYGON:
        (n,) = struct.unpack_from(f"{_LE}I", buf, off)
        off += 4
        polys = []
        for _ in range(n):
            sub_type, off2 = _read_header(buf, off)
            if sub_type != POLYGON:
                raise ValueError("MultiPolygon member is not a Polygon")
            rings, off = _decode_polygon_body(buf, off2)
            polys.append(rings)
        return MULTIPOLYGON, polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygon_area_centroid(rings: list[np.ndarray]) -> tuple[float, float, float]:
    """Signed shoelace area + centroid of a polygon (holes = rings
    with opposite winding subtract naturally). Returns (area, cx, cy)."""
    total_a = 0.0
    sx = 0.0
    sy = 0.0
    for ring in rings:
        x, y = ring[:, 0], ring[:, 1]
        cross = x[:-1] * y[1:] - x[1:] * y[:-1]
        a2 = cross.sum()  # 2 * signed area
        total_a += a2 / 2.0
        sx += ((x[:-1] + x[1:]) * cross).sum() / 6.0
        sy += ((y[:-1] + y[1:]) * cross).sum() / 6.0
    if total_a == 0.0:
        raise ValueError("zero-area polygon has no centroid")
    return total_a, sx / total_a, sy / total_a


def centroid(buf: bytes) -> tuple[float, float]:
    """Centroid of a Point / Polygon / MultiPolygon WKB."""
    gtype, payload = decode(buf)
    if gtype == POINT:
        return payload
    if gtype == POLYGON:
        _, cx, cy = polygon_area_centroid(payload)
        return cx, cy
    # MultiPolygon: area-weighted combination of member centroids
    total = 0.0
    sx = 0.0
    sy = 0.0
    for rings in payload:
        a, cx, cy = polygon_area_centroid(rings)
        total += a
        sx += cx * a
        sy += cy * a
    if total == 0.0:
        raise ValueError("zero-area multipolygon has no centroid")
    return sx / total, sy / total


def union_disjoint(wkbs: list[bytes]) -> bytes:
    """Union of polygons with disjoint interiors = the MultiPolygon
    of all their parts. This is exactly the reference's aiannh
    reservation/trust merge (pl_geo.py:169-171): the R and T parts
    of one unit are disjoint regions whose union is their
    collection. A general overlapping-polygon union needs a real
    geometry engine — out of scope by design, and asserted against
    accidental misuse nowhere (inputs here are disjoint by
    construction)."""
    polys: list[list[np.ndarray]] = []
    for buf in wkbs:
        gtype, payload = decode(buf)
        if gtype == POLYGON:
            polys.append(payload)
        elif gtype == MULTIPOLYGON:
            polys.extend(payload)
        else:
            raise ValueError("union_disjoint expects polygonal geometries")
    return encode_multipolygon(polys)
