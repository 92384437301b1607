"""Property tests for the WKB codec and geometry kernels
(SURVEY.md §5 strategy: union associativity/area, codec round trip)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gerrydb_etl_spark.geo import wkb

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(finite, finite)
@settings(max_examples=50, deadline=None)
def test_point_roundtrip(x, y):
    gtype, (rx, ry) = wkb.decode(wkb.encode_point(x, y))
    assert gtype == wkb.POINT
    assert (rx, ry) == (x, y)  # float64 through the codec is lossless


def _square(cx, cy, h=0.5):
    return np.array(
        [
            [cx - h, cy - h],
            [cx + h, cy - h],
            [cx + h, cy + h],
            [cx - h, cy + h],
            [cx - h, cy - h],
        ]
    )


def test_polygon_roundtrip_and_centroid():
    poly = wkb.encode_polygon([_square(3.0, 4.0)])
    gtype, rings = wkb.decode(poly)
    assert gtype == wkb.POLYGON
    assert np.array_equal(rings[0], _square(3.0, 4.0))
    a, cx, cy = wkb.polygon_area_centroid(rings)
    assert a == pytest.approx(1.0)
    assert (cx, cy) == pytest.approx((3.0, 4.0))


def test_polygon_with_hole_centroid():
    outer = _square(0.0, 0.0, 2.0)  # area 16, ccw
    hole = _square(1.0, 0.0, 0.5)[::-1]  # area -1 (cw), centered (1, 0)
    a, cx, cy = wkb.polygon_area_centroid([outer, hole])
    assert a == pytest.approx(15.0)
    # removing unit mass at x=1 from a 16-mass at x=0: cx = -1/15
    assert cx == pytest.approx(-1.0 / 15.0)
    assert cy == pytest.approx(0.0)


def test_union_disjoint_area_additive():
    squares = [wkb.encode_polygon([_square(float(i) * 2, 0.0)]) for i in range(4)]
    u = wkb.union_disjoint(squares)
    gtype, polys = wkb.decode(u)
    assert gtype == wkb.MULTIPOLYGON
    assert len(polys) == 4
    total = sum(wkb.polygon_area_centroid(r)[0] for r in polys)
    assert total == pytest.approx(4.0)
    # centroid = mean of centers for equal areas
    cx, cy = wkb.centroid(u)
    assert cx == pytest.approx(3.0)
    assert cy == pytest.approx(0.0)


def test_union_flattens_nested_multipolygons():
    a = wkb.encode_polygon([_square(0.0, 0.0)])
    b = wkb.union_disjoint([wkb.encode_polygon([_square(2.0, 0.0)]),
                            wkb.encode_polygon([_square(4.0, 0.0)])])
    u = wkb.union_disjoint([a, b])
    _, polys = wkb.decode(u)
    assert len(polys) == 3


def test_zero_area_centroid_raises():
    degenerate = wkb.encode_polygon([np.array([[0.0, 0.0]] * 4)])
    with pytest.raises(ValueError, match="zero-area"):
        wkb.centroid(degenerate)


def test_union_rejects_points():
    with pytest.raises(ValueError, match="polygonal"):
        wkb.union_disjoint([wkb.encode_point(0.0, 0.0)])


def test_big_endian_rejected():
    buf = bytearray(wkb.encode_point(1.0, 2.0))
    buf[0] = 0  # claim big-endian
    with pytest.raises(ValueError, match="little-endian"):
        wkb.decode(bytes(buf))
