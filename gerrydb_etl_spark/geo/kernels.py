"""Geometry kernels as Arrow-batched pandas UDFs over WKB columns.

The reference's geometry ops (point construction pl_geo.py:216-220,
centroid pl_localities.py:91, unary_union pl_geo.py:169-171) run
row-at-a-time through shapely. Here each kernel is a pandas UDF
(Arrow batch in, batch out) or an applyInPandas group kernel — the
Python boundary is crossed once per batch, not per row, and the
kernels sit *after* filters/projections so Catalyst pushdown is
never blocked (SURVEY.md §4 'needs custom work' item 2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gerrydb_etl_spark.geo import wkb


@pandas_udf(T.BinaryType())
def _point_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    return pd.Series(
        [wkb.encode_point(x, y) for x, y in zip(lon, lat)], dtype=object
    )


def st_point(lon: Column, lat: Column) -> Column:
    """WKB point from lon/lat doubles (reference pl_geo.py:216-220:
    internal_point from INTPTLON/INTPTLAT)."""
    return _point_udf(lon.cast("double"), lat.cast("double"))


@pandas_udf(T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
]))
def _centroid_udf(geom: pd.Series) -> pd.DataFrame:
    pts = [wkb.centroid(b) for b in geom]
    return pd.DataFrame({"x": [p[0] for p in pts], "y": [p[1] for p in pts]})


def st_centroid(geom: Column) -> Column:
    """Centroid struct (x, y) of a WKB Point/Polygon/MultiPolygon."""
    return _centroid_udf(geom)


@pandas_udf(T.BinaryType())
def _box_udf(cx: pd.Series, cy: pd.Series, half: pd.Series) -> pd.Series:
    import numpy as np

    out = []
    for x, y, h in zip(cx, cy, half):
        ring = np.array(
            [
                [x - h, y - h],
                [x + h, y - h],
                [x + h, y + h],
                [x - h, y + h],
                [x - h, y - h],
            ],
            dtype=np.float64,
        )
        out.append(wkb.encode_polygon([ring]))
    return pd.Series(out, dtype=object)


def st_box(cx: Column, cy: Column, half: Column) -> Column:
    """Axis-aligned square polygon (WKB) centered at (cx, cy) with
    half-width `half` — the synthetic-geometry builder for tests and
    queries (stands in for shapefile parsing, which needs GDAL)."""
    return _box_udf(cx.cast("double"), cy.cast("double"), half.cast("double"))


UNION_SCHEMA = "key string, geometry binary, n_parts int"


def union_by_key(
    df: DataFrame, key: str, geom_col: str, dissolve: bool = False
) -> DataFrame:
    """Geometric union per key via applyInPandas — the reference's
    aiannh group-merge UDAF (pl_geo.py:149-190: R/T rows sharing a
    geoid union their geometries).

    Default (``dissolve=False``) is the disjoint-interiors contract
    the reference pipeline relies on: parts collect into a
    MultiPolygon, and interior overlap RAISES instead of silently
    double-counting area (wkb.union_disjoint's detector).
    ``dissolve=True`` is the general shapely.unary_union semantics
    (pl_geo.py:169-171) for overlapping inputs — shapely behind the
    optional extra, with the dependency-free path still raising on
    overlap it cannot dissolve.

    Scale: one shuffle on the key; each group's WKB blobs meet in one
    Arrow batch. Groups are small by contract (the reference caps
    them at 2 rows — enforce with validate.collision_ceiling)."""
    union = wkb.union_dissolve if dissolve else wkb.union_disjoint

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = list(pdf[geom_col])
        return pd.DataFrame(
            {
                "key": [str(pdf[key].iloc[0])],
                "geometry": [union(blobs)],
                "n_parts": [len(blobs)],
            }
        )

    return (
        df.select(F.col(key), F.col(geom_col))
        .groupBy(key)
        .applyInPandas(merge, schema=UNION_SCHEMA)
    )
