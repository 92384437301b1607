"""WKB geometry kernels (pure numpy/struct — no shapely in this
environment) + UTM/EPSG expressions."""

from gerrydb_etl_spark.geo.kernels import st_centroid, st_point, union_by_key
from gerrydb_etl_spark.geo.utm import utm_epsg, utm_zone

__all__ = ["st_point", "st_centroid", "union_by_key", "utm_zone", "utm_epsg"]
