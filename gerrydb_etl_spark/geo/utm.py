"""UTM zone + EPSG mapping as pure Catalyst expressions.

The reference calls utm.from_latlon per row just to get the zone
number (pl_localities.py:81-83) — but the zone is plain arithmetic:
floor((lon + 180) / 6) + 1. The zone→EPSG table (pl_localities.py:
96-110) maps CONUS zones 3-20 to NAD83 'epsg:269xx' codes with two
special cases (zone 2 → epsg:6636 American Samoa, zone 55 → epsg:8693
Guam); everything else is NULL for the exhaustiveness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def utm_zone(lon: Column) -> Column:
    """UTM zone number of a longitude in [-180, 180)."""
    return (F.floor((lon + 180.0) / 6.0) + 1).cast("int")


def utm_epsg(zone: Column) -> Column:
    """NAD83 EPSG code per UTM zone (reference pl_localities.py:96-110
    semantics); unmapped zones -> NULL (validation gate input)."""
    return (
        F.when((zone >= 3) & (zone <= 20), F.concat(F.lit("epsg:269"), F.lpad(zone.cast("string"), 2, "0")))
        .when(zone == 2, F.lit("epsg:6636"))
        .when(zone == 55, F.lit("epsg:8693"))
        .otherwise(F.lit(None).cast("string"))
    )
