"""Morton interleave correctness (operators/zorder.py): the Spark
expression must equal a pure-Python bit interleave, and z-locality
must bound tile extents (the property the layout technique sells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.zorder import z_value


def _ref_z(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _ref_z(x, y, 8), (x, y)


def test_z_tiles_are_rectangles(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], ["x", "y"]
    )
    tiles = (
        df.select("x", "y", z_value(F.col("x"), F.col("y"), 6).alias("z"))
        .groupBy(F.shiftright(F.col("z"), 8).alias("tile"))
        .agg(
            (F.max("x") - F.min("x")).alias("w"),
            (F.max("y") - F.min("y")).alias("h"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    # top 4 z-bits fixed -> 16x16 tiles, each fully populated
    assert len(tiles) == 16
    for t in tiles:
        assert t["w"] == 15 and t["h"] == 15 and t["n"] == 256
