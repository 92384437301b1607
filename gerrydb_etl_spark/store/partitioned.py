"""Hive-partitioned layout: directory pruning for selective reads.

Bucketing (store/bucketing.py) co-locates JOINS; partitioning by a
low-cardinality filter column prunes SCANS: `partitionBy(col)` lays
the table out as one directory per value, and a reader filtering on
that column never lists — let alone reads — the other directories.
At 100 TB with a handful of segments, a segment-filtered query costs
one segment, not one table scan + filter. The two compose (partition
dirs with bucketed files inside) and both pay one write, amortized
over every subsequent read.

The pruning is observable in the plan: the scan shows the predicate
under PartitionFilters (not PushedFilters — it removes directories
at planning/listing time, before any I/O is scheduled), which
tests/test_plan_shapes.py pins.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, name: str, partition_cols: list[str]
) -> str:
    """Write df under the warehouse dir partitioned by the given
    columns; returns the path. Overwrites a previous layout so
    repeated driver/test/bench sessions stay idempotent."""
    spark = df.sparkSession
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    path = os.path.join(wh, name)
    shutil.rmtree(path, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    return path


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
