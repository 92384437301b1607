"""Bucketed tables: co-located storage for shuffle-free joins.

The single biggest cost of fact-fact joins at 100 TB is the shuffle
of both sides on the join key. Bucketing pre-partitions the stored
table by hash(key) into a fixed bucket count, so a join between two
tables bucketed on the same key with the same count needs ZERO
exchanges — Catalyst plans a SortMergeJoin directly over matching
buckets (verified by plan assertion in tests/test_bucketing.py).

This is the storage-level answer to the brief's 'pre-partitioning /
bucketing for co-located joins'; the write costs one shuffle once,
amortized over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table.
    Sorting within buckets lets SortMergeJoin skip its sort step."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (plan-shape
    assertion helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
