"""Partitioning utilities shared by the compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input up to cluster
    parallelism when its scan yields fewer partitions.

    Compute-heavy narrow maps (regex tokenization, shingle explosion,
    signature hashing, fold-based cosine scoring) inherit the SCAN's
    partitioning: a corpus packed into one small parquet file runs
    them on ONE task regardless of cluster size. The gate reads the
    actual scan partition count, so at production scale — where the
    scan already yields more partitions than cores — this is a no-op
    and no extra shuffle of the corpus exists; at small scale it
    moves only the raw (id, payload) rows once, before any expansion.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
