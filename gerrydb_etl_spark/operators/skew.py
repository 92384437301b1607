"""Skew mitigation: salted two-phase aggregation and replicated
salted joins.

When AQE's skew-join splitting applies (sort-merge joins with
runtime stats), prefer it — it is on in session.py. Manual salting
remains the right tool where AQE can't see the skew: holistic
aggregations whose per-key state is huge (collect_list/collect_set
on a hot key), and broadcast-ineligible joins against a skewed key
column. Both techniques below are deterministic (hash-derived salt,
no rand()) so results are reproducible and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(df: DataFrame, salts: int) -> Column:
    """Deterministic per-row salt: hash of all columns mod salts —
    no rand(), so retries/re-runs place rows identically."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salts)).alias(
        "__salt"
    )


def salted_collect_list(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """collect_list per key without funnelling a hot key through one
    task: phase 1 collects per (key, salt) — spreading a hot key over
    `salts` tasks — phase 2 flattens the per-salt lists. The result
    is sorted for determinism (collect order is not guaranteed).
    Output: keys + `values` (sorted array)."""
    phase1 = (
        df.withColumn("__salt", _salt_col(df, salts))
        .groupBy(*keys, "__salt")
        .agg(F.collect_list(value_col).alias("__part"))
    )
    return (
        phase1.groupBy(*keys)
        .agg(F.flatten(F.collect_list("__part")).alias("__all"))
        .select(*keys, F.sort_array(F.col("__all")).alias("values"))
    )


def replicated_skew_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Inner equi-join where `skewed` has hot keys and `other` is
    too big to broadcast: the skewed side gets a deterministic salt
    (spreading each hot key over `salts` shuffle partitions) and the
    other side replicates each row `salts` times, joining on
    (key, salt). Shuffle volume: |skewed| + salts x |other| — worth
    it when a hot key would otherwise pin one task at |hot| x
    |other_matches|."""
    s = skewed.withColumn("__salt", _salt_col(skewed, salts))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = s.join(o, [key, "__salt"])
    return out.drop("__salt")
