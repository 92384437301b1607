"""Set-versioning query (the GeoSetVersion/GeoSetMember flow,
SURVEY.md §2.10 row 2): nations as sets, customers as members, two
successive observations."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.store.geoset import (
    empty_members,
    empty_set_versions,
    replace_set_versions,
)


@query(
    "set_versioning_double_load",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) AS set_key,
           CAST(2 AS BIGINT) AS valid_from,
           COUNT(*) FILTER (WHERE c_acctbal >= 0) AS n_members
    FROM customer WHERE c_nationkey < 5 GROUP BY 1
    UNION ALL
    SELECT CAST(c_nationkey AS VARCHAR),
           CAST(1 AS BIGINT),
           COUNT(*)
    FROM customer WHERE c_nationkey >= 5 GROUP BY 1
    """,
)
def set_versioning_double_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observe every nation's customer set at v1, then re-observe
    nations 0-4 with only non-negative balances at v2. Open version
    per set: v2 for the re-observed five (deprecate-then-insert,
    pl_geo.py:294-340), v1 for the rest; membership rows are
    append-only, tagged by version_id."""
    cust = load_table(spark, sf_dir, "customer")
    obs1 = cust.select(
        F.col("c_nationkey").cast("string").alias("set_key"),
        F.col("c_custkey").alias("member"),
    )
    obs2 = (
        cust.filter((F.col("c_nationkey") < 5) & (F.col("c_acctbal") >= 0))
        .select(
            F.col("c_nationkey").cast("string").alias("set_key"),
            F.col("c_custkey").alias("member"),
        )
    )
    # nations 0-4 must be re-observed even if no member qualifies:
    # the set list comes from the keys, not the surviving members
    obs2_sets = (
        cust.filter(F.col("c_nationkey") < 5)
        .select(F.col("c_nationkey").cast("string").alias("set_key"))
        .distinct()
    )

    versions, members = replace_set_versions(
        empty_set_versions(spark), empty_members(spark), obs1, version=1
    )
    # second observation: union the (possibly empty) membership with
    # the observed set keys so empty sets still version forward
    obs2_full = obs2_sets.join(obs2, "set_key", "left").select("set_key", "member")
    versions, members = replace_set_versions(versions, members, obs2_full, version=2)

    open_v = versions.filter(F.col("valid_to").isNull())
    counts = members.groupBy("version_id").agg(
        F.count("member").alias("n_members")
    )
    return (
        open_v.join(counts, "version_id", "left")
        .select(
            "set_key",
            "valid_from",
            F.coalesce("n_members", F.lit(0)).alias("n_members"),
        )
    )
