"""SCD-2 *set* versioning: deprecate-then-insert for versioned
membership sets (the reference's GeoSetVersion/GeoSetMember flow,
pl_geo.py:294-340: deprecate all current set versions for a
(layer, locality), insert a fresh version row, then bulk-insert its
membership rows).

Unlike row-level scd2_merge (which diffs values per key), set
versioning replaces the WHOLE membership of a set atomically: the
new version is created even if membership is unchanged — matching
the reference, where a re-import is a new observation of the set.

Scale: versions is a dimension (rows = sets x loads, tiny);
members is fact-sized but append-only — each load appends one
membership batch tagged by version_id, never rewriting old ones.
The deprecate step touches only the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERSION_COLS = ("set_key", "version_id", "valid_from", "valid_to")


def version_id(set_key_col, version: int):
    """Deterministic version id: '<set_key>@<version>' — stable
    across re-runs (no uuids), joinable, and humanly debuggable."""
    return F.concat(set_key_col.cast("string"), F.lit("@"), F.lit(str(version)))


def empty_set_versions(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "set_key string, version_id string, valid_from long, valid_to long"
    )


def empty_members(spark) -> DataFrame:
    return spark.createDataFrame([], "version_id string, member string")


def replace_set_versions(
    versions: DataFrame,
    members: DataFrame,
    new_membership: DataFrame,
    version: int,
) -> tuple[DataFrame, DataFrame]:
    """Load a new observation of one or more sets.

    new_membership: (set_key, member) rows — the full membership of
    each set being re-observed. Returns (versions', members'):
    open version rows for the incoming set keys get valid_to =
    version; one fresh version row per incoming set key opens at
    `version`; membership rows append tagged with the new
    version_id. Sets not mentioned are untouched.
    """
    inc_sets = new_membership.select("set_key").distinct()

    hit = inc_sets.withColumn("__hit", F.lit(1))
    closed = (
        versions.join(hit, "set_key", "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("valid_to").isNull() & (F.col("__hit") == 1), F.lit(version).cast("long")
            ).otherwise(F.col("valid_to")),
        )
        .drop("__hit")
    )
    fresh = inc_sets.select(
        "set_key",
        version_id(F.col("set_key"), version).alias("version_id"),
        F.lit(version).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    # NULL members mean "observe this set with no members" (they
    # still contribute the set_key above) — they must not become
    # phantom membership FACT rows
    new_members = new_membership.filter(F.col("member").isNotNull()).select(
        version_id(F.col("set_key"), version).alias("version_id"),
        F.col("member").cast("string").alias("member"),
    )
    return closed.unionByName(fresh), members.unionByName(new_members)


def current_membership(versions: DataFrame, members: DataFrame) -> DataFrame:
    """Members of every set's open version: (set_key, member)."""
    open_versions = versions.filter(F.col("valid_to").isNull()).select(
        "set_key", "version_id"
    )
    return open_versions.join(members, "version_id").select("set_key", "member")
