"""Golden end-to-end pipeline test (SURVEY.md §5 strategy 4): one
miniature load through the full stack — config render → projection →
validation gates → EAV melt → SCD-2 merge → write-audit-publish →
current-view snapshot — the Spark re-expression of the reference's
pl_geo/pl_pop_tables load lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.validate import (
    ValidationError,
    collision_ceiling,
    fail_if_nonempty,
    strict_cast_violations,
)
from gerrydb_etl_spark.plans.config import apply_config, render_config
from gerrydb_etl_spark.sources.census_levels import level_query
from gerrydb_etl_spark.sources.formats import census_rows_to_df
from gerrydb_etl_spark.store.eav import melt_to_eav, pivot_from_eav
from gerrydb_etl_spark.store.scd2 import (
    assert_version_invariants,
    current_view,
    empty_versioned,
    scd2_merge,
)
from gerrydb_etl_spark.store.wap import VersionedTable

CONFIG = """
source_url: "census://{{ year }}/pl"
columns:
  - source: geo_id
    target: geo_path
    type: str
    kind: identifier
  - source: p1_001n
    target: total_pop
    type: int
    kind: count
"""

RESPONSE_V1 = [
    ["GEO_ID", "P1_001N", "STATE", "COUNTY"],
    ["g001", "1000", "01", "001"],
    ["g002", "2500", "01", "003"],
    ["g003", "140", "01", "005"],
]
# re-release: g002 revised, g004 appears
RESPONSE_V2 = [
    ["GEO_ID", "P1_001N", "STATE", "COUNTY"],
    ["g001", "1000", "01", "001"],
    ["g002", "2600", "01", "003"],
    ["g004", "75", "01", "007"],
]


def _load(spark, response, state, version, table: VersionedTable):
    # 1. source: Census shape, header -> schema (+ the level predicate
    #    builder would have formed the request)
    params, id_cols = level_query("county", "01")
    assert params["for"] == "county:*"
    df = census_rows_to_df(spark, response)

    # 2. validation gates BEFORE load (correct db.py:87-117 semantics)
    fail_if_nonempty(
        strict_cast_violations(df, ["geo_id"], {"p1_001n": "int"}),
        "untyped census values",
    )
    fail_if_nonempty(collision_ceiling(df, ["geo_id"], ceiling=1), "dup geo ids")

    # 3. config-driven projection + casts
    cfg = render_config(CONFIG, year="2020")
    projected = apply_config(df, cfg)

    # 4. wide -> EAV long
    long_df = melt_to_eav(projected, ["geo_path"], {"total_pop": "int"})

    # 5. SCD-2 merge into current state
    current = state if state is not None else empty_versioned(long_df)
    merged = scd2_merge(current, long_df, ["geo_path", "col_path"], version=version)

    # 6. write-audit-publish with the version invariants as the audit
    table.write(
        merged,
        audits=[
            lambda staged: assert_version_invariants(staged, ["geo_path", "col_path"])
        ],
        notes=f"census county load v{version}",
    )
    return table.read()


def test_golden_end_to_end(spark, tmp_path):
    table = VersionedTable(spark, str(tmp_path / "column_values"))

    state1 = _load(spark, RESPONSE_V1, None, 1, table)
    cur1 = {
        (r.geo_path, r.val_int)
        for r in current_view(state1).select("geo_path", "val_int").collect()
    }
    assert cur1 == {("g001", 1000), ("g002", 2500), ("g003", 140)}

    state2 = _load(spark, RESPONSE_V2, state1, 2, table)
    cur2 = {
        (r.geo_path, r.val_int)
        for r in current_view(state2).select("geo_path", "val_int").collect()
    }
    # g001 unchanged (still v1 row), g002 revised, g003 untouched
    # (absent from v2 response -> stays current), g004 new
    assert cur2 == {("g001", 1000), ("g002", 2600), ("g003", 140), ("g004", 75)}

    # version history: g002 has a closed v1 row and an open v2 row
    hist = {
        (r.valid_from, r.valid_to, r.val_int)
        for r in state2.filter(F.col("geo_path") == "g002").collect()
    }
    assert hist == {(1, 2, 2500), (2, None, 2600)}

    # g001's unchanged re-load did NOT stack a version (idempotence)
    assert state2.filter(F.col("geo_path") == "g001").count() == 1

    # provenance meta from the publish
    meta = table.meta()
    assert meta["notes"] == "census county load v2"
    assert meta["rows"] == state2.count()

    # the pivot view restores the wide shape from the EAV store
    wide = pivot_from_eav(
        current_view(state2).select("geo_path", "col_path", "val_int", "val_float", "val_str", "val_bool"),
        ["geo_path"],
        {"total_pop": "int"},
    )
    assert {(r.geo_path, r.total_pop) for r in wide.collect()} == cur2


def test_pipeline_rejects_bad_census_payload(spark, tmp_path):
    table = VersionedTable(spark, str(tmp_path / "t"))
    bad = [
        ["GEO_ID", "P1_001N", "STATE", "COUNTY"],
        ["g001", "not-a-number", "01", "001"],
    ]
    with pytest.raises(ValidationError, match="untyped census values"):
        _load(spark, bad, None, 1, table)
    assert table.current_version() is None  # nothing published


def test_level_query_dispatch():
    params, ids = level_query("block", "02")
    assert params == {"for": "block:*", "in": "state:02 county:*"}
    assert ids == ("state", "county", "tract", "block")
    with pytest.raises(KeyError, match="unknown level"):
        level_query("galaxy", "01")
