"""Driver-exposure contract guards (__spark_entry__.py): the round
driver samples a ~50-query prefix of queries(), so ordering IS
correctness visibility. These tests fail fast if a refactor breaks
the prefix the next CORRECTNESS round depends on."""

from __future__ import annotations

import __spark_entry__ as entry

# the 16 queries never sampled by the driver through round 3
# (VERDICT r3 item 1) — they must stay at the head of the window
NEVER_SAMPLED_R3 = [
    "scd2_double_load",
    "scd2_idempotent_reload",
    "scd2_current_view",
    "validation_type_violations",
    "validation_count_reconciliation",
    "validation_collision_ceiling",
    "validation_cross_row_consistency",
    "eav_long_table",
    "eav_pivot_roundtrip",
    "alias_resolution_join",
    "locality_hierarchy_paths",
    "census_header_schema",
    "rename_normalizations",
    "format_roundtrip_json_csv",
    "dim_upsert_if_absent",
    "classifier_trailing_char",
]


def test_priority_names_all_registered():
    # _ordered_registry raises on unknown names; calling queries()
    # exercises it
    qs = entry.queries()
    assert len(qs) >= 100


def test_never_sampled_set_leads_the_window():
    window = list(entry.queries())[:50]
    missing = [n for n in NEVER_SAMPLED_R3 if n not in window]
    assert not missing, f"critical never-sampled queries fell out: {missing}"


def test_oracles_cover_registry():
    qs, osql = entry.queries(), entry.oracle_sql()
    rows_only = set(qs) - set(osql)
    # the only rows-only entries are production plans of approximate
    # operators whose outputs are not SQL-expressible; each has an
    # oracle-checked *_verify twin
    assert rows_only == {
        "simhash_near_dup",
        "ann_cosine_topk",
        "ivf_cosine_topk",
        "embedding_neardup",
    }
    for name in rows_only:
        assert any(v.startswith(name.split("_")[0]) and v.endswith("_verify") for v in qs), name
