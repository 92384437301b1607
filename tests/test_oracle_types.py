"""Oracle output-type gate.

The driver compares Spark output to the DuckDB oracle through Arrow,
where DuckDB's HUGEINT (the inferred type of SUM over BIGINT) becomes
decimal128 and renders as float64 — so an oracle that forgets
CAST(... AS BIGINT) hash-mismatches even when every value is
identical. Three queries went driver-red for two rounds on exactly
this (time_decayed_engagement, fk_integrity_audit,
customer_rfm_segments). This gate makes the bug a local test failure:
every registered oracle must emit only portable column types.
"""

from __future__ import annotations

import duckdb
import pytest

from gerrydb_etl_spark.queries import REGISTRY

# Types whose Arrow representation round-trips identically between
# DuckDB and Spark under the driver's canonicalizer. Notably absent:
# HUGEINT / DECIMAL (float64-rendered on the oracle side only) and
# FLOAT (32-bit; Spark double would repr differently).
_PORTABLE = {"BIGINT", "INTEGER", "VARCHAR", "DOUBLE", "BOOLEAN",
             "TIMESTAMP", "DATE"}


def _oracle_types(con, sql):
    rel = con.sql(sql)
    return list(zip(rel.columns, (str(t).upper() for t in rel.types)))


def test_every_oracle_emits_only_portable_types(duck):
    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        sql = getattr(spec, "oracle", None)
        if not sql:
            continue
        for col, typ in _oracle_types(duck, sql):
            base = typ.split("(")[0]
            if base not in _PORTABLE:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle SQL emits non-portable output types (add an explicit "
        "CAST, usually AS BIGINT): " + "; ".join(offenders)
    )


def test_gate_catches_uncast_sum(duck):
    """The gate itself must red on the bug class it exists for."""
    sql = "SELECT SUM(o_orderkey) AS s FROM orders"
    types = dict(_oracle_types(duck, sql))
    assert types["s"] == "HUGEINT"
    base = types["s"].split("(")[0]
    assert base not in _PORTABLE


def test_arrow_canonicalizer_separates_hugeint_from_bigint(duck):
    """duck_digest must see an uncast SUM the way the driver does:
    as a float-rendered decimal that mismatches int64 output."""
    from tests.oracle_compare import duck_digest

    _, _, h_uncast = duck_digest(
        duck, "SELECT SUM(x) AS s FROM (VALUES (1::BIGINT),(2)) t(x)"
    )
    _, _, h_cast = duck_digest(
        duck,
        "SELECT CAST(SUM(x) AS BIGINT) AS s "
        "FROM (VALUES (1::BIGINT),(2)) t(x)",
    )
    assert h_uncast != h_cast, (
        "Arrow-path canonicalizer no longer distinguishes HUGEINT "
        "from BIGINT — driver reds would be invisible locally again"
    )
