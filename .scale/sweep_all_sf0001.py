#!/usr/bin/env python
"""Cold-look closing sweep: every registered query with a DuckDB
oracle, value-hash-compared at sf0.001 (the sf0.01 lane is covered by
the full-suite oracle sweep in tests/test_queries_oracle.py). Rows-
only queries (no oracle entry) are smoke-run for rows >= 0.

Usage: python .scale/sweep_all_sf0001.py
Prints one PASS/FAIL line per query and a final tally; exits nonzero
on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[8]")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

spark = get_spark(app_name="sweep_sf0001", cpus=8, shuffle_partitions=8)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

from oracle_compare import assert_matches_oracle  # noqa: E402

qs, osql = entry.queries(), entry.oracle_sql()
failed: list[str] = []
for i, name in enumerate(sorted(qs), 1):
    try:
        df = qs[name](spark, SF)
        if name in osql:
            assert_matches_oracle(df, con, osql[name], name)
            print(f"[{i:3d}/{len(qs)}] PASS {name}", flush=True)
        else:
            n = df.count()
            assert n >= 0
            print(f"[{i:3d}/{len(qs)}] PASS {name} (rows-only: {n})",
                  flush=True)
    except Exception as exc:  # noqa: BLE001 - tally and report
        failed.append(name)
        print(f"[{i:3d}/{len(qs)}] FAIL {name}: {exc}", flush=True)

print(f"\nsweep sf0.001: {len(qs) - len(failed)}/{len(qs)} green")
if failed:
    print("failures:", failed)
    sys.exit(1)
