#!/usr/bin/env python
"""Spot-verify named queries against their DuckDB oracles at one or
more scale factors, through the driver contract (REGISTRY + the
driver's canonicalizer from tests/oracle_compare.py).

Usage: python .scale/oracle_spot.py q1,q2,... [sf_dir,sf_dir,...]
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

import duckdb  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402
from oracle_compare import duck_digest, spark_digest  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

names = [n for n in sys.argv[1].split(",") if n]
sf_dirs = (
    sys.argv[2].split(",")
    if len(sys.argv) > 2
    else ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)

spark = get_spark(app_name="oracle_spot", cpus=32)
fails = 0
for sf_dir in sf_dirs:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    for n in names:
        spec = REGISTRY[n]
        if spec.oracle is None:
            print(f"{sf_dir} {n}: NO ORACLE")
            continue
        sn, scols, shash = spark_digest(spec.spark(spark, sf_dir))
        dn, dcols, dhash = duck_digest(con, spec.oracle)
        ok = (sn, scols, shash) == (dn, dcols, dhash)
        fails += 0 if ok else 1
        print(
            f"{sf_dir} {n}: rows {sn}/{dn} "
            f"{'OK' if ok else 'MISMATCH cols=' + str((scols, dcols))}"
        )
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    con.close()
print("FAILS:", fails)
sys.exit(1 if fails else 0)
