#!/usr/bin/env python
"""Benchmark harness: run every registered query at the benchmark
scale factor and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a `noop` write (full execution, no
driver collect). Timings include plan + execution, excluding session
startup and the shared read of nothing (parquet scans are part of
the measured query, as they would be in production).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")

    from gerrydb_etl_spark.queries import REGISTRY
    from gerrydb_etl_spark.session import get_spark

    spark = get_spark(app_name="gerrydb-etl-spark-bench", cpus=int(cpus))

    # Warm the JVM + parquet footer caches with one tiny action so the
    # first measured query isn't charged for one-time JIT/startup.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators that cache intermediates (shingle sets, minhash
        # signatures) would otherwise accumulate executor memory
        # across the 70+ queries of one bench session
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
