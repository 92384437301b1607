#!/usr/bin/env python
"""R17: construct-vs-execute triage map over every registered query.

For each non-verify query: t_construct = wall to build the DataFrame
(spec.spark()), t_exec = wall of the noop save that follows. Builders
with eager actions (checkpoints, model collects) charge work to
construct — that is the point: driver-side construction cost is
invisible in stage metrics (guide §7.3) and this map surfaces it.

Usage: python .scale/opt_r17_cmap.py [reps] — min over reps per phase.
Writes .scale/opt_r17_cmap.json sorted by construct desc.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="opt_r17_cmap", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()


@pandas_udf("long")
def _warm_udf(s: pd.Series) -> pd.Series:
    return s


spark.range(0, 32_000, 1, 32).select(_warm_udf(F.col("id"))).write.format(
    "noop"
).mode("overwrite").save()

tiny = "/root/testdata/sf0.001"
if os.path.isdir(tiny):
    from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
    from gerrydb_etl_spark.streaming.windows import tumbling

    run_stream_to_memory(
        spark, tiny, lambda df: tumbling(df, "1 hour"),
        output_mode="complete", state_partitions=2,
    )

names = sorted(n for n in REGISTRY if not n.endswith("_verify"))
# pay staging + first-call session costs untimed
for n in names:
    try:
        REGISTRY[n].spark(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # noqa: BLE001
        print(f"SKIP {n}: {exc}", flush=True)
    _clear()

out = {}
for n in names:
    cons, execs = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df = REGISTRY[n].spark(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        cons.append(round(t1 - t0, 3))
        execs.append(round(t2 - t1, 3))
        _clear()
    out[n] = {"construct": min(cons), "execute": min(execs),
              "cons_runs": cons, "exec_runs": execs}
    print(f"{n}: construct {min(cons)} execute {min(execs)}", flush=True)

dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "opt_r17_cmap.json")
with open(dest, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
top = sorted(out.items(), key=lambda kv: -kv[1]["construct"])[:25]
print(json.dumps({n: v["construct"] for n, v in top}))
