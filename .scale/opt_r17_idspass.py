#!/usr/bin/env python
"""A/B probe for the r17 JVM-native dense-ID pass (operators/ids.py).

Times the three registered heads that run through assign_dense_ids
(customer_rfm_segments: 3 passes; epoch_shuffle_order: 1 pass over
the mixed corpus; dense_id_assignment: 1 pass over orders) with the
noop sink, min-of-N, cache cleared between reps — same methodology
as opt_r17_tailsplit.py so the numbers compare directly against its
recorded before-stages (rfm_full 2.865 floor 2.447,
rfm_base_plus_1rank 0.769 with the Arrow pass).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.session import get_spark  # noqa: E402
from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402

spark = get_spark(app_name="opt_r17_idspass", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def timed(name, fn):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        if out is not None:
            out.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    print(f"{name}: floor {min(times)} runs {times}", flush=True)
    return {"floor": min(times), "runs": times}


# warm-up
warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

out = {"sf_dir": SF_DIR, "reps": REPS, "queries": {}}
for name in (
    "customer_rfm_segments",
    "epoch_shuffle_order",
    "dense_id_assignment",
):
    spark.sparkContext.setJobDescription(f"idspass:{name}")
    out["queries"][name] = timed(
        name, lambda n=name: REGISTRY[n].spark(spark, SF_DIR)
    )

dest = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "opt_r17_idspass.json"
)
with open(dest, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("wrote", dest)
