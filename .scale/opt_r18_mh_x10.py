"""x10 floor probe for the minhash heads (staged-band A/B evidence).

Usage: python .scale/opt_r18_mh_x10.py <tag>
Writes /root/repo/.scale/opt_r18_mh_x10_<tag>.json (min-of-3 floors,
output rows asserted so a silently-empty scaled corpus cannot fake a
floor).
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gerrydb_etl_spark.queries import REGISTRY
from gerrydb_etl_spark.session import get_spark

TAG = sys.argv[1]
X10 = "/root/repo/.scale/x10"
spark = get_spark(app_name="mh_x10", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


warm = spark.read.parquet("/root/testdata/sf0.1/region.parquet")
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

out = {}
for name in ["minhash_near_dup", "incremental_minhash_dedup"]:
    spec = REGISTRY[name]
    df = spec.spark(spark, X10)  # untimed first run pays staging
    nrows = df.count()
    _clear()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        spec.spark(spark, X10).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    out[name] = {"floor": min(times), "runs": times, "rows": nrows}
    print(f"{name}: floor {min(times)} rows {nrows} runs {times}", flush=True)

with open(f"/root/repo/.scale/opt_r18_mh_x10_{TAG}.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
