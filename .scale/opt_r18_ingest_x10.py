"""x1/x10 floors for the three streaming-ingest heads on the final
tree (epoch-input staging + per-process scoping): re-asserts the
x10 slopes the §8 change must hold. Output rows asserted per scale.

Usage: python .scale/opt_r18_ingest_x10.py
Writes /root/repo/.scale/opt_r18_ingest_x10.json.
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

X1 = "/root/testdata/sf0.1"
X10 = "/root/repo/.scale/x10"
spark = get_spark(app_name="ingest_x10", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


warm = spark.read.parquet(os.path.join(X1, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
from gerrydb_etl_spark.streaming.windows import tumbling

run_stream_to_memory(
    spark, "/root/testdata/sf0.001", lambda df: tumbling(df, "1 hour"),
    output_mode="complete", state_partitions=2,
)

HEADS = [
    "orders_stream_checksum",
    "docs_stream_dedup_ingest",
    "embeddings_stream_index_ingest",
]
out = {}
for name in HEADS:
    entry = {}
    for sf_dir, tag in ((X1, "x1"), (X10, "x10")):
        spec = REGISTRY[name]
        nrows = spec.spark(spark, sf_dir).count()  # untimed, pays staging
        _clear()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            _clear()
        entry[tag] = min(times)
        entry[f"{tag}_rows"] = nrows
        print(f"{name} {tag}: {min(times)}s ({nrows} rows) {times}", flush=True)
    entry["slope_x10"] = round(entry["x10"] / entry["x1"], 2)
    out[name] = entry

with open("/root/repo/.scale/opt_r18_ingest_x10.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps({k: v["slope_x10"] for k, v in out.items()}))
