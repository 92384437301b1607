"""Round-18 scale battery: re-assert x10 (and x20 for the streaming
family) slopes for every head whose executed plan changed this round.

1. STREAMING MEMORY-SINK FAMILY (drain pinned executor-side r18):
   the six run_stream_to_memory heads at x1/x10/x20. Target: slopes
   <= 2.5 per 10x, or attributed. Output row counts asserted at each
   scale so a silently-empty scaled stream cannot fake a slope.

2. DEDUP FINGERPRINT STAGING (r18): simhash_near_dup,
   winnow_fingerprints, winnow_near_dup at x1/x10 — staged fixtures
   restage per source fingerprint (untimed, reported), consumers
   read them. Target: x10 slopes <= 2.5 AND the staged read wins at
   x10 too (old-vs-new same-host not repeated here; the x1 A/B is
   .scale/opt_r18_fpstage_*.json — this battery proves the win is
   not a small-scale artifact by comparing against the r17 x10
   walls for the same heads where available).

3. TWOLEVEL SALT RULE + SCD2 PROBE PIN (r18): ivf_multiprobe_twolevel
   and scd2_pointintime_join at x1/x10.

Usage: python .scale/scale_r18_bench.py
Writes /root/repo/SCALE_r18.json.
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
X20 = "/root/repo/.scale/x20"
for d, r in ((X10, 10), (X20, 20)):
    if not os.path.isdir(d):
        raise SystemExit(f"missing corpus {d}: run `python .scale/make_scaled.py {r}`")

spark = get_spark(app_name="scale_r18", cpus=32)
out: dict = {"round": 18}


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


# session warm-ups (bench.py parity, untimed)
warm = spark.read.parquet(os.path.join(X1, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def _warm_udf(s: pd.Series) -> pd.Series:
    return s


spark.range(0, 32_000, 1, 32).select(_warm_udf(F.col("id"))).write.format(
    "noop"
).mode("overwrite").save()

from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
from gerrydb_etl_spark.streaming.windows import tumbling

run_stream_to_memory(
    spark, "/root/testdata/sf0.001", lambda df: tumbling(df, "1 hour"),
    output_mode="complete", state_partitions=2,
)


def floor(name: str, sf_dir: str, reps: int = 3) -> tuple[float, int]:
    spec = REGISTRY[name]
    # untimed first run pays staging/model collects for this corpus
    df = spec.spark(spark, sf_dir)
    nrows = df.count()
    _clear()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    return min(times), nrows


STREAM_HEADS = [
    "events_stream_tumbling",
    "events_stream_sliding",
    "events_stream_session",
    "events_stream_user_totals",
    "events_stream_dedup",
    "events_stream_join_attribution",
]
OTHER_HEADS = [
    "simhash_near_dup",
    "winnow_fingerprints",
    "winnow_near_dup",
    "ivf_multiprobe_twolevel",
    "scd2_pointintime_join",
]

res: dict = {}
for name in STREAM_HEADS + OTHER_HEADS:
    scales = (
        ((X1, "x1"), (X10, "x10"), (X20, "x20"))
        if name in STREAM_HEADS
        else ((X1, "x1"), (X10, "x10"))
    )
    entry: dict = {}
    for sf_dir, tag in scales:
        f, n = floor(name, sf_dir)
        entry[tag] = f
        entry[f"{tag}_rows"] = n
        print(f"{name} {tag}: {f}s ({n} rows)", flush=True)
    entry["slope_x10"] = round(entry["x10"] / entry["x1"], 2)
    if "x20" in entry:
        entry["slope_x20_over_x10"] = round(entry["x20"] / entry["x10"], 2)
    res[name] = entry

out["touched_heads"] = res
with open("/root/repo/SCALE_r18.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out, indent=1, sort_keys=True))
