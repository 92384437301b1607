#!/usr/bin/env python
"""R17 optimization-round probe: isolated floors + formatted plans.

For each named registered query, measures min-of-REPS noop-sink wall
(same methodology as bench.py: cold cache between runs, session
warm-ups and staged fixtures paid up front, never timed) and
optionally dumps `explain("formatted")` to plans/r18/<name>_<tag>.txt
— the before/after evidence files the optimization round commits.

Usage:
  python .scale/opt_r18_probe.py q1,q2,... [tag] [reps]

Writes /root/repo/.scale/opt_r18_<tag>.json and (when tag is given)
plans/r18/<query>_<tag>.txt.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

names = [n for n in sys.argv[1].split(",") if n] if len(sys.argv) > 1 else []
tag = sys.argv[2] if len(sys.argv) > 2 else None
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="opt_r18_probe", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


# --- session warm-ups, identical to bench.py (untimed) -------------
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
if os.path.isdir(tiny) and any(n.startswith(("events_stream", "orders_stream",
                                             "docs_stream", "embeddings_stream"))
                               for n in names):
    from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
    from gerrydb_etl_spark.streaming.windows import tumbling

    run_stream_to_memory(
        spark, tiny, lambda df: tumbling(df, "1 hour"),
        output_mode="complete", state_partitions=2,
    )

# staged fixtures: first call of each query stages on demand; pay
# that (and the model collects) before timing with one untimed run
for n in names:
    REGISTRY[n].spark(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    _clear()

out: dict = {"sf_dir": SF_DIR, "reps": REPS, "queries": {}}
plans_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r18")

for n in names:
    spec = REGISTRY[n]
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df = spec.spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    out["queries"][n] = {"floor": min(times), "runs": times}
    print(f"{n}: floor {min(times)} runs {times}", flush=True)
    if tag:
        os.makedirs(plans_dir, exist_ok=True)
        buf = io.StringIO()
        with redirect_stdout(buf):
            spec.spark(spark, SF_DIR).explain("formatted")
        with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        _clear()

dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    f"opt_r18_{tag or 'probe'}.json")
with open(dest, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps({k: v["floor"] for k, v in out["queries"].items()}))
