#!/usr/bin/env python
"""R18 streaming stage-split (VERDICT r17 item 1): attribute the
streaming heads' sf0.1 walls to their owning stage — micro-batch
engine scheduling vs state-store partition count vs the memory-sink
drain's driver Python round-trip — with isolated min-of-N floors.

Variants per head:
  * full registered head (baseline, driver methodology)
  * state_partitions sweep (results are partition-count-invariant;
    the sweep measures state-store commit overhead vs epoch count)
  * drain split: time the streaming query alone (awaitTermination,
    no drain) vs the full head — the difference is the drain's
    collect + createDataFrame round-trip
  * engine floor: a trivial 1-group aggregation through the same
    readStream -> memory-sink -> AvailableNow machinery (the
    irreducible trigger-cadence term at this scale)
  * batch twin: the same computation as a plain batch query (the
    compute floor with zero streaming machinery)

Writes .scale/opt_r18_stream_split.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
REPS = int(os.environ.get("REPS", "5"))

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402
from gerrydb_etl_spark.streaming.stream import (  # noqa: E402
    _drain_memory_sink,
    _stage_events_dir,
    read_events_stream,
    run_click_view_attribution,
    run_dedup_stream,
    run_stream_to_memory,
)
from gerrydb_etl_spark.streaming.windows import session, tumbling  # noqa: E402

spark = get_spark(app_name="opt_r18_stream_split", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


# session warm-ups, identical to bench.py (untimed)
warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

import pandas as pd  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def _warm_udf(s: pd.Series) -> pd.Series:
    return s


spark.range(0, 32_000, 1, 32).select(_warm_udf(F.col("id"))).write.format(
    "noop"
).mode("overwrite").save()

tiny = "/root/testdata/sf0.001"
if os.path.isdir(tiny):
    run_stream_to_memory(
        spark, tiny, lambda df: tumbling(df, "1 hour"),
        output_mode="complete", state_partitions=2,
    )


def timed(fn):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df = fn()
        if df is not None:
            df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    return {"floor": min(times), "runs": times}


def attribution_no_drain(state_partitions):
    """run_click_view_attribution minus the drain: time the stream to
    termination, then drop the sink without materializing it."""
    stage = _stage_events_dir(SF_DIR)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    name = f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
        clicks = (
            read_events_stream(spark, SF_DIR, stage)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        views = (
            read_events_stream(spark, SF_DIR, stage)
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "1 hour")
        )
        joined = clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("view_ts") >= F.col("click_ts"))
            & (
                F.col("view_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 4 hours")
            ),
        ).select(
            "click_id",
            "view_id",
            F.col("c_user").alias("user_id"),
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("view_ts").alias("view_us"),
            (F.unix_micros("view_ts") - F.unix_micros("click_ts")).alias(
                "lag_us"
            ),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.table(name).count()
        spark.catalog.dropTempView(name)
        return n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)


out: dict = {"sf_dir": SF_DIR, "reps": REPS}

# untimed staging pass for the registered heads we touch
for n in ("events_stream_join_attribution", "events_stream_tumbling",
          "events_stream_session", "events_stream_dedup"):
    REGISTRY[n].spark(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    _clear()

# 1. engine floor: trivial 1-group complete-mode aggregation
out["engine_floor_sp8"] = timed(
    lambda: run_stream_to_memory(
        spark, SF_DIR,
        lambda df: df.groupBy(F.lit(1).alias("g")).count(),
        output_mode="complete", state_partitions=8,
    )
)
out["engine_floor_sp2"] = timed(
    lambda: run_stream_to_memory(
        spark, SF_DIR,
        lambda df: df.groupBy(F.lit(1).alias("g")).count(),
        output_mode="complete", state_partitions=2,
    )
)

# 2. attribution: full head, state-partition sweep, drain split,
#    batch twin
out["attribution_full_sp8"] = timed(
    lambda: run_click_view_attribution(spark, SF_DIR)
)
for sp in (2, 4, 16, 32):
    out[f"attribution_full_sp{sp}"] = timed(
        lambda sp=sp: run_click_view_attribution(
            spark, SF_DIR, state_partitions=sp
        )
    )
out["attribution_no_drain_sp8"] = timed(
    lambda: (attribution_no_drain(8), None)[1]
)


def attribution_batch_twin():
    from gerrydb_etl_spark.sources.registry import load_table

    ev = load_table(spark, SF_DIR, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    return c.join(
        v,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts"))
        & (F.col("view_ts") <= F.col("click_ts") + F.expr("INTERVAL 4 hours")),
    ).select(
        "click_id", "view_id", F.col("c_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("view_ts").alias("view_us"),
        (F.unix_micros("view_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


out["attribution_batch_twin"] = timed(attribution_batch_twin)

# 3. tumbling + session + dedup: state-partition sweeps
for sp in (2, 8, 32):
    out[f"tumbling_sp{sp}"] = timed(
        lambda sp=sp: run_stream_to_memory(
            spark, SF_DIR, lambda df: tumbling(df, "1 hour"),
            output_mode="complete", state_partitions=sp,
        )
    )
    out[f"session_sp{sp}"] = timed(
        lambda sp=sp: run_stream_to_memory(
            spark, SF_DIR, lambda df: session(df, "10 minutes"),
            output_mode="complete", state_partitions=sp,
        )
    )
for sp in (2, 8):
    out[f"dedup_sp{sp}"] = timed(
        lambda sp=sp: run_dedup_stream(
            spark, SF_DIR, watermark="1 hour", state_partitions=sp
        )
    )

dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "opt_r18_stream_split.json")
with open(dest, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps({k: v["floor"] for k, v in out.items()
                  if isinstance(v, dict) and "floor" in v}, indent=1))
