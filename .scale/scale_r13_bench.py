"""Round-13 scale-slope harness (VERDICT r12 items 4 + 5):

1. 10x battery (sf0.1 -> .scale/sf1) for the STORE family — the
   first SCALE artifact to cover it (scd2_double_load,
   eav_pivot_roundtrip, set_versioning_double_load,
   scd2_pointintime_join) — plus this round's changed heads
   (orders_stream_checksum at 2 epochs, the new forced-split
   ivf_multiprobe_twolevel).
2. Append-fast-path proof at both scales: scd2_merge over a
   materialized v1 state with (a) disjoint incoming keys (pure
   append — the semi join closes nothing) vs (b) same-key changed
   values (close-and-insert). Both must scale ~linearly and the
   append case must not exceed the update case.
3. ivf_multiprobe_neardup slope RE-BASELINED in the scaling regime
   (item 5): the r12 17.2x slope divided an in-regime sf1 wall by an
   x1 wall where floor_k still bound (occupancy 125 vs design 250).
   Measured at x4 (8k vecs, 64 cells) -> x10 (20k, 160) -> x20
   (40k, 320), all past floor-binding, walls should track data
   ~linearly.

Usage:  ROUND=13 python .scale/scale_r13_bench.py
Writes /root/repo/SCALE_r13.json.
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
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.store.staging import corpus_count, ensure_staged_ivf

ROUND = int(os.environ.get("ROUND", "13"))

# the replica corpora are build artifacts (not committed data); fail
# fast with the build command instead of crashing after the expensive
# 10x battery has already run
for _d in ("x4", "x20", "sf1"):
    _p = f"/root/repo/.scale/{_d}"
    if not os.path.isdir(_p):
        _cmd = (
            "python .scale/make_sf1.py"
            if _d == "sf1"
            else f"python .scale/make_scaled.py {_d[1:]}"
        )
        raise SystemExit(
            f"missing scaled corpus {_p} — build it first with "
            f"`{_cmd}` (see .scale/README.md)"
        )
HEADS_10X = [
    "scd2_double_load",
    "eav_pivot_roundtrip",
    "set_versioning_double_load",
    "scd2_pointintime_join",
    "orders_stream_checksum",
    "ivf_multiprobe_twolevel",
]
SCALES_10X = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}
MP_SCALES = {
    "x4": "/root/repo/.scale/x4",
    "x10": "/root/repo/.scale/sf1",
    "x20": "/root/repo/.scale/x20",
}


def timed(fn, reps=2):
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t)
    return round(min(times), 2)


spark = get_spark(app_name=f"scale_r{ROUND}", cpus=32)

# warm the streaming engine once (same as bench.py) so the first
# streaming head isn't charged engine start
from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
from gerrydb_etl_spark.streaming.windows import tumbling

run_stream_to_memory(
    spark,
    "/root/testdata/sf0.001",
    lambda df: tumbling(df, "1 hour"),
    output_mode="complete",
    state_partitions=2,
)


def run_query(name, sf):
    REGISTRY[name].spark(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def scd2_fastpath(sf):
    """(append_sec, update_sec) over a materialized v1 load of the
    scale's orders table: disjoint-key incoming (pure append — the
    effective-keys semi join closes nothing) vs same-key re-priced
    incoming (close-and-insert)."""
    from gerrydb_etl_spark.store.scd2 import empty_versioned, scd2_merge

    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    state = scd2_merge(
        empty_versioned(orders), orders, ["o_orderkey"], version=1
    ).localCheckpoint(eager=True)
    hi = orders.agg(F.max("o_orderkey")).first()[0] + 1
    append_inc = orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(hi)
    )
    update_inc = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1.0)
    )

    def run(inc):
        scd2_merge(state, inc, ["o_orderkey"], version=2).write.format(
            "noop"
        ).mode("overwrite").save()

    t_append = timed(lambda: run(append_inc))
    t_update = timed(lambda: run(update_inc))
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    return t_append, t_update


out = {"round": ROUND, "scales": {}, "fastpath": {}, "multiprobe_regime": {}}

for tag, sf in SCALES_10X.items():
    t0 = time.perf_counter()
    # the forced two-level head stages its k=4 model per scale
    ensure_staged_ivf(spark, sf, n_cells=4, iters=2)
    res = {"_staging": round(time.perf_counter() - t0, 2)}
    for name in HEADS_10X:
        res[name] = timed(lambda: run_query(name, sf))
        print(f"{tag} {name}: {res[name]}", flush=True)
    out["scales"][tag] = res
    a, u = scd2_fastpath(sf)
    out["fastpath"][tag] = {"append": a, "update": u}
    print(f"{tag} fastpath append={a} update={u}", flush=True)

slopes = {
    n: round(
        out["scales"]["sf1"][n] / max(out["scales"]["x1"][n], 0.05), 1
    )
    for n in HEADS_10X
}
out["slopes_at_10x"] = slopes
out["flagged_over_10x"] = sorted(n for n, s in slopes.items() if s > 10)
out["fastpath_slopes"] = {
    k: round(
        out["fastpath"]["sf1"][k] / max(out["fastpath"]["x1"][k], 0.05), 1
    )
    for k in ("append", "update")
}

# item 5: the multiprobe family in its scaling regime (all three
# corpora past floor_k binding; cells 64 / 160 / 320)
from gerrydb_etl_spark.operators.kmeans import cells_for_corpus

for tag, sf in MP_SCALES.items():
    n = corpus_count(spark, sf, "embeddings")
    cells = cells_for_corpus(n, floor_k=16, per_cell=125)
    t0 = time.perf_counter()
    ensure_staged_ivf(spark, sf, n_cells=cells, iters=2)
    staging = round(time.perf_counter() - t0, 2)
    reps = 1 if tag == "x20" else 2
    wall = timed(lambda: run_query("ivf_multiprobe_neardup", sf), reps=reps)
    out["multiprobe_regime"][tag] = {
        "n_vecs": n,
        "cells": cells,
        "staging": staging,
        "wall": wall,
    }
    print(f"{tag} multiprobe n={n} cells={cells} wall={wall}", flush=True)

mp = out["multiprobe_regime"]
out["multiprobe_regime"]["slope_x4_to_x10"] = round(
    mp["x10"]["wall"] / max(mp["x4"]["wall"], 0.05), 1
)
out["multiprobe_regime"]["slope_x4_to_x20"] = round(
    mp["x20"]["wall"] / max(mp["x4"]["wall"], 0.05), 1
)

with open(f"/root/repo/SCALE_r{ROUND}.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(slopes))
print(json.dumps(out["fastpath_slopes"]))
