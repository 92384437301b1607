"""Round-12 scale-slope harness: re-measure the heads whose code or
epoch shape changed this round (split-occupancy rework, expand_paths
backstop bound, streaming ingest 4->2 epochs) plus the NEW
near-dup-grade planted-twin pair query, at sf0.1 (x1) and the
natural 10x corpus (.scale/sf1). For ivf_blocked_neardup_strict the
harness also records the OUTPUT row count at both scales — the
VERDICT r11 item 7 'done' evidence is output growing ~linearly with
the planted dup rate (n/10 planted twins per corpus).

Usage:  ROUND=12 python .scale/scale_r12_bench.py
Writes /root/repo/SCALE_r12.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")
from gerrydb_etl_spark.queries import REGISTRY
from gerrydb_etl_spark.session import get_spark
from gerrydb_etl_spark.store.staging import (
    ensure_staged_ivf,
    ensure_staged_kmeans,
)

ROUND = int(os.environ.get("ROUND", "12"))
HEADS = [
    # new this round
    "ivf_blocked_neardup_strict",
    "ivf_multiprobe_neardup",
    # split-occupancy rework (max_levels=1 path + split family)
    "hierarchical_cells_assign",
    "semantic_dedup_survivors",
    "embedding_split_leakage",
    # expand_paths backstop bound (+1 edge-count job per call)
    "order_hierarchy_paths",
    "locality_hierarchy_paths",
    # streaming ingest at 2 epochs
    "docs_stream_dedup_ingest",
    "embeddings_stream_index_ingest",
    # unchanged sibling, for the strict-twin comparison
    "ivf_blocked_neardup",
]
SCALES = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}


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


out = {"round": ROUND, "scales": {}, "strict_twin_output_rows": {}}
for tag, sf in SCALES.items():
    t0 = time.perf_counter()
    from gerrydb_etl_spark.operators.kmeans import cells_for_corpus
    from gerrydb_etl_spark.store.staging import corpus_count

    n = corpus_count(spark, sf, "embeddings")
    ensure_staged_kmeans(spark, sf, k=8, iters=3)
    ensure_staged_kmeans(spark, sf, k=4, iters=2)
    # scaled-k model only where a head reads it (k=80 binds only at
    # sf1; staging it at x1 would waste ~10 s of the _staging figure)
    k_dyn = cells_for_corpus(n, floor_k=8)
    if k_dyn != 8:
        ensure_staged_kmeans(spark, sf, k=k_dyn, iters=3)
    ensure_staged_ivf(spark, sf, n_cells=16, iters=2)
    # the multiprobe head corpus-scales its cell count with
    # per_cell=125 (160 cells at sf1; floor 16 below 2000 vectors)
    mp_cells = cells_for_corpus(n, floor_k=16, per_cell=125)
    if mp_cells != 16:
        ensure_staged_ivf(spark, sf, n_cells=mp_cells, iters=2)
    res = {"_staging": round(time.perf_counter() - t0, 2)}
    for name in HEADS:
        res[name] = timed(lambda: run_query(name, sf))
        print(f"{tag} {name}: {res[name]}", flush=True)
    out["scales"][tag] = res
    out["strict_twin_output_rows"][tag] = (
        REGISTRY["ivf_blocked_neardup_strict"].spark(spark, sf).count()
    )
    print(f"{tag} strict twin rows: {out['strict_twin_output_rows'][tag]}",
          flush=True)

slopes = {
    n: round(out["scales"]["sf1"][n] / max(out["scales"]["x1"][n], 0.05), 1)
    for n in HEADS
}
out["slopes_at_10x"] = slopes
out["flagged_over_10x"] = sorted(n for n, s in slopes.items() if s > 10)

with open("/root/repo/SCALE_r12.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(slopes))
