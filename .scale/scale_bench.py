"""Round scale-slope harness (VERDICT r8 item 7): measure the heavy
heads at sf0.1 (x1) and the NATURAL 10x corpus (.scale/sf1,
make_sf1.py), plus the forced-low-cap hierarchy experiment (VERDICT
r8 item 2), and write the committed per-round artifact
SCALE_r{N}.json at the repo root.

Usage:  ROUND=9 python .scale/scale_bench.py

The forced-cap experiment reproduces the past-the-cap regime at
bench scale: cells_for_corpus(20000, cap=16) clamps (20000//250 = 80
cells wanted), so occupancy is ~1250 — the quadratic shape the
round-8 sweep measured at 248 s with frozen k. The harness times
SemDeDup pairing over the capped assignment WITHOUT and WITH
split_oversized_cells; the hierarchy must recover near the
scaled-k (unclamped) cost.
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
    ensure_staged_components,
    ensure_staged_ivf,
    ensure_staged_kmeans,
    ensure_staged_lsh_sigs,
    ensure_staged_shingles,
    ensure_staged_token_codes,
    ensure_staged_token_hashes,
)

ROUND = int(os.environ.get("ROUND", "9"))
HEADS = [
    "embedding_neardup",
    "ann_cosine_topk",
    "pagerank_fixed_point",
    "simhash_near_dup",
    "minhash_near_dup",
    "ngram_jaccard_dedup",
    "neardup_clusters",
    "cluster_survivor_selection",
    "containment_dedup",
    "winnow_near_dup",
    "substring_dedup_spans",
    "bigram_surprisal_filter",
    "cdc_incremental_dedup",
    "bpe_segment_apply",
    "semantic_dedup_survivors",
    "embedding_split_leakage",
    "semantic_decontam",
    "pq_adc_topk",
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


def run_query(name, sf):
    REGISTRY[name].spark(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()


out = {"round": ROUND, "scales": {}}
for tag, sf in SCALES.items():
    t0 = time.perf_counter()
    ensure_staged_shingles(spark, sf, 3)
    ensure_staged_shingles(spark, sf, 5)
    ensure_staged_token_hashes(spark, sf)
    ensure_staged_token_codes(spark, sf)
    ensure_staged_kmeans(spark, sf, k=8, iters=3)
    ensure_staged_kmeans(spark, sf, k=80, iters=3)  # scaled-k at sf1
    ensure_staged_lsh_sigs(spark, sf, bits=4, tables=8)
    ensure_staged_ivf(spark, sf, n_cells=16, iters=2)
    ensure_staged_ivf(spark, sf, n_cells=160, iters=2)  # scaled cells
    ensure_staged_components(spark, sf)
    res = {"_staging": round(time.perf_counter() - t0, 2)}
    for name in HEADS:
        res[name] = timed(lambda: run_query(name, sf))
        print(f"{tag} {name}: {res[name]}", flush=True)
    out["scales"][tag] = res

slopes = {
    n: round(out["scales"]["sf1"][n] / max(out["scales"]["x1"][n], 0.05), 1)
    for n in HEADS
}
out["slopes_at_10x"] = slopes
out["flagged_over_10x"] = sorted(n for n, s in slopes.items() if s > 10)

# ---- forced-low-cap hierarchy experiment (VERDICT r8 item 2) --------
from gerrydb_etl_spark.operators.kmeans import (
    cells_for_corpus,
    semantic_dedup,
    split_oversized_cells,
)
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.store.staging import staged_kmeans

SF1 = SCALES["sf1"]
emb = load_table(spark, SF1, "embeddings")
k_capped = cells_for_corpus(20000, floor_k=8, cap=16)  # == 16, clamped
assert k_capped == 16
capped = staged_kmeans(spark, SF1, k=k_capped, iters=3)

exp = {"k_capped": k_capped, "occupancy_target": 250}
exp["capped_no_split"] = timed(
    lambda: semantic_dedup(emb, assigned=capped).write.format("noop")
    .mode("overwrite").save(),
    reps=1,
)
spark.catalog.clearCache()


def with_split():
    split, _ = split_oversized_cells(capped, per_cell=250)
    semantic_dedup(emb, assigned=split).write.format("noop").mode(
        "overwrite"
    ).save()


exp["capped_with_split"] = timed(with_split, reps=2)
spark.catalog.clearCache()
# the unclamped reference: scaled k straight through
k_scaled = cells_for_corpus(20000, floor_k=8)  # 80 cells
scaled = staged_kmeans(spark, SF1, k=k_scaled, iters=3)
exp["scaled_k_reference"] = timed(
    lambda: semantic_dedup(emb, assigned=scaled).write.format("noop")
    .mode("overwrite").save()
)
exp["split_speedup_vs_capped"] = round(
    exp["capped_no_split"] / max(exp["capped_with_split"], 0.05), 1
)
out["forced_cap_hierarchy"] = exp

path = f"/root/repo/SCALE_r{ROUND:02d}.json"
with open(path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print("WROTE", path)
print("SCALE_RESULT " + json.dumps(out))
