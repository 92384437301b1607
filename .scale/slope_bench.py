"""Scaling-slope measurement for the heavy heads: run each query at
sf0.1 (x1), x4 and x10 replicated corpora; stage fixtures as session
prep (as bench.py does); report min-of-2 per scale."""
import os, sys, time, json
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")
from gerrydb_etl_spark.queries import REGISTRY
from gerrydb_etl_spark.session import get_spark
from gerrydb_etl_spark.store.staging import (
    ensure_staged_shingles, ensure_staged_token_codes,
    ensure_staged_token_hashes, ensure_staged_kmeans,
    ensure_staged_lsh_sigs, ensure_staged_ivf)

HEADS = ["pagerank_fixed_point", "simhash_near_dup", "embedding_neardup",
         "neardup_clusters", "containment_dedup", "winnow_near_dup",
         "minhash_near_dup"]
SCALES = {1: "/root/testdata/sf0.1", 4: "/root/repo/.scale/x4",
          10: "/root/repo/.scale/x10"}
spark = get_spark(app_name="slope", cpus=32)
out = {}
for mult, sf in SCALES.items():
    t0 = time.perf_counter()
    ensure_staged_shingles(spark, sf, 3); ensure_staged_shingles(spark, sf, 5)
    ensure_staged_token_hashes(spark, sf); ensure_staged_token_codes(spark, sf)
    ensure_staged_kmeans(spark, sf, k=8, iters=3)
    ensure_staged_lsh_sigs(spark, sf, bits=4, tables=8)
    ensure_staged_ivf(spark, sf, n_cells=16, iters=2)
    stage_s = time.perf_counter() - t0
    res = {"_staging": round(stage_s, 2)}
    for name in HEADS:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].spark(spark, sf).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        res[name] = round(min(times), 2)
    out[f"x{mult}"] = res
    print(f"x{mult}: {res}", flush=True)
print("SLOPE_RESULT " + json.dumps(out))
