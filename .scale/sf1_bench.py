"""Natural-distribution sf1 slope measurement (VERDICT r7 item 7):
run the heavy heads at sf0.1 (x1) and at the NATURAL sf1 corpus
(make_sf1.py — Zipf vocabulary, planted near-dups, Gaussian-cluster
embeddings; no replica degeneracy). Min-of-2 per scale, staged
fixtures in session prep exactly as bench.py does."""
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
]
SCALES = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}

spark = get_spark(app_name="sf1slope", cpus=32)
out = {}
for tag, sf in SCALES.items():
    t0 = time.perf_counter()
    ensure_staged_shingles(spark, sf, 3)
    ensure_staged_shingles(spark, sf, 5)
    ensure_staged_token_hashes(spark, sf)
    ensure_staged_token_codes(spark, sf)
    ensure_staged_kmeans(spark, sf, k=8, iters=3)
    ensure_staged_lsh_sigs(spark, sf, bits=4, tables=8)
    ensure_staged_ivf(spark, sf, n_cells=16, iters=2)
    ensure_staged_components(spark, sf)
    res = {"_staging": round(time.perf_counter() - t0, 2)}
    for name in HEADS:
        times = []
        for _ in range(2):
            t1 = time.perf_counter()
            REGISTRY[name].spark(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t1)
            spark.catalog.clearCache()
        res[name] = round(min(times), 2)
    out[tag] = res
    print(f"{tag}: {res}", flush=True)
print("SF1_RESULT " + json.dumps(out))
