"""Round-16 addendum battery: first SCALE slope entries for the
curation/packing, sampling/splits, sketch, and retrieval-scoring
families — the last operator families whose 100 TB "scales" claims
rested on plan-shape argument alone (every other family earned
measured x1->x10 rows in SCALE_r11-r16).

Queries (all documents/events-backed, so the x10 corpus's
structure-preserving replication applies):
  * packing:    sequence_packing, curriculum_packing (two-phase
                prefix sums — the window-free claim under test),
                epoch_shuffle_order
  * sampling:   stratified_sample_quota, priority_sample_topk,
                train_val_test_split, cluster_safe_split
  * curation:   pii_redaction, gopher_quality_rules,
                benchmark_decontam, dsir_importance_weights
  * sketches:   hll_sketch_rollup, hll_overlap_estimate,
                cms_heavy_hitters
  * retrieval:  tfidf_top_terms, bm25_scoring, rrf_hybrid_retrieval

Inputs are row-count-asserted 10x (the SCALE_r16 discipline that
caught the unscaled events table). Min-of-2 floors, cold per query.

Usage: python .scale/scale_r16_curation.py
Merges a "curation_families" block into /root/repo/SCALE_r16.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")

from gerrydb_etl_spark.queries import REGISTRY
from gerrydb_etl_spark.session import get_spark

X1 = "/root/testdata/sf0.1"
X10 = "/root/repo/.scale/x10"
if not os.path.isdir(X10):
    raise SystemExit("missing corpus: run `python .scale/make_scaled.py 10`")

QS = [
    "sequence_packing", "curriculum_packing", "epoch_shuffle_order",
    "stratified_sample_quota", "priority_sample_topk",
    "train_val_test_split", "cluster_safe_split",
    "pii_redaction", "gopher_quality_rules", "benchmark_decontam",
    "dsir_importance_weights",
    "hll_sketch_rollup", "hll_overlap_estimate", "cms_heavy_hitters",
    "tfidf_top_terms", "bm25_scoring", "rrf_hybrid_retrieval",
]

spark = get_spark(app_name="scale_r16_curation", cpus=32)

# input assertions (the SCALE_r16 discipline)
for t in ("documents", "events"):
    n1 = spark.read.parquet(os.path.join(X1, f"{t}.parquet")).count()
    n10 = spark.read.parquet(os.path.join(X10, f"{t}.parquet")).count()
    assert n10 == 10 * n1, (t, n1, n10)

# session prep identical in spirit to bench.py: warm + the staged
# fixtures the measured queries consume, so floors measure the
# query plans, not fixture staging
spark.read.parquet(os.path.join(X1, "region.parquet")).write.format(
    "noop"
).mode("overwrite").save()
from gerrydb_etl_spark.store.staging import (
    ensure_staged_kmeans,
    ensure_staged_segmented_vocab,
    ensure_staged_shingles,
    ensure_staged_token_codes,
    ensure_staged_token_hashes,
)

staging_s: dict = {}
for tag, sf in (("x1", X1), ("x10", X10)):
    t0 = time.perf_counter()
    ensure_staged_shingles(spark, sf, 3)
    ensure_staged_shingles(spark, sf, 5)
    ensure_staged_token_hashes(spark, sf)
    ensure_staged_token_codes(spark, sf)
    ensure_staged_segmented_vocab(spark, sf)
    ensure_staged_kmeans(spark, sf, k=8, iters=3)
    staging_s[tag] = round(time.perf_counter() - t0, 1)
print("staging walls:", staging_s, flush=True)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


rec: dict = {"x1": {}, "x10": {}, "slopes_x1_to_x10": {},
             "staging_s": staging_s}
for tag, sf in (("x1", X1), ("x10", X10)):
    for q in QS:
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[q].spark(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 2))
            _clear()
        rec[tag][q] = min(times)
        print(f"{tag} {q}: {min(times)}s {times}", flush=True)
for q in QS:
    rec["slopes_x1_to_x10"][q] = round(rec["x10"][q] / rec["x1"][q], 2)
print("slopes:", json.dumps(rec["slopes_x1_to_x10"], indent=1), flush=True)

path = "/root/repo/SCALE_r16.json"
out = json.load(open(path)) if os.path.exists(path) else {"round": 16}
out["curation_families"] = rec
with open(path, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print("merged into", path)
