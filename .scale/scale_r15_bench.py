"""Round-15 scale battery (VERDICT r14 items 5 + 6):

1. STREAMING — the last operator family with no SCALE entry in any
   round. The per-epoch-overhead-dominance claim (PERF r12) and the
   memory-sink "bounded by state-store output" contract
   (streaming/stream.py) were both assertions; here the four
   registered streaming heads run at x1 (sf0.1 events: 100k rows)
   and x10 (.scale/x10: 1M rows, structure-preserving replicas).
   Expected: walls dominated by engine/epoch fixed costs, so the
   x10 slope sits well under 10; the file-sink twin tracks the
   memory twin (same aggregate, executor-side landing). The
   MEMSINK_MAX_ROWS guard itself is pinned by
   tests/test_streaming.py::test_memory_sink_cardinality_guard.

2. PQ/ANN ACTIVATION — pq_adc_topk and ivf_topk(sub_model=...) have
   never run at THEIR unforced activation (the real 512-cell cap +
   PQ codebooks on >= 128k vectors; multiprobe_pairs got its
   activation point in r14). Corpora: .scale/bigvec (256k natural-
   geometry vectors) and .scale/bigvec128 (128k, same generator) —
   cells_for_corpus(n, floor_k=16, per_cell=125) clamps BOTH at the
   real 512 cap, so the index-build slope 128k->256k is measured
   with k pinned (the "linear past cap" claim for the IVF + PQ
   builds). At 256k the natural skew splits cells unforced; the
   two-level probe then engages under ivf_topk exactly as it did
   under multiprobe_pairs, and a 64-query exact-cosine twin records
   recall@5 for both ANN heads.

Usage: python .scale/scale_r15_bench.py
Writes /root/repo/SCALE_r15.json.
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
BV256 = "/root/repo/.scale/bigvec"
BV128 = "/root/repo/.scale/bigvec128"
for d, cmd in (
    (X10, "python .scale/make_scaled.py 10"),
    (BV256, "python .scale/make_bigvec.py"),
    (BV128, "python .scale/make_bigvec.py 128000 " + BV128),
):
    if not os.path.isdir(d):
        raise SystemExit(f"missing corpus {d}: run `{cmd}` first")

spark = get_spark(app_name="scale_r15", cpus=32)
out: dict = {"round": 15}


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def _floor(fn, reps=2):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 2))
        _clear()
    return min(times), times


# warm engine paths shared with bench.py (incl. one streaming start)
spark.read.parquet(os.path.join(X1, "region.parquet")).write.format(
    "noop"
).mode("overwrite").save()
from gerrydb_etl_spark.streaming.stream import run_stream_to_memory
from gerrydb_etl_spark.streaming.windows import tumbling

run_stream_to_memory(
    spark, "/root/testdata/sf0.001", lambda df: tumbling(df, "1 hour"),
    output_mode="complete", state_partitions=2,
)

# ---- part 1: streaming slopes --------------------------------------
STREAM_QS = [
    "events_stream_tumbling",
    "events_stream_file_sink",
    "orders_stream_checksum",
    "embeddings_stream_index_ingest",
]
stream_rec: dict = {"x1": {}, "x10": {}, "slopes_x1_to_x10": {}}
for tag, sf in (("x1", X1), ("x10", X10)):
    for q in STREAM_QS:
        floor, runs = _floor(
            lambda q=q, sf=sf: REGISTRY[q]
            .spark(spark, sf)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        stream_rec[tag][q] = floor
        print(f"stream {tag} {q}: {floor}s {runs}", flush=True)
for q in STREAM_QS:
    stream_rec["slopes_x1_to_x10"][q] = round(
        stream_rec["x10"][q] / stream_rec["x1"][q], 2
    )
out["streaming"] = stream_rec

# ---- part 2: pq/ivf unforced activation ----------------------------
from gerrydb_etl_spark.operators.ivf import ivf_topk
from gerrydb_etl_spark.operators.kmeans import (
    cells_for_corpus,
    needs_cell_split,
    split_oversized_cells,
)
from gerrydb_etl_spark.operators.pq import pq_adc_topk
from gerrydb_etl_spark.operators.similarity import cosine_topk
from gerrydb_etl_spark.sources.registry import load_table
from gerrydb_etl_spark.store.staging import (
    corpus_count,
    ensure_staged_ivf,
    ensure_staged_pq,
    staged_ivf,
    staged_pq,
)

act: dict = {}
for tag, sf in (("n128k", BV128), ("n256k", BV256)):
    n = corpus_count(spark, sf, "embeddings")
    cells = cells_for_corpus(n, floor_k=16, per_cell=125)
    assert cells == 512, (tag, cells)  # the REAL cap binds, unforced
    assert needs_cell_split(n, per_cell=125)
    rec = act[tag] = {"n_vecs": n, "cells": cells}
    t0 = time.perf_counter()
    ensure_staged_ivf(spark, sf, n_cells=cells, iters=2)
    rec["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    ensure_staged_pq(spark, sf, m_subs=4, n_codes=16, iters=2)
    rec["pq_build_s"] = round(time.perf_counter() - t0, 1)
    print(f"{tag}: ivf_build {rec['ivf_build_s']}s "
          f"pq_build {rec['pq_build_s']}s", flush=True)
act["build_slopes_128k_to_256k"] = {
    "ivf": round(act["n256k"]["ivf_build_s"] / act["n128k"]["ivf_build_s"], 2),
    "pq": round(act["n256k"]["pq_build_s"] / act["n128k"]["pq_build_s"], 2),
}

# unforced two-level split + the two ANN heads at 256k
assigned, cents = staged_ivf(spark, BV256, 512, 2)
t0 = time.perf_counter()
split_asn, sub_cents = split_oversized_cells(assigned, per_cell=125)
split_asn = split_asn.persist()
n_split_cells = sub_cents.select("cluster_id").distinct().count()
n_blocks = split_asn.select("cluster_id", "sub_id").distinct().count()
act["split_s"] = round(time.perf_counter() - t0, 1)
act["cells_split"] = n_split_cells
act["blocks"] = n_blocks
assert n_split_cells > 0, "no unforced splits — corpus not skewed enough"
print(f"split: {n_split_cells} cells -> {n_blocks} blocks "
      f"in {act['split_s']}s", flush=True)

emb = load_table(spark, BV256, "embeddings")
queries = emb.filter(F.col("vec_id") < 64)

t0 = time.perf_counter()
ivf_res = ivf_topk(
    emb, queries, k=5, n_probe=4,
    model=(split_asn, cents), sub_model=sub_cents,
).persist()
ivf_rows = ivf_res.count()
act["ivf_topk_twolevel_s"] = round(time.perf_counter() - t0, 1)

# floor-parameter point first (the defect record: the driver-scale
# literals stop resolving neighbors at production occupancy — the
# knob-by-knob recovery table lives in pq_tuning_r15.py's block)
books, codes = staged_pq(spark, BV256, 4, 16, 2)
t0 = time.perf_counter()
pq_res = pq_adc_topk(
    emb, queries, k=5, n_cells=512, n_probe=4, iters=2,
    m_subs=4, n_codes=16, refine=8,  # the floor literals
    model=(assigned, cents), books=books, codes=codes,
).persist()
pq_rows = pq_res.count()
act["pq_adc_topk_s"] = round(time.perf_counter() - t0, 1)
act["pq_floor_params"] = [4, 16, 8]
print(f"ivf_topk(two-level) {act['ivf_topk_twolevel_s']}s "
      f"({ivf_rows} rows); pq_adc_topk {act['pq_adc_topk_s']}s "
      f"({pq_rows} rows)", flush=True)

# recall twin: exact top-5 over all 256k for the same 64 queries
t0 = time.perf_counter()
exact = (
    cosine_topk(emb, queries, k=5)
    .filter(F.col("query_id") != F.col("neighbor_id"))
    .select("query_id", "neighbor_id")
    .persist()
)
n_exact = exact.count()
act["exact_twin_s"] = round(time.perf_counter() - t0, 1)


def _recall(approx) -> float:
    hit = exact.join(
        approx.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
    ).count()
    return round(hit / n_exact, 3)


act["recall_at5"] = {"ivf_twolevel": _recall(ivf_res), "pq": _recall(pq_res)}
print("recall@5:", act["recall_at5"], flush=True)

# the SHIPPED corpus-scaled regime (pq_params_for_corpus — picked by
# the pq_tuning_r15.py knob sweep): build + query + recall at 256k
from gerrydb_etl_spark.operators.pq import pq_params_for_corpus

m_r, c_r, ref_r = pq_params_for_corpus(act["n256k"]["n_vecs"])
t0 = time.perf_counter()
ensure_staged_pq(spark, BV256, m_subs=m_r, n_codes=c_r, iters=2)
rule_build = round(time.perf_counter() - t0, 1)
books_r, codes_r = staged_pq(spark, BV256, m_r, c_r, 2)
t0 = time.perf_counter()
rule_res = pq_adc_topk(
    emb, queries, k=5, n_cells=512, n_probe=4, iters=2,
    m_subs=m_r, n_codes=c_r, refine=ref_r,
    model=(assigned, cents), books=books_r, codes=codes_r,
).persist()
rule_res.count()
act["pq_shipped_rule"] = {
    "params": [m_r, c_r, ref_r],
    "build_s": rule_build,
    "query_s": round(time.perf_counter() - t0, 1),
    "recall_at5": _recall(rule_res),
}
print("pq shipped rule:", act["pq_shipped_rule"], flush=True)
out["pq_activation"] = act

out["notes"] = (
    "streaming: first SCALE entries for the family; slopes are x10 "
    "wall ratios on min-of-2 floors. pq_activation: real 512-cell "
    "cap binding at BOTH 128k and 256k (k pinned, so build slopes "
    "test 'linear past cap' for the IVF and PQ builds); splits and "
    "the two-level ivf_topk probe engage unforced at 256k; recall@5 "
    "vs a 64-query exact twin."
)
with open("/root/repo/SCALE_r15.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out, indent=1, sort_keys=True))
