"""Natural-sf1 slopes for the late-round-8 operators (same protocol
as sf1_bench.py: min-of-2, staged fixtures in session prep)."""
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
    ensure_staged_pq,
    ensure_staged_token_codes,
)

HEADS = [
    "pq_adc_topk",
    "image_dhash_neardup",
    "cdc_fuzzy_chunk_match",
    "embeddings_stream_index_ingest",
    "priority_sample_topk",
]
SCALES = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}

spark = get_spark(app_name="sf1r8", cpus=32)
out = {}
for tag, sf in SCALES.items():
    t0 = time.perf_counter()
    ensure_staged_token_codes(spark, sf)
    ensure_staged_ivf(spark, sf, n_cells=16, iters=2)
    ensure_staged_pq(spark, sf, m_subs=4, n_codes=16, iters=2)
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
print("SF1_R8 " + json.dumps(out))
