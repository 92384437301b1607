"""Re-measure the two dynamic-k consumers at x1 vs the natural sf1
after cells_for_corpus landed (the frozen-k spellings measured 248s /
152s at sf1 — the round-8 sweep's quadratic findings). Same protocol
as sf1_bench.py: min-of-2, staged fixtures warm by the first run."""
import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")
from gerrydb_etl_spark.queries import REGISTRY
from gerrydb_etl_spark.session import get_spark

HEADS = ["semantic_dedup_survivors", "embedding_split_leakage"]
SCALES = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}

spark = get_spark(app_name="sf1dynk", cpus=32)
out = {}
for tag, sf in SCALES.items():
    res = {}
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
print("SF1_DYNK " + json.dumps(out))
