#!/usr/bin/env python
"""R17 drift attribution (VERDICT r16 item 1a): the r16 driver run
left two sub-second queries far over their ratcheted floors but
under the 1.6x+1s absolute flag bar, so the floor-probe never fired:

  * embedding_drift_monitor  0.761s vs floor 0.255 (2.98x)
  * dsir_importance_weights  0.776s vs floor 0.288 (2.69x)

Both floors predate the r16 fan_out rollout (the gated round-robin
repartition of narrow scans up to cluster parallelism —
operators/partitioning.py). The verdict's hypothesis: the fan_out
repartition constant at sf0.1 makes the old floors unreachable by
design (the same change measured 4.0x BETTER at x10 scale, so it is
family-net-positive; the question is only whether the small-scale
floors need an audited re-base or whether some stage regressed).

Stage splits, each min-of-REPS at sf0.1 on the shipped code:

  dsir_importance_weights:
    * fanout_only     — fan_out(documents) noop (the repartition
                        constant in isolation)
    * tok_fanned      — explode + hash-bucket map, fanned (shipped)
    * tok_unfanned    — same, raw scan partitioning
    * full_fanned     — the registry query (shipped)
    * full_unfanned   — identical plan minus fan_out

  embedding_drift_monitor (input is the staged k-means fixture —
  no fan_out in the query itself, but the fixture is WRITTEN by
  kmeans_train whose internal fan_out changes the staged table's
  file layout):
    * staged_read     — staged assignment scan + select, noop
    * cnt_agg         — the (cluster_id, half) count only
    * sums_agg        — posexplode + per-(cell,half,dim) sum only
    * full_query      — the registry query (shipped)

Interpretation contract: if the unfanned dsir floor recovers ~the
ratcheted floor while the fanned floor matches the driver's number,
the drift is the fan_out constant — file the audited re-base
(BENCH_REBASE.json) citing this file. If a stage regressed beyond
the repartition cost, fix the stage instead.

Usage: python .scale/drift_r17.py
Writes /root/repo/.scale/drift_r17.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("DRIFT_REPS", "6"))

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="drift_r17", cpus=32)
out: dict = {"round": 17, "sf_dir": SF_DIR, "reps": REPS}

with open("/root/repo/BENCH_BASELINE_sf0.1.json") as f:
    FLOORS = json.load(f)["queries"]


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def _min_noop(df_fn, reps=REPS):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    return min(times), times


# warm (same paths as bench.py: parquet footers + pandas-UDF pool)
import pandas as pd  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402

warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()


@pandas_udf("long")
def _warm_udf(s: pd.Series) -> pd.Series:
    return s


spark.range(0, 32_000, 1, 32).select(_warm_udf(F.col("id"))).write.format(
    "noop"
).mode("overwrite").save()

# ---- dsir_importance_weights --------------------------------------
from gerrydb_etl_spark.functions.text import tokenize  # noqa: E402
from gerrydb_etl_spark.operators.partitioning import fan_out  # noqa: E402
from gerrydb_etl_spark.queries.lm_quality import (  # noqa: E402
    BENCH_MOD,
    FEATURE_BUCKETS,
    RATIO_SCALE,
)
from gerrydb_etl_spark.sources.registry import load_table  # noqa: E402

dsir: dict = {"ratcheted_floor": FLOORS.get("dsir_importance_weights")}
raw_docs = load_table(spark, SF_DIR, "documents")
dsir["scan_partitions"] = raw_docs.rdd.getNumPartitions()

dsir["fanout_only"], dsir["fanout_only_runs"] = _min_noop(
    lambda: fan_out(load_table(spark, SF_DIR, "documents"))
)
dsir["scan_only"], dsir["scan_only_runs"] = _min_noop(
    lambda: load_table(spark, SF_DIR, "documents")
)


def _dsir_tok(docs):
    return docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    ).select(
        "doc_id",
        (
            (F.length("tok").cast("long") * 256 + F.ascii("tok").cast("long"))
            % FEATURE_BUCKETS
        ).alias("f"),
    )


def _dsir_full(docs):
    tok = _dsir_tok(docs)
    raw = tok.groupBy("f").agg(F.count("*").alias("rcnt"))
    tgt = (
        tok.where(F.col("doc_id") % BENCH_MOD == 0)
        .groupBy("f")
        .agg(F.count("*").alias("tcnt"))
    )
    ratios = raw.join(tgt, "f", "left").select(
        "f",
        F.expr(
            f"({RATIO_SCALE} * (COALESCE(tcnt, 0) + 1)) div (rcnt + 1)"
        ).alias("ratio_e6"),
    )
    return (
        tok.join(F.broadcast(ratios), "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("ratio_e6").cast("long").alias("total_ratio_e6"),
            F.expr("sum(ratio_e6) div count(*)")
            .cast("long")
            .alias("avg_importance_e6"),
        )
    )


dsir["tok_fanned"], dsir["tok_fanned_runs"] = _min_noop(
    lambda: _dsir_tok(fan_out(load_table(spark, SF_DIR, "documents")))
)
dsir["tok_unfanned"], dsir["tok_unfanned_runs"] = _min_noop(
    lambda: _dsir_tok(load_table(spark, SF_DIR, "documents"))
)
dsir["full_fanned"], dsir["full_fanned_runs"] = _min_noop(
    lambda: REGISTRY["dsir_importance_weights"].spark(spark, SF_DIR)
)
dsir["full_unfanned"], dsir["full_unfanned_runs"] = _min_noop(
    lambda: _dsir_full(load_table(spark, SF_DIR, "documents"))
)
out["dsir_importance_weights"] = dsir
print("dsir_importance_weights:", json.dumps(dsir), flush=True)

# ---- embedding_drift_monitor ---------------------------------------
from gerrydb_etl_spark.queries.clustering import ITERS, K  # noqa: E402
from gerrydb_etl_spark.store.staging import (  # noqa: E402
    ensure_staged_kmeans,
    staged_kmeans,
)

t0 = time.perf_counter()
ensure_staged_kmeans(spark, SF_DIR, K, ITERS)
edm: dict = {
    "ratcheted_floor": FLOORS.get("embedding_drift_monitor"),
    "staging_kmeans_s": round(time.perf_counter() - t0, 3),
}


def _asn():
    return staged_kmeans(spark, SF_DIR, K, ITERS).select(
        "vec_id", "cluster_id", (F.col("vec_id") % 2).alias("half"), "qv"
    )


edm["staged_files"] = (
    _asn().rdd.getNumPartitions()
)
edm["staged_read"], edm["staged_read_runs"] = _min_noop(_asn)
edm["cnt_agg"], edm["cnt_agg_runs"] = _min_noop(
    lambda: _asn().groupBy("cluster_id", "half").agg(F.count("*").alias("n"))
)
edm["sums_agg"], edm["sums_agg_runs"] = _min_noop(
    lambda: _asn()
    .select("cluster_id", "half", F.posexplode("qv").alias("i0", "comp"))
    .groupBy("cluster_id", "half", (F.col("i0") + 1).alias("i"))
    .agg(F.sum("comp").alias("s"))
)
edm["full_query"], edm["full_query_runs"] = _min_noop(
    lambda: REGISTRY["embedding_drift_monitor"].spark(spark, SF_DIR)
)
out["embedding_drift_monitor"] = edm
print("embedding_drift_monitor:", json.dumps(edm), flush=True)

with open("/root/repo/.scale/drift_r17.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out, indent=1, sort_keys=True))
