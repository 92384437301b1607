#!/usr/bin/env python
"""R15 drift attribution (VERDICT r14 item 2): pq_adc_topk's floor
moved 3.62s -> 5.25s (+42%) r13 -> r14 with no code change to the PQ
path; the vector family moved together. Two suspects: the r14
fan_out (an extra corpus exchange at sf0.1 — query-side for the
multiprobe family, fixture-layout-side for the staged-model
consumers) and the documented +-20% host band.

Design: at sf0.1 / local[32], (A) time the full pq_adc_topk and
ivf_multiprobe_twolevel queries plus a stage-split of pq_adc_topk
(model load / IVF candidates / ADC / full) with the shipped code;
(B) monkeypatch fan_out to identity, drop + restage the st_* model
fixtures (their layout inherits the training plan's partitioning),
and re-time. A ~= r14 floor and B ~= r13 floor => fan_out; A ~= r13
floor already => host band.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("DRIFT_REPS", "3"))


def _min_noop(df_fn, reps=REPS):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df_fn().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    return min(times), times


def _drop_staged_models(spark):
    for row in spark.sql("SHOW TABLES").collect():
        t = row["tableName"]
        if t.startswith(("st_ivf", "st_pq", "st_kmeans")):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def measure(spark, label, out):
    from pyspark.sql import functions as F

    from gerrydb_etl_spark.queries import REGISTRY
    from gerrydb_etl_spark.queries.llm_similarity import (
        _IVF_CELLS,
        _IVF_ITERS,
        _IVF_PROBE,
        _PQ_CODES,
        _PQ_M,
    )
    from gerrydb_etl_spark.store.staging import (
        ensure_staged_ivf,
        ensure_staged_kmeans,
        ensure_staged_pq,
        staged_ivf,
        staged_pq,
    )

    rec = out[label] = {}
    t0 = time.perf_counter()
    ensure_staged_kmeans(spark, SF_DIR, k=8, iters=3)
    ensure_staged_kmeans(spark, SF_DIR, k=4, iters=2)
    ensure_staged_ivf(spark, SF_DIR, _IVF_CELLS, _IVF_ITERS)
    ensure_staged_ivf(spark, SF_DIR, 4, 2)
    ensure_staged_pq(spark, SF_DIR, _PQ_M, _PQ_CODES, _IVF_ITERS)
    rec["staging_s"] = round(time.perf_counter() - t0, 3)

    # stage-split: model load (centroid/codebook collects)
    t0 = time.perf_counter()
    assigned, cents = staged_ivf(spark, SF_DIR, _IVF_CELLS, _IVF_ITERS)
    books, codes = staged_pq(spark, SF_DIR, _PQ_M, _PQ_CODES, _IVF_ITERS)
    rec["model_load_s"] = round(time.perf_counter() - t0, 3)

    # stage-split: IVF candidate generation alone
    from gerrydb_etl_spark.operators.kmeans import assign_topn, quantize
    from gerrydb_etl_spark.sources.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)

    def cand_df():
        qq = quantize(queries)
        probes = F.broadcast(
            assign_topn(qq, cents, _IVF_PROBE).select(
                F.col("vec_id").alias("query_id"),
                F.col("cluster_id").alias("cell"),
            )
        )
        return assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cluster_id").alias("cell"),
        ).join(probes, "cell").filter(F.col("query_id") != F.col("neighbor_id"))

    rec["cand_floor_s"], rec["cand_runs"] = _min_noop(cand_df)

    # full queries, bench-style floors
    for q in ("pq_adc_topk", "ivf_multiprobe_twolevel", "ivf_blocked_neardup",
              "embedding_neardup"):
        floor, runs = _min_noop(
            lambda q=q: REGISTRY[q].spark(spark, SF_DIR)
        )
        rec[q] = {"floor_s": floor, "runs": runs}
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    print(label, json.dumps(rec), flush=True)


def main():
    os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
    from gerrydb_etl_spark.session import get_spark

    spark = get_spark(app_name="drift-r15", cpus=32)
    out: dict = {"sf_dir": SF_DIR, "reps": REPS}

    # warm JVM + python worker pool like bench.py
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()

    @pandas_udf("long")
    def _w(s: pd.Series) -> pd.Series:
        return s

    spark.range(0, 32_000, 1, 32).select(_w(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    measure(spark, "A_fanout_on", out)

    # condition B: fan_out -> identity, fresh fixture layout
    from gerrydb_etl_spark.operators import ivf as ivf_mod
    from gerrydb_etl_spark.operators import partitioning

    ident = lambda df, min_partitions=None: df  # noqa: E731
    partitioning.fan_out = ident
    ivf_mod.fan_out = ident
    _drop_staged_models(spark)
    measure(spark, "B_fanout_off", out)

    with open(os.path.join(os.path.dirname(__file__), "drift_r15.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k.startswith(("A_", "B_"))},
                     indent=1))


if __name__ == "__main__":
    main()
