#!/usr/bin/env python
"""R17: stage-split attribution for the round's optimization targets.

Times each target query's internal phases separately (noop sink per
phase, cache cleared between) so the optimization effort lands on
the phase that owns the wall, per guide §1. Read-only: uses the
production builders' own internals.

Usage: python .scale/opt_r17_split.py [target ...]
Targets: pagerank twolevel rfm triangles assoc hierarchy
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402
from gerrydb_etl_spark.sources import load_table  # noqa: E402

spark = get_spark(app_name="opt_r17_split", cpus=32)
targets = sys.argv[1:] or ["pagerank", "twolevel", "rfm", "triangles",
                           "assoc", "hierarchy"]


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        _clear()
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"  {label}: {best:.3f}", flush=True)
    return best


# warm-ups identical to bench.py
warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()
import pandas as pd  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def _warm_udf(s: pd.Series) -> pd.Series:
    return s


spark.range(0, 32_000, 1, 32).select(_warm_udf(F.col("id"))).write.format(
    "noop"
).mode("overwrite").save()


if "pagerank" in targets:
    print("pagerank_fixed_point (total floor ~3.37):", flush=True)
    t("full query", lambda: noop(
        REGISTRY["pagerank_fixed_point"].spark(spark, SF_DIR)))

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    customer = load_table(spark, SF_DIR, "customer")
    supplier = load_table(spark, SF_DIR, "supplier")

    def mk_edges():
        return (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .select((F.col("o_custkey") * 2).alias("src"),
                    (F.col("l_suppkey") * 2 + 1).alias("dst"))
            .distinct()
        )

    t("edges build (noop)", lambda: noop(mk_edges()))

    def nodes_count():
        customer.select((F.col("c_custkey") * 2).alias("node")).unionAll(
            supplier.select((F.col("s_suppkey") * 2 + 1).alias("node"))
        ).count()

    t("nodes count", nodes_count)

    def one_round():
        edges = mk_edges().persist()
        nodes = customer.select(
            (F.col("c_custkey") * 2).alias("node")
        ).unionAll(
            supplier.select((F.col("s_suppkey") * 2 + 1).alias("node"))
        ).persist()
        n = nodes.count()
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("outdeg")).persist()
        scores = nodes.select(
            "node", F.lit(10**12 // n).cast("long").alias("score")
        ).persist()
        dang = (scores.join(deg, "node", "left_anti")
                .agg(F.coalesce(F.sum("score"), F.lit(0))).first()[0])
        insum = (
            edges.join(scores.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .selectExpr("dst AS node", "score div outdeg AS contrib")
            .groupBy("node").agg(F.sum("contrib").alias("insum"))
        )
        noop(nodes.join(insum, "node", "left").selectExpr(
            "node", f"0 + (85 * (COALESCE(insum, 0) + {dang // n})) div 100"
            " AS score"))
        for df in (edges, nodes, deg, scores):
            df.unpersist()

    t("edges+deg+1 round (incl dang job)", one_round, reps=2)

if "twolevel" in targets:
    print("ivf_multiprobe_twolevel (total floor ~2.8):", flush=True)
    from gerrydb_etl_spark.operators import kmeans as km
    from gerrydb_etl_spark.queries.clustering import (
        _TLPER, _HITERS, _HK, _forced_per_cell,
    )
    from gerrydb_etl_spark.store.staging import (
        corpus_count, ensure_staged_ivf, staged_ivf, staged_split,
    )

    t("full query", lambda: noop(
        REGISTRY["ivf_multiprobe_twolevel"].spark(spark, SF_DIR)))

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, cents = staged_ivf(spark, SF_DIR, _HK, _HITERS)
    n = corpus_count(spark, SF_DIR, "embeddings")
    per_cell = _forced_per_cell(n, _TLPER)
    base_name, _cn = ensure_staged_ivf(spark, SF_DIR, _HK, _HITERS)
    sub_model = staged_split(spark, base_name, assigned,
                             per_cell=per_cell, iters=2)

    def build_blocks():
        quant = assigned.select("vec_id", "qv")
        top = km.assign_topn(quant, cents, 2)
        sub_asn, sub_cents = sub_model
        joined = top.join(
            sub_asn.select("vec_id", "cluster_id",
                           F.col("sub_id").alias("home_sub")),
            ["vec_id", "cluster_id"], "left",
        )
        from pyspark.sql.window import Window as W
        joined = joined.localCheckpoint(eager=False)
        home = joined.filter(F.col("home_sub").isNotNull()).select(
            "vec_id", "cluster_id", F.col("home_sub").alias("sub_id"), "qv")
        subs = sub_cents.select("cluster_id", "sub", "cv")
        cand = (joined.filter(F.col("home_sub").isNull())
                .join(subs, "cluster_id", "left")
                .select("vec_id", "cluster_id", "qv",
                        F.coalesce(F.col("sub"), F.lit(0)).alias("sub_id"),
                        F.when(F.col("sub").isNull(), F.lit(0.0))
                        .otherwise(km._sqdist(F.col("qv"), F.col("cv")))
                        .alias("d")))
        w = W.partitionBy("vec_id", "cluster_id").orderBy("d", "sub_id")
        sec = (cand.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("vec_id", "cluster_id", "sub_id", "qv"))
        return home.unionByName(sec)

    t("blocks (to qd checkpoint)", lambda: km._blocked_qd(build_blocks()))

    def pair_phase():
        # rebuild qd inside the rep: _clear() drops checkpoint blocks
        qd, cell_cols = km._blocked_qd(build_blocks())
        t0 = time.perf_counter()
        noop(km._same_cell_pairs(qd, cell_cols, 0.35)
             .select("d1", "d2", "cosine").distinct())
        print(f"    pair-only inner: {time.perf_counter()-t0:.3f}",
              flush=True)

    t("qd + pair join + distinct", pair_phase, reps=2)

if "rfm" in targets:
    print("customer_rfm_segments (total floor ~3.03):", flush=True)
    from gerrydb_etl_spark.operators.ids import assign_dense_ids
    from gerrydb_etl_spark.functions.numeric import cents

    t("full query", lambda: noop(
        REGISTRY["customer_rfm_segments"].spark(spark, SF_DIR)))

    orders = load_table(spark, SF_DIR, "orders").where(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull())
    t("ref collect (max date)", lambda: orders.agg(
        F.max("o_orderdate")).collect())
    ref = orders.agg(F.max("o_orderdate")).collect()[0][0]

    def mk_base():
        return orders.groupBy("o_custkey").agg(
            F.datediff(F.lit(ref), F.max("o_orderdate")).cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(cents("o_totalprice")).alias("monetary_cents"),
        ).withColumn("_negf", -F.col("frequency")).withColumn(
            "_negm", -F.col("monetary_cents"))

    t("base agg (noop)", lambda: noop(mk_base()))
    base = mk_base()
    t("one assign_dense_ids", lambda: noop(
        assign_dense_ids(base, ["recency_days", "o_custkey"], "_rr")))

if "triangles" in targets:
    print("copurchase triangle family:", flush=True)
    from gerrydb_etl_spark.queries.graph import _copurchase_edges
    from gerrydb_etl_spark.operators.triangles import triangle_counts

    t("copurchase_triangles full", lambda: noop(
        REGISTRY["copurchase_triangles"].spark(spark, SF_DIR)))
    t("clustering_coefficient full", lambda: noop(
        REGISTRY["clustering_coefficient"].spark(spark, SF_DIR)))
    t("edges build (noop)", lambda: noop(_copurchase_edges(spark, SF_DIR)))

    def tc_phase():
        edges = _copurchase_edges(spark, SF_DIR).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        noop(triangle_counts(edges))
        print(f"    triangle-only inner: {time.perf_counter()-t0:.3f}",
              flush=True)

    t("edges + triangle_counts", tc_phase, reps=2)

if "assoc" in targets:
    print("association_rules (total floor ~3.03):", flush=True)
    t("full query", lambda: noop(
        REGISTRY["association_rules"].spark(spark, SF_DIR)))
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))

    def baskets_count():
        b = li.groupBy("ok").agg(
            F.sort_array(F.array_distinct(F.collect_list("pk"))).alias("ps")
        ).persist()
        b.count()
        b.unpersist()

    t("baskets build + count", baskets_count)

if "hierarchy" in targets:
    print("order_hierarchy_paths (total floor ~2.74):", flush=True)
    t("full query", lambda: noop(
        REGISTRY["order_hierarchy_paths"].spark(spark, SF_DIR)))
print("done", flush=True)
