#!/usr/bin/env python
"""R17 tail-target stage splits: pagerank, order_hierarchy_paths,
customer_rfm_segments, prefix_filter_jaccard.

Times each head's component stages in isolation (noop sink, cache
cleared between reps, min-of-N) so the optimization targets the
stage that actually owns the wall — the guide §1 discipline the
drift_r16/r17 probes established.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.session import get_spark  # noqa: E402
from gerrydb_etl_spark.sources import load_table  # noqa: E402

spark = get_spark(app_name="opt_r17_tailsplit", cpus=32)


def _clear():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


def timed(name, fn):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        if out is not None:
            out.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        _clear()
    print(f"{name}: floor {min(times)} runs {times}", flush=True)
    return min(times)


out = {}

# warm-up: one broadcast join + one parquet scan
warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
warm.join(
    F.broadcast(warm.select(F.col("r_regionkey").alias("k"))),
    warm["r_regionkey"] == F.col("k"),
).write.format("noop").mode("overwrite").save()

# ------------------------------------------------------- pagerank --
orders = load_table(spark, SF_DIR, "orders")
lineitem = load_table(spark, SF_DIR, "lineitem")


def pr_edges():
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


out["pagerank_edges_build"] = timed("pagerank_edges_build", pr_edges)


def pr_full():
    from gerrydb_etl_spark.queries import REGISTRY

    return REGISTRY["pagerank_fixed_point"].spark(spark, SF_DIR)


out["pagerank_full"] = timed("pagerank_full", pr_full)

# --------------------------------------------- order_hierarchy ----
from gerrydb_etl_spark.queries import REGISTRY  # noqa: E402


def hier_edges_only():
    region = load_table(spark, SF_DIR, "region")
    nation = load_table(spark, SF_DIR, "nation")
    cust = load_table(spark, SF_DIR, "customer")
    ordrs = load_table(spark, SF_DIR, "orders").where(
        F.col("o_custkey").isNotNull()
    )
    slug = lambda c: F.lower(F.regexp_replace(c, " ", "-"))  # noqa: E731
    root = spark.range(1).select(
        F.lit("us").alias("node_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.lit("us").alias("label"),
    )
    regions = region.select(
        F.concat(F.lit("r:"), F.col("r_regionkey")).alias("node_id"),
        F.lit("us").alias("parent_id"),
        slug(F.col("r_name")).alias("label"),
    )
    nations = nation.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("node_id"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("parent_id"),
        slug(F.col("n_name")).alias("label"),
    )
    customers = cust.select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("node_id"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("parent_id"),
        F.col("c_custkey").cast("string").alias("label"),
    )
    order_lvl = ordrs.select(
        F.concat(F.lit("o:"), F.col("o_orderkey")).alias("node_id"),
        F.concat(F.lit("c:"), F.col("o_custkey")).alias("parent_id"),
        F.col("o_orderkey").cast("string").alias("label"),
    )
    return (
        root.unionByName(regions)
        .unionByName(nations)
        .unionByName(customers)
        .unionByName(order_lvl)
    )


out["hier_edges_union_scan"] = timed("hier_edges_union_scan", hier_edges_only)
out["hier_full"] = timed(
    "hier_full", lambda: REGISTRY["order_hierarchy_paths"].spark(spark, SF_DIR)
)

# ------------------------------------------------------------ rfm --
def rfm_base():
    o = load_table(spark, SF_DIR, "orders").where(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    from gerrydb_etl_spark.functions.numeric import cents

    ref = o.agg(F.max("o_orderdate")).collect()[0][0]
    return o.groupBy("o_custkey").agg(
        F.datediff(F.lit(ref), F.max("o_orderdate")).cast("long").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(cents("o_totalprice")).alias("monetary_cents"),
    )


out["rfm_base_agg"] = timed("rfm_base_agg", rfm_base)


def rfm_one_rank():
    from gerrydb_etl_spark.operators.ids import assign_dense_ids

    base = rfm_base()
    return assign_dense_ids(base, ["recency_days", "o_custkey"], "_rr")


out["rfm_base_plus_1rank"] = timed("rfm_base_plus_1rank", rfm_one_rank)
out["rfm_full"] = timed(
    "rfm_full", lambda: REGISTRY["customer_rfm_segments"].spark(spark, SF_DIR)
)

# ------------------------------------------- prefix_filter_jaccard --
from gerrydb_etl_spark.store.staging import staged_shingles  # noqa: E402

rows_sh = staged_shingles(spark, SF_DIR, 3)
rows_sh.write.format("noop").mode("overwrite").save()  # stage untimed
_clear()

out["ppj_staged_rows_scan"] = timed(
    "ppj_staged_rows_scan", lambda: staged_shingles(spark, SF_DIR, 3)
)


def ppj_prefix_only():
    rows = staged_shingles(spark, SF_DIR, 3)
    from pyspark.sql.window import Window as W

    df_counts = rows.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = rows.join(df_counts, "shingle")
    pos = F.row_number().over(W.partitionBy("doc").orderBy("df", "shingle"))
    plen = (
        F.col("n_sh") - F.expr("(7 * n_sh + 9) div 10") + F.lit(1)
    )
    return ranked.select("doc", "n_sh", "shingle", pos.alias("pos")).where(
        F.col("pos") <= plen
    )


out["ppj_prefix_build"] = timed("ppj_prefix_build", ppj_prefix_only)
out["ppj_full"] = timed(
    "ppj_full", lambda: REGISTRY["prefix_filter_jaccard"].spark(spark, SF_DIR)
)

dest = os.path.join(os.path.dirname(os.path.abspath(__file__)), "opt_r17_tailsplit.json")
with open(dest, "w") as f:
    json.dump({"sf_dir": SF_DIR, "reps": REPS, "stages": out}, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out))
