#!/usr/bin/env python
"""R17 microbench: sequential-fold dot/cosine spellings.

The vector rescore paths fold dot products with Catalyst
higher-order functions (aggregate over zip_with) — interpreted per
element, outside whole-stage codegen. An UNROLLED left-associative
chain ((0.0 + a1*b1) + a2*b2) + ... is the same float arithmetic in
the same order (bit-identical), but codegen-compiled. This measures
both on a realistic candidate-pair volume and asserts bitwise
equality.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")

from pyspark.sql import functions as F  # noqa: E402

from gerrydb_etl_spark.operators.similarity import dot, norm  # noqa: E402
from gerrydb_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="opt_r17_foldbench", cpus=32)

emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
n = emb.count()
dim = len(emb.select("embedding").first()[0])
print(f"corpus n={n} dim={dim}")

dv = F.transform("embedding", lambda x: x.cast("double"))
a = emb.select(F.col("vec_id").alias("d1"), dv.alias("av"),
               (F.col("vec_id") % 40).alias("g"))
b = emb.select(F.col("vec_id").alias("d2"), dv.alias("bv"),
               (F.col("vec_id") % 40).alias("g"))
pairs = a.join(b, "g").where(F.col("d1") < F.col("d2")).select(
    "d1", "d2", "av", "bv").localCheckpoint(eager=True)
npairs = pairs.count()
print(f"pairs={npairs}")


def unrolled_dot(ac, bc, d):
    expr = "CAST(0.0 AS DOUBLE)"
    for i in range(1, d + 1):
        expr = (f"({expr} + (CAST(element_at({ac}, {i}) AS DOUBLE) * "
                f"CAST(element_at({bc}, {i}) AS DOUBLE)))")
    return F.expr(expr)


def unrolled_norm(ac, d):
    expr = "CAST(0.0 AS DOUBLE)"
    for i in range(1, d + 1):
        expr = (f"({expr} + (CAST(element_at({ac}, {i}) AS DOUBLE) * "
                f"CAST(element_at({ac}, {i}) AS DOUBLE)))")
    return F.expr(f"sqrt({expr})")


def bench(label, df, reps=4):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.3f}", flush=True)


hof = pairs.select("d1", "d2",
                   (dot(F.col("av"), F.col("bv"))
                    / (norm(F.col("av")) * norm(F.col("bv")))).alias("c"))
unr = pairs.select("d1", "d2",
                   (unrolled_dot("av", "bv", dim)
                    / (unrolled_norm("av", dim)
                       * unrolled_norm("bv", dim))).alias("c"))

# bitwise equality first
diff = (hof.withColumnRenamed("c", "c1")
        .join(unr.withColumnRenamed("c", "c2"), ["d1", "d2"])
        .where("c1 IS DISTINCT FROM c2").count())
print(f"bitwise diffs: {diff}")
assert diff == 0, "unrolled spelling is NOT value-identical"

t0 = time.perf_counter()
_ = unr.schema
print(f"unrolled construct+analyze: {time.perf_counter()-t0:.3f}")

bench("HOF fold cosine", hof)
bench("unrolled cosine", unr)

# dot-only comparison (the rescore paths fold norms once per row)
hof_d = pairs.select((dot(F.col("av"), F.col("bv"))).alias("c"))
unr_d = pairs.select(unrolled_dot("av", "bv", dim).alias("c"))
bench("HOF fold dot-only", hof_d)
bench("unrolled dot-only", unr_d)
print("done")
