"""Round-14 scale-slope harness (VERDICT r13 items 1 + 3):

1. The CAP-CLAMPED multiprobe regime, measured for the first time:
   every prior SCALE point had k below the 512-cell cap, so "past
   the cap the assign stage is strictly linear" rested on the cost
   model. Here the cap is FORCED low (k = 8 cells at both scales —
   the ivf_multiprobe_twolevel forcing trick applied to the scale
   axis) over the x10 and x20 replica corpora (20k / 40k vectors,
   structure-preserving replicas so totals scale linearly by
   construction), pinning k at cap while the data doubles. Stages
   recorded separately:
     - staging: top-level Lloyd training at k=cap (the index build —
       O(n * cap), expect ~2x for 2x data);
     - assign: the probes=2 literal-codebook ranking (O(n * cap),
       expect ~2x) — THE claim under test;
     - split_uncapped: the second-level grouped-Lloyd split with
       unbounded per-pass fan-out (the pre-r14 behavior, reproduced
       via fanout_cap=10^6): join volume sum(n_c * m_c) ~
       n^2/(cap * per_cell), expect ~4x for 2x data — the real
       super-linearity this battery exists to surface;
     - split_capped: the shipped fanout_cap bound (forced to 8 here
       so it binds at this scale; production default 64 binds only
       past 64 * per_cell occupancy): expect ~2x;
     - full: multiprobe_pairs end to end on the capped sub_model.
2. The geo/WKB kernel family's first SCALE entries (the one §2
   operator class with no slope artifact): the registered
   geo_point_roundtrip (input grows with the corpus) and
   geo_union_centroid (input FIXED at 500 rows by design — recorded
   for the registry, expect ~flat), plus an UNCAPPED union_by_key +
   centroid over the full customer table (15k -> 150k rows at the
   natural sf1) — the honest slope for the pandas-UDF UDAF.

Usage:  ROUND=14 python .scale/scale_r14_bench.py
Writes /root/repo/SCALE_r14.json.
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
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.store.staging import corpus_count, ensure_staged_ivf

ROUND = int(os.environ.get("ROUND", "14"))

for _d in ("x10", "x20", "sf1"):
    _p = f"/root/repo/.scale/{_d}"
    if not os.path.isdir(_p):
        _cmd = (
            "python .scale/make_sf1.py"
            if _d == "sf1"
            else f"python .scale/make_scaled.py {_d[1:]}"
        )
        raise SystemExit(
            f"missing scaled corpus {_p} — build it first with `{_cmd}`"
        )

CAP = 8            # forced cell cap: k pinned here at BOTH scales
PER_CELL = 125     # the multiprobe family's per_cell
FCAP = 8           # forced fan-out bound (production default is 64)
TAU, PROBES = 0.35, 2
MP_SCALES = {"x10": "/root/repo/.scale/x10", "x20": "/root/repo/.scale/x20"}
GEO_SCALES = {"x1": "/root/testdata/sf0.1", "sf1": "/root/repo/.scale/sf1"}

spark = get_spark(app_name=f"scale_r{ROUND}", cpus=32)


def timed(fn, reps=2):
    times = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t)
    return round(min(times), 2)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def drop_blocks():
    # NOT inside noop: the reused sub_model rides on localCheckpoint
    # blocks that a per-action unpersist would tear out from under
    # the next timed run (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


out = {"round": ROUND, "capped_regime": {}, "geo": {}}

# ---- 1. cap-clamped multiprobe regime -------------------------------
from gerrydb_etl_spark.operators.kmeans import (
    assign_topn,
    cells_for_corpus,
    multiprobe_pairs,
    needs_cell_split,
    quantize,
    split_oversized_cells,
)
from gerrydb_etl_spark.store.staging import staged_ivf

for tag, sf in MP_SCALES.items():
    n = corpus_count(spark, sf, "embeddings")
    # document that the production rule clamps to the forced cap here
    assert cells_for_corpus(n, floor_k=CAP, per_cell=PER_CELL, cap=CAP) == CAP
    assert needs_cell_split(n, per_cell=PER_CELL, cap=CAP)
    t0 = time.perf_counter()
    ensure_staged_ivf(spark, sf, n_cells=CAP, iters=2)
    staging = round(time.perf_counter() - t0, 2)
    assigned, cents = staged_ivf(spark, sf, CAP, 2)
    emb = load_table(spark, sf, "embeddings")

    t_assign = timed(lambda: noop(assign_topn(quantize(emb), cents, PROBES)))

    def run_split(fcap):
        split, _ = split_oversized_cells(
            assigned, per_cell=PER_CELL, fanout_cap=fcap
        )
        noop(split)
        drop_blocks()

    t_unc = timed(lambda: run_split(10**6))
    t_cap = timed(lambda: run_split(FCAP))

    sub_model = split_oversized_cells(
        assigned, per_cell=PER_CELL, fanout_cap=FCAP
    )
    # min-of-2 at BOTH endpoints: a single-run endpoint would sit in
    # the ±20% host-steal band the repo's bench floors are armored
    # against, biasing the slope itself (r14 review)
    t_full = timed(
        lambda: noop(
            multiprobe_pairs(
                emb, tau=TAU, centroids=cents, probes=PROBES,
                sub_model=sub_model,
            )
        )
    )
    pairs = multiprobe_pairs(
        emb, tau=TAU, centroids=cents, probes=PROBES, sub_model=sub_model
    ).count()
    drop_blocks()
    out["capped_regime"][tag] = {
        "n_vecs": n,
        "cells": CAP,
        "staging": staging,
        "assign": t_assign,
        "split_uncapped": t_unc,
        "split_capped": t_cap,
        "full": t_full,
        "out_pairs": pairs,
    }
    print(f"{tag}: n={n} staging={staging} assign={t_assign} "
          f"split_unc={t_unc} split_cap={t_cap} full={t_full} "
          f"pairs={pairs}", flush=True)

cr = out["capped_regime"]
out["capped_regime"]["slopes_x10_to_x20"] = {
    k: round(cr["x20"][k] / max(cr["x10"][k], 0.05), 1)
    for k in ("staging", "assign", "split_uncapped", "split_capped", "full")
}

# ---- 2. geo/WKB kernel family ---------------------------------------
from gerrydb_etl_spark.geo.kernels import st_box, st_centroid, union_by_key


def geo_union_uncapped(sf):
    cust = load_table(spark, sf, "customer")
    squares = cust.select(
        F.col("c_nationkey").cast("string").alias("nkey"),
        st_box(
            (F.col("c_custkey") % 50).cast("double"),
            F.floor(F.col("c_custkey") / 50).cast("double"),
            F.lit(0.5),
        ).alias("geom"),
    )
    unioned = union_by_key(squares, "nkey", "geom")
    c = st_centroid(F.col("geometry"))
    return unioned.select("key", c["x"].alias("cx"), c["y"].alias("cy"),
                          "n_parts")


for tag, sf in GEO_SCALES.items():
    n_cust = load_table(spark, sf, "customer").count()
    res = {"n_customers": n_cust}
    for name in ("geo_point_roundtrip", "geo_union_centroid"):
        res[name] = timed(lambda: noop(REGISTRY[name].spark(spark, sf)))
    res["geo_union_uncapped"] = timed(lambda: noop(geo_union_uncapped(sf)))
    drop_blocks()
    out["geo"][tag] = res
    print(f"{tag} geo: {res}", flush=True)

g = out["geo"]
out["geo"]["slopes_at_10x"] = {
    k: round(g["sf1"][k] / max(g["x1"][k], 0.05), 1)
    for k in ("geo_point_roundtrip", "geo_union_centroid",
              "geo_union_uncapped")
}

out["notes"] = (
    "Cap-clamped regime, first measurement (VERDICT r13 item 1): k is "
    f"pinned at the forced cap ({CAP} cells) at both 20k and 40k "
    "vectors, so the top-level training (staging) and the probes=2 "
    "literal-codebook ranking (assign) must scale with DATA ONLY — "
    "~2x for 2x data confirms 'strictly linear past the cap' for both "
    "the index build and the assign stage. The second-level split with "
    "UNBOUNDED per-pass fan-out is the found super-linearity: its "
    "grouped-assign join is sum(n_c*m_c) ~ n^2/(cap*per_cell) once k "
    "is capped (expected ~4x for 2x data), fixed this round by the "
    "fanout_cap bound (split_capped, expected ~2x; production default "
    "64, forced to 8 here so the bound binds at bench scale — the "
    "recursion refines still-oversized blocks, occupancy pinned by "
    "tests/test_kmeans.py::test_fanout_capped_pass_recurses...). "
    "geo_union_centroid's registered input is fixed at 500 rows by "
    "design (exact-oracle construction), so its slope is ~flat and "
    "geo_union_uncapped is the honest UDAF slope over the full "
    "customer table (15k -> 150k natural rows)."
)

with open(f"/root/repo/SCALE_r{ROUND}.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out["capped_regime"]["slopes_x10_to_x20"]))
print(json.dumps(out["geo"]["slopes_at_10x"]))
