#!/usr/bin/env python
"""R16 drift attribution (VERDICT r15 item 1, second half): the r15
driver flagged bucket_checksum_diff (floor 0.982s -> 3.32/3.85s,
3.4x) and cdc_fuzzy_chunk_match (1.494s -> 4.67/5.03s, 3.1x) with
code untouched, both repeats slow, and none of the four same-tree
closing-band runs reproducing it. The bpe pair's shared cause
(per-query merge retraining) was found and staged structurally; these
two share no fixture or operator with the bpe pair and no cause was
visible in their plans, so this harness produces the per-stage
attribution the verdict asked for:

  * each query is timed REPS times at sf0.1 (driver bench scale) on
    the shipped code, against its ratcheted floor;
  * bucket_checksum_diff splits into (b1 digest) / (b2 digest) /
    (full outer join + verdict) — the only three plan regions;
  * cdc_fuzzy_chunk_match splits into (staged-codes read + CDC
    chunking) / (chunking + k-gram cset base) / (full pipeline:
    minhash, banding, cap, verify, top-1);
  * the staged token-code fixture is ensured FIRST and its wall
    recorded, so fixture staging can never masquerade as query cost.

Interpretation contract: if the local floors sit at/below the
ratcheted floors while the driver's numbers are 3x+, the cost is not
in the plan (no stage owns it locally) — host-side phase is the
remaining hypothesis, and the bench's floor-probe rule (bench.py,
r16) now forces >= 4 runs whenever a query sits above the bar, so
the r16 driver run either clears the flag or confirms it across
enough samples to call it real.

Usage: python .scale/drift_r16.py
Writes /root/repo/.scale/drift_r16.json.
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

spark = get_spark(app_name="drift_r16", cpus=32)
out: dict = {"round": 16, "sf_dir": SF_DIR, "reps": REPS}

# ratcheted floors for the comparison column
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


# warm (same paths as bench.py)
spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).write.format(
    "noop"
).mode("overwrite").save()

# fixture first, wall recorded separately
from gerrydb_etl_spark.store.staging import (  # noqa: E402
    ensure_staged_token_codes,
    staged_token_codes,
)

t0 = time.perf_counter()
ensure_staged_token_codes(spark, SF_DIR)
out["staging_token_codes_s"] = round(time.perf_counter() - t0, 3)

# ---- bucket_checksum_diff stage split -------------------------------
from gerrydb_etl_spark.queries.store_queries import (  # noqa: E402
    _DEL_MOD,
    _UPD_MOD,
    bucket_digest,
    order_cents,
)
from gerrydb_etl_spark.sources.registry import load_table  # noqa: E402

orders = load_table(spark, SF_DIR, "orders")
cents = order_cents(F.col("o_totalprice"))
upd = order_cents(
    F.col("o_totalprice")
    + F.when(F.col("o_orderkey") % _UPD_MOD == 0, F.lit(100.0)).otherwise(
        F.lit(0.0)
    )
)
bcd: dict = {"ratcheted_floor": FLOORS.get("bucket_checksum_diff")}
bcd["b1_digest"], bcd["b1_runs"] = _min_noop(
    lambda: bucket_digest(orders, cents, "n_base", "x_base")
)
bcd["b2_digest"], bcd["b2_runs"] = _min_noop(
    lambda: bucket_digest(
        orders.where(F.col("o_orderkey") % _DEL_MOD != 0), upd,
        "n_new", "x_new",
    )
)
bcd["full_query"], bcd["full_runs"] = _min_noop(
    lambda: REGISTRY["bucket_checksum_diff"].spark(spark, SF_DIR)
)
out["bucket_checksum_diff"] = bcd
print("bucket_checksum_diff:", json.dumps(bcd), flush=True)

# ---- cdc_fuzzy_chunk_match stage split ------------------------------
from gerrydb_etl_spark.operators.docprep import cdc_chunks  # noqa: E402
from gerrydb_etl_spark.operators.passages import kgram_hashes  # noqa: E402
from gerrydb_etl_spark.queries.docprep import CDC_K, CDC_MOD  # noqa: E402

cfm: dict = {"ratcheted_floor": FLOORS.get("cdc_fuzzy_chunk_match")}


def _chunks():
    codes = staged_token_codes(spark, SF_DIR)
    return cdc_chunks(
        load_table(spark, SF_DIR, "documents"),
        k=CDC_K, boundary_mod=CDC_MOD, codes=codes,
    )


def _cset_base():
    codes = staged_token_codes(spark, SF_DIR)
    kh = codes.select(
        "doc_id", kgram_hashes(F.col("codes"), CDC_K).alias("kh")
    )
    return (
        _chunks()
        .join(kh, "doc_id")
        .select(
            "doc_id", "chunk_idx", "chunk_fp",
            F.array_distinct(
                F.slice(
                    "kh",
                    F.col("start_tok") + 1,
                    F.greatest(
                        F.col("n_toks") - F.lit(CDC_K - 1), F.lit(0)
                    ),
                )
            ).alias("cset"),
        )
        .filter(F.size("cset") > 0)
    )


cfm["cdc_chunks"], cfm["chunks_runs"] = _min_noop(_chunks)
cfm["cset_base"], cfm["cset_runs"] = _min_noop(_cset_base)
cfm["full_query"], cfm["full_runs"] = _min_noop(
    lambda: REGISTRY["cdc_fuzzy_chunk_match"].spark(spark, SF_DIR)
)
out["cdc_fuzzy_chunk_match"] = cfm
print("cdc_fuzzy_chunk_match:", json.dumps(cfm), flush=True)

with open("/root/repo/.scale/drift_r16.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(out, indent=1, sort_keys=True))
