"""PQ parameter knob sweep at the 256k activation point (SCALE_r15
addendum): the battery's first pq_activation entry measured
recall@5 = 0.109 for the shipped (m=4, codes=16, refine=8) books
against a 0.872 IVF candidate ceiling — inside a dense natural
cluster most candidates quantize to IDENTICAL code words, the ADC
shortlist is tie-noise, and the exact rescore cannot repair what
never enters it. This sweep varies (m_subs, n_codes, refine) one
knob at a time over the same corpus / coarse model / 64-query exact
twin, and its result table picked the production rule now shipped as
operators/pq.py pq_params_for_corpus (floors below PQ_ACTIVATE — the
oracle literals — and (4, 64, 32) past it; codes capped at 64, the
literal-codegen cliff).

Usage: python .scale/pq_tuning_r15.py
Merges a "pq_tuning" block into /root/repo/SCALE_r15.json.
"""

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_MASTER", "local[32]")
sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.pq import pq_adc_topk
from gerrydb_etl_spark.operators.similarity import cosine_topk
from gerrydb_etl_spark.session import get_spark
from gerrydb_etl_spark.sources.registry import load_table
from gerrydb_etl_spark.store.staging import (
    ensure_staged_pq,
    staged_ivf,
    staged_pq,
)

BV = "/root/repo/.scale/bigvec"
SWEEP = [
    (4, 16, 8),    # the floor literals — the defect point
    (4, 16, 32),   # refine alone
    (4, 64, 4),    # codes alone
    (4, 64, 16),
    (4, 64, 32),   # the shipped rule past PQ_ACTIVATE
    (4, 256, 4),   # past the literal-codegen cliff
    (8, 16, 16),   # subspaces alone
    (8, 64, 32),
]

spark = get_spark(app_name="pq_tuning_r15", cpus=32)
emb = load_table(spark, BV, "embeddings")
queries = emb.filter(F.col("vec_id") < 64)
assigned, cents = staged_ivf(spark, BV, 512, 2)
exact = (
    cosine_topk(emb, queries, k=5)
    .filter(F.col("query_id") != F.col("neighbor_id"))
    .select("query_id", "neighbor_id")
    .persist()
)
n_exact = exact.count()

table = {}
for m, codes, refine in SWEEP:
    t0 = time.perf_counter()
    ensure_staged_pq(spark, BV, m_subs=m, n_codes=codes, iters=2)
    build = round(time.perf_counter() - t0, 1)
    books, code_df = staged_pq(spark, BV, m, codes, 2)
    t0 = time.perf_counter()
    res = pq_adc_topk(
        emb, queries, k=5, n_cells=512, n_probe=4, iters=2,
        m_subs=m, n_codes=codes, refine=refine,
        model=(assigned, cents), books=books, codes=code_df,
    ).persist()
    res.count()
    wall = round(time.perf_counter() - t0, 1)
    hit = exact.join(
        res.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
    ).count()
    table[f"m{m}_c{codes}_r{refine}"] = {
        "build_s": build,  # 0.0 = staged earlier in the session
        "query_s": wall,
        "recall_at5": round(hit / n_exact, 3),
    }
    print(f"m={m} codes={codes} refine={refine}: {table[list(table)[-1]]}",
          flush=True)
    res.unpersist()

path = "/root/repo/SCALE_r15.json"
doc = json.load(open(path)) if os.path.exists(path) else {"round": 15}
doc["pq_tuning"] = {
    "corpus": "bigvec 256k, 512-cell coarse model, 64-query exact twin",
    "ivf_candidate_ceiling_recall": 0.872,
    "sweep": table,
    "shipped_rule": "pq_params_for_corpus: floors <= PQ_ACTIVATE "
                    "(=64k), then (4, min(64, n//4000), 32)",
}
with open(path, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(doc["pq_tuning"], indent=1, sort_keys=True))
