"""Natural-distribution sf1 generator (VERDICT r7 item 7).

Builds /root/repo/.scale/sf1/ — a 10x-of-sf0.1 corpus with NATURAL
growth instead of the structure-preserving xR replicas:

* TPC-H-ish tables grow their KEY SPACES 10x (150k customers, 1.5M
  orders, ~6M lineitems) with fresh uniform/poisson draws — not
  shifted copies;
* documents get a Zipf(1.05) vocabulary of 20k wordforms obeying the
  law of abbreviation (frequent words short), 10-100-token docs,
  power-law source sizes, and PLANTED near-dup structure (6% exact
  duplicates + 8% two-token mutations of earlier docs) so the dedup
  heads do real work at scale;
* embeddings are 20k unit-norm vectors from 10 anisotropic Gaussian
  clusters in the same 64-dim space — natural cluster geometry, NOT
  the dimension-rotated replicas that degenerate the LSH anchor
  planes (PERF.md round-7 caveat);
* events are 1M rows over the same 30-day window with 15k users of
  Zipf-distributed activity.

Deterministic (numpy PCG64 seed 8). Output: one parquet FILE per
table (the driver's layout). Runtime ~1-2 min. Region/nation are
fixed dimensions, copied from sf0.1.
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/.scale/sf1"
SCALE = 10
N_CUST = 15_000 * SCALE
N_SUPP = 1_000 * SCALE
N_PART = 20_000 * SCALE
N_ORDERS = 150_000 * SCALE
N_EVENTS = 100_000 * SCALE
N_DOCS = 5_000 * SCALE
N_VECS = 2_000 * SCALE
N_USERS = 1_500 * SCALE
DIM = 64
VOCAB = 20_000

rng = np.random.default_rng(8)
os.makedirs(OUT, exist_ok=True)


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


# fixed dimensions: copy
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied")

# ---- customer / supplier / part --------------------------------
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2),
    "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, N_CUST)]),
}))

write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_SUPP), 2),
}))

TYPES = ["STANDARD BRUSHED", "SMALL PLATED", "MEDIUM POLISHED",
         "LARGE BURNISHED", "ECONOMY ANODIZED", "PROMO COATED"]
brand = rng.integers(1, 6, N_PART)
brand2 = rng.integers(1, 6, N_PART)
write("part", pa.table({
    "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
    "p_name": [f"part {i % 997} tone {i % 89}" for i in range(N_PART)],
    "p_brand": [f"Brand#{a}{b}" for a, b in zip(brand, brand2)],
    "p_type": pa.array(np.array(TYPES)[rng.integers(0, len(TYPES), N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900 + rng.uniform(0, 1200, N_PART), 2),
}))

# ---- orders / lineitem -----------------------------------------
DAY_US = 86_400_000_000
t0_orders = np.datetime64("1995-01-01", "us").astype(np.int64)
order_date = t0_orders + rng.integers(0, 2404, N_ORDERS) * DAY_US
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
o_custkey = rng.integers(0, N_CUST, N_ORDERS)
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(o_custkey, pa.int64()),
    "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, N_ORDERS)]),
    "o_totalprice": np.round(rng.uniform(900, 350_000, N_ORDERS), 2),
    "o_orderdate": pa.array(order_date, pa.timestamp("us")),
    "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, N_ORDERS)]),
}))

lines_per = 1 + np.minimum(rng.poisson(3.1, N_ORDERS), 6)
l_orderkey = np.repeat(np.arange(N_ORDERS), lines_per)
NL = len(l_orderkey)
l_linenumber = (np.arange(NL)
                - np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1)
qty = rng.integers(1, 51, NL).astype(np.float64)
price = np.round(qty * (900 + rng.uniform(0, 1200, NL)), 2)
ship = np.repeat(order_date, lines_per) + rng.integers(1, 121, NL) * DAY_US
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_orderkey, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL), pa.int64()),
    "l_linenumber": pa.array(l_linenumber, pa.int32()),
    "l_quantity": qty,
    "l_extendedprice": price,
    "l_discount": np.round(rng.integers(0, 11, NL) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, NL) / 100.0, 2),
    "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, NL)]),
    "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, NL)]),
    "l_shipdate": pa.array(ship, pa.timestamp("us")),
}))

# ---- events -----------------------------------------------------
ETYPES = ["click", "error", "purchase", "signup", "view"]
t0_ev = np.datetime64("2024-01-01", "us").astype(np.int64)
gaps = rng.exponential(30 * DAY_US / N_EVENTS, N_EVENTS)
ts = t0_ev + np.cumsum(gaps).astype(np.int64)
# Zipf user activity: rank-weighted sampling over N_USERS
uw = 1.0 / np.arange(1, N_USERS + 1) ** 0.8
uw /= uw.sum()
users = rng.choice(N_USERS, size=N_EVENTS, p=uw)
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
    "ts": pa.array(ts, pa.timestamp("us")),
    "user_id": pa.array(users, pa.int64()),
    "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, N_EVENTS)]),
    "value": np.round(rng.uniform(0, 200, N_EVENTS), 2),
    "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EVENTS)],
}))

# ---- documents: Zipf vocab + planted near-dup structure ---------
ABC = "abcdefghijklmnopqrstuvwxyz"


def wordform(rank: int) -> str:
    """Law of abbreviation: frequent (low-rank) words get short
    base-26 forms."""
    s, r = "", rank
    while True:
        s += ABC[r % 26]
        r //= 26
        if r == 0:
            return s


WORDS = np.array([wordform(r) for r in range(VOCAB)])
zw = 1.0 / np.arange(1, VOCAB + 1) ** 1.05
zw /= zw.sum()
LANGS = np.array(["en", "zh", "fr", "es", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
src_w = 1.0 / np.arange(1, 201) ** 0.7
src_w /= src_w.sum()

doc_lens = rng.integers(10, 101, N_DOCS)
texts: list[str] = []
for i in range(N_DOCS):
    u = rng.random()
    if i > 100 and u < 0.06:          # exact duplicate of an earlier doc
        texts.append(texts[rng.integers(0, i)])
    elif i > 100 and u < 0.14:        # near-dup: mutate 2 tokens
        toks = texts[rng.integers(0, i)].split(" ")
        for _ in range(2):
            toks[rng.integers(0, len(toks))] = WORDS[
                rng.choice(VOCAB, p=zw)
            ]
        texts.append(" ".join(toks))
    else:
        texts.append(" ".join(WORDS[rng.choice(VOCAB, size=doc_lens[i], p=zw)]))
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
    "text": texts,
    "lang": pa.array(LANGS[rng.choice(5, size=N_DOCS, p=lang_p)]),
    "source": [f"src{s}" for s in rng.choice(200, size=N_DOCS, p=src_w)],
    "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
}))

# ---- embeddings: 10 anisotropic Gaussian clusters, unit norm ----
centers = rng.normal(0, 1, (10, DIM))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_VECS)
spread = rng.uniform(0.15, 0.45, 10)[labels][:, None]
vecs = centers[labels] + rng.normal(0, 1, (N_VECS, DIM)) * spread
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
    "embedding": pa.array([v for v in vecs.astype(np.float32)],
                          pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))
print("sf1 done ->", OUT)
