"""Build replicated scale-test corpora under /root/repo/.scale/x{R}/.

Replication contract (documented in PERF.md):
- documents: R replicas; replica r renames the vocabulary by suffixing
  every whitespace token with '-r' (a bijection on tokens), so each
  replica's near-dup pair structure is EXACTLY the sf0.1 structure and
  replicas share zero tokens -> totals scale linearly by design.
- embeddings: R replicas; replica r rotates the 64-dim vector by 6*r
  positions (norm-preserving; rotated copies decorrelate like unrelated
  vectors), vec_id += r * 10_000.
- orders/lineitem/customer/supplier/part/nation/region: R disjoint id-space
  replicas for the graph/join heads (keys shifted per replica).
"""
import duckdb, os, sys, shutil

SRC = "/root/testdata/sf0.1"
R = int(sys.argv[1])
# the embedding rotation must be taken mod the dimension (64): the
# old 6*r slice silently degenerated to the UNROTATED vector for
# r >= 11 (6r > 64 makes the head slice empty and the tail slice the
# whole list), so replicas 0 and 11..19 of an x20 build were EXACT
# copies — inflating cross-replica near-dup pairs and breaking the
# linear-by-design replication contract (found in the r14 battery).
# 6r mod 64 is injective for r < 32 (6r1 = 6r2 mod 64 -> r1 = r2
# mod 32), so cap R there rather than ship repeating rotations.
if R > 32:
    raise SystemExit(
        f"R={R}: embedding rotations 6r mod 64 repeat past r=31, "
        "which re-introduces exact-copy replicas — use a natural "
        "generator (make_sf1.py-style) beyond x32"
    )
OUT = f"/root/repo/.scale/x{R}"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

def write(table, sql):
    dest = f"{OUT}/{table}.parquet"
    if os.path.exists(dest):
        return
    con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
    print(table, "->", dest)

reps = f"(SELECT unnest(generate_series(0, {R-1})) AS r)"

# Replica id-space guards (ADVICE r16): the strides below (event_id +
# r*1_000_000, user_id + r*10_000, doc/vec_id + r*10_000, order/cust/
# supp keys) are safe for the CURRENT sf0.1 source but were never
# asserted — a regenerated or larger source would silently overlap
# replica id spaces, the same silent mis-scaling class the r16
# row-count assertions just caught. Assert source max ids < stride
# BEFORE replicating, mirroring the 6r-mod-64 rotation guard above.
_STRIDES = {
    "events": [("event_id", 1_000_000), ("user_id", 10_000)],
    "documents": [("doc_id", 10_000)],
    "embeddings": [("vec_id", 10_000)],
    "orders": [("o_orderkey", 1_000_000_000), ("o_custkey", 10_000_000)],
    "lineitem": [
        ("l_orderkey", 1_000_000_000),
        ("l_partkey", 10_000_000),
        ("l_suppkey", 1_000_000),
    ],
    "customer": [("c_custkey", 10_000_000)],
    "supplier": [("s_suppkey", 1_000_000)],
}
for _t, _cols in _STRIDES.items():
    for _c, _stride in _cols:
        _mx = con.execute(
            f"SELECT max({_c}) FROM read_parquet('{SRC}/{_t}.parquet')"
        ).fetchone()[0]
        if _mx >= _stride:
            raise SystemExit(
                f"{_t}.{_c}: source max {_mx} >= replica stride "
                f"{_stride} — replica id spaces would overlap; widen "
                "the stride before building scaled corpora"
            )

write("documents", f"""
  SELECT d.doc_id + e.r * 10000 AS doc_id,
         CASE WHEN e.r = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+)', '\\1-' || e.r, 'g') END AS text,
         d.lang, d.source, length(CASE WHEN e.r = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+)', '\\1-' || e.r, 'g') END)::BIGINT AS n_chars
  FROM read_parquet('{SRC}/documents.parquet') d, {reps} e
""")
write("embeddings", f"""
  SELECT v.vec_id + e.r * 10000 AS vec_id,
         CASE WHEN e.r = 0 THEN v.embedding
              ELSE list_concat(v.embedding[(6*e.r) % 64 + 1:],
                               v.embedding[:(6*e.r) % 64]) END AS embedding,
         v.label
  FROM read_parquet('{SRC}/embeddings.parquet') v, {reps} e
""")
write("orders", f"""
  SELECT o_orderkey + e.r * 1000000000 AS o_orderkey,
         o_custkey + e.r * 10000000 AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet') o, {reps} e
""")
write("lineitem", f"""
  SELECT l_orderkey + e.r * 1000000000 AS l_orderkey,
         l_partkey + e.r * 10000000 AS l_partkey,
         l_suppkey + e.r * 1000000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet') l, {reps} e
""")
write("customer", f"""
  SELECT c_custkey + e.r * 10000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet') c, {reps} e
""")
write("supplier", f"""
  SELECT s_suppkey + e.r * 1000000 AS s_suppkey,
         s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet') s, {reps} e
""")
# events: R replicas with DISJOINT event/user id spaces and the
# SAME event-time range — window structure (window count, watermark
# geometry) is preserved while row volume and keyed-state
# cardinality (users, dedup ids) scale linearly. The r15 battery
# silently COPIED events unscaled (this loop below used to include
# it), so its events_stream_* "slopes" of 0.97-1.03 were x1-vs-x1
# artifacts — caught by the SCALE_r16 input row-count assertion
# (VERDICT r15 item 7), which exists precisely for this failure.
write("events", f"""
  SELECT ev.event_id + e.r * 1000000 AS event_id,
         ev.ts,
         ev.user_id + e.r * 10000 AS user_id,
         ev.event_type, ev.value, ev.props
  FROM read_parquet('{SRC}/events.parquet') ev, {reps} e
""")
for t in ["part", "nation", "region"]:
    dest = f"{OUT}/{t}.parquet"
    if not os.path.exists(dest):
        shutil.copy(f"{SRC}/{t}.parquet", dest)
print("done", OUT)
