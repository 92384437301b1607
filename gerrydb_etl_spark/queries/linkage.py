"""Fuzzy record linkage: blocked Levenshtein matching of dirty probe
names back to canonical entities.

Extends the reference's exact alias-resolution surface
(gerrydb_etl/bootstrap/..., mirrored by queries/resolution.py) with
the fuzzy variant every real linkage pipeline needs: probes that
don't match exactly are resolved by edit distance within a blocking
key. The corpus has no naturally dirty strings, so probes are
derived deterministically in-query (one character deleted from every
7th customer name at a key-dependent position) — the linkage
machinery (blocking, bounded candidate sets, distance threshold,
best-match ranking) is the operator under test, and determinism
makes the full DuckDB value-hash oracle possible.

Scale design: candidates are generated ONLY within a blocking key
(c_nationkey here — the classic "block on a clean attribute" move),
so the join is an equi-join whose fan-out is the block size, never
all-pairs. Best-match selection is a per-probe window over that
bounded candidate set. At 100 TB you would add a second blocking
pass (name-length band or first-token) and salt oversized blocks —
same guards operators/skew.py provides; a probe missing its block
(recall loss) is the documented blocking tradeoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

PROBE_MOD = 7       # every 7th customer becomes a dirty probe
MAX_DIST = 2        # levenshtein acceptance threshold
DEL_BASE = 10       # first digit position in 'Customer#000000000'
DEL_SPAN = 8        # deletion position = DEL_BASE + custkey % DEL_SPAN


@query(
    "fuzzy_blocked_match",
    oracle=f"""
    WITH probes AS (
        SELECT c_custkey AS probe_key, c_nationkey,
               substr(c_name, 1, {DEL_BASE} - 1 + CAST(c_custkey % {DEL_SPAN} AS INT))
               || substr(c_name, {DEL_BASE} + 1 + CAST(c_custkey % {DEL_SPAN} AS INT))
                   AS dirty_name
        FROM customer WHERE c_custkey % {PROBE_MOD} = 0
    ),
    cand AS (
        SELECT p.probe_key, p.dirty_name, c.c_custkey AS matched_key,
               c.c_name AS matched_name,
               levenshtein(p.dirty_name, c.c_name) AS dist
        FROM probes p JOIN customer c ON p.c_nationkey = c.c_nationkey
        WHERE levenshtein(p.dirty_name, c.c_name) <= {MAX_DIST}
    )
    SELECT probe_key, dirty_name, matched_key, matched_name,
           CAST(dist AS BIGINT) AS dist,
           probe_key = matched_key AS is_correct
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY probe_key ORDER BY dist, matched_key
                  ) AS rn
        FROM cand
    ) WHERE rn = 1
    """,
)
def fuzzy_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve deterministically-corrupted customer names back to the
    canonical customer table: block on nation, accept edit distance
    <= 2, keep the best match per probe (min distance, ties to the
    lowest key). `is_correct` reports linkage accuracy."""
    customer = load_table(spark, sf_dir, "customer")
    del_pos = (F.col("c_custkey") % DEL_SPAN).cast("int")
    probes = (
        customer.where(F.col("c_custkey") % PROBE_MOD == 0)
        .select(
            F.col("c_custkey").alias("probe_key"),
            "c_nationkey",
            F.concat(
                F.expr(f"substr(c_name, 1, {DEL_BASE} - 1 + CAST(c_custkey % {DEL_SPAN} AS INT))"),
                F.expr(f"substr(c_name, {DEL_BASE} + 1 + CAST(c_custkey % {DEL_SPAN} AS INT))"),
            ).alias("dirty_name"),
        )
    )
    # project the distance BEFORE filtering so levenshtein is
    # evaluated once per candidate pair, not once in the predicate
    # and again in the output projection
    # Broadcast the probe side: blocking keys are low-cardinality
    # (25 nations), so a shuffle join would cap parallelism at 25
    # partitions and skew on the biggest block; broadcasting the
    # (small) probe set keeps the big side free to parallelize. The
    # big side is round-robin repartitioned first because the edit-
    # distance evaluation — not the scan — dominates this join, and
    # a small parquet file arrives as one partition that would
    # serialize all of it on one core. At 100 TB the scan has
    # thousands of partitions and both the repartition and the probe
    # broadcast give way to a shuffle join + operators/skew.py
    # salting.
    fanout = customer.sparkSession.sparkContext.defaultParallelism
    cand = (
        F.broadcast(probes).join(customer.repartition(fanout), "c_nationkey")
        .select(
            "probe_key",
            "dirty_name",
            F.col("c_custkey").alias("matched_key"),
            F.col("c_name").alias("matched_name"),
            F.levenshtein("dirty_name", "c_name").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= MAX_DIST)
    )
    best = W.partitionBy("probe_key").orderBy("dist", "matched_key")
    return (
        cand.withColumn("rn", F.row_number().over(best))
        .where("rn = 1")
        .select(
            "probe_key",
            "dirty_name",
            "matched_key",
            "matched_name",
            "dist",
            (F.col("probe_key") == F.col("matched_key")).alias("is_correct"),
        )
    )


@query(
    "golden_record_merge",
    oracle="""
    WITH variants AS (
        SELECT c_custkey, 1 AS priority,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END
                   AS name,
               CASE WHEN c_custkey % 5 = 0 THEN NULL
                    ELSE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) END
                   AS acctbal_cents,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END
                   AS segment
        FROM customer
        UNION ALL
        SELECT c_custkey, 2,
               c_name || ' (crm)',
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT),
               c_mktsegment
        FROM customer
    ),
    filled AS (
        SELECT c_custkey,
               first_value(name IGNORE NULLS) OVER w AS name,
               first_value(acctbal_cents IGNORE NULLS) OVER w
                   AS acctbal_cents,
               first_value(segment IGNORE NULLS) OVER w AS segment,
               COUNT(*) OVER (PARTITION BY c_custkey) AS n_sources,
               ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY priority
               ) AS rn
        FROM variants
        WINDOW w AS (
            PARTITION BY c_custkey ORDER BY priority
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT c_custkey, name, acctbal_cents, segment,
           CAST(n_sources AS BIGINT) AS n_sources
    FROM filled WHERE rn = 1
    """,
)
def golden_record_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM survivorship (golden-record assembly): matched records
    from two sources merge into one canonical row by PER-FIELD
    precedence — each field takes the highest-priority source that
    actually has it (first non-null by priority), not whole-row
    last-wins (current_version_per_order) and not append-only
    versioning (SCD-2). The fixture derives the two sources
    deterministically from customer: source 1 (authoritative) with
    field gaps on modular keys, source 2 (a CRM feed) complete but
    lower priority with a decorated name — so every output field
    pattern (gap filled from below, gap everywhere, no gap) occurs.
    Per-field survivorship is first(ignorenulls) over the
    priority-ordered per-key window — one shuffle keyed by the
    entity id, exactly the merge shape at 100 TB (the window is
    per-entity over n_sources rows, never corpus-wide)."""
    from gerrydb_etl_spark.functions.numeric import cents

    cust = load_table(spark, sf_dir, "customer")
    acct_cents = cents("c_acctbal")
    v1 = cust.select(
        "c_custkey",
        F.lit(1).alias("priority"),
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("c_name")
        ).alias("name"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(acct_cents)
        .alias("acctbal_cents"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("c_mktsegment")
        ).alias("segment"),
    )
    v2 = cust.select(
        "c_custkey",
        F.lit(2).alias("priority"),
        F.concat(F.col("c_name"), F.lit(" (crm)")).alias("name"),
        acct_cents.alias("acctbal_cents"),
        F.col("c_mktsegment").alias("segment"),
    )
    variants = v1.unionByName(v2)
    w = (
        W.partitionBy("c_custkey")
        .orderBy("priority")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    filled = variants.select(
        "c_custkey",
        F.first("name", ignorenulls=True).over(w).alias("g_name"),
        F.first("acctbal_cents", ignorenulls=True).over(w).alias(
            "g_cents"
        ),
        F.first("segment", ignorenulls=True).over(w).alias("g_segment"),
        F.count("*").over(W.partitionBy("c_custkey")).alias("n_sources"),
        F.row_number()
        .over(W.partitionBy("c_custkey").orderBy("priority"))
        .alias("rn"),
    )
    return filled.where("rn = 1").select(
        "c_custkey",
        F.col("g_name").alias("name"),
        F.col("g_cents").alias("acctbal_cents"),
        F.col("g_segment").alias("segment"),
        F.col("n_sources").cast("long").alias("n_sources"),
    )
