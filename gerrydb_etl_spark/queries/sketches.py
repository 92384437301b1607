"""Mergeable-sketch rollups (Datasketches HLL).

The 100 TB pattern this demonstrates: distinct-count rollups over
append-only data should never re-scan history. Each ingest slice
persists a tiny binary HLL sketch per group (here: one per
(priority, status) cell); any later rollup — per priority, per day,
global — is a `hll_union_agg` over the stored sketches, an
O(groups) merge instead of an O(rows) re-scan. Spark 3.5+ ships the
Apache Datasketches HLL build/merge/estimate functions JVM-side
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), so
the whole pipeline is whole-stage-codegen'd aggregation: partial
sketches combine map-side exactly like partial sums, and the merged
sketch column is what a versioned store would persist.

Like `approx_distinct_customers` (queries/joins_extra.py), the
estimate is engine-specific, so the registered query reports a
tolerance VERDICT rather than the raw estimate: the exact distinct
count plus whether the two-level sketch rollup landed within 5% of
it (lgConfigK=12 -> relative standard error ~1.6%; 5% is ~3 sigma).
The DuckDB oracle computes the exact count and asserts TRUE, giving
the approximate rollup a full value-hash row.

Reference parity note: the reference has no sketch layer at all
(its distinct counts are pandas `nunique`, e.g.
gerrydb_etl/pl_localities.py); this is a scale extra in the spirit
of SURVEY §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources.registry import load_table


def sketch_partials(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of value_col — the persistable partial.
    One binary column per group; merging partials with
    `merge_sketches` over a coarser grouping replaces re-scanning
    the rows the partials were built from."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch")
    )


def merge_sketches(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll partial sketches up to a coarser grouping: pure merge,
    never touches the base rows. Shuffle volume is one ~2^lgK-byte
    sketch per input group, independent of base-table size. Note the
    merge is statistically (not bit-) equivalent to direct sketching:
    Datasketches unions via an HLL_8 gadget, so estimates can drift a
    fraction of a percent from a directly-built sketch while staying
    inside the lgK error envelope (pinned in tests/test_sketches.py)."""
    return partials.groupBy(*group_cols).agg(
        F.hll_union_agg("hll_sketch").alias("hll_sketch")
    )


@query(
    "hll_sketch_rollup",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs_exact,
           TRUE AS within_5pct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable rollup: build per-(priority, status)
    partial sketches of o_custkey, then merge the partials up to
    per-priority WITHOUT re-reading orders — the merge input is 15
    sketch rows, not 1.5M order rows. Reported as a tolerance
    verdict against the exact per-priority distinct count (computed
    from the base table here purely to anchor the oracle; a
    production rollup would not run it)."""
    orders = load_table(spark, sf_dir, "orders")
    partials = sketch_partials(
        orders, ["o_orderpriority", "o_orderstatus"], "o_custkey"
    )
    merged = merge_sketches(partials, ["o_orderpriority"]).select(
        "o_orderpriority",
        F.hll_sketch_estimate("hll_sketch").alias("_approx"),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs_exact")
    )
    return (
        merged.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_custs_exact",
            (
                F.abs(F.col("_approx") - F.col("n_custs_exact"))
                <= F.lit(0.05) * F.col("n_custs_exact")
            ).alias("within_5pct"),
        )
    )


@query(
    "hll_overlap_estimate",
    oracle="""
    SELECT CAST((
        SELECT COUNT(DISTINCT a.o_custkey) FROM orders a
        WHERE a.o_orderpriority = '1-URGENT'
          AND a.o_custkey IN (SELECT o_custkey FROM orders
                              WHERE o_orderpriority = '5-LOW')
    ) AS BIGINT) AS n_overlap_exact,
    TRUE AS within_10pct
    """,
)
def hll_overlap_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based set-overlap estimation via inclusion-exclusion:
    |A ∩ B| ≈ est(A) + est(B) - est(A ∪ B), all three read from the
    SAME per-segment partial sketches (one conditional hll_union_agg
    each — no re-scan, no join between the estimates). The 100 TB
    use-case is cross-corpus contamination rate: how many training
    customers/documents also appear in a held-out segment, answered
    from stored per-segment sketches in O(segments) merge time.

    Error compounds across three estimates (~sqrt(3) x the per-sketch
    RSE of ~1.6% at lgConfigK=12), so the verdict tolerance is 10%
    (~3 sigma) against the exact intersection, which the oracle
    computes SQL-side and which anchors the value-hash row.
    """
    orders = load_table(spark, sf_dir, "orders")
    a, b = "1-URGENT", "5-LOW"
    two = orders.filter(F.col("o_orderpriority").isin(a, b))
    parts = sketch_partials(two, ["o_orderpriority"], "o_custkey")
    sk = F.col("hll_sketch")
    pri = F.col("o_orderpriority")
    ests = parts.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(pri == a, sk))
        ).alias("_est_a"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(pri == b, sk))
        ).alias("_est_b"),
        F.hll_sketch_estimate(F.hll_union_agg(sk)).alias("_est_union"),
    )
    exact = (
        two.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("_n_pri"))
        .agg(
            F.sum(F.when(F.col("_n_pri") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_overlap_exact")
        )
    )
    # Combine the two one-row frames by union + final max-collapse:
    # a 1x1 join on a literal key would plan as a nested-loop join,
    # which the plan-shape guard (rightly) forbids everywhere.
    combined = ests.unionByName(exact, allowMissingColumns=True).agg(
        *[
            F.max(c).alias(c)
            for c in ("_est_a", "_est_b", "_est_union", "n_overlap_exact")
        ]
    )
    overlap_est = F.col("_est_a") + F.col("_est_b") - F.col("_est_union")
    return combined.select(
        "n_overlap_exact",
        (
            F.abs(overlap_est - F.col("n_overlap_exact"))
            <= F.lit(0.10) * F.col("n_overlap_exact")
        ).alias("within_10pct"),
    )


@query(
    "cms_heavy_hitters",
    oracle="""
    WITH cnt AS (
        SELECT token, COUNT(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
    ),
    dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
    sk AS (
        SELECT d,
               CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '|' || token), 1, 8) AS BIGINT) % 1024 AS b,
               CAST(SUM(n) AS BIGINT) AS c
        FROM cnt CROSS JOIN dd
        GROUP BY 1, 2
    ),
    probe AS (
        SELECT cnt.token, cnt.n, dd.d,
               CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR) || '|' || cnt.token), 1, 8) AS BIGINT) % 1024 AS b
        FROM cnt CROSS JOIN dd
    ),
    est AS (
        SELECT p.token, p.n, MIN(sk.c) AS est
        FROM probe p JOIN sk ON sk.d = p.d AND sk.b = p.b
        GROUP BY 1, 2
    ),
    thr AS (SELECT CAST(SUM(n) // 200 AS BIGINT) AS t FROM cnt)
    SELECT token, est AS est_count, n AS exact_count, n < thr.t AS is_false_positive
    FROM est, thr
    WHERE est >= thr.t
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the document token stream:
    build a 4x1024 row-salted-md5 CMS (operators/cms.py has the
    merge/broadcast scale model), probe every distinct token, and
    report the ones whose ESTIMATE clears 0.5% of the stream — with
    the exact count alongside and CMS false positives flagged
    (est >= T but exact < T; est < exact is impossible by
    construction). Deterministic hash family -> full value-hash
    oracle replaying build + probe in SQL."""
    from gerrydb_etl_spark.operators.cms import build_sketch, estimate, token_counts

    counts = token_counts(load_table(spark, sf_dir, "documents"))
    # exact integer total -> threshold folded in as a literal; the
    # oracle recomputes the identical exact sum on its side
    thr = int(counts.agg(F.sum("n")).first()[0]) // 200
    est = estimate(counts, build_sketch(counts))
    return est.filter(F.col("est") >= F.lit(thr)).select(
        "token",
        F.col("est").alias("est_count"),
        F.col("n").alias("exact_count"),
        (F.col("n") < F.lit(thr)).alias("is_false_positive"),
    )


HIST_BIN_WIDTH = 16


@query(
    "histogram_quantile_rollup",
    oracle=f"""
    WITH partials AS (
        SELECT lang, source, n_chars // {HIST_BIN_WIDTH} AS bin,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT lang, bin, SUM(cnt) AS cnt
        FROM partials GROUP BY lang, bin
    ),
    cum AS (
        SELECT lang, bin, cnt,
               SUM(cnt) OVER (PARTITION BY lang ORDER BY bin) AS c,
               SUM(cnt) OVER (PARTITION BY lang) AS total
        FROM merged
    )
    SELECT lang,
           CAST(MAX(total) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN c * 100 >= 50 * total THEN bin END)
                * {HIST_BIN_WIDTH} + {HIST_BIN_WIDTH} - 1 AS BIGINT) AS p50_ub,
           CAST(MIN(CASE WHEN c * 100 >= 90 * total THEN bin END)
                * {HIST_BIN_WIDTH} + {HIST_BIN_WIDTH} - 1 AS BIGINT) AS p90_ub,
           CAST(MIN(CASE WHEN c * 100 >= 99 * total THEN bin END)
                * {HIST_BIN_WIDTH} + {HIST_BIN_WIDTH} - 1 AS BIGINT) AS p99_ub
    FROM cum GROUP BY lang
    """,
)
def histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram sketch with quantile readout — the
    distribution-monitoring primitive a pipeline tracks per shard
    (document length drift, quality score drift): per-(lang, source)
    fixed-width bin counts are the PARTIALS (mergeable by addition,
    persistable next to the data), the per-lang rollup merges
    O(groups x bins) partial rows — never re-scanning documents —
    and p50/p90/p99 upper bounds come off the merged histogram with
    exact integer cumulative rules (cum*100 >= q*total). Unlike the
    HLL rollup's tolerance verdict, every number here is
    deterministic, so the oracle is a full value-hash replay.

    Scale: level-1 is one map-side-combined groupBy; the merge and
    the per-lang cumulative window run over dimension x bin
    cardinality (thousands of rows at any corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    partials = (
        docs.select(
            "lang",
            "source",
            (F.col("n_chars") / HIST_BIN_WIDTH).cast("long").alias("bin"),
        )
        .groupBy("lang", "source", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql.window import Window

    merged = partials.groupBy("lang", "bin").agg(F.sum("cnt").alias("cnt"))
    wc = (
        Window.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("lang")
    cum = merged.select(
        "lang",
        "bin",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wt).alias("total"),
    )

    def q_ub(q: int, name: str):
        return (
            F.min(
                F.when(F.col("c") * 100 >= q * F.col("total"), F.col("bin"))
            )
            * HIST_BIN_WIDTH
            + (HIST_BIN_WIDTH - 1)
        ).cast("long").alias(name)

    return cum.groupBy("lang").agg(
        F.max("total").cast("long").alias("n_docs"),
        q_ub(50, "p50_ub"),
        q_ub(90, "p90_ub"),
        q_ub(99, "p99_ub"),
    )
