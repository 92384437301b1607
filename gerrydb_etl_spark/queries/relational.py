"""Relational core: scans, projections, filters, joins, aggregations,
set ops, dedup, sorts/top-k (SURVEY.md §2.2-2.7).

Determinism conventions (shared with the DuckDB oracles):
  - double SUMs go through DECIMAL (see functions/numeric.py) so the
    result is independent of partial-aggregation order;
  - every computed column is aliased identically in Spark and SQL;
  - timestamps surfaced to results are formatted as strings.

Scale notes: dimension tables (region, nation, supplier, part) are
broadcast explicitly; fact-fact joins (orders x lineitem) shuffle on
the join key and rely on AQE for skew/coalesce. All filters are
plain column predicates -> parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.numeric import dec
from gerrydb_etl_spark.functions.strings import pathify, prefixed_key, slash_to_dashes
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

# Exact, order-independent revenue terms (see functions/numeric.py).
# Built lazily — Column construction needs an active SparkContext.
def _revenue():
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount"))


def _charge():
    return _revenue() * (F.lit(1).cast("decimal(3,2)") + dec("l_tax"))


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship).

    Covers: pushdown filter, hash aggregation with partial/final
    combine, multiple exact SUMs, computed averages. The group-by
    key has ~6 distinct values -> map-side combine collapses nearly
    all rows before the shuffle, so this scales linearly in input.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = dec("l_quantity")
    price = dec("l_extendedprice")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + agg + top-k.

    Covers: fact-fact shuffle join (orders x lineitem on orderkey),
    selective dimension filter, deterministic top-k (tie-break on
    key). customer is filtered before the join so Catalyst pushes
    the segment predicate into the scan.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "region_nation_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY r.r_name, n.n_name
    """,
)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped snowflake join: broadcast dims up the chain.

    region/nation are tiny at every scale -> explicit broadcast();
    customer->orders->lineitem shuffle on their keys. Mirrors the
    reference's broadcast lookup join (STATEFP -> state name,
    pl_localities.py:221-229) done as a dict map there.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the reference's legacy-county
    set difference (pl_localities.py:147-150: 2010 GEOIDs minus 2020
    GEOIDs) expressed as an anti-join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "rollup_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregation (engine target from §2.4 [absent])."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


@query(
    "cube_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation over both flag dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("qty"),
    )


@query(
    "mode_part_brand",
    oracle="""
    SELECT p_brand, n FROM (
        SELECT p_brand, COUNT(*) AS n
        FROM part GROUP BY p_brand
    ) ORDER BY n DESC, p_brand LIMIT 1
    """,
)
def mode_part_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) — the reference's modal UTM zone
    (pl_localities.py:86-92, Counter.most_common(1)) as
    count + order + limit with a deterministic tie-break."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(1)
    )


@query(
    "nations_per_region",
    oracle="""
    SELECT r.r_name AS region,
           array_to_string(array_agg(n.n_name ORDER BY n.n_name), ',') AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group-by collect-to-list — the reference's geographies-per-
    county grouping (pl_geo.py:118-122). Sorted + stringified so the
    result is order-deterministic under any partitioning."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "dedup_full_row",
    oracle="""
    SELECT l_returnflag, l_linestatus, l_qty_bucket, COUNT(*) AS n
    FROM (
        SELECT DISTINCT l_orderkey, l_returnflag, l_linestatus,
               CAST(FLOOR(l_quantity / 10) AS INTEGER) AS l_qty_bucket
        FROM lineitem
    )
    GROUP BY 1, 2, 3
    """,
)
def dedup_full_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup (dropDuplicates) — reference pl_geo.py:109-116
    dropping exactly-duplicate shapefile rows. Projected to a few
    columns first so duplicates actually exist, then re-aggregated."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_returnflag",
            "l_linestatus",
            # floor() on both sides: CAST(double AS INT) rounds half-up in
            # DuckDB but truncates in Spark — floor is engine-independent.
            F.floor(F.col("l_quantity") / 10).cast("int").alias("l_qty_bucket"),
        )
        .dropDuplicates()
        .groupBy("l_returnflag", "l_linestatus", "l_qty_bucket")
        .agg(F.count("*").alias("n"))
    )


@query(
    "union_distinct_keys",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL
        SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical union (unionByName) — reference pl_localities.py:152-157
    (2020 counties ∪ legacy 2010 counties)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.unionByName(supp).groupBy("k").agg(F.count("*").alias("n"))


@query(
    "intersect_nation_keys",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (§2.5 [absent] target)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.intersect(supp)


@query(
    "except_order_keys",
    oracle="""
    SELECT l_orderkey AS k FROM lineitem
    EXCEPT
    SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_order_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) set op — keyed set difference, the
    reference's legacy-county computation (pl_localities.py:147)."""
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    fo = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    return li.subtract(fo)


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot with an explicit value list (avoids the
    two-pass distinct-values scan — SURVEY.md §4 'needs custom work'
    item 3, the EAV pivot)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@query(
    "filters_membership",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_nationkey != 11
      AND c_acctbal >= 0.0
    """,
)
def filters_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality / negation / membership predicates — reference
    pl_localities.py:147-150 (isin), :192 (==), :225 (!=). All three
    push down to the parquet scan."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & (F.col("c_nationkey") != 11)
        & (F.col("c_acctbal") >= 0.0)
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "string_keys",
    oracle="""
    SELECT p_partkey,
           'part:' || CAST(p_partkey AS VARCHAR) AS part_path,
           replace(p_type, '/', '--') AS type_safe,
           replace(replace(lower(trim(p_name)), ' ', '-'), '.', '') AS name_slug
    FROM part
    """,
)
def string_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface: prefixed keys (pl_geo.py:140-145),
    slash->dashes (pl_geo.py:103-107), pathify slugs
    (__init__.py:59-61) — all as codegen'd Catalyst expressions."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        prefixed_key("part", F.col("p_partkey")).alias("part_path"),
        slash_to_dashes(F.col("p_type")).alias("type_safe"),
        pathify(F.col("p_name")).alias("name_slug"),
    )


@query(
    "topk_expensive_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
)
def topk_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans this as TakeOrderedAndProject —
    per-partition heap + single-row-exchange merge, no full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(25)
    )
