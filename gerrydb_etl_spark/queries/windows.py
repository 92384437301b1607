"""Window functions (SURVEY.md §2.8 — absent in the reference,
engine target): ranking, analytic lag/lead, frame aggregates, and
the SCD-2 'current version' selection expressed as a window.

Every window below partitions before ordering — no global
ORDER BY over the whole dataset, so each partition's window is
computed locally after one hash shuffle on the partition key. That
is the only plan shape that survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.numeric import dec
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table


@query(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — deterministic tie-break on key."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile over one shared window spec (one shuffle).

    Cardinality contract: the partition key (c_nationkey, 25 values)
    bounds parallelism at 25 tasks, and ntile() forces each nation's
    full customer set through one task — at N customers/nation that
    task is O(N log N) sort + O(N) stream. This is the correct plan
    only while max-group-size fits one task comfortably (≲ tens of
    millions of rows); beyond that, rank()-by-threshold should be
    rewritten as a two-pass agg + broadcast-join (compute per-nation
    quantile boundaries first, then join), trading exact ntile
    semantics for unbounded scale. Kept as the window form here
    because the brief's data keeps groups small and the semantics
    exactly match the SQL oracle."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "running_revenue_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
)
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame; decimal accumulation
    keeps the prefix sums exact and engine-independent."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           date_diff('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey),
                     o_orderdate) AS gap_days
    FROM orders
    """,
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic: days since the customer's previous order."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("gap_days"),
    )


@query(
    "current_version_per_order",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def current_version_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Current version' selection — the window form of the
    reference's SCD-2 open-row query (db.py:123-133, valid_to IS
    NULL): latest row per key = row_number()=1 descending. Here the
    lineitem linenumber stands in for the version ordinal. The
    synthetic lineitem has duplicate (orderkey, linenumber) pairs,
    so quantity joins the ordering — a window pick is reproducible
    only if the sort key is total over the projected columns."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(F.desc("l_linenumber"), F.desc("l_quantity"))
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "trailing_window_features",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                OVER w AS BIGINT) AS cents_1h
    FROM (
        SELECT event_id, user_id, value,
               date_diff('second', TIMESTAMP '1970-01-01', ts) AS epoch_s
        FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
)
def trailing_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE-frame features: for every event, the count
    and exact cents-sum of the same user's events in the trailing
    hour (inclusive) — the trailing-window feature extraction that
    feeds ML training rows, and the one frame type (RANGE over a
    numeric event-time key, peers included on ties) the rows-frame
    queries can't express. One shuffle on user_id, in-partition sort,
    frame evaluated in a single pass — the shape that holds when the
    user count scales. Monetary values become integer cents before
    the window so the running sums are order-independent and
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").alias("epoch_s")
    cents = (
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )
    base = ev.select("event_id", "user_id", epoch, cents)
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3599, W.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum("cents").over(w).alias("cents_1h"),
    )
