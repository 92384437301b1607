"""User-behavior analytics over the events stream: cohort retention,
Markov event transitions, and time-decayed engagement features.

These are the classic product-analytics / feature-pipeline rollups a
training-data platform runs next to its curation jobs (user-level
engagement features, funnel priors). All three are pure DataFrame
plans — per-user windows or keyed aggregations, no Python, no global
window — and all arithmetic is integer-exact (ppm ratios via integer
division, microsecond epoch diffs) so the DuckDB oracles replay
bit-for-bit.

Scale design: every shuffle is keyed by user_id or a tiny dimension
(cohort day, event type). Per-user windows parallelize across the
user population; the cohort/transition outputs are O(days^2) and
O(types^2) — broadcast-sized by construction, and the final ratio
joins are marked broadcast. Nothing here collects more than one
scalar (the decay reference instant, folded as a literal because a
1-row scalar join would compile to the banned
BroadcastNestedLoopJoin — see tests/test_plan_shapes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

PPM = 1_000_000
US_PER_HOUR = 3_600_000_000


@query(
    "cohort_retention",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    ch AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id),
    act AS (
        SELECT cohort_day,
               date_diff('day', cohort_day, day) AS offset_days,
               COUNT(*) AS n_active
        FROM ud JOIN ch USING (user_id)
        GROUP BY 1, 2
    ),
    sz AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM ch GROUP BY 1)
    SELECT cohort_day, offset_days, n_active, cohort_size,
           (1000000 * n_active) // cohort_size AS retention_ppm
    FROM act JOIN sz USING (cohort_day)
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention triangle: users are cohorted by their
    first active day; each later active day contributes to that
    cohort's (offset_days) cell. retention_ppm is the integer-exact
    parts-per-million share of the cohort still active at the offset.

    Plan: one distinct on (user, day), one per-user min, one keyed
    join back on user_id (AQE-broadcast eligible on the cohort side
    at small scale, plain shuffle join at large), then an O(days^2)
    rollup whose cohort-size join is an explicit broadcast — cohort
    days are bounded by the calendar, not the data."""
    events = load_table(spark, sf_dir, "events")
    user_day = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    cohort = user_day.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        user_day.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("offset_days"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return act.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        F.col("offset_days").cast("long").alias("offset_days"),
        "n_active",
        "cohort_size",
        F.expr("(1000000 * n_active) div cohort_size").alias("retention_ppm"),
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH t AS (
        SELECT lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type,
               event_type AS next_type
        FROM events
    ),
    c AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, SUM(n) AS total FROM c GROUP BY 1)
    SELECT prev_type, next_type, n,
           CAST((1000000 * n) // total AS BIGINT) AS p_ppm
    FROM c JOIN tot USING (prev_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive
    event types per user (ordered by event time, event_id
    tie-break), with integer-ppm transition probabilities. The
    output is O(|event types|^2) — a behavioral prior downstream
    rankers consume. The lag window is keyed by user_id (full
    parallelism across users); the probability normalization joins a
    broadcast-sized per-prev-type total."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = trans.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(1000000 * n) div total").cast("long").alias("p_ppm"),
    )


@query(
    "time_decayed_engagement",
    oracle=f"""
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events)
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(SUM({PPM} // (1 + (ref_us - epoch_us(ts)) // {US_PER_HOUR}))
               AS BIGINT) AS decayed_score
    FROM events CROSS JOIN ref
    GROUP BY user_id, event_type
    """,
)
def time_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement features per (user, event type):
    each event contributes 1e6 // (1 + age_in_hours) — a harmonic
    decay kernel chosen over exp(-age/tau) because it is
    integer-exact end to end (convention: no transcendental
    functions in oracled outputs; swap the kernel for exp at the
    cost of a float-tolerance check). The reference instant is the
    corpus max event time, a single MAX scalar collected and folded
    as a literal (a scalar-subquery join would compile to the banned
    BroadcastNestedLoopJoin); the aggregation itself is one
    map-side-combined groupBy on (user, type)."""
    events = load_table(spark, sf_dir, "events")
    ref_us = events.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    if ref_us is None:
        raise ValueError(
            f"events table is empty — no reference instant to decay "
            f"against in {sf_dir!r}"
        )
    weight = F.expr(
        f"{PPM} div (1 + ({ref_us} - unix_micros(ts)) div {US_PER_HOUR})"
    )
    return events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(weight).alias("decayed_score"),
    )


SESSION_GAP_MIN = 30
PATH_LEN = 3
PATH_TOPK = 10


@query(
    "session_path_topk",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL THEN 0
                    WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_idx
        FROM flagged
    ),
    ranked AS (
        SELECT user_id, session_idx, event_type,
               row_number() OVER (
                   PARTITION BY user_id, session_idx
                   ORDER BY ts, event_id
               ) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, session_idx,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= {PATH_LEN}
        GROUP BY user_id, session_idx
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOPK}
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session OPENING PATHS: the first 3 event types of
    each 30-minute-gap session, joined with '>' —
    the clickstream n-gram analysis between funnel_conversion_stages
    (fixed stage order) and event_transition_matrix (first-order
    pairs): it surfaces the empirically dominant multi-step entry
    sequences. Sessionization reuses the strictly-greater gap rule
    of session_id_assignment (ts, event_id total order); the path
    assembles per session from a sorted struct collect (bounded by
    the path length after the window filter), and the final top-k is
    TakeOrderedAndProject — k rows per partition, never the path
    histogram. Every shuffle is keyed by user or (user, session);
    the path count is one map-side-combined aggregation."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap_us.isNull(), 0)
        .when(gap_us > SESSION_GAP_MIN * 60 * 1_000_000, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(run).alias("session_idx"),
    )
    rn = F.row_number().over(
        W.partitionBy("user_id", "session_idx").orderBy("ts", "event_id")
    )
    head = sess.select(
        "user_id", "session_idx", "event_type", rn.alias("rn")
    ).where(F.col("rn") <= PATH_LEN)
    paths = head.groupBy("user_id", "session_idx").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOPK)
    )
