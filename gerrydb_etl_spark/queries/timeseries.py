"""Time-spine gap fill / resampling over the events stream.

A feature pipeline consuming event streams needs dense time series:
every (entity, hour) present, zero-filled counts, and last-known
values carried forward across empty buckets. Spark's sequence() +
explode builds the per-entity spine declaratively, and the
forward-fill is a single last(ignorenulls) running window — both
Catalyst-native, no Python, no driver loop.

Float discipline: the filled metrics are counts and ids (BIGINT),
never double sums, so the DuckDB oracle (generate_series spine +
last_value IGNORE NULLS) replays bit-for-bit.

Scale design: the spine explode is linear in (entities x buckets)
and partitions by the same key as the aggregation, so AQE coalesces
the two shuffles; the forward-fill window partitions by entity and
is bounded by the spine length. Per-entity min/max bounds come from
the same pre-aggregation — no global collect. Skewed entities (one
event type dominating) only skew the count aggregation, which is
map-side combined; the window runs over the uniform spine, not the
raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table


@query(
    "timeline_gap_fill",
    oracle="""
    WITH b AS (
        SELECT event_type,
               date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
        FROM b
    ),
    agg AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               COUNT(*) AS c, MAX(event_id) AS max_id
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour_ts,
           COALESCE(c, 0) AS n_events,
           last_value(max_id IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_event_id,
           c IS NULL AS is_gap
    FROM spine LEFT JOIN agg USING (event_type, hour_ts)
    """,
)
def timeline_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample per event type: dense spine from first to last
    observed hour, zero-filled event counts, forward-filled last seen
    event_id, and an is_gap marker for originally-empty hours."""
    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    bounds = events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_ts"),
    )
    agg = events.groupBy("event_type", hour.alias("hour_ts")).agg(
        F.count("*").alias("c"),
        F.max("event_id").alias("max_id"),
    )
    ffill = W.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        spine.join(agg, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
            F.last("max_id", ignorenulls=True).over(ffill).alias("last_event_id"),
            F.col("c").isNull().alias("is_gap"),
        )
    )


@query(
    "event_rate_anomaly",
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_events) AS BIGINT) AS s1,
               CAST(SUM(n_events * n_events) AS BIGINT) AS s2
        FROM h GROUP BY event_type
    )
    SELECT h.event_type, hour_ts, n_events,
           (n * n_events - s1) * (n * n_events - s1)
               > 9 * (n * s2 - s1 * s1) AS is_anomaly
    FROM h JOIN s ON h.event_type = s.event_type
    """,
)
def event_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma hourly rate anomalies per event type, in EXACT integer
    arithmetic: the float test (x - mean)^2 > 9 * variance is scaled
    by n^2 into (n*x - S)^2 > 9 * (n*S2 - S^2) — BIGINT-only, so the
    flag replays bit-for-bit in the oracle (a float mean/stddev
    would be an engine-order minefield). Per-type moments are a
    25-row broadcast join back onto the hourly counts. Int64
    headroom: the scaled test squares (n*x - S) ~ (hours x peak
    rate), safe to ~3e9 hour-rate product — bucket coarser or use
    DECIMAL beyond that."""
    events = load_table(spark, sf_dir, "events")
    hourly = _hourly_counts(events, "n_events")
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    dev = F.col("n") * F.col("n_events") - F.col("s1")
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "hour_ts",
            "n_events",
            (dev * dev > 9 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")))
            .alias("is_anomaly"),
        )
    )


def _hourly_counts(events: DataFrame, count_name: str) -> DataFrame:
    """Per-(type, hour) event counts — the rollup shared by the rate
    anomaly, CUSUM, and trend detectors (ONE spelling so the three
    stay in sync)."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count("*").alias(count_name))


SESSION_GAP_MIN = 30


@query(
    "session_id_assignment",
    oracle=f"""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL THEN 0
                    WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > {SESSION_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_idx
    FROM flagged
    """,
)
def session_id_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with explicit per-event session ids: a
    new session starts after a 30-minute inactivity gap, and each
    event gets its user's running session ordinal (cumulative sum of
    gap flags over the per-user event-time window). This is the
    event-level complement of the session-window AGGREGATES
    (events_session_windows): downstream feature pipelines need the
    id on every row, not just per-session rollups. Ties on ts are
    broken by event_id so the window order is total and the oracle
    replays exactly. Scale: both windows are keyed by user_id —
    parallelism is user-cardinality, no global window anywhere."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap on BOTH sides: a seconds cast truncates
    # sub-second parts and can flip the flag vs the oracle
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = events.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap_us.isNull(), 0)
        .when(gap_us > SESSION_GAP_MIN * 60 * 1_000_000, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("new_session").over(run).cast("long").alias("session_idx"),
    )


CUSUM_ALARM_MULT = 2


@query(
    "event_cusum_changepoints",
    oracle=f"""
    WITH RECURSIVE h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    hr AS (
        SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY hour_ts
        ) AS rn FROM h
    ),
    s AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS tot
        FROM h GROUP BY 1
    ),
    rec(event_type, rn, hour_ts, x, cusum) AS (
        SELECT hr.event_type, rn, hour_ts, x,
               GREATEST(0, s.n * x - s.tot)
        FROM hr JOIN s USING (event_type) WHERE rn = 1
        UNION ALL
        SELECT hr.event_type, hr.rn, hr.hour_ts, hr.x,
               GREATEST(0, rec.cusum + s.n * hr.x - s.tot)
        FROM rec
        JOIN hr ON hr.event_type = rec.event_type
               AND hr.rn = rec.rn + 1
        JOIN s ON s.event_type = hr.event_type
    )
    SELECT rec.event_type, rec.hour_ts, rec.x AS n_events, rec.cusum,
           rec.cusum > {CUSUM_ALARM_MULT} * s.tot AS is_alarm
    FROM rec JOIN s ON s.event_type = rec.event_type
    """,
)
def event_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided integer CUSUM change-point detection over hourly
    event rates: cusum_t = max(0, cusum_{{t-1}} + (n·x_t − total)),
    alarming when the accumulated positive drift exceeds
    {CUSUM_ALARM_MULT}× the per-type total — deviations are the same
    exact n·x − Σx integer scaling event_rate_anomaly uses, so the
    whole detector is BIGINT end to end. The max-with-zero reset is
    a NON-LINEAR scan no window aggregate expresses: this is the
    repo's one batch applyInPandas operator (operators/cusum.py),
    the documented custom-operator tier — everything before and
    after the per-type Arrow scan (hourly rollup, per-type moments,
    threshold join) stays JVM-side, and the oracle replays the
    recursion as a DuckDB recursive CTE stepping rn → rn + 1.
    Scale: parallelism is type-cardinality; per-group state is O(1)
    and each series streams through Arrow once (two-phase chunk +
    carry merge is the >1-task-per-series extension, not needed at
    tested scales)."""
    from gerrydb_etl_spark.operators.cusum import cusum_scan

    events = load_table(spark, sf_dir, "events")
    hourly = _hourly_counts(events, "n_events")
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("n_events").alias("tot"),
    )
    j = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour_ts",
        "n_events",
        (F.col("n") * F.col("n_events") - F.col("tot")).alias("dev"),
        (F.lit(CUSUM_ALARM_MULT) * F.col("tot")).alias("threshold"),
    )
    out = cusum_scan(
        j, ["event_type"], "hour_ts", "dev", "threshold"
    )
    return out.select(
        "event_type", "hour_ts", "n_events", "cusum", "is_alarm"
    )


@query(
    "trend_slope_per_type",
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    hx AS (
        SELECT event_type, y,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY hour_ts
               ) AS BIGINT) AS x
        FROM h
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM hx GROUP BY event_type
    )
    SELECT event_type, n AS n_hours,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (1000000 * (n * sxy - sx * sy))
                     // (n * sxx - sx * sx) END AS slope_x1e6,
           n * sxy - sx * sy > 0 AS is_increasing
    FROM s
    """,
)
def trend_slope_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of hourly event rates: the exact OLS
    slope numerator/denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) over
    integer hour ordinals and counts, reported as an integer 1e-6
    slope plus the sign flag the numerator alone decides.
    Negative-numerator portability was checked explicitly: BOTH
    engines truncate integer division toward zero (Spark div and
    DuckDB // agree on -7/2 = -3; it is PYTHON's // that floors —
    don't port that intuition into reference implementations), so
    the raw signed division replays exactly and is property-tested
    against Fraction-exact OLS on descending series. A
    single-hour series has zero denominator → NULL slope, not a
    division error. One per-type ordinal window (keyed, bounded by
    hours) and one map-side-combined moment aggregation — the same
    exact-integer-moments discipline as event_rate_anomaly, so a
    trend detector at 100 TB is one pass over the pre-aggregated
    hourly rollup, never the raw events twice."""
    events = load_table(spark, sf_dir, "events")
    hourly = _hourly_counts(events, "y")
    x = (
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("hour_ts"))
        .cast("long")
    )
    hx = hourly.select("event_type", "y", x.alias("x"))
    s = hx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.when(den == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(
            "(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
        ))
        .alias("slope_x1e6"),
        (num > 0).alias("is_increasing"),
    )
