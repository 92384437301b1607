"""Event-time window aggregations (SURVEY.md §2.9 — absent in the
reference, engine target; the driver ships an `events` table).

Batch-first: `window()` / `session_window` work identically over
batch DataFrames and streams, so these builders are reused by the
Structured Streaming path (streaming/stream.py) with a watermark
bolted on. Each is one hash shuffle on (key, window); partial
aggregation collapses events map-side, so shuffle volume is
~#distinct (key, window) pairs, not #events — the shape that holds
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.numeric import dec, dsum


# Result timestamps are surfaced as strings (repo convention — keeps
# the driver's value-hash comparison engine-independent). Microsecond
# precision: session bounds inherit event-time micros.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _fmt(col: Column, alias: str) -> Column:
    return F.date_format(col, TS_FMT).alias(alias)


def _window_bounds(col: str = "window") -> list[Column]:
    return [
        _fmt(F.col(f"{col}.start"), "window_start"),
        _fmt(F.col(f"{col}.end"), "window_end"),
    ]


def tumbling(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows per event_type: count + exact sum."""
    return (
        events.groupBy(
            F.window(F.col("ts"), duration).alias("window"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n"),
            dsum(dec("value")).alias("total"),
        )
        .select(*_window_bounds(), "event_type", "n", "total")
    )


def sliding(
    events: DataFrame, duration: str = "30 minutes", slide: str = "10 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows.
    Spark expands rows before the aggregation — shuffle volume scales
    by the overlap factor (3x here), the inherent cost of overlap."""
    return (
        events.groupBy(F.window(F.col("ts"), duration, slide).alias("window"))
        .agg(
            F.count("*").alias("n"),
            dsum(dec("value")).alias("total"),
        )
        .select(*_window_bounds(), "n", "total")
    )


def session(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events closer than `gap` merge into
    one session [min(ts), max(ts) + gap). Spark's session_window is a
    single shuffle on user_id + in-partition merge — the same
    gaps-and-islands computation the SQL oracle spells out with
    lag()/cumulative-sum."""
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            dsum(dec("value")).alias("total"),
        )
        .select(
            _fmt(F.col("w.start"), "session_start"),
            _fmt(F.col("w.end"), "session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def json_props(events: DataFrame) -> DataFrame:
    """Parse the JSON `props` column with an explicit schema
    (from_json — no schema inference pass) and aggregate on the
    extracted field."""
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        events.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").cast("long")).alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
