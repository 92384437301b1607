"""Property tests for queries/timeseries.py against plain-Python
references on randomized event streams (style:
tests/test_docprep_property.py)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)

# (type_idx, minutes_offset, event_id) triples; minutes bounded so
# spines stay small
event_sets = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 36 * 60),
        st.integers(0, 10**6),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[2],
)


def _mk_events(spark, rows):
    data = [
        (eid, BASE + dt.timedelta(minutes=m), 1, f"t{ti}", 1.0, "{}")
        for ti, m, eid in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _ref_gap_fill(rows):
    from collections import defaultdict

    by_type = defaultdict(list)
    for ti, m, eid in rows:
        by_type[f"t{ti}"].append((BASE + dt.timedelta(minutes=m), eid))
    out = {}
    for t, evs in by_type.items():
        hours = [e[0].replace(minute=0, second=0, microsecond=0) for e in evs]
        h0, h1 = min(hours), max(hours)
        agg = defaultdict(lambda: [0, None])
        for (ts, eid), h in zip(evs, hours):
            agg[h][0] += 1
            agg[h][1] = max(agg[h][1] or eid, eid)
        last = None
        h = h0
        while h <= h1:
            n, mx = agg[h] if h in agg else (0, None)
            if mx is not None:
                last = mx
            out[(t, h)] = (n, last, n == 0)
            h += dt.timedelta(hours=1)
    return out


@given(rows=event_sets)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gap_fill_matches_reference(spark, rows):
    from gerrydb_etl_spark.queries import REGISTRY
    import gerrydb_etl_spark.queries.timeseries as T

    events = _mk_events(spark, rows)
    hour = F.date_trunc("hour", "ts")
    bounds = events.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_ts"
        ),
    )
    agg = events.groupBy("event_type", hour.alias("hour_ts")).agg(
        F.count("*").alias("c"), F.max("event_id").alias("max_id")
    )
    from pyspark.sql.window import Window as W

    ffill = W.partitionBy("event_type").orderBy("hour_ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    got = {
        (r["event_type"], r["hour_ts"]): (
            r["n_events"],
            r["last_event_id"],
            r["is_gap"],
        )
        for r in spine.join(agg, ["event_type", "hour_ts"], "left")
        .select(
            "event_type",
            "hour_ts",
            F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
            F.last("max_id", ignorenulls=True).over(ffill).alias("last_event_id"),
            F.col("c").isNull().alias("is_gap"),
        )
        .collect()
    }
    assert got == _ref_gap_fill(rows)


def _ref_sessions(rows, gap_min=30):
    from collections import defaultdict

    by_user = defaultdict(list)
    for ti, m, eid in rows:
        by_user[1].append((BASE + dt.timedelta(minutes=m), eid))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid in evs:
            if prev is not None and (ts - prev) > dt.timedelta(minutes=gap_min):
                idx += 1
            out[eid] = idx
            prev = ts
    return out


@given(rows=event_sets)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_session_assignment_matches_reference(spark, rows):
    # all events on one user; unique (ts, event_id) ordering holds
    # because event_ids are unique and ties sort by event_id in both
    from gerrydb_etl_spark.queries.base import REGISTRY

    # the python reference breaks ts ties by insertion order of the
    # sorted tuple (ts, eid) — align by dropping duplicate minutes
    seen, dedup = set(), []
    for ti, m, eid in rows:
        if m not in seen:
            seen.add(m)
            dedup.append((ti, m, eid))
    rows = dedup
    events = _mk_events(spark, rows)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    got = {
        r["event_id"]: r["session_idx"]
        for r in events.select(
            "event_id",
            F.sum(
                F.when(gap_us.isNull(), 0)
                .when(gap_us > 30 * 60 * 1_000_000, 1)
                .otherwise(0)
            )
            .over(run)
            .cast("long")
            .alias("session_idx"),
        ).collect()
    }
    assert got == _ref_sessions(rows)
