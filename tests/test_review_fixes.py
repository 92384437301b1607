"""Regression tests for the round-2 code-review findings — each of
these reproduced a real defect before its fix."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.strings import trailing_class
from gerrydb_etl_spark.operators.asof import asof_join
from gerrydb_etl_spark.operators.components import connected_components
from gerrydb_etl_spark.operators.multimodal import documents_as_media, sample_frames
from gerrydb_etl_spark.store.geoset import (
    current_membership,
    empty_members,
    empty_set_versions,
    replace_set_versions,
)
from gerrydb_etl_spark.store.scd2 import empty_versioned, scd2_merge


def test_scd2_idempotent_with_null_value_columns(spark):
    """EAV-shaped rows (all but one typed column NULL) must re-load
    as a no-op; the old first-column NULL test stacked versions."""
    inc = spark.createDataFrame(
        [("k1", None, "hello")], "k string, val_int long, val_str string"
    )
    s1 = scd2_merge(empty_versioned(inc), inc, ["k"], version=1)
    s2 = scd2_merge(s1, inc, ["k"], version=2)
    rows = [(r.k, r.val_int, r.val_str, r.valid_from, r.valid_to) for r in s2.collect()]
    assert rows == [("k1", None, "hello", 1, None)]


def test_asof_null_right_value_is_still_the_match(spark):
    """A newer right row with a NULL value column IS the as-of match
    (DuckDB semantics); per-column ignorenulls carries used to mix
    the newer ts with an older non-null value."""
    left = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1, 0, 30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, dt.datetime(2024, 1, 1, 0, 10), 5.0),
         (10, dt.datetime(2024, 1, 1, 0, 20), None)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, "user_id", "ts", ["value"]).collect()
    assert len(out) == 1
    assert out[0].asof_ts == dt.datetime(2024, 1, 1, 0, 20)
    assert out[0].asof_value is None


def test_connected_components_raises_when_unconverged(spark):
    chain = [(i, i + 1) for i in range(1, 14)]  # diameter 13
    df = spark.createDataFrame(chain, "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3)
    # and with enough iterations the same chain fully collapses
    ok = {(r.doc, r.cluster_rep) for r in connected_components(df, max_iter=20).collect()}
    assert ok == {(i, 1) for i in range(1, 15)}


def test_sample_frames_empty_payload_yields_no_frames(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "abc", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = sample_frames(documents_as_media(docs)).collect()
    assert {r.media_id for r in rows} == {2}


def test_geoset_empty_observation_leaves_no_phantom_member(spark):
    v, m = replace_set_versions(
        empty_set_versions(spark),
        empty_members(spark),
        spark.createDataFrame([("s1", "m1")], "set_key string, member string"),
        1,
    )
    v, m = replace_set_versions(
        v, m, spark.createDataFrame([("s1", None)], "set_key string, member string"), 2
    )
    assert m.filter(F.col("member").isNull()).count() == 0
    assert current_membership(v, m).count() == 0  # s1@2 is open, empty


def test_trailing_class_uppercase_mapping_keys_match(spark):
    df = spark.createDataFrame([("geoT",), ("geoR",)], ["s"])
    out = df.select(
        trailing_class(F.col("s"), {"T": "trust", "R": "reservation"}).alias("c")
    ).collect()
    assert sorted(r.c for r in out) == ["reservation", "trust"]
