"""Source-layer unit tests: retry semantics (the reference's two
retry bugs fixed), skip-list pruning, Census shape edge cases."""

from __future__ import annotations

import pytest

from gerrydb_etl_spark.sources.formats import (
    census_rows_to_df,
    should_skip,
    with_retry,
    write_table,
)


def test_with_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert with_retry(flaky, attempts=5, backoff_s=0.0) == "ok"
    assert calls["n"] == 3


def test_with_retry_reraises_last_error():
    """No unbound-result fall-through (pl_pop_tables.py:125-150)."""

    def always_fails():
        raise IOError("down")

    with pytest.raises(IOError, match="down"):
        with_retry(always_fails, attempts=3, backoff_s=0.0)


def test_with_retry_does_not_catch_unrelated_errors():
    """No bare except (pl_geo.py:97): a TypeError is a bug, not a
    flaky network — it must propagate on the first attempt."""
    calls = {"n": 0}

    def buggy():
        calls["n"] += 1
        raise TypeError("bug")

    with pytest.raises(TypeError):
        with_retry(buggy, attempts=5, backoff_s=0.0)
    assert calls["n"] == 1


def test_should_skip():
    missing = frozenset({("01", "block", "2020")})
    assert should_skip("01", "block", "2020", missing)
    assert not should_skip("01", "tract", "2020", missing)


def test_census_rows_header_required(spark):
    with pytest.raises(ValueError, match="no header"):
        census_rows_to_df(spark, [])


def test_census_rows_lowercases_and_casts(spark):
    df = census_rows_to_df(
        spark,
        [["GEO_ID", "P1_001N"], ["g1", "100"], ["g2", "250"]],
        int_columns=["P1_001N"],
    )
    assert df.columns == ["geo_id", "p1_001n"]
    assert dict(df.dtypes)["p1_001n"] == "bigint"
    assert {(r.geo_id, r.p1_001n) for r in df.collect()} == {("g1", 100), ("g2", 250)}


def test_census_json_file_source(spark, tmp_path):
    """Staged-JSON scrape path: a Census API response saved to disk
    parses through the same header→schema shape."""
    import json

    from gerrydb_etl_spark.sources.formats import census_json_file_to_df

    p = tmp_path / "resp.json"
    p.write_text(json.dumps([["GEO_ID", "POP"], ["g1", "10"], ["g2", "20"]]))
    df = census_json_file_to_df(spark, str(p), int_columns=["POP"])
    assert {(r.geo_id, r.pop) for r in df.collect()} == {("g1", 10), ("g2", 20)}


def test_write_table_rejects_unknown_format(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(df, str(tmp_path / "x"), fmt="avro")
