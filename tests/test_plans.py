"""Unit tests for config-driven plans and Census metadata functions
(metadata plane — pure Python except apply_config)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from gerrydb_etl_spark.plans.census import (
    REDUNDANT_TO_CANONICAL,
    column_aliases,
    column_name,
    parse_label,
)
from gerrydb_etl_spark.plans.config import apply_config, render_config, source_struct

SIMPLE = """
source_url: "config://test"
columns:
  - source: a
    target: x
    type: int
  - source: b
    target: y
    type: float
"""


def test_render_and_struct():
    cfg = render_config(SIMPLE)
    assert cfg.source_url == "config://test"
    assert source_struct(cfg) == T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.DoubleType())]
    )


def test_jinja_substitution():
    cfg = render_config(
        "source_url: ''\ncolumns:\n  - source: s\n    target: '{{ v }}_t'\n    type: str\n",
        v="y2020",
    )
    assert cfg.columns[0].target == "y2020_t"


def test_missing_template_var_raises():
    from jinja2 import UndefinedError

    with pytest.raises(UndefinedError):
        render_config(
            "source_url: ''\ncolumns:\n  - source: s\n    target: '{{ v }}_t'\n    type: str\n"
        )


def test_bad_type_rejected():
    with pytest.raises(ValueError, match="unknown type"):
        render_config(
            "source_url: ''\ncolumns:\n  - source: s\n    target: t\n    type: decimal\n"
        )


def test_apply_config_skips_absent_sources(spark):
    cfg = render_config(SIMPLE + "  - source: missing\n    target: z\n    type: str\n")
    df = spark.createDataFrame([(1, 2.5)], "a long, b double")
    out = apply_config(df, cfg)
    assert out.columns == ["x", "y"]


def test_apply_config_all_absent_raises(spark):
    cfg = render_config(SIMPLE)
    df = spark.createDataFrame([("q",)], "q string")
    with pytest.raises(ValueError, match="matches no columns"):
        apply_config(df, cfg)


# -- census metadata ---------------------------------------------------


def test_parse_label_simple_total():
    label, canonical, hisp = parse_label("Total:")
    assert (label, canonical, hisp) == ("Total", "total", None)


def test_parse_label_race_combo():
    label = " !!Total:!!Population of two races:!!White; Black or African American"
    _, canonical, hisp = parse_label(label)
    assert canonical == "white_black"
    assert hisp is None


def test_parse_label_alone_stripped():
    _, canonical, _ = parse_label("Total:!!Population of one race:!!Asian alone")
    assert canonical == "asian"


def test_parse_label_2010_comma_bug_repaired():
    # P004059's label joins with ', ' instead of '; '
    label = "Total!!Not Hispanic or Latino!!Population of two races!!White, Some Other Race"
    _, canonical, hisp = parse_label(label)
    assert canonical == "white_other"
    assert hisp is False


def test_parse_label_hispanic_flag():
    _, _, hisp = parse_label("Total:!!Hispanic or Latino")
    assert hisp is True


def test_column_aliases_all_three_formats():
    expect = ["P1_001N", "P001001", "P0010001"]
    assert column_aliases("P1_001N") == expect
    assert column_aliases("P001001") == expect
    assert column_aliases("P0010001") == expect


def test_column_aliases_unknown_format():
    assert column_aliases("H1_001N2") is None
    assert column_aliases("bogus") is None


def test_redundant_map_is_consistent():
    for redundant, canonical in REDUNDANT_TO_CANONICAL.items():
        assert column_aliases(redundant) is not None
        assert column_aliases(canonical) is not None


def test_column_name_assembly():
    assert column_name("total", "P1", None) == "total_pop"
    assert column_name("white", "P3", None) == "white_vap"
    assert column_name("white", "P2", True) == "hispanic_white_pop"
    assert column_name("white", "P4", False) == "non_hispanic_white_vap"
    # degeneracy guard: hispanic_hispanic_pop -> hispanic_pop
    assert column_name("Hispanic or Latino", "P2", True) == "hispanic_pop"
