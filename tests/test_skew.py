"""Salted operators must be exactly equivalent to their unsalted
forms — the salt is a physical rewrite, never a semantic one."""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.skew import replicated_skew_join, salted_collect_list
from gerrydb_etl_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_salted_collect_list_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = {
        r.l_returnflag: r.values
        for r in salted_collect_list(li, ["l_returnflag"], "l_orderkey", salts=8).collect()
    }
    plain = {
        r.l_returnflag: sorted(r.v)
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_list("l_orderkey").alias("v"))
        .collect()
    }
    assert salted == plain


def test_replicated_skew_join_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = (
        replicated_skew_join(li, orders, "l_orderkey", salts=4)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_is_deterministic_across_runs(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    a = salted_collect_list(li, ["l_linestatus"], "l_orderkey", salts=8).collect()
    b = salted_collect_list(li, ["l_linestatus"], "l_orderkey", salts=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
