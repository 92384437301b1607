"""Mergeable-sketch properties (queries/sketches.py).

What makes HLL a safe rollup primitive is NOT bit-identical merge
output — Datasketches unions via an HLL_8 gadget, so a merged
sketch's estimate can differ by a fraction of a percent from a
sketch built directly over the same rows — but that both paths stay
inside the configured error envelope of the exact answer. The
rollup contract is statistical, and that is what we pin: direct
sketch, two-level merged rollup, and exact distinct count must all
agree within the lgK=12 tolerance (RSE ~1.6%; 5% is ~3 sigma).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.queries.sketches import merge_sketches, sketch_partials
from gerrydb_etl_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def _estimates(df):
    return {
        r["o_orderpriority"]: r["est"]
        for r in df.select(
            "o_orderpriority",
            F.hll_sketch_estimate("hll_sketch").alias("est"),
        ).collect()
    }


def test_rollup_and_direct_sketch_agree_with_exact(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    rolled = _estimates(
        merge_sketches(
            sketch_partials(
                orders, ["o_orderpriority", "o_orderstatus"], "o_custkey"
            ),
            ["o_orderpriority"],
        )
    )
    direct = _estimates(
        sketch_partials(orders, ["o_orderpriority"], "o_custkey")
    )
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(rolled) == set(direct) == set(exact)
    for prio, n in exact.items():
        assert abs(rolled[prio] - n) <= 0.05 * n, (prio, rolled[prio], n)
        assert abs(direct[prio] - n) <= 0.05 * n, (prio, direct[prio], n)
        # merged-vs-direct drift is bounded by the union gadget's
        # re-estimation, far tighter than the sketch error itself
        assert abs(rolled[prio] - direct[prio]) <= 0.03 * n
