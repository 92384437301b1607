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


def test_sketch_partials_survive_parquet_roundtrip(spark, tmp_path):
    """The stored-partials pattern is only real if a binary sketch
    column round-trips through parquet and merges identically to
    never-persisted partials — this is what a versioned store would
    actually do between ingest slices."""
    orders = load_table(spark, SF_ORACLE, "orders")
    partials = sketch_partials(
        orders, ["o_orderpriority", "o_orderstatus"], "o_custkey"
    )
    path = str(tmp_path / "partials.parquet")
    partials.write.parquet(path)
    reread = spark.read.parquet(path)
    direct = _estimates(merge_sketches(partials, ["o_orderpriority"]))
    persisted = _estimates(merge_sketches(reread, ["o_orderpriority"]))
    assert direct == persisted


def test_sketch_slices_union_merge(spark):
    """Incremental-ingest shape: partials built per slice (three
    date-range slices standing in for ingest batches), unioned, and
    merged — must agree with partials built over the whole table,
    because HLL union is associative over any slicing."""
    orders = load_table(spark, SF_ORACLE, "orders")
    y = F.year("o_orderdate")
    slices = [
        orders.filter(y <= 1996),
        orders.filter((y > 1996) & (y <= 1998)),
        orders.filter(y > 1998),
    ]
    sliced_partials = None
    for s in slices:
        p = sketch_partials(s, ["o_orderpriority"], "o_custkey")
        sliced_partials = p if sliced_partials is None else sliced_partials.unionByName(p)
    merged = _estimates(merge_sketches(sliced_partials, ["o_orderpriority"]))
    whole = _estimates(sketch_partials(orders, ["o_orderpriority"], "o_custkey"))
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for prio, n in exact.items():
        assert abs(merged[prio] - n) <= 0.05 * n
        assert abs(whole[prio] - n) <= 0.05 * n
