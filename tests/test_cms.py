"""Count-min sketch unit tests (the registered cms_heavy_hitters
query is oracle-differential-checked in tests/test_queries_oracle.py;
these pin the sketch's structural guarantees)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.cms import (
    DEPTH,
    WIDTH,
    build_sketch,
    estimate,
    token_counts,
)
from tests.conftest import SF_ORACLE


def _counts(spark):
    return token_counts(spark.read.parquet(f"{SF_ORACLE}/documents.parquet"))


def test_estimate_never_undercounts(spark):
    """The count-min invariant: est >= exact for EVERY key."""
    counts = _counts(spark)
    est = estimate(counts, build_sketch(counts))
    assert est.filter(F.col("est") < F.col("n")).count() == 0


def test_sketch_is_bounded_and_mass_preserving(spark):
    """<= depth*width counters, and each depth row holds the full
    stream mass (every token lands in exactly one bucket per row)."""
    counts = _counts(spark)
    sketch = build_sketch(counts)
    assert sketch.count() <= DEPTH * WIDTH
    total = counts.agg(F.sum("n")).first()[0]
    per_depth = sketch.groupBy("d").agg(F.sum("c").alias("mass")).collect()
    assert len(per_depth) == DEPTH
    assert all(r["mass"] == total for r in per_depth)


def test_sketch_merges_like_partials(spark):
    """Building one sketch over the full corpus equals summing the
    sketches of two disjoint halves counter-for-counter — the
    property that makes per-slice persisted sketches roll up without
    re-scanning history (same contract as the HLL partials)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    whole = build_sketch(token_counts(docs))
    lo = build_sketch(token_counts(docs.filter(F.col("doc_id") % 2 == 0)))
    hi = build_sketch(token_counts(docs.filter(F.col("doc_id") % 2 == 1)))
    merged = (
        lo.unionByName(hi)
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )
    diff = whole.alias("w").join(merged.alias("m"), ["d", "b"], "full").filter(
        F.coalesce(F.col("w.c"), F.lit(0)) != F.coalesce(F.col("m.c"), F.lit(0))
    )
    assert diff.count() == 0
