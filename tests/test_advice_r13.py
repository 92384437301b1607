"""Regression tests for the round-13 ADVICE items — contract errors
and cost/coupling guards that previously failed opaquely (or not at
all)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _tiny_model(spark):
    """(emb, centroids, split_pair) — the smallest corpus on which
    multiprobe_pairs accepts a sub_model."""
    from gerrydb_etl_spark.operators.kmeans import (
        kmeans_train,
        split_oversized_cells,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(60)
    assigned = kmeans_train(emb, k=2, iters=2, keep_qv=True)
    centroids = {
        0: [0.0] * len(emb.first()["embedding"]),
        1: [1.0] * len(emb.first()["embedding"]),
    }
    split = split_oversized_cells(assigned, per_cell=5, max_levels=1)
    return emb, centroids, split


def test_multiprobe_rejects_bare_subcentroid_dataframe(spark):
    """ADVICE r13: passing ivf_topk's bare-DataFrame sub_model
    convention into multiprobe_pairs must raise a NAMED ValueError,
    not an opaque tuple-unpacking TypeError."""
    from gerrydb_etl_spark.operators.kmeans import multiprobe_pairs

    emb, centroids, (split_asn, sub_cents) = _tiny_model(spark)
    with pytest.raises(ValueError, match="assignment, subcentroids"):
        multiprobe_pairs(
            emb, tau=0.5, centroids=centroids, sub_model=sub_cents
        )


def test_multiprobe_rejects_assignment_without_sub_id(spark):
    """Mirror of ivf_topk's guard: the home-block join needs the
    SPLIT assignment; an unsplit one would silently produce no home
    blocks."""
    from gerrydb_etl_spark.operators.kmeans import multiprobe_pairs

    emb, centroids, (split_asn, sub_cents) = _tiny_model(spark)
    unsplit = split_asn.drop("sub_id")
    with pytest.raises(ValueError, match="no sub_id"):
        multiprobe_pairs(
            emb, tau=0.5, centroids=centroids,
            sub_model=(unsplit, sub_cents),
        )


def test_expand_paths_skip_tree_check_same_output_no_id_shuffle(spark):
    """skip_tree_check must (a) return the identical expansion and
    (b) drop the groupBy(id) whose shuffle carries ~n rows on
    conforming trees — verified by job-free plan construction: the
    checked path runs one extra aggregate job; here we assert value
    parity and that a DAG slips past the named error (the backstop /
    MAX_DEPTH guards still bound it)."""
    from gerrydb_etl_spark.operators.hierarchy import expand_paths

    edges = spark.createDataFrame(
        [("us", None, "us"), ("ca", "us", "ca"), ("sf", "ca", "sf")],
        "node_id string, parent_id string, label string",
    )
    checked = {
        (r["id"], r["path"], r["depth"])
        for r in expand_paths(edges).collect()
    }
    skipped = {
        (r["id"], r["path"], r["depth"])
        for r in expand_paths(edges, skip_tree_check=True).collect()
    }
    assert checked == skipped and len(checked) == 3

    # the named tree-contract error fires only on the checked path
    dup = edges.unionByName(
        spark.createDataFrame(
            [("ca", "us", "ca2")],
            "node_id string, parent_id string, label string",
        )
    )
    with pytest.raises(ValueError, match="not a tree"):
        expand_paths(dup)
    # skip path: no named error at build time (caller vouched); the
    # duplicate id simply multiplies the path rows
    out = expand_paths(dup, skip_tree_check=True).collect()
    assert len(out) > 3


def test_cte_limit_default_cached_and_fallback_warns(spark):
    """ADVICE r13: the shipped-default read is resolved once per
    application, and an environment where the accessor breaks warns
    ONCE instead of silently re-pinning the stale literal per call."""
    import warnings

    from gerrydb_etl_spark.operators import hierarchy as H

    H._CTE_DEFAULT_CACHE.clear()
    v1 = H._cte_limit_default(spark)
    app = spark.sparkContext.applicationId
    assert H._CTE_DEFAULT_CACHE[app] == v1
    # cached: poison the cache and confirm the accessor is NOT re-hit
    H._CTE_DEFAULT_CACHE[app] = v1 + 123
    assert H._cte_limit_default(spark) == v1 + 123
    H._CTE_DEFAULT_CACHE.clear()

    class NoJvm:
        @property
        def sparkContext(self):
            raise RuntimeError("Spark Connect: no sparkContext")

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = H._cte_limit_default(NoJvm())
        again = H._cte_limit_default(NoJvm())
    assert got == again == H._CTE_LIMIT_FALLBACK
    msgs = [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert len(msgs) == 1, "fallback must warn exactly once per app"
    H._CTE_DEFAULT_CACHE.clear()
    # restore the real resolution for later tests in the session
    H._cte_limit_default(spark)


def test_forced_per_cell_guards_oracle_coupling():
    """ADVICE r13: the executed per_cell = max(floor, n // 80) must
    equal the oracle's hardcoded floor at every oracle-verified
    corpus size; a fixture regen landing inside the guard band past
    the 2,080 divergence point fails loudly instead of
    hash-mismatching (the fixture-size pin in test_kmeans.py is the
    primary defense beyond the band)."""
    from gerrydb_etl_spark.queries.clustering import (
        _GUARD_MAX_N,
        _TLPER,
        _forced_per_cell,
    )

    # agreement across today's fixture sizes (500, 500, 2000)
    for n in (500, 2_000):
        assert _forced_per_cell(n, _TLPER) == _TLPER
    # fixture growth past the divergence point, inside the band:
    # loud failure (this is the dead-zone the r14 review closed —
    # divergence starts at 2,081, above the old 2,000 threshold)
    for n in (2_081, 3_000, _GUARD_MAX_N):
        with pytest.raises(ValueError, match="per_cell coupling"):
            _forced_per_cell(n, _TLPER)
    # above the band the corpus-scaled value flows through (the
    # scale harnesses run these queries at sf1 = 20k)
    assert _forced_per_cell(80_000, _TLPER) == 1_000
