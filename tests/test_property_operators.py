"""Property tests cross-checking two non-trivial operators against
independent reference implementations on randomized inputs:

  - connected_components vs a plain union-find over the same edges
    (catches propagation/jump bugs no fixed fixture would);
  - asof_join vs pandas.merge_asof (the widely-used reference
    semantics for most-recent-match joins).

Style follows tests/test_scd2_property.py (hypothesis with the
function-scoped-fixture health check suppressed; the spark fixture
is session-scoped so reuse across examples is intended).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gerrydb_etl_spark.operators.asof import asof_join
from gerrydb_etl_spark.operators.components import connected_components

edge_lists = st.lists(
    st.tuples(st.integers(1, 30), st.integers(1, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(edges=edge_lists)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.doc: r.cluster_rep for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


asof_rows = st.tuples(
    st.integers(1, 3),  # key
    st.integers(0, 100),  # seconds offset
)


@given(
    left_rows=st.lists(asof_rows, min_size=1, max_size=15),
    right_rows=st.lists(asof_rows, min_size=1, max_size=15),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "user_id": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in left_rows],
        }
    )
    # merge_asof requires unique right (key, ts) to be meaningful for
    # value comparison; dedup keeping the max value like the operator
    # (window row_number desc ties on value) would — simplest: make
    # (key, ts) unique by construction
    rdict = {}
    for i, (k, s) in enumerate(right_rows):
        rdict[(k, s)] = float(i)
    rpdf = pd.DataFrame(
        {
            "user_id": [k for (k, _), _ in rdict.items()],
            "ts": [base + pd.Timedelta(seconds=s) for (_, s), _ in rdict.items()],
            "value": list(rdict.values()),
        }
    )
    want = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable").reset_index(drop=True),
        rpdf.sort_values("ts", kind="stable").reset_index(drop=True),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    want_set = sorted(
        (r.user_id, r.ts.to_pydatetime(), None if pd.isna(r.value) else r.value)
        for r in want.itertuples()
    )

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = asof_join(left, right, "user_id", "ts", ["value"], how="left")
    got_set = sorted(
        (r.user_id, r.ts, r.asof_value) for r in got.collect()
    )
    assert got_set == want_set


# randomized small embedding corpora for the multiprobe dominance
# property: integer-grid vectors (exact quantization), no zero
# vectors (cosine contract), ids drawn SPARSE to exercise arbitrary
# id spaces
_vec = st.lists(st.integers(-5, 5), min_size=3, max_size=3).filter(
    lambda v: any(x != 0 for x in v)
)
_corpora = st.lists(_vec, min_size=12, max_size=28).map(
    lambda vs: [(7 * i + 3, v) for i, v in enumerate(vs)]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_corpora)
def test_multiprobe_dominates_single_probe_on_random_corpora(spark, rows):
    """For ANY corpus and the SAME trained quantizer: single-probe
    cell-blocked pairs ⊆ multi-probe pairs ⊆ exact truth. The left
    inclusion holds because a vector's home cell is its first probe;
    the right because multiprobe only rescored real candidates.
    Randomized geometry catches tie-break and duplicate-vector
    interactions no fixed fixture would."""
    import math

    from gerrydb_etl_spark.operators.ivf import _train
    from gerrydb_etl_spark.operators.kmeans import (
        cell_blocked_pairs,
        multiprobe_pairs,
        quantize,
    )

    tau = 0.6
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    quant = quantize(emb)
    k = min(4, len(rows))
    cents, assigned = _train(quant, k, 2)

    exact = set()
    for a, (i, v) in enumerate(rows):
        for j, w in rows[a + 1:]:
            dot = sum(x * y for x, y in zip(v, w))
            cos = dot / (
                math.sqrt(sum(x * x for x in v))
                * math.sqrt(sum(y * y for y in w))
            )
            if cos >= tau - 1e-9:
                exact.add((min(i, j), max(i, j)))

    single = {
        (r["d1"], r["d2"])
        for r in cell_blocked_pairs(
            emb, tau=tau,
            assigned=assigned.select("vec_id", "cluster_id", "qv"),
        ).collect()
    }
    multi = {
        (r["d1"], r["d2"])
        for r in multiprobe_pairs(emb, tau=tau, centroids=cents).collect()
    }
    assert single <= multi, sorted(single - multi)[:5]
    assert multi <= exact, sorted(multi - exact)[:5]
