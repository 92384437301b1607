"""Unit tests for operators/pagerank.py: hand-graph recurrence check
and mass conservation. The sf0.01 oracle-differential gate runs via
test_queries_oracle.py."""

from __future__ import annotations

from gerrydb_etl_spark.operators.pagerank import pagerank_fixed_point

SCALE = 10**12


def _py_pagerank(nodes, edges, iterations, scale=SCALE):
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    score = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dang = sum(score[v] for v in nodes if v not in outdeg)
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += score[s] // outdeg[s]
        score = {
            v: (15 * (scale // n)) // 100
            + (85 * (insum[v] + dang // n)) // 100
            for v in nodes
        }
    return score


def test_pagerank_matches_python_recurrence(spark):
    nodes = [1, 2, 3, 4, 5]
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 1)]  # 5 dangles
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["score"]
        for r in pagerank_fixed_point(ndf, edf, iterations=4).collect()
    }
    assert got == _py_pagerank(nodes, edges, 4)


def test_pagerank_mass_approximately_conserved(spark):
    # Floor divisions only ever DROP sub-unit remainders, so total
    # mass stays within a small deficit of SCALE and never grows.
    nodes = [1, 2, 3, 4]
    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    ndf = spark.createDataFrame([(v,) for v in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    total = sum(
        r["score"]
        for r in pagerank_fixed_point(ndf, edf, iterations=3).collect()
    )
    assert 0 < total <= SCALE
    assert SCALE - total < 1000  # only floor-remainder leakage
