"""Lexical retrieval scoring: rational TF-IDF term ranking and BM25
with the Robertson rational idf kernel (no transcendental functions —
both queries carry full value-hash oracles)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gerrydb_etl_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "data data hash scan filter"),
            (2, "data join join join merge"),
            (3, "scan scan scan scan scan"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_top_terms_toy(spark, tmp_path, monkeypatch):
    """Hand-checked rational TF-IDF on a 3-doc corpus."""
    from gerrydb_etl_spark.queries.retrieval import tfidf_top_terms

    docs = _toy_docs(spark)
    monkeypatch.setattr(
        "gerrydb_etl_spark.queries.retrieval.load_table",
        lambda spark_, sf_dir_, name: docs,
    )
    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.score)
        for r in tfidf_top_terms(spark, "ignored").collect()
    }
    # doc 1: data tf=2 df=2 -> 2*3/2=3.0 ; hash tf=1 df=1 -> 3.0 ;
    #        filter tf=1 df=1 -> 3.0 ; scan tf=1 df=2 -> 1.5
    # rank ties break on token asc: data(3.0) < filter(3.0) < hash(3.0)
    assert got[(1, 1)] == ("data", 2, 3.0)
    assert got[(1, 2)] == ("filter", 1, 3.0)
    assert got[(1, 3)] == ("hash", 1, 3.0)
    assert got[(1, 4)] == ("scan", 1, 1.5)
    # doc 3: scan tf=5 df=2 -> 5*3/2=7.5, only term
    assert got[(3, 1)] == ("scan", 5, 7.5)
    assert (3, 2) not in got


def test_bm25_scoring_toy(spark, monkeypatch):
    """Hand-computed BM25 (k1=1.2, b=0.75, rational idf) on the toy
    corpus for the query terms (data, hash, scan)."""
    from gerrydb_etl_spark.queries.retrieval import bm25_scoring

    docs = _toy_docs(spark)
    monkeypatch.setattr(
        "gerrydb_etl_spark.queries.retrieval.load_table",
        lambda spark_, sf_dir_, name: docs,
    )
    got = {r.doc_id: (r.dl, r.bm25) for r in bm25_scoring(spark, "ignored").collect()}
    n, avgdl, k1, b = 3, 5.0, 1.2, 0.75

    def s(tf, df, dl):
        if tf == 0:
            return 0.0
        idf = (n - df + 0.5) / (df + 0.5)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * dl) / avgdl))

    # doc 1: data tf=2 df=2, hash tf=1 df=1, scan tf=1 df=2, dl=5
    want1 = s(2, 2, 5) + s(1, 1, 5) + s(1, 2, 5)
    assert got[1][0] == 5
    assert math.isclose(got[1][1], want1, rel_tol=1e-12)
    # doc 2: only data (tf=1 df=2)
    assert math.isclose(got[2][1], s(1, 2, 5), rel_tol=1e-12)
    # doc 3: only scan (tf=5 df=2)
    assert math.isclose(got[3][1], s(5, 2, 5), rel_tol=1e-12)


def test_retrieval_plan_shapes(spark):
    """tfidf's window is shard-keyed by doc_id (no global window) and
    bm25's only full-corpus shuffle is the filtered tf groupBy; both
    scalar sides ride broadcast, no cartesian product of corpus rows."""
    tfidf = REGISTRY["tfidf_top_terms"].spark(spark, SF_ORACLE)
    plan = tfidf._jdf.queryExecution().executedPlan().toString()
    # the top-k window exchange is keyed by doc_id (shard-keyed, not
    # a single global window partition)
    assert "hashpartitioning(doc_id" in plan
    # no scalar-join BNLJ (corpus size folds in as a literal); the
    # df side rides a broadcast hash join at this scale
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" in plan

    bm25 = REGISTRY["bm25_scoring"].spark(spark, SF_ORACLE)
    bplan = bm25._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in bplan
    assert "BroadcastExchange" in bplan
