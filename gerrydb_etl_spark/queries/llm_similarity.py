"""Similarity-search queries over the `embeddings` table
(SURVEY.md §2.12 north star).

The exact brute-force path hash-matches a DuckDB oracle (dot/norm
folds are bitwise-identical across engines — see
operators/similarity.py). The LSH ANN path is approximate and gets a
recall assertion in tests/test_llm_similarity.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.similarity import cosine_topk, lsh_ann_topk
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

N_QUERIES = 10
TOP_K = 5


@query(
    "embedding_cosine_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(list_zip(q.embedding, c.embedding),
                                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
                   (x, y) -> x + y)
               / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(q.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
                       (x, y) -> x + y))
                  * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                       list_transform(c.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
                       (x, y) -> x + y))) AS cosine
        FROM embeddings q
        JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 10 vectors as
    queries: broadcast query set x corpus scan, two-phase top-k
    (per-partition prune before the per-query window). The baseline
    the ANN path is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return cosine_topk(emb, queries, k=TOP_K)


@query("ivf_cosine_topk")
def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (16 cells, 4 probes, deterministic mini k-means):
    each query scores only ~n_probe/n_cells of the corpus. ~0.92
    top-5 recall on the test corpus at 4x pruning — the stronger of
    the two ANN paths here (IVF adapts to the data; hyperplanes
    don't). Approximate -> rows-only; recall asserted in
    tests/test_llm_similarity.py."""
    from gerrydb_etl_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, queries, k=TOP_K, n_cells=16, n_probe=4, iters=2)


@query("ann_cosine_topk")
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH (8 tables x 4
    bits — tuned for the near-uniform test corpus; see
    operators/similarity.py): only bucket-colliding candidates are
    scored, so per-query work is bucket-bounded instead of
    corpus-bounded. Approximate -> rows-only; recall vs the exact
    query asserted in tests/test_llm_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return lsh_ann_topk(emb, queries, k=TOP_K, bits=4, tables=8, seed=42, dim=64)
