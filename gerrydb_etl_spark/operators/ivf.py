"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for similarity search (next to hyperplane LSH,
operators/similarity.py): partition the corpus into Voronoi cells
around k-means centroids, then search only the `n_probe` cells
nearest each query. Candidate volume per query is
n_probe/n_cells of the corpus — the classic FAISS IVF-Flat layout,
expressed as DataFrames.

Training is mini Lloyd iterations: assignment is one Arrow-batched
matmul per batch (pandas UDF, like the LSH signatures); the centroid
update reduces per (cell, dim) via posexplode + avg — a map-side
combining shuffle of C x dim rows, independent of corpus size. The
centroid matrix itself is tiny (cells x dim) and rides the driver /
broadcast path by design, exactly like every production IVF build.

Determinism: centroids init from the lowest-id vectors (no RNG), so
training and search reproduce bit-for-bit across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window as W

from gerrydb_etl_spark.operators.partitioning import fan_out
from gerrydb_etl_spark.operators.similarity import dot, norm


def _assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """Nearest-centroid assignment (cosine) as one matmul per Arrow
    batch. Returns the n_probe nearest cell ids per vector."""
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.asarray(list(vecs), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ c.T  # (n, cells)
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return assign


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic mini k-means: init from the n_cells lowest-id
    vectors, then `iters` Lloyd rounds. The per-round reduce is
    (cell, dim)-keyed — map-side combined, so the shuffle carries
    n_cells x dim rows regardless of corpus size."""
    init = (
        corpus.orderBy(F.col(id_col))
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = np.asarray([r[0] for r in init], dtype=np.float64)

    corpus = fan_out(corpus.select(vec_col))
    for _ in range(iters):
        assign = _assign_udf(centroids, n_probe=1)
        assigned = corpus.select(
            assign(F.col(vec_col))[0].alias("cell"),
            F.posexplode(F.col(vec_col)).alias("dim", "val"),
        )
        means = (
            assigned.groupBy("cell", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in means:
            new[r.cell, r.dim] = r.m
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    broadcast_query_limit: int = 1024,
) -> DataFrame:
    """Approximate cosine top-k: score each query only against corpus
    rows whose cell is among the query's n_probe nearest cells
    (candidates ~ n_probe/n_cells of the corpus).

    Join strategy: the query side is broadcast ONLY while it is
    provably small — at most ``broadcast_query_limit`` query vectors
    (counted with a bounded limit probe, one cheap job). A
    bulk-ANN call (e.g. the corpus as its own query set) would
    otherwise broadcast the corpus; above the limit the candidate
    join becomes a plain shuffle on ``cell`` instead, which is the
    correct co-partitioned plan at that shape. Pass a larger limit
    explicitly when a bigger broadcast side is intended and the
    executor memory budget is known."""
    centroids = train_centroids(corpus, vec_col, id_col, n_cells, iters)

    small_query_set = (
        queries.limit(broadcast_query_limit + 1).count() <= broadcast_query_limit
    )
    corpus = fan_out(corpus.select(id_col, vec_col))
    # norms fold once per row on each side (values bit-identical to
    # folding per pair), so each scored candidate costs one dot fold
    corpus_cells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        norm(F.col(vec_col)).alias("n_nrm"),
        _assign_udf(centroids, 1)(F.col(vec_col))[0].alias("cell"),
    )
    query_cells = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
        F.explode(_assign_udf(centroids, n_probe)(F.col(vec_col))).alias("cell"),
    )
    probe = F.broadcast(query_cells) if small_query_set else query_cells
    cand = (
        corpus_cells.join(probe, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "q_nrm", "n_vec", "n_nrm")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("q_vec"), F.col("n_vec"))
            / (F.col("q_nrm") * F.col("n_nrm"))
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
