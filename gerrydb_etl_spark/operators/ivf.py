"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for similarity search (next to hyperplane LSH,
operators/similarity.py): partition the corpus into Voronoi cells
around k-means centroids, then search only the `n_probe` cells
nearest each query. Candidate volume per query is
n_probe/n_cells of the corpus — the classic FAISS IVF-Flat layout,
expressed as DataFrames.

The coarse quantizer IS the fixed-point k-means from
operators/kmeans.py (quantized BIGINT components, integer centroid
sums, sequential-fold distances, lower-id tie-breaks, first-k
init): every training and search step is therefore exactly
replayable in DuckDB SQL, which upgrades the registered
ivf_cosine_topk query from a rows-only check to a FULL value-hash
pipeline-replay oracle (queries/llm_similarity.py). Scoring runs on
the quantized vectors read as doubles — the same contract as
SemDeDup — so the cosine folds match the replay bit-for-bit. A
side bonus: cell assignment is a narrow literal-centroid projection
(whole-stage codegen), no pandas UDF anywhere in the IVF path.

Scale notes: training's per-round reduce is (cell x dim) integer
sums — map-side combined, shuffle size independent of corpus size;
the centroid model is a bounded k x dim driver collect per round
(operators/kmeans.py cost model); search joins corpus cells to
query probes on the cell id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from gerrydb_etl_spark.operators.kmeans import (
    _update,
    assign,
    assign_topn,
    init_centroids,
    quantize,
)
from gerrydb_etl_spark.operators.partitioning import fan_out
from gerrydb_etl_spark.operators.similarity import fold_sum


def _train(
    quant: DataFrame, n_cells: int, iters: int
) -> tuple[dict[int, list[float]], DataFrame]:
    """Run `iters` Lloyd assignment passes on pre-quantized vectors;
    returns (final centroids, final assignment)."""
    centroids, dim = init_centroids(quant, n_cells)
    assigned = assign(quant, centroids)
    for _ in range(iters - 1):
        centroids = _update(assigned, dim)
        assigned = assign(quant, centroids)
    return centroids, assigned


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Deterministic fixed-point mini k-means; returns the centroid
    matrix (cells x dim, float64, in 1e-6 quantized units) for
    inspection/tests. Cells emptied during training drop out of the
    model, mirroring the SQL replay."""
    quant = quantize(corpus, vec_col=vec_col, id_col=id_col).persist()
    try:
        centroids, _ = _train(quant, n_cells, iters)
    finally:
        quant.unpersist()
    return np.asarray([centroids[c] for c in sorted(centroids)], dtype=np.float64)


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
    model: tuple[DataFrame, dict[int, list[float]]] | None = None,
    sub_model: DataFrame | None = None,
    sub_probe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: score each query only against corpus
    rows whose cell is among the query's n_probe nearest cells
    (candidates ~ n_probe/n_cells of the corpus). Cosine is computed
    over the quantized vectors read as doubles (sequential folds), so
    the whole output replays in SQL.

    ``model``: optionally a precomputed (assignment, centroids) pair
    — e.g. store/staging.py's session-staged IVF model — skipping
    Lloyd training entirely; fixed-point training is RNG- and
    float-order-free, so staged values equal inline training and the
    re-training replay oracle is unaffected.

    Join strategy: the query side is broadcast ONLY while it is
    provably small — at most ``broadcast_query_limit`` query vectors
    (counted with a bounded limit probe, one cheap job). A
    bulk-ANN call (e.g. the corpus as its own query set) would
    otherwise broadcast the corpus; above the limit the candidate
    join becomes a plain shuffle on ``cell`` instead, which is the
    correct co-partitioned plan at that shape. Pass a larger limit
    explicitly when a bigger broadcast side is intended and the
    executor memory budget is known.

    ``sub_model`` (the past-the-cap hierarchy,
    operators/kmeans.py split_oversized_cells): a (cluster_id, sub,
    cv) subcentroid table paired with an assignment carrying
    ``sub_id``. The probe becomes two-level — rank the n_probe
    nearest TOP cells against the bounded literal codebook as
    before, then within each probed cell rank its subcells against
    the subcentroid TABLE (a join, not plan literals — the fine
    codebook can grow with the corpus) and keep the ``sub_probe``
    nearest. Candidates per query drop from n_probe x occupancy to
    ~n_probe x sub_probe x per_cell, restoring the bounded-work
    contract when cell occupancy outgrows the cap; unsplit cells
    keep their single implicit subcell 0."""
    quant = None
    try:
        if model is not None:
            assigned, centroids = model
        else:
            quant = quantize(
                fan_out(corpus.select(id_col, vec_col)),
                vec_col=vec_col,
                id_col=id_col,
            ).persist()
            centroids, assigned = _train(quant, n_cells, iters)

        def dv(col: str):
            return F.transform(col, lambda x: x.cast("double"))

        def nrm(col: str):
            return F.sqrt(fold_sum(F.transform(col, lambda x: x * x)))

        two_level = sub_model is not None
        # the corpus joins on (cell, sub) ONLY under a two-level
        # probe; without sub_model the probe side would pin sub=0 and
        # silently drop every sub_id>0 corpus row from the search, so
        # a split assignment searched one-level ignores its sub_id
        # (blocking refinement never affects WHO is searchable)
        if two_level and "sub_id" not in assigned.columns:
            # the inverse mismatch is NOT ignorable: probes would rank
            # sub>0 subcells while every corpus row sits pinned at
            # sub=0, silently dropping candidates from probed subcells
            raise ValueError(
                "sub_model passed but the assignment has no sub_id "
                "column — pair the subcentroid table with the "
                "split_oversized_cells assignment it was trained from"
            )
        sub_col = (
            F.coalesce(F.col("sub_id"), F.lit(0))
            if two_level
            else F.lit(0)
        )
        corpus_cells = assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cluster_id").alias("cell"),
            sub_col.alias("sub"),
            dv("qv").alias("n_vec"),
        ).withColumn("n_nrm", nrm("n_vec"))

        qq = quantize(queries, vec_col=vec_col, id_col=id_col)
        small_query_set = (
            queries.limit(broadcast_query_limit + 1).count()
            <= broadcast_query_limit
        )
        top_probes = assign_topn(qq, centroids, n_probe).select(
            F.col("vec_id").alias("query_id"),
            F.col("cluster_id").alias("cell"),
            F.col("qv"),
        )
        if two_level:
            from gerrydb_etl_spark.operators.kmeans import _sqdist

            subs = sub_model.select(
                F.col("cluster_id").alias("cell"), "sub", "cv"
            )
            # left join: unsplit cells keep their implicit subcell 0
            # (NULL d ranks first and is the lone row of its window)
            ranked = top_probes.join(subs, "cell", "left").select(
                "query_id",
                "cell",
                "qv",
                F.coalesce(F.col("sub"), F.lit(0)).alias("sub"),
                F.when(
                    F.col("sub").isNull(), F.lit(0.0)
                ).otherwise(_sqdist(F.col("qv"), F.col("cv"))).alias("d"),
            )
            w = W.partitionBy("query_id", "cell").orderBy("d", "sub")
            top_probes = (
                ranked.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= sub_probe)
                .select("query_id", "cell", "sub", "qv")
            )
        else:
            top_probes = top_probes.withColumn("sub", F.lit(0))
        query_cells = top_probes.select(
            "query_id", "cell", "sub", dv("qv").alias("q_vec")
        ).withColumn("q_nrm", nrm("q_vec"))

        probe = F.broadcast(query_cells) if small_query_set else query_cells
        cand = (
            corpus_cells.join(probe, ["cell", "sub"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id", "q_vec", "q_nrm", "n_vec", "n_nrm"
            )
        )
        dot = fold_sum(
            F.zip_with(F.col("q_vec"), F.col("n_vec"), lambda x, y: x * y)
        )
        scored = cand.select(
            "query_id",
            "neighbor_id",
            (dot / (F.col("q_nrm") * F.col("n_nrm"))).alias("cosine"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )
    finally:
        if quant is not None:
            quant.unpersist()
