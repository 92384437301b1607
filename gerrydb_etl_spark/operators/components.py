"""Connected components over near-duplicate pairs → dedup clusters.

Near-dup pair lists (from MinHash/Jaccard/SimHash) are edges; the
dedup decision needs the transitive closure: if A~B and B~C, one
representative survives for {A, B, C}. Components are computed by
min-label propagation with POINTER JUMPING: every round each node
(1) adopts the smallest label among itself and its neighbors, then
(2) adopts its label's label (label(u) := label(label(u))). Step 2
halves the remaining label-chain depth, so convergence is
O(log diameter) rounds — a chain of 1000 nodes converges in ~10
rounds instead of ~1000 (the Kiveris et al. star-contraction papers
achieve the same bound; pointer jumping is the simpler spelling on
a label table).

Scale: each iteration is one join edges⋈labels + one min-aggregate
(plus, from round 3 on, the label⋈label jump self-join — deferred
because shallow dedup graphs converge before a jump helps) — all
key-partitioned, no driver data.
The convergence probe (`changed == 0`) is a driver-side COUNT of a
boolean aggregate — O(1) result, not a collect. Edges and each
round's labels are eagerly materialized so iteration re-executes
neither the expensive pair generation nor the growing lineage:
pass ``checkpoint_dir`` for reliable `checkpoint()` (survives
executor loss — the cluster-safe mode); the default is
`localCheckpoint` (faster, executor-pinned — fine for local[n]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.checkpointing import checkpoint_once


def connected_components(
    pairs: DataFrame,
    a: str = "d1",
    b: str = "d2",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Components of the undirected graph given by pair rows.
    Returns (doc, cluster_rep) where cluster_rep = min node id of
    the component. Only nodes appearing in pairs are returned.

    ``checkpoint_dir``: when set, per-round label tables are written
    to this (fault-tolerant) location with `checkpoint()` instead of
    `localCheckpoint()` — lost-executor recomputation is impossible
    after lineage truncation, so a real cluster run should always
    pass a reliable dir (HDFS/S3 path). Checkpoint files accumulate
    for the run's duration; the caller owns the directory's cleanup.
    """
    def materialize(df: DataFrame) -> DataFrame:
        # truncate lineage NOW: pair generation (e.g. the Jaccard
        # inverted index) is the expensive upstream, and every
        # round + convergence count would otherwise re-execute it
        return checkpoint_once(df, checkpoint_dir)

    edges = materialize(
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    prev = None
    converged = False
    for it in range(max_iter):
        # (1) min over neighborhood
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the pre-round label as __prev so the change test at
        # the end of the round is an inline comparison, not a join
        # back against the previous label table
        prop = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.col("label").alias("__prev"),
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # (2) pointer jump: label(u) := label(label(u)) — halves the
        # remaining label-chain depth. Deferred two rounds: near-dup
        # graphs are almost always diameter <= 3 (pairs share a
        # common ancestor doc) and converge before a jump would help,
        # so the common case never pays the extra self-join; only
        # graphs still unconverged at round 3 — the deep ones the
        # jump exists for — take it. Every label value is itself a
        # node id present in the label table, so the self-join
        # resolves (left + coalesce for safety). A jump at fixpoint
        # is a no-op, so the convergence test below stays complete.
        if it >= 2:
            parent = prop.select(
                F.col("node").alias("p_node"), F.col("label").alias("p_label")
            )
            prop = prop.join(
                parent, prop["label"] == parent["p_node"], "left"
            ).select(
                prop["node"].alias("node"),
                prop["__prev"].alias("__prev"),
                F.least(
                    prop["label"], F.coalesce(parent["p_label"], prop["label"])
                ).alias("label"),
            )
        # labels are monotonically non-increasing, so "< previous
        # round's label" is the complete change test
        updated = materialize(
            prop.select(
                "node", "label", (F.col("label") < F.col("__prev")).alias("__changed")
            )
        )
        changed = updated.filter(F.col("__changed")).count()
        if prev is not None:
            prev.unpersist()
        prev = updated
        labels = updated.drop("__changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        # returning unconverged labels would silently split
        # components; with pointer jumping max_iter=20 covers
        # diameters up to ~2^20 — hitting this means something is
        # structurally wrong, not merely a deep graph
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter for pathological graphs"
        )
    return labels.select(F.col("node").alias("doc"), F.col("label").alias("cluster_rep"))
