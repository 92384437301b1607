"""Fixed-point integer PageRank over an edge DataFrame.

Iterative graph centrality — the canonical "Spark can do iterative
algorithms declaratively" operator alongside operators/kmeans.py and
operators/components.py. The twist that makes it ORACLE-CHECKABLE:
all arithmetic is integer fixed-point (scores are micro-units of a
SCALE-sized total mass, every division is floor division, every sum
is a BIGINT sum). Integer sums are associative-commutative with no
rounding, so Spark's arbitrary aggregation order and DuckDB's agree
bit-for-bit, and the DuckDB oracle is the same recurrence unrolled
into one CTE chain per iteration. Float PageRank can only ever get a
tolerance check; this one gets a value-hash gate.

Update rule (damping 0.85 as the exact rational 85/100):

    new(v) = (15 * (SCALE // N)) // 100
           + (85 * (insum(v) + dangling // N)) // 100

where insum(v) = sum over in-edges (u,v) of score(u) // outdeg(u)
and dangling = total score held by nodes with no out-edges,
redistributed uniformly. All quantities nonnegative, so Spark's
`div` (truncate) and DuckDB's `//` (floor) coincide; max
intermediate 85 * SCALE = 8.5e13 stays far inside int64.

Scale design: each iteration is two shuffles (contribution group-by
and score re-join) over edge-partitioned data — the standard
distributed PageRank shape; the iteration count is a static literal
so the lineage stays shallow (no checkpoint needed at <= ~10
rounds). N and the per-round dangling mass are single-BIGINT model
state collected to the driver and re-folded as literals (same
bounded-model-collect contract as operators/kmeans.py centroids) —
never a collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed_point(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    iterations: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """``nodes``: one column ``node`` (long, distinct). ``edges``:
    columns ``src``, ``dst`` (distinct pairs). Returns (node, score)
    after ``iterations`` fixed-point rounds from the uniform start
    score = scale // N."""
    # N and the per-round dangling mass are MODEL STATE, not data:
    # one BIGINT each. They are collected to the driver (the same
    # bounded-model-collect contract operators/kmeans.py uses for
    # its k x dim centroids) and folded back in as literals — a
    # scalar cross join would compile to BroadcastNestedLoopJoin,
    # which the plan gate (tests/test_plan_shapes.py) bans.
    # Edges (and their degree table) feed every round's contribution
    # join AND the dangling-mass anti-join; without a persist the
    # upstream edge derivation (often a join + distinct) would be
    # recomputed O(iterations) times.
    edges = edges.persist()
    # nodes is consulted every round (re-score join) plus the count —
    # persist it alongside edges so a derived node set (e.g. a union
    # of dimension scans) isn't recomputed per round
    nodes = nodes.persist()
    # try/finally so a mid-iteration failure (bad edge schema, OOM in
    # one round's action) can't leak the cached edge/degree/score
    # blocks into the rest of the session — same exit-path hygiene as
    # kmeans_train / ivf_topk. Every persisted frame goes on `pinned`
    # the moment it is pinned (unpersist on an already-released frame
    # is a no-op, so the loop's eager releases stay as-is).
    pinned: list[DataFrame] = [edges, nodes]
    try:
        n = nodes.count()
        base = (15 * (scale // n)) // 100
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("outdeg")
        ).persist()
        pinned.append(deg)
        scores = nodes.select(
            "node", F.lit(scale // n).cast("long").alias("score")
        )
        prev = None
        for _ in range(iterations):
            # persist before the dangling-mass aggregate so the
            # round's scores are computed once, not once per
            # downstream action
            scores = scores.persist()
            pinned.append(scores)
            dang = (
                scores.join(deg, "node", "left_anti")
                .agg(F.coalesce(F.sum("score"), F.lit(0)))
                .first()[0]
            )
            insum = (
                edges.join(scores.withColumnRenamed("node", "src"), "src")
                .join(deg.withColumnRenamed("node", "src"), "src")
                .selectExpr("dst AS node", "score div outdeg AS contrib")
                .groupBy("node")
                .agg(F.sum("contrib").alias("insum"))
            )
            if prev is not None:
                prev.unpersist()
            prev = scores
            scores = nodes.join(insum, "node", "left").selectExpr(
                "node",
                f"{base} + (85 * (COALESCE(insum, 0) + {dang // n})) div 100"
                " AS score",
            )
        # Materialize the final round once and sever lineage so every
        # cached input can be released before returning (same
        # localCheckpoint pattern as operators/kmeans.py semantic
        # dedup). The checkpointed frame is NOT on `pinned` — its
        # blocks must outlive this call.
        return scores.localCheckpoint(eager=True)
    finally:
        for df in pinned:
            df.unpersist()
