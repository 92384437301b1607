"""Count-min sketch over token streams (Cormode & Muthukrishnan
2005) — the frequency-estimation companion to the HLL layer in
queries/sketches.py (SURVEY §2.13 scale extra; the reference has no
sketch surface).

Unlike HLL (whose estimate is engine-specific, so its queries report
tolerance verdicts), a CMS is DETERMINISTIC given its hash family —
here row-salted md5, which both engines spell identically — so the
full sketch build AND every probe replay bitwise in DuckDB SQL and
the registered query carries a complete value-hash oracle.

Scale shape (100 TB):

  * token pre-aggregation is the only corpus-sized shuffle
    (map-side combined);
  * the sketch itself is depth x width counters (4 x 1024 = one
    executor page) built by a second, sketch-sized shuffle; partial
    SUMs ARE the sketch merge, so per-slice sketches persisted to
    parquet can be rolled up later in O(depth*width) exactly like
    the HLL partials;
  * probes broadcast the SKETCH (never the corpus) and the final
    per-token min reuses the pre-agg's hash partitioning — no new
    exchange (tests/test_plan_shapes.py pins this).

Count-min guarantee: est >= exact always; est <= exact + eps*N with
prob 1-delta for eps = e/width, delta = exp(-depth). The registered
heavy-hitter query surfaces exactly this: every token whose estimate
clears the threshold, flagged false_positive when the exact count
does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 1024


def bucket(depth: Column, token: Column, width: int = WIDTH) -> Column:
    """Row-salted md5 bucket: first 8 hex chars -> int -> % width.
    `conv(hex, 16, 10)` here and `CAST('0x'||hex AS BIGINT)` in
    DuckDB produce the same non-negative 32-bit value."""
    h = F.md5(F.concat(depth.cast("string"), F.lit("|"), token))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n): exact per-token counts — the corpus-sized shuffle
    every downstream step builds on."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def build_sketch(counts: DataFrame, depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """(d, b, c): the counter matrix. Input is the pre-aggregated
    (token, n) relation, so the explode is depth x distinct-tokens,
    not depth x corpus."""
    fanned = counts.select(
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
        "token",
        "n",
    )
    return (
        fanned.withColumn("b", bucket(F.col("d"), F.col("token"), width))
        .groupBy("d", "b")
        .agg(F.sum("n").alias("c"))
    )


def estimate(
    counts: DataFrame, sketch: DataFrame, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """(token, n, est): probe every token in `counts` against the
    sketch. The sketch side is broadcast (<= depth*width rows); the
    min-agg reuses the token hash partitioning from the pre-agg."""
    probes = counts.select(
        "token",
        "n",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    ).withColumn("b", bucket(F.col("d"), F.col("token"), width))
    # LEFT join + zero-fill: a probe token that was never inserted
    # hashes to buckets with no sketch row; an inner join would drop
    # those depth rows (min over fewer than `depth` buckets —
    # over-estimating) or lose the token entirely when all its
    # buckets are empty, where the correct count-min answer is 0.
    return (
        probes.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy("token", "n")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )
