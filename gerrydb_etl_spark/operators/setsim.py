"""Exact set-similarity join via prefix filtering (PPJoin-style).

The inverted-index Jaccard tier (operators/dedup.py jaccard_pairs)
buys scale with a stop-shingle document-frequency cap — exact on the
pairs it surfaces, but pairs whose every shared shingle is hotter
than the cap are invisible by design. This operator is the
complementary EXACT tier: no cap, no recall trade-off, built on the
prefix-filtering theorem (Chaudhuri et al. SSJoin / Xiao et al.
PPJoin — both public literature):

    order all shingles by one global total order; for Jaccard ≥ t a
    set of size n must match another qualifying set in its PREFIX of
    the first  n - ceil(t*n) + 1  shingles under that order.

Ordering by ascending document frequency makes prefixes the RAREST
shingles, so the candidate join only shuffles posting rows for
low-df shingles — roughly the (1-t) rarest fraction of the index
instead of all of it, with no hot posting list by construction
(a df-heavy shingle is never in anyone's prefix until the tail of
the order). Candidate pairs then get one exact verification count.
The per-doc prefix is selected by a row_number window keyed by doc
(full parallelism); no global rank is materialized — any consistent
total order satisfies the theorem, so (df, shingle) itself is the
sort key and the df lookup is a vocabulary-bounded keyed join.

All comparisons are integer cross-multiplications (threshold t =
num/den), so results replay exactly in a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def prefix_filter_pairs(
    rows: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """All pairs with Jaccard(shingle sets) ≥ t_num/t_den, exactly.

    ``rows``: unique (doc, n_sh, shingle) rows — each doc's DISTINCT
    shingle set with its size riding every row (the staged
    inverted-index input from store/staging.py).
    Returns (d1, d2, n1, n2, common, jac_ppm).
    """
    df_counts = rows.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = rows.join(df_counts, "shingle")
    pos = F.row_number().over(
        W.partitionBy("doc").orderBy("df", "shingle")
    )
    # prefix length = n - ceil(t*n) + 1, integer ceil via (t_num*n +
    # t_den - 1) div t_den
    plen = (
        F.col("n_sh")
        - F.expr(f"({t_num} * n_sh + {t_den - 1}) div {t_den}")
        + F.lit(1)
    )
    # the prefix frame feeds BOTH candidate-join sides; persist it so
    # the df-join + window pipeline runs once, and checkpoint the
    # (small) verified-pair result so the block can be released on
    # exit — the pagerank/triangles lifecycle contract
    pref = ranked.select(
        "doc", "n_sh", "shingle", pos.alias("pos")
    ).where(F.col("pos") <= plen).persist()
    try:
        return _verified_pairs(rows, pref, t_num, t_den).localCheckpoint(
            eager=True
        )
    finally:
        pref.unpersist()


def _verified_pairs(
    rows: DataFrame, pref: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    p1 = pref.select(
        F.col("doc").alias("d1"), F.col("n_sh").alias("n1"),
        F.col("pos").alias("p1"), "shingle",
    )
    p2 = pref.select(
        F.col("doc").alias("d2"), F.col("n_sh").alias("n2"),
        F.col("pos").alias("p2"), "shingle",
    )
    # length filter: t*n1 <= n2 and t*n2 <= n1 (cross-multiplied).
    # Positional filter (PPJoin, lossless): a pair needs overlap
    # alpha = ceil(t_num*(n1+n2)/(t_num+t_den)); for the FIRST
    # shared shingle in the global (df, shingle) order every common
    # shingle sits at-or-after positions (p1, p2), so common <=
    # min(n1-p1, n2-p2) + 1 on that row — any qualifying pair keeps
    # at least that row, and rows whose positional bound cannot
    # reach alpha are pruned BEFORE the DISTINCT and the two
    # verification joins (integer cross-multiplied: ub >= ceil(X/Y)
    # <=> Y*ub >= X for positive ints).
    pos_ub = F.least(
        F.col("n1") - F.col("p1"), F.col("n2") - F.col("p2")
    ) + F.lit(1)
    cand = (
        p1.join(p2, "shingle")
        .where(
            (F.col("d1") < F.col("d2"))
            & (t_num * F.col("n1") <= t_den * F.col("n2"))
            & (t_num * F.col("n2") <= t_den * F.col("n1"))
            & (
                (t_num + t_den) * pos_ub
                >= t_num * (F.col("n1") + F.col("n2"))
            )
        )
        .select("d1", "d2", "n1", "n2")
        .distinct()
    )
    # exact verification: intersection size per surviving pair; the
    # two joins fan out each candidate by its doc's set size only
    r1 = rows.select(F.col("doc").alias("d1"), F.col("shingle").alias("s1"))
    r2 = rows.select(F.col("doc").alias("r2_doc"), F.col("shingle").alias("s2"))
    common = (
        cand.join(r1, "d1")
        .join(
            r2,
            (F.col("d2") == F.col("r2_doc")) & (F.col("s1") == F.col("s2")),
        )
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count("*").alias("common"))
    )
    union_size = F.col("n1") + F.col("n2") - F.col("common")
    return common.where(
        t_den * F.col("common") >= t_num * union_size
    ).select(
        "d1",
        "d2",
        "n1",
        "n2",
        "common",
        F.expr("(1000000 * common) div (n1 + n2 - common)").alias("jac_ppm"),
    )
