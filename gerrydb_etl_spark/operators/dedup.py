"""Deduplication operators for document-scale corpora.

Four tiers, in increasing tolerance for textual drift:

  1. exact_dedup        — content-hash groups (sha256), zero drift
  2. jaccard_pairs      — exact n-gram Jaccard via an inverted-index
                          self-join (never all-pairs)
  3. minhash_lsh_pairs  — MinHash signatures + banded LSH candidate
                          generation; estimates Jaccard from the
                          signature (approximate, tunable)
  4. simhash_pairs      — 64-bit SimHash fingerprints + chunk-blocked
                          Hamming-distance pairs

100 TB design notes
-------------------
The only pair-generation strategy used anywhere is *bucketed
candidate pairs*: shingle inverted index (2), LSH band buckets (3),
or fingerprint chunks (4). There is no all-pairs cross join in any
path — candidate volume is bounded by bucket sizes, and hot buckets
are explicitly capped (``max_shingle_df``) the same way one would
drop stop-shingles in a production near-dup pass. Every groupBy here
partial-aggregates map-side before its shuffle.

The reference has no near-dup machinery (its only dedup is the
full-row ``drop_duplicates`` at pl_geo.py:109-116); this module is
the north-star extension from SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.text import shingles, tokenize


def _drop_hot_keys(
    df: DataFrame, keys: list[str], cap: int
) -> DataFrame:
    """Drop rows whose key-group exceeds ``cap`` occurrences.

    The over-cap key list is computed with a map-side-combined
    groupBy (the shuffle carries one row per distinct key) and is
    tiny by construction — only keys hotter than ``cap`` survive —
    so it broadcasts, and the filter is a BroadcastHashJoin
    (left_anti) that adds no exchange on the data path. A
    count-over-window spelling would instead funnel every occurrence
    of a hot key into one window task: the exact skew the cap exists
    to defuse, concentrated at the guard itself.
    """
    hot = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > cap)
        .select(*keys)
    )
    return df.join(F.broadcast(hot), keys, "left_anti")

# SimHash fingerprints are blocked on 4 x 16-bit chunks: any pair
# within Hamming distance 3 shares at least one exact chunk
# (pigeonhole), so chunk-equality buckets are a complete candidate
# generator for distance <= 3 and a high-recall one beyond.
SIMHASH_CHUNKS = 4
SIMHASH_BITS = 64


def normalized_text(col: Column) -> Column:
    """Dedup normalization: trim + lowercase + collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def content_key(col: Column) -> Column:
    """sha256 content key of normalized text (hex string — identical
    in Spark's sha2 and DuckDB's sha256)."""
    return F.sha2(normalized_text(col), 256)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group exact duplicates by content hash.

    Returns one row per distinct content: (content_key,
    canonical_id = min id, n_copies). Map-side combine collapses
    duplicates before the shuffle, so the exchange carries one row
    per distinct document hash.
    """
    return (
        df.select(
            content_key(F.col(text_col)).alias("content_key"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("content_key")
        .agg(
            F.min("_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_set(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs — the inverted-index input.

    Dedup happens per-document with ``array_distinct`` BEFORE the
    explode (a narrow map), so the trailing ``.distinct()`` shuffles
    already-unique rows: it exists not to dedup but as the shared
    MATERIALIZATION POINT — every consumer (pair join, df counts,
    MinHash signatures) hangs off this one exchange, and Spark's
    runtime exchange reuse computes the tokenize/shingle explosion
    exactly once per query no matter how many branches read it.
    (Measured at sf0.1: dropping the distinct and recomputing the
    narrow explosion per branch is ~1.5x slower end-to-end — the
    regex tokenization is the expensive part, not the shuffle.)"""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.array_distinct(shingles(tokenize(F.col(text_col)), n))
            ).alias("shingle"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs from an
    inverted-index self-join.

    Plan shape — the shingle expansion is a narrow map (per-doc
    ``array_distinct`` replaces a global distinct, see
    ``shingle_set``), so the only full-data shuffle is the self-join
    exchange on shingle (one per side; identical subtrees, so the
    runtime reuses the exchange). The ``max_shingle_df`` stop-shingle
    guard (a df² blow-up guard) is a broadcast left_anti against the
    over-cap shingle list — see ``_drop_hot_keys`` — computed from a
    map-side-combined groupBy whose shuffle carries one row per
    distinct shingle; hot shingles are dropped map-side BEFORE the
    join shuffle, so at 100 TB a stop-shingle's posting list never
    concentrates in any single task (the count-over-window spelling
    this replaced funneled it into one window task). Per-doc set
    sizes are a shuffle-free narrow projection joined to the (tiny)
    candidate-pair table after aggregation; AQE picks broadcast when
    sizes fit. No cache, no unpersist contract, nothing pinned to
    executor storage (the round-2 ``.cache()`` here leaked an
    unbounded shingle set at the 100 TB target).

    Recall under the cap: a candidate pair is surfaced only by
    shingles with document frequency ≤ ``max_shingle_df``. A true
    near-dup pair whose shared shingles are ALL above the cap (every
    shingle a stop-shingle — boilerplate text duplicated across
    >cap documents) is invisible to this index by design; such
    corpora belong to the exact tier (``exact_dedup``) or need a
    higher cap. tests/test_llm_text.py::test_shingle_df_cap_recall
    pins this trade-off; recall above ``threshold`` is otherwise
    unaffected because genuinely near-dup texts share rare shingles.
    """
    sh = shingle_set(df, id_col, text_col, n)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))

    keyed = sh
    if max_shingle_df is not None:
        keyed = _drop_hot_keys(sh, ["shingle"], max_shingle_df)

    left = keyed.select(F.col("doc").alias("d1"), "shingle")
    right = keyed.select(F.col("doc").alias("d2"), "shingle")
    common = (
        left.join(right, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("common"))
    )
    s1 = sizes.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("common") / (F.col("n1") + F.col("n2") - F.col("common"))
    return (
        common.join(s1, "d1")
        .join(s2, "d2")
        .select("d1", "d2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: one xxhash64 family member per
    signature position (seeded by position), min-aggregated over the
    doc's shingle set. One groupBy — num_hashes partial mins combine
    map-side, so the shuffle carries one row per doc."""
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH.

    bands=8 x rows=4 over 32 hashes → a pair with true Jaccard s
    collides in ≥1 band with probability 1-(1-s⁴)⁸ (s=0.8 → 0.98;
    s=0.5 → 0.40), the classic LSH S-curve. Candidates are generated
    ONLY by band-bucket equality (explode to (band, band_key), self-
    join per bucket) — never all-pairs. The emitted ``est_jaccard``
    is the fraction of agreeing signature positions.

    ``max_bucket_size`` is the hot-bucket guard (the band-bucket
    analogue of ``max_shingle_df``): a degenerate corpus — thousands
    of byte-identical documents — collapses into one band bucket
    whose self-join is quadratic. Buckets larger than the cap are
    dropped before the join (broadcast anti-join, ``_drop_hot_keys``),
    bounding candidate volume at bucket_size² per bucket. The cap is
    OPT-IN (default None: complete candidate generation) because a
    capped bucket drops its pairs by design — callers that cap must
    treat the result as recall-bounded, not exhaustive. Identical
    documents belong to the exact tier (``exact_dedup``) anyway;
    near-dup recall for genuinely distinct texts is unaffected at
    any sane cap.
    """
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")

    sig = minhash_signatures(shingle_set(df, id_col, text_col, n), num_hashes)

    # carry the full signature array through the banding so the
    # estimate needs no post-candidate re-join of the signature
    # table (saves two shuffle joins; the array is num_hashes longs
    # per bucket row — cheap payload)
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    sig_arr = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    banded = sig.select(
        F.col("doc"), sig_arr.alias("sig"), F.explode(band_entries).alias("bk")
    ).select("doc", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket_size is not None:
        banded = _drop_hot_keys(banded, ["band", "key"], max_bucket_size)

    agree = F.size(
        F.filter(
            F.zip_with(F.col("a_sig"), F.col("b_sig"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.sig").alias("a_sig"),
            F.col("b.sig").alias("b_sig"),
        )
        .dropDuplicates(["d1", "d2"])
        .select("d1", "d2", (agree / F.lit(num_hashes)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Tokens are weighted by in-doc frequency; each bit of the
    fingerprint is the sign of the weighted sum of that bit across
    token hashes. Entirely built-in expressions: explode → 64
    conditional sums → bit assembly, in ONE map-side-combined
    aggregation whose shuffle carries a single row per doc. No
    per-(doc, token) weight aggregation exists because it is
    algebraically redundant: summing ±1 per token INSTANCE equals
    summing ±frequency per distinct token, so the frequency
    weighting falls out of the instance-level sum for free (the
    two-shuffle spelling this replaced computed identical
    fingerprints ~40% slower).
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokenize(F.col(text_col))).alias("t"),
    ).select("doc", F.xxhash64("t").alias("h"))
    bit_sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc").agg(*bit_sums)
    fp = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select("doc", fp.alias("fingerprint"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs within ``max_hamming`` bit flips.

    Candidate generation blocks on the 4 x 16-bit fingerprint chunks
    (complete for distance ≤ 3 by pigeonhole); verification is a
    bit_count(xor) on the candidate set only. ``max_bucket_size``
    drops chunk buckets above the cap before the self-join
    (broadcast anti-join, ``_drop_hot_keys``) — the same
    quadratic-bucket guard as minhash_lsh_pairs (a corpus of
    identical documents puts them all in every chunk bucket), and
    the same opt-in default (None = complete for distance ≤ 3;
    capped = recall-bounded); identical documents are the exact
    tier's job.
    """
    fps = simhash(df, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("fingerprint"), c * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for c in range(SIMHASH_CHUNKS)
        ]
    )
    blocked = fps.select(
        "doc", "fingerprint", F.explode(chunks).alias("ck")
    ).select("doc", "fingerprint", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    if max_bucket_size is not None:
        blocked = _drop_hot_keys(blocked, ["chunk", "key"], max_bucket_size)

    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
