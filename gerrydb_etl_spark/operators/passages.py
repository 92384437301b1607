"""Cross-document passage dedup and winnowing fingerprint selection.

Two corpus-hygiene operators a training-data pipeline runs before
tokenization (the reference has no text surface; this extends the
SURVEY.md §2.12 north star alongside operators/dedup.py):

- **Repeated-passage removal** (C4-style, Raffel et al. 2020 §2.2):
  split every document into fixed-size non-overlapping token blocks,
  find blocks that occur in >= min_docs distinct documents
  (boilerplate / license headers / navigation chrome), delete them
  from every document, and reassemble the survivors in order.

- **Robust winnowing** (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
  per-position k-gram rolling hashes; for every window of w
  consecutive hashes select the minimum, breaking ties by the
  RIGHTMOST occurrence; the distinct selected (position, hash) pairs
  are the document's fingerprints. Guarantees at least one shared
  fingerprint for any match of length >= w + k - 1.

Scale design: winnowing is computed entirely in the per-row array
domain (transform/slice/aggregate — whole-stage codegen, ZERO
shuffles before the final explode), so it runs at scan speed over
100 TB. Passage dedup is the canonical two-shuffle shape: one
map-side-combined distinct-doc count per block text, one anti-join
of blocks against the boilerplate set, one reassembly aggregation;
no step is quadratic and the block-count aggregate is bounded by
corpus vocabulary, not pair counts. Both use the portable token-code
hash from functions/text.py (no engine-specific hash functions), so
each carries a full DuckDB value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.text import FP_BASE, FP_MOD, tokenize


def _token_codes(tokens: Column) -> Column:
    """Engine-portable per-token integer code (same scheme as
    functions/text.py rolling_fingerprint): len(token)*256 + ascii of
    the first char. Stays < 2^20, so a k-step base-131 fold mod
    FP_MOD never overflows int64 in either engine."""
    return F.transform(
        tokens, lambda t: F.length(t).cast("long") * 256 + F.ascii(t).cast("long")
    )


def kgram_hashes(codes: Column, k: int) -> Column:
    """array<long> of rolling k-gram hashes over a MATERIALIZED
    token-code array column (apply _token_codes in a prior select —
    passing the codes expression inline would re-evaluate it once
    per sequence element, turning O(n·k) into O(n²)): base-131
    polynomial fold of the k codes mod FP_MOD per start position
    0..n-k. Pure array-domain expression — no explode, no shuffle.

    Inputs shorter than k yield an EMPTY array: Spark's
    ``sequence(0, n-k)`` counts DOWN when n < k and would otherwise
    hash garbage from negative slice indices, so the guard lives
    here, not at call sites."""
    return F.when(
        F.size(codes) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(codes) - k),
            lambda i: F.aggregate(
                F.slice(codes, i + 1, k),
                F.lit(0).cast("long"),
                lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_select(khashes: Column, w: int) -> Column:
    """Robust-winnowing selection over an array of k-gram hashes:
    for each window start j in 0..P-w pick the 0-based position of
    the window's minimum hash, rightmost on ties, and return the
    distinct selected positions (array<long>, ascending by window).

    Rightmost arg-min of slice s = w - position_of_min_in(reverse(s))
    (array_position is 1-based first-occurrence, so on the reversed
    slice it finds the rightmost original occurrence).

    Inputs with fewer than w hashes (no complete window) yield an
    EMPTY array — same down-counting ``sequence`` hazard as
    kgram_hashes, guarded here so new callers can't misuse it."""

    def pick(j: Column) -> Column:
        window = F.slice(khashes, j + 1, w)
        return j + (w - F.array_position(F.reverse(window), F.array_min(window)))

    return F.when(
        F.size(khashes) >= w,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size(khashes) - w), pick)
        ),
    ).otherwise(F.array().cast("array<long>"))


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Winnowing fingerprints per document: (doc_id, pos, fingerprint)
    rows, one per selected k-gram. Documents shorter than k + w - 1
    tokens (no complete window) are dropped — same guard in the SQL
    oracle, so the contract is explicit rather than a boundary
    special-case.

    Plan shape: a single narrow projection chain over the scan (the
    whole selection happens inside array expressions), then one
    explode. Zero shuffles — verified by tests/test_passages.py.

    ``codes`` (optional): pre-computed (id_col, codes) token-code
    rows — pass store/staging.py's staged fixture so the k=3 and
    k=5 winnowing consumers share one tokenize pass; values are
    identical to the inline spelling by construction.
    """
    # Filtering short documents up front keeps the dropped-docs
    # contract explicit and the downstream arrays non-empty (the
    # helpers themselves also guard the n < k / n < w sequence
    # hazard and return empty arrays for short inputs). Token codes
    # are materialized as a column in their own projection so the
    # k-gram transform references them O(1) per position instead of
    # re-running tokenize per position.
    if codes is None:
        codes = docs.select(
            F.col(id_col), _token_codes(tokenize(text_col)).alias("codes")
        )
    codes = codes.where(F.size("codes") >= k + w - 1)
    picked = codes.select(
        F.col(id_col),
        kgram_hashes(F.col("codes"), k).alias("kh"),
    )
    sel = picked.select(
        id_col,
        "kh",
        F.explode(winnow_select(F.col("kh"), w)).alias("pos"),
    )
    return sel.select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.element_at("kh", (F.col("pos") + 1).cast("int")).alias("fingerprint"),
    )


def passage_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """C4-style repeated-passage removal.

    Splits each document into consecutive ``block_tokens``-token
    blocks, removes every block whose exact text occurs in >=
    ``min_docs`` DISTINCT documents, and reassembles the remaining
    blocks in original order. Returns one row per input document:
    (doc_id, clean_text, n_blocks, blocks_removed) — documents whose
    every block was boilerplate survive with clean_text = ''.

    Scale: block texts are grouped map-side-combined (cardinality =
    distinct passages, not documents x blocks); the boilerplate set
    is joined back with a shuffle hash anti-join keyed on the block
    text (at 100 TB you would key this on xxhash64(block) — kept as
    the raw text here so the DuckDB oracle replays bit-for-bit, and
    documented as the one concession to oracle parity). Reassembly
    is one aggregation with an in-group array sort — no window over
    an unbounded frame, no collect.
    """
    # Materialize the token array in its own projection first: using
    # the tokenize expression inside the per-block lambda would
    # re-split the whole document once per block (O(n²/B) per doc).
    tokenized = docs.select(
        F.col(id_col), tokenize(text_col).alias("toks")
    ).select(
        id_col,
        "toks",
        F.expr(f"(size(toks) + {block_tokens - 1}) div {block_tokens}").alias(
            "n_blocks"
        ),
    )
    blocks = tokenized.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_blocks") - 1),
                lambda j: F.array_join(
                    F.slice("toks", j * block_tokens + 1, block_tokens), " "
                ),
            )
        ).alias("blk", "blk_text"),
    )
    boilerplate = (
        blocks.groupBy("blk_text")
        .agg(F.countDistinct(id_col).alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("blk_text")
    )
    kept = blocks.join(boilerplate, "blk_text", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("blk", "blk_text"))),
                lambda s: s["blk_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = tokenized.select(
        id_col, F.col("n_blocks").cast("long").alias("n_blocks")
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_blocks",
        (F.col("n_blocks") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("blocks_removed"),
    )


def duplicate_substring_spans(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 5,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Exact duplicate-substring removal spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    find every ``min_len``-token run whose hash occurs MORE than once
    corpus-wide (across documents or repeated within one), KEEP the
    first occurrence (minimum (doc, pos)), and emit the merged token
    spans each document should delete. Position-granular — the
    arbitrary-offset duplicates that block-aligned ``passage_dedup``
    cannot see. (The reference implementation uses suffix arrays; a
    distributed engine gets the same contract from the rolling-hash
    inverted index, modulo ~n²/2·FP_MOD hash-collision probability —
    negligible below billions of grams and the standard trade.)

    Returns (id, span_idx, start_tok, n_toks) — one row per merged
    removal span.

    Scale shape: one posexplode of per-doc k-gram hashes → the
    keep-first representative per hash via a MAP-SIDE-COMBINED
    ``min(struct(doc, pos))`` aggregation (NO per-hash window: a
    boilerplate gram with millions of occurrences would funnel one
    reducer; the min-struct combiner never builds the posting list)
    → co-shuffled join back on the hash key (AQE handles hot-gram
    skew) → per-DOCUMENT gaps-and-islands interval merge (windows
    shard-keyed by doc, never global).
    """
    from pyspark.sql.window import Window as W

    if codes is None:
        codes = docs.select(
            F.col(id_col), _token_codes(tokenize(text_col)).alias("codes")
        )
    kh = codes.select(id_col, kgram_hashes(F.col("codes"), min_len).alias("kh"))
    occ = kh.select(id_col, F.posexplode_outer("kh").alias("pos", "h")).where(
        F.col("h").isNotNull()
    )
    firsts = occ.groupBy("h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "keep"
        ),
        F.count("*").alias("n_occ"),
    )
    dups = (
        occ.join(firsts, "h")
        .where(
            (F.col("n_occ") >= 2)
            & (
                (F.col(id_col) != F.col("keep.d"))
                | (F.col("pos") != F.col("keep.p"))
            )
        )
        .select(id_col, "pos")
    )
    w = W.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + min_len).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = dups.select(
        id_col,
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    islands = marked.select(
        id_col,
        "pos",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("isl"),
    )
    return (
        islands.groupBy(id_col, "isl")
        .agg(
            F.min("pos").alias("start"),
            F.max(F.col("pos") + min_len).alias("end"),
        )
        .select(
            id_col,
            (F.col("isl") - 1).cast("long").alias("span_idx"),
            F.col("start").cast("long").alias("start_tok"),
            (F.col("end") - F.col("start")).cast("long").alias("n_toks"),
        )
    )
