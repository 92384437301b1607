"""Training-data document prep: fixed-stride chunking and
intra-document repetition statistics.

Two operators a large-scale LLM-data pipeline runs between dedup and
tokenization, absent from the reference (its text handling stops at
column renames, e.g. pl_localities.py:139-144):

- ``chunk_documents``: split each document into fixed-size character
  chunks with overlap (stride < chunk size). A pure narrow map —
  sequence/transform/posexplode inside whole-stage codegen, zero
  shuffles, so it scales with input splits: at 100 TB the operator
  is embarrassingly parallel and the output partitioning inherits
  the scan's.

- ``repetition_stats``: per-document duplicate-word fraction and
  top-bigram occurrence fraction — the intra-doc repetition signals
  behind Gopher/RefinedWeb-style quality filtering (boilerplate and
  generator loops show up as high duplicate fractions). Shape: one
  explode (narrow) then two map-side-combined groupBys keyed by
  (doc_id, gram) then (doc_id,) — the grouping key always carries
  doc_id, so hot words never concentrate on one reducer and shuffle
  volume is #distinct (doc, gram) pairs, not #gram occurrences.

- ``cdc_chunks``: CONTENT-DEFINED chunking (the LBFS/rsync/restic
  family): chunk boundaries fall where a rolling k-gram hash hits a
  residue class, so an insertion near the start of a document moves
  only the chunks it touches — fixed-stride chunk identities all
  shift, content-defined ones are stable, which is what makes
  chunk-level dedup across recrawls work. Entirely array-domain
  (codes → k-gram hashes → cut positions → span explode), zero
  shuffles before the output explode, like winnowing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 100,
    stride: int = 80,
) -> DataFrame:
    """Explode each document into overlapping character chunks:
    chunk i covers [i*stride, i*stride + chunk_size). The last chunk
    may be short; every character belongs to at least one chunk.
    Start count is 1 + ceil(max(len - chunk_size, 0) / stride),
    computed with integer-exact floor arithmetic so the SQL oracle
    can reproduce it bit-for-bit."""
    if not 0 < stride <= chunk_size:
        raise ValueError("require 0 < stride <= chunk_size")
    n = F.length(F.col(text_col))
    extra = F.greatest(n - F.lit(chunk_size), F.lit(0))
    last_start = F.floor((extra + F.lit(stride - 1)) / F.lit(stride))
    exploded = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.explode(F.sequence(F.lit(0).cast("long"), last_start)).alias(
            "chunk_id"
        ),
    )
    chunk = F.substring(
        F.col(text_col),
        (F.col("chunk_id") * stride + 1).cast("int"),
        chunk_size,
    )
    return exploded.select(
        id_col,
        "chunk_id",
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )


def _bigrams(words: Column) -> Column:
    """Adjacent-word bigrams of a token array; empty for <2 tokens
    (guarded: Spark's sequence(0, -1) would count DOWN)."""
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.55,
    max_top_bigram_frac: float = 0.05,
) -> DataFrame:
    """Per-document repetition signals + keep verdict.

    dup_word_frac  = (n_words - n_distinct_words) / n_words — the
        fraction of word occurrences that are repeats.
    top_bigram_frac = occurrences of the most frequent bigram /
        total bigram occurrences (0.0 for single-word docs).
    keep = both signals at or under their thresholds.
    """
    # One pass: unigrams and bigrams ride the SAME explode. A bigram
    # always contains a space and a split() token never does, so the
    # gram kind is recoverable downstream and the two families can't
    # collide in the (doc, gram) count — one scan, one count shuffle,
    # one per-doc agg, no join. The token array is materialized in
    # its own projection BEFORE any per-element access: referencing
    # `split(text, ' ')` directly inside the transform lambda lets
    # Catalyst inline the split into every element_at call —
    # O(words^2) re-tokenization per doc (measured 11.9 s at sf0.1
    # for this exact query; ~1 s after).
    tokened = docs.select(id_col, F.split(F.col(text_col), " ").alias("_w"))
    grams = tokened.select(
        id_col,
        F.explode(F.concat(F.col("_w"), _bigrams(F.col("_w")))).alias("gram"),
    )
    gram_counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    is_bigram = F.col("gram").contains(" ")
    per_doc = gram_counts.groupBy(id_col).agg(
        F.sum(F.when(~is_bigram, F.col("c")).otherwise(0)).alias("n_words"),
        F.count(F.when(~is_bigram, True)).alias("n_distinct_words"),
        F.sum(F.when(is_bigram, F.col("c")).otherwise(0)).alias("n_bigrams"),
        F.max(F.when(is_bigram, F.col("c"))).alias("top_bigram_n"),
    )

    dup_frac = (F.col("n_words") - F.col("n_distinct_words")) / F.col(
        "n_words"
    )
    top_frac = F.coalesce(
        F.col("top_bigram_n") / F.col("n_bigrams"), F.lit(0.0)
    )
    return per_doc.select(
        id_col,
        "n_words",
        dup_frac.alias("dup_word_frac"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac <= F.lit(max_dup_word_frac))
            & (top_frac <= F.lit(max_top_bigram_frac))
        ).alias("keep"),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    boundary_mod: int = 16,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Content-defined chunking over whitespace tokens.

    A cut falls BEFORE token position p (1-based over the k-gram
    array, i.e. the k-gram starting at token p) whenever the rolling
    k-gram hash at p is ≡ 0 (mod ``boundary_mod``) — expected chunk
    length ≈ boundary_mod tokens. Chunks are the spans between
    consecutive cuts ([0, n) when no cut fires, e.g. short docs);
    every chunk carries the base-131 polynomial fingerprint of its
    token codes, the dedup-able chunk identity. Insertions move only
    the chunks they touch (boundaries are contentic, not positional)
    — the property fixed-stride ``chunk_documents`` lacks.

    Returns (id, chunk_idx, start_tok, n_toks, chunk_fp). Entirely
    array-domain until one posexplode — zero shuffles (plan-pinned in
    tests/test_docprep.py). The k-gram/short-input hazards are
    guarded here and inside the shared helpers (operators/passages).

    ``codes`` (optional): pre-computed (id_col, codes) token-code
    rows — pass store/staging.py's staged fixture to share the
    tokenize pass with the winnowing family; values identical to the
    inline spelling by construction.
    """
    from gerrydb_etl_spark.functions.text import FP_BASE, FP_MOD, tokenize
    from gerrydb_etl_spark.operators.passages import _token_codes, kgram_hashes

    if codes is None:
        codes = docs.select(
            F.col(id_col), _token_codes(tokenize(text_col)).alias("codes")
        )
    base = codes.select(
        id_col,
        "codes",
        F.size("codes").alias("n"),
        kgram_hashes(F.col("codes"), k).alias("kh"),
    )
    # cut positions: 1..len(kh)-1 where kh[p] % mod == 0 (sequence
    # guarded against the n<2 down-count hazard)
    cuts = F.when(
        F.size("kh") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.size("kh") - 1),
            lambda p: F.element_at("kh", (p + 1).cast("int"))
            % boundary_mod
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    spans = base.withColumn("cuts", cuts).select(
        id_col,
        "codes",
        F.concat(F.array(F.lit(0)), F.col("cuts")).alias("starts"),
        F.concat(F.col("cuts"), F.array(F.col("n"))).alias("ends"),
    ).withColumn(
        "span",
        F.zip_with(
            "starts",
            "ends",
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
    )
    # posexplode_OUTER, deliberately: a plain posexplode makes the
    # Generate prepend an implicit `size(span) > 0` Filter, and
    # filter pushdown drags that predicate below the three
    # materializing Projects — inlining the whole kh→cuts→span
    # expression chain into one predicate tree where the k-gram
    # transform is re-evaluated per lambda element: O(n²) per doc
    # (measured 20.5 s at sf0.1; 1.3 s with outer). `span` is never
    # empty (starts always holds position 0), so outer emits no null
    # rows and the results are identical.
    exploded = spans.select(
        id_col,
        "codes",
        F.posexplode_outer("span").alias("chunk_idx", "se"),
    )
    fp = F.aggregate(
        F.slice(
            "codes",
            (F.col("se.s") + 1).cast("int"),
            (F.col("se.e") - F.col("se.s")).cast("int"),
        ),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("se.s").cast("long").alias("start_tok"),
        (F.col("se.e") - F.col("se.s")).cast("long").alias("n_toks"),
        fp.alias("chunk_fp"),
    )
