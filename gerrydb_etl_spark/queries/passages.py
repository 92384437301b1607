"""Driver-visible queries for the passage-hygiene operators
(operators/passages.py): C4-style repeated-passage removal and
robust winnowing fingerprints, each with a full DuckDB value-hash
oracle built on the same portable token-code hash the Spark side
uses (no engine-specific hash functions anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gerrydb_etl_spark.functions.text import FP_BASE, FP_MOD
from gerrydb_etl_spark.operators.dedup import containment_pairs
from gerrydb_etl_spark.operators.passages import (
    duplicate_substring_spans,
    passage_dedup,
)
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table
from gerrydb_etl_spark.store.staging import staged_shingles, staged_token_codes

BLOCK_TOKENS = 10
MIN_DOCS = 2
WINNOW_K = 3
WINNOW_W = 4

# Shared oracle fragment: per-token integer code, identical to
# operators/passages.py _token_codes (len*256 + ascii of first char).
_CODES = "list_transform(string_split(text, ' '), t -> length(t)::BIGINT * 256 + ascii(t)::BIGINT)"


@query(
    "passage_dedup",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               (len(string_split(text, ' ')) + {BLOCK_TOKENS - 1}) // {BLOCK_TOKENS}
                   AS n_blocks
        FROM documents
    ),
    blocks AS (
        SELECT doc_id, blk,
               array_to_string(
                   w[blk * {BLOCK_TOKENS} + 1 : (blk + 1) * {BLOCK_TOKENS}], ' '
               ) AS blk_text
        FROM (SELECT doc_id, w,
                     unnest(generate_series(0, n_blocks - 1)) AS blk
              FROM s)
    ),
    boilerplate AS (
        SELECT blk_text FROM blocks
        GROUP BY blk_text HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
    ),
    kept AS (
        SELECT * FROM blocks
        WHERE blk_text NOT IN (SELECT blk_text FROM boilerplate)
    ),
    reassembled AS (
        SELECT doc_id,
               string_agg(blk_text, ' ' ORDER BY blk) AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(clean_text, '') AS clean_text,
           s.n_blocks,
           CAST(s.n_blocks - COALESCE(n_kept, 0) AS BIGINT) AS blocks_removed
    FROM s LEFT JOIN reassembled ON s.doc_id = reassembled.doc_id
    """,
)
def passage_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove every 10-token block that appears verbatim in >= 2
    distinct documents (boilerplate / near-duplicate passages) and
    reassemble each document from its surviving blocks."""
    docs = load_table(spark, sf_dir, "documents")
    return passage_dedup(docs, block_tokens=BLOCK_TOKENS, min_docs=MIN_DOCS)


@query(
    "winnow_fingerprints",
    oracle=f"""
    WITH kh AS (
        SELECT doc_id,
               list_transform(
                   range(0, len(codes) - {WINNOW_K} + 1),
                   i -> list_reduce(
                       codes[i + 1 : i + {WINNOW_K}],
                       (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}
                   ) % {FP_MOD}
               ) AS kh
        FROM (SELECT doc_id, {_CODES} AS codes FROM documents)
        WHERE len(codes) >= {WINNOW_K + WINNOW_W - 1}
    ),
    sel AS (
        SELECT doc_id, kh,
               unnest(list_distinct(list_transform(
                   range(0, len(kh) - {WINNOW_W} + 1),
                   j -> j + ({WINNOW_W} - list_position(
                       list_reverse(kh[j + 1 : j + {WINNOW_W}]),
                       list_min(kh[j + 1 : j + {WINNOW_W}])
                   ))
               ))) AS pos
        FROM kh
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           kh[CAST(pos AS INT) + 1] AS fingerprint
    FROM sel
    """,
)
def winnow_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-winnowing fingerprints (k=3-gram rolling hash, window
    w=4, rightmost-min tie-break) per document — the MOSS document-
    fingerprint scheme. Reads the session-staged fingerprint index
    (r18): MOSS fingerprints exist to be PERSISTED — matching runs
    against a stored fingerprint database, never re-fingerprinted
    documents — so the index is write-once corpus state like the
    staged dHash/SimHash fingerprints; values identical to the inline
    array-domain selection by construction
    (store/staging.py ensure_staged_winnow), the full-replay oracle
    unchanged."""
    from gerrydb_etl_spark.store.staging import staged_winnow

    return staged_winnow(spark, sf_dir, k=WINNOW_K, w=WINNOW_W)


CONTAINMENT_TAU = 0.9


@query(
    "containment_dedup",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id AS doc, s AS shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - 2, 0)),
                       i -> array_to_string(t[i:i+2], ' '))) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
    ),
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    keyed AS (
        SELECT doc, shingle FROM sh
        WHERE shingle IN (SELECT shingle FROM sh
                          GROUP BY shingle HAVING COUNT(*) <= 1000)
    ),
    pairs AS (
        SELECT a.doc AS d1, b.doc AS d2, COUNT(*) AS common
        FROM keyed a JOIN keyed b ON a.shingle = b.shingle AND a.doc < b.doc
        GROUP BY 1, 2
    ),
    orient AS (
        SELECT d1 AS contained_doc, d2 AS container_doc, common,
               s.n_sh AS n_contained
        FROM pairs JOIN sizes s ON s.doc = d1
        UNION ALL
        SELECT d2, d1, common, s.n_sh
        FROM pairs JOIN sizes s ON s.doc = d2
    )
    SELECT contained_doc, container_doc,
           common / n_contained AS containment
    FROM orient
    WHERE common / n_contained >= {CONTAINMENT_TAU}
    """,
)
def containment_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment >= 0.9: documents that are
    (near-)subsets of another document, in both orientations —
    the excerpt/truncated-recrawl case symmetric Jaccard misses.
    Reuses the session-staged shingle inverted index."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "doc_id", "text", n=3, threshold=CONTAINMENT_TAU,
        max_shingle_df=1000, shingles=staged_shingles(spark, sf_dir, 3),
    )


# near-dup matching uses LONGER k-grams than the fingerprint demo:
# on this small-vocabulary corpus 3-gram fingerprints collide across
# unrelated documents (48k candidate pairs at sf0.1), while 5-grams
# keep the winnowing guarantee for >= w+k-1 = 8-token shared runs at
# a usable candidate density. The tighter posting cap bounds the
# bucket-squared pair volume of any still-hot fingerprint.
WINNOW_ND_K = 5
WINNOW_MIN_SHARED = 2
WINNOW_FP_CAP = 200


@query(
    "winnow_near_dup",
    oracle=f"""
    WITH kh AS (
        SELECT doc_id,
               list_transform(
                   range(0, len(codes) - {WINNOW_ND_K} + 1),
                   i -> list_reduce(
                       codes[i + 1 : i + {WINNOW_ND_K}],
                       (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}
                   ) % {FP_MOD}
               ) AS kh
        FROM (SELECT doc_id, {_CODES} AS codes FROM documents)
        WHERE len(codes) >= {WINNOW_ND_K + WINNOW_W - 1}
    ),
    sel AS (
        SELECT DISTINCT doc_id AS doc,
               kh[CAST(pos AS INT) + 1] AS fp
        FROM (
            SELECT doc_id, kh,
                   unnest(list_distinct(list_transform(
                       range(0, len(kh) - {WINNOW_W} + 1),
                       j -> j + ({WINNOW_W} - list_position(
                           list_reverse(kh[j + 1 : j + {WINNOW_W}]),
                           list_min(kh[j + 1 : j + {WINNOW_W}])
                       ))
                   ))) AS pos
            FROM kh
        )
    ),
    keyed AS (
        SELECT doc, fp FROM sel
        WHERE fp IN (SELECT fp FROM sel
                     GROUP BY fp HAVING COUNT(*) <= {WINNOW_FP_CAP})
    )
    SELECT a.doc AS d1, b.doc AS d2,
           CAST(COUNT(*) AS BIGINT) AS shared_fps
    FROM keyed a JOIN keyed b ON a.fp = b.fp AND a.doc < b.doc
    GROUP BY a.doc, b.doc
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """,
)
def winnow_near_dup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-based near-dup candidates: document pairs sharing
    >= 2 DISTINCT selected fingerprints — MOSS's matching step on
    top of winnow_fingerprints. The winnowing guarantee (>= 1
    shared fingerprint per w+k-1-token shared run) makes this a
    plagiarism-sensitive candidate generator that exact-shingle
    Jaccard complements. Same inverted-index shape as the other
    dedup tiers: pairs come only from shared (capped) fingerprint
    postings, never all-pairs. Reads the session-staged k=5
    fingerprint index (r18 — the r17 ledger attributed this head's
    wall to the per-query fingerprint compute; the index is
    write-once corpus state, values identical to inline by
    construction, oracle replays the full selection from raw)."""
    from gerrydb_etl_spark.operators.dedup import _drop_hot_keys, bucket_pairs
    from gerrydb_etl_spark.store.staging import staged_winnow

    sel = (
        staged_winnow(spark, sf_dir, k=WINNOW_ND_K, w=WINNOW_W)
        .select(F.col("doc_id").alias("doc"), F.col("fingerprint").alias("fp"))
        .distinct()
    )
    keyed = _drop_hot_keys(sel, ["fp"], WINNOW_FP_CAP)
    pairs = bucket_pairs(keyed, ["fp"], F.struct("doc"), max_bucket_size=None)
    return (
        pairs.select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .groupBy("d1", "d2")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )


SUBSTR_L = 5


@query(
    "substring_dedup_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_CODES} AS codes FROM documents
    ),
    kh AS (
        SELECT doc_id,
               CASE WHEN len(codes) >= {SUBSTR_L} THEN
                   list_transform(
                       range(0, len(codes) - {SUBSTR_L} + 1),
                       i -> list_reduce(
                           codes[i + 1 : i + {SUBSTR_L}],
                           (acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD}
                       ) % {FP_MOD})
               ELSE [] END AS kh
        FROM t
    ),
    occ AS (
        SELECT doc_id, i AS pos, kh[i + 1] AS h
        FROM (SELECT doc_id, kh,
                     unnest(generate_series(0, len(kh) - 1)) AS i
              FROM kh)
    ),
    ranked AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM occ
    ),
    dups AS (SELECT doc_id, pos FROM ranked WHERE rn >= 2),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN MAX(pos + {SUBSTR_L}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR pos > MAX(pos + {SUBSTR_L}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) THEN 1 ELSE 0 END AS is_new
        FROM dups
    ),
    islands AS (
        SELECT doc_id, pos,
               SUM(is_new) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS isl
        FROM marked
    )
    SELECT doc_id,
           CAST(isl - 1 AS BIGINT) AS span_idx,
           CAST(MIN(pos) AS BIGINT) AS start_tok,
           CAST(MAX(pos + {SUBSTR_L}) - MIN(pos) AS BIGINT) AS n_toks
    FROM islands GROUP BY doc_id, isl
    """,
)
def substring_dedup_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring removal spans (Lee et al. 2022):
    every 5-token run whose hash repeats corpus-wide is removed
    except its first occurrence (minimum (doc, pos)); overlapping
    removals merge into per-document spans. Position-granular — the
    arbitrary-offset duplicates block-aligned passage_dedup cannot
    see. Keep-first is a map-side-combined min-struct per hash (no
    per-hash window — a million-occurrence boilerplate gram would
    funnel one reducer); interval merge is a doc-sharded
    gaps-and-islands window. Reads the session-staged token codes."""
    docs = load_table(spark, sf_dir, "documents")
    return duplicate_substring_spans(
        docs, min_len=SUBSTR_L, codes=staged_token_codes(spark, sf_dir)
    )
