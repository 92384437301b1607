"""Driver-visible queries for the document-prep operators
(operators/docprep.py): overlapping chunking and repetition-based
quality filtering over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gerrydb_etl_spark.operators.docprep import chunk_documents, repetition_stats
from gerrydb_etl_spark.queries.base import query
from gerrydb_etl_spark.sources import load_table

CHUNK_SIZE = 100
STRIDE = 80


@query(
    "doc_chunking",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text,
               CAST(FLOOR((GREATEST(length(text) - {CHUNK_SIZE}, 0)
                           + {STRIDE - 1}) / {STRIDE}) AS BIGINT) AS last_start
        FROM documents
    ),
    idx AS (
        SELECT doc_id, text,
               unnest(generate_series(0, last_start)) AS chunk_id
        FROM d
    )
    SELECT doc_id, chunk_id,
           substr(text, CAST(chunk_id * {STRIDE} + 1 AS INT), {CHUNK_SIZE})
               AS chunk_text,
           CAST(length(substr(text, CAST(chunk_id * {STRIDE} + 1 AS INT),
                              {CHUNK_SIZE})) AS BIGINT) AS chunk_len
    FROM idx
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride overlapping chunking (100-char chunks, 80-char
    stride -> 20-char overlap) — the unit-of-training-example split
    that precedes tokenization. Narrow map, zero shuffles; output
    partitioning inherits the parquet scan's."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_size=CHUNK_SIZE, stride=STRIDE
    )


@query(
    "repetition_quality",
    oracle="""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    words AS (SELECT doc_id, unnest(w) AS gram FROM s),
    wc AS (SELECT doc_id, gram, COUNT(*) AS c FROM words GROUP BY 1, 2),
    pw AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               COUNT(*) AS n_distinct_words
        FROM wc GROUP BY 1
    ),
    bg AS (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= 2
                      THEN list_transform(generate_series(1, len(w) - 1),
                                          i -> w[i] || ' ' || w[i + 1])
                      ELSE [] END) AS gram
        FROM s
    ),
    bc AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    pb AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               MAX(c) AS top_bigram_n
        FROM bc GROUP BY 1
    )
    SELECT pw.doc_id,
           n_words,
           (n_words - n_distinct_words) / n_words AS dup_word_frac,
           COALESCE(top_bigram_n / n_bigrams, 0.0) AS top_bigram_frac,
           ((n_words - n_distinct_words) / n_words <= 0.55
            AND COALESCE(top_bigram_n / n_bigrams, 0.0) <= 0.05) AS keep
    FROM pw LEFT JOIN pb USING (doc_id)
    """,
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style intra-document repetition filter:
    duplicate-word fraction + most-frequent-bigram fraction, with a
    keep verdict at (0.55, 0.05). Thresholds chosen to split this
    corpus (dup_word_frac median ~0.54, top_bigram_frac max ~0.17)
    so the verdict column is exercised in both directions."""
    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs)
