"""gerrydb_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of mggg/gerrydb-etl (reference at /root/reference,
surveyed in SURVEY.md), extended with the relational + LLM-data
operator surface a 100 TB training-data pipeline needs.

Layout:
    session    — tuned SparkSession bootstrap
    sources    — schema-declared parquet readers
    functions  — scalar expression helpers (strings, numeric, text)
    operators  — dedup (exact/MinHash-LSH/SimHash/Jaccard), similarity
                 search, as-of join, validation, multimodal plumbing
    queries    — the registered (Spark, DuckDB-oracle) query pairs
    plans      — config-driven (YAML+Jinja2) plan generation + Census
                 column metadata
    store      — SCD-2 versioned merge writer, EAV long table,
                 write-audit-publish with provenance
    geo        — WKB geometry kernels (pure numpy) + UTM/EPSG
    streaming  — event-time windowing (batch + Structured Streaming)
"""

__version__ = "0.1.0"
