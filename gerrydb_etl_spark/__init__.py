"""gerrydb_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of mggg/gerrydb-etl (reference at /root/reference,
surveyed in SURVEY.md), extended with the relational + LLM-data
operator surface a 100 TB training-data pipeline needs.

Layout:
    session    — tuned SparkSession bootstrap
    sources    — schema-declared parquet readers + provenance fingerprinting
    operators  — relational / dedup / similarity / text / temporal operators
    functions  — scalar expression helpers (slugify, keys, UTM, census labels)
    plans      — config-driven (YAML+Jinja2) projection/cast plan generation
    store      — SCD-2 versioned merge writer, EAV long table, dim upserts
    geo        — WKB geometry kernels (pure-python; shapely optional)
    streaming  — event-time windowing (batch + Structured Streaming)
"""

__version__ = "0.1.0"
