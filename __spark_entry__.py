"""Driver contract for the spark-graft builder (PySpark target).

Backed by the gerrydb_etl_spark package: every implemented operator
from SURVEY.md §2 registers a named (Spark callable, DuckDB oracle
SQL) pair in gerrydb_etl_spark.queries.REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gerrydb_etl_spark.queries import REGISTRY

    return REGISTRY["pricing_summary"].spark(spark, SF0001)


# The round driver samples a bounded prefix (~50) of this dict each
# round, so ordering IS correctness visibility. Exposure is rotated
# explicitly each round: never-sampled queries first, then this
# round's code-touched queries, then whatever has gone longest
# without a driver row. Queries green last round with unchanged code
# sit below the window.
_EXPOSURE_PRIORITY = [
    # round 8, positions 1-8: the eight new queries (chunk-level
    # cross-recrawl CDC dedup; BPE greedy-segmenter apply; per-doc
    # BPE tokenize counts; dynamic-partition-pruned star join;
    # incremental batch-vs-corpus MinHash probe; train/test
    # embedding-leakage audit; temperature mixture reweighting;
    # mergeable histogram-quantile rollup) — never sampled
    "semantic_decontam",
    "curriculum_packing",
    "embedding_int8_recall",
    "bpe_fertility_by_lang",
    "ivf_index_quality",
    "embeddings_stream_index_ingest",
    "cdc_fuzzy_chunk_match",
    "pq_adc_topk",
    "pq_verify",
    "image_dhash_neardup",
    "priority_sample_topk",
    "cdc_incremental_dedup",
    "bpe_segment_apply",
    "bpe_doc_tokenize",
    "dpp_runtime_pruned_join",
    "incremental_minhash_dedup",
    "embedding_split_leakage",
    "temperature_mix_weights",
    "histogram_quantile_rollup",
    # code touched in round 8: streaming dedup state compacted into
    # the bucketed content_sha index; the near-dup component closure
    # staged (shared by clusters + survivor selection, cap/oracle
    # alignment also touched corpus_curation_filter); strict decode
    # gained the PPM codec + P2 range check under
    # media_strict_decode; bigram surprisal gained the salted-prefix
    # fallback refactor; semantic dedup + the IVF leakage audit now
    # derive k via cells_for_corpus (floor == the static-oracle
    # literal at driver scale). Plus the ADVICE r7 carry-over: the round-7
    # anchor-plane derivation change (hash-mixed sampling) shipped
    # without a driver row for its four consumer queries — they lead
    # the touched block.
    "embedding_neardup",
    "embedding_neardup_verify",
    "ann_cosine_topk",
    "ann_verify",
    "docs_stream_dedup_ingest",
    "neardup_clusters",
    "cluster_survivor_selection",
    "corpus_curation_filter",
    "media_strict_decode",
    "bigram_surprisal_filter",
    "semantic_dedup_survivors",
    # stalest refill, oldest-first (VERDICT r7 item 3): the 14
    # queries whose last driver row is round 3...
    "asof_join_clicks_views",
    "cube_returnflag_status",
    "dedup_full_row",
    "events_json_props",
    "events_session_windows",
    "events_sliding_windows",
    "except_order_keys",
    "intersect_nation_keys",
    "mode_part_brand",
    "nations_per_region",
    "pivot_status_by_flag",
    "range_join_ship_window",
    "rollup_order_priority",
    "union_distinct_keys",
    # ...then the oldest round-5 rows filling the remaining slots
    "alias_resolution_join",
    "census_header_schema",
    "classifier_trailing_char",
    "corrupt_record_quarantine",
    "dim_upsert_if_absent",
    "eav_long_table",
    "eav_pivot_roundtrip",
    "events_stream_dedup",
    "events_stream_session",
    "events_stream_sliding",
    "events_stream_user_totals",
    "format_roundtrip_json_csv",
    "hll_overlap_estimate",
    "hll_sketch_rollup",
    "locality_hierarchy_paths",
    "medsl_config_projection",
    "observed_load_metrics",
    "partition_pruned_read",
    # everything below was green in rounds 5-7 with unchanged code;
    # deferred past the ~50-query sample window this round
]


def _ordered_registry():
    from gerrydb_etl_spark.queries import REGISTRY

    missing = [n for n in _EXPOSURE_PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"exposure-priority names not in REGISTRY: {missing}")
    rest = [n for n in REGISTRY if n not in _EXPOSURE_PRIORITY]
    return {n: REGISTRY[n] for n in (*_EXPOSURE_PRIORITY, *rest)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in _ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted for non-SQL-expressible ops)."""
    return {
        name: spec.oracle
        for name, spec in _ordered_registry().items()
        if spec.oracle is not None
    }
