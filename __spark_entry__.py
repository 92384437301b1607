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
    # round 7, positions 1-10: the ten new queries this round
    # (strict-mode media decode through the built-in PGM codec;
    # bigram-LM surprisal; DSIR importance weighting; RRF hybrid
    # retrieval fusion; BPE merge-pair counting; content-defined
    # chunking; Lee-et-al duplicate-substring spans; streaming
    # dedup ingest; incremental aggregate maintenance; cluster
    # survivor selection) — never sampled
    "media_strict_decode",
    "bigram_surprisal_filter",
    "dsir_importance_weights",
    "rrf_hybrid_retrieval",
    "bpe_merge_candidates",
    "cdc_chunking",
    "substring_dedup_spans",
    "docs_stream_dedup_ingest",
    "incremental_agg_maintenance",
    "cluster_survivor_selection",
    # code touched in round 7: epoch shuffle re-registered on the
    # two-phase dense-ID assigner + 31-bit mixer mask; simhash and
    # the winnowing family moved to the staged token-hash/token-code
    # fixtures; strict-decode kernel routing changed under the media
    # queries; pagerank persist hygiene; stream-store empty-batch
    # guard; winnow/kgram helper guards (passages module)
    "epoch_shuffle_order",
    "simhash_near_dup",
    "simhash_verify",
    "winnow_fingerprints",
    "winnow_near_dup",
    "passage_dedup",
    "containment_dedup",
    "pagerank_fixed_point",
    "events_stream_store_ingest",
    "media_decode_features",
    "media_frame_sample",
    # VERDICT r6 item 2: round-6 staging/rescore work changed code
    # under these, but their last driver rows are r4-r5 — refresh
    "minhash_near_dup",
    "minhash_verify",
    "ngram_jaccard_dedup",
    "neardup_clusters",
    "benchmark_decontam",
    # stalest external signal: last sampled in round 3 — oldest-
    # first refill of the remaining window slots
    "dedup_exact_text",
    "embedding_cosine_topk",
    "embedding_quantize",
    "media_byte_stats",
    "text_stats",
    "lang_id_heuristic",
    "doc_fingerprint",
    "token_topk",
    "geo_point_roundtrip",
    "geo_union_centroid",
    "utm_zone_epsg",
    "set_versioning_double_load",
    "config_driven_projection",
    "stats_quantiles_moments",
    "grouping_sets_revenue",
    "count_distinct_customers",
    "approx_distinct_customers",
    "right_outer_parts",
    "full_outer_key_overlap",
    "top_revenue_orders",
    "region_nation_revenue",
    "customers_with_orders",
    "customers_without_orders",
    "outer_join_order_counts",
    "rollup_order_priority",
    "cube_returnflag_status",
    "mode_part_brand",
    "nations_per_region",
    "dedup_full_row",
    "union_distinct_keys",
    "intersect_nation_keys",
    "except_order_keys",
    "pivot_status_by_flag",
    "events_sliding_windows",
    "events_session_windows",
    "events_json_props",
    "asof_join_clicks_views",
    "range_join_ship_window",
    # everything below was green in rounds 5-6 with unchanged code;
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
