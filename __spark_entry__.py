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
    # ---- ROUND 13 WINDOW (50 slots exactly) --------------------------
    # Block A (1): never-driver-sampled FIRST — the forced-split
    # two-level multiprobe query (VERDICT r12 item 1): the one
    # shipped scale path no CORRECTNESS row had ever executed, now
    # forced active at driver scale under a full replay oracle.
    "ivf_multiprobe_twolevel",
    # Block B (46): the stalest refill — the complete r8 block, as
    # promised by the r12 rotation note. After this round no query's
    # latest driver row predates r10 (VERDICT r12 item 3); round 14
    # takes the r10 block (44, minus the two sampled in Block C).
    "alias_resolution_join",
    "ann_cosine_topk",
    "ann_verify",
    "asof_join_clicks_views",
    "bigram_surprisal_filter",
    "bpe_doc_tokenize",
    "bpe_fertility_by_lang",
    "bpe_segment_apply",
    "cdc_fuzzy_chunk_match",
    "cdc_incremental_dedup",
    "census_header_schema",
    "classifier_trailing_char",
    "cluster_survivor_selection",
    "corpus_curation_filter",
    "corrupt_record_quarantine",
    "cube_returnflag_status",
    "curriculum_packing",
    "dedup_full_row",
    "dim_upsert_if_absent",
    "dpp_runtime_pruned_join",
    "eav_long_table",
    "embedding_int8_recall",
    "embedding_neardup",
    "embedding_neardup_verify",
    "events_json_props",
    "events_session_windows",
    "events_sliding_windows",
    "except_order_keys",
    "histogram_quantile_rollup",
    "image_dhash_neardup",
    "incremental_minhash_dedup",
    "intersect_nation_keys",
    "ivf_index_quality",
    "media_strict_decode",
    "mode_part_brand",
    "nations_per_region",
    "neardup_clusters",
    "pivot_status_by_flag",
    "pq_adc_topk",
    "pq_verify",
    "priority_sample_topk",
    "range_join_ship_window",
    "rollup_order_priority",
    "semantic_decontam",
    "temperature_mix_weights",
    "union_distinct_keys",
    # Block C (3): code touched this round and not already above —
    # locality_hierarchy_paths (expand_paths gained the eager
    # tree-contract validation + SQLConf-read CTE default, ADVICE
    # r12; order_hierarchy_paths runs the SAME operator path, was
    # r12-sampled, and the recursion SQL is byte-identical, so it
    # defers on its r12 green), orders_stream_checksum (re-epoched
    # 4->2 per the r12 PERF queue — executed plan changed — and the
    # injectable-signature bucket_digest), and bucket_checksum_diff
    # (shares bucket_digest; default-path plan is byte-identical but
    # it is also r10-stale, so sampling it advances the rotation).
    # (ivf_multiprobe_neardup / hierarchical_cells_assign /
    # semantic_dedup_survivors / ivf_blocked_neardup import the
    # touched multiprobe/split modules but their executed plans are
    # byte-identical at driver scale — sub_model stays None below
    # 64k vectors, needs_cell_split never activates, and the
    # max_levels=1 split path is untouched — all r11/r12-green,
    # locally oracle-swept this round, deferred for the stale block)
    "locality_hierarchy_paths",
    "orders_stream_checksum",
    "bucket_checksum_diff",
    # everything below position 50 was driver-green in rounds 10-12
    # with unchanged code; deferred past this round's sample window
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
