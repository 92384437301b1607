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
    # ---- ROUND 11 WINDOW (50 slots exactly) --------------------------
    # Block A (10): never-driver-sampled queries FIRST (VERDICT r10
    # item 2): the nine round-10 openers that sat at positions 51-59
    # for two rounds because round 10 shipped no commit, plus this
    # round's one new query (the depth-4 hierarchy fixture).
    "collocation_phrase_match",
    "join_fanout_skew_report",
    "customer_rfm_segments",   # also reworked this round: distributed quartiles + BIGINT oracle cast
    "event_cusum_changepoints",
    "embedding_drift_monitor",
    "golden_record_merge",
    "association_rules",
    "trend_slope_per_type",
    "session_path_topk",
    "order_hierarchy_paths",   # NEW r11: depth-4 recursive expansion
    "ivf_blocked_neardup",     # NEW r11: corpus-scaled vector near-dup pairs
    # Block B (2): the two driver reds fixed this round (oracle
    # HUGEINT casts, VERDICT r10 item 1) — must re-sample green.
    "time_decayed_engagement",
    "fk_integrity_audit",
    # Block C (5): code touched this round and not already above —
    # the kmeans recursive re-split touches the split family, the
    # _is_convex wrap-around fix touches the geometry overlap verdict,
    # and expand_paths gained the completeness guard. (The ivf.py
    # change is a new error-path ValueError only — its executed search
    # path is byte-identical and ivf_cosine_topk/ivf_verify refresh in
    # Block D / were r10-green; bench.py changes touch no query.)
    "hierarchical_cells_assign",
    "semantic_dedup_survivors",
    "embedding_split_leakage",
    "geo_union_centroid",
    "locality_hierarchy_paths",
    # Block D (33): the stalest refill — every query whose latest
    # driver row is round 6. After this round no query's latest driver
    # row predates r7; rounds 12/13 take the r7 (45) and r8 (48)
    # blocks.
    "bm25_scoring",
    "bucketed_colocated_join",
    "cms_heavy_hitters",
    "current_version_per_order",
    "dense_id_assignment",
    "doc_chunking",
    "event_rate_anomaly",
    "events_stream_join_attribution",
    "events_stream_tumbling",
    "events_tumbling_hourly",
    "filters_membership",
    "funnel_conversion_stages",
    "fuzzy_blocked_match",
    "gopher_quality_rules",
    "group_median_discrete",
    "incremental_exact_dedup",
    "ivf_cosine_topk",
    "kmeans_train_assign",
    "local_supplier_volume",
    "order_gap_days",
    "pii_redaction",
    "pricing_summary",
    "rank_dense_ntile",
    "robust_length_filter",
    "running_revenue_per_customer",
    "session_id_assignment",
    "shingle_novelty",
    "string_keys",
    "tfidf_top_terms",
    "timeline_gap_fill",
    "token_count_bpe",
    "topk_expensive_items",
    # (topk_orders_per_customer yielded the final r6-stale slot to
    # the second new query, ivf_blocked_neardup — never-sampled
    # queries outrank stale-green ones; it is r6-green on unchanged
    # code and leads the round-12 stale refill)
    # everything below position 50 was driver-green in rounds 6-10
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
