"""Driver-exposure contract guards (__spark_entry__.py): the round
driver samples a ~50-query prefix of queries(), so ordering IS
correctness visibility. These tests fail fast if a refactor breaks
the prefix the next CORRECTNESS round depends on.

VERDICT r11 item 1: the never-sampled assertion is DERIVED from the
CORRECTNESS_r*.json artifacts on disk, not from a hardcoded
snapshot — the r11 spelling hardcoded the round-11 never-sampled
set and went red the moment the driver sampled it (the very event
the test exists to force). Every assertion here must stay true both
BEFORE and AFTER the driver writes this round's artifact."""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry

# Round 15 window composition (50 slots exactly; see the block
# comments in __spark_entry__.py). Kept as constants so a window
# refactor that silently drops a planned block fails loudly — but
# correctness-critical invariants below are artifact-derived.
NEW_THIS_ROUND = [
    "events_stream_file_sink",
]

# the complete r11 block (42 queries whose latest driver row is
# round 11), as promised by the r14 rotation note
STALE_REFILL = [
    "association_rules",
    "bm25_scoring",
    "cms_heavy_hitters",
    "collocation_phrase_match",
    "current_version_per_order",
    "customer_rfm_segments",
    "dense_id_assignment",
    "doc_chunking",
    "embedding_drift_monitor",
    "embedding_split_leakage",
    "event_cusum_changepoints",
    "event_rate_anomaly",
    "events_stream_join_attribution",
    "events_stream_tumbling",
    "events_tumbling_hourly",
    "filters_membership",
    "fk_integrity_audit",
    "funnel_conversion_stages",
    "fuzzy_blocked_match",
    "golden_record_merge",
    "gopher_quality_rules",
    "group_median_discrete",
    "incremental_exact_dedup",
    "ivf_cosine_topk",
    "join_fanout_skew_report",
    "local_supplier_volume",
    "order_gap_days",
    "pii_redaction",
    "pricing_summary",
    "rank_dense_ntile",
    "robust_length_filter",
    "running_revenue_per_customer",
    "session_id_assignment",
    "session_path_topk",
    "shingle_novelty",
    "string_keys",
    "tfidf_top_terms",
    "time_decayed_engagement",
    "timeline_gap_fill",
    "token_count_bpe",
    "topk_expensive_items",
    "trend_slope_per_type",
]

# queries whose executed plans changed this round (staged-qv probe
# ranking, the scd2 probe localCheckpoint, the restaged kmeans/PQ
# fixtures) — see __spark_entry__.py Block C
TOUCHED = [
    "ivf_multiprobe_twolevel",
    "ivf_multiprobe_neardup",
    "scd2_append_fastpath",
    "scd2_double_load",
    "kmeans_train_assign",
    "semantic_dedup_survivors",
    "pq_verify",
]


def _sampled_by_round() -> dict[str, int]:
    """name -> latest round with a driver row, from the artifacts."""
    latest: dict[str, int] = {}
    for p in sorted(
        pathlib.Path(__file__).parents[1].glob("CORRECTNESS_r*.json")
    ):
        rnd = int(p.stem.split("_r")[1])
        for name in json.loads(p.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def test_priority_names_all_registered():
    # _ordered_registry raises on unknown names; calling queries()
    # exercises it
    qs = entry.queries()
    assert len(qs) >= 100


def test_window_is_exactly_the_three_blocks():
    window = list(entry.queries())[:50]
    want = NEW_THIS_ROUND + STALE_REFILL + TOUCHED
    assert len(want) == 50, len(want)
    assert window == want


def test_never_sampled_queries_lead_the_window():
    """One-sided, artifact-derived (VERDICT r11 item 1): every
    registered query with NO driver row in ANY recorded round must
    sit at the head of the window. Once the driver samples them the
    computed set shrinks (to empty) and the assertion stays true —
    the driver doing its job can never red this test."""
    sampled = set(_sampled_by_round())
    ordered = list(entry.queries())
    never = [n for n in ordered if n not in sampled]
    assert set(never) <= set(ordered[: max(len(never), 1)]), (
        f"never-sampled queries not leading the window: {never}"
    )


def test_no_query_lags_the_newest_round_by_more_than_four():
    """The rotation's purpose, as a standing invariant: any query
    whose latest driver row lags the newest recorded round by MORE
    than 4 rounds must be inside this round's window (it is about to
    be refreshed). Stays true after the driver writes this round's
    artifact — refreshed queries stop lagging."""
    latest = _sampled_by_round()
    if not latest:
        return
    newest = max(latest.values())
    window = set(list(entry.queries())[:50])
    lagging = [
        n
        for n, rnd in latest.items()
        if newest - rnd > 4 and n not in window
    ]
    assert not lagging, (
        f"stale queries (>{4} rounds old) left outside the window: "
        f"{sorted(lagging)}"
    )


def test_window_has_no_unverified_stragglers():
    """Every registered query outside the 50-sample window must have
    a green row in some prior CORRECTNESS_r*.json (VERDICT r5 item
    2); nothing never-sampled may sit past the cut this round."""
    sampled = set(_sampled_by_round())
    beyond = list(entry.queries())[50:]
    never = [n for n in beyond if n not in sampled]
    assert not never, f"never-verified queries pushed past the window: {never}"


def test_oracles_cover_registry():
    qs, osql = entry.queries(), entry.oracle_sql()
    rows_only = set(qs) - set(osql)
    # the only rows-only entries are production plans of approximate
    # operators whose outputs are not SQL-expressible; each has an
    # oracle-checked *_verify twin
    assert rows_only <= {
        "simhash_near_dup",
        "ann_cosine_topk",
        "ivf_cosine_topk",
        "embedding_neardup",
    }
    for name in rows_only:
        assert any(
            v.startswith(name.split("_")[0]) and v.endswith("_verify")
            for v in qs
        ), name
