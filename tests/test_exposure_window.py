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

# Round 16 window composition (50 slots exactly; see the block
# comments in __spark_entry__.py). Kept as constants so a window
# refactor that silently drops a planned block fails loudly — but
# correctness-critical invariants below are artifact-derived.
NEW_THIS_ROUND = [
    # Block A: this round's most plan-changed query — the staged
    # segmented vocabulary surfaced row for row (VERDICT r15 item 1)
    "bpe_segment_apply",
]

# the complete r12 block (49 queries whose latest driver row is
# round 12), as promised by the r15 rotation note
STALE_REFILL = [
    "approx_distinct_customers",
    "benchmark_decontam",
    "bpe_merge_candidates",
    "cdc_chunking",
    "config_driven_projection",
    "containment_dedup",
    "count_distinct_customers",
    "customers_with_orders",
    "customers_without_orders",
    "dedup_exact_text",
    "doc_fingerprint",
    "docs_stream_dedup_ingest",
    "dsir_importance_weights",
    "embedding_cosine_topk",
    "embedding_quantize",
    "embeddings_stream_index_ingest",
    "epoch_shuffle_order",
    "events_stream_store_ingest",
    "full_outer_key_overlap",
    "geo_point_roundtrip",
    "grouping_sets_revenue",
    "incremental_agg_maintenance",
    "ivf_blocked_neardup_strict",
    "lang_id_heuristic",
    "media_byte_stats",
    "media_decode_features",
    "media_frame_sample",
    "minhash_near_dup",
    "minhash_verify",
    "ngram_jaccard_dedup",
    "order_hierarchy_paths",
    "outer_join_order_counts",
    "pagerank_fixed_point",
    "passage_dedup",
    "region_nation_revenue",
    "right_outer_parts",
    "rrf_hybrid_retrieval",
    "set_versioning_double_load",
    "simhash_near_dup",
    "simhash_verify",
    "stats_quantiles_moments",
    "substring_dedup_spans",
    "text_stats",
    "token_topk",
    "top_revenue_orders",
    "topk_orders_per_customer",
    "utm_zone_epsg",
    "winnow_fingerprints",
    "winnow_near_dup",
]

# no separate touched block this round: the remaining r16 plan
# changes (the SCD-2 pin hoist, the PQ guard band) sit on queries
# whose latest driver rows are r13-r15 and were all locally
# oracle-verified post-change; the r12 block takes the slots
TOUCHED: list[str] = []


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
