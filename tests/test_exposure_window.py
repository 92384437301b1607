"""Driver-exposure contract guards (__spark_entry__.py): the round
driver samples a ~50-query prefix of queries(), so ordering IS
correctness visibility. These tests fail fast if a refactor breaks
the prefix the next CORRECTNESS round depends on."""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry

# The three queries never driver-sampled through round 5 (VERDICT r5
# item 1) must occupy positions 1-3 until each has a green row.
NEVER_SAMPLED_R5 = ["pii_redaction", "doc_chunking", "token_count_bpe"]

# Queries whose implementation was touched in (or is new in) round 6
# — they need a fresh driver row and must stay inside the window.
TOUCHED_R6 = [
    "tfidf_top_terms",
    "bm25_scoring",
    "kmeans_train_assign",
    "semantic_dedup_survivors",
    "events_stream_join_attribution",
    "cms_heavy_hitters",
    "funnel_conversion_stages",
    "embedding_neardup",
    "embedding_neardup_verify",
    "ivf_cosine_topk",
    "ivf_verify",
    "media_decode_features",
    "dense_id_assignment",
    "bucketed_colocated_join",
    "corpus_curation_filter",
]


def test_priority_names_all_registered():
    # _ordered_registry raises on unknown names; calling queries()
    # exercises it
    qs = entry.queries()
    assert len(qs) >= 100


def test_never_sampled_trio_opens_the_window():
    assert list(entry.queries())[:3] == NEVER_SAMPLED_R5


def test_touched_queries_inside_the_window():
    window = list(entry.queries())[:50]
    missing = [n for n in TOUCHED_R6 if n not in window]
    assert not missing, f"code-touched queries fell out of window: {missing}"


def test_window_has_no_unverified_stragglers():
    """Every registered query outside the ~50-sample window must have
    a green row in some prior CORRECTNESS_r*.json (VERDICT r5 item 2:
    the window must contain every never-verified query)."""
    sampled = set()
    for p in sorted(pathlib.Path(__file__).parents[1].glob("CORRECTNESS_r*.json")):
        sampled.update(json.loads(p.read_text()))
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
        assert any(v.startswith(name.split("_")[0]) and v.endswith("_verify") for v in qs), name
