"""Driver-exposure contract guards (__spark_entry__.py): the round
driver samples a ~50-query prefix of queries(), so ordering IS
correctness visibility. These tests fail fast if a refactor breaks
the prefix the next CORRECTNESS round depends on."""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry

# The queries never driver-sampled before round 8 (the round-8
# additions) must open the window until each has a green row.
NEVER_SAMPLED = [
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
]

# Queries whose implementation was touched in (or is new in) round 8,
# plus the four ADVICE r7 carry-overs (the round-7 anchor-plane
# derivation change shipped without a driver row for its consumers)
# — they need a fresh driver row and must stay inside the window.
TOUCHED = [
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
]


def test_priority_names_all_registered():
    # _ordered_registry raises on unknown names; calling queries()
    # exercises it
    qs = entry.queries()
    assert len(qs) >= 100


def test_never_sampled_queries_open_the_window():
    assert list(entry.queries())[: len(NEVER_SAMPLED)] == NEVER_SAMPLED


def test_touched_queries_inside_the_window():
    window = list(entry.queries())[:50]
    missing = [n for n in TOUCHED if n not in window]
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
