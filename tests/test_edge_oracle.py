"""Edge-input oracle probes: run registry queries on MUTATED mini
tables (written as parquet dirs, read by both engines) and require
the same value-hash agreement the driver checks on the real corpus.
Covers the boundaries the sf-corpus never exercises: single-row
groups, constant value domains, exact gap thresholds, empty text.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from gerrydb_etl_spark.queries import REGISTRY
from tests.oracle_compare import assert_matches_oracle


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    """A tiny sf-dir with adversarial events + documents tables,
    written as SINGLE parquet files (the driver's layout — the
    events loader footer-sniffs the file directly)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("edge_sf"))

    def ts(s: str) -> dt.datetime:
        return dt.datetime.fromisoformat(s)

    # events: one type with a single event (1-row spine); one type
    # whose consecutive events sit EXACTLY at the 30-min session gap
    # (boundary must not start a new session: rule is strictly >);
    # one type with sub-second jitter around the gap.
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array(
                [
                    ts("2024-01-01 00:00:00.000000"),
                    ts("2024-01-01 00:00:00.000000"),
                    ts("2024-01-01 00:30:00.000000"),
                    ts("2024-01-01 01:00:00.000001"),
                    ts("2024-01-01 00:00:00.500000"),
                    ts("2024-01-01 00:30:00.400000"),
                    ts("2024-01-01 01:00:00.500001"),
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 2, 2, 2, 3, 3, 3], pa.int64()),
            "event_type": pa.array(
                ["solo", "exact", "exact", "exact", "jitter", "jitter", "jitter"]
            ),
            "value": pa.array([1.0] * 7, pa.float64()),
            "props": pa.array(["{}"] * 7),
        }
    )
    pq.write_table(events, os.path.join(root, "events.parquet"))

    # documents: constant n_chars (degenerate quantiles q_lo == q_hi),
    # a 1-doc stratum, an empty-text doc, twin docs (full boilerplate)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g h",
                    "a b c d e f g h",
                    "x y z p q r s t",
                    "",
                    "m n o u v w a b",
                ]
            ),
            "lang": pa.array(["en", "en", "en", "fr", "de"]),
            "source": pa.array(["s1", "s1", "s1", "s2", "s3"]),
            "n_chars": pa.array([10] * 5, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(root, "documents.parquet"))
    return root


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{edge_dir}/{t}.parquet'"
        )
    yield con
    con.close()


EDGE_QUERIES = [
    "timeline_gap_fill",        # 1-row spine for the solo type
    "event_rate_anomaly",       # zero-variance strata must not flag
    "session_id_assignment",    # exact-30-min gap: strictly-greater rule
    "robust_length_filter",     # constant n_chars: q_lo == q_hi, all kept
    "group_median_discrete",    # 1-doc strata
    "passage_dedup",            # twin docs fully boilerplate; empty text
    "doc_fingerprint",          # empty-token fold
    "simhash_near_dup",         # empty-token hash guard (fold init 0)
    "gopher_quality_rules",     # zero-word doc in every rational check
    "cdc_incremental_dedup",    # twin/empty docs: all-known + 1-chunk paths
    "bpe_segment_apply",        # empty-text word filter; 1-char words
    "temperature_mix_weights",  # 1-doc sources; zipf-free degenerate mix
    "histogram_quantile_rollup",  # constant n_chars: one bin, p50==p99
    "priority_sample_topk",     # corpus smaller than k+1: tau is NULL
    "image_dhash_neardup",      # empty text: flat image, fp 0; twins
    "cdc_fuzzy_chunk_match",    # 1-chunk docs; empty-cset filter; twins
    "curriculum_packing",       # all docs fit one pack; empty-text doc
    "bpe_fertility_by_lang",    # 1-doc langs; single-char words
]


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_inputs_match_oracle(spark, edge_dir, edge_duck, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, edge_dir)
    assert_matches_oracle(df, edge_duck, spec.oracle, f"edge:{name}")


def test_edge_session_boundary_semantics(spark, edge_dir):
    """Exactly-30-min gaps continue the session (strictly >);
    a microsecond beyond starts a new one."""
    out = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in REGISTRY["session_id_assignment"]
        .spark(spark, edge_dir)
        .collect()
    }
    assert out[(2, 2)] == 0 and out[(2, 3)] == 0  # exact gap: same session
    assert out[(2, 4)] == 1                        # 1 us beyond: new session
    assert out[(3, 6)] == 0                        # 29:59.9: same
    assert out[(3, 7)] == 1                        # 30:00.000001: new


def test_edge_anomaly_zero_variance_never_flags(spark, edge_dir):
    rows = REGISTRY["event_rate_anomaly"].spark(spark, edge_dir).collect()
    assert rows and all(r["is_anomaly"] is False for r in rows)
