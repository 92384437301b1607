"""Multimodal plumbing tests: Arrow batch shapes, schema, stub
semantics (SURVEY.md §2.12 / brief 'multimodal columns')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    HIST_BINS,
    decode_media,
    documents_as_media,
)
from gerrydb_etl_spark.sources import load_table
from tests.conftest import SF_ORACLE


def test_documents_as_media_schema(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    media = documents_as_media(docs)
    kinds = dict(media.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["n_bytes"] == "bigint"
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == row.n_bytes


def test_decode_media_features(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = decode_media(documents_as_media(docs), frame_bytes=64)
    assert out.schema == FEATURE_SCHEMA
    rows = out.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r.feature) == HIST_BINS
        assert abs(sum(r.feature) - 1.0) < 1e-9  # L1-normalized histogram
        assert r.n_frames == (r.n_bytes + 63) // 64


def test_decode_media_strict_mode_is_marked_unimplemented(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(NotImplementedError):
        decode_media(documents_as_media(docs), strict=True)


def test_decode_media_deterministic(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(5)
    a = {r.media_id: r.feature for r in decode_media(documents_as_media(docs)).collect()}
    b = {r.media_id: r.feature for r in decode_media(documents_as_media(docs)).collect()}
    assert a == b
