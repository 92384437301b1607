"""Multimodal plumbing tests: Arrow batch shapes, schema, stub
semantics (SURVEY.md §2.12 / brief 'multimodal columns')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gerrydb_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    HAS_PIL,
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


@pytest.mark.skipif(
    HAS_PIL, reason="PIL present: strict mode decodes for real instead"
)
def test_decode_media_strict_mode_is_marked_unimplemented(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    with pytest.raises(NotImplementedError):
        decode_media(documents_as_media(docs), strict=True)


@pytest.mark.skipif(
    not HAS_PIL, reason="no codec libraries in this environment"
)
def test_decode_media_strict_real_pil_decode(spark):
    """With a real codec available, strict mode must decode actual
    image bytes through the same mapInPandas plumbing."""
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), len(png))], schema="media_id long, kind string, payload binary, n_bytes long"
    )
    rows = decode_media(media, strict=True).collect()
    assert len(rows) == 1
    feat = rows[0].feature
    assert len(feat) == HIST_BINS
    # uniform luminance 200 -> all mass in bin 200>>4 == 12
    assert abs(feat[12] - 1.0) < 1e-9


def test_decode_media_deterministic(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(5)
    a = {r.media_id: r.feature for r in decode_media(documents_as_media(docs)).collect()}
    b = {r.media_id: r.feature for r in decode_media(documents_as_media(docs)).collect()}
    assert a == b


def test_documents_corpus_is_ascii(spark):
    """The media_decode_features / media_frame_sample oracles equate
    characters with bytes (substr/ascii vs the Spark side's raw byte
    windows). That only holds for a pure-ASCII corpus — this guard
    makes a multibyte character entering the documents table fail
    loudly here instead of as an opaque hash mismatch in the driver
    correctness gate."""
    docs = load_table(spark, SF_ORACLE, "documents")
    non_ascii = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert non_ascii == 0


def test_pil_decode_kernel_contract_with_stub_codec(monkeypatch):
    """Driver-side contract test of the _pil_decode kernel glue
    (bytes -> Image.open -> grayscale -> 16x16 resize -> 16-bin
    luminance histogram, L1-normalized) with a stub codec injected
    into sys.modules. The real-PIL mapInPandas test above covers the
    same contract end-to-end when the library exists; this one keeps
    the kernel's wiring pinned in containers without it."""
    import sys
    import types

    import numpy as np

    class _StubImg:
        def __init__(self, lum):
            self._lum = lum

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            assert size == (16, 16)
            return self

        def __array__(self, dtype=None, copy=None):
            arr = np.full((16, 16), self._lum, dtype=np.uint8)
            return arr if dtype is None else arr.astype(dtype)

    stub_image = types.SimpleNamespace(
        open=lambda fh: _StubImg(lum=fh.read()[0])
    )
    stub_pil = types.ModuleType("PIL")
    stub_pil.Image = stub_image
    monkeypatch.setitem(sys.modules, "PIL", stub_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", stub_image)

    from gerrydb_etl_spark.operators.multimodal import _pil_decode

    feat = _pil_decode(bytes([200, 1, 2, 3]))
    assert feat.shape == (16,)
    # uniform luminance 200 -> all mass in bin 200 >> 4 == 12
    assert abs(feat[12] - 1.0) < 1e-12
    assert abs(feat.sum() - 1.0) < 1e-12
