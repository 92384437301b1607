"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed in Arrow-batched pandas over mapInPandas.

Design (per the brief): image/audio/video payloads are `binary`
columns with typed metadata columns beside them. Real codecs are not
in this container, so the *decode* step is stubbed — either a
clearly-marked NotImplementedError (strict mode) or a deterministic
fake featureizer (byte histogram) — while everything Spark-side is
real and tested: schema, Arrow batch shapes, partition behavior,
and the mapInPandas iterator contract.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
payload bytes never hit the driver; the featureizer is a narrow map
(zero shuffles). At 100 TB the only knob is batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) vs payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HIST_BINS = 16

try:  # real codec path — absent in this container, gated not assumed
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | text
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media shape: UTF-8 payload
    bytes + metadata. Stands in for real image/audio ingestion."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a codec: 16-bin byte histogram,
    L1-normalized. Replace with a real decoder (PIL/librosa/ffmpeg)
    where available."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=HIST_BINS).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


def _pil_decode(payload: bytes) -> np.ndarray:
    """Real image decode (only when PIL is importable): decode →
    grayscale → 16x16 resize → 16-bin luminance histogram,
    L1-normalized — same output contract as the fake path, so the
    Spark plumbing (FEATURE_SCHEMA, Arrow batches) is identical."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((16, 16))
    lum = np.asarray(img, dtype=np.uint8).ravel()
    hist = np.bincount(lum >> 4, minlength=HIST_BINS).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


def decode_media(
    df: DataFrame,
    frame_bytes: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    ``frame_bytes`` fakes frame sampling: n_frames = ceil(len/frame).
    ``strict=True`` demands a REAL codec: with PIL importable it
    decodes payloads as images (``_pil_decode``); without any codec
    library it raises NotImplementedError — the honest marker that
    this environment cannot decode media, rather than silently
    falling back to the deterministic fake.
    """
    if strict and not HAS_PIL:
        raise NotImplementedError(
            "real media decode requires codec libraries (PIL/librosa/ffmpeg) "
            "not present in this environment; deterministic fake decode is "
            "the supported mode (strict=False)"
        )
    kernel = _pil_decode if strict else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "n_frames": (
                        (pdf["n_bytes"] + frame_bytes - 1) // frame_bytes
                    ).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 64) -> DataFrame:
    """Frame sampling: explode each payload into fixed-size byte
    windows ("frames"), one output row per frame with its index,
    length (last frame may be short) and content hash. Real codecs
    would decode actual frame boundaries; the windowing, Arrow batch
    explosion, and per-frame hashing plumbing is what production
    shares. Narrow map — output rows stay within the input's
    partitioning, no shuffle."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, shas = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                # empty payload -> zero frames, consistent with
                # decode_media's n_frames = ceil(0/frame) = 0 and the
                # SQL oracle's generate_series(1, 0) = empty
                for i in range(0, len(data), frame_bytes):
                    frame = data[i : i + frame_bytes]
                    ids.append(mid)
                    idxs.append(i // frame_bytes)
                    lens.append(len(frame))
                    shas.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
