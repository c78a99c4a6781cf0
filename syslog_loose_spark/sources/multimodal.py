"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata; the
Spark-side machinery (schema, Arrow batching, mapInPandas signatures,
partition-friendly passthrough) is real and tested.  The actual codec work
is STUBBED: the sandbox has no image/audio libraries, so ``decode_image``
raises NotImplementedError unless given the deterministic fake header
format produced by ``fake_media``, which tests use to exercise the full
path end-to-end.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image | audio | video
    StructField("payload", BinaryType(), False),
    StructField("n_bytes", IntegerType(), False),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", IntegerType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("checksum", LongType(), False),
])

_MAGIC = b"FAKE"


def fake_media(media_id: int, kind: str, w: int, h: int) -> bytes:
    """Deterministic stand-in payload: magic + dims + filler bytes."""
    body = bytes((media_id * 7 + i) % 256 for i in range(w * h % 64 + 16))
    return _MAGIC + struct.pack("<II", w, h) + body


def decode_image(payload: bytes):
    """STUB decode: real codecs are unavailable in this container.  Only
    the deterministic fake format is supported; anything else raises, as a
    clearly-marked integration point for PIL/ffmpeg in production."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real image decoding requires PIL/ffmpeg — not in this sandbox")
    w, h = struct.unpack("<II", payload[4:12])
    return w, h


def media_table(spark, n: int = 64) -> DataFrame:
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        k = kinds[i % 3]
        p = fake_media(i, k, 16 + i % 5, 9 + i % 4)
        rows.append((i, k, bytearray(p), len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: per-batch
    pandas, never per-row Python UDF registration."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, checks = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                try:
                    w, h = decode_image(b)
                except NotImplementedError:
                    w = h = None
                widths.append(w)
                heights.append(h)
                checks.append(sum(b) % (2**31 - 1))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "width": widths,
                "height": heights,
                "checksum": checks,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def text_as_binary(documents: DataFrame) -> DataFrame:
    """Treat document text as an opaque payload (utf-8 bytes) — exercises
    the binary-column path against real table data."""
    return documents.select(
        F.col("doc_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), False),
    StructField("n_bytes", IntegerType(), False),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), False),
    StructField("n_bytes", IntegerType(), False),
])


def resize_payload(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Deterministic nearest-neighbor 'resize' of a fake-format payload:
    new header dims + the body resampled to the new body length.  A real
    codec slots in here (PIL.Image.resize) — the Spark-side plumbing
    (schema, Arrow batching, per-batch loop) is identical."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real image resizing requires PIL/ffmpeg — not in this sandbox")
    body = payload[12:]
    new_len = new_w * new_h % 64 + 16
    out = bytes(body[(i * len(body)) // new_len] for i in range(new_len))
    return _MAGIC + struct.pack("<II", new_w, new_h) + out


def resize_media(df: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Arrow-batched resize over the binary column (mapInPandas; no
    per-row UDF registration, partition-preserving — no shuffle)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [resize_payload(bytes(p), new_w, new_h)
                        for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
            })

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int) -> DataFrame:
    """Deterministic frame sampling: the payload body splits into
    ``n_frames`` contiguous chunks (frame k = body[k*L//n : (k+1)*L//n]),
    one output row per frame — the video-frame-extraction shape (ffmpeg
    slots into the chunking step in production)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p)[12:]
                ln = len(body)
                for k in range(n_frames):
                    fr = body[k * ln // n_frames:(k + 1) * ln // n_frames]
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(fr)
            yield pd.DataFrame({
                "media_id": ids,
                "frame_idx": idxs,
                "frame": frames,
                "n_bytes": [len(f) for f in frames],
            })

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
