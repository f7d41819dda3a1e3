"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels (one Python hop per BATCH of blobs, never per row at the Spark
boundary).

The decode step itself is STUBBED: this container ships no image/audio
codecs, so ``decode_payload`` parses this module's deterministic
synthetic container format, and real codecs are gated behind an
import-try that raises a clearly-marked NotImplementedError. Everything
Spark-side — schema, partitioning, UDF signatures, batch shapes, the
1→N frame-sampling explode — is real and tested; swapping in PIL/
ffmpeg-backed decoders changes only the bytes→array function.

Synthetic payload layout (little-endian):
    magic  4s  = b"SMM0"
    kind   B   (0=image, 1=audio, 2=video)
    width  H, height H, n_frames H, seed I
    body   raw bytes (seeded, unused by the stub decoder)
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"SMM0"
_HEADER = struct.Struct("<4sBHHHI")
_KINDS = {"image": 0, "audio": 1, "video": 2}
_KIND_NAMES = {v: k for k, v in _KINDS.items()}

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, n_frames int"
)
FEATURE_DIM = 8


def pack_payload(kind: str, width: int, height: int, n_frames: int, seed: int) -> bytes:
    body = np.random.default_rng(seed).bytes(64)
    return _HEADER.pack(_MAGIC, _KINDS[kind], width, height, n_frames, seed) + body


def synthesize_media(
    spark: SparkSession, n: int, parallelism: int = 8
) -> DataFrame:
    """Deterministic media table (seeded per media_id, partition-count
    independent) — the test stand-in for a crawl's media sidecar table."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = _KIND_NAMES[int(i) % 3]
                w, h = 16 + int(i) % 5 * 8, 16 + int(i) % 3 * 8
                frames = 1 if kind != "video" else 4 + int(i) % 4
                rows.append(
                    (int(i), kind, pack_payload(kind, w, h, frames, int(i)), w, h, frames)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "width", "height", "n_frames"],
            )

    return spark.range(0, n, numPartitions=parallelism).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def decode_payload(blob: bytes) -> dict:
    """STUB decoder for the synthetic container. For real media swap in:
        try: from PIL import Image ...
        except ImportError: raise NotImplementedError("image codecs not
        available in this environment")"""
    magic, kind, w, h, frames, seed = _HEADER.unpack(blob[: _HEADER.size])
    if magic != _MAGIC:
        raise NotImplementedError(
            "real media decode (PIL/ffmpeg/librosa) is stubbed in this "
            "environment; only the SMM0 synthetic container is supported"
        )
    return {"kind": _KIND_NAMES[kind], "width": w, "height": h, "n_frames": frames, "seed": seed}


def _feature_of(blob: bytes) -> np.ndarray:
    """Deterministic fake feature: crc32-seeded unit vector — stands in
    for an embedding model's output; stable across partitionings."""
    rng = np.random.default_rng(zlib.crc32(blob))
    v = rng.standard_normal(FEATURE_DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, width, height, feature array<float>) via one
    Arrow-batched kernel — the decode/feature-extract plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_payload(bytes(b)) for b in pdf["payload"]]
            feats = [_feature_of(bytes(b)).tolist() for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": [m["kind"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel,
        schema="media_id long, kind string, width int, height int, feature array<float>",
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video rows explode 1→⌈frames/every_n⌉ frame rows (frame_idx,
    per-frame feature); non-video rows pass through as frame 0."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_f, out_feat = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                meta = decode_payload(bytes(blob))
                frames = (
                    range(0, meta["n_frames"], every_n)
                    if meta["kind"] == "video"
                    else [0]
                )
                for fi in frames:
                    out_id.append(mid)
                    out_f.append(fi)
                    out_feat.append(
                        _feature_of(bytes(blob) + fi.to_bytes(4, "little")).tolist()
                    )
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_f, "feature": out_feat}
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, frame_idx int, feature array<float>"
    )


def resize_plan(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Pure-JVM column math: target dims preserving aspect ratio — the
    planning half of a resize stays out of Python entirely."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest("width", "height").cast("double"),
    )
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
