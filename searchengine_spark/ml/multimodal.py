"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
kernels (one Python hop per BATCH of blobs, never per row at the Spark
boundary).

Three REAL container formats are decoded with pure numpy — actual
bytes→pixel/sample array work, no codec libraries needed:

  * BMP  (24-bit uncompressed BI_RGB, bottom-up, 4-byte row padding)
  * PPM  (P6 binary, maxval ≤ 255, comment-tolerant header)
  * WAV  (RIFF/WAVE, 16-bit PCM, chunk-walked)

Compressed formats (PNG/JPEG/MP3/H.264 …) stay gated behind a
clearly-marked NotImplementedError — those genuinely need codec libs
this container doesn't ship. The deterministic ``SMM0`` synthetic
container remains for partition-independence tests. Everything
Spark-side — schema, partitioning, UDF signatures, batch shapes, the
1→N frame-sampling explode — is identical regardless of format.

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


# ---------------------------------------------------------------------------
# real pure-numpy codecs: BMP (24-bit), PPM (P6), WAV (16-bit PCM)
# ---------------------------------------------------------------------------

def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BI_RGB BMP → (H, W, 3) uint8 RGB array.
    Bottom-up row order, rows padded to 4 bytes — all handled with
    numpy slicing, no per-pixel Python."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    px_off = struct.unpack_from("<I", blob, 10)[0]
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    comp = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, comp={comp})"
        )
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8, count=h * stride, offset=px_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (test fixture side)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary P6 PPM (maxval ≤ 255) → (H, W, 3) uint8 RGB array."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens; '#' comments run to end of line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE 16-bit PCM → (samples int16 [n, channels], sample_rate).
    Walks the chunk list (fmt may not be first)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", blob, pos + 8)
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is supported (fmt={audio_fmt}, bits={bits})"
        )
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, n_ch)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_payload(blob: bytes) -> dict:
    """Dispatch on container magic. BMP/PPM → real pixel array; WAV →
    real sample array; SMM0 → synthetic metadata; anything else (PNG,
    JPEG, …) needs codec libraries this container doesn't ship and
    raises a clearly-marked NotImplementedError."""
    if blob[:2] == b"BM":
        px = decode_bmp(blob)
        return {
            "kind": "image", "width": px.shape[1], "height": px.shape[0],
            "n_frames": 1, "pixels": px,
        }
    if blob[:2] == b"P6":
        px = decode_ppm(blob)
        return {
            "kind": "image", "width": px.shape[1], "height": px.shape[0],
            "n_frames": 1, "pixels": px,
        }
    if blob[:4] == b"RIFF":
        samples, rate = decode_wav(blob)
        return {
            "kind": "audio", "width": 0, "height": 0, "n_frames": 1,
            "samples": samples, "sample_rate": rate,
        }
    if blob[: len(_MAGIC)] == _MAGIC:
        magic, kind, w, h, frames, seed = _HEADER.unpack(blob[: _HEADER.size])
        return {
            "kind": _KIND_NAMES[kind], "width": w, "height": h,
            "n_frames": frames, "seed": seed,
        }
    raise NotImplementedError(
        "compressed media decode (PNG/JPEG/MP3/H.264) requires codec "
        "libraries not available in this environment; supported here: "
        "BMP(24-bit), PPM(P6), WAV(16-bit PCM), SMM0"
    )


def resize_image(pixels: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbour resize with numpy index arithmetic — the execute
    half of resize_plan (no per-pixel Python)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[ys][:, xs]


def _unit(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    return (v / n if n > 0 else v).astype(np.float32)


def _feature_of(blob: bytes, meta: dict | None = None) -> np.ndarray:
    """Unit feature vector. REAL content statistics for decoded media
    (per-channel pixel moments for images, signal moments + zero-crossing
    rate for audio); for the SMM0 synthetic container a crc32-seeded
    vector stands in for a model embedding (deterministic across
    partitionings)."""
    if meta is not None and "pixels" in meta:
        px = meta["pixels"].astype(np.float64)
        v = np.concatenate(
            [
                px.mean(axis=(0, 1)) / 255.0,
                px.std(axis=(0, 1)) / 255.0,
                [np.log1p(px.shape[1]), np.log1p(px.shape[0])],
            ]
        )
        return _unit(v)
    if meta is not None and "samples" in meta:
        x = meta["samples"].astype(np.float64).ravel() / 32768.0
        zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0)) if x.size > 1 else 0.0
        v = np.array(
            [
                np.sqrt(np.mean(x**2)) if x.size else 0.0,
                zcr,
                x.mean() if x.size else 0.0,
                x.std() if x.size else 0.0,
                x.max() if x.size else 0.0,
                x.min() if x.size else 0.0,
                np.log1p(x.size),
                np.log1p(meta.get("sample_rate", 0)),
            ]
        )
        return _unit(v)
    rng = np.random.default_rng(zlib.crc32(blob))
    return _unit(rng.standard_normal(FEATURE_DIM))


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, width, height, feature array<float>) via one
    Arrow-batched kernel — the decode/feature-extract plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_payload(bytes(b)) for b in pdf["payload"]]
            feats = [
                _feature_of(bytes(b), m).tolist()
                for b, m in zip(pdf["payload"], metas)
            ]
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
                    if meta["kind"] == "video":
                        # per-frame synthetic embedding (frame index mixed
                        # into the seed — a real codec would decode frame fi)
                        f = _feature_of(bytes(blob) + fi.to_bytes(4, "little"))
                    else:
                        f = _feature_of(bytes(blob), meta)
                    out_feat.append(f.tolist())
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
