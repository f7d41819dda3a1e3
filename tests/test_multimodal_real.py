"""Real pure-numpy media codecs (BMP/PPM/WAV): byte-exact roundtrips,
content-derived features flowing through the Arrow-batched Spark kernel,
and the numpy resize executing resize_plan's targets."""

import math

import numpy as np
import pytest

from searchengine_spark.ml.multimodal import (
    FEATURE_DIM,
    decode_bmp,
    decode_payload,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_image,
)


def _pixels(h=13, w=10, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip():
    px = _pixels()
    got = decode_bmp(encode_bmp(px))
    assert got.shape == px.shape
    assert np.array_equal(got, px)


def test_ppm_roundtrip_with_comment():
    px = _pixels(5, 9, seed=3)
    blob = encode_ppm(px)
    # inject a header comment — decoders must tolerate it
    blob = blob.replace(b"P6\n", b"P6\n# test comment\n", 1)
    got = decode_ppm(blob)
    assert np.array_equal(got, px)


def test_wav_roundtrip():
    x = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000).astype(np.int16)
    samples, rate = decode_wav(encode_wav(x, rate=8000))
    assert rate == 8000
    assert np.array_equal(samples.ravel(), x)


def test_decode_payload_dispatch():
    px = _pixels(4, 4)
    m = decode_payload(encode_bmp(px))
    assert m["kind"] == "image" and np.array_equal(m["pixels"], px)
    m = decode_payload(encode_ppm(px))
    assert m["kind"] == "image" and np.array_equal(m["pixels"], px)
    m = decode_payload(encode_wav(np.zeros(16, dtype=np.int16)))
    assert m["kind"] == "audio" and m["samples"].size == 16
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_real_features_through_spark_kernel(spark):
    """BMP/PPM/WAV blobs through the SAME mapInPandas kernel the
    synthetic media uses: features must be unit-norm, content-derived
    (identical pixels ⇒ identical feature regardless of container),
    and distinct for distinct content."""
    px = _pixels(8, 8, seed=11)
    rows = [
        (0, "image", bytearray(encode_bmp(px)), 8, 8, 1),
        (1, "image", bytearray(encode_ppm(px)), 8, 8, 1),
        (2, "image", bytearray(encode_bmp(_pixels(8, 8, seed=12))), 8, 8, 1),
        (
            3,
            "audio",
            bytearray(
                encode_wav(
                    (np.sin(np.linspace(0, 10, 500)) * 9000).astype(np.int16)
                )
            ),
            0,
            0,
            1,
        ),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, n_frames int",
    )
    feats = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    for v in feats.values():
        assert abs(math.fsum(x * x for x in v) - 1.0) < 1e-5
    # same pixels, different container → same content feature
    assert feats[0] == feats[1]
    # different pixels → different feature
    assert feats[0] != feats[2]
    assert feats[3] != feats[0]


def test_resize_image_executes_plan():
    px = _pixels(40, 60)
    out = resize_image(px, 30, 20)
    assert out.shape == (20, 30, 3)
    # nearest-neighbour: every output pixel exists in the input
    assert out.dtype == px.dtype
    corner = px[0, 0]
    assert np.array_equal(out[0, 0], corner)
