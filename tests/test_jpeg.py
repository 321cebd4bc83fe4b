"""Baseline JPEG codec: round trips across subsampling modes, restart
intervals, odd dimensions; Spark e2e through the multimodal path."""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.llm import jpeg
from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
)
from pennsieve_streaming_spark.llm.png import image_features


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _blocky(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, size=(h // 16, w // 16, 3))
    return np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)


def _photo(h=48, w=64, seed=1, noise=8.0):
    rng = np.random.default_rng(seed)
    grad = np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3))
    return np.clip(grad + rng.normal(0, noise, grad.shape), 0, 255).astype(
        np.uint8
    )


def test_blocky_content_lossless_at_high_quality():
    img = _blocky()
    for ss in ("444", "420"):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 95, subsampling=ss))
        assert np.array_equal(out, img), ss


def test_photo_content_psnr():
    img = _photo()
    # q90 on sigma-8 noisy gradient: the codec rightly discards some
    # noise energy, ~31/30 dB measured — floor set with margin
    for ss, floor in (("444", 30.0), ("420", 29.0)):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, subsampling=ss))
        assert _psnr(out, img) > floor, ss


def test_grayscale_roundtrip():
    g = np.tile(np.arange(0, 256, 4, dtype=np.uint8), (16, 1))
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(g, 95))
    assert out.shape == (16, 64, 3)
    assert np.max(np.abs(out[:, :, 0].astype(int) - g.astype(int))) <= 2


def test_odd_dimensions_and_restart_intervals():
    img = _photo(37, 53, seed=3)
    for ss in ("444", "420"):
        for ri in (1, 2, 5):
            out = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, 92, subsampling=ss, restart_interval=ri)
            )
            assert out.shape == img.shape
            assert _psnr(out, img) > 28, (ss, ri)


def test_random_noise_entropy_stress():
    # pure noise maximizes coefficient magnitudes and code lengths —
    # the entropy coder must survive every (run, size) combination
    for seed in range(3):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
        out = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, 90, subsampling="420", restart_interval=2)
        )
        assert out.shape == img.shape


def test_ff_data_bytes_not_mistaken_for_restarts():
    # regression: a de-stuffed 0xFF data byte followed by a 0xD0-range
    # byte must not split the entropy stream (found by round-trip
    # fuzzing — this exact image produced that byte pair)
    img = _photo(16, 16, seed=1, noise=5.0)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90))
    assert _psnr(out, img) > 30


def test_rejects_invalid_scan_scripts_and_garbage():
    with pytest.raises(jpeg.JpegError):
        jpeg.decode_jpeg(b"not a jpeg")
    img = _blocky(16, 16)
    data = bytearray(jpeg.encode_jpeg(img, 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF2 + a baseline Ss=0..Se=63 scan is an
    with pytest.raises(jpeg.JpegError):  # invalid progressive script
        jpeg.decode_jpeg(bytes(data))


def test_progressive_roundtrip_matches_baseline():
    """Progressive encode -> decode must be PIXEL-EXACT vs the baseline
    path: both quantize to identical coefficients, so spectral
    selection + successive approximation must reassemble every bit."""
    img = _photo(37, 53, seed=7, noise=20.0)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85))
    for dc_al, ac_al, split in [(1, 1, 6), (0, 0, 10), (2, 2, 4), (1, 2, 33)]:
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(
                img, 85, dc_al=dc_al, ac_al=ac_al, band_split=split
            )
        )
        assert np.array_equal(prog, base), (dc_al, ac_al, split)


def test_progressive_grayscale_and_fuzz():
    rng = np.random.default_rng(99)
    g = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(g, 70)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, 70)),
    )
    for seed in range(6):
        r = np.random.default_rng(seed)
        h, w = int(r.integers(8, 40)), int(r.integers(8, 40))
        img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
        q = int(r.integers(30, 96))
        assert np.array_equal(
            jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, q)),
            jpeg.decode_jpeg(jpeg.encode_jpeg(img, q)),
        ), seed


def test_progressive_eob_run_paths():
    """A mostly-flat image drives long EOB runs (EOBn symbols with
    extra bits) through both the first-pass and refinement decoders."""
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # one busy block among many all-zero-AC ones
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img, 85)),
        jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85)),
    )


def test_spark_decodes_jpeg(spark):
    img = _blocky(32, 32, seed=7)
    payload = jpeg.encode_jpeg(img, 95)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    )
    [row] = extract_features(media).collect()
    want = image_features(jpeg.decode_jpeg(payload), FEATURE_DIM)
    assert row.feature == pytest.approx(list(want))
