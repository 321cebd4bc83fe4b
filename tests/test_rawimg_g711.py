"""BMP / netpbm raster codecs + G.711 companded audio round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.llm import rawimg, wav
from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
)
from pennsieve_streaming_spark.llm.png import image_features


def _img(h=7, w=5, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def test_bmp_roundtrip_24bit(caplog):
    img = _img()
    data = rawimg.encode_bmp(img)
    assert rawimg.is_bmp(data)
    out = rawimg.decode_bmp(data)
    assert np.array_equal(out, img)


def test_bmp_row_padding_odd_width():
    # width 3 -> 9-byte rows padded to 12; padding must not corrupt
    img = _img(4, 3, seed=1)
    assert np.array_equal(rawimg.decode_bmp(rawimg.encode_bmp(img)), img)


def test_bmp_gray_input_promoted():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = rawimg.decode_bmp(rawimg.encode_bmp(g))
    assert out.shape == (3, 4, 3)
    assert np.array_equal(out[:, :, 0], g)


def test_bmp_rejects_garbage():
    with pytest.raises(rawimg.RawImageError):
        rawimg.decode_bmp(b"definitely not a bitmap")


# --------------------------------------------------------------------------
# netpbm
# --------------------------------------------------------------------------

def test_ppm_binary_and_ascii_roundtrip():
    img = _img(3, 4, seed=2)
    for binary in (True, False):
        out = rawimg.decode_netpbm(rawimg.encode_netpbm(img, binary=binary))
        assert np.array_equal(out, img)


def test_pgm_roundtrip_and_comment_header():
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    data = rawimg.encode_netpbm(g)
    # splice a comment into the header
    data = data.replace(b"\n255\n", b"\n# a comment\n255\n", 1)
    out = rawimg.decode_netpbm(data)
    assert np.array_equal(out[:, :, 0], g)


def test_netpbm_maxval_rescaled():
    data = b"P2\n2 1\n100\n0 100\n"
    out = rawimg.decode_netpbm(data)
    assert out[0, 0, 0] == 0 and out[0, 1, 0] == 255


# --------------------------------------------------------------------------
# G.711
# --------------------------------------------------------------------------

def test_mulaw_roundtrip_tone():
    t = np.arange(800) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    data = wav.encode_wav_g711(x, 8000, "mulaw")
    y, rate = wav.decode_wav(data)
    assert rate == 8000 and y.shape == (800, 1)
    # companded 8-bit telephony: ~2% max error at this amplitude
    assert np.max(np.abs(y[:, 0] - x)) < 0.02


def test_alaw_roundtrip_tone():
    t = np.arange(800) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    y, rate = wav.decode_wav(wav.encode_wav_g711(x, 8000, "alaw"))
    assert np.max(np.abs(y[:, 0] - x)) < 0.03


def test_mulaw_code_roundtrip_exact():
    # every code byte decodes then re-encodes to itself — except 127
    # (µ-law "negative zero"), which decodes to 0.0 and re-encodes to
    # the canonical positive zero 255
    codes = np.arange(256, dtype=np.uint8)
    lin = wav._mulaw_decode(codes)
    back = wav._mulaw_encode(lin)
    expect = codes.copy()
    expect[127] = 255
    assert np.array_equal(back, expect)


def test_alaw_code_roundtrip_exact():
    codes = np.arange(256, dtype=np.uint8)
    lin = wav._alaw_decode(codes)
    back = wav._alaw_encode(lin)
    assert np.array_equal(back, codes)


# --------------------------------------------------------------------------
# Spark e2e through the multimodal feature path
# --------------------------------------------------------------------------

def test_spark_decodes_bmp_ppm_g711(spark):
    img = _img(6, 6, seed=3)
    t = np.arange(400) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 200 * t)
    payloads = [
        (1, "image", bytearray(rawimg.encode_bmp(img))),
        (2, "image", bytearray(rawimg.encode_netpbm(img))),
        (3, "audio", bytearray(wav.encode_wav_g711(tone, 8000, "mulaw"))),
    ]
    media = spark.createDataFrame(
        [(i, k, p) for i, k, p in payloads],
        "media_id long, kind string, payload binary",
    )
    rows = {r.media_id: r.feature for r in extract_features(media).collect()}
    want_img = image_features(img, FEATURE_DIM)
    assert rows[1] == pytest.approx(list(want_img))
    assert rows[2] == pytest.approx(list(want_img))
    samples, rate = wav.decode_wav(bytes(payloads[2][2]))
    want_audio = wav.audio_features(samples, rate, FEATURE_DIM)
    assert rows[3] == pytest.approx(list(want_audio))
    assert rows[3][0] == 400.0  # real decode, not the hash stub
