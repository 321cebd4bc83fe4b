"""Pure-numpy PNG codec + real multimodal decode path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pennsieve_streaming_spark.llm.png import (
    decode_png,
    encode_png,
    image_features,
    is_png,
    resize_nearest,
)


def _gradient(h, w, ch=3):
    y = np.arange(h, dtype=np.uint32)[:, None]
    x = np.arange(w, dtype=np.uint32)[None, :]
    base = ((x * 7 + y * 13) % 256).astype(np.uint8)
    if ch == 1:
        return base
    return np.stack([(base + 31 * c).astype(np.uint8) for c in range(ch)], axis=2)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_channels(ch):
    img = _gradient(13, 17, ch)
    raw = encode_png(img)
    assert is_png(raw)
    back = decode_png(raw)
    expect = img if ch != 1 else img
    np.testing.assert_array_equal(back, expect)


def test_decode_all_filter_types():
    """Re-encode scanlines with each PNG filter; decode must invert all
    five (spec §9: None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    img = _gradient(6, 8, 3)
    h, w = 6, 8
    stride = w * 3
    flat = img.reshape(h, stride).astype(np.int16)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ftype = y % 5
        cur = flat[y]
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:
            enc = cur.copy()
            enc[3:] = (cur[3:] - cur[:-3]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = cur.copy()
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                enc[i] = (cur[i] - (int(left) + int(prev[i])) // 2) % 256
        else:
            enc = cur.copy()
            for i in range(stride):
                left = int(cur[i - 3]) if i >= 3 else 0
                ul = int(prev[i - 3]) if i >= 3 else 0
                enc[i] = (cur[i] - paeth(left, int(prev[i]), ul)) % 256
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    raw = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(raw), img)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.sampled_from([1, 3, 4]))
def test_roundtrip_property(h, w, ch):
    rng = np.random.default_rng(h * 100 + w * 10 + ch)
    img = rng.integers(0, 256, (h, w) if ch == 1 else (h, w, ch), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_resize_nearest():
    img = _gradient(10, 20, 3)
    out = resize_nearest(img, 5, 4)
    assert out.shape == (4, 5, 3)
    # corner pixels map to source corners under the floor index map
    np.testing.assert_array_equal(out[0, 0], img[0, 0])


def test_image_features_shape():
    f = image_features(_gradient(8, 8, 3))
    assert f.shape == (16,)
    assert f[0] == 8.0 and f[1] == 8.0 and f[2] == 3.0
    assert abs(f[8:].sum() - 1.0) < 1e-9  # histogram density sums to 1


def test_extract_features_real_png_decode(spark):
    """End-to-end: PNG payloads through extract_features get REAL pixel
    features (width/height in slots 0/1), non-PNG payloads keep the
    hash-stub path, and decode_stub=False no longer errors for PNG."""
    from pennsieve_streaming_spark.llm.multimodal import extract_features

    img = _gradient(12, 9, 3)
    png_payload = encode_png(img)
    rows = [
        (1, "image", bytearray(png_payload), (9, 12, 0, 0, "png")),
        (2, "audio", bytearray(b"not-an-image"), (0, 0, 16000, 0, "synthetic")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,format:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[1]["feature"][0] == 9.0 and out[1]["feature"][1] == 12.0
    assert len(out[2]["feature"]) == 16
    # decode_stub=False: PNG decodes, non-PNG raises at task level
    png_only = media.filter("media_id = 1")
    res = extract_features(png_only, decode_stub=False).collect()
    assert res[0]["feature"][2] == 3.0  # channels
    with pytest.raises(Exception):
        extract_features(
            media.filter("media_id = 2"), decode_stub=False
        ).collect()


def test_resize_images_real_png(spark):
    from pennsieve_streaming_spark.llm.multimodal import resize_images

    img = _gradient(10, 20, 3)
    rows = [(1, "image", bytearray(encode_png(img)), (20, 10, 0, 0, "png"))]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int,format:string>",
    )
    row = resize_images(media, 8, 6).collect()[0]
    assert row["meta"]["width"] == 8 and row["meta"]["height"] == 6
    assert row["scale_x"] == 8 / 20 and row["scale_y"] == 6 / 10
    back = decode_png(bytes(row["payload"]))
    assert back.shape == (6, 8, 3)
    np.testing.assert_array_equal(back, resize_nearest(img, 8, 6))
