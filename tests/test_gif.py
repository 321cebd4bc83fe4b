"""GIF codec tests: LZW round-trip (incl. dictionary growth, the
4096 reset, and the KwKwK case), interlace reordering, extension
skipping, local color tables, and the feature-dispatch integration."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pennsieve_streaming_spark.llm.gif import (
    GifError,
    _deinterlace,
    decode_gif,
    encode_gif,
    is_gif,
)


def _gray(dec: np.ndarray) -> np.ndarray:
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert (dec[:, :, 0] == dec[:, :, 2]).all()
    return dec[:, :, 0]


def test_roundtrip_patterns():
    rng = np.random.default_rng(7)
    imgs = [
        np.tile(np.arange(256, dtype=np.uint8), (16, 1)),  # growth
        np.full((31, 77), 200, dtype=np.uint8),            # flat runs
        rng.integers(0, 256, size=(200, 300), dtype=np.uint8),  # 4096 reset
        np.array([[1] * 10], dtype=np.uint8),              # KwKwK
    ]
    for img in imgs:
        dec, n_frames = decode_gif(encode_gif(img))
        assert n_frames == 1
        assert (_gray(dec) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8
    )
    dec, _ = decode_gif(encode_gif(img))
    assert (_gray(dec) == img).all()


def test_deinterlace_is_the_spec_permutation():
    # 8 rows labeled by final position; interlaced file order is
    # pass1 rows 0, pass2 row 4, pass3 rows 2,6, pass4 rows 1,3,5,7
    file_order = np.array([[0], [4], [2], [6], [1], [3], [5], [7]],
                          dtype=np.uint8)
    out = _deinterlace(file_order)
    assert out[:, 0].tolist() == list(range(8))


def test_interlaced_frame_decodes():
    """Build an interlaced GIF by permuting the encoder's rows into
    file order and setting the interlace flag."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    file_rows = np.vstack([img[list([0])], img[[4]], img[[2, 6]],
                           img[[1, 3, 5, 7]]])
    enc = bytearray(encode_gif(file_rows))
    # image descriptor sits right after header(13) + gct(768)
    desc_at = 13 + 768
    assert enc[desc_at] == 0x2C
    enc[desc_at + 9] |= 0x40  # interlace flag
    dec, _ = decode_gif(bytes(enc))
    assert (_gray(dec) == img).all()


def test_extensions_skipped_and_87a_accepted():
    img = np.tile(np.arange(64, dtype=np.uint8) * 4, (4, 1))
    enc = bytearray(encode_gif(img))
    # splice a graphic-control extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    desc_at = 13 + 768
    spliced = bytes(enc[:desc_at]) + gce + bytes(enc[desc_at:])
    spliced = b"GIF87a" + spliced[6:]
    assert is_gif(spliced)
    dec, n_frames = decode_gif(spliced)
    assert n_frames == 1
    assert (_gray(dec) == img).all()


def test_local_color_table_overrides_global():
    img = np.zeros((2, 2), dtype=np.uint8)  # all index 0
    enc = bytearray(encode_gif(img))
    desc_at = 13 + 768
    # set local-color-table flag (2 entries) and insert a red table
    enc[desc_at + 9] |= 0x80  # LCT present, size bits 0 -> 2 entries
    lct = bytes([255, 0, 0, 0, 0, 0])
    spliced = bytes(enc[: desc_at + 10]) + lct + bytes(enc[desc_at + 10:])
    dec, _ = decode_gif(spliced)
    assert dec[0, 0].tolist() == [255, 0, 0]


def test_multiframe_counts_frames():
    img = np.full((3, 3), 9, dtype=np.uint8)
    one = encode_gif(img)
    desc_at = 13 + 768
    frame = one[desc_at:-1]  # descriptor + data, minus trailer
    multi = one[:-1] + frame + frame + b"\x3b"
    dec, n_frames = decode_gif(multi)
    assert n_frames == 3
    assert (_gray(dec) == img).all()


def test_rejects_garbage_and_truncation():
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    img = np.tile(np.arange(32, dtype=np.uint8) * 8, (4, 1))
    enc = encode_gif(img)
    with pytest.raises(GifError):
        decode_gif(enc[: len(enc) // 2])
    assert not is_gif(b"xx")


def test_feature_dispatch_uses_real_pixels(spark):
    """A GIF payload routed through extract_features yields the REAL
    decoded dimensions, not the digest stub."""
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.llm.multimodal import extract_features

    img = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (6, 1))  # 6x24
    payload = encode_gif(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, kind string, payload binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(0).alias("width"), F.lit(0).alias("height"),
            F.lit(0).alias("sample_rate"), F.lit(0).alias("n_frames"),
            F.lit("gif").alias("format"),
        ),
    )
    row = extract_features(media).collect()[0]
    assert row.feature[0] == 24.0 and row.feature[1] == 6.0
