"""MJPEG/AVI video codec: container walk, per-frame JPEG parity,
frame sampling bound, Spark e2e through the multimodal path."""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.llm import jpeg, video
from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
)


def _clip(n=6, h=24, w=32):
    frames = []
    for i in range(n):
        f = np.full((h, w, 3), 60 + 20 * i, np.uint8)
        f[4:12, 4 + 2 * i : 12 + 2 * i] = [200, 50, 50]
        frames.append(f)
    return frames


def test_mjpeg_roundtrip_frames_match_standalone_jpeg():
    frames = _clip()
    avi = video.encode_avi_mjpeg(frames, fps=12.0, quality=90)
    assert video.is_avi(avi)
    dec, fps = video.decode_avi_mjpeg(avi)
    assert len(dec) == len(frames)
    assert abs(fps - 12.0) < 1e-3
    for i, f in enumerate(frames):
        want = jpeg.decode_jpeg(jpeg.encode_jpeg(f, 90))
        assert np.array_equal(dec[i], want), i


def test_mjpeg_max_frames_bound():
    avi = video.encode_avi_mjpeg(_clip(), fps=10.0)
    full, _ = video.decode_avi_mjpeg(avi)
    sub, _ = video.decode_avi_mjpeg(avi, max_frames=2)
    assert len(sub) == 2
    assert np.array_equal(sub[1], full[1])


def test_rejects_non_mjpeg_and_garbage():
    with pytest.raises(video.VideoError):
        video.decode_avi_mjpeg(b"RIFFxxxxAVI but not really")
    avi = bytearray(video.encode_avi_mjpeg(_clip(2), fps=10.0))
    i = avi.find(b"00dc")
    avi[i + 8 : i + 11] = b"\x00\x00\x00"  # corrupt the JPEG SOI
    with pytest.raises(video.VideoError):
        video.decode_avi_mjpeg(bytes(avi))


def test_video_features_shape_and_motion():
    frames = _clip()
    static = [frames[0]] * 6
    avi_m = video.decode_avi_mjpeg(video.encode_avi_mjpeg(frames, 10.0))[0]
    f_moving = video.video_features(avi_m, 10.0, FEATURE_DIM)
    f_static = video.video_features(
        video.decode_avi_mjpeg(video.encode_avi_mjpeg(static, 10.0))[0],
        10.0,
        FEATURE_DIM,
    )
    assert len(f_moving) == FEATURE_DIM
    assert f_moving[8] > f_static[8]  # motion proxy separates the two
    assert f_static[8] == 0.0


def test_spark_mjpeg_decode(spark):
    payload = video.encode_avi_mjpeg(_clip(), fps=12.0, quality=90)
    media = spark.createDataFrame(
        [(1, "video", bytearray(payload), None)],
        "media_id long, kind string, payload binary, meta string",
    ).drop("meta")
    [row] = extract_features(media).collect()
    frames, fps = video.decode_avi_mjpeg(payload)
    want = video.video_features(frames, fps, FEATURE_DIM)
    assert row.feature == pytest.approx(list(want))
    assert row.feature[0] == 6.0  # real frame count, not the stub


# --- scene cuts ---------------------------------------------------------------

def test_scene_cuts_kernel_plants_and_statics():
    import numpy as np

    from pennsieve_streaming_spark.llm.video import scene_cuts

    def gray(v, n=3):
        f = np.full((8, 8, 3), v, np.uint8)
        return [f.copy() for _ in range(n)]

    # static clip: no cuts
    assert scene_cuts(gray(50, 6)) == []
    # one hard jump at frame 3
    clip = gray(50, 3) + gray(140, 3)
    assert scene_cuts(clip) == [3]
    # two cuts
    clip = gray(30, 3) + gray(120, 3) + gray(210, 3)
    assert scene_cuts(clip) == [3, 6]
    # short clip edge
    assert scene_cuts(gray(50, 1)) == []


def test_scene_cuts_median_adaptive_threshold():
    import numpy as np

    from pennsieve_streaming_spark.llm.video import scene_cuts

    # steady motion of +8 luma per frame (d=8 each); one +80 jump.
    frames = []
    v = 20
    for k in range(10):
        v += 80 if k == 6 else 8
        frames.append(np.full((8, 8, 3), v, np.uint8))
    # median d = 8 -> thr = 4*8+5 = 37; only the jump (d=88) passes
    assert scene_cuts(frames) == [6]


def test_scene_cut_synthetic_roundtrip(spark):
    from pennsieve_streaming_spark.llm.video import scene_cut_synthetic

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    out = {r.media_id: r for r in scene_cut_synthetic(docs).collect()}
    assert len(out) == 12  # exactly one cut per clip
    for d, r in out.items():
        assert r.cut_idx == 4 + d % 5
        assert r.n_frames == 12
