"""Pure-numpy MJPEG/AVI video codec — the video leg of the multimodal
decode path.

Motion-JPEG in a RIFF/AVI container (Microsoft "AVI RIFF File
Reference", public since 1992) is the simplest REAL video format:
every frame is an independent JPEG, so the existing T.81 codec
(llm/jpeg.py, baseline + progressive) does all the pixel work and
this module only walks the container. Frame independence is also the
scale property that matters: a 100 TB MJPEG corpus shards at frame
granularity with no inter-frame state.

Supported: RIFF 'AVI ' with one 'vids'/'MJPG' stream, '00dc'/'00db'
frame chunks inside the 'movi' list (direct or nested in 'rec '
lists). Inter-frame-coded formats (H.264, VP9, ...) stay behind the
documented ffmpeg hook in llm/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoError(ValueError):
    pass


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "
    )


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for a RIFF chunk run."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word-aligned


def decode_avi_mjpeg(data: bytes, max_frames: int | None = None):
    """MJPEG AVI bytes → (frames list of HxWx3 uint8, fps float).

    Walks the RIFF tree to the 'movi' list and JPEG-decodes every
    video frame chunk ('00dc'/'00db', optionally wrapped in 'rec '
    record lists). ``max_frames`` bounds decode cost for
    frame-sampling callers that only need the first N.
    """
    from pennsieve_streaming_spark.llm import jpeg

    if not is_avi(data):
        raise VideoError("not a RIFF/AVI payload")
    fps = 0.0
    frames: list[np.ndarray] = []

    def scan_list(pos: int, end: int) -> None:
        nonlocal fps
        for cid, body, size in _walk_chunks(data, pos, end):
            if max_frames is not None and len(frames) >= max_frames:
                return
            if cid == b"LIST":
                scan_list(body + 4, body + size)
            elif cid == b"avih" and size >= 4:
                (us_per_frame,) = struct.unpack_from("<I", data, body)
                if us_per_frame:
                    fps = 1e6 / us_per_frame
            elif cid[2:4] in (b"dc", b"db") and size > 0:
                payload = data[body : body + size]
                if jpeg.is_jpeg(payload):
                    frames.append(jpeg.decode_jpeg(payload))
                else:
                    raise VideoError(
                        "non-JPEG frame chunk (MJPEG streams only)"
                    )

    scan_list(12, len(data))
    if not frames:
        raise VideoError("no video frames found")
    return frames, fps


def video_features(
    frames: list[np.ndarray], fps: float, dim: int = 16
) -> np.ndarray:
    """Fixed ``dim``-length summary vector of a decoded clip:
    [n_frames, height, width, fps, global luma mean/std, first-frame
    luma mean, last-frame luma mean, mean |frame-to-frame luma delta|
    (motion proxy), 7-bin global luma histogram fractions] —
    truncated / zero-padded to ``dim``. Deterministic in the frame
    bytes, like the image/audio feature vectors."""
    n = len(frames)
    h, w = frames[0].shape[:2]
    luma = [
        0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        for f in frames
    ]
    allv = np.concatenate([f.reshape(-1) for f in luma])
    motion = (
        float(
            np.mean(
                [np.mean(np.abs(luma[i + 1] - luma[i])) for i in range(n - 1)]
            )
        )
        if n > 1
        else 0.0
    )
    hist = np.histogram(allv, bins=7, range=(0.0, 256.0))[0] / max(
        allv.size, 1
    )
    feat = np.array(
        [
            float(n), float(h), float(w), float(fps),
            float(allv.mean()), float(allv.std()),
            float(luma[0].mean()), float(luma[-1].mean()), motion,
            *hist,
        ],
        dtype=np.float64,
    )
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return feat[:dim]


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 10.0, quality: int = 85
) -> bytes:
    """HxWx3 uint8 frames → MJPEG AVI bytes (fixture generator; each
    frame is a baseline JPEG from llm/jpeg.py)."""
    from pennsieve_streaming_spark.llm import jpeg

    if not frames:
        raise VideoError("no frames")
    h, w = frames[0].shape[:2]
    payloads = [jpeg.encode_jpeg(np.asarray(f, np.uint8), quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        out = cid + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(four: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1e6 / fps)), max_bytes * int(round(fps)), 0, 0x10,
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0, 1, int(round(fps)), 0, len(payloads),
            max_bytes, 0, 0xFFFFFFFF, 0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# Synthetic clip geometry for the driver-gated scene-cut query: a
# smooth luminance gradient (near-losslessly JPEG-compressible) with
# ONE planted hard cut (+SC_SHIFT luma) at frame 4 + doc_id % 5 and a
# +-1 alternating per-frame flicker so the within-scene diff path is
# data-exercised. No value reaches 255, so the cut magnitude survives
# the codec intact.
SC_FRAMES, SC_H, SC_W, SC_SHIFT = 12, 32, 32, 60


def synthetic_clip(doc_id: int):
    """(doc_id) → (frames, cut_idx): the deterministic MJPEG test
    clip. Gradient base 10+doc_id%20 .. ~153; scene 2 adds SC_SHIFT."""
    cut = 4 + int(doc_id) % 5
    a = 10 + int(doc_id) % 20
    i = np.arange(SC_H)[:, None]
    j = np.arange(SC_W)[None, :]
    g = (i * 64) // SC_H + (j * 64) // SC_W + a
    frames = []
    for k in range(SC_FRAMES):
        v = (g + (SC_SHIFT if k >= cut else 0) + (k % 2)).astype(np.uint8)
        frames.append(np.stack([v, v, v], axis=-1))
    return frames, cut


def scene_cuts(
    frames: list[np.ndarray], mult: float = 4.0, abs_floor: float = 5.0
) -> list[int]:
    """Frame-difference scene-cut detection: d_k = mean |luma_k −
    luma_{k−1}|; frame k starts a new scene when d_k exceeds
    ``mult × median(d) + abs_floor`` — the median (lower order
    statistic) adapts the threshold to the clip's own motion level,
    the absolute floor keeps static clips (median 0) from dividing
    into noise. The shot-boundary baseline every video-dedup /
    frame-sampling pipeline starts from.
    """
    if len(frames) < 2:
        return []
    luma = [
        0.299 * f[..., 0].astype(np.float64)
        + 0.587 * f[..., 1]
        + 0.114 * f[..., 2]
        for f in frames
    ]
    d = [
        float(np.mean(np.abs(luma[k] - luma[k - 1])))
        for k in range(1, len(frames))
    ]
    med = sorted(d)[(len(d) - 1) // 2]
    thr = mult * med + abs_floor
    return [k + 1 for k, dk in enumerate(d) if dk > thr]


def scene_cut_synthetic(documents) -> "DataFrame":
    """(doc_id) → detected scene cuts of each synthetic clip after a
    FULL MJPEG AVI encode→decode round trip — the codec-path analogue
    of gif_roundtrip_stats: the clip construction plants exactly one
    hard cut at 4 + doc_id % 5, the REAL pipeline (encode_avi_mjpeg →
    decode_avi_mjpeg → scene_cuts) must recover it, and the DuckDB
    oracle recomputes the planted position from the closed form — a
    codec bit error, a luma regression, or a detector break all
    surface as a driver-gate mismatch. Only codec-robust integers are
    emitted (the lossy JPEG pixel values never are).

    Output: (media_id, n_frames, cut_idx).
    """
    import pandas as pd

    from pennsieve_streaming_spark.util import ensure_parallelism

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"media_id": [], "n_frames": [], "cut_idx": []}
            for d in pdf["doc_id"]:
                frames, _ = synthetic_clip(int(d))
                dec, _fps = decode_avi_mjpeg(encode_avi_mjpeg(frames))
                for c in scene_cuts(dec):
                    out["media_id"].append(int(d))
                    out["n_frames"].append(len(dec))
                    out["cut_idx"].append(int(c))
            yield pd.DataFrame(out)

    return ensure_parallelism(
        documents.select("doc_id"), "doc_id"
    ).mapInPandas(run, "media_id long, n_frames long, cut_idx long")
