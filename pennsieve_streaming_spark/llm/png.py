"""Minimal pure-numpy PNG codec for the multimodal decode path.

The container ships no image libraries (PIL/opencv), but PNG is a
public, simple format: zlib-compressed scanlines with 5 per-row byte
filters. This module implements enough of the spec (8-bit depth, color
types gray / gray+alpha / RGB / RGBA, non-interlaced) to give the
multimodal operators a REAL decode for PNG payloads; other formats
still fall back to the documented stub in ``multimodal.py``.

Spec: https://www.w3.org/TR/png-3/ (public W3C standard).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) for grayscale or (H, W, C).

    Supports bit depth 8, color types 0/2/4/6, non-interlaced —
    raises ValueError on anything else.
    """
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG payload")
    width = height = None
    color_type = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline data length")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                up_left = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + _paeth(left, int(prev[i]), up_left)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(height, width, ch)
    return img[:, :, 0] if ch == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C in {1,2,3,4}) -> PNG bytes
    (filter 0 scanlines, one IDAT)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * ch)
    scanlines = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    idat = zlib.compress(scanlines, 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the classic index-map formulation)."""
    h = img.shape[0]
    w = img.shape[1]
    ys = np.minimum((np.arange(target_h) * h) // max(target_h, 1), h - 1)
    xs = np.minimum((np.arange(target_w) * w) // max(target_w, 1), w - 1)
    return img[np.ix_(ys, xs)]


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic 16-d summary of decoded pixels: [w, h, channels,
    mean, std, min, max, aspect, 8-bin luminance histogram (density)]."""
    arr = img if img.ndim == 3 else img[:, :, None]
    h, w, ch = arr.shape
    lum = arr.astype(np.float64).mean(axis=2)
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 255.0))
    hist = hist / max(lum.size, 1)
    base = np.array(
        [
            float(w),
            float(h),
            float(ch),
            float(lum.mean()),
            float(lum.std()),
            float(arr.min()),
            float(arr.max()),
            float(w) / max(h, 1),
        ]
    )
    out = np.concatenate([base, hist])
    if len(out) < dim:  # pragma: no cover - dim is fixed at 16
        out = np.pad(out, (0, dim - len(out)))
    return out[:dim]
