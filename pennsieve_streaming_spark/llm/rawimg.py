"""Pure-numpy decoders for the simple raster formats: BMP (Windows
DIB, uncompressed 8/24/32-bit) and netpbm PGM/PPM (P2/P3 ASCII,
P5/P6 binary).

Like PNG (llm/png.py) and WAV (llm/wav.py) these are public formats
simple enough to decode natively in this container — header parsing +
``np.frombuffer`` — so the multimodal feature path gets REAL pixels
for three image families. Both decoders return HxWxC uint8 arrays
compatible with ``png.image_features``/``png.resize_nearest``.
"""

from __future__ import annotations

import struct

import numpy as np


class RawImageError(ValueError):
    pass


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def is_bmp(data: bytes) -> bool:
    return len(data) >= 26 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP → HxWx3 uint8 (RGB). Supports 24/32-bit
    truecolor and 8-bit paletted; rows are bottom-up (top-down when
    height < 0) and padded to 4 bytes per the DIB spec."""
    if not is_bmp(data):
        raise RawImageError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise RawImageError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise RawImageError(f"unsupported BMP compression {compression}")
    top_down = height < 0
    height = abs(height)
    if bpp == 8:
        # palette: BGRX quads right after the header
        (ncolors,) = struct.unpack_from("<I", data, 46)
        ncolors = ncolors or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data, dtype=np.uint8, count=ncolors * 4, offset=pal_off
        ).reshape(ncolors, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        stride = (width + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * height, offset=data_off
        ).reshape(height, stride)[:, :width]
        img = pal[rows]
    elif bpp in (24, 32):
        ch = bpp // 8
        stride = (width * ch + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * height, offset=data_off
        ).reshape(height, stride)[:, : width * ch].reshape(height, width, ch)
        img = rows[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    else:
        raise RawImageError(f"unsupported BMP bit depth {bpp}")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit BI_RGB BMP (bottom-up)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    raw = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(raw), 0, 0, off)
    return head + dib + raw


# ---------------------------------------------------------------------------
# netpbm (PGM/PPM)
# ---------------------------------------------------------------------------

def is_netpbm(data: bytes) -> bool:
    return len(data) >= 2 and data[:1] == b"P" and data[1:2] in b"2356"


def _pnm_tokens(data: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens, honoring # comments."""
    toks: list[int] = []
    cur = b""
    while len(toks) < n and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            cur += c
        pos += 1
    if cur and len(toks) < n:
        toks.append(int(cur))
    if len(toks) < n:
        raise RawImageError("truncated netpbm header")
    return toks, pos


def decode_netpbm(data: bytes) -> np.ndarray:
    """P2/P5 (gray) / P3/P6 (RGB) → HxWxC uint8 (maxval ≤ 255)."""
    if not is_netpbm(data):
        raise RawImageError("not a netpbm payload")
    kind = data[:2]
    ch = 3 if kind in (b"P3", b"P6") else 1
    (w, h, maxval), pos = _pnm_tokens(data, 3, 2)
    if maxval > 255:
        raise RawImageError("16-bit netpbm not supported")
    n = w * h * ch
    if kind in (b"P5", b"P6"):
        arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    else:
        vals, _ = _pnm_tokens(data, n, pos)
        arr = np.asarray(vals, dtype=np.uint8)
    img = arr.reshape(h, w, ch)
    if maxval != 255:
        img = (img.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    return np.ascontiguousarray(img)


def encode_netpbm(img: np.ndarray, binary: bool = True) -> bytes:
    """HxW (PGM) or HxWx3 (PPM) uint8 → P5/P6 (binary) or P2/P3."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    h, w = img.shape[:2]
    if binary:
        kind = b"P5" if gray else b"P6"
        return kind + f"\n{w} {h}\n255\n".encode() + img.tobytes()
    kind = b"P2" if gray else b"P3"
    body = " ".join(str(int(x)) for x in img.reshape(-1))
    return kind + f"\n{w} {h}\n255\n{body}\n".encode()
