"""Pure-numpy GIF87a/GIF89a codec (CompuServe GIF spec, 1987/1989;
LZW per Welch 1984 as constrained by the GIF spec's variable-width
little-endian code packing).

Completes the legacy-image family next to llm/png.py, llm/jpeg.py and
llm/rawimg.py: palette-indexed frames, global/local color tables,
interlaced row ordering (the 8/8/4/2 four-pass scheme), and the full
LZW dictionary lifecycle (variable code width 3..12 bits, CLEAR
resets, deferred-clear streams, the KwKwK case).

Decode returns the FIRST frame as an (h, w, 3) uint8 RGB array plus
the frame count — the still-image feature path uses the pixels, the
video-ish path (multi-frame GIFs) uses the count. The encoder writes
a single-frame, non-interlaced GIF89a with a global color table and
real LZW compression; it exists so the test goldens exercise the
decoder's dictionary-growth and reset paths against round-trip
identity rather than hand-built bitstreams.

Determinism: byte-in, array-out, no floats. Spark-side use is the
``_decode_features`` dispatch in llm/multimodal.py (Arrow
``mapInPandas`` batches — image bytes never shuffle as rows, only
features do).

No counterpart in the reference (Scala/Akka, no codecs) — scale-
extension surface, same family as X26.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def is_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavored LZW: variable width from min+1 to 12 bits, CLEAR
    resets the table, codes packed LSB-first."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # table: list of byte strings; indices < clear are literals
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
            if prev is None:
                if code >= len(table):
                    raise GifError("first code after clear not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise GifError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                # some encoders omit END; stop once the frame is full
                return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
    if len(out) < n_pixels:
        raise GifError("LZW stream truncated")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("unterminated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        pos += n
    # unreachable


def decode_gif(data: bytes) -> tuple[np.ndarray, int]:
    """Decode the first frame to (h, w, 3) uint8 RGB; return
    (frame_rgb, n_frames). Frames without a color table raise."""
    if not is_gif(data):
        raise GifError("not a GIF signature")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated global color table")
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3).copy()
        pos += 3 * n
    first: np.ndarray | None = None
    n_frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(data):
                raise GifError("truncated local color table")
            lct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
            lct = lct.reshape(n, 3).copy()
            pos += 3 * n
        if pos >= len(data):
            raise GifError("missing LZW min code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise GifError("bad LZW min code size")
        stream, pos = _sub_blocks(data, pos)
        n_frames += 1
        if first is None:
            if lct is None:
                raise GifError("frame has no color table")
            idx = _lzw_decode(min_code, stream, w * h)
            if int(idx.max(initial=0)) >= len(lct):
                raise GifError("pixel index outside color table")
            rows = idx.reshape(h, w)
            if iflags & 0x40:
                rows = _deinterlace(rows)
            first = lct[rows]  # (h, w, 3)
    if first is None:
        raise GifError("no image frame")
    return first, n_frames


def _lzw_encode(min_code_size: int, pixels: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    cur = b""
    for p in pixels.tobytes():
        nxt = cur + bytes([p])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # the encoder's table runs ONE entry ahead of the decoder's
        # (it adds on emit; the decoder adds one code later), so the
        # bump fires at (1<<width)+1 here vs len==1<<width there —
        # both sides then widen before the same emitted code
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([p])
    if cur:
        emit(table[cur])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Single-frame GIF89a from an (h, w) uint8 GRAYSCALE index array
    with a 256-entry grayscale global color table (index == intensity)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise GifError("encoder takes an (h, w) uint8 array")
    h, w = img.shape
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = 8
    lzw = _lzw_encode(min_code, img.reshape(-1))
    blocks = bytearray([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return head + gct + desc + bytes(blocks) + b"\x3b"


def gif_roundtrip_stats(documents):
    """(doc_id) → per-media stats of the DECODED pixels after a full
    GIF encode→decode round trip of the synthetic luminance field —
    the oracle-gated proof of the LZW codec itself: the DuckDB oracle
    computes the same sums from the field's closed form, so any
    encoder/decoder bit error surfaces as a driver-gate mismatch
    (the dhash_synthetic plumbing contract applied to the codec).

    Output: (media_id, width, height, n_frames, sum_gq, sum_gq2) —
    dimensions from the decoded frame, exact integer pixel sums.
    """
    import pandas as pd

    from pennsieve_streaming_spark.llm.imagehash import synthetic_gray

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": [], "width": [], "height": [],
                "n_frames": [], "sum_gq": [], "sum_gq2": [],
            }
            for d in pdf["doc_id"]:
                img = synthetic_gray(int(d)).astype(np.uint8)
                frame, nf = decode_gif(encode_gif(img))
                g = frame[:, :, 0].astype(np.int64)  # grayscale GCT
                out["media_id"].append(int(d))
                out["height"].append(int(frame.shape[0]))
                out["width"].append(int(frame.shape[1]))
                out["n_frames"].append(int(nf))
                out["sum_gq"].append(int(g.sum()))
                out["sum_gq2"].append(int((g * g).sum()))
            yield pd.DataFrame(out)

    return documents.select("doc_id").mapInPandas(
        run,
        "media_id long, width long, height long, n_frames long, "
        "sum_gq long, sum_gq2 long",
    )
