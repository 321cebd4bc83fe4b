"""Pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec.

The last image format on the multimodal stub list. Scope matches the
overwhelming majority of real-world JPEGs:

- decode: baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  spectral selection + successive approximation per T.81 Annex G),
  8-bit samples, Huffman coding, grayscale or YCbCr with 4:4:4 /
  4:2:2 / 4:2:0 subsampling, restart intervals, byte stuffing;
- encode: baseline 4:4:4 (or grayscale) with the T.81 Annex K
  example quantization + Huffman tables, quality scaling per the
  public IJG curve — enough to generate real test corpora and
  round-trip the decoder — plus a progressive (SOF2) fixture encoder
  exercising every Annex G scan kind (DC/AC first + refinement,
  EOB runs with embedded correction bits).

Everything is public-spec arithmetic: zigzag order, the 8x8 type-II
DCT basis, the JFIF full-range BT.601 color transform. The entropy
decode loop is per-symbol Python (JPEG's Huffman stream is inherently
sequential); the block transforms (dequantize, IDCT, level shift,
color) are vectorized over all blocks at once, so decode cost is
dominated by the bit reader — fine for the Arrow-batched feature
path where payloads are thumbnails/small images, and clearly
documented as the slow path for megapixel inputs.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# T.81 Annex K.1 example quantization tables (luminance, chrominance)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], values)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 type-II DCT basis: C[k, n] = c(k) * cos((2n+1) k pi / 16) / 2
_n = np.arange(8)
_DCT = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) / 2.0
_DCT[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT over (..., 8, 8) coefficient blocks."""
    return np.einsum("ki,...kl,lj->...ij", _DCT, blocks, _DCT)


def _fdct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT over (..., 8, 8) sample blocks."""
    return np.einsum("ik,...kl,jl->...ij", _DCT, blocks, _DCT)


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------

def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for a canonical JPEG Huffman table."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise JpegError("entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JFIF → HxWx3 uint8 RGB (grayscale
    replicated). Progressive (SOF2) covers both spectral selection and
    successive approximation, per ITU T.81 Annex G."""
    if not is_jpeg(data):
        raise JpegError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    prog_coeffs = None  # ci -> (by, bx, 64) zigzag-order accumulators
    n_prog_scans = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    tbl = np.frombuffer(seg, dtype=">u2", count=64, offset=p)
                    p += 128
                else:
                    tbl = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p)
                    p += 64
                qt[tq] = tbl.astype(np.int64)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0x{marker:02X} "
                            "(baseline sequential + progressive only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_start = pos + seg_len
            if not frame["progressive"]:
                sel = {}
                for i in range(ns):
                    cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                    sel[cs] = (tables >> 4, tables & 0x0F)
                return _decode_scan(
                    data, scan_start, frame, sel, qt, huff, restart_interval
                )
            # progressive: accumulate this scan's coefficient bits
            sel_list = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    idx for idx, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                sel_list.append((ci, tables >> 4, tables & 0x0F))
            ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0x0F
            if prog_coeffs is None:
                prog_coeffs = _prog_alloc(frame)
            pos = _decode_scan_progressive(
                data, scan_start, frame, sel_list, ss, se, ah, al,
                huff, restart_interval, prog_coeffs,
            )
            n_prog_scans += 1
            continue
        pos += seg_len
    if prog_coeffs is not None and n_prog_scans:
        # de-zigzag the accumulated coefficients, then shared tail
        nat = {}
        for ci, zz in prog_coeffs.items():
            blk = np.zeros_like(zz)
            blk[..., ZIGZAG] = zz
            nat[ci] = blk.reshape(zz.shape[0], zz.shape[1], 8, 8)
        return _reconstruct(frame, nat, qt)
    raise JpegError("no scan found")


def _destuff(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuff entropy bytes up to the next real marker, splitting
    into restart chunks AS WE GO — restart markers are only
    recognizable in the stuffed stream (after de-stuffing, a
    legitimate 0xFF data byte followed by a 0xD0-range byte would be
    indistinguishable from a marker). Returns (chunks, next_marker_pos)
    where next_marker_pos points at the 0xFF of the terminating
    marker."""
    chunks: list[bytes] = []
    cur = bytearray()
    p = pos
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker: chunk boundary
                chunks.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # real marker (EOI / next segment)
        cur.append(b)
        p += 1
    chunks.append(bytes(cur))
    return chunks, p


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _comp_blocks(frame, c, hmax, vmax):
    """Non-interleaved scan geometry (T.81 A.2.2): a single-component
    scan covers ceil(comp_samples / 8) blocks of that component's own
    sample grid — MCU padding blocks are excluded."""
    comp_w = -(-(frame["w"] * c["h"]) // hmax)
    comp_h = -(-(frame["h"] * c["v"]) // vmax)
    return -(-comp_h // 8), -(-comp_w // 8)


def _prog_alloc(frame):
    """Zigzag-order coefficient accumulators sized to the full MCU
    grid (interleaved DC scans cover padding blocks too)."""
    _, _, mcus_x, mcus_y = _frame_geometry(frame)
    return {
        ci: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for ci, c in enumerate(frame["comps"])
    }


def _decode_scan_progressive(
    data, pos, frame, sel_list, ss, se, ah, al, huff, restart_interval,
    coeffs,
):
    """One progressive scan (T.81 Annex G): DC or AC band, first pass
    (ah == 0) or refinement (ah > 0). Returns the position of the
    marker terminating the scan's entropy data.

    Scan kinds:
    - DC first       (ss == 0, ah == 0): Huffman DC diffs, << al
    - DC refinement  (ss == 0, ah > 0): one raw bit per block -> bit al
    - AC first       (ss > 0, ah == 0): run/size with EOB-run symbols,
                                        coefficients << al
    - AC refinement  (ss > 0, ah > 0): newly-significant coefficients
      plus embedded correction bits for already-nonzero history
    """
    chunks, nxt = _destuff(data, pos)
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)

    if ss == 0:
        if se != 0:
            raise JpegError("DC scan must have Se == 0")
        # DC scans may interleave several components (MCU order) or
        # cover one component's own block grid.
        if len(sel_list) > 1:
            units = []
            for mcu in range(mcus_x * mcus_y):
                my, mx = divmod(mcu, mcus_x)
                mcu_units = []
                for ci, dc_t, _ in sel_list:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu_units.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx, dc_t)
                            )
                units.append(mcu_units)
        else:
            ci, dc_t, _ = sel_list[0]
            bh, bw = _comp_blocks(frame, comps[ci], hmax, vmax)
            units = [
                [(ci, by, bx, dc_t)]
                for by in range(bh)
                for bx in range(bw)
            ]
        per_chunk = restart_interval if restart_interval else len(units)
        done = 0
        for chunk in chunks:
            if done >= len(units):
                break
            reader = _BitReader(chunk)
            preds = {ci: 0 for ci, _, _ in sel_list}
            for unit in units[done : done + per_chunk]:
                for ci, by, bx, dc_t in unit:
                    zz = coeffs[ci][by, bx]
                    if ah == 0:
                        t = reader.decode_symbol(huff[(0, dc_t)])
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci] << al
                    else:
                        if reader.read_bit():
                            zz[0] |= 1 << al
                done += 1
        return nxt

    # AC scan: exactly one component, non-interleaved block order
    if len(sel_list) != 1:
        raise JpegError("AC progressive scan must be single-component")
    ci, _, ac_t = sel_list[0]
    act = huff[(1, ac_t)]
    bh, bw = _comp_blocks(frame, comps[ci], hmax, vmax)
    blocks = [(by, bx) for by in range(bh) for bx in range(bw)]
    per_chunk = restart_interval if restart_interval else len(blocks)
    p1, m1 = 1 << al, -1 << al
    done = 0
    for chunk in chunks:
        if done >= len(blocks):
            break
        reader = _BitReader(chunk)
        eobrun = 0
        for by, bx in blocks[done : done + per_chunk]:
            zz = coeffs[ci][by, bx]
            if ah == 0:  # AC first pass
                if eobrun > 0:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise JpegError("AC run overflow")
                        zz[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
            else:  # AC refinement (T.81 G.2.3 / libjpeg shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                # full run here (no -1): the current
                                # block consumes one in the post-step
                                # below AFTER its remaining correction
                                # bits are read
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            val = 0  # ZRL: pass 16 zero-history coeffs
                        else:
                            if s != 1:
                                raise JpegError(
                                    "AC refinement size must be 1"
                                )
                            val = p1 if reader.read_bit() else m1
                        # advance past r zero-history positions,
                        # emitting correction bits on nonzero ones
                        while k <= se:
                            if zz[k] != 0:
                                if reader.read_bit() and not (zz[k] & p1):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        zz[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    # block absorbed by the EOB run: correction bits
                    # for every remaining nonzero history coefficient
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
            done += 1
    return nxt


def _decode_scan(data, pos, frame, sel, qt, huff, restart_interval):
    chunks, _ = _destuff(data, pos)

    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w_img // (8 * hmax))
    mcus_y = -(-h_img // (8 * vmax))

    n_mcus = mcus_x * mcus_y
    per_chunk = restart_interval if restart_interval else n_mcus
    coeffs = {
        i: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8), dtype=np.int64)
        for i, c in enumerate(comps)
    }
    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcus:
            break
        reader = _BitReader(chunk)
        preds = [0] * len(comps)
        for _ in range(min(per_chunk, n_mcus - mcu)):
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(comps):
                dc_t, ac_t = sel[c["id"]]
                dct = huff[(0, dc_t)]
                act = huff[(1, ac_t)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run overflow")
                            blk[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[ZIGZAG] = blk  # de-zigzag
                        coeffs[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = nat.reshape(8, 8)
            mcu += 1

    return _reconstruct(frame, coeffs, qt)


def _reconstruct(frame, coeffs, qt):
    """Dequantize + IDCT + level shift + chroma upsample + color
    convert natural-order coefficient blocks (dict ci -> (by, bx, 8, 8)
    int64) into HxWx3 uint8 RGB. Shared by the baseline and
    progressive paths."""
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        qtbl = np.zeros(64, dtype=np.int64)
        qtbl[ZIGZAG] = qt[c["tq"]]
        deq = coeffs[ci] * qtbl.reshape(8, 8)
        pix = _idct2(deq.astype(np.float64)) + 128.0
        by, bx = pix.shape[0], pix.shape[1]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h_img, :w_img])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y] * 3, axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve (public libjpeg convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255)


def _encode_block(w: _BitWriter, blk: np.ndarray, pred: int,
                  dc_tbl, ac_tbl) -> int:
    zz = blk.reshape(64)[ZIGZAG]  # natural -> zigzag order
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, length = dc_tbl[t]
    w.write(code, length)
    if t:
        bits = diff if diff >= 0 else diff + (1 << t) - 1
        w.write(bits, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]
            w.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_tbl[(run << 4) | s]
        w.write(code, length)
        bits = v if v >= 0 else v + (1 << s) - 1
        w.write(bits, s)
        run = 0
    if last_nz != 63:
        code, length = ac_tbl[0x00]
        w.write(code, length)
    return dc


def _pad_plane(plane: np.ndarray, hp: int, wp: int) -> np.ndarray:
    h, w = plane.shape
    padded = np.empty((hp, wp))
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _plane_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    hp, wp = plane.shape
    blk = plane.reshape(hp // 8, 8, wp // 8, 8).transpose(0, 2, 1, 3)
    co = _fdct2(blk - 128.0)
    return np.round(co / qtbl.astype(np.float64).reshape(8, 8)).astype(np.int64)


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2
    box-averaged chroma, the photographic default). ``restart_interval``
    emits DRI + RSTn markers every N MCUs (predictor reset +
    byte-align), the error-resilience feature real encoders use.
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        subsampling = "444"
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "420" and not gray

    ql = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    qts = [ql] + ([qc] if not gray else [])
    enc_dc = [_build_encode_table(*DC_LUMA), _build_encode_table(*DC_CHROMA)]
    enc_ac = [_build_encode_table(*AC_LUMA), _build_encode_table(*AC_CHROMA)]

    mcu = 16 if sub else 8
    hp = -(-h // mcu) * mcu
    wp = -(-w // mcu) * mcu
    yb = _plane_blocks(_pad_plane(planes[0], hp, wp), ql)
    blocks = [yb]
    if not gray:
        if sub:
            chs = []
            for pl in planes[1:]:
                p = _pad_plane(pl, hp, wp)
                box = (p[0::2, 0::2] + p[0::2, 1::2]
                       + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                chs.append(_plane_blocks(box, qc))
            blocks += chs
        else:
            blocks += [
                _plane_blocks(_pad_plane(pl, hp, wp), qc) for pl in planes[1:]
            ]

    wtr = _BitWriter()
    preds = [0] * len(planes)
    mcus_y, mcus_x = hp // mcu, wp // mcu
    n_mcus = mcus_y * mcus_x
    rst = 0
    mcount = 0
    for myy in range(mcus_y):
        for mxx in range(mcus_x):
            if restart_interval and mcount and mcount % restart_interval == 0:
                wtr.flush()
                wtr.buf += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(planes)
            if sub:
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            wtr, blocks[0][2 * myy + by, 2 * mxx + bx],
                            preds[0], enc_dc[0], enc_ac[0],
                        )
                for pi in (1, 2):
                    preds[pi] = _encode_block(
                        wtr, blocks[pi][myy, mxx], preds[pi],
                        enc_dc[1], enc_ac[1],
                    )
            else:
                for pi in range(len(planes)):
                    t = 0 if pi == 0 else 1
                    preds[pi] = _encode_block(
                        wtr, blocks[pi][myy, mxx], preds[pi],
                        enc_dc[t], enc_ac[t],
                    )
            mcount += 1
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, q in enumerate(qts):
        # DQT bytes are serialized in zigzag order per T.81
        body = bytes([qi]) + bytes(int(x) for x in q.reshape(64)[ZIGZAG])
        out += seg(0xDB, body)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    y_hv = 0x22 if sub else 0x11
    for ci in range(nc):
        sof += bytes([ci + 1, y_hv if ci == 0 else 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    tables = [(0, 0, DC_LUMA), (1, 0, AC_LUMA)]
    if not gray:
        tables += [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(wtr.buf)
    out += b"\xff\xd9"
    return out


# ---------------------------------------------------------------------------
# progressive encoder (4:4:4, Annex K tables, spectral selection +
# successive approximation — exercises every T.81 Annex G scan kind)
# ---------------------------------------------------------------------------

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex K
# sequential tables do not define, so the progressive encoder ships its
# own table: every (run, size) symbol for run 0..15, size 0..10 at a
# flat 8-bit code length — 176 codes in a 256-slot space satisfies the
# Kraft inequality, making this a valid (if uncompressed-ish) canonical
# Huffman table. A fixture encoder optimizes for coverage, not ratio.
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _emit_eobrun(w: _BitWriter, ac_tbl, eobrun: int, be: list[int]) -> int:
    """Flush a pending EOB run plus its buffered correction bits."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, length = ac_tbl[r << 4]
        w.write(code, length)
        if r:
            w.write(eobrun - (1 << r), r)
        for b in be:
            w.write(b, 1)
        be.clear()
    return 0


def _encode_ac_first(w, ac_tbl, blocks_zz, ss, se, al):
    """AC first pass over one component's zigzag blocks (row-major)."""
    eobrun = 0
    be: list[int] = []  # unused in first pass; shared signature
    for zz in blocks_zz:
        run = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            a = abs(t) >> al
            if a == 0:
                run += 1
                continue
            eobrun = _emit_eobrun(w, ac_tbl, eobrun, be)
            while run > 15:
                code, length = ac_tbl[0xF0]
                w.write(code, length)
                run -= 16
            s = a.bit_length()
            code, length = ac_tbl[(run << 4) | s]
            w.write(code, length)
            w.write(a if t >= 0 else (a ^ ((1 << s) - 1)), s)
            run = 0
        if run > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(w, ac_tbl, eobrun, be)
    _emit_eobrun(w, ac_tbl, eobrun, be)


def _encode_ac_refine(w, ac_tbl, blocks_zz, ss, se, al):
    """AC refinement pass (T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine):
    newly-significant coefficients as run/1 symbols with sign bits;
    correction bits for already-nonzero history, buffered so they land
    right after the symbol (or EOB run) that precedes them."""
    eobrun = 0
    be: list[int] = []  # correction bits riding on the pending EOB run
    for zz in blocks_zz:
        ab = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob_pos = -1  # index (into band) of last newly-significant coeff
        for i, a in enumerate(ab):
            if a == 1:
                eob_pos = i
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, a in enumerate(ab):
            if a == 0:
                run += 1
                continue
            while run > 15 and i <= eob_pos:
                eobrun = _emit_eobrun(w, ac_tbl, eobrun, be)
                code, length = ac_tbl[0xF0]
                w.write(code, length)
                run -= 16
                for b in br:
                    w.write(b, 1)
                br.clear()
            if a > 1:  # history-nonzero: one correction bit
                br.append(a & 1)
                continue
            # newly significant (a == 1)
            eobrun = _emit_eobrun(w, ac_tbl, eobrun, be)
            code, length = ac_tbl[(run << 4) | 1]
            w.write(code, length)
            w.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br.clear()
            run = 0
        if run > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                eobrun = _emit_eobrun(w, ac_tbl, eobrun, be)
    _emit_eobrun(w, ac_tbl, eobrun, be)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 85,
    dc_al: int = 1,
    ac_al: int = 1,
    band_split: int = 6,
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → progressive (SOF2) JFIF bytes.

    Scan script (covers every Annex G scan kind the decoder handles):
      1. DC, all components interleaved, Al=dc_al
      2. per component: AC band [1, band_split-1], Al=ac_al (first)
      3. per component: AC band [band_split, 63], Al=ac_al (first)
      4. per component: AC refinements of both bands down to Al=0
      5. DC refinements down to Al=0 (1 raw bit/block)

    4:4:4 only — every component shares the full-resolution block grid
    (subsampling belongs to the baseline encoder; progressive here
    exists to prove the decode path, reference parity:
    pennsieve media handling treats progressive JPEG as opaque until
    decode).
    """
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ql = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    qts = [ql] + ([qc] if not gray else [])
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    comps_zz = []
    for pi, pl in enumerate(planes):
        nat = _plane_blocks(_pad_plane(pl, hp, wp), ql if pi == 0 else qc)
        by, bx = nat.shape[0], nat.shape[1]
        zz = nat.reshape(by, bx, 64)[..., ZIGZAG]
        comps_zz.append(zz.reshape(by * bx, 64))
    n_blocks = comps_zz[0].shape[0]

    enc_dc = [_build_encode_table(*DC_LUMA), _build_encode_table(*DC_CHROMA)]
    enc_ac_prog = _build_encode_table(*PROG_AC)  # shared by all comps
    nc = len(planes)
    scans: list[tuple[bytes, bytes]] = []  # (SOS header body, entropy)

    def sos_body(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = (0 if cid == 1 else 1) if ss == 0 else 0
            body += bytes([cid, td << 4])  # Ta = 0: shared PROG_AC
        return body + bytes([ss, se, (ah << 4) | al])

    # 1. DC first scan, interleaved, point transform dc_al
    wtr = _BitWriter()
    preds = [0] * nc
    for bi in range(n_blocks):
        for pi in range(nc):
            v = int(comps_zz[pi][bi][0]) >> dc_al
            diff = v - preds[pi]
            preds[pi] = v
            t = abs(diff).bit_length()
            code, length = enc_dc[0 if pi == 0 else 1][t]
            wtr.write(code, length)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    scans.append((sos_body(list(range(1, nc + 1)), 0, 0, 0, dc_al),
                  bytes(wtr.buf)))

    # 2-3. AC first scans per component, two spectral bands
    bands = [(1, band_split - 1), (band_split, 63)]
    for pi in range(nc):
        for ss, se in bands:
            wtr = _BitWriter()
            _encode_ac_first(wtr, enc_ac_prog, comps_zz[pi], ss, se, ac_al)
            wtr.flush()
            scans.append((sos_body([pi + 1], ss, se, 0, ac_al),
                          bytes(wtr.buf)))
    # 4. AC refinements down to Al=0
    for al in range(ac_al - 1, -1, -1):
        for pi in range(nc):
            for ss, se in bands:
                wtr = _BitWriter()
                _encode_ac_refine(
                    wtr, enc_ac_prog, comps_zz[pi], ss, se, al
                )
                wtr.flush()
                scans.append((sos_body([pi + 1], ss, se, al + 1, al),
                              bytes(wtr.buf)))
    # 5. DC refinements down to Al=0 (raw bits, interleaved)
    for al in range(dc_al - 1, -1, -1):
        wtr = _BitWriter()
        for bi in range(n_blocks):
            for pi in range(nc):
                wtr.write((int(comps_zz[pi][bi][0]) >> al) & 1, 1)
        wtr.flush()
        scans.append((sos_body(list(range(1, nc + 1)), 0, 0, al + 1, al),
                      bytes(wtr.buf)))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qi, q in enumerate(qts):
        out += seg(0xDB, bytes([qi]) + bytes(int(x) for x in q.reshape(64)[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    tables = [(0, 0, DC_LUMA), (1, 0, PROG_AC)]
    if nc > 1:
        tables += [(0, 1, DC_CHROMA)]
    for tc, th, (bits, values) in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))
    for body, entropy in scans:
        out += seg(0xDA, body) + entropy
    out += b"\xff\xd9"
    return out
