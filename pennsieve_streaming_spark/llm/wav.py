"""Pure-numpy WAV (RIFF/PCM) codec — the audio leg of the multimodal
decode path.

The container has no soundfile/ffmpeg, but WAV PCM is a trivial public
format (RIFF container, ``fmt `` + ``data`` chunks — Microsoft/IBM
RIFF spec, 1991), so like PNG (llm/png.py) the decode is implemented
natively: byte parsing + ``np.frombuffer`` — vectorized, no
per-sample Python. Supported: PCM (format 1) 8-bit unsigned / 16-bit
/ 32-bit signed little-endian, any channel count; G.711 µ-law/A-law
(formats 7/6); IMA/DVI ADPCM (format 0x11, mono) — 4-bit compressed
audio with independently-decodable blocks. Anything else raises
``WavError`` and the multimodal layer falls back to its stub.

``audio_features`` produces the fixed 16-d summary vector the
multimodal pipeline stores per clip; every element is a deterministic
function of the decoded samples (no RNG), so features are reproducible
across runs and partitionings.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode (n,) or (n, ch) samples to PCM WAV bytes.

    Integer input is taken as raw PCM codes; float input must be in
    [-1, 1] and is scaled to the target width.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if np.issubdtype(arr.dtype, np.floating):
        full = float(2 ** (bits - 1) - 1)
        arr = np.round(arr * full)
    if bits == 8:
        pcm = (arr + 128).astype("<u1") if arr.min() < 0 else arr.astype("<u1")
        raw = pcm.astype("<u1").tobytes()
    elif bits == 16:
        raw = arr.astype("<i2").tobytes()
    elif bits == 32:
        raw = arr.astype("<i4").tobytes()
    else:
        raise WavError(f"unsupported bit width {bits}")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, int(rate), int(rate) * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes → (samples float64 in [-1, 1] shaped
    (n, ch), sample_rate). Chunk walk tolerates extra chunks (LIST,
    fact, ...) and odd-size padding per the RIFF spec."""
    if not is_wav(data):
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    raw = None
    fact_samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise WavError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise WavError("missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block, bits = fmt
    if audio_format == 6:  # G.711 A-law
        arr = _alaw_decode(np.frombuffer(raw, dtype=np.uint8))
        n = len(arr) // ch
        return arr[: n * ch].reshape(n, ch), rate
    if audio_format == 7:  # G.711 µ-law
        arr = _mulaw_decode(np.frombuffer(raw, dtype=np.uint8))
        n = len(arr) // ch
        return arr[: n * ch].reshape(n, ch), rate
    if audio_format == 0x11:  # IMA/DVI ADPCM
        if ch != 1:
            raise WavError("IMA ADPCM: mono only in this codec")
        block_align = _block if _block else len(raw)
        arr = _ima_adpcm_decode(raw, block_align)
        if fact_samples is not None:
            arr = arr[:fact_samples]  # fact chunk trims tail padding
        return arr.reshape(-1, 1), rate
    if audio_format != 1:
        raise WavError(f"unsupported audio format {audio_format} (PCM only)")
    if bits == 8:
        arr = np.frombuffer(raw, dtype="<u1").astype(np.float64)
        arr = (arr - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise WavError(f"unsupported bit width {bits}")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), rate


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """Fixed ``dim``-length summary vector of a decoded clip:
    [n_samples, n_channels, rate, duration_s, mean, rms, peak, zcr,
    8-bin |amplitude| histogram (fractions)] — truncated/zero-padded
    to ``dim``."""
    n, ch = samples.shape
    mono = samples.mean(axis=1) if ch > 1 else samples[:, 0]
    dur = n / rate if rate else 0.0
    mean = float(mono.mean()) if n else 0.0
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    hist = (
        np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0))[0] / max(n, 1)
        if n
        else np.zeros(8)
    )
    feat = np.array(
        [float(n), float(ch), float(rate), dur, mean, rms, peak, zcr, *hist],
        dtype=np.float64,
    )
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return feat[:dim]


# ---------------------------------------------------------------------------
# G.711 companded telephony codecs (ITU-T G.711, 1972 — public spec)
# ---------------------------------------------------------------------------

def _mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law byte codes → float64 in (-1, 1) (CCITT expansion with the
    16-bit-scale bias 0x84: magnitude = (((mantissa<<3) + 0x84) <<
    exponent) - 0x84, range ±32124, normalized by 32768)."""
    u = (~codes.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    lin = np.where(sign, -mag, mag).astype(np.float64)
    return lin / 32768.0


def _mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float in [-1, 1] → µ-law byte codes (inverse of _mulaw_decode,
    round-trip exact on decoder-representable magnitudes)."""
    lin = np.clip(
        np.round(np.asarray(x, dtype=np.float64) * 32768.0), -32124, 32124
    )
    sign = lin < 0
    mag = np.abs(lin).astype(np.int64) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int64)
    mant = ((mag >> (exp + 3)) & 0x0F).astype(np.int64)
    code = (np.where(sign, 0x80, 0) | (exp << 4) | mant).astype(np.int64)
    return ((~code) & 0xFF).astype(np.uint8)


def _alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law byte codes → float64 in (-1, 1) (even-bit inversion 0x55,
    13-bit range ±32256/32768)."""
    a = codes.astype(np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    lin = np.where(sign, -mag, mag).astype(np.float64)
    return lin / 32768.0


def _alaw_encode(x: np.ndarray) -> np.ndarray:
    """float in [-1, 1] → A-law byte codes (inverse of _alaw_decode)."""
    lin = np.clip(np.round(np.asarray(x, dtype=np.float64) * 32768.0), -32767, 32767)
    sign = lin < 0
    mag = np.abs(lin).astype(np.int64)
    exp = np.where(
        mag < 256, 0, (np.floor(np.log2(np.maximum(mag, 1))) - 7).clip(1, 7)
    ).astype(np.int64)
    mant = np.where(
        exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F
    ).astype(np.int64)
    code = (np.where(sign, 0x80, 0) | (exp << 4) | mant).astype(np.int64)
    return (code ^ 0x55).astype(np.uint8)


def encode_wav_g711(samples: np.ndarray, rate: int, law: str = "mulaw") -> bytes:
    """Encode float samples in [-1, 1] as a G.711 WAV (format 7 µ-law
    or 6 A-law, 8 bits per sample)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    flat = arr.reshape(-1)
    if law == "mulaw":
        raw = _mulaw_encode(flat).tobytes()
        code = 7
    elif law == "alaw":
        raw = _alaw_encode(flat).tobytes()
        code = 6
    else:
        raise WavError(f"unknown companding law {law!r}")
    fmt = struct.pack("<HHIIHH", code, ch, int(rate), int(rate) * ch, ch, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# IMA/DVI ADPCM (WAVE format 0x0011) — the classic 4-bit compressed-
# audio codec (IMA "Recommended Practices for Enhancing Digital Audio
# Compatibility", 1992; public spec, integer-only arithmetic).
# ---------------------------------------------------------------------------

_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step_one(nibble: int, pred: int, idx: int) -> tuple[int, int]:
    """One IMA ADPCM state update (shared by encode and decode)."""
    step = int(_IMA_STEP[idx])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    idx = max(0, min(88, idx + int(_IMA_INDEX[nibble & 7])))
    return pred, idx


def _ima_adpcm_decode(raw: bytes, block_align: int) -> np.ndarray:
    """Mono IMA ADPCM blocks → float64 in [-1, 1]. Each block carries
    its own (predictor, step-index) header, so blocks decode
    independently — the property that lets a 100 TB audio corpus
    shard mid-file."""
    if block_align < 4:
        raise WavError("IMA ADPCM block_align must be >= 4")
    out: list[np.ndarray] = []
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        if len(block) < 4:
            break
        pred = int(np.frombuffer(block[:2], dtype="<i2")[0])
        idx = block[2]
        if idx > 88:
            raise WavError("IMA ADPCM corrupt step index")
        data = np.frombuffer(block[4:], dtype=np.uint8)
        nibbles = np.empty(2 * len(data), dtype=np.uint8)
        nibbles[0::2] = data & 0x0F  # low nibble first
        nibbles[1::2] = data >> 4
        samples = np.empty(1 + len(nibbles), dtype=np.int64)
        samples[0] = pred
        for i, n in enumerate(nibbles):
            pred, idx = _ima_step_one(int(n), pred, idx)
            samples[1 + i] = pred
        out.append(samples)
    if not out:
        raise WavError("IMA ADPCM: no complete block")
    return np.concatenate(out).astype(np.float64) / 32768.0


def encode_wav_adpcm(
    samples: np.ndarray, rate: int, samples_per_block: int = 505
) -> bytes:
    """Encode mono float samples in [-1, 1] as an IMA ADPCM WAV
    (format 0x0011) — the compressed-audio fixture generator for the
    multimodal decode path. ``samples_per_block`` must be odd (header
    sample + 2 nibbles per data byte)."""
    if samples_per_block < 1 or samples_per_block % 2 == 0:
        raise WavError("samples_per_block must be odd")
    x = np.clip(np.asarray(samples, dtype=np.float64).reshape(-1), -1, 1)
    pcm = np.round(x * 32767.0).astype(np.int64)
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    idx = 0
    pos = 0
    n = len(pcm)
    while pos < n:
        chunk = pcm[pos : pos + samples_per_block]
        pred = int(chunk[0])
        blocks += struct.pack("<hBB", pred, idx, 0)
        data = bytearray()
        lo = None
        for s in chunk[1:]:
            delta = int(s) - pred
            nib = 0
            if delta < 0:
                nib = 8
                delta = -delta
            step = int(_IMA_STEP[idx])
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            pred, idx = _ima_step_one(nib, pred, idx)
            if lo is None:
                lo = nib
            else:
                data.append(lo | (nib << 4))
                lo = None
        if lo is not None:
            data.append(lo)
        data += bytes((block_align - 4) - len(data))  # pad short tail
        blocks += bytes(data)
        pos += samples_per_block
    byte_rate = rate * block_align // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(pcm))
    body += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(body)) + body
