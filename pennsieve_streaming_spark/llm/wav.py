"""Pure-numpy WAV (RIFF/PCM) codec — the audio leg of the multimodal
decode path.

The container has no soundfile/ffmpeg, but WAV PCM is a trivial public
format (RIFF container, ``fmt `` + ``data`` chunks — Microsoft/IBM
RIFF spec, 1991), so like PNG (llm/png.py) the decode is implemented
natively: byte parsing + ``np.frombuffer`` — vectorized, no
per-sample Python. Supported: PCM (format 1) 8-bit unsigned / 16-bit
/ 32-bit signed little-endian, any channel count; anything else raises
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
