"""WAV codec round-trips + Spark e2e through the multimodal decode."""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.llm import wav
from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
)


def _tone(n=1600, rate=16000, freq=440.0, ch=1):
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([x] * ch, axis=1) if ch > 1 else x


def test_roundtrip_16bit_mono():
    x = _tone()
    data = wav.encode_wav(x, 16000, bits=16)
    assert wav.is_wav(data)
    y, rate = wav.decode_wav(data)
    assert rate == 16000 and y.shape == (1600, 1)
    assert np.max(np.abs(y[:, 0] - x)) < 1.0 / 32767 + 1e-9


def test_roundtrip_stereo_and_8bit():
    x = _tone(ch=2)
    y, _ = wav.decode_wav(wav.encode_wav(x, 8000, bits=16))
    assert y.shape == (1600, 2)
    y8, _ = wav.decode_wav(wav.encode_wav(_tone(), 8000, bits=8))
    assert np.max(np.abs(y8[:, 0] - _tone())) < 1.0 / 127 + 1e-9


def test_roundtrip_32bit():
    x = _tone()
    y, _ = wav.decode_wav(wav.encode_wav(x, 44100, bits=32))
    assert np.max(np.abs(y[:, 0] - x)) < 1e-8


def test_extra_chunks_tolerated():
    raw = wav.encode_wav(_tone(), 16000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"  # padded
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    y, rate = wav.decode_wav(spliced)
    assert rate == 16000 and y.shape == (1600, 1)


def test_rejects_non_pcm_and_garbage():
    with pytest.raises(wav.WavError):
        wav.decode_wav(b"not a wav at all....")
    raw = bytearray(wav.encode_wav(_tone(), 16000))
    raw[20] = 3  # audio_format = IEEE float (unsupported)
    with pytest.raises(wav.WavError):
        wav.decode_wav(bytes(raw))


def test_audio_features_golden():
    x = np.zeros(100)
    x[50] = 1.0
    f = wav.audio_features(x[:, None], 100, FEATURE_DIM)
    assert f[0] == 100 and f[1] == 1 and f[2] == 100 and f[3] == 1.0
    assert f[6] == 1.0  # peak
    assert len(f) == FEATURE_DIM


def test_spark_real_wav_decode(spark):
    payload = wav.encode_wav(_tone(), 16000)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), None)],
        "media_id long, kind string, payload binary, meta string",
    ).drop("meta")
    [row] = extract_features(media).collect()
    samples, rate = wav.decode_wav(payload)
    want = wav.audio_features(samples, rate, FEATURE_DIM)
    assert row.feature == pytest.approx(list(want))
    # clearly real, not the hash-seeded stub: feature[0] is the length
    assert row.feature[0] == 1600.0


def test_ima_adpcm_roundtrip():
    """IMA ADPCM (format 0x11): 4:1 compressed encode -> decode must
    track the source within the codec's known quality envelope, trim
    the tail padding via the fact chunk, and decode deterministically."""
    t = np.arange(8000) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1337 * t)
    data = wav.encode_wav_adpcm(sig, 8000)
    dec, rate = wav.decode_wav(data)
    assert rate == 8000
    assert dec.shape == (8000, 1)  # fact chunk trims block padding
    err = dec[:, 0] - sig
    snr = 10 * np.log10(np.mean(sig**2) / np.mean(err**2))
    assert snr > 20.0  # typical IMA ADPCM on tonal content
    assert len(data) < len(sig)  # genuinely compressed (4 bits/sample)
    assert np.array_equal(wav.decode_wav(data)[0], dec)


def test_ima_adpcm_block_independence():
    """Each block carries its own predictor/step header: decoding a
    stream with the first block removed must equal the tail of the
    full decode — the shardability property."""
    rng = np.random.default_rng(3)
    sig = np.clip(rng.normal(0, 0.2, 2021), -1, 1)
    spb = 505
    data = wav.encode_wav_adpcm(sig, 16000, samples_per_block=spb)
    full, _ = wav.decode_wav(data)
    # hand-trim: drop the first data block (fact must be dropped too)
    import struct as _s
    block_align = 4 + (spb - 1) // 2
    i = data.find(b"data")
    (dsize,) = _s.unpack_from("<I", data, i + 4)
    body = data[i + 8 : i + 8 + dsize]
    tail_first = body[block_align : 2 * block_align]
    # block 2 of the full stream decodes standalone to the same
    # samples the full decode produced for that span
    one = wav._ima_adpcm_decode(bytes(tail_first), block_align)
    assert np.array_equal(one, full[spb : spb + len(one), 0])


def test_spark_adpcm_decode(spark):
    payload = wav.encode_wav_adpcm(_tone(), 16000)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), None)],
        "media_id long, kind string, payload binary, meta string",
    ).drop("meta")
    [row] = extract_features(media).collect()
    samples, rate = wav.decode_wav(payload)
    want = wav.audio_features(samples, rate, FEATURE_DIM)
    assert row.feature == pytest.approx(list(want))
    assert row.feature[0] == 1600.0  # real decode, not the stub
