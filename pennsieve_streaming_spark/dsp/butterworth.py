"""Butterworth IIR design and application in pure numpy.

Standard textbook derivation (Oppenheim/Schafer; same math as
scipy.signal.butter): analog lowpass prototype poles on the unit
circle, frequency transform (lp/hp/bp/bs) with prewarped edges,
bilinear transform to the z-domain, conjugate-pair pairing into
second-order sections (biquad cascade).

The reference applies an equivalent biquad cascade per sample via the
iirj library (server/TimeSeriesFlow.scala:921-948,
query/TimeSeriesQueryRawHttp.scala:148-180); behavior here is matched
at the transfer-function level (identical |H| to ~1e-12) rather than
by translating that code.

``sosfilt`` keeps per-section state so long channel-spans can stream
through in chunks with state carry-over (the Spark operator feeds one
contiguous (channel, span) per pandas group; see dsp/filtering.py).
"""

from __future__ import annotations

import math

import numpy as np


# --------------------------------------------------------------------------
# design
# --------------------------------------------------------------------------

def _proto_poles(order: int) -> np.ndarray:
    """Analog Butterworth lowpass prototype: poles evenly spaced on the
    left-half unit circle, |H(jw)|^2 = 1/(1+w^(2n))."""
    k = np.arange(order)
    return np.exp(1j * np.pi * (2 * k + order + 1) / (2 * order))


def _bilinear(z: np.ndarray, p: np.ndarray, k: float, fs: float):
    fs2 = 2.0 * fs
    zd = (fs2 + z) / (fs2 - z)
    pd = (fs2 + p) / (fs2 - p)
    kd = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    # zeros at Nyquist (-1) complete the degree
    zd = np.append(zd, -np.ones(len(pd) - len(zd)))
    return zd, pd, kd


def _lp2lp(p: np.ndarray, wo: float):
    return np.array([]), p * wo, wo ** len(p)


def _lp2hp(p: np.ndarray, wo: float):
    pd = wo / p
    # gain: k * real(prod(-p)) ; butterworth prototype prod(-p) == 1
    kd = np.real(np.prod(-p))
    zd = np.zeros(len(p))
    return zd, pd, kd


def _lp2bp(p: np.ndarray, wo: float, bw: float):
    pl = p * (bw / 2)
    pd = np.concatenate(
        [pl + np.sqrt(pl**2 - wo**2), pl - np.sqrt(pl**2 - wo**2)]
    )
    zd = np.zeros(len(p))
    kd = bw ** len(p)
    return zd, pd, kd


def _lp2bs(p: np.ndarray, wo: float, bw: float):
    hl = (bw / 2) / p
    pd = np.concatenate(
        [hl + np.sqrt(hl**2 - wo**2), hl - np.sqrt(hl**2 - wo**2)]
    )
    zd = np.concatenate(
        [1j * wo * np.ones(len(p)), -1j * wo * np.ones(len(p))]
    )
    kd = np.real(np.prod(-p))  # == 1 for butterworth prototype
    return zd, pd, kd


def _pair_conjugates(roots: np.ndarray) -> list[np.ndarray]:
    """Group roots into conjugate pairs (plus possibly one real
    singleton / real pair), for biquad construction."""
    tol = 1e-9
    cplx = sorted(
        [r for r in roots if r.imag > tol], key=lambda r: (r.real, r.imag)
    )
    reals = sorted([r.real for r in roots if abs(r.imag) <= tol])
    groups: list[np.ndarray] = [np.array([c, np.conj(c)]) for c in cplx]
    while len(reals) >= 2:
        groups.append(np.array([reals.pop(0), reals.pop(-1)]))
    if reals:
        groups.append(np.array([reals.pop()]))
    return groups


def _poly(roots: np.ndarray) -> np.ndarray:
    c = np.atleast_1d(np.poly(roots)) if len(roots) else np.array([1.0])
    return np.real(c)


def butter_sos(
    order: int,
    freq: float,
    fs: float,
    btype: str = "lowpass",
    width: float | None = None,
) -> np.ndarray:
    """Design a digital Butterworth filter, returned as second-order
    sections, shape (n_sections, 6) rows [b0 b1 b2 a0 a1 a2].

    btype: lowpass | highpass | bandpass | bandstop. For band filters,
    ``freq`` is the center frequency and ``width`` the band width in Hz
    (the reference FilterRequest parameter convention: [order, freq,
    width?] — server/TSJsonSupport.scala + TimeSeriesFlow.scala:921-948).
    """
    if order < 1:
        raise ValueError("order must be >= 1")
    nyq = fs / 2
    p = _proto_poles(order)
    warp = lambda f: 2 * fs * math.tan(math.pi * f / fs)  # noqa: E731

    if btype in ("lowpass", "highpass"):
        if not 0 < freq < nyq:
            raise ValueError(f"cutoff {freq} outside (0, {nyq})")
        wo = warp(freq)
        z, pa, k = _lp2lp(p, wo) if btype == "lowpass" else _lp2hp(p, wo)
    elif btype in ("bandpass", "bandstop"):
        if width is None:
            raise ValueError("band filters need a width")
        f1, f2 = freq - width / 2, freq + width / 2
        if not 0 < f1 < f2 < nyq:
            raise ValueError(f"band [{f1},{f2}] outside (0, {nyq})")
        w1, w2 = warp(f1), warp(f2)
        wo, bw = math.sqrt(w1 * w2), w2 - w1
        z, pa, k = _lp2bp(p, wo, bw) if btype == "bandpass" else _lp2bs(p, wo, bw)
    else:
        raise ValueError(f"unknown btype {btype}")

    zd, pd, kd = _bilinear(z, pa, k, fs)
    zgroups = _pair_conjugates(zd)
    pgroups = _pair_conjugates(pd)
    # pair zero-groups with pole-groups; butterworth zeros are uniform so
    # ordering does not affect the overall transfer function
    sections = []
    for i, pg in enumerate(pgroups):
        zg = zgroups[i] if i < len(zgroups) else np.array([])
        b = _poly(zg)
        a = _poly(pg)
        b = np.pad(b, (0, 3 - len(b)))
        a = np.pad(a, (0, 3 - len(a)))
        sections.append(np.concatenate([b, a]))
    sos = np.array(sections)
    sos[0, :3] *= kd
    return sos


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------

try:  # scipy absent in this image; real clusters get the C kernel
    from scipy.signal import sosfilt as _scipy_sosfilt
except ImportError:  # pragma: no cover - environment-dependent
    _scipy_sosfilt = None


def sosfilt(
    sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Direct-form-II-transposed biquad cascade with explicit state.

    Returns (y, zf) where zf (shape (n_sections, 2)) can seed the next
    chunk of the same contiguous stream. Dispatches to scipy's C kernel
    when available (same DF2T recurrence, same state convention); the
    pure-python fallback is exact but slower — acceptable at the
    reference's 100k-samples-per-query limit.
    """
    n_sections = sos.shape[0]
    if _scipy_sosfilt is not None:
        z = np.zeros((n_sections, 2)) if zi is None else np.asarray(zi, dtype=float)
        y, zf = _scipy_sosfilt(sos, np.asarray(x, dtype=float), zi=z)
        return y, zf
    if zi is None:
        zi = np.zeros((n_sections, 2))
    z = zi.astype(float).copy()
    y = np.asarray(x, dtype=float).copy()
    for s in range(n_sections):
        b0, b1, b2, a0, a1, a2 = sos[s]
        b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
        z0, z1 = z[s, 0], z[s, 1]
        out = np.empty_like(y)
        for i in range(len(y)):
            xn = y[i]
            yn = b0 * xn + z0
            z0 = b1 * xn - a1 * yn + z1
            z1 = b2 * xn - a2 * yn
            out[i] = yn
        z[s, 0], z[s, 1] = z0, z1
        y = out
    return y, z


def sosfilt_lanes(
    sos: np.ndarray, X: np.ndarray, zi: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """``sosfilt`` across L independent lanes at once: X has shape
    (L, N); lane i is filtered exactly as ``sosfilt(sos, X[i])``
    (elementwise IEEE ops → bit-identical per lane), but the Python
    interpreter cost of the per-sample loop is amortized over all
    lanes (~4× per core at L=64, more at higher L). State zi/zf shape
    (L, n_sections, 2). Dispatches to scipy along axis -1 when present.
    """
    X = np.asarray(X, dtype=float)
    L, _n = X.shape
    n_sections = sos.shape[0]
    if zi is None:
        zi = np.zeros((L, n_sections, 2))
    if _scipy_sosfilt is not None:
        # scipy wants state shaped (n_sections, L, 2) for axis=-1
        z = np.ascontiguousarray(np.swapaxes(zi, 0, 1))
        y, zf = _scipy_sosfilt(sos, X, axis=-1, zi=z)
        return y, np.swapaxes(zf, 0, 1)
    z = zi.astype(float).copy()
    Y = X.copy()
    for s in range(n_sections):
        b0, b1, b2, a0, a1, a2 = sos[s]
        b0, b1, b2, a1, a2 = b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0
        z0 = z[:, s, 0].copy()
        z1 = z[:, s, 1].copy()
        out = np.empty_like(Y)
        for i in range(Y.shape[1]):
            xn = Y[:, i]
            yn = b0 * xn + z0
            z0 = b1 * xn - a1 * yn + z1
            z1 = b2 * xn - a2 * yn
            out[:, i] = yn
        z[:, s, 0] = z0
        z[:, s, 1] = z1
        Y = out
    return Y, z


def sos_freq_response(sos: np.ndarray, w: np.ndarray) -> np.ndarray:
    """|H(e^{jw})| of the cascade at normalized angular freqs w (rad)."""
    ejw = np.exp(-1j * w)
    h = np.ones_like(w, dtype=complex)
    for b0, b1, b2, a0, a1, a2 in sos:
        h *= (b0 + b1 * ejw + b2 * ejw**2) / (a0 + a1 * ejw + a2 * ejw**2)
    return np.abs(h)


# --------------------------------------------------------------------------
# reference prewarm semantics (G3)
# --------------------------------------------------------------------------

def filter_transient_length(order: int, cutoff_freq: float, rate: float) -> int:
    """ceil((rate/cutoff) * 8 * (1 + (order-1)*0.5)) — the reference's
    conservative edge-transient estimate
    (query/TimeSeriesQueryRawHttp.scala:201-218)."""
    cycles = rate / cutoff_freq
    return int(math.ceil(cycles * 8.0 * (1.0 + (order - 1) * 0.5)))


def reflected_prewarm(x: np.ndarray, required: int) -> np.ndarray:
    """Reflected prewarm vector fed through the filter (output
    discarded) before the real data — reproduces the reference's
    createReflectedPrewarmVector / createReflectedWithPadding casework
    (query/TimeSeriesQueryRawHttp.scala:252-313)."""
    n = len(x)
    if n == 0:
        return np.zeros(required)
    if n == 1:
        return np.full(required, x[0])
    if n >= required:
        return x[:required][::-1].copy()
    reflected = x[::-1]
    if n >= required / 2:
        combined = np.concatenate([reflected, x])
        if len(combined) >= required:
            return combined[:required]
        pad = np.full(required - len(combined), x[0])
        return np.concatenate([pad, combined[: required - len(pad)]])
    pattern = np.concatenate([reflected, x])
    reps = required // len(pattern) + 1
    return np.tile(pattern, reps)[:required]
