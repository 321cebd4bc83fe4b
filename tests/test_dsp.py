"""Butterworth design + filtering operator tests.

The design is validated against Butterworth's defining analytic
properties (|H(jw)|^2 = 1/(1+(w/wc)^2n)): unit DC gain, -3 dB at the
cutoff, monotonic rolloff — the same invariants any correct
implementation (scipy, iirj) satisfies.
"""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.dsp import (
    FilterSpec,
    apply_filter,
    butter_sos,
    filter_transient_length,
    reflected_prewarm,
    sos_freq_response,
    sosfilt,
)
from pennsieve_streaming_spark.dsp.filtering import _filter_run


def digital_butter_expected(f, fc, fs, order):
    """Analytic |H| of a bilinear-transform butterworth lowpass: the
    prewarped analog response evaluated at the warped frequency."""
    wa = np.tan(np.pi * f / fs)
    wc = np.tan(np.pi * fc / fs)
    return 1.0 / np.sqrt(1.0 + (wa / wc) ** (2 * order))


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
def test_lowpass_matches_analytic_response(order):
    fs, fc = 250.0, 30.0
    sos = butter_sos(order, fc, fs, "lowpass")
    f = np.linspace(1.0, 124.0, 200)
    got = sos_freq_response(sos, 2 * np.pi * f / fs)
    want = digital_butter_expected(f, fc, fs, order)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_lowpass_minus_3db_at_cutoff():
    sos = butter_sos(4, 30.0, 250.0, "lowpass")
    h = sos_freq_response(sos, np.array([2 * np.pi * 30.0 / 250.0]))
    np.testing.assert_allclose(h, [1 / np.sqrt(2)], atol=1e-9)


def test_highpass_response():
    fs, fc, order = 250.0, 30.0, 3
    sos = butter_sos(order, fc, fs, "highpass")
    f = np.linspace(1.0, 124.0, 100)
    got = sos_freq_response(sos, 2 * np.pi * f / fs)
    wa = np.tan(np.pi * f / fs)
    wc = np.tan(np.pi * fc / fs)
    want = (wa / wc) ** order / np.sqrt(1 + (wa / wc) ** (2 * order))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_bandstop_notch_and_bandpass_peak():
    fs = 250.0
    bs = butter_sos(4, 60.0, fs, "bandstop", width=10.0)
    bp = butter_sos(4, 60.0, fs, "bandpass", width=10.0)
    w60 = np.array([2 * np.pi * 60.0 / fs])
    wfar = np.array([2 * np.pi * 10.0 / fs])
    assert sos_freq_response(bs, w60)[0] < 1e-3
    assert abs(sos_freq_response(bs, wfar)[0] - 1.0) < 0.01
    assert abs(sos_freq_response(bp, w60)[0] - 1.0) < 0.01
    assert sos_freq_response(bp, wfar)[0] < 1e-3


def test_sosfilt_state_continuity():
    """Chunked filtering with carried state == one-shot filtering."""
    sos = butter_sos(4, 30.0, 250.0, "lowpass")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(500)
    whole, _ = sosfilt(sos, x)
    y1, z = sosfilt(sos, x[:200])
    y2, _ = sosfilt(sos, x[200:], zi=z)
    np.testing.assert_allclose(np.concatenate([y1, y2]), whole, atol=1e-12)


def _band_amplitude(x, fs, f):
    """Single-bin DFT amplitude at frequency f."""
    t = np.arange(len(x)) / fs
    return 2 * abs(np.mean(x * np.exp(-2j * np.pi * f * t)))


def test_sosfilt_removes_high_freq():
    fs = 250.0
    t = np.arange(2000) / fs
    lo = np.sin(2 * np.pi * 5 * t)
    hi = 0.5 * np.sin(2 * np.pi * 80 * t)
    sos = butter_sos(4, 30.0, fs, "lowpass")
    y, _ = sosfilt(sos, lo + hi)
    tail = y[500:]
    # 5 Hz passes (possibly phase-shifted), 80 Hz crushed
    assert abs(_band_amplitude(tail, fs, 5.0) - 1.0) < 0.02
    assert _band_amplitude(tail, fs, 80.0) < 0.01


def test_transient_length_formula():
    # ceil((rate/cutoff) * 8 * (1 + (order-1)*0.5))
    assert filter_transient_length(1, 30.0, 250.0) == int(np.ceil(250 / 30 * 8))
    assert filter_transient_length(4, 30.0, 250.0) == int(
        np.ceil(250 / 30 * 8 * 2.5)
    )


def test_reflected_prewarm_casework():
    x = np.arange(10.0)
    # plenty of data: first N reversed
    np.testing.assert_array_equal(reflected_prewarm(x, 4), [3.0, 2.0, 1.0, 0.0])
    # single value: repeat
    np.testing.assert_array_equal(reflected_prewarm(np.array([7.0]), 3), [7.0] * 3)
    # len >= required/2: reflected ++ original, truncated
    got = reflected_prewarm(np.arange(3.0), 5)
    np.testing.assert_array_equal(got, [2.0, 1.0, 0.0, 0.0, 1.0])
    # very short: tiled pattern
    got = reflected_prewarm(np.arange(2.0), 7)
    np.testing.assert_array_equal(got, [1.0, 0.0, 0.0, 1.0, 1.0, 0.0, 0.0])
    # empty: zeros
    np.testing.assert_array_equal(reflected_prewarm(np.array([]), 2), [0.0, 0.0])


def test_apply_filter_spark(spark):
    """End-to-end: lowpass on two channels; verify high-freq removal
    and reset-on-gap behavior (independent runs)."""
    fs = 250.0
    n = 1000
    t = np.arange(n) / fs
    lo = np.sin(2 * np.pi * 5 * t)
    hi = 0.5 * np.sin(2 * np.pi * 80 * t)
    period = int(1e6 / fs)
    rows = []
    for ch in ("a", "b"):
        # two contiguous runs separated by a huge gap -> filter resets
        for run_start, offset in ((0, 0), (10**9, n)):
            for i in range(n):
                rows.append(
                    (ch, run_start + i * period, float(lo[i] + hi[i]))
                )
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    spec = FilterSpec("lowpass", 4, 30.0)
    out = apply_filter(df, spec, fs).toPandas()
    assert len(out) == len(rows)
    for ch in ("a", "b"):
        for run_start in (0, 10**9):
            seg = out[(out.channel == ch) & (out.ts >= run_start)].sort_values("ts")
            vals = seg["value"].to_numpy()[:n][300:]
            assert abs(_band_amplitude(vals, fs, 5.0) - 1.0) < 0.05, (ch, run_start)
            assert _band_amplitude(vals, fs, 80.0) < 0.01, (ch, run_start)


def test_apply_filter_chunked_bit_identical(spark):
    """The streaming mapInPandas path (state carried across small Arrow
    batches, prewarm buffered at run starts) must equal one-shot
    _filter_run per contiguous run BIT-FOR-BIT — including a run
    shorter than the prewarm pad and a mid-stream reset."""
    fs = 250.0
    spec = FilterSpec("lowpass", 4, 30.0)
    sos = butter_sos(spec.order, spec.freq, fs, spec.btype)
    pad = filter_transient_length(spec.order, spec.max_freq, fs)
    period = int(1e6 / fs)
    rng = np.random.default_rng(11)
    runs = {
        # (channel, run_start) -> values; run lengths straddle pad=167
        ("a", 0): rng.standard_normal(1000),
        ("a", 10**10): rng.standard_normal(60),      # shorter than pad
        ("b", 5 * 10**9): rng.standard_normal(500),
    }
    rows = [
        (ch, start + i * period, float(v))
        for (ch, start), vals in runs.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        out = apply_filter(df, spec, fs).toPandas()
    finally:
        if old_batch is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)

    assert len(out) == len(rows)
    for (ch, start), vals in runs.items():
        seg = out[(out.channel == ch) & (out.ts >= start)
                  & (out.ts < start + len(vals) * period)].sort_values("ts")
        want = _filter_run(np.asarray(vals), sos, pad)
        got = seg["value"].to_numpy()
        assert np.array_equal(got, want), (ch, start, np.abs(got - want).max())


def test_apply_filter_bulk_bit_identical(spark):
    """Lane-vectorized bulk filter == streaming apply_filter, bit for
    bit, across many channels with gaps and unequal run lengths."""
    from pennsieve_streaming_spark.dsp.filtering import apply_filter_bulk

    fs = 250.0
    spec = FilterSpec("highpass", 3, 20.0)
    period = int(1e6 / fs)
    rng = np.random.default_rng(5)
    rows = []
    for c in range(17):
        t = 0
        for run_len in (40, 300, 170):  # gaps between runs, mixed sizes
            for i in range(run_len):
                rows.append((f"e{c}", t + i * period, float(rng.standard_normal())))
            t += run_len * period + 10**9
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    a = {(r["channel"], r["ts"]): r["value"]
         for r in apply_filter(df, spec, fs).collect()}
    b = {(r["channel"], r["ts"]): r["value"]
         for r in apply_filter_bulk(df, spec, fs, n_groups=4).collect()}
    assert a == b and len(a) == len(rows)


def test_sosfilt_lanes_matches_scalar():
    from pennsieve_streaming_spark.dsp.butterworth import sosfilt_lanes

    sos = butter_sos(4, 30.0, 250.0, "lowpass")
    rng = np.random.default_rng(9)
    X = rng.standard_normal((7, 400))
    YL, zf = sosfilt_lanes(sos, X)
    for i in range(7):
        y, z = sosfilt(sos, X[i])
        assert np.array_equal(YL[i], y)
        assert np.array_equal(zf[i], z)
    # state carry across chunks, lane-wise
    Y1, z1 = sosfilt_lanes(sos, X[:, :150])
    Y2, _ = sosfilt_lanes(sos, X[:, 150:], zi=z1)
    assert np.array_equal(np.hstack([Y1, Y2]), YL)


def test_reference_bandstop_golden_vector():
    """The reference pins iirj's bandstop output on real 250 Hz data to
    16 digits (src/test/scala/com/pennsieve/streaming/FilterSpec.scala:52-65,
    notch order 4 at 50 Hz, width 3, zero initial state, no prewarm).
    The pure-numpy design must reproduce it to machine precision."""
    import os

    src = "/root/reference/src/test/resources/combined.txt"
    if not os.path.exists(src):
        pytest.skip("reference fixture not available")
    data = np.array([float(line) for line in open(src)])
    golden = [
        0.0, 1.087161635562614, 0.9029426242294433, 0.20389260356351335,
        0.21682008432239974, 0.9644012648863328, 1.4729224362016369,
        1.2208633250496284, 0.6931728654057703, 0.5172583945876954,
    ]
    sos = butter_sos(4, 50.0, 250.0, "bandstop", width=3.0)
    out, _ = sosfilt(sos, data[: len(golden)])
    np.testing.assert_allclose(out, golden, rtol=0, atol=3e-15)


def test_ewma_golden(spark):
    from pennsieve_streaming_spark.dsp.filtering import ewma_filter

    rows = [("a", 0, 8.0), ("a", 1, 0.0), ("a", 2, 16.0)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {r.ts: r.ewma for r in ewma_filter(df, 0.5).collect()}
    # y0 = 8; y1 = .5*0 + .5*8 = 4; y2 = .5*16 + .5*4 = 10
    assert got == {0: 8.0, 1: 4.0, 2: 10.0}


def test_ewma_channels_independent_and_partitioning_invariant(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.filtering import ewma_filter

    rng = np.random.default_rng(2)
    rows = [
        (ch, t, float(v))
        for ch in ("a", "b")
        for t, v in enumerate(rng.uniform(-3, 3, 500))
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    one = sorted(map(tuple, ewma_filter(df.coalesce(1), 0.125).collect()))
    many = sorted(map(tuple, ewma_filter(df.repartition(13), 0.125).collect()))
    assert one == many
    # python replay
    a, b = 0.125, 0.875
    xs = [v for ch, t, v in rows if ch == "a"]
    y = xs[0]
    for i in range(1, len(xs)):
        y = a * xs[i] + b * y
    last = [r for r in one if r[0] == "a"][-1]
    assert last[3] == y


def test_band_power_detects_tone(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import band_power

    # 10 Hz tone at 1 kHz: power concentrates at the 10 Hz bin
    n = 1000
    t = np.arange(n) / 1000.0
    x = np.sin(2 * np.pi * 10.0 * t)
    rows = [("a", i * 1000, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    # 4/10/20 Hz are all integer DFT bins of a 500-sample window at
    # 1 kHz (bin spacing 2 Hz) — off-bin frequencies would leak
    got = {
        (r.win, r.freq_hz): r.power
        for r in band_power(df, (4.0, 10.0, 20.0), 1000.0, 500).collect()
    }
    for win in (0, 1):
        assert got[(win, 10.0)] > 100 * got[(win, 4.0)]
        assert got[(win, 10.0)] > 100 * got[(win, 20.0)]


def test_band_power_matches_fft_bin(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import band_power

    rng = np.random.default_rng(3)
    n = 500
    x = rng.standard_normal(n)
    rows = [("a", i * 1000, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    # 10 Hz at fs=1000 over 500 samples = FFT bin k=5 exactly
    [r] = band_power(df, (10.0,), 1000.0, 500).collect()
    fft_power = np.abs(np.fft.rfft(x)[5]) ** 2
    assert r.power == pytest.approx(fft_power, rel=1e-9)


def test_band_power_ragged_tail_dropped(spark):
    from pennsieve_streaming_spark.dsp.spectral import band_power

    rows = [("a", i, float(i % 7)) for i in range(120)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = band_power(df, (10.0,), 1000.0, 50).collect()
    assert sorted(r.win for r in out) == [0, 1]  # 20-row tail dropped


# ------------------------------------------------------------ power spectrum


def test_power_spectrum_matches_numpy_dft(spark):
    """Direct-form DFT power vs numpy.fft on the same window: equal to
    quantization tolerance; ragged tail dropped; pure-codegen plan."""
    import math

    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import power_spectrum

    ws, nb = 32, 4
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(ws * 2 + 7) * 10).round(3)  # 2 full + ragged
    rows = [("c", i * 1000, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = power_spectrum(df, n_bins=nb, window_samples=ws, quant=10**6)
    got = {(r.win, r.bin): r.power for r in out.collect()}
    assert len(got) == 2 * nb  # ragged third window dropped
    for win in (0, 1):
        seg = x[win * ws:(win + 1) * ws]
        spec = np.fft.fft(seg)
        for k in range(1, nb + 1):
            want = abs(spec[k]) ** 2
            assert math.isclose(got[(win, k)], want, rel_tol=1e-4), (
                win, k, got[(win, k)], want
            )
    # stays JVM-side: no Python evaluation node in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_power_spectrum_dc_free_constant_signal(spark):
    """Bins 1..B of a constant signal carry zero power (basis rows are
    orthogonal to DC)."""
    from pennsieve_streaming_spark.dsp.spectral import power_spectrum

    rows = [("c", i * 10, 7.5) for i in range(64)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = power_spectrum(df, n_bins=3, window_samples=64, quant=10**6).collect()
    assert len(out) == 3
    for r in out:
        assert r.power < 1e-6
        assert int(r.energy_q2) <= 10**7  # quantization residue only


def test_holt_golden(spark):
    from pennsieve_streaming_spark.dsp.filtering import holt_filter

    rows = [("a", 0, 8.0), ("a", 1, 0.0), ("a", 2, 16.0)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {
        r.ts: (r.level, r.trend, r.forecast)
        for r in holt_filter(df, 0.5, 0.5).collect()
    }
    # l0=8, t0=0
    # l1 = .5*0 + .5*(8+0) = 4;   t1 = .5*(4-8)  + .5*0  = -2
    # l2 = .5*16 + .5*(4-2) = 9;  t2 = .5*(9-4)  + .5*-2 = 1.5
    assert got == {0: (8.0, 0.0, 8.0), 1: (4.0, -2.0, 2.0), 2: (9.0, 1.5, 10.5)}


def test_holt_tracks_linear_drift_exactly_in_steady_state(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.filtering import holt_filter

    # on a pure ramp the converged forecast equals the next value —
    # the property EWMA lacks (it lags a ramp forever)
    rows = [("r", t, float(2 * t)) for t in range(400)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = sorted(
        (r.ts, r.forecast) for r in holt_filter(df, 0.25, 0.125).collect()
    )
    tail = [abs(f - 2 * (t + 1)) for t, f in out[-50:]]
    assert max(tail) < 1e-6


def test_holt_partitioning_invariant_and_matches_python(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.filtering import holt_filter

    rng = np.random.default_rng(5)
    rows = [
        (ch, t, float(v))
        for ch in ("a", "b")
        for t, v in enumerate(rng.uniform(-3, 3, 400))
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    one = sorted(map(tuple, holt_filter(df.coalesce(1), 0.25, 0.125).collect()))
    many = sorted(map(tuple, holt_filter(df.repartition(13), 0.25, 0.125).collect()))
    assert one == many
    a, b, g, d = 0.25, 0.75, 0.125, 0.875
    xs = [v for ch, t, v in rows if ch == "b"]
    lvl, trd = xs[0], 0.0
    for i in range(1, len(xs)):
        l_new = a * xs[i] + b * (lvl + trd)
        trd = g * (l_new - lvl) + d * trd
        lvl = l_new
    last = [r for r in one if r[0] == "b"][-1]
    assert last[3] == lvl and last[4] == trd


def test_holt_anomalies_flags_spike_not_noisy_ramp(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.filtering import holt_anomalies

    # noisy linear ramp with one injected spike: the model absorbs the
    # drift, the MAD envelope absorbs the noise, and only the spike
    # neighborhood flags. (A NOISELESS ramp is the degenerate case:
    # steady-state residuals -> 0 exactly, so MAD ~ 0 and the
    # convergence transient itself flags — correct for a data-derived
    # envelope, which is why the test uses realistic noise.)
    rng = np.random.default_rng(3)
    vals = 2.0 * np.arange(400) + rng.normal(0, 1.0, 400)
    vals[220] = 10_000.0
    rows = [("r", t, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = sorted(
        r.ts for r in holt_anomalies(df, 0.25, 0.125, k=3.0).collect()
    )
    assert 220 in got
    # the spike + its re-convergence tail and the model's startup
    # transient may flag; the ramp body is quiet (few flags elsewhere,
    # bounded overall rate)
    body = [t for t in got if t >= 20 and not 210 <= t <= 280]
    assert len(body) <= 8 and len(got) < 100


def test_audio_fingerprint_level_invariant_and_discriminative(spark):
    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import audio_fingerprint

    rng = np.random.default_rng(12)
    n = 800
    sig = (
        np.sin(2 * np.pi * 40 * np.arange(n) / 1000.0)
        + 0.5 * np.sin(2 * np.pi * 160 * np.arange(n) / 1000.0)
        + 0.1 * rng.normal(0, 1, n)
    )
    freqs = (20.0, 40.0, 60.0, 80.0, 120.0, 160.0, 240.0, 320.0, 400.0)

    def fp_of(x):
        df = spark.createDataFrame(
            [("a", t * 1000, float(v)) for t, v in enumerate(x)],
            "channel string, ts long, value double",
        )
        return {
            r.win: r.fp
            for r in audio_fingerprint(df, freqs, 1000.0, 100).collect()
        }

    base = fp_of(sig)
    assert len(base) == 7 and all(0 <= v < (1 << 8) for v in base.values())
    # volume change: energies scale uniformly, every sign bit survives
    assert fp_of(2.5 * sig) == base
    # a genuinely different signal lands far away in hamming
    other = fp_of(
        np.sin(2 * np.pi * 320 * np.arange(n) / 1000.0)
        + 0.1 * rng.normal(0, 1, n)
    )
    dist = sum(
        bin(base[w] ^ other[w]).count("1") for w in base
    )
    assert dist > 8


def test_fingerprint_match_pairs_hamming_and_cap(spark):
    """Candidates need an exact posting hit in an un-capped bucket;
    aligned scoring counts matched frames and hamming over frames both
    sides share."""
    from pennsieve_streaming_spark.dsp.spectral import (
        fingerprint_match_pairs,
    )

    rows = [
        # A and B: exact hit at win 0; differ by 2 bits at win 1;
        # B lacks win 2 (A's extra frame must not count)
        ("A", 0, 8, 0b1010), ("B", 0, 8, 0b1010),
        ("A", 1, 8, 0b1100), ("B", 1, 8, 0b0101),  # xor=0b1001 -> 2 bits
        ("A", 2, 8, 0b1111),
        # C and D only collide in a HOT bucket at win 9 (cap 2 below,
        # 3 members) -> no candidate pair
        ("C", 9, 8, 7), ("D", 9, 8, 7), ("E", 9, 8, 7),
    ]
    fp = spark.createDataFrame(
        rows, "channel string, win long, n_bits long, fp long"
    )
    got = {
        (r.channel_a, r.channel_b): r
        for r in fingerprint_match_pairs(fp, bucket_cap=2).collect()
    }
    assert set(got) == {("A", "B")}
    ab = got[("A", "B")]
    assert ab.n_frames == 2 and ab.matched_frames == 1
    assert ab.sum_hamming == 2 and abs(ab.mean_hamming - 1.0) < 1e-12


def test_msc_coherence_identical_and_independent(spark):
    """Coherence of a channel with an exact scaled copy is 1 at every
    bin regardless of window count; sign-flipping the copy per window
    destroys the cross-window phase and drags coherence far below 1."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import msc_coherence

    n, ws = 64, 16
    rows = []
    for t in range(n):
        v = math.sin(2 * math.pi * 2 * t / ws) + 2.0 * math.cos(
            2 * math.pi * 5 * t / ws
        )
        rows.append(("x", t, v))
        rows.append(("y", t, 0.5 * v))
        # z flips sign every other window -> avg cross-spectrum ~ 0
        flip = -1.0 if (t // ws) % 2 else 1.0
        rows.append(("z", t, flip * v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    same = {
        r.bin: r for r in msc_coherence(df, "x", "y", 6, ws).collect()
    }
    assert len(same) == 6 and all(r.n_windows == 4 for r in same.values())
    for b, r in same.items():
        if r.sum_pa_q > 0:  # bins with signal: exact linear relation
            assert abs(r.coherence - 1.0) < 1e-9, (b, r.coherence)
        else:  # zero auto-power -> coherence undefined -> NULL
            assert r.coherence is None
    flipped = {
        r.bin: r for r in msc_coherence(df, "x", "z", 6, ws).collect()
    }
    assert flipped[2].coherence < 0.1 and flipped[5].coherence < 0.1


def test_spectral_entropy_tone_vs_noise(spark):
    """A pure tone concentrates power in one bin -> entropy ~ 0; a
    white-ish broadband signal spreads it -> entropy near ln(n_bins)."""
    import math

    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import spectral_entropy

    ws, nb = 32, 6
    rng = np.random.default_rng(11)
    rows = []
    for t in range(ws * 3):
        rows.append(
            ("tone", t, 1000.0 * math.sin(2 * math.pi * 3 * t / ws))
        )
        rows.append(("noise", t, float(rng.uniform(-1000, 1000))))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {
        (r.channel, r.win): r
        for r in spectral_entropy(df, nb, ws, quant=10**6).collect()
    }
    for w in range(3):
        tone = got[("tone", w)]
        # bin-3 tone: >99.99% of quantized power in one bin
        assert tone.entropy < 0.01
        noise = got[("noise", w)]
        assert noise.entropy > 0.5 * math.log(nb)
        assert noise.n_bins_nz == nb


def test_fingerprint_offset_search_votes_and_verify(spark):
    from pennsieve_streaming_spark.dsp.spectral import (
        fingerprint_offset_search,
    )

    # db channel A: frames 0..9 with fp = win; query = A's frames
    # 3..7 (fp 3..7) at q_win 0..4 -> every hit votes lag 3
    db = [("A", w, 8, w) for w in range(10)]
    # channel B: constant fp 99 everywhere -> hits only if query has 99
    db += [("B", w, 8, 99) for w in range(10)]
    q = [(i, 8, i + 3) for i in range(5)]
    db_fp = spark.createDataFrame(
        db, "channel string, win long, n_bits long, fp long"
    )
    q_fp = spark.createDataFrame(q, "win long, n_bits long, fp long")
    got = {
        r.channel: r
        for r in fingerprint_offset_search(db_fp, q_fp, 20).collect()
    }
    assert set(got) == {"A"}
    a = got["A"]
    assert a.lag == 3 and a.n_hits == 5
    assert a.n_frames == 5 and a.matched_frames == 5 and a.sum_hamming == 0
    # df cap: capping at 0 removes all postings -> no results
    assert (
        fingerprint_offset_search(db_fp, q_fp, 20, bucket_cap=0).count()
        == 0
    )


def test_plv_locked_vs_flipped_phase(spark):
    """PLV of a channel with a scaled copy is 1 at signal bins (zero
    cross-power bins drop out entirely); sign-flipping the copy every
    other window alternates the phase by pi, so the unit phasors
    cancel pairwise and PLV collapses to ~0 — and, unlike coherence,
    amplitude bursts cannot rescue it (window 2's 100x burst changes
    nothing because every window is normalized to a unit phasor)."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import phase_locking_value

    n, ws = 64, 16
    rows = []
    for t in range(n):
        v = math.sin(2 * math.pi * 2 * t / ws) + 2.0 * math.cos(
            2 * math.pi * 5 * t / ws
        )
        burst = 100.0 if (t // ws) == 2 else 1.0
        rows.append(("x", t, v))
        rows.append(("y", t, 0.5 * burst * v))
        flip = -1.0 if (t // ws) % 2 else 1.0
        rows.append(("z", t, flip * v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    same = {
        r.bin: r
        for r in phase_locking_value(df, "x", "y", 6, ws).collect()
    }
    # zero-cross-power bins are dropped, not NULL
    assert set(same) == {2, 5}
    for b, r in same.items():
        assert r.n_windows == 4
        assert abs(r.plv - 1.0) < 1e-6, (b, r.plv)
    flipped = {
        r.bin: r
        for r in phase_locking_value(df, "x", "z", 6, ws).collect()
    }
    assert flipped[2].plv < 1e-6 and flipped[5].plv < 1e-6


def test_band_bursts_detects_sustained_tone_runs(spark):
    """A channel with a bin-2 tone amplified 10x during windows 4-6
    (and a single hot window at 10, below min_windows) yields exactly
    one burst [4, 6]; a flat-amplitude channel yields none."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import band_bursts

    ws, nwin = 16, 12
    rows = []
    for wn in range(nwin):
        boost = 10.0 if 4 <= wn <= 6 else (10.0 if wn == 10 else 1.0)
        for p in range(ws):
            t = wn * ws + p
            v = boost * math.sin(2 * math.pi * 2 * p / ws)
            rows.append(("hot", t, v))
            rows.append(("flat", t, math.sin(2 * math.pi * 2 * p / ws)))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = band_bursts(df, 2, ws, mult=4, min_windows=2).collect()
    assert len(out) == 1
    b = out[0]
    assert b.channel == "hot" and b.start_win == 4 and b.end_win == 6
    assert b.n_windows == 3 and b.max_pq > 16 * b.med_pq


def test_pac_detects_planted_nesting(spark):
    """A channel whose fast-bin amplitude fires only when the slow
    phase points into one octant has MI near 1; a channel whose fast
    amplitude is constant across slow phases has MI near 0."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import (
        phase_amplitude_coupling,
    )

    ws, nwin = 32, 32
    rows = []
    for wn in range(nwin):
        # slow phase rotates across windows: 16 even offsets cover
        # every octant twice
        ph = 2 * math.pi * (wn % 16) / 16
        # coupled: fast tone only at one slow phase
        gate = 1.0 if (wn % 16) == 0 else 0.01
        for p in range(ws):
            slow = 100.0 * math.sin(2 * math.pi * p / ws + ph)
            fast_c = gate * 50.0 * math.sin(2 * math.pi * 8 * p / ws)
            fast_u = 50.0 * math.sin(2 * math.pi * 8 * p / ws)
            rows.append(("coupled", wn * ws + p, slow + fast_c))
            rows.append(("uniform", wn * ws + p, slow + fast_u))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {
        r.channel: r
        for r in phase_amplitude_coupling(df, 1, 8, ws).collect()
    }
    assert out["coupled"].mi > 0.5
    assert out["uniform"].mi < 0.05
    assert out["uniform"].n_octants_nz == 8
    assert out["coupled"].mi > 10 * out["uniform"].mi


def test_uneven_periodogram_finds_planted_period(spark):
    """A daily sinusoid sampled at IRREGULAR times must put its power
    at the 1-day candidate, orders above the off-periods — the
    gap-tolerance the dense-grid DFT family lacks."""
    import math
    import random

    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram

    day = 86_400_000_000
    rng = random.Random(5)
    rows = []
    t = 0
    for _ in range(600):
        t += rng.randrange(1_000_000_000, 9_000_000_000)  # uneven gaps
        v = 100.0 * math.sin(2 * math.pi * (t % day) / day)
        rows.append(("c", t, v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {
        r.period_us: r.power
        for r in uneven_periodogram(df, (day // 4, day, 7 * day), 256, 100)
        .collect()
    }
    assert out[day] > 100 * out[day // 4]
    assert out[day] > 100 * out[7 * day]
    # amplitude recovery: |X|/n for a sine of amplitude A is ~A/2
    assert abs(out[day] ** 0.5 - 50.0) < 5.0


def test_uneven_periodogram_median_centering_kills_dc(spark):
    """A constant signal (pure DC) must show ~zero power everywhere —
    the median centering removes the offset exactly."""
    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram

    rows = [("c", 1_000_000_000 * (t * t + 3), 42.5) for t in range(50)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    for r in uneven_periodogram(df, (86_400_000_000,), 256, 100).collect():
        assert r.sc == 0 and r.ss == 0 and r.power == 0.0


def test_holt_backtest_perfect_trend_converges(spark):
    """On an exact linear ramp the Holt state converges to the true
    slope, so late one-step errors shrink toward zero; MAE on a pure
    ramp is far below the naive last-value baseline (which errs by
    the slope each step)."""
    from pennsieve_streaming_spark.dsp.filtering import holt_backtest

    rows = [("c", t, 10.0 + 2.0 * t) for t in range(200)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = holt_backtest(df, 0.25, 0.125).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_steps == 199 and r.n_nonzero == 199
    assert r.mae < 2.0      # naive baseline MAE would be ~2.0 (the slope)
    assert r.mape is not None and r.mape < 0.02


def test_holt_backtest_zero_actuals_excluded_from_mape(spark):
    from pennsieve_streaming_spark.dsp.filtering import holt_backtest

    rows = [("c", 0, 5.0), ("c", 1, 0.0), ("c", 2, 5.0)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    r = holt_backtest(df, 0.25, 0.125).collect()[0]
    assert r.n_steps == 2 and r.n_nonzero == 1


def test_spectral_edge_tracks_the_dominant_bin(spark):
    """A pure bin-2 tone puts ~all energy at bin 2 -> SEF = 2; adding
    a strong bin-6 component pushes the 95% edge up to 6; a flat
    window emits nothing."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import spectral_edge

    ws = 64
    rows = []
    for t in range(ws):
        rows.append(("tone", t, 100.0 * math.sin(2 * math.pi * 2 * t / ws)))
        rows.append((
            "mix", t,
            30.0 * math.sin(2 * math.pi * 2 * t / ws)
            + 100.0 * math.sin(2 * math.pi * 6 * t / ws),
        ))
        rows.append(("flat", t, 0.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r.sef_bin for r in spectral_edge(df, 8, ws).collect()}
    assert out["tone"] == 2
    assert out["mix"] == 6
    assert "flat" not in out


def test_energy_vad_segments_and_hangover(spark):
    """Quiet floor with two loud bursts: burst frames exceed 2x the
    median energy; a 1-frame dip inside a burst is bridged by the
    hangover; the segment table carries exact frame ids and energies."""
    from pennsieve_streaming_spark.dsp.spectral import energy_vad

    rows = []
    # 20 frames of 8 samples; quiet amplitude 1, loud amplitude 10
    loud = set(range(4, 7)) | {8} | set(range(12, 15))  # gap at 7 bridged
    for f in range(20):
        amp = 10.0 if f in loud else 1.0
        for i in range(8):
            rows.append(("a", f * 8 + i, amp if i % 2 == 0 else -amp))
    # ragged tail: 3 extra samples must be dropped
    rows += [("a", 1000 + i, 99.0) for i in range(3)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = sorted(
        energy_vad(df, frame=8, quant=1, factor=2, hangover=1).collect(),
        key=lambda r: r.start_frame,
    )
    assert [(r.start_frame, r.end_frame, r.n_frames) for r in out] == [
        (4, 8, 4), (12, 14, 3)
    ]
    # frame energy at amp 10, quant 1: 8 * 100 = 800
    assert out[0].energy_q == 4 * 800 and out[1].energy_q == 3 * 800
    assert abs(out[0].mean_energy - 100.0) < 1e-12


def test_spectral_slope_white_vs_low_frequency(spark):
    """A slow sinusoid (power concentrated at bin 1) has a steeply
    negative slope (alpha >> 0); white-ish noise is near flat; a flat
    channel gates to NULL."""
    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import spectral_slope

    rng = np.random.default_rng(11)
    rows = []
    n = 64 * 8
    for t in range(n):
        rows.append(("slow", t, float(np.sin(2 * np.pi * t / 64))))
        rows.append(("white", t, float(rng.normal())))
        rows.append(("flat", t, 3.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in spectral_slope(df, 8, 64).collect()}
    assert out["slow"].alpha > 1.5
    assert abs(out["white"].alpha) < 1.0
    # flat channel: every bin at the +1-quantum floor -> slope exactly 0
    assert abs(out["flat"].slope) < 1e-12
    assert out["slow"].n_windows == 8


def test_spectral_flux_onsets_mark_attacks(spark):
    """A tone that turns ON at frame 4 and again louder at frame 8
    produces flux spikes exactly at the attack frames; steady frames
    sit at the noise floor."""
    import numpy as np

    from pennsieve_streaming_spark.dsp.spectral import (
        spectral_flux_onsets,
    )

    ws, rate, freq = 50, 1000.0, 100.0
    rows = []
    amp = {4: 1.0, 5: 1.0, 6: 1.0, 7: 1.0, 8: 5.0, 9: 5.0, 10: 5.0,
           11: 5.0}
    for w_ in range(12):
        a = amp.get(w_, 0.0)
        for i in range(ws):
            t = w_ * ws + i
            rows.append(
                ("a", t, a * float(np.sin(2 * np.pi * freq * t / rate)))
            )
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.win: r for r in
           spectral_flux_onsets(df, (freq,), rate, ws, 2).collect()}
    assert out[4].is_onset is True      # silence -> tone
    assert out[8].is_onset is True      # tone -> louder tone
    assert out[6].is_onset is False     # steady
    assert len(out) == 11               # first frame has no predecessor
