"""Percentiles / correlation / entropy / grouped-KMV / top-k tests."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.sketch import kmv_distinct, kmv_distinct_by
from pennsieve_streaming_spark.llm.text import token_entropy, top_k_per_group
from pennsieve_streaming_spark.operators.stats import (
    channel_correlation,
    channel_percentiles,
)


def _samples(spark, rows):
    return spark.createDataFrame(rows, "channel string, ts long, value double")


# --------------------------------------------------------------------------
# channel_percentiles
# --------------------------------------------------------------------------

def test_percentiles_match_numpy_linear(spark):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 100, size=173)
    rows = [("a", t, float(v)) for t, v in enumerate(vals)]
    [r] = channel_percentiles(_samples(spark, rows), (0.5, 0.9, 0.99)).collect()
    assert r.n == 173
    assert r.p50 == pytest.approx(np.percentile(vals, 50), abs=1e-9)
    assert r.p90 == pytest.approx(np.percentile(vals, 90), abs=1e-9)
    assert r.p99 == pytest.approx(np.percentile(vals, 99), abs=1e-9)


def test_percentiles_small_and_single(spark):
    [r] = channel_percentiles(_samples(spark, [("a", 0, 7.0)]), (0.5,)).collect()
    assert (r.n, r.p50) == (1, 7.0)
    [r2] = channel_percentiles(
        _samples(spark, [("a", 0, 1.0), ("a", 1, 3.0)]), (0.5,)
    ).collect()
    assert r2.p50 == pytest.approx(2.0)  # midpoint interpolation


def test_percentiles_per_channel_independent(spark):
    rows = [("a", t, float(t)) for t in range(11)] + [("b", 0, 42.0)]
    got = {r.channel: r.p50 for r in channel_percentiles(
        _samples(spark, rows), (0.5,)).collect()}
    assert got == {"a": 5.0, "b": 42.0}


# --------------------------------------------------------------------------
# channel_correlation
# --------------------------------------------------------------------------

def test_correlation_perfect_and_inverse(spark):
    rows = []
    for t in range(50):
        rows += [("x", t, float(t)), ("y", t, 2.0 * t + 5), ("z", t, -1.0 * t)]
    got = {(r.ch_a, r.ch_b): r.r for r in channel_correlation(
        _samples(spark, rows), quant=1000).collect()}
    assert got[("x", "y")] == pytest.approx(1.0, abs=1e-6)
    assert got[("x", "z")] == pytest.approx(-1.0, abs=1e-6)
    assert got[("y", "z")] == pytest.approx(-1.0, abs=1e-6)


def test_correlation_matches_numpy(spark):
    rng = np.random.default_rng(9)
    a = rng.uniform(-5, 5, 200)
    b = 0.6 * a + rng.uniform(-2, 2, 200)
    rows = [("a", t, float(a[t])) for t in range(200)]
    rows += [("b", t, float(b[t])) for t in range(200)]
    [r] = channel_correlation(_samples(spark, rows), quant=1_000_000).collect()
    want = np.corrcoef(a, b)[0, 1]
    assert r.r == pytest.approx(want, abs=1e-4)  # bounded by quantization


def test_correlation_zero_variance_guarded(spark):
    rows = [("a", t, 1.0) for t in range(10)] + [("b", t, float(t)) for t in range(10)]
    [r] = channel_correlation(_samples(spark, rows)).collect()
    assert r.r == 0.0


# --------------------------------------------------------------------------
# token_entropy
# --------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_entropy_uniform_is_ln_k(spark):
    [r] = token_entropy(_docs(spark, [(1, "a b c d")])).collect()
    assert r.n_tokens == 4 and r.distinct_tokens == 4
    assert r.entropy == pytest.approx(math.log(4), abs=1e-8)


def test_entropy_degenerate_is_zero(spark):
    got = {r.doc_id: r for r in token_entropy(
        _docs(spark, [(1, "x x x x x"), (2, "")])).collect()}
    assert got[1].entropy == pytest.approx(0.0, abs=1e-9)
    assert got[2].n_tokens == 0 and got[2].entropy == 0.0


def test_entropy_matches_python(spark):
    text = "the cat sat on the mat the end"
    [r] = token_entropy(_docs(spark, [(1, text)])).collect()
    toks = text.split()
    n = len(toks)
    want = -sum(
        (c / n) * math.log(c / n)
        for c in {t: toks.count(t) for t in set(toks)}.values()
    )
    assert r.entropy == pytest.approx(want, abs=1e-7)


# --------------------------------------------------------------------------
# kmv_distinct_by
# --------------------------------------------------------------------------

def test_grouped_kmv_equals_solo_per_group(spark):
    rows = [(f"g{i % 3}", f"v{j}") for i in range(3) for j in range(i * 40, i * 40 + 120)]
    df = spark.createDataFrame(rows, "grp string, s string")
    grouped = {
        r.grp: (r.n_seen, r.kth_min, r.estimate)
        for r in kmv_distinct_by(df, "grp", "s", k=16).collect()
    }
    for g in ["g0", "g1", "g2"]:
        [solo] = kmv_distinct(df.filter(F.col("grp") == g), "s", k=16).collect()
        assert grouped[g] == (solo.n_seen, solo.kth_min, round(solo.estimate, 9))


def test_grouped_kmv_small_group_exact(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 5}") for i in range(50)], "grp string, s string"
    )
    [r] = kmv_distinct_by(df, "grp", "s", k=16).collect()
    assert (r.n_seen, r.kth_min, r.estimate) == (5, -1, 5.0)


def test_grouped_kmv_salt_count_invariant(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(200)], "grp string, s string"
    )
    a = kmv_distinct_by(df, "grp", "s", k=32, n_salts=4).collect()
    b = kmv_distinct_by(df, "grp", "s", k=32, n_salts=64).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


# --------------------------------------------------------------------------
# top_k_per_group
# --------------------------------------------------------------------------

def test_top_k_per_group_golden(spark):
    df = spark.createDataFrame(
        [("en", 1, 0.9), ("en", 2, 0.8), ("en", 3, 0.8), ("en", 4, 0.1),
         ("de", 5, 0.5)],
        "lang string, doc_id long, q double",
    )
    got = sorted(
        (r.lang, r.doc_id, r.rank)
        for r in top_k_per_group(
            df, ["lang"], [F.col("q").desc(), F.col("doc_id")], 2
        ).collect()
    )
    # tie at q=0.8 resolves to the lower doc_id
    assert got == [("de", 5, 1), ("en", 1, 1), ("en", 2, 2)]


# --------------------------------------------------------------------------
# channel_autocorrelation
# --------------------------------------------------------------------------

def test_acf_lag0_like_self_and_period_detection(spark):
    from pennsieve_streaming_spark.operators.stats import (
        channel_autocorrelation,
    )

    # period-4 signal: ACF at lag 4 ~ 1, at lag 2 ~ -1
    pat = [1.0, 0.0, -1.0, 0.0]
    rows = [("a", t, pat[t % 4]) for t in range(400)]
    v = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {r.lag_us: r.r for r in channel_autocorrelation(
        v, (2, 4), quant=1000).collect()}
    assert got[4] == pytest.approx(1.0, abs=1e-6)
    assert got[2] == pytest.approx(-1.0, abs=1e-6)


def test_acf_matches_numpy_pairwise_corr(spark):
    from pennsieve_streaming_spark.operators.stats import (
        channel_autocorrelation,
    )

    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, 300)
    rows = [("a", t, float(x[t])) for t in range(300)]
    v = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = channel_autocorrelation(v, (5,), quant=1_000_000).collect()
    want = np.corrcoef(x[:-5], x[5:])[0, 1]
    assert r.n == 295
    assert r.r == pytest.approx(want, abs=1e-4)


# --------------------------------------------------------------------------
# minhash jaccard estimate / decimate
# --------------------------------------------------------------------------

def test_minhash_estimate_identical_docs_is_one(spark):
    from pennsieve_streaming_spark.llm.dedup import (
        minhash_jaccard_estimate,
        minhash_signatures,
        shingles,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "entirely different words in this third document here now")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(shingles(docs))
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    got = {(r.doc_a, r.doc_b): r.jaccard_est
           for r in minhash_jaccard_estimate(sigs, pairs).collect()}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] < 0.5


def test_decimate_keeps_every_nth_of_filtered(spark):
    from pennsieve_streaming_spark.dsp import FilterSpec, apply_filter
    from pennsieve_streaming_spark.dsp.filtering import decimate

    rows = [("a", t * 1000, float((t * 3) % 17)) for t in range(200)]
    s = spark.createDataFrame(rows, "channel string, ts long, value double")
    spec = FilterSpec("lowpass", 2, 100.0)
    full = {r.ts: r.value for r in apply_filter(s, spec, rate_hz=1000.0).collect()}
    dec = sorted((r.ts, r.value) for r in decimate(s, spec, 1000.0, 4).collect())
    assert len(dec) == 50
    for ts, v in dec:
        assert v == full[ts]
    assert [ts for ts, _ in dec] == [t * 4000 for t in range(50)]


def test_cross_correlation_detects_shift(spark):
    """ch_b is ch_a delayed by exactly 2 ticks: r at lag +2 must be ~1
    and dominate the other lags; the zero-variance guard yields r=0."""
    import math

    from pennsieve_streaming_spark.operators.stats import (
        channel_cross_correlation,
    )

    n = 60
    rows = []
    for t in range(n):
        v = math.sin(t * 0.7) * 10
        rows.append(("a", t * 100, v))
        rows.append(("b", (t + 2) * 100, v))      # b trails a by 2 ticks
        rows.append(("flat", t * 100, 5.0))        # zero variance
    vals = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = channel_cross_correlation(vals, (-200, 0, 200), quant=1000)
    got = {(r.ch_a, r.ch_b, r.lag_us): (r.n, r.r) for r in out.collect()}
    # (a, b) at lag +200: b's value at t+200 equals a's at t -> r == 1
    assert got[("a", "b", 200)][1] > 0.999999
    assert got[("a", "b", 200)][1] > got[("a", "b", 0)][1]
    assert got[("a", "b", 200)][1] > got[("a", "b", -200)][1]
    # degenerate channel pairs are guarded to 0
    assert got[("a", "flat", 0)][1] == 0.0
    # overlap counts shrink with |lag|
    assert got[("a", "b", 0)][0] == 58  # b spans ticks 2..61 vs a 0..59


def test_detect_peaks_golden(spark):
    from pennsieve_streaming_spark.operators.stats import detect_peaks

    vals = [0, 5, 3, 8, 8, 2, 9, 1, 4]   # plateau at 8,8; edge 4 not a peak
    rows = [("c", i * 10, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {(r.ts, r.value): r.rise for r in detect_peaks(df, 0.0).collect()}
    # peaks: 5 (rise 2), first 8 of the plateau (rise 5? prev=3,next=8 ->
    # greatest=8 -> rise 0), 9 (prev 2, next 1 -> rise 7)
    assert set(got) == {(10, 5.0), (30, 8.0), (60, 9.0)}
    assert got[(10, 5.0)] == 2.0
    assert got[(30, 8.0)] == 0.0     # plateau: neighbor equals the peak
    assert got[(60, 9.0)] == 7.0
    # prominence gate drops the plateau peak
    prom = detect_peaks(df, 0.0, min_prominence=1.0).collect()
    assert {(r.ts, r.value) for r in prom} == {(10, 5.0), (60, 9.0)}
    # height gate
    high = detect_peaks(df, 8.5).collect()
    assert {(r.ts, r.value) for r in high} == {(60, 9.0)}


def test_hourly_profile_golden(spark):
    from pennsieve_streaming_spark.operators.stats import (
        HOUR_US,
        hourly_profile,
    )

    rows = [
        ("c", 0 * HOUR_US, 10.0), ("c", 0 * HOUR_US + 500, 20.0),
        ("c", 5 * HOUR_US, 7.5),
        ("c", 24 * HOUR_US, 30.0),  # next day, same hour-0 bucket
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {r.hour: (r.n, r.sum_q, r.mean)
           for r in hourly_profile(df, quant=100).collect()}
    assert got == {0: (3, 6000, 20.0), 5: (1, 750, 7.5)}


def test_quality_profile_golden(spark):
    from pennsieve_streaming_spark.operators.stats import quality_profile

    rows = [
        ("c", 0, 5.0), ("c", 0, 6.0),          # duplicate ts
        ("c", 10, None),                        # NULL value
        ("c", 20, -1.0),                        # below
        ("c", 30, 999.0),                       # above
        ("d", 0, 50.0),
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {r.channel: r for r in quality_profile(df, 0.0, 100.0).collect()}
    c = got["c"]
    assert (c.n, c.n_null, c.n_dup_ts, c.n_below, c.n_above) == (5, 1, 1, 1, 1)
    assert (c.ts_min, c.ts_max, c.v_min, c.v_max) == (0, 30, -1.0, 999.0)
    d = got["d"]
    assert (d.n, d.n_null, d.n_dup_ts, d.n_below, d.n_above) == (1, 0, 0, 0, 0)


def test_seasonal_mad_outliers_vs_global(spark):
    """A weekly rhythm (high Sundays) plus one flat-day spike: the
    global screen flags every Sunday; the seasonal screen flags ONLY
    the injected spike."""
    from pennsieve_streaming_spark.operators.stats import (
        PROFILE_DAY_US,
        seasonal_mad_outliers,
    )

    rows = []
    for day in range(70):
        phase = day % 7
        base = 100.0 if phase == 0 else 10.0   # Sundays run hot
        noise = (day * 7919 % 13) * 0.1        # deterministic jitter
        rows.append(("c", day * PROFILE_DAY_US, base + noise))
    # inject one anomalous Wednesday (phase 3)
    rows.append(("c", (70 + 3) * PROFILE_DAY_US, 80.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = seasonal_mad_outliers(df, z=3.5).collect()
    flagged = {(r.phase, r.value) for r in out}
    assert (3, 80.0) in flagged
    # no Sunday is flagged despite being 10x the weekly median
    assert not any(p == 0 for p, _ in flagged)


def test_seasonal_mad_outliers_zero_mad_guarded(spark):
    from pennsieve_streaming_spark.operators.stats import (
        PROFILE_DAY_US,
        seasonal_mad_outliers,
    )

    # constant per phase -> MAD 0 -> nothing flagged, no NaN rows
    rows = [("c", d * PROFILE_DAY_US, float(d % 7)) for d in range(28)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    assert seasonal_mad_outliers(df, z=0.1).collect() == []


def test_change_points_finds_injected_shift(spark):
    from pennsieve_streaming_spark.operators.stats import change_points

    rows = []
    for i in range(200):
        v = 10.0 if i < 120 else 25.0     # shift at index 120 (1-based i=120)
        v += (i * 37 % 7) * 0.01           # deterministic jitter
        rows.append(("c", i * 1000, v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = change_points(df, quant=100).collect()
    assert r.split_i == 120                # last pre-shift row
    assert 14.5 < r.shift < 15.5
    assert r.n == 200


def test_change_points_constant_signal_zero_dev(spark):
    from pennsieve_streaming_spark.operators.stats import change_points

    rows = [("c", i * 10, 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = change_points(df, quant=100).collect()
    assert r.dev_scaled == 0
    # earliest-ts tie rule: the degenerate argmax lands on the first row
    assert r.split_i == 1


def test_histogram_quantiles_error_bound_and_merge(spark):
    """Sketch quantiles within one bin width of the exact percentiles;
    per-shard histograms summed == combined histogram (mergeability)."""
    from pennsieve_streaming_spark.operators.stats import (
        channel_percentiles,
        histogram_quantiles,
        value_histogram,
    )

    rows = [("c", i, float((i * 7919) % 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [sk] = histogram_quantiles(df, 0.0, 1000.0, 50, ps=(0.5, 0.9)).collect()
    [ex] = channel_percentiles(df, ps=(0.5, 0.9)).collect()
    width = 1000.0 / 50
    assert abs(sk.q50 - ex.p50) <= width
    assert abs(sk.q90 - ex.p90) <= width
    assert sk.n == 2000
    # mergeability: shard histograms add up to the combined histogram
    h_all = {(r.channel, r.bin): r.n
             for r in value_histogram(df, 0.0, 1000.0, 50).collect()}
    half1 = spark.createDataFrame(rows[:1000], "channel string, ts long, value double")
    half2 = spark.createDataFrame(rows[1000:], "channel string, ts long, value double")
    merged = {}
    for half in (half1, half2):
        for r in value_histogram(half, 0.0, 1000.0, 50).collect():
            merged[(r.channel, r.bin)] = merged.get((r.channel, r.bin), 0) + r.n
    assert merged == h_all


def test_distribution_drift_detects_shift(spark):
    from pennsieve_streaming_spark.operators.stats import distribution_drift

    rows = []
    for i in range(1000):
        # stable channel: same distribution both windows
        rows.append(("stable", i, float((i * 7919) % 100)))
        # drifting channel: second window shifts up by 50
        v = float((i * 7919) % 100) + (50.0 if i >= 500 else 0.0)
        rows.append(("drift", i, v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {r.channel: r for r in
           distribution_drift(df, split_ts=500, lo=0.0, hi=200.0, n_bins=20)
           .collect()}
    assert got["stable"].psi < 0.05
    assert got["drift"].psi > 0.5
    assert got["drift"].n_ref == 500 and got["drift"].n_cur == 500


def test_distribution_drift_empty_window_smoothed(spark):
    from pennsieve_streaming_spark.operators.stats import distribution_drift

    # everything in the reference window: PSI finite (smoothing), no div0
    rows = [("c", i, float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = distribution_drift(df, split_ts=10**9, lo=0.0, hi=10.0,
                             n_bins=5).collect()
    import math
    assert math.isfinite(r.psi) and r.n_cur == 0


def test_winsorize_clamps_tails_only(spark):
    from pennsieve_streaming_spark.operators.stats import winsorize

    rows = [("c", i, float(i)) for i in range(100)]  # 0..99
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.ts: r for r in winsorize(df, 0.05, 0.95).collect()}
    assert len(out) == 100
    # p05 of 0..99 (n-1 interpolation) = 4.95; p95 = 94.05
    assert not out[50].was_clipped and out[50].clamped == 50.0
    assert out[0].was_clipped and abs(out[0].clamped - 4.95) < 1e-9
    assert out[99].was_clipped and abs(out[99].clamped - 94.05) < 1e-9
    n_clip = sum(1 for r in out.values() if r.was_clipped)
    assert n_clip == 10  # 5 on each tail


def test_trend_segments_exact_ols(spark):
    """Hand-checked OLS on a perfect ramp and a degenerate window."""
    from pennsieve_streaming_spark.operators.stats import trend_segments

    rows = [
        # channel up: value = 2*x + 1 on days 0..3 of one window
        ("up", 0, 1.0), ("up", 10, 3.0), ("up", 20, 5.0), ("up", 30, 7.0),
        # channel one-x: all samples in a single x unit -> dropped
        ("onex", 100, 1.0), ("onex", 105, 9.0),
        # channel down: value = -x within a later window (win_start 1000)
        ("down", 1000, 0.0), ("down", 1010, -1.0), ("down", 1020, -2.0),
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    # win = 1000 time units, x unit = 10 -> x = 0..3
    got = {
        (r.channel, r.win_start): r
        for r in trend_segments(df, 1000, 10).collect()
    }
    assert ("onex", 0) not in got  # zero x-variance dropped
    up = got[("up", 0)]
    assert up.n == 4 and up.direction == "rising"
    assert abs(up.slope - 2.0) < 1e-12 and abs(up.mean_value - 4.0) < 1e-12
    down = got[("down", 1000)]
    assert down.direction == "falling" and abs(down.slope + 1.0) < 1e-12


def test_granger_screen_detects_directed_coupling(spark):
    """y follows x with one step of lag (y_t = x_{t-1}): the x->y
    direction shows |partial_r| ~ 1 and beta_x ~ 1; an independent
    channel shows partial_r ~ 0 against both."""
    import numpy as np

    from pennsieve_streaming_spark.operators.stats import granger_screen

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 100, 240)
    z = rng.uniform(0, 100, 240)
    rows = []
    for t in range(240):
        rows.append(("x", t * 10, float(x[t])))
        # y is EXACTLY x lagged one grid step (plus tiny offset)
        rows.append(("y", t * 10, float(x[t - 1]) if t else 0.0))
        rows.append(("z", t * 10, float(z[t])))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {
        (r.ch_src, r.ch_dst): r
        for r in granger_screen(df, 10, quant=100).collect()
    }
    assert len(got) == 6  # all directed pairs
    xy = got[("x", "y")]
    assert xy.n == 239
    assert abs(xy.beta_x - 1.0) < 1e-3 and abs(xy.partial_r) > 0.999
    # reverse direction: y's past is x's past-past — far weaker
    assert abs(got[("y", "x")].partial_r) < 0.5
    # independent channel: no predictive power either way
    assert abs(got[("z", "y")].partial_r) < 0.3
    assert abs(got[("z", "x")].partial_r) < 0.3


def test_density_grid_clamps_and_counts(spark):
    from pennsieve_streaming_spark.operators.stats import density_grid

    rows = [
        ("c", 0, -5.0),    # below range -> bin 0
        ("c", 1, 0.0),     # bin 0
        ("c", 2, 15.0),    # bin 1 (width 10 over [0, 40), 4 bins)
        ("c", 3, 99.0),    # above range -> bin 3
        ("c", 1000, 25.0), # next time bucket, bin 2
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {
        (r.t_bucket, r.bin): (r.n, r.bin_lo)
        for r in density_grid(df, 1000, 0.0, 40.0, 4).collect()
    }
    assert got[(0, 0)] == (2, 0.0)
    assert got[(0, 1)] == (1, 10.0)
    assert got[(0, 3)] == (1, 30.0)
    assert got[(1000, 2)] == (1, 20.0)
    assert len(got) == 4


def test_hurst_rs_distinguishes_memory_classes(spark):
    """H ~ 0.5-0.65 for iid noise; H near 1 for a persistent trending
    series (cumulative walk with drift); both within R/S small-sample
    bias bands."""
    import numpy as np

    from pennsieve_streaming_spark.operators.stats import hurst_rs

    rng = np.random.default_rng(7)
    rows = []
    walk = 0.0
    for t in range(2048):
        rows.append(("iid", t, float(rng.uniform(-1000, 1000))))
        walk += rng.uniform(0.5, 1.5) * 100
        rows.append(("trend", t, float(walk)))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = {
        r.channel: r
        for r in hurst_rs(df, scales=(64, 128, 256, 512), quant=10).collect()
    }
    assert got["iid"].n_scales == 4 and got["trend"].n_scales == 4
    assert 0.35 < got["iid"].hurst < 0.72
    assert got["trend"].hurst > 0.85
    assert got["trend"].hurst > got["iid"].hurst + 0.2


def test_ar2_yule_walker_recovers_planted_process(spark):
    """Planted AR(2) with known coefficients: Yule-Walker recovers
    (phi1, phi2) to within sampling error; a white-noise channel's
    coefficients sit near zero; a 2-point channel yields NULLs."""
    import math

    from pennsieve_streaming_spark.operators.stats import ar2_yule_walker

    phi1, phi2, n = 0.6, -0.3, 2000
    rows = []
    y1 = y2 = 0.0
    w1 = w2 = 0.0
    for t in range(n):
        # deterministic pseudo-noise (zero-mean, bounded)
        e = math.sin(t * 12.9898) * 43758.5453
        e = (e - math.floor(e)) - 0.5
        y = phi1 * y1 + phi2 * y2 + e
        rows.append(("ar", t * 10, y))
        y2, y1 = y1, y
        w = math.sin(t * 78.233) * 24634.6345
        w = (w - math.floor(w)) - 0.5
        rows.append(("wn", t * 10, w))
        w2, w1 = w1, w
    rows += [("tiny", 0, 1.0), ("tiny", 10, 2.0)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in ar2_yule_walker(df, 1000).collect()}
    assert abs(out["ar"].phi1 - phi1) < 0.08
    assert abs(out["ar"].phi2 - phi2) < 0.08
    assert abs(out["wn"].phi1) < 0.08 and abs(out["wn"].phi2) < 0.08
    assert out["tiny"].phi1 is None and out["tiny"].sigma2_q is None
    # innovation variance of the planted process ≈ var(e) = 1/12
    assert abs(out["ar"].sigma2_q / 1000 - 1 / 12) < 0.02


def test_sampen_kernel_matches_brute_force():
    import numpy as np

    from pennsieve_streaming_spark.operators.stats import sampen_counts

    def brute(x, m, r):
        nt = len(x) - m
        b = a = 0
        for i in range(nt):
            for j in range(i + 1, nt):
                if max(abs(x[i + k] - x[j + k]) for k in range(m)) <= r:
                    b += 1
                if max(abs(x[i + k] - x[j + k]) for k in range(m + 1)) <= r:
                    a += 1
        return b, a

    rng = np.random.default_rng(3)
    for _ in range(25):
        x = rng.integers(0, 10, size=int(rng.integers(5, 40))).astype(
            np.int64
        )
        m, r = int(rng.integers(1, 4)), int(rng.integers(0, 5))
        assert sampen_counts(x, m, r) == brute(x, m, r)


def test_sample_entropy_orders_regular_below_random(spark):
    """A periodic signal is more predictable than pseudo-noise of the
    same amplitude: SampEn(periodic) < SampEn(noise). A constant
    channel has A == B ⇒ SampEn exactly 0."""
    import math

    from pennsieve_streaming_spark.operators.stats import sample_entropy

    rows = []
    for t in range(128):
        rows.append(("sine", t, 100.0 * math.sin(2 * math.pi * t / 16)))
        e = math.sin(t * 12.9898) * 43758.5453
        rows.append(("noise", t, 200.0 * ((e - math.floor(e)) - 0.5)))
        rows.append(("flat", t, 42.0))
    rows.append(("sine", 200, 1.0))  # ragged 1-row window -> dropped
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in sample_entropy(df, 128, 2, 0.2, 100).collect()}
    assert set(out) == {"sine", "noise", "flat"}  # ragged tail gone
    assert out["flat"].sampen == 0.0
    assert out["sine"].sampen < out["noise"].sampen
    assert out["noise"].b_count > 0


def test_seasonal_decompose_recovers_planted_components(spark):
    """trend+weekly+noise-free series: the centered-7 MA recovers the
    linear trend exactly away from edges, the phase means recover the
    planted weekly pattern (centered), and residuals vanish; edge
    rows without a full window drop."""
    from pennsieve_streaming_spark.operators.stats import (
        seasonal_decompose,
    )

    step = 10
    weekly = [5.0, -3.0, 0.0, 2.0, -4.0, 1.0, -1.0]  # sums to 0
    rows = []
    for t in range(28):
        rows.append(("c", t * step, 100.0 + 2.0 * t + weekly[t % 7]))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.ts: r for r in
           seasonal_decompose(df, step, 7, 1000).collect()}
    # 28 rows minus 3 at each edge
    assert len(out) == 22
    assert 0 not in out and 270 not in out
    for ts, r in out.items():
        t = ts // step
        assert abs(r.trend - (100.0 + 2.0 * t)) < 1e-6, (t, r.trend)
        assert abs(r.seasonal - weekly[t % 7]) < 1e-6
        assert abs(r.resid) < 1e-6


def test_hjorth_frequency_ordering_and_goldens(spark):
    """A fast oscillation has higher mobility than a slow one of the
    same amplitude (mobility ≈ mean frequency proxy: for a pure
    sinusoid mobility = 2·sin(π·f/fs)); a pure sinusoid's complexity
    ≈ 1; a constant window yields NULL mobility."""
    import math

    from pennsieve_streaming_spark.operators.stats import (
        hjorth_parameters,
    )

    ws = 128
    rows = []
    for t in range(ws):
        rows.append(("slow", t, 1000.0 * math.sin(2 * math.pi * 4 * t / ws)))
        rows.append(("fast", t, 1000.0 * math.sin(2 * math.pi * 16 * t / ws)))
        rows.append(("flat", t, 5.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in hjorth_parameters(df, ws, 100).collect()}
    assert out["fast"].mobility > 2.5 * out["slow"].mobility
    for ch, f in (("slow", 4), ("fast", 16)):
        want = 2.0 * math.sin(math.pi * f / ws)
        assert abs(out[ch].mobility - want) < 0.05 * want, (ch, want)
        assert abs(out[ch].complexity - 1.0) < 0.05
    assert out["flat"].mobility is None and out["flat"].activity_mq == 0


def test_ljung_box_separates_ar_from_noise(spark):
    """A strongly autocorrelated walk must reject whiteness; an
    alternating +-1 series (r1 = -1) also rejects; Q composes the
    pivoted ACFs exactly as the shared expression says."""
    from pennsieve_streaming_spark.operators.stats import (
        ljung_box_whiteness,
    )

    day = 86_400_000_000
    rows = []
    # "trend": monotonically rising -> r_k ~ 1 at all lags -> huge Q
    for t in range(60):
        rows.append(("trend", t * day, float(t)))
    # "alt": deterministic alternation -> |r_k| = 1 -> huge Q too
    for t in range(60):
        rows.append(("alt", t * day, float(1 if t % 2 else -1)))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    lags = tuple(day * k for k in range(1, 6))
    out = {r.channel: r for r in ljung_box_whiteness(df, lags, 100).collect()}

    tr = out["trend"]
    assert tr.n_total == 60 and tr.nonwhite is True
    assert tr.r1 > 0.99
    alt = out["alt"]
    assert alt.nonwhite is True and alt.r1 == -1.0 and alt.r2 == 1.0
    # Q recomputed from the emitted columns matches the column
    q = tr.n_total * (tr.n_total + 2) * sum(
        getattr(tr, f"r{k}") ** 2 / (tr.n_total - k) for k in range(1, 6)
    )
    assert abs(q - tr.q_stat) < 1e-9


def test_higher_moments_golden(spark):
    """Analytic pins: a +-1 square wave has skew 0, excess kurtosis
    -2 (the two-point-distribution extreme); one upward spike skews
    positive; a constant window emits NULLs."""
    from pennsieve_streaming_spark.operators.stats import higher_moments

    rows = []
    rows += [("sq", t, float(1 if t % 2 else -1)) for t in range(8)]
    rows += [("spike", t, 100.0 if t == 3 else 0.0) for t in range(8)]
    rows += [("flat", t, 7.0) for t in range(8)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in higher_moments(df, 8, 100).collect()}

    sq = out["sq"]
    assert (sq.mean, sq.m2) == (0.0, 1.0)
    assert sq.skewness == 0.0 and sq.kurtosis_excess == -2.0
    assert out["spike"].skewness > 1.5
    flat = out["flat"]
    assert flat.m2 == 0.0
    assert flat.skewness is None and flat.kurtosis_excess is None


def test_rqa_periodic_vs_spread(spark):
    """A period-2 alternation recurs on every even diagonal and every
    recurrent point sits in a long line -> DET = 1 with high RR; a
    strictly spread-out ramp (each value far from every other) recurs
    nowhere -> RR = 0, DET NULL."""
    from pennsieve_streaming_spark.operators.stats import (
        recurrence_quantification,
    )

    rows = []
    rows += [("per", t, float(t % 2)) for t in range(8)]
    rows += [("ramp", t, float(100 * t)) for t in range(8)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {
        r.channel: r
        for r in recurrence_quantification(df, 8, 0.2, 100, 2).collect()
    }
    per = out["per"]
    # tolerance: IQR of {0,1} -> r_q = round(0.2*1*100) = 20 < 100,
    # so only equal values recur: pairs with even d -> 4+3+2+1 wait:
    # d=2: 6 pairs, d=4: 4, d=6: 2 -> 12 recurrent of 28
    assert per.n_pairs == 28 and per.n_rec == 12
    assert per.det == 1.0 and abs(per.rr - 12 / 28) < 1e-12
    ramp = out["ramp"]
    assert ramp.n_rec == 0 and ramp.rr == 0.0 and ramp.det is None


def test_isi_cv_metronome_vs_bursty(spark):
    """A metronome spike train has CV = 0 (burstiness -1); a bursty
    train (tight doublets separated by long silences) has CV > 1
    (burstiness > 0)."""
    from pennsieve_streaming_spark.operators.stats import isi_stats

    def spike_train(channel, times):
        rows = []
        t_all = set(times)
        end = max(times) + 2_000_000
        for t in range(0, end + 1, 1_000_000):
            rows.append((channel, t, 10.0 if t in t_all else 0.0))
        return rows

    sec = 1_000_000
    metro = spike_train("metro", [10 * sec * k for k in range(1, 8)])
    bursty_times = []
    for k in range(4):
        base = 60 * sec * (k + 1)
        bursty_times += [base, base + 2 * sec]
    bursty = spike_train("bursty", bursty_times)
    df = spark.createDataFrame(
        metro + bursty, "channel string, ts long, value double"
    )
    out = {r.channel: r for r in isi_stats(df, 5.0, 0.0).collect()}

    m = out["metro"]
    assert m.n_isi == 6 and m.cv == 0.0 and m.burstiness == -1.0
    assert m.mean_s == 10.0 and m.min_s == m.max_s == 10
    b = out["bursty"]
    assert b.cv > 1.0 and b.burstiness > 0.0
    assert b.min_s == 2


def test_multiscale_entropy_white_noise_decays(spark):
    """Costa's separation: white noise loses entropy as the scale
    grows (coarse-graining averages independent draws toward the
    mean); scale-1 equals plain sample_entropy on the same data."""
    import random

    from pennsieve_streaming_spark.operators.stats import (
        multiscale_entropy,
        sample_entropy,
    )

    rng = random.Random(23)
    rows = [
        ("c", t, float(rng.randrange(-500, 501)) / 10.0)
        for t in range(1024)
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = multiscale_entropy(df, (1, 2, 4), 128, 2, 0.2, 100).collect()
    by_scale = {}
    for r in out:
        by_scale.setdefault(r.scale, []).append(r.sampen)
    mean = {s: sum(v) / len(v) for s, v in by_scale.items() if all(v)}
    assert mean[1] > mean[2] > mean[4]

    # scale 1 == plain sample_entropy bit-for-bit
    se = {
        (r.channel, r.win): (r.b_count, r.a_count, r.sampen)
        for r in sample_entropy(df, 128, 2, 0.2, 100).collect()
    }
    for r in out:
        if r.scale == 1:
            assert se[(r.channel, r.win)] == (r.b_count, r.a_count, r.sampen)


def test_haar_energy_scale_localization(spark):
    """A +-1 alternation at the sample scale puts ALL detail energy
    at level 1; a period-4 square wave puts it at level 2; a constant
    window has zero energy everywhere (rel_energy NULL)."""
    from pennsieve_streaming_spark.operators.stats import haar_energy

    rows = []
    rows += [("alt", t, float(1 if t % 2 else -1)) for t in range(8)]
    rows += [("sq4", t, float(1 if t % 4 < 2 else -1)) for t in range(8)]
    rows += [("flat", t, 3.0) for t in range(8)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {}
    for r in haar_energy(df, 8, 3, 100).collect():
        out[(r.channel, r.level)] = r

    # alt: d at level 1 = x0 - x1 = +-200 per pair -> E1 = 4*200^2
    assert out[("alt", 1)].energy_q == 4 * 200 * 200
    assert out[("alt", 2)].energy_q == 0 and out[("alt", 3)].energy_q == 0
    assert out[("alt", 1)].rel_energy == 1.0
    assert out[("alt", 1)].energy == 4 * 200 * 200 / 10000.0

    # sq4: level-1 pairs are equal -> 0; level 2 blocks (1,1,-1,-1)
    # -> d = 400 per block, 2 blocks -> E2 = 2*400^2; level 3 cancels
    assert out[("sq4", 1)].energy_q == 0
    assert out[("sq4", 2)].energy_q == 2 * 400 * 400
    assert out[("sq4", 3)].energy_q == 0
    assert out[("sq4", 2)].rel_energy == 1.0

    for lv in (1, 2, 3):
        r = out[("flat", lv)]
        assert r.energy_q == 0 and r.rel_energy is None


def test_cfar_adapts_to_drifting_floor(spark):
    """A spike of fixed size fires on a quiet floor but NOT on a loud
    floor of the same shape — the constant-false-alarm property a
    global threshold can't give; edge cells never fire."""
    from pennsieve_streaming_spark.operators.stats import cfar_peaks

    rows = []
    # quiet region: floor 1.0, spike 10.0 at t=15 (needs 10 cells
    # each side for a full training window)
    for t in range(31):
        rows.append(("c", t, 10.0 if t == 15 else 1.0))
    # loud region (same channel, later): floor 8.0, same 10.0 "spike"
    for t in range(40, 71):
        rows.append(("c", t, 10.0 if t == 55 else 8.0))
    # edge spike: huge value at t=0 must NOT fire (incomplete window)
    rows.append(("e", 0, 1000.0))
    for t in range(1, 12):
        rows.append(("e", t, 1.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = cfar_peaks(df, 8, 2, 3, 1, 100).collect()
    fired = {(r.channel, r.ts) for r in out}
    assert ("c", 15) in fired            # 10 vs mean 1 -> fires
    assert ("c", 55) not in fired        # 10 vs mean 8 -> under 3x
    assert not any(ch == "e" for ch, _ in fired)
    r15 = next(r for r in out if r.ts == 15)
    assert r15.score == 10.0             # aq*16 / (16*100): 1000*16/1600


def test_hrv_drift_vs_jitter(spark):
    """A slowly drifting but beat-steady train scores RMSSD ~0 while
    a jittery train with the SAME total variance scores high — the
    successive-difference property CV can't see; pNN counts only
    above-threshold jumps."""
    from pennsieve_streaming_spark.operators.stats import hrv_metrics

    sec = 1_000_000

    def train(channel, gaps_s):
        rows, t = [], 0
        times = []
        for g in gaps_s:
            t += g * sec
            times.append(t)
        tset = set(times)
        for tt in range(0, max(times) + 2 * sec, sec):
            rows.append((channel, tt, 10.0 if tt in tset else 0.0))
        return rows

    # drift: gaps 100,101,...,107 (successive diffs all 1 s)
    drift = train("drift", [100 + k for k in range(8)])
    # jitter: alternating 90/114 (same mean-ish, diffs +-24)
    jitter = train("jitter", [90, 114] * 4)
    df = spark.createDataFrame(
        drift + jitter, "channel string, ts long, value double"
    )
    out = {
        r.channel: r
        for r in hrv_metrics(df, 5.0, 0.0, nn_threshold_s=20).collect()
    }
    d, j = out["drift"], out["jitter"]
    assert d.rmssd_s == 1.0 and d.pnn == 0.0        # |dd| = 1 always
    assert j.rmssd_s == 24.0 and j.pnn == 1.0        # |dd| = 24 > 20
    assert d.n_diffs == j.n_diffs == 6


def test_randomness_tests_separate_structure_from_noise(spark):
    """A monotone ramp has ZERO turning points (tp_z strongly
    negative) and exactly 2 runs; a +-1 alternation maxes both counts
    (n-2 turns, n runs); z signs match."""
    from pennsieve_streaming_spark.operators.stats import (
        randomness_tests,
    )

    n = 60
    rows = []
    rows += [("ramp", t, float(t)) for t in range(n)]
    rows += [("alt", t, float(1 if t % 2 else -1)) for t in range(n)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in randomness_tests(df, 100).collect()}

    ramp = out["ramp"]
    assert ramp.turning_points == 0 and ramp.tp_z < -5
    assert ramp.runs == 2 and ramp.runs_z < -5
    assert ramp.n_above + ramp.n_below == n

    alt = out["alt"]
    assert alt.turning_points == n - 2 and alt.tp_z > 5
    assert alt.runs == n and alt.runs_z > 5


def test_adf_separates_mean_reversion_from_random_walk(spark):
    """A strongly mean-reverting AR(1) (phi = -0.5) rejects the unit
    root decisively; a cumulative random walk does not."""
    import random

    from pennsieve_streaming_spark.operators.stats import adf_test

    rng = random.Random(31)
    rows = []
    x = 0.0
    for t in range(400):
        x = -0.5 * x + rng.uniform(-1, 1) * 10
        rows.append(("mr", t, x))
    w = 0.0
    for t in range(400):
        w += rng.uniform(-1, 1) * 10
        rows.append(("rw", t, w))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in adf_test(df, 100).collect()}

    mr = out["mr"]
    assert mr.stationary is True and mr.t_stat < -5
    assert -2.0 < mr.rho < -1.0        # Delta x = (phi - 1) x + eps
    rw = out["rw"]
    assert rw.stationary is False and rw.t_stat > -1.95


def test_ljung_box_rejects_non_ladder_lags(spark):
    """ADVICE r6: lags must be consecutive multiples of the grid step
    (the classical LB ladder) — n_total = n1 + 1 and the (n - k)
    denominators assume it."""
    import pytest as _pytest

    from pennsieve_streaming_spark.operators.stats import (
        ljung_box_whiteness,
    )

    df = spark.createDataFrame(
        [("c", 0, 1.0), ("c", 10, 2.0)],
        "channel string, ts long, value double",
    )
    with _pytest.raises(ValueError, match="consecutive multiples"):
        ljung_box_whiteness(df, (10, 30), 100)   # skips 2*step
    with _pytest.raises(ValueError, match="consecutive multiples"):
        ljung_box_whiteness(df, (20, 10), 100)   # not ascending
    with _pytest.raises(ValueError, match="consecutive multiples"):
        ljung_box_whiteness(df, (0, 10), 100)    # zero step


def test_higuchi_fd_line_is_one_and_noise_is_higher(spark):
    """A straight line has FD exactly 1 (L(k) ∝ 1/k by construction,
    quantization-exact for integer slopes); an alternating-sign noise
    proxy must come out clearly rougher; a flat channel emits the 0.0
    sentinel (never NULL — compared outputs are NULL-free)."""
    from pennsieve_streaming_spark.operators.stats import higuchi_fd

    rng = np.random.default_rng(31)
    noise = rng.integers(-50, 50, size=200)
    rows = []
    for t in range(200):
        rows.append(("line", t, float(t)))
        rows.append(("rough", t, float(noise[t])))
        rows.append(("flat", t, 5.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in higuchi_fd(df).collect()}
    assert abs(out["line"].fd - 1.0) < 1e-6
    assert out["rough"].fd > 1.5
    assert out["flat"].fd == 0.0
    assert out["line"].n == 200
    # L(1) for the line: Σ|Δxq| = 199·100, times (N−1)/(n_1·1²) = 1
    assert abs(out["line"].l1 - 19900.0) < 1e-6


def test_haar_denoise_lossless_and_noise_kill(spark):
    """factor=0 keeps every detail -> exact reconstruction; with the
    MAD threshold, small alternating noise on an aligned step dies
    while the step survives untouched."""
    from pennsieve_streaming_spark.operators.stats import haar_denoise

    clean = [100.0] * 64 + [0.0] * 64
    noisy = [v + (1.0 if i % 2 == 0 else -1.0) for i, v in enumerate(clean)]
    rows = [("c", t, noisy[t]) for t in range(128)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")

    # lossless invariant
    out0 = haar_denoise(df, 128, 4, 1, factor=0).collect()
    assert all(r.denoised == r.value for r in out0)

    # MAD threshold kills the +-1 dither, keeps the step
    out = {r.ts: r.denoised for r in haar_denoise(df, 128, 4, 1, 3).collect()}
    assert all(abs(out[t] - clean[t]) < 1e-9 for t in range(128))

    # ragged tail dropped
    df2 = spark.createDataFrame(
        rows + [("c", 200, 5.0)], "channel string, ts long, value double"
    )
    assert haar_denoise(df2, 128, 4, 1, 3).count() == 128


def test_mutual_information_dependence_vs_independence(spark):
    """y = x (a bijection of bins) gives MI = ln(B) over uniform
    bins; a constant channel gives MI = 0; independent-ish channels
    give MI near 0 and far below the coupled pair."""
    import math

    from pennsieve_streaming_spark.operators.stats import (
        mutual_information,
    )

    rows = []
    for t in range(640):
        x = float(t % 8)
        rows.append(("a", t, x))
        rows.append(("b", t, 7.0 - x))            # bijective coupling
        rows.append(("c", t, float((t // 8) % 8)))  # independent coord
        rows.append(("k", t, 4.0))                # constant
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {(r.ch_x, r.ch_y): r for r in mutual_information(df, 8).collect()}
    ab = out[("a", "b")]
    assert abs(ab.mi - math.log(8)) < 1e-6 and ab.n == 640
    assert out[("a", "k")].mi == 0.0
    # exactly uniform joint over 640 = 8*8*10 samples -> MI 0
    assert abs(out[("a", "c")].mi) <= 2e-9  # ln-quantization ulps


def test_hampel_despike_replaces_spikes_only(spark):
    """A flat-ish window with one huge spike: the spike is replaced
    by the window median, everything else passes through; a clean
    linear window has no spikes (MAD scales with the slope)."""
    from pennsieve_streaming_spark.operators.stats import hampel_despike

    rows = []
    vals = [10.0] * 16 + [11.0] * 15 + [999.0]   # spike at pos 31
    for t, v in enumerate(vals):
        rows.append(("a", t, v))
    for t in range(32):
        rows.append(("b", t, float(t)))           # clean ramp
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {(r.channel, r.ts): r for r in
           hampel_despike(df, 32, 1, 3).collect()}
    spike = out[("a", 31)]
    assert spike.is_spike is True and spike.despiked == 10.0  # median
    assert out[("a", 5)].is_spike is False
    assert out[("a", 5)].despiked == 10.0
    assert all(not out[("b", t)].is_spike for t in range(32))


def test_theil_sen_robust_to_outliers(spark):
    """A clean slope-2 line keeps slope 2 even with two wild
    outliers; OLS would be dragged far off."""
    from pennsieve_streaming_spark.operators.stats import theil_sen_slope

    day = 86_400_000_000
    rows = []
    for t in range(20):
        v = 2.0 * t
        if t in (5, 13):
            v += 500.0          # wild outliers
        rows.append(("a", t * day, v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = theil_sen_slope(df, day, 100).collect()
    assert r.n_points == 20 and r.n_pairs == 190
    assert abs(r.slope_per_day - 2.0) < 1e-9


def test_allan_variance_white_noise_scaling(spark):
    """White noise: AVAR(τ) = σ²/τ — doubling τ halves it (within
    sampling error); a linear drift has AVAR(τ) ∝ τ² exactly:
    block-mean deltas are slope·τ, so AVAR = (slope·τ)²/2."""
    import numpy as np

    from pennsieve_streaming_spark.operators.stats import allan_variance

    rng = np.random.default_rng(2)
    rows = []
    for t in range(4096):
        rows.append(("white", t, float(rng.normal())))
        rows.append(("drift", t, 0.5 * t))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {(r.channel, r.tau): r for r in
           allan_variance(df, (1, 2, 4, 8), 100).collect()}
    w1 = out[("white", 1)].avar
    w8 = out[("white", 8)].avar
    assert 4.0 < w1 / w8 < 16.0          # ~8x for white noise
    for tau in (1, 2, 4, 8):
        want = (0.5 * tau) ** 2 / 2.0
        got = out[("drift", tau)].avar
        assert abs(got - want) / want < 1e-3   # quantization-bounded
    assert out[("white", 8)].n_blocks == 512


def test_entropy_rate_deterministic_vs_noise(spark):
    """A monotone ramp visits bins in a fixed order (every transition
    deterministic -> rate 0); iid uniform noise approaches ln(B);
    a flat channel is a single self-transition (rate 0)."""
    import numpy as np

    from pennsieve_streaming_spark.operators.stats import entropy_rate

    rng = np.random.default_rng(8)
    rows = []
    for t in range(4000):
        rows.append(("ramp", t, float(t)))
        rows.append(("noise", t, float(rng.uniform(0, 1))))
        rows.append(("flat", t, 2.0))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in entropy_rate(df, 8, 100).collect()}
    assert out["ramp"].entropy_rate < 0.02        # near-deterministic
    assert out["noise"].normalized > 0.95         # near-memoryless
    assert out["flat"].entropy_rate == 0.0
    assert out["ramp"].n == 3999
