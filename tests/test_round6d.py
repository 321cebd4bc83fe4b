"""Unit goldens for the round-6d amplitude-domain EEG features:
line length / median-crossing rate, Teager-Kaiser energy, and
burst-suppression ratio."""

from __future__ import annotations

from pyspark.sql import functions as F


def _samples(spark, rows):
    return spark.createDataFrame(rows, "channel string, ts long, value double")


# --- line length + median crossings -----------------------------------------

def test_line_length_golden(spark):
    from pennsieve_streaming_spark.operators.stats import (
        line_length_features,
    )

    # xq = [200, -100, 100, -200]; sorted [-200, -100, 100, 200],
    # k = (4+1)//2 = 2 -> med_q = -100.
    # ll_q = |−300| + |200| + |−300| = 800 -> line_length 8.0.
    # (x−med) = [300, 0, 200, −100]: one strict sign flip (200·−100).
    rows = [("c", 0, 2.0), ("c", 1, -1.0), ("c", 2, 1.0), ("c", 3, -2.0)]
    out = line_length_features(_samples(spark, rows), 4, 100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.ll_q, r.line_length, r.crossings) == (4, 800, 8.0, 1)
    assert abs(r.zcr - 1 / 3) < 1e-12


def test_line_length_flat_signal_zero(spark):
    from pennsieve_streaming_spark.operators.stats import (
        line_length_features,
    )

    rows = [("c", t, 5.0) for t in range(8)]
    out = line_length_features(_samples(spark, rows), 8, 100).collect()
    assert len(out) == 1
    assert (out[0].ll_q, out[0].crossings) == (0, 0)


def test_line_length_ragged_tail_dropped(spark):
    from pennsieve_streaming_spark.operators.stats import (
        line_length_features,
    )

    rows = [("c", t, float(t)) for t in range(10)]  # 1 full + tail 2
    out = line_length_features(_samples(spark, rows), 8, 100).collect()
    assert [r.win for r in out] == [0]


def test_line_length_median_centering_positive_signal(spark):
    from pennsieve_streaming_spark.operators.stats import (
        line_length_features,
    )

    # All-positive alternating signal: literal zero-crossings would be
    # 0, but the median-centered count sees every flip about med.
    # xq alternates 1000, 3000; med (k=4th of 8 sorted) = 1000 ->
    # (x−med) alternates 0, 2000: products all 0 -> no strict flips.
    # Shift one sample below: [10,30,10,30,5,30,10,30]
    # sorted xq: [500,1000,1000,1000,3000,3000,3000,3000], k=4 ->
    # med=1000; x-med: [0,2000,0,2000,-500,2000,0,2000] -> strict
    # flips at (2000,-500) and (-500,2000) = 2 crossings.
    vals = [10.0, 30.0, 10.0, 30.0, 5.0, 30.0, 10.0, 30.0]
    rows = [("c", t, v) for t, v in enumerate(vals)]
    out = line_length_features(_samples(spark, rows), 8, 100).collect()
    assert out[0].crossings == 2


# --- Teager-Kaiser energy ----------------------------------------------------

def test_tkeo_constant_signal_zero(spark):
    from pennsieve_streaming_spark.operators.stats import tkeo_energy

    rows = [("c", t, 7.0) for t in range(8)]
    out = tkeo_energy(_samples(spark, rows), 8, 100).collect()
    assert len(out) == 1
    assert (out[0].n_valid, out[0].tkeo_sum_q, out[0].tkeo_mq) == (6, 0, 0)


def test_tkeo_linear_ramp_unit_energy(spark):
    from pennsieve_streaming_spark.operators.stats import tkeo_energy

    # x_n = n: psi = n² − (n−1)(n+1) = 1 per interior sample, scaled
    # by quant² -> mean TKEO = 1.0 -> 1000 milli-units exactly.
    rows = [("c", t, float(t)) for t in range(16)]
    out = tkeo_energy(_samples(spark, rows), 16, 100).collect()
    assert len(out) == 1
    assert (out[0].n_valid, out[0].tkeo_sum_q, out[0].tkeo_mq) == (
        14, 14 * 100 * 100, 1000,
    )


def test_tkeo_spike_dominates_power(spark):
    from pennsieve_streaming_spark.operators.stats import tkeo_energy

    # A single-sample spike on a flat background: TKEO flags the
    # transient with energy ≈ spike² while plain variance dilutes it.
    base = [1.0] * 16
    base[8] = 50.0
    rows = [("c", t, v) for t, v in enumerate(base)]
    out = tkeo_energy(_samples(spark, rows), 16, 100).collect()
    # psi at the spike = 50² − 1·1 = 2499 (quant²-scaled); the two
    # neighbours contribute 1 − 1·50 = −49 each.
    assert out[0].tkeo_sum_q == (2499 - 49 - 49) * 100 * 100


def test_tkeo_ragged_tail_dropped(spark):
    from pennsieve_streaming_spark.operators.stats import tkeo_energy

    rows = [("c", t, float(t)) for t in range(20)]  # one full 16 + 4
    out = tkeo_energy(_samples(spark, rows), 16, 100).collect()
    assert [r.win for r in out] == [0]


# --- burst suppression -------------------------------------------------------

def test_burst_suppression_counts_runs_only(spark):
    from pennsieve_streaming_spark.operators.stats import (
        burst_suppression,
    )

    # 32 samples: high background 10.0 (aq=1000, med=1000), one run
    # of 6 low samples (0.1 -> 2·10 < 1000 suppressed) and one
    # isolated low sample. min_run=4: only the 6-run counts.
    vals = [10.0] * 32
    for t in range(8, 14):
        vals[t] = 0.1
    vals[20] = 0.1
    rows = [("c", t, v) for t, v in enumerate(vals)]
    out = {r.win: r for r in
           burst_suppression(_samples(spark, rows), 16, 100, 4).collect()}
    assert out[0].suppressed_n == 6 and out[0].n == 16
    assert abs(out[0].bsr - 6 / 16) < 1e-12
    assert out[1].suppressed_n == 0


def test_burst_suppression_run_crosses_window_boundary(spark):
    from pennsieve_streaming_spark.operators.stats import (
        burst_suppression,
    )

    # Run of 6 straddling the window edge (positions 14..19 over
    # ws=16): 2 samples land in win 0, 4 in win 1 — each window
    # counts its own members of the same run.
    vals = [10.0] * 32
    for t in range(14, 20):
        vals[t] = 0.1
    rows = [("c", t, v) for t, v in enumerate(vals)]
    out = {r.win: r for r in
           burst_suppression(_samples(spark, rows), 16, 100, 4).collect()}
    assert out[0].suppressed_n == 2
    assert out[1].suppressed_n == 4


def test_burst_suppression_short_runs_never_count(spark):
    from pennsieve_streaming_spark.operators.stats import (
        burst_suppression,
    )

    vals = [10.0] * 16
    vals[3] = vals[4] = vals[5] = 0.1  # run of 3 < min_run 4
    rows = [("c", t, v) for t, v in enumerate(vals)]
    out = burst_suppression(_samples(spark, rows), 16, 100, 4).collect()
    assert out[0].suppressed_n == 0 and out[0].bsr == 0.0


def test_burst_suppression_tail_window_included(spark):
    from pennsieve_streaming_spark.operators.stats import (
        burst_suppression,
    )

    # 20 samples, ws=16: tail window of 4 IS emitted (suppression at
    # the recording tail matters), fully suppressed.
    vals = [10.0] * 16 + [0.1] * 4
    rows = [("c", t, v) for t, v in enumerate(vals)]
    out = {r.win: r for r in
           burst_suppression(_samples(spark, rows), 16, 100, 4).collect()}
    assert out[1].n == 4 and out[1].suppressed_n == 4 and out[1].bsr == 1.0


# --- Gini concentration ------------------------------------------------------

def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_gini_uniform_is_zero(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        gini_concentration,
    )

    rows = [("a", u) for u in range(5) for _ in range(3)]
    out = gini_concentration(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_users, r.total_events, r.gini) == (5, 15, 0.0)


def test_gini_single_dominant_user(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        gini_concentration,
    )

    # counts [1, 1, 1, 1, 96]: G = Σ(2i−n−1)x / (n·Σx)
    # = (−4·1 −2·1 +0·1 +2·1 +4·96) / (5·100) = 380/500 = 0.76
    rows = [("a", u) for u in range(4)]
    rows += [("a", 99)] * 96
    r = gini_concentration(_events(spark, rows)).collect()[0]
    assert abs(r.gini - 0.76) < 1e-12


def test_gini_per_type_independent(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        gini_concentration,
    )

    # type "a" uniform (G=0), type "b" concentrated — the shared
    # global rank must not leak ranks across types.
    rows = [("a", u) for u in range(4)]
    rows += [("b", 1)] * 9 + [("b", 2)]
    out = {r.event_type: r for r in
           gini_concentration(_events(spark, rows)).collect()}
    assert out["a"].gini == 0.0
    # b: counts [1, 9], n=2: (−1·1 + 1·9) / (2·10) = 0.4
    assert abs(out["b"].gini - 0.4) < 1e-12


# --- permutation entropy -----------------------------------------------------

def test_permutation_entropy_monotone_is_zero(spark):
    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )

    rows = [("c", t, float(t)) for t in range(8)]
    out = permutation_entropy(_samples(spark, rows), 8, 100).collect()
    assert len(out) == 1
    r = out[0]
    # every triple is ascending -> all 6 counts on pattern 0
    assert (r.n, r.nt, r.c0) == (8, 6, 6)
    assert (r.c1, r.c2, r.c3, r.c4, r.c5) == (0, 0, 0, 0, 0)
    assert r.pe_norm == 0.0


def test_permutation_entropy_alternating(spark):
    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )
    import math

    # x = [0, 1, 0, 1, 0, 1, 0, 1]: triples alternate between
    # (0,1,0) -> a<=b, b>c, a<=c (tie, earlier wins) -> pattern 1
    # (1,0,1) -> a>b, a<=c (tie) ... a<=c is 1<=1 true -> pattern 3
    rows = [("c", t, float(t % 2)) for t in range(8)]
    out = permutation_entropy(_samples(spark, rows), 8, 100).collect()
    r = out[0]
    assert (r.c1, r.c3) == (3, 3)
    assert r.c0 == r.c2 == r.c4 == r.c5 == 0
    # two equal-mass patterns -> H = ln 2, normalized by ln 6
    expected = math.log(2) / math.log(6)
    assert abs(r.pe_norm - expected) < 1e-6


def test_permutation_entropy_all_patterns_uniform(spark):
    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )

    # one window per pattern id x 6, each window built to realize a
    # single known ordinal pattern repeated (window = 3 samples would
    # give one triple; use ws=3)
    seqs = {
        0: [1.0, 2.0, 3.0],   # a<=b<=c
        1: [1.0, 3.0, 2.0],   # a<=c<b
        2: [2.0, 3.0, 1.0],   # c<a<=b
        3: [2.0, 1.0, 3.0],   # b<a<=c
        4: [3.0, 1.0, 2.0],   # b<=c<a
        5: [3.0, 2.0, 1.0],   # c<b<a
    }
    rows = []
    for pid, seq in seqs.items():
        for t, v in enumerate(seq):
            rows.append((f"ch{pid}", t, v))
    out = permutation_entropy(_samples(spark, rows), 3, 100).collect()
    assert len(out) == 6
    for r in out:
        pid = int(r.channel[2:])
        counts = [r.c0, r.c1, r.c2, r.c3, r.c4, r.c5]
        assert counts[pid] == 1 and sum(counts) == 1, (r.channel, counts)
        assert r.pe_norm == 0.0


def test_permutation_entropy_ragged_tail_dropped(spark):
    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )

    rows = [("c", t, float(t * t % 7)) for t in range(11)]
    out = permutation_entropy(_samples(spark, rows), 8, 100).collect()
    assert len(out) == 1 and out[0].win == 0


# --- Lempel-Ziv complexity ----------------------------------------------------

def _lz76_kaspar_schuster(s: str) -> int:
    """Independent reference: the Kaspar & Schuster (1987) pointer
    algorithm, structurally different from the kernel's phrase parse."""
    n = len(s)
    if n == 0:
        return 0
    c, l, i, k, k_max = 1, 1, 0, 1, 1
    while True:
        if l + k - 1 >= n:
            c += 1
            break
        if s[i + k - 1] == s[l + k - 1]:
            k += 1
        else:
            k_max = max(k_max, k)
            i += 1
            if i == l:
                c += 1
                l += k_max
                if l + 1 > n:
                    break
                i, k, k_max = 0, 1, 1
            else:
                k = 1
    return c


def test_lz76_kernel_vs_independent_reference():
    import random

    from pennsieve_streaming_spark.operators.stats import (
        lz76_phrase_count,
    )

    assert lz76_phrase_count("0" * 16) == 2
    assert lz76_phrase_count("01" * 8) == 3
    assert lz76_phrase_count("0001101001000101") == 6  # K&S's example
    rng = random.Random(11)
    for trial in range(40):
        n = rng.randrange(2, 160)
        s = "".join(rng.choice("01") for _ in range(n))
        assert lz76_phrase_count(s) == _lz76_kaspar_schuster(s), s


def test_lz_complexity_windows(spark):
    from pennsieve_streaming_spark.operators.stats import lz_complexity

    rows = []
    # channel "flat": constant -> bits all 0 -> c = 2
    rows += [("flat", t, 5.0) for t in range(8)]
    # channel "alt": alternating about the median -> c = 3
    rows += [("alt", t, float(t % 2)) for t in range(8)]
    # ragged tail on "alt" (3 extra samples) must be dropped
    rows += [("alt", 8 + t, 9.0) for t in range(3)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {r.channel: r for r in lz_complexity(df, 8, 100).collect()}
    assert len(out) == 2
    assert (out["flat"].c_phrases, out["flat"].ones) == (2, 0)
    # median of [0,1]*4 is 0 (lower), bits = 01010101 -> ones 4, c 3
    assert (out["alt"].c_phrases, out["alt"].ones) == (3, 4)
    assert out["alt"].lz_norm == 3 * 3.0 / 8  # log2(8) literal
