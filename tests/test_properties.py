"""Property-based tests (hypothesis) for the pure arithmetic the
reference pins with hand-computed goldens — a cheap win the reference's
own suite lacks (SURVEY §5)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from pennsieve_streaming_spark.datamodel import sample_count
from pennsieve_streaming_spark.dsp.butterworth import reflected_prewarm
from pennsieve_streaming_spark.operators.downsample import (
    resample_chunk_params,
    should_resample,
)
from pennsieve_streaming_spark.operators.gaps import time_gap_threshold

import numpy as np


@given(
    m=st.integers(min_value=1, max_value=500),
    n=st.integers(min_value=1, max_value=50),
)
def test_cut_closed_form_is_total_and_monotone(m, n):
    """Every index lands in a valid slice; assignment is monotone
    non-decreasing; slice boundaries match round(i*m/n)."""
    targets = [int(math.floor(i * m / n + 0.5)) for i in range(n + 1)]
    prev = 0
    for j in range(m):
        b = (((2 * j + 1) * n) - 1) // (2 * m)
        assert 0 <= b < n
        assert b >= prev
        assert targets[b] <= j < targets[b + 1]
        prev = b


@given(
    pixel=st.integers(min_value=1, max_value=10**8),
    rate=st.floats(min_value=0.1, max_value=50_000, allow_nan=False),
    dur=st.integers(min_value=1, max_value=10**10),
)
def test_chunk_params_invariants(pixel, rate, dur):
    chunk, n, t = resample_chunk_params(pixel, rate, dur)
    assert chunk >= 0 and n >= 0
    if chunk:
        total = dur / 1e6 * rate
        assert n <= total / chunk
        assert abs(t - chunk / rate * 1e6) < 1e-6 * max(1.0, t)


@given(rate=st.floats(min_value=0.01, max_value=100_000))
def test_resample_threshold_consistency(rate):
    period = 1e6 / rate
    just_over = int(period * 3) + 1
    assert should_resample(rate, just_over) == (just_over / period > 3.0)


@given(
    rate=st.floats(min_value=0.01, max_value=100_000),
    mult=st.floats(min_value=0.1, max_value=100),
)
def test_gap_threshold_floor(rate, mult):
    thr = time_gap_threshold(rate, mult)
    exact = (1e6 / rate) * mult
    assert thr <= exact < thr + 1


@given(dur=st.integers(min_value=0, max_value=10**12),
       rate=st.floats(min_value=0.01, max_value=100_000))
def test_sample_count_is_scala_round(dur, rate):
    # Scala Math.round(x) = floor(x + 0.5)
    assert sample_count(dur, rate) == math.floor(dur / 1e6 * rate + 0.5)


@settings(max_examples=200)
@given(
    n=st.integers(min_value=0, max_value=40),
    req=st.integers(min_value=1, max_value=60),
)
def test_reflected_prewarm_length_and_values(n, req):
    x = np.arange(float(n))
    out = reflected_prewarm(x, req)
    assert len(out) == req
    if n:
        assert set(out).issubset(set(x))  # only source values (or repeats)
    else:
        assert (out == 0).all()
