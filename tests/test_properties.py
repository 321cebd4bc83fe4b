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


@given(
    n=st.integers(min_value=1, max_value=200),
    k=st.integers(min_value=1, max_value=12),
)
def test_rfm_ntile_closed_form_matches_definition(n, k):
    """bucket = f(rank, n, k) must reproduce NTILE(k) semantics for
    EVERY (n, k): buckets 1..min(n,k); first n mod k buckets one row
    larger; monotone non-decreasing in rank."""

    def bucket(r0):
        q, rem = divmod(n, k)
        cut = rem * (q + 1)
        if r0 < cut:
            return r0 // (q + 1) + 1
        return rem + 1 + (r0 - cut) // q

    sizes = {}
    prev = 0
    for r0 in range(n):
        b = bucket(r0)
        assert 1 <= b <= min(n, k)
        assert b >= prev
        prev = b
        sizes[b] = sizes.get(b, 0) + 1
    q, rem = divmod(n, k)
    for b, c in sizes.items():
        want = (q + 1) if b <= rem else q
        assert c == want or (q == 0 and c == 1)


@given(
    xs=st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1, max_size=120,
    ),
    splits=st.integers(min_value=1, max_value=5),
    mu0=st.floats(min_value=-5, max_value=5),
)
def test_cusum_walk_chunked_equals_whole(xs, splits, mu0):
    """The shared CUSUM kernel must be exactly resumable: walking the
    series in chunks with carried state equals one whole-series walk
    bit-for-bit (the streaming contract), and the statistics are
    always >= 0 with resets after every alarm."""
    import numpy as np

    from pennsieve_streaming_spark.dsp.filtering import cusum_walk

    k, h = 0.5, 6.0
    whole = cusum_walk(xs, mu0, k, h, 0.0, 0.0)
    per = max(1, len(xs) // splits)
    gp = gn = 0.0
    parts = []
    for i in range(0, len(xs), per):
        gpos, gneg, alarm, gp, gn = cusum_walk(
            xs[i : i + per], mu0, k, h, gp, gn
        )
        parts.append((gpos, gneg, alarm))
    cat = tuple(np.concatenate([p[j] for p in parts]) for j in range(3))
    assert (cat[0] == whole[0]).all()
    assert (cat[1] == whole[1]).all()
    assert (cat[2] == whole[2]).all()
    assert (whole[0] >= 0).all() and (whole[1] >= 0).all()
    for i in range(len(xs) - 1):
        if whole[2][i]:  # post-alarm restart: next stat from 0 carry
            nxt = cusum_walk([xs[i + 1]], mu0, k, h, 0.0, 0.0)
            assert whole[0][i + 1] == nxt[0][0]
            assert whole[1][i + 1] == nxt[1][0]


@given(
    pix=st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=288, max_size=288,
    ),
    scale=st.sampled_from([1, 2, 3]),
    bright=st.integers(min_value=0, max_value=40),
)
@settings(max_examples=30, deadline=None)
def test_phash_scale_invariance_property(pix, scale, bright):
    """pHash is exactly invariant to integer upscaling (uniform block
    sums scale coefs AND median together) and within a few bits under
    a global brightness shift (only DC and the median can move)."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import phash64

    g = np.array(pix, dtype=np.int64).reshape(16, 18)
    base = phash64(g)
    up = np.kron(g, np.ones((scale, scale), dtype=np.int64))
    assert phash64(up) == base
    shifted = phash64(g + bright)
    ham = bin((base ^ shifted) & (2**64 - 1)).count("1")
    assert ham <= 16  # DC bit + median-crossing bits only


def test_permutation_entropy_monotone_invariance(spark):
    """Ordinal patterns see only the ORDER: any strictly increasing
    transform of the values leaves every pattern count and the
    entropy bit-identical (cubing preserves order and, on integer
    inputs, quantization exactness)."""
    import random

    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )

    rng = random.Random(53)
    base = [rng.randrange(-40, 41) for _ in range(256)]
    rows_a = [("c", t, float(v)) for t, v in enumerate(base)]
    # strictly increasing transform: x -> x^3 (integer-exact at
    # quant=1 scale; use quant=1 so rounding can't differ)
    rows_b = [("c", t, float(v ** 3)) for t, v in enumerate(base)]
    df_a = spark.createDataFrame(rows_a, "channel string, ts long, value double")
    df_b = spark.createDataFrame(rows_b, "channel string, ts long, value double")
    a = {r.win: (r.c0, r.c1, r.c2, r.c3, r.c4, r.c5, r.pe_norm)
         for r in permutation_entropy(df_a, 64, 1).collect()}
    b = {r.win: (r.c0, r.c1, r.c2, r.c3, r.c4, r.c5, r.pe_norm)
         for r in permutation_entropy(df_b, 64, 1).collect()}
    assert a == b and len(a) == 4


def test_cfar_integer_scale_invariance(spark):
    """CFAR is a ratio test: scaling integer-valued inputs by an
    integer constant leaves the fired set identical (quantization
    stays exact at quant=1 x integer scale)."""
    import random

    from pennsieve_streaming_spark.operators.stats import cfar_peaks

    rng = random.Random(59)
    vals = [rng.randrange(1, 8) for _ in range(80)]
    vals[40] = 100  # a spike
    rows_a = [("c", t, float(v)) for t, v in enumerate(vals)]
    rows_b = [("c", t, float(7 * v)) for t, v in enumerate(vals)]
    df_a = spark.createDataFrame(rows_a, "channel string, ts long, value double")
    df_b = spark.createDataFrame(rows_b, "channel string, ts long, value double")
    fired_a = {r.ts for r in cfar_peaks(df_a, 8, 2, 3, 1, 1).collect()}
    fired_b = {r.ts for r in cfar_peaks(df_b, 8, 2, 3, 1, 1).collect()}
    assert fired_a == fired_b
    assert 40 in fired_a


def test_mips_equals_cosine_on_unit_norms(spark):
    """On an exactly-unit-norm corpus the MIPS and cosine rankings
    coincide (dot == cosine when |v| = |q| = 1) — the invariant that
    distinguishes the two rankers is norm variation alone."""
    from pennsieve_streaming_spark.llm.similarity import (
        cosine_topk,
        mips_topk,
    )

    import math
    import random

    rng = random.Random(61)
    rows = []
    for i in range(30):
        a = rng.uniform(0, 2 * math.pi)
        b = rng.uniform(0, 2 * math.pi)
        rows.append((i, [
            math.cos(a) * math.cos(b),
            math.cos(a) * math.sin(b),
            math.sin(a),
        ]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.filter("vec_id < 4")
    cos = {(r.query_id, r.rank): r.neighbor_id
           for r in cosine_topk(df, qs, k=5).collect()}
    mips = {(r.query_id, r.rank): r.neighbor_id
            for r in mips_topk(df, qs, k=5).collect()}
    assert cos == mips


@given(
    a=st.floats(min_value=0.1, max_value=1e6),
    d=st.floats(min_value=-3.0, max_value=3.0),
)
def test_higuchi_weights_recover_exact_power_laws(a, d):
    """The LSQ weights satisfy Σc = 0 (intercept-invariant) and
    recover the exponent exactly on L(k) = A·k^(−d): the defining
    algebra of the log-log fit."""
    from pennsieve_streaming_spark.operators.stats import (
        _higuchi_fd_coeffs,
    )

    cs = _higuchi_fd_coeffs(5)
    assert abs(sum(cs)) < 1e-12
    got = sum(
        c * math.log(a * (k + 1.0) ** (-d)) for k, c in enumerate(cs)
    )
    assert abs(got - d) < 1e-9 * max(1.0, abs(d))


@given(
    c=st.integers(min_value=-1000, max_value=1000),
    s=st.integers(min_value=1, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60)
def test_sobel_stats_shift_and_scale_covariance(c, s, seed):
    """Sobel energy is shift-invariant (gradients kill constants) and
    scales quadratically; the edge count is invariant when the
    threshold scales with s^2."""
    from pennsieve_streaming_spark.llm.imagehash import sobel_stats

    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, size=(9, 11))
    n0, e0, s0, m0 = sobel_stats(g, t2=50_000)
    n1, e1, s1, m1 = sobel_stats(g + c, t2=50_000)
    assert (n0, e0, s0, m0) == (n1, e1, s1, m1)
    n2, e2_, s2, m2 = sobel_stats(g * s, t2=50_000 * s * s)
    assert (n2, e2_, s2, m2) == (n0, e0, s0 * s * s, m0 * s * s)


def test_circadian_literals_roundtrip_exactly():
    """The .17e scientific literals parse back to the exact doubles
    both engines must fold — the DECIMAL-literal hazard fence."""
    for h in range(24):
        for f in (math.cos, math.sin):
            x = f(2.0 * math.pi * h / 24.0)
            assert float(f"{x:.17e}") == x
