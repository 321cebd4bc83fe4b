"""DTW channel-similarity tests: kernel goldens, elastic-alignment
semantics, and the PAA sketch contract."""

from __future__ import annotations

import numpy as np

from pennsieve_streaming_spark.operators.dtw import (
    dtw_channel_distances,
    dtw_int,
    paa_sketch,
)


def test_dtw_kernel_goldens():
    a = np.array([1, 5, 2], dtype=np.int64)
    b = np.array([1, 2, 8, 2], dtype=np.int64)
    # hand-checked DP: |1-1|=0, warp 5→8 (cost 3), 2→2 ends at 4 total
    assert dtw_int(a, b) == 4
    assert dtw_int(a, a) == 0
    # symmetric
    assert dtw_int(b, a) == 4
    # single-element sequences: plain absolute difference
    assert dtw_int(np.array([7], dtype=np.int64), np.array([3], dtype=np.int64)) == 4


def test_dtw_elastic_beats_lockstep():
    """A one-step time shift of a spiky sequence is nearly free for
    DTW but expensive lockstep — the property DTW exists for."""
    base = np.array([0, 0, 100, 0, 0, 100, 0, 0], dtype=np.int64)
    shifted = np.array([0, 0, 0, 100, 0, 0, 100, 0], dtype=np.int64)
    lockstep = int(np.abs(base - shifted).sum())
    assert lockstep == 400
    assert dtw_int(base, shifted) == 0  # perfect elastic alignment
    # but endpoints are boundary-pinned: a trailing mismatch is paid
    tail = np.array([0, 0, 100, 0, 0, 100, 0, 100], dtype=np.int64)
    assert dtw_int(base, tail) == 100


def test_paa_sketch_exact_means_and_incomplete_drop(spark):
    rows = [("c1", t, float(t)) for t in range(10)]  # 10 rows, seg=4
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    sk = {r.seg: r.pq for r in paa_sketch(df, 4, 8, 100).collect()}
    # segs: [0..3] mean 1.5 → 150; [4..7] mean 5.5 → 550; tail dropped
    assert sk == {0: 150, 1: 550}


def test_dtw_channel_distances_shifted_copy(spark):
    """Channel y = x delayed by one segment: normalized DTW collapses
    to (near) zero while the value ranges differ enough that an
    unaligned metric would not."""
    rows = []
    seg = 8
    vals = [0.0, 0.0, 50.0, 0.0, 0.0, 50.0, 0.0, 0.0]  # per-seg means
    for s, v in enumerate(vals):
        for k in range(seg):
            rows.append(("x", s * seg + k, v))
            rows.append(("y", s * seg + k, vals[s - 1] if s else 0.0))
            rows.append(("z", s * seg + k, 7.0))  # flat unrelated
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {
        (r.channel_a, r.channel_b): r
        for r in dtw_channel_distances(df, seg, 8, 100).collect()
    }
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    xy = out[("x", "y")]
    assert xy.la == 8 and xy.lb == 8
    assert xy.dtw_q == 0  # elastic alignment absorbs the shift
    # x vs flat z: two 50-spikes can't be warped away
    assert out[("x", "z")].dtw_q > 0
    assert abs(
        xy.dtw_norm - xy.dtw_q / (100 * (xy.la + xy.lb))
    ) < 1e-12
