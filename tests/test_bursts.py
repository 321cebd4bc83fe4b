"""Kleinberg burst-detection tests: the forward/backward labeling vs
exhaustive enumeration, planted-burst recovery, and the no-burst
null case."""

from __future__ import annotations

import itertools

import numpy as np

from pennsieve_streaming_spark.operators.bursts import (
    NANO,
    burst_states,
    kleinberg_bursts,
)


def _enum_label(c0, c1, trans_q):
    """Brute force: cost of every state sequence (start state 0, pay
    trans_q on each 0→1 edge incl. entry); gap i is labeled 1 iff
    EVERY minimum-cost sequence has state 1 there — exactly the
    forward/backward rule with its ties-to-0 convention."""
    n = len(c0)
    best = None
    opts = []
    for seq in itertools.product((0, 1), repeat=n):
        cost = 0
        prev = 0
        for i, s in enumerate(seq):
            if s == 1 and prev == 0:
                cost += trans_q
            cost += c1[i] if s else c0[i]
            prev = s
        if best is None or cost < best:
            best, opts = cost, [seq]
        elif cost == best:
            opts.append(seq)
    return [1 if all(seq[i] for seq in opts) else 0 for i in range(n)]


def test_burst_states_match_enumeration():
    rng = np.random.default_rng(5)
    for _ in range(30):
        n = int(rng.integers(2, 11))
        x = rng.integers(1, 100, size=n).astype(np.float64)
        lam0 = float(n / x.sum())
        lam1 = 2.5 * lam0
        lnq0 = int(round(np.log(lam0) * NANO))
        lnq1 = int(round(np.log(lam1) * NANO))
        trans_q = int(round(0.4 * np.log(n) * NANO))
        got = burst_states(x, lam0, lam1, lnq0, lnq1, trans_q).tolist()
        c0 = (np.floor(lam0 * x * NANO + 0.5).astype(np.int64) - lnq0).tolist()
        c1 = (np.floor(lam1 * x * NANO + 0.5).astype(np.int64) - lnq1).tolist()
        assert got == _enum_label(c0, c1, trans_q)


def test_planted_burst_recovered(spark):
    """A dense 30-event cluster inside a sparse regular stream is
    detected as one burst covering the cluster; the same stream
    without the cluster yields no bursts."""
    sparse = [i * 1_000_000 for i in range(60)]
    dense = [30_000_000 + 5_000 + i * 10_000 for i in range(30)]
    rows = [("bursty", t) for t in sorted(sparse + dense)]
    rows += [("calm", t) for t in sparse]
    df = spark.createDataFrame(rows, "channel string, ts long")
    out = kleinberg_bursts(df, s=3.0, gamma=1.0).collect()
    by_ch = {}
    for r in out:
        by_ch.setdefault(r.channel, []).append(r)
    assert "calm" not in by_ch
    assert len(by_ch["bursty"]) == 1
    b = by_ch["bursty"][0]
    assert b.start_ts <= 30_005_000 and b.end_ts >= dense[-1]
    assert b.n_gaps >= 29


def test_degenerate_channels_drop(spark):
    rows = [("one", 5), ("two", 5), ("two", 9), ("dup", 7), ("dup", 7),
            ("dup", 7)]
    df = spark.createDataFrame(rows, "channel string, ts long")
    # one: no gaps; two: 1 gap (< 2); dup: span 0 — all drop
    assert kleinberg_bursts(df).count() == 0
