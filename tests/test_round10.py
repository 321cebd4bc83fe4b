"""Round-10 additions: bloom-ladder headroom (64 Mib, loud clamp,
ValueError off-ladder), the vectorized word-array builder, and the
rotation fallback loudness."""

from __future__ import annotations

import os
import sys
import warnings

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


# --- ladder validation (ADVICE r9) -------------------------------------


def test_bloom_p2_off_ladder_raises_value_error():
    from pennsieve_streaming_spark.llm.curation import (
        _BLOOM_LADDER,
        bloom_pos_expr,
        bloom_pos_py,
    )

    for bad in (0, 1, 1000, 16_383, 16_385, 2_000_000):
        with pytest.raises(ValueError, match="not on the ladder"):
            bloom_pos_py(42, 0, bad)
        with pytest.raises(ValueError, match="not on the ladder"):
            bloom_pos_expr("h", 0, bad)
    # the error names every valid size
    try:
        bloom_pos_py(42, 0, 12345)
    except ValueError as exc:
        for m, _ in _BLOOM_LADDER:
            assert str(m) in str(exc)


def test_ladder_primes_are_largest_below_m():
    """Each rung's second-mix prime is the LARGEST prime < m (the
    documented pairing rule) — re-derived here by trial division."""
    from pennsieve_streaming_spark.llm.curation import _BLOOM_LADDER

    def is_prime(n):
        if n < 2:
            return False
        i = 2
        while i * i <= n:
            if n % i == 0:
                return False
            i += 1 if i == 2 else 2
        return True

    ms = [m for m, _ in _BLOOM_LADDER]
    assert ms == sorted(ms) and all(m & (m - 1) == 0 for m in ms)
    assert ms[-1] == 67_108_864  # 64 Mib top rung (r10)
    for m, p2 in _BLOOM_LADDER:
        assert is_prime(p2) and p2 < m
        assert all(not is_prime(q) for q in range(p2 + 1, m))


def test_contamination_screened_rejects_off_ladder_n_bits(spark):
    from pennsieve_streaming_spark.llm.curation import (
        contamination_screened,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="not on the ladder"):
        contamination_screened(docs, docs, k=3, n_bits=10_000)


# --- vectorized word builder: parity with the scalar rule ---------------


def test_bloom_words_vectorized_matches_scalar_rule():
    """The numpy path must be bit-identical to the documented scalar
    fold (bloom_pos_py + |= + signed-int64 wrap) on every rung size
    class, including hashes that exercise the sign-bit mask."""
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_PROBES,
        bloom_pos_py,
        bloom_words_from_hashes,
    )

    hs = [
        12345678901234567,
        999,
        42,
        2**62 + 7,
        -1,
        -(2**63),
        2**63 - 1,
        -987654321987654321,
    ]
    for m in (16_384, 131_072, 2_097_152):
        expect = [0] * (m // 64)
        for h in hs:
            for i in range(BLOOM_PROBES):
                p = bloom_pos_py(h, i, m)
                expect[p // 64] |= 1 << (p % 64)
        expect = [w - (1 << 64) if w >= 1 << 63 else w for w in expect]
        assert bloom_words_from_hashes(hs, m) == expect
    assert bloom_words_from_hashes([], 16_384) == [0] * 256


def test_bloom_top_rung_selectivity_at_100k_scale():
    """~100k-shingle benchmark on the auto-sized rung (2 Mib = ~21
    bits/element): random non-member probes must pass the 3-probe
    test at <= ~5e-3 — i.e. the screen STAYS selective where the old
    1 Mib clamp would have degraded it (VERDICT r9 item 2). Pure
    Python/numpy (no Spark) so it runs in seconds."""
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_PROBES,
        bloom_bits_for,
        bloom_pos_py,
        bloom_words_from_hashes,
    )

    n = 100_000
    # deterministic pseudo-hashes (LCG over the full int64 range)
    member = [(1103515245 * i + 12345) * 2654435761 % (1 << 64) - (1 << 63)
              for i in range(n)]
    m = bloom_bits_for(n)
    assert m == 2_097_152 and m >= 16 * n
    words = bloom_words_from_hashes(member, m)
    uw = [w + (1 << 64) if w < 0 else w for w in words]

    def hit(h):
        for i in range(BLOOM_PROBES):
            p = bloom_pos_py(h, i, m)
            if not (uw[p // 64] >> (p % 64)) & 1:
                return False
        return True

    # members: no false negatives, ever
    assert all(hit(h) for h in member[:2000])
    # disjoint probe set: FP rate bounded (expected ~2e-3 at 21
    # bits/element; assert a loose 1e-2 so the test never flakes)
    probes = [(2246822519 * i + 777) * 2654435761 % (1 << 64) - (1 << 63)
              for i in range(20_000)]
    fp = sum(1 for h in probes if h not in set(member) and hit(h))
    assert fp / len(probes) < 0.01


# --- rotation fallback loudness (ADVICE r9) -----------------------------


def test_rotation_order_warns_on_tool_regression(monkeypatch):
    """A rotation_plan failure that is NOT a bare-checkout case must
    emit a RuntimeWarning, not silently reorder the gate."""
    import __spark_entry__ as entry

    tools = os.path.join(
        os.path.dirname(os.path.abspath(entry.__file__)), "tools"
    )
    if tools not in sys.path:
        sys.path.insert(0, tools)
    sys.modules.pop("rotation_plan", None)
    import rotation_plan  # noqa: F401 — resolvable, then broken

    def boom(names):
        raise ValueError("corrupt CORRECTNESS history")

    monkeypatch.setattr(
        sys.modules["rotation_plan"], "priority_order", boom
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = entry._rotation_order(["a", "b"])
    assert out == ["a", "b"]
    assert any(
        issubclass(x.category, RuntimeWarning)
        and "rotation_plan" in str(x.message)
        for x in w
    )
    sys.modules.pop("rotation_plan", None)


def test_rotation_order_quiet_on_import_error(monkeypatch):
    """Bare-checkout case (tools/ unimportable) stays quiet."""
    import builtins

    import __spark_entry__ as entry

    sys.modules.pop("rotation_plan", None)
    real_import = builtins.__import__

    def no_tool(name, *a, **k):
        if name == "rotation_plan":
            raise ImportError("bare checkout")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tool)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = entry._rotation_order(["a", "b"])
    assert out == ["a", "b"]
    assert not [x for x in w if issubclass(x.category, RuntimeWarning)]


# --- wave-1 operators: hand goldens --------------------------------------


def _chan(spark, vals, channel="c"):
    rows = [(channel, i * 1_000_000, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "channel string, ts long, value double"
    )


def test_arch_lm_golden(spark):
    from pennsieve_streaming_spark.operators.stats import arch_lm

    out = arch_lm(_chan(spark, [0, 1, 0, 3, 0, 3, 0, 1]), quant=1).collect()
    assert len(out) == 1
    r = out[0]
    # mean = round(8/8) = 1; e = [-1,0,-1,2,-1,2,-1,0]; s = e^2
    # pairs (s_{t-1}, s_t): n=7, sx=12, sy=11, sxy=16, sxx=36, syy=35
    num = 7 * 16 - 12 * 11
    den = (7 * 36 - 12 * 12) * (7 * 35 - 11 * 11)
    lm = round(7 * (num * num / den), 9)
    assert r.n_pairs == 7 and r.lm_stat == lm
    assert r.arch_present == (lm > 3.841)


def test_arch_lm_constant_variance_is_zero(spark):
    from pennsieve_streaming_spark.operators.stats import arch_lm

    # squares of the demeaned series are constant -> zero variance ->
    # the 0.0 sentinel, never a NaN
    r = arch_lm(_chan(spark, [0, 10, 0, 10, 0, 10]), quant=1).collect()[0]
    assert r.lm_stat == 0.0 and not r.arch_present


def test_process_capability_golden(spark):
    import math

    from pennsieve_streaming_spark.operators.stats import (
        process_capability,
    )

    r = process_capability(
        _chan(spark, [10, 20, 30]), lsl=0.0, usl=40.0, quant=100
    ).collect()[0]
    var = 14_000_000 / 3 - 2000.0 * 2000.0
    sd = math.sqrt(var) / 100.0
    assert r.n == 3 and r.mean_v == 20.0
    assert r.sd_v == round(sd, 9)
    assert r.cp == round(40.0 / (6 * sd), 9)
    assert r.cpk == round(20.0 / (3 * sd), 9)
    assert not r.capable


def test_process_capability_zero_variance_sentinel(spark):
    from pennsieve_streaming_spark.operators.stats import (
        process_capability,
    )

    r = process_capability(
        _chan(spark, [5, 5, 5]), lsl=0.0, usl=10.0, quant=100
    ).collect()[0]
    assert r.sd_v == 0.0 and r.cp == 0.0 and r.cpk == 0.0
    assert not r.capable


def test_ks_two_sample_golden(spark):
    from pennsieve_streaming_spark.operators.stats import ks_two_sample

    a = _chan(spark, [1, 2, 3], "a")
    b = _chan(spark, [3, 4, 5], "b")
    r = ks_two_sample(a.unionByName(b), "a", "b", quant=1).collect()
    assert len(r) == 1
    r = r[0]
    # pooled grid 1..5: cum_a = 1,2,3,3,3; cum_b = 0,0,1,2,3
    # d_num = max |3*cum_a - 3*cum_b| = 6; D = 6/9
    assert (r.n_a, r.n_b, r.d_num) == (3, 3, 6)
    assert r.d_stat == round(6 / 9, 9)
    assert not r.reject_5pct   # 0.667 < 1.358*sqrt(6/9) = 1.109


def test_ks_two_sample_identical_distributions(spark):
    from pennsieve_streaming_spark.operators.stats import ks_two_sample

    a = _chan(spark, [1, 2, 3, 4], "a")
    b = _chan(spark, [1, 2, 3, 4], "b")
    r = ks_two_sample(a.unionByName(b), "a", "b", quant=1).collect()[0]
    assert r.d_num == 0 and r.d_stat == 0.0 and not r.reject_5pct


def test_daily_anomalies_golden(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        DAY_US,
        daily_anomalies,
    )

    counts = [4, 5, 5, 6, 100]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append((d * DAY_US + i * 1000, eid))
            eid += 1
    ev = spark.createDataFrame(rows, "ts long, event_id long")
    out = {r.day // DAY_US: r for r in daily_anomalies(ev).collect()}
    assert len(out) == 5
    # median count = 5, MAD = 1 (sorted |d|: 0,0,1,1,95 -> rank 3 = 1)
    assert all(r.med == 5 and r.mad == 1 for r in out.values())
    assert out[4].is_anomaly and out[4].robust_z == round(95 / 1.4826, 9)
    assert not any(out[d].is_anomaly for d in range(4))
    assert out[0].robust_z == round(-1 / 1.4826, 9)


def test_daily_anomalies_zero_mad_flags_nothing(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        DAY_US,
        daily_anomalies,
    )

    counts = [5, 5, 5, 5, 100]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append((d * DAY_US + i * 1000, eid))
            eid += 1
    ev = spark.createDataFrame(rows, "ts long, event_id long")
    out = daily_anomalies(ev).collect()
    assert all(r.mad == 0 and not r.is_anomaly and r.robust_z == 0.0
               for r in out)


# --- wave-2 operators: hand goldens --------------------------------------


def test_pitch_track_square_wave(spark):
    from pennsieve_streaming_spark.dsp.spectral import pitch_track

    # one 64-sample frame of a period-8 square wave: best lag must be
    # 8 exactly (full-phase alignment with the most pairs), voiced,
    # strength = 56/64 = 0.875, f0 = 1000/8
    vals = ([10] * 4 + [0] * 4) * 8
    r = pitch_track(
        _chan(spark, vals), frame=64, lag_lo=2, lag_hi=32, quant=1
    ).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.win, r.best_lag) == (0, 8)
    assert r.voiced and r.pitch_hz == 125.0 and r.strength == 0.875


def test_pitch_track_constant_frame_unvoiced(spark):
    from pennsieve_streaming_spark.dsp.spectral import pitch_track

    r = pitch_track(
        _chan(spark, [5] * 64), frame=64, lag_lo=2, lag_hi=32, quant=1
    ).collect()[0]
    # demeaned flat -> all R = 0, tie broken to the smallest lag,
    # strict voicing gate stays false, sentinel strength
    assert r.best_lag == 2 and not r.voiced and r.strength == 0.0


def test_tempo_estimate_period5_frames(spark):
    from pennsieve_streaming_spark.dsp.spectral import tempo_estimate

    # 26 frames, a loud frame every 5th: onset strength 6400//1024 = 6
    # at w = 5,10,15,20,25 -> best lag 5, strength 144/180 = 0.8,
    # BPM = 60*1000/(64*5) = 187.5
    vals = []
    for w in range(26):
        vals.extend([10 if w % 5 == 0 else 0] * 64)
    r = tempo_estimate(
        _chan(spark, vals), frame=64, lag_lo=4, lag_hi=32, quant=1
    ).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_frames, r.best_lag) == (25, 5)
    assert r.tempo_bpm == 187.5 and r.strength == 0.8


def test_snr_estimate_golden(spark):
    from pennsieve_streaming_spark.dsp.spectral import snr_estimate

    # 6 quiet frames (energy 64) + 2 loud (6400), median 64, active =
    # loud only: SNR = 10*log10(6400/64) = 20 dB exactly
    vals = []
    for w in range(8):
        vals.extend([10 if w in (3, 6) else 1] * 64)
    r = snr_estimate(_chan(spark, vals), frame=64, quant=1).collect()[0]
    assert (r.n_frames, r.n_active) == (8, 2)
    assert r.mean_active_q == 6400.0 and r.mean_noise_q == 64.0
    assert r.snr_db == 20.0


def test_snr_all_quiet_sentinel(spark):
    from pennsieve_streaming_spark.dsp.spectral import snr_estimate

    # constant signal: no frame exceeds 2x median -> n_active = 0 ->
    # 0.0 sentinels
    r = snr_estimate(
        _chan(spark, [1] * 256), frame=64, quant=1
    ).collect()[0]
    assert r.n_active == 0 and r.snr_db == 0.0 and r.mean_active_q == 0.0


def test_palette_counts_kernel():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import palette_counts

    r = np.array([[0, 255], [0, 0]])
    g = np.array([[0, 0], [128, 0]])
    b = np.array([[0, 0], [0, 64]])
    # bins: (0,0,0)=0 ; (3,0,0)=48 ; (0,2,0)=8 ; (0,0,1)=1 — all count
    # 1, so rank order is bin ascending
    assert palette_counts(r, g, b) == [
        (1, 0, 1), (2, 1, 1), (3, 8, 1), (4, 48, 1),
    ]
    # dominant case: a single color fills the image -> one row
    one = np.zeros((4, 4), dtype=np.int64)
    assert palette_counts(one, one, one) == [(1, 0, 16)]


def test_palette_synthetic_shares_sum(spark):
    from pennsieve_streaming_spark.llm.imagehash import palette_synthetic

    docs = spark.createDataFrame(
        [(i, "") for i in range(6)], "doc_id long, text string"
    )
    out = palette_synthetic(docs).collect()
    per = {}
    for r in out:
        assert 1 <= r.rank <= 4 and r.n_px == 16 * 18
        assert r.share == round(r.n_px_bin / r.n_px, 9)
        per.setdefault(r.media_id, []).append(r)
    assert set(per) == set(range(6))
    for rows in per.values():
        ranks = sorted(x.rank for x in rows)
        assert ranks == list(range(1, len(rows) + 1))
        by_rank = sorted(rows, key=lambda x: x.rank)
        for a, b2 in zip(by_rank, by_rank[1:]):
            assert (a.n_px_bin, -a.bin_id) >= (b2.n_px_bin, -b2.bin_id)


# --- wave-3 operators: hand goldens --------------------------------------


def test_mmd_linear_identical_groups_near_zero(spark):
    from pennsieve_streaming_spark.llm.similarity import mmd_linear

    # even/odd labels carry IDENTICAL paired vectors -> every h term
    # cancels exactly -> mmd2 = 0, variance 0 -> sentinels
    rows = []
    vecs = [[1.0, 0.0], [0.0, 1.0], [0.5, 0.5], [0.25, 0.75]]
    vid = 0
    for v in vecs:
        for lab in (0, 1):
            rows.append((vid, v, lab))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = mmd_linear(df).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.n_a, r.n_b, r.n_pairs) == (4, 4, 2)
    assert r.mmd2_lin == 0.0 and r.z == 0.0 and not r.shifted


def test_mmd_linear_golden_shift(spark):
    from pennsieve_streaming_spark.llm.similarity import mmd_linear

    # group 0: e0-aligned; group 1: e1-aligned. k = (dot)^2:
    # within-group k = 1, cross k = 0 -> every h = 2 -> mmd2 = 2,
    # zero variance -> z sentinel 0.0, shifted false (variance gate)
    rows = []
    vid = 0
    for _ in range(3):
        rows.append((vid, [1.0, 0.0], 0)); vid += 1
        rows.append((vid, [0.0, 1.0], 1)); vid += 1
    rows.append((vid, [1.0, 0.0], 0)); vid += 1
    rows.append((vid, [0.0, 1.0], 1)); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = mmd_linear(df).collect()[0]
    assert (r.n_a, r.n_b, r.n_pairs) == (4, 4, 2)
    assert r.mmd2_lin == 2.0
    assert r.z == 0.0 and not r.shifted  # constant h -> var 0 gate


def test_mmd_linear_odd_tail_drops(spark):
    from pennsieve_streaming_spark.llm.similarity import mmd_linear

    # 3 vs 5 members -> 1 and 2 complete pairs -> n_pairs = min = 1
    rows = [(i, [1.0, float(i)], i % 2) for i in range(8)]
    rows = rows[:3] + [r for r in rows if r[2] == 1][:5]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = mmd_linear(df).collect()[0]
    assert r.n_pairs == 1


def test_lsh_bucket_balance_invariants(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        lsh_bucket_balance,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = lsh_bucket_balance(df, n_tables=4, bits=8, dim=8).collect()
    assert sorted(r.tbl for r in out) == [0, 1, 2, 3]
    for r in out:
        assert r.n_vecs == 40
        assert 1 <= r.n_buckets <= 40
        assert r.max_bucket * r.n_buckets >= r.n_vecs
        assert r.sum_sq >= r.n_vecs  # Σc² >= Σc for c >= 1
        assert r.expected_probe == round(r.sum_sq / 40, 9)


def test_lsh_bucket_balance_identical_vectors_one_bucket(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        lsh_bucket_balance,
    )

    rows = [(i, [1.0, -1.0, 0.5, 0.25]) for i in range(10)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = lsh_bucket_balance(df, n_tables=2, bits=4, dim=4).collect()
    for r in out:
        # identical vectors land in ONE bucket per table: the
        # degenerate skew case the panel exists to flag
        assert (r.n_buckets, r.max_bucket) == (1, 10)
        assert r.sum_sq == 100 and r.expected_probe == 10.0


# --- wave-4 operators: hand goldens --------------------------------------


def test_pack_efficiency_golden(spark):
    from pennsieve_streaming_spark.llm.curation import pack_efficiency

    df = spark.createDataFrame(
        [(0, "s", 100), (1, "s", 100), (2, "s", 100)],
        "doc_id long, source string, n_tokens long",
    )
    r = pack_efficiency(df, budget=256).collect()
    assert len(r) == 1
    r = r[0]
    # offsets 0/100/200: doc2 spans seqs 0..1 -> 1 split doc;
    # 300 tokens -> 2 sequences -> fill 300/512
    assert (r.n_docs, r.total_tokens, r.n_seqs, r.n_split_docs) == (
        3, 300, 2, 1,
    )
    assert r.fill_ratio == round(300 / 512, 9)
    assert r.docs_per_seq == 1.5


def test_pack_efficiency_empty_shard_sentinels(spark):
    from pennsieve_streaming_spark.llm.curation import pack_efficiency

    df = spark.createDataFrame(
        [(0, "s", 0), (1, "s", 0)],
        "doc_id long, source string, n_tokens long",
    )
    r = pack_efficiency(df, budget=256).collect()[0]
    assert (r.total_tokens, r.n_seqs) == (0, 0)
    assert r.fill_ratio == 0.0 and r.docs_per_seq == 0.0


def test_contamination_by_source_equals_screened_rollup(spark):
    from pennsieve_streaming_spark.llm.curation import (
        contamination_by_source,
        contamination_screened,
    )

    texts = [
        ("alpha beta gamma delta epsilon zeta", "web"),
        ("alpha beta gamma something else here", "web"),
        ("unrelated words with no overlap at all", "books"),
        ("x", "books"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    per_doc = {
        r.doc_id: r
        for r in contamination_screened(docs, bench, k=3).collect()
    }
    srcs = {i: s for i, (_, s) in enumerate(texts)}
    by_src = {
        r.source: r
        for r in contamination_by_source(docs, bench, k=3).collect()
    }
    for src in ("web", "books"):
        ids = [i for i, s in srcs.items() if s == src]
        assert by_src[src].n_docs == len(ids)
        assert by_src[src].n_contaminated == sum(
            1 for i in ids if per_doc[i].contaminated
        )
        assert by_src[src].sum_overlap == sum(
            per_doc[i].n_overlap for i in ids
        )
        assert by_src[src].sum_shingles == sum(
            per_doc[i].n_shingles for i in ids
        )


def test_lsh_tuning_identical_pair_golden(spark):
    from pennsieve_streaming_spark.llm.dedup import (
        lsh_tuning_panel,
        shingles,
        jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f")],
        "doc_id long, text string",
    )
    pairs = jaccard_pairs(shingles(docs), max_doc_freq=64)
    out = {(r.n_bands, r.rows_per_band): r
           for r in lsh_tuning_panel(pairs, n_perms=16).collect()}
    assert set(out) == {(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)}
    for r in out.values():
        # the single pair has j = 1.0: P(candidate) = 1 for every
        # split, no false-positive mass, no missed mass
        assert r.n_pairs == 1
        assert r.exp_cand_nano == 1_000_000_000
        assert r.exp_fp_nano == 0 and r.exp_fn_nano == 0
    assert out[(16, 1)].s_curve_threshold == round(1 / 16, 9)
    assert out[(1, 16)].s_curve_threshold == 1.0


def test_lsh_tuning_empty_pairs_zero_rows(spark):
    from pennsieve_streaming_spark.llm.dedup import lsh_tuning_panel

    pairs = spark.createDataFrame([], "jaccard double")
    out = lsh_tuning_panel(pairs, n_perms=16).collect()
    assert len(out) == 5
    assert all(
        r.n_pairs == 0 and r.exp_cand_nano == 0 and r.exp_fn_nano == 0
        for r in out
    )


def test_pow2_chain_values_and_validation():
    import pytest as _pytest

    from pennsieve_streaming_spark.llm.dedup import pow2_chain

    # the chain evaluates to repeated squaring exactly, for EVERY
    # exponent on the ladder (python eval as the referee; 0.7**e is
    # not the referee — pow() associates differently above e=2)
    for e in (1, 2, 4, 8, 16):
        expr = pow2_chain("x", e).replace(" ", "")
        acc = 0.7
        k = e
        while k > 1:
            acc = acc * acc
            k >>= 1
        assert eval(expr, {"x": 0.7}) == acc
    for bad in (0, 3, 6, -2):
        with _pytest.raises(ValueError):
            pow2_chain("x", bad)


def test_corpus_build_funnel_invariants(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.q_corpus_build(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_input >= r.n_exact_unique >= r.n_kept >= 0
        if r.kept_tokens > 0:
            assert r.n_seqs == (r.kept_tokens + 255) // 256
            assert 0 < r.fill_ratio <= 1.0
        else:
            assert r.n_seqs == 0 and r.fill_ratio == 0.0


# --- wave-5 operators: hand goldens --------------------------------------


def test_shard_manifest_golden(spark, tmp_path):
    import __spark_entry__ as entry
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta") for i in range(6)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "mini")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = entry.q_shard_manifest(spark, d).collect()
    # shard assignment replayed independently; per-shard masses exact
    ref = docs.selectExpr(
        f"pmod({md5_hash64_expr('CAST(doc_id AS STRING)')}, 8) AS shard",
        "doc_id",
        f"{md5_hash64_expr('text')} AS h",
    ).collect()
    import collections
    exp = collections.defaultdict(lambda: [0, 0, 0, 0])
    texts = {i: f"tok{i} alpha beta" for i in range(6)}
    for r in ref:
        e = exp[r.shard]
        e[0] += 1
        e[1] += 3                      # 3 whitespace tokens each
        e[2] += len(texts[r.doc_id])
        e[3] = (e[3] + r.h) % 9223372036854775807
    got = {r.shard: (r.n_docs, r.n_tokens, r.n_chars, r.checksum)
           for r in out}
    assert got == {s: tuple(v) for s, v in exp.items()}
    assert sum(v[0] for v in exp.values()) == 6  # every doc in a shard


def test_shard_manifest_checksum_order_independent(spark, tmp_path):
    import __spark_entry__ as entry

    rows = [(i, f"text number {i}") for i in range(8)]
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{d1}/documents.parquet")
    spark.createDataFrame(list(reversed(rows)), "doc_id long, text string") \
        .repartition(4).write.parquet(f"{d2}/documents.parquet")
    a = {r.shard: r.checksum
         for r in entry.q_shard_manifest(spark, d1).collect()}
    b = {r.shard: r.checksum
         for r in entry.q_shard_manifest(spark, d2).collect()}
    assert a == b  # row order / partitioning never changes a manifest


def test_classifier_calibration_invariants(spark, sf_dir):
    import __spark_entry__ as entry

    out = entry.q_classifier_calibration(spark, sf_dir).collect()
    assert 1 <= len(out) <= 10
    n_total = sum(r.n_docs for r in out)
    cls = entry.q_quality_classifier(spark, sf_dir).collect()
    assert n_total == len(cls)
    for r in out:
        assert 0 <= r.decile <= 9
        assert 0 <= r.n_label_pos <= r.n_docs
        assert r.label_rate == round(r.n_label_pos / r.n_docs, 9)
        # mean score must sit inside its decile's value range
        assert r.decile / 10 - 1e-9 <= r.mean_score <= (
            (r.decile + 1) / 10 + 1e-9 if r.decile < 9 else 1.0
        )
        assert r.calib_gap == round(
            r.mean_score - r.n_label_pos / r.n_docs, 9
        ) or abs(
            r.calib_gap - (r.mean_score - r.label_rate)
        ) < 2e-9


def test_mmd_linear_single_group_empty_output(spark):
    from pennsieve_streaming_spark.llm.similarity import mmd_linear

    df = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in range(4)],
        "vec_id long, embedding array<double>, label int",
    )
    # group 1 empty -> zero complete pairs -> empty result (matches
    # the oracle's WHERE n_pairs > 0), never a crash or a NULL row
    assert mmd_linear(df).collect() == []


# --- wave-5b: token funnel + streaming manifest ---------------------------


def test_dedup_token_funnel_golden(spark, tmp_path):
    import __spark_entry__ as entry

    # docs: 0 and 1 identical (4 tokens each), 2 unique (2 tokens);
    # no near-dup pairs beyond the exact ones (identical docs ARE
    # lsh pairs -> cluster stage keeps min id too)
    docs = spark.createDataFrame(
        [
            (0, "w x y z", "en", "web", 7),
            (1, "w x y z", "en", "web", 7),
            (2, "p q", "en", "web", 3),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    d = str(tmp_path / "mini")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {r.stage: r for r in
           entry.q_dedup_token_funnel(spark, d).collect()}
    assert (out["0_total"].docs_remaining,
            out["0_total"].tokens_remaining) == (3, 10)
    assert out["0_total"].token_share == 1.0
    # exact: docs 0 and 2 survive -> 6 tokens
    assert (out["1_exact"].docs_remaining,
            out["1_exact"].tokens_remaining) == (2, 6)
    assert out["1_exact"].token_share == 0.6
    # near-dup cluster stage can only shrink further (identical pair
    # collapses there too; doc 2 is under the shingle floor)
    assert (out["2_near_dup"].docs_remaining,
            out["2_near_dup"].tokens_remaining) == (2, 6)


def test_stream_shard_manifest_equals_batch(spark, sf_dir):
    import __spark_entry__ as entry

    batch = {r.shard: (r.n_docs, r.n_tokens, r.n_chars, r.checksum)
             for r in entry.q_shard_manifest(spark, sf_dir).collect()}
    stream = {r.shard: (r.n_docs, r.n_tokens, r.n_chars, r.checksum)
              for r in
              entry.q_stream_shard_manifest(spark, sf_dir).collect()}
    assert batch == stream and len(batch) > 0


def test_cross_corpus_containment_golden(spark):
    from pennsieve_streaming_spark.llm.dedup import (
        cross_corpus_containment,
        shingles,
    )

    # existing corpus: doc 10 "a b c d e" (3 shingles), doc 11
    # unrelated; new docs: 0 = contained prefix "a b c d" (2 shingles,
    # both in doc 10 -> containment 1.0), 1 = half overlap, 2 = none
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c zz"),
            (2, "p q r s"),
            (10, "a b c d e"),
            (11, "x y z w v"),
        ],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    new_ids = docs.filter(F.col("doc_id") < 10).select("doc_id")
    out = {r.doc_id: r for r in
           cross_corpus_containment(sh, new_ids, 0.5).collect()}
    assert set(out) == {0, 1, 2}
    # doc0: shingles {a b c, b c d} both in doc10 -> 2/2
    assert (out[0].best_match_id, out[0].inter) == (10, 2)
    assert out[0].containment == 1.0 and out[0].is_dup
    # doc1: only "a b c" matches -> 1/2
    assert (out[1].best_match_id, out[1].inter) == (10, 1)
    assert out[1].containment == 0.5 and out[1].is_dup
    # doc2: no shared shingles -> sentinels
    assert (out[2].best_match_id, out[2].inter) == (-1, 0)
    assert out[2].containment == 0.0 and not out[2].is_dup
