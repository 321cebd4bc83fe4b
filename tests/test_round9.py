"""Round-9 additions: the production-shaped screened decontamination
(bloom pre-screen -> exact audit on flagged rows only)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma something else entirely here",
        "unrelated words with no overlap at all present",
        "x",  # too short for a 3-shingle: n_shingles = 0
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_contamination_screened_golden(spark):
    from pennsieve_streaming_spark.llm.curation import (
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r.doc_id: r
        for r in contamination_screened(docs, bench, k=3).collect()
    }
    assert len(out) == 4
    # doc0 IS the benchmark: 4 shingles, all overlap, contaminated
    assert out[0].n_shingles == 4 and out[0].n_overlap == 4
    assert out[0].contaminated
    # doc1 shares only "alpha beta gamma": bloom_ratio 1/5 <= 0.5 ->
    # screened OUT (provably clean), 0 sentinel without the audit
    assert out[1].n_shingles == 5 and out[1].n_overlap == 0
    assert not out[1].contaminated
    # doc2: no overlap at all
    assert out[2].n_overlap == 0 and not out[2].contaminated
    # doc3: no shingles -> all-zero row, ratio 0.0
    assert out[3].n_shingles == 0 and out[3].n_overlap == 0
    assert out[3].overlap_ratio == 0.0 and not out[3].contaminated


def test_contamination_screened_matches_exact(spark):
    """The no-false-negatives contract: contaminated verdicts
    identical to the exact operator on EVERY doc; overlap counts
    exact wherever the ratio gate ran the audit."""
    from pennsieve_streaming_spark.llm.curation import (
        contamination,
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 2 == 0)
    exact = {
        r.doc_id: r for r in contamination(docs, bench, k=3).collect()
    }
    screened = {
        r.doc_id: r
        for r in contamination_screened(docs, bench, k=3).collect()
    }
    assert set(exact) == set(screened)
    for i in exact:
        s, e = screened[i], exact[i]
        assert s.n_shingles == e.n_shingles
        assert s.contaminated == e.contaminated
        # the screen never under-counts the true overlap
        assert s.n_bloom_hits >= e.n_overlap
        if s.n_bloom_hits > 0.5 * s.n_shingles:
            # audited: exact overlap reported
            assert s.n_overlap == e.n_overlap
        else:
            # screened out: 0 sentinel, and provably clean
            assert s.n_overlap == 0 and not e.contaminated


# --- wave 9-11 golden density back-fill (VERDICT r8 item 8) ---


def test_rle_checkerboard_incompressible():
    """Checkerboard: every adjacent pair differs, so run counts hit
    the n_px ceiling in BOTH directions — the exact opposite pole of
    the flat-frame golden."""
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import rle_stats

    g = np.indices((4, 6)).sum(axis=0) % 2
    n_px, n_h, n_v = rle_stats(g)
    assert n_px == 24
    assert n_h == 24 and n_v == 24


def test_spectral_shape_two_tone_golden(spark):
    """Equal-power bin-1 + bin-3 tones: centroid = 2 by symmetry,
    bandwidth = 1 (each tone exactly one bin from the centroid)."""
    import math

    from pennsieve_streaming_spark.dsp.spectral import spectral_shape

    n = 16
    vals = [
        math.sin(2 * math.pi * 1 * t / n)
        + math.sin(2 * math.pi * 3 * t / n)
        for t in range(n)
    ]
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )
    out = spectral_shape(df, n_bins=4, window_samples=n).collect()[0]
    assert out.centroid_bin == 2.0
    assert out.bandwidth_bins == 1.0


def test_mattr_unequal_windows_golden(spark):
    """Windows with DIFFERENT distinct counts: 'a a b c' window 3 ->
    windows {a,a,b}=2 and {a,b,c}=3, MATTR = (2+3)/(2*3)."""
    from pennsieve_streaming_spark.llm.text import mattr

    docs = spark.createDataFrame(
        [(0, "a a b c")], "doc_id long, text string"
    )
    out = mattr(docs, window=3).collect()[0]
    assert out.n_tokens == 4 and out.n_windows == 2
    assert out.mattr == round(5 / 6, 9)


def test_cosine_thresholds_negative_and_exact_boundary(spark):
    """Antipodal corpus vector (cosine -1) never counts; a vector AT
    the threshold counts (>= semantics, hand-checked at cos = 0.5)."""
    import math

    from pennsieve_streaming_spark.llm.similarity import (
        cosine_threshold_counts,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.0]),                       # cos -1
        (2, [0.5, math.sqrt(3.0) / 2.0]),       # cos 0.5
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    out = cosine_threshold_counts(
        df,
        df.filter(F.col("vec_id") == 0),
        thresholds=(-0.5, 0.49999999, 0.9),
    ).collect()[0]
    assert out.n_corpus == 2
    # >= -0.5 counts only the cos-0.5 vector (antipodal is below)
    assert out.n_ge_1 == 1
    # just under 0.5: the boundary vector still counts
    assert out.n_ge_2 == 1
    assert out.n_ge_3 == 0


# --- benchmark-sized bloom (100x-smoke finding) ---


def test_bloom_bits_for_ladder():
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_M,
        bloom_bits_for,
    )

    assert bloom_bits_for(0) == BLOOM_M
    assert bloom_bits_for(1024) == BLOOM_M          # 16*1024 = BLOOM_M
    assert bloom_bits_for(1025) == 32_768
    assert bloom_bits_for(17_000) == 524_288        # the smoke regime
    # the r10-extended ladder: clamp moved to 64 Mib and became loud
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert bloom_bits_for(100_000) == 2_097_152
        assert bloom_bits_for(4_194_304) == 67_108_864  # top rung, exact
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert bloom_bits_for(10**9) == 67_108_864      # loud clamp
        assert len(w) == 1 and issubclass(w[0].category, RuntimeWarning)


def test_bloom_pos_parametrized_m_matches_words():
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_PROBES,
        bloom_pos_py,
        bloom_words_from_hashes,
    )

    m = 131_072
    hs = [12345678901234567, 999, 42, 2**62 + 7]
    words = bloom_words_from_hashes(hs, m)
    assert len(words) == m // 64
    for h in hs:
        for i in range(BLOOM_PROBES):
            p = bloom_pos_py(h, i, m)
            assert 0 <= p < m
            w = words[p // 64]
            if w < 0:
                w += 1 << 64
            assert (w >> (p % 64)) & 1 == 1


def test_screened_auto_size_still_matches_exact(spark):
    """Auto-sized (non-default m) screened run: verdicts must STILL
    equal the exact operator — the no-false-negatives contract is
    m-independent. Also exercises the fast_hash (xxhash64) flavor,
    whose negative hashes cover the sign-bit mask in the probe
    positions."""
    from pennsieve_streaming_spark.llm.curation import (
        bloom_bits_for,
        contamination,
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 2 == 0)
    for fast in (False, True):
        out = {
            r.doc_id: r
            for r in contamination_screened(
                docs,
                bench,
                k=3,
                n_bits=bloom_bits_for(5000),
                fast_hash=fast,
            ).collect()
        }
        exact = {
            r.doc_id: r
            for r in contamination(
                docs, bench, k=3, fast_hash=fast
            ).collect()
        }
        for i in exact:
            assert out[i].contaminated == exact[i].contaminated
            assert out[i].n_bloom_hits >= exact[i].n_overlap


def test_screened_empty_benchmark_all_clean(spark):
    """Empty benchmark: zero shingle hashes -> all-zero bitset -> no
    bloom hits -> every doc provably clean, no audit anywhere."""
    from pennsieve_streaming_spark.llm.curation import (
        contamination_screened,
    )

    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") < 0)  # empty
    out = contamination_screened(docs, bench, k=3).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_bloom_hits == 0 and r.n_overlap == 0
        assert not r.contaminated
