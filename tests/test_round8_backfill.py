"""Hand-computed goldens for the wave-1-4 operators that previously
had only oracle parity (r10-cohort hardening): crest factor, clipping
stats, C4 line filters, source JSD, PQ balance, seasonal strength,
MinHash calibration."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _series(spark, vals, channel="a"):
    return spark.createDataFrame(
        [(channel, i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )


def test_crest_factor_golden(spark):
    from pennsieve_streaming_spark.dsp.spectral import crest_factor

    # frame 0: constant 1.0 -> peak=rms -> crest 1.0
    # frame 1: single 2.0 impulse among zeros -> peak 200, rms 100
    vals = [1.0, 1.0, 1.0, 1.0, 2.0, 0.0, 0.0, 0.0]
    out = {
        r.win: r
        for r in crest_factor(_series(spark, vals), frame=4).collect()
    }
    assert out[0].crest == 1.0 and out[0].peak_q == 100
    assert out[1].crest == 2.0 and out[1].peak_q == 200


def test_crest_factor_silent_frame_sentinel(spark):
    from pennsieve_streaming_spark.dsp.spectral import crest_factor

    out = crest_factor(_series(spark, [0.0] * 4), frame=4).collect()[0]
    assert out.crest == 0.0


def test_clipping_stats_golden(spark):
    from pennsieve_streaming_spark.dsp.spectral import clipping_stats

    # threshold 0.5 -> clip flags [1,1,0,1,0,1]; longest run = 2
    vals = [0.6, 0.6, 0.1, 0.7, 0.1, -0.6]
    out = clipping_stats(_series(spark, vals), 0.5).collect()[0]
    assert out.n == 6 and out.n_clipped == 4
    assert out.clip_frac == round(4 / 6, 9)
    assert out.max_run == 2


def test_c4_line_filters_golden(spark):
    from pennsieve_streaming_spark.llm.curation import c4_line_filters

    docs = spark.createDataFrame(
        [
            (0, "This is a good line.\nshort\n{code}\nAnother fine line here!"),
            (1, "One two three four five."),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_line_filters(docs).collect()}
    d0 = out[0]
    assert d0.n_lines == 4
    assert d0.n_terminal_lines == 2           # ". " and "!" enders
    assert d0.n_short_lines == 2              # "short", "{code}" (<3 words)
    assert d0.n_words == 11
    assert d0.has_brace and not d0.has_lorem
    assert not d0.keep                        # brace marker kills it
    assert d0.terminal_share == 0.5
    d1 = out[1]
    assert d1.n_lines == 1 and d1.n_terminal_lines == 1
    assert d1.n_words == 5 and d1.keep
    d2 = out[2]
    assert d2.n_words == 0 and not d2.keep


def test_source_jsd_identical_partial_disjoint(spark):
    from pennsieve_streaming_spark.llm.curation import source_jsd

    docs = spark.createDataFrame(
        [
            (0, "a a b", "s1"),
            (1, "a a b", "s2"),      # identical distribution to s1
            (2, "a c c", "s4"),      # partial overlap with s1/s2
            (3, "x y z", "s9"),      # disjoint vocabulary
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r for r in source_jsd(docs).collect()
    }
    # identical unigram distributions: every ratio is 1 -> JSD 0
    assert out[("s1", "s2")].jsd_nats == 0.0
    # partial overlap, hand-computed full JSD (one-sided tokens
    # contribute their ln 2 mass via the (n - sum_shared) recovery):
    # p = (a:2/3, b:1/3), q = (a:1/3, c:2/3)
    want = 0.5 * (
        2 / 3 * math.log(4 / 3) + 1 / 3 * math.log(2)
    ) + 0.5 * (1 / 3 * math.log(2 / 3) + 2 / 3 * math.log(2))
    for pair in (("s1", "s4"), ("s2", "s4")):
        assert out[pair].n_terms == 1          # only 'a' is shared
        assert abs(out[pair].jsd_nats - want) < 1e-6
    # completely disjoint pairs share no token key -> no output row
    # (the documented shared-token-join contract; their JSD is the
    # ln 2 maximum by definition)
    assert ("s1", "s9") not in out and ("s4", "s9") not in out


def test_pq_balance_golden(spark):
    from pennsieve_streaming_spark.llm.similarity import pq_balance

    vecs = [
        (0, [0.1, 0.0]),
        (1, [0.0, 0.2]),
        (2, [0.3, 0.1]),
        (3, [9.8, 10.1]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # one subspace (m=1), two codewords: origin and (10,10)
    out = pq_balance(df, [[[0.0, 0.0], [10.0, 10.0]]]).collect()[0]
    assert out.subspace == 0
    assert out.n_vectors == 4 and out.n_codes_used == 2
    assert out.max_share == 0.75
    want_h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(out.entropy_nats - want_h) < 1e-6


def test_seasonal_strength_sawtooth_vs_constant(spark):
    from pennsieve_streaming_spark.operators.stats import seasonal_strength

    period = 7
    saw = [(i % period) * 1.0 for i in range(4 * period)]
    strong = seasonal_strength(
        _series(spark, saw), step_us=1, period=period
    ).collect()[0]
    assert strong.seasonal_strength > 0.9
    flat = seasonal_strength(
        _series(spark, [5.0] * 4 * period, channel="b"),
        step_us=1,
        period=period,
    ).collect()[0]
    # degenerate detrended variance -> 0.0 sentinel
    assert flat.seasonal_strength == 0.0


def test_minhash_calibration_identical_docs_zero_error(spark):
    from pennsieve_streaming_spark.llm import (
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_wide,
        shingles,
    )
    from pennsieve_streaming_spark.llm.dedup import (
        minhash_calibration,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "a b c d e f g")],
        "doc_id long, text string",
    )
    sh = shingles(docs)
    cands = lsh_candidate_pairs(lsh_band_keys(minhash_wide(sh)))
    # the calibration takes the EXPLODED (doc_id, j, minhash) form
    out = minhash_calibration(sh, minhash_signatures(sh), cands).collect()
    # identical docs: estimate 1.0, exact 1.0 -> |error| decile 0
    assert len(out) == 1
    assert out[0].err_decile == 0 and out[0].n_pairs == 1
