"""Round-8 operator goldens: hand-computable cases pinning the
semantics the oracles gate statistically."""

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


def test_matrix_profile_motif_and_discord(spark):
    from pennsieve_streaming_spark.operators.stats import matrix_profile

    # windows of 3: two identical motifs + one discord
    vals = [1, 2, 3, 1, 2, 3, 9, 9, 9]
    out = {r.win: r for r in matrix_profile(_series(spark, vals), m=3).collect()}
    assert out[0].nn_win == 1 and out[0].nn_dist2 == 0
    assert out[1].nn_win == 0 and out[1].nn_dist2 == 0
    assert out[2].nn_dist2 > 0  # the discord

def test_matrix_profile_tie_breaks_to_smallest_neighbor(spark):
    from pennsieve_streaming_spark.operators.stats import matrix_profile

    vals = [5, 5, 5, 5, 5, 5]  # all windows identical
    out = {r.win: r for r in matrix_profile(_series(spark, vals), m=2).collect()}
    assert out[1].nn_win == 0 and out[1].nn_dist2 == 0


def test_variance_ratio_zero_variance_sentinel_and_trend(spark):
    from pennsieve_streaming_spark.operators.stats import variance_ratio

    # linear ramp: unit increments, var(d) = 0 -> sentinel
    ramp = {r.channel: r for r in variance_ratio(
        _series(spark, range(40)), (2, 4, 8)).collect()}
    assert ramp["a"].vr2 == 0.0 and ramp["a"].vr8 == 0.0
    # alternating +/-: 2-step sums are all zero -> VR(2) ~ 0
    alt = {r.channel: r for r in variance_ratio(
        _series(spark, [0, 1] * 20), (2, 4, 8)).collect()}
    assert alt["a"].vr2 < 0.1


def test_kpss_trend_vs_alternating(spark):
    from pennsieve_streaming_spark.operators.stats import kpss_stat

    trend = kpss_stat(_series(spark, range(60))).collect()[0]
    noise = kpss_stat(_series(spark, [0, 1] * 30)).collect()[0]
    assert trend.kpss_stat > noise.kpss_stat
    assert noise.stationary and not trend.stationary
    # constant channel: zero variance -> 0.0 sentinel, flagged stationary
    flat = kpss_stat(_series(spark, [7] * 20)).collect()[0]
    assert flat.kpss_stat == 0.0 and flat.stationary


def test_poincare_alternating_exact(spark):
    from pennsieve_streaming_spark.operators.stats import poincare_sd

    # 41 values so the 40 gaps split 20/20 between +100 and -100
    # (quant=100): mean(d) = 0, var(d) = 100^2 = 10000 exactly;
    # s = x_t + x_{t-1} = 100 constant -> var(s) = 0 -> sd2 sentinel
    r = poincare_sd(_series(spark, [0, 1] * 20 + [0])).collect()[0]
    assert abs(r.sd1 - math.sqrt(10000 / 2.0) / 100.0) < 1e-9
    assert r.sd2 == 0.0 and r.sd_ratio == 0.0


def test_dfa_trend_scales_faster_than_alternation(spark):
    from pennsieve_streaming_spark.operators.stats import dfa

    import random

    rng = random.Random(7)
    trend = dfa(_series(spark, [i * 1.0 for i in range(128)])).collect()[0]
    rough = dfa(
        _series(spark, [rng.uniform(-1, 1) for _ in range(128)])
    ).collect()[0]
    assert trend.alpha > rough.alpha
    assert trend.f16 > trend.f4 > 0


def test_binseg_recovers_two_planted_shifts(spark):
    from pennsieve_streaming_spark.operators.stats import (
        binseg_change_points,
    )

    vals = [0.0] * 20 + [10.0] * 20 + [25.0] * 20
    rows = binseg_change_points(_series(spark, vals)).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    # level 0 finds one boundary, level 1 the other
    splits = sorted(
        [by_level[0][0].split_i]
        + [r.split_i for r in by_level[1]]
    )
    assert 20 in splits and 40 in splits
    lvl0 = by_level[0][0]
    assert (lvl0.seg_start, lvl0.seg_end) == (1, 60)


def test_pacf_white_vs_trend(spark):
    from pennsieve_streaming_spark.operators.stats import pacf3

    trend = pacf3(_series(spark, range(100)), 1).collect()[0]
    assert trend.pacf1 > 0.9          # heavy positive lag-1
    assert abs(trend.pacf2) < 0.5     # mostly explained by AR(1)


def test_lorenz_uniform_counts(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        lorenz_deciles,
    )

    rows = [(u, 0, u, "e") for u in range(100)]  # 1 event each
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    out = sorted(lorenz_deciles(ev).collect(), key=lambda r: r.decile)
    assert [r.decile for r in out] == list(range(1, 11))
    assert all(r.event_share == 0.1 for r in out)
    assert out[-1].cum_share == 1.0


def test_burstiness_constant_vs_bursty(spark):
    from pennsieve_streaming_spark.operators.analytics import burstiness

    rows = []
    # user 0: clockwork gaps (10s) -> var 0 -> sentinel 0.0
    for i in range(20):
        rows.append((0, i * 10_000_000, i, "tick"))
    # user 1: one huge gap among tiny ones -> strongly bursty
    t = 0
    for i in range(19):
        t += 1_000_000 if i != 10 else 1_000_000_000
        rows.append((1, t, 100 + i, "burst"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    out = {r.event_type: r for r in burstiness(ev).collect()}
    assert out["tick"].burstiness == 0.0
    assert out["burst"].burstiness > 0.5


def test_type_pmi_exact(spark):
    from pennsieve_streaming_spark.operators.analytics import type_pmi

    # 4 users: 2 do both a+b, 1 only a, 1 only b
    rows = [
        (0, 0, 0, "a"), (0, 0, 1, "b"),
        (1, 0, 2, "a"), (1, 0, 3, "b"),
        (2, 0, 4, "a"), (3, 0, 5, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    r = type_pmi(ev).collect()[0]
    assert (r.n_a, r.n_b, r.n_both) == (3, 3, 2)
    # pmi = ln(2*4/(3*3)) via the nano-quantized four-term fold
    want = (
        round(math.log(2) * 1e9) + round(math.log(4) * 1e9)
        - 2 * round(math.log(3) * 1e9)
    ) / 1e9
    assert abs(r.pmi - want) < 1e-12


def test_dow_chi2_concentrated_vs_uniform(spark):
    from pennsieve_streaming_spark.operators.analytics import dow_chi2

    DAY = 86_400_000_000
    rows = []
    for i in range(70):
        rows.append((i, (i % 7) * DAY, i, "uniform"))
        rows.append((100 + i, 0, 1000 + i, "spike"))  # all one dow
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    out = {r.event_type: r for r in dow_chi2(ev).collect()}
    assert out["uniform"].chi2 == 0.0 and out["uniform"].uniform
    # all-on-one-day: chi2 = 6n = 420
    assert out["spike"].chi2 == 420.0 and not out["spike"].uniform


def test_growth_accounting_hand_case(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        growth_accounting,
    )

    W = 7 * 86_400_000_000
    rows = [
        (1, 0), (1, W),            # retained into week 1
        (2, 0),                    # churned after week 0
        (3, W),                    # new in week 1
        (4, 0), (4, 2 * W),        # resurrected in week 2
    ]
    ev = spark.createDataFrame(
        [(u, t, i, "e") for i, (u, t) in enumerate(rows)],
        "user_id long, ts long, event_id long, event_type string",
    )
    out = {r.week // W: r for r in growth_accounting(ev).collect()}
    assert (out[1].n_new, out[1].n_retained, out[1].n_resurrected,
            out[1].n_churned) == (1, 1, 0, 2)
    assert (out[2].n_resurrected, out[2].n_churned) == (1, 2)


def test_cohort_ltv_monotone_and_exact_start(spark):
    from pennsieve_streaming_spark.operators.analytics import cohort_ltv

    W = 7 * 86_400_000_000
    rows = [(1, 0), (1, 1), (1, W), (2, 2)]
    ev = spark.createDataFrame(
        [(u, t, i, "e") for i, (u, t) in enumerate(rows)],
        "user_id long, ts long, event_id long, event_type string",
    )
    out = sorted(cohort_ltv(ev).collect(), key=lambda r: r.age_week)
    assert out[0].cohort_size == 2 and out[0].cum_events == 3
    assert out[0].ltv == 1.5
    cums = [r.cum_events for r in out]
    assert cums == sorted(cums)  # cumulative is monotone


def test_char_trigram_lm_repetitive_scores_higher(spark):
    from pennsieve_streaming_spark.llm.text import char_trigram_lm

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa", "s"), (2, "qwertzuiopasdfgh", "s")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in char_trigram_lm(docs).collect()}
    assert out[1].avg_logp > out[2].avg_logp
    assert out[1].n_tri == 14


def test_stopword_profile_deciles(spark):
    from pennsieve_streaming_spark.llm.text import stopword_profile

    docs = spark.createDataFrame(
        [
            (1, "the and of to", "s"),          # ratio 1.0 -> decile 9
            (2, "rocket science lab xyz", "s"), # ratio 0.0 -> decile 0
            (3, "the rocket", "s"),             # ratio 0.5 -> decile 5
        ],
        "doc_id long, text string, source string",
    )
    out = {r.decile: r.n_docs for r in stopword_profile(docs).collect()}
    assert out == {9: 1, 0: 1, 5: 1}


def test_length_quantiles_interpolation(spark):
    from pennsieve_streaming_spark.llm.text import length_quantiles

    docs = spark.createDataFrame(
        [(i, "x", "s", float(10 * (i + 1))) for i in range(5)],
        "doc_id long, text string, source string, n_chars double",
    ).withColumn("n_chars", F.col("n_chars").cast("long"))
    r = length_quantiles(docs).collect()[0]
    # lengths 10..50: p50 = 30 exactly; p90 = 10 + 0.9*4 steps = 46
    assert r.p50 == 30.0
    assert abs(r.p90 - 46.0) < 1e-9


def test_ngram_entropy_deterministic_vs_branching(spark):
    from pennsieve_streaming_spark.llm.text import ngram_entropy

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b", "det"),     # after a always b (and v.v.)
            (2, "a b a c a b a c", "branch"),  # after a: b or c
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in ngram_entropy(docs).collect()}
    assert abs(out["det"].entropy_nats) < 1e-9
    assert out["branch"].entropy_nats > 0.3


def test_zcr_alternating_and_constant(spark):
    from pennsieve_streaming_spark.dsp.spectral import zero_crossing_rate

    alt = zero_crossing_rate(
        _series(spark, [0, 1] * 32), frame=8, quant=100
    ).collect()
    assert all(r.zcr == 1.0 for r in alt)
    flat = zero_crossing_rate(
        _series(spark, [5] * 64), frame=8, quant=100
    ).collect()
    assert all(r.n_crossings == 0 for r in flat)


def test_colorfulness_gray_is_zero():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import (
        colorfulness_stats,
    )

    g = np.full((4, 4), 100)
    n, srg, srg2, syb, syb2 = colorfulness_stats(g, g, g)
    assert (srg, srg2, syb, syb2) == (0, 0, 0, 0)


def test_blockiness_kernel_blocky_field():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import blockiness_stats

    # 8-wide constant blocks with a jump at the boundary
    g = np.zeros((2, 16), dtype=np.int64)
    g[:, 8:] = 50
    n_b, s_b, n_nb, s_nb = blockiness_stats(g)
    assert s_b == 2 * 50 and s_nb == 0  # all gradient at the boundary


def test_jl_distortion_identical_vectors_sentinel(spark):
    from pennsieve_streaming_spark.llm.similarity import jl_distortion

    rows = [(i, [1.0] * 8) for i in range(3)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = jl_distortion(embs, out_dim=4, dim=8, n_queries=3).collect()
    assert len(out) == 3
    assert all(r.d2_orig == 0 and r.ratio == 0.0 for r in out)


def test_assign_margin_separated_clusters(spark):
    from pennsieve_streaming_spark.llm.similarity import assign_margin

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [(0, [0.1, 0.0]), (1, [9.9, 0.0])]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.list_id: r for r in assign_margin(embs, cents).collect()}
    assert set(out) == {0, 1}
    # far from the boundary: margins near 1
    assert out[0].mean_margin > 0.99 and out[1].mean_margin > 0.99


def test_dedup_agreement_identical_docs(spark, tmp_path):
    import __spark_entry__ as E

    df = E.queries()["doc_dedup_method_agreement"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    total = df.n_both + df.n_only_minhash + df.n_only_simhash
    assert total > 0 and 0.0 <= df.pair_jaccard <= 1.0
