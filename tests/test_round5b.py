"""Unit goldens for the round-5b operators: LTOB downsample, SAX
words, Welch PSD, as-of join, weighted sampling, containment pairs,
fuzzy contamination."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _samples(spark, rows):
    return spark.createDataFrame(rows, "channel string, ts long, value double")


# --- LTOB --------------------------------------------------------------------

def test_ltob_picks_largest_triangle(spark):
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_ltob,
    )

    # one channel, bucket=4: the spike at ts=2 dominates its bucket
    rows = [("c", t, v) for t, v in
            [(0, 0.0), (1, 1.0), (2, 100.0), (3, 1.0),
             (4, 1.0), (5, 1.0), (6, 1.0), (7, 50.0)]]
    got = {
        (r.channel, r.bucket): (r.ts, r.value)
        for r in downsample_ltob(_samples(spark, rows), 4).collect()
    }
    assert got[("c", 0)] == (2, 100.0)
    # bucket 1: ts=6 has the large triangle with the ts=7 spike;
    # ts=7 itself is the channel endpoint (area -1)
    assert got[("c", 1)] == (6, 1.0)


def test_ltob_endpoints_have_sentinel_area(spark):
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_ltob,
    )

    rows = [("c", 0, 5.0)]  # single point: no neighbors at all
    out = downsample_ltob(_samples(spark, rows), 4).collect()
    assert len(out) == 1 and out[0].area_q == -1


def test_ltob_one_point_per_bucket(spark):
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_ltob,
    )

    rows = [("a", t, float(t % 7)) for t in range(40)] + [
        ("b", t, float(t % 5)) for t in range(23)
    ]
    out = downsample_ltob(_samples(spark, rows), 10).collect()
    keys = [(r.channel, r.bucket) for r in out]
    assert len(keys) == len(set(keys))
    # ceil(40/10) + ceil(23/10) buckets
    assert len(out) == 4 + 3


# --- SAX ---------------------------------------------------------------------

def test_sax_flat_window_is_all_c(spark):
    from pennsieve_streaming_spark.operators.sax import sax_words

    rows = [("c", t, 1.0) for t in range(64)]
    out = sax_words(_samples(spark, rows), 64, 8).collect()
    assert len(out) == 1
    assert out[0].sax_word == "cccccccc"
    assert out[0].std == 0.0


def test_sax_step_window_symbols(spark):
    from pennsieve_streaming_spark.operators.sax import sax_words

    # first half -1, second half +1: z = ±1 -> 'a' and 'd'
    rows = [("c", t, -1.0 if t < 32 else 1.0) for t in range(64)]
    out = sax_words(_samples(spark, rows), 64, 8).collect()
    assert out[0].sax_word == "aaaadddd"
    assert out[0].mean == 0.0 and abs(out[0].std - 1.0) < 1e-12


def test_sax_ragged_tail_dropped(spark):
    from pennsieve_streaming_spark.operators.sax import sax_words

    rows = [("c", t, float(t)) for t in range(100)]  # 1 full + 36 tail
    out = sax_words(_samples(spark, rows), 64, 8).collect()
    assert len(out) == 1 and out[0].win == 0


def test_sax_discords_surface_rare_shape(spark):
    from pennsieve_streaming_spark.operators.sax import sax_discords

    # 4 flat windows ('cccccccc') + 1 step window ('aaaadddd'): the
    # step is the rarest word -> rank 1; flat is rank 2.
    rows = [("c", t, 1.0) for t in range(256)]
    rows += [
        ("c", 256 + t, -1.0 if t < 32 else 1.0) for t in range(64)
    ]
    out = sax_discords(_samples(spark, rows), 64, 8, k=1).collect()
    assert len(out) == 1
    assert (out[0].win, out[0].sax_word, out[0].word_count, out[0].rank) == (
        4, "aaaadddd", 1, 1
    )


def test_sax_discords_ties_emit_all_instances(spark):
    from pennsieve_streaming_spark.operators.sax import sax_discords

    # two words, each supported twice: tie at count 2 is broken word
    # ASC, and BOTH windows of the rank-1 word are emitted.
    rows = []
    for w in range(2):  # two flat windows
        rows += [("c", w * 64 + t, 1.0) for t in range(64)]
    for w in range(2, 4):  # two step windows
        rows += [
            ("c", w * 64 + t, -1.0 if t < 32 else 1.0) for t in range(64)
        ]
    out = sax_discords(_samples(spark, rows), 64, 8, k=1).collect()
    assert sorted((r.win, r.sax_word, r.rank) for r in out) == [
        (2, "aaaadddd", 1), (3, "aaaadddd", 1)
    ]


# --- Welch -------------------------------------------------------------------

def test_welch_psd_averages_window_powers(spark):
    from pennsieve_streaming_spark.dsp.spectral import band_power, welch_psd

    rows = [
        ("c", t, math.sin(2 * math.pi * 5.0 * t / 100.0) * 10.0)
        for t in range(200)
    ]
    s = _samples(spark, rows)
    bp = band_power(s, (5.0,), 100.0, 100).collect()
    assert len(bp) == 2  # two windows
    expect = sum(round(r.power) for r in bp) / 2.0
    out = welch_psd(s, (5.0,), 100.0, 100).collect()
    assert len(out) == 1
    assert out[0].n_windows == 2
    assert out[0].avg_power == expect
    # the probed bin carries real energy
    assert out[0].avg_power > 1000.0


# --- as-of join --------------------------------------------------------------

def test_asof_join_semantics(spark):
    from pennsieve_streaming_spark.operators.align import asof_join

    s = _samples(spark, [("c", 10, 1.0), ("c", 20, 2.0), ("c", 30, 3.0)])
    probes = spark.createDataFrame(
        [(1, "c", 5), (2, "c", 10), (3, "c", 25), (4, "c", 99), (5, "d", 50)],
        "event_id long, channel string, ts long",
    )
    got = {r.event_id: r for r in asof_join(s, probes).collect()}
    assert got[1].matched is False and got[1].value == 0.0
    assert got[1].src_ts == -1 and got[1].stale_us == -1
    assert got[2].value == 1.0 and got[2].stale_us == 0   # inclusive hit
    assert got[3].value == 2.0 and got[3].src_ts == 20
    assert got[4].value == 3.0 and got[4].stale_us == 69
    assert got[5].matched is False                        # unknown channel


def test_asof_join_single_window_pass_no_join(spark):
    from pennsieve_streaming_spark.operators.align import asof_join

    s = _samples(spark, [("c", 10, 1.0)])
    probes = spark.createDataFrame(
        [(1, "c", 5)], "event_id long, channel string, ts long"
    )
    plan = asof_join(s, probes)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union-window formulation, zero joins


# --- weighted sample ---------------------------------------------------------

def test_weighted_sample_exact_size_and_determinism(spark):
    from pennsieve_streaming_spark.llm.curation import weighted_sample

    docs = spark.createDataFrame(
        [(i, (i % 50) + 1) for i in range(500)], "doc_id long, n_chars long"
    )
    a = [r.doc_id for r in weighted_sample(docs, n=50).collect()]
    b = [r.doc_id for r in weighted_sample(docs, n=50).collect()]
    assert len(a) == 50 and a == b
    c = [r.doc_id for r in weighted_sample(docs, n=50, salt=1).collect()]
    assert a != c  # salt redraws


def test_weighted_sample_prefers_heavy_docs(spark):
    from pennsieve_streaming_spark.llm.curation import weighted_sample

    # one doc weighs 10^6x the rest: ln(u)/w ~ 0 -> always in the top-k
    docs = spark.createDataFrame(
        [(i, 1) for i in range(200)] + [(999, 1_000_000)],
        "doc_id long, n_chars long",
    )
    top = [r.doc_id for r in weighted_sample(docs, n=5).collect()]
    assert 999 in top


def test_weighted_sample_plans_as_takeordered(spark):
    from pennsieve_streaming_spark.llm.curation import weighted_sample

    docs = spark.createDataFrame([(1, 10)], "doc_id long, n_chars long")
    plan = weighted_sample(docs, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- containment -------------------------------------------------------------

def test_containment_short_doc_swallowed(spark):
    from pennsieve_streaming_spark.llm.dedup import (
        containment_pairs,
        shingles,
    )

    long_text = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    short_text = "w2 w3 w4 w5"         # fully contained in long_text
    other = "z0 z1 z2 z3 z4"
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, other)],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r for r in
           containment_pairs(shingles(docs)).collect()}
    r = out[(1, 2)]
    assert r.cont_b == 1.0          # all of short's shingles in long
    assert r.cont_a < 1.0
    assert (1, 3) not in out and (2, 3) not in out


def test_containment_df_cap_limits_join_not_sizes(spark):
    from pennsieve_streaming_spark.llm.dedup import (
        containment_pairs,
        shingles,
    )

    # boilerplate trigram shared by all docs; cap df at 2 so it can't
    # generate pairs, but set sizes still count it
    docs = spark.createDataFrame(
        [(i, f"common a b u{i} v{i} w{i}") for i in range(4)],
        "doc_id long, text string",
    )
    out = containment_pairs(shingles(docs), max_doc_freq=2).collect()
    assert out == []  # only shared shingle is hot -> no pairs generated


# --- fuzzy contamination -----------------------------------------------------

def test_contamination_fuzzy_flags_duplicate_across_splits(spark):
    from pennsieve_streaming_spark.llm.curation import contamination_fuzzy

    text = " ".join(f"tok{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, text), (2, " ".join(f"other{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, text)], "doc_id long, text string")
    got = {r.doc_id: r for r in
           contamination_fuzzy(corpus, bench, threshold=0.9).collect()}
    assert got[1].contaminated is True and got[1].max_jaccard_est == 1.0
    assert got[2].contaminated is False and got[2].n_bench_hits == 0
    assert len(got) == 2  # one verdict row per corpus doc


def test_contamination_fuzzy_benchmark_side_broadcast(spark):
    from pennsieve_streaming_spark.llm.curation import contamination_fuzzy

    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    plan = (
        contamination_fuzzy(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_sax_motifs_ranking_and_share(spark):
    """Deterministic motif ranking: count DESC then word ASC; share
    over the channel's complete windows only."""
    from pennsieve_streaming_spark.operators.sax import sax_motifs

    # 4-sample windows, 2 segments; channel 'c' gets 3 identical
    # low-high windows, 1 high-low window, and a ragged tail (dropped)
    rows = []
    t = 0
    for _ in range(3):
        for v in (0.0, 0.0, 10.0, 10.0):
            rows.append(("c", t, v)); t += 1
    for v in (10.0, 10.0, 0.0, 0.0):
        rows.append(("c", t, v)); t += 1
    rows.append(("c", t, 5.0))  # ragged tail
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = sax_motifs(df, 4, 2, k=3).collect()
    assert [r.rank for r in sorted(got, key=lambda r: r.rank)] == [1, 2]
    top = next(r for r in got if r.rank == 1)
    second = next(r for r in got if r.rank == 2)
    assert top.motif_count == 3 and second.motif_count == 1
    assert top.n_windows == 4 and abs(top.share - 0.75) < 1e-12
    assert top.sax_word != second.sax_word
    # the low-high word z-normalizes to (below mean, above mean)
    assert top.sax_word[0] < top.sax_word[-1]
