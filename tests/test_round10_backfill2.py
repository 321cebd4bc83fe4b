"""Round-10 golden back-fill, part 2: closes the REMAINING zero-score
set from tools/golden_density.py (14 queries) with hand-computed or
independently-recomputed goldens through the real q_ functions over a
second miniature sf_dir.

Covered: ts_channels_catalog, ts_sequence_numbering, ts_event_summary,
ts_event_index, ts_spike_waveforms, emb_ann_recall,
emb_ann_recall_ivf, emb_ann_recall_multiprobe, emb_bq_recall,
doc_bpe_word_tokens, doc_quality_vs_dup, mm_gif_roundtrip,
mm_image_rle, ts_harmonics.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

E95 = 788_918_400_000_000  # epoch_us('1995-01-01')
EV0 = entry.EV_START       # epoch_us('2024-01-01')
H6 = 6 * 3600 * 1_000_000


@pytest.fixture(scope="module")
def mini2(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_sf2"))
    day = datetime.date(1995, 1, 1)
    # ch0: two close samples + one 33 min later (a real session gap);
    # ch1: two samples 19 µs apart (one span)
    li = spark.createDataFrame(
        [
            (1, 1, 0, 100.0, day),
            (2, 1, 0, 300.0, day),
            (200_000_000, 1, 0, 40.0, day),   # ts = E95 + 2e9 + 1
            (1, 2, 1, 50.0, day),
            (3, 1, 1, 70.0, day),
        ],
        "l_orderkey long, l_linenumber long, l_suppkey long, "
        "l_extendedprice double, l_shipdate date",
    )
    li.coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    docs = spark.createDataFrame(
        [
            (0, "aa bb", "en", "web", 5),
            (1, "aa bb", "en", "web", 5),
            (2, "cc", "en", "blog", 2),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    # six positive multiples of ONE direction: every hyperplane sign,
    # IVF list and binary code is identical -> every ANN family's
    # candidate set is the whole corpus -> recall must be exactly 1
    ramp = [float(j + 1) for j in range(64)]
    embs = spark.createDataFrame(
        [
            (i, [(i + 1) / 10.0 * v for v in ramp], i % 10)
            for i in range(6)
        ],
        "vec_id long, embedding array<double>, label int",
    )
    embs.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    ev = spark.createDataFrame(
        [
            (0, datetime.datetime(2024, 1, 1, 0, 0, 10), 1, "click", 1.0),
            (1, datetime.datetime(2024, 1, 1, 1, 0, 0), 1, "click", 2.0),
            (2, datetime.datetime(2024, 1, 1, 7, 0, 0), 2, "click", 3.0),
            (3, datetime.datetime(2024, 1, 1, 2, 0, 0), 2, "view", 4.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    ev.coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_channels_catalog_golden(spark, mini2):
    out = {r.channel: r for r in
           entry.q_channels_catalog(spark, mini2).collect()}
    r0 = out["ch0"]
    assert (r0.start_ts, r0.end_ts, r0.n_samples, r0.rate) == (
        E95 + 11, E95 + 2_000_000_001, 3, 10.0,
    )
    r1 = out["ch1"]
    assert (r1.start_ts, r1.end_ts, r1.n_samples, r1.rate) == (
        E95 + 12, E95 + 31, 2, 10.0,
    )


def test_sequence_numbering_golden(spark, mini2):
    # spans run over chan_events (channel = event_type): every click
    # gap (10s->1h, 1h->7h) exceeds the 30-minute threshold, so each
    # click event is its own span, numbered in span_lo order
    rows = entry.q_sequence_numbering(spark, mini2).collect()
    per = {}
    for r in rows:
        per.setdefault(r.channel, []).append(r)
    clicks = sorted(per["click"], key=lambda r: r.span_lo)
    assert [r.sequence_id for r in clicks] == [0, 1, 2]
    assert all(r.total_requests == 3 for r in clicks)
    assert [r.span_lo for r in clicks] == [
        EV0 + 10_000_000, EV0 + 3_600_000_000, EV0 + 25_200_000_000,
    ]
    assert len(per["view"]) == 1
    v = per["view"][0]
    assert (v.sequence_id, v.total_requests) == (0, 1)
    assert v.span_lo == EV0 + 7_200_000_000


def test_event_summary_golden(spark, mini2):
    out = {(r.channel, r.bucket): r for r in
           entry.q_event_summary(spark, mini2).collect()}
    t10, t60 = EV0 + 10_000_000, EV0 + 3_600_000_000
    t7h = EV0 + 25_200_000_000
    b0 = out[("click", 0)]
    assert (b0.min_time, b0.max_time, b0["count"]) == (t10, t60, 2)
    assert (b0.min_index, b0.max_index) == (0, 1)
    # avg = min + floor((max-min)/2) — the reference's Long midpoint
    assert b0.avg_time == t10 + (t60 - t10) // 2
    b1 = out[("click", 1)]
    assert (b1.min_time, b1.max_time, b1["count"]) == (t7h, t7h, 1)
    assert (b1.min_index, b1.max_index, b1.avg_time) == (2, 2, t7h)
    v0 = out[("view", 0)]
    assert (v0["count"], v0.min_index) == (1, 0)
    assert v0.min_time == EV0 + 7_200_000_000


def test_event_index_golden(spark, mini2):
    out = {(r.channel, r.idx): r.ts for r in
           entry.q_event_index(spark, mini2).collect()}
    assert out[("click", 0)] == EV0 + 10_000_000
    assert out[("click", 1)] == EV0 + 3_600_000_000
    assert out[("click", 2)] == EV0 + 25_200_000_000
    assert out[("view", 0)] == EV0 + 7_200_000_000


def test_spike_waveforms_golden(spark, mini2):
    # vec 0's waveform is 0.1·[1..64]: equal cut into 8 chunks of 8,
    # chunk b spans elements 8b+1 .. 8b+8 (scaled)
    rows = [r for r in entry.q_spike_waveforms(spark, mini2).collect()
            if r.spike_ts == 0]
    got = {r.bucket: (r.min_val, r.max_val) for r in rows}
    exp = {
        b: (1 / 10.0 * (8 * b + 1), 1 / 10.0 * (8 * b + 8))
        for b in range(8)
    }
    assert got == exp


@pytest.mark.parametrize(
    "qname",
    [
        "emb_ann_recall",
        "emb_ann_recall_ivf",
        "emb_ann_recall_multiprobe",
        "emb_bq_recall",
    ],
)
def test_ann_recall_family_perfect_on_one_bucket(spark, mini2, qname):
    """All six vectors share one direction -> one LSH bucket, one IVF
    list, one binary code -> every ANN candidate set is the full
    corpus -> recall@5 is exactly 1.0 for every query."""
    out = entry.queries()[qname](spark, mini2).collect()
    assert len(out) == 6
    assert all(r.n_hit == 5 and r.recall == 1.0 for r in out)


def test_bpe_word_tokens_golden(spark, mini2):
    # vocab (cnt >= 2): 'aa' x2, 'bb' x2 ('cc' drops); the only merges
    # are (a,a) and (b,b) -> each word collapses to ONE token
    rows = entry.q_bpe_word_tokens(spark, mini2).collect()
    got = {(r.word, r.pos): (r.cnt, r.tok) for r in rows}
    assert got == {
        ("aa", 0): (2, "aa"),
        ("bb", 0): (2, "bb"),
    }


def test_quality_vs_dup_golden(spark, mini2):
    # independent recompute: qualities from the gated quality query,
    # dup flags from exact text equality (docs 0 and 1 collide)
    q = {r.doc_id: r.quality for r in
         entry.queries()["doc_quality_score"](spark, mini2).collect()}
    exp = {}
    for i, isdup in ((0, 1), (1, 1), (2, 0)):
        dec = min(9, int(math.floor(q[i] * 10)))
        n, d = exp.get(dec, (0, 0))
        exp[dec] = (n + 1, d + isdup)
    out = {r.decile: (r.n_docs, r.n_dups, r.dup_share) for r in
           entry.q_quality_vs_dup(spark, mini2).collect()}
    assert out == {
        dec: (n, d, d / n) for dec, (n, d) in exp.items()
    }


def test_gif_roundtrip_golden(spark, mini2):
    from pennsieve_streaming_spark.llm.imagehash import synthetic_gray

    out = {r.media_id: r for r in
           entry.q_gif_roundtrip(spark, mini2).collect()}
    assert set(out) == {0, 1, 2}
    for d, r in out.items():
        g = synthetic_gray(d).astype(np.int64)
        assert (r.height, r.width) == g.shape
        assert r.sum_gq == int(g.sum())
        assert r.sum_gq2 == int((g * g).sum())


def test_image_rle_golden(spark, mini2):
    from pennsieve_streaming_spark.llm.imagehash import synthetic_gray

    out = {r.media_id: r for r in
           entry.q_image_rle(spark, mini2).collect()}
    for d, r in out.items():
        p = synthetic_gray(d) // 32
        n_h = int((p[:, 1:] != p[:, :-1]).sum()) + p.shape[0]
        n_v = int((p[1:, :] != p[:-1, :]).sum()) + p.shape[1]
        assert r.n_px == p.size
        assert (r.n_h_runs, r.n_v_runs) == (n_h, n_v)
        assert r.h_ratio == round(n_h / p.size, 9)
        assert r.v_ratio == round(n_v / p.size, 9)


def test_harmonic_distortion_pure_tone_and_dc(spark):
    from pennsieve_streaming_spark.dsp.spectral import (
        harmonic_distortion,
    )

    # pure bin-2 tone over a 100-sample window: harmonics (bins 4, 6)
    # carry ~nothing -> thd ~ 0; fundamental power is large
    vals = [math.sin(2 * math.pi * 2 * t / 100) for t in range(200)]
    rows = [(("c"), t * 1000, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "channel string, ts long, value double"
    )
    out = harmonic_distortion(df, 2, 3, 100).collect()
    assert len(out) == 2
    for r in out:
        assert r.fund_pq > 0 and r.thd is not None and r.thd < 0.01
    # DC input: every bin power rounds to zero -> thd is NULL
    # (explicitly undefined in both engines)
    dc = spark.createDataFrame(
        [("c", t * 1000, 1.0) for t in range(100)],
        "channel string, ts long, value double",
    )
    r = harmonic_distortion(dc, 2, 3, 100).collect()[0]
    assert r.fund_pq == 0 and r.thd is None
