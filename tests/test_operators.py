"""Operator-level golden and property tests, mirroring the reference's
test strategy (SURVEY.md §5): hand-computed goldens for the tricky
rounding arithmetic, plus fixture patterns from FIXTURES.md (ramp
montage, pulse-train resampling, gap merges).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.operators import (
    contiguous_spans,
    downsample_minmax_count,
    downsample_minmax_time,
    event_summary_data_driven,
    fill_gaps,
    resample_chunk_params,
    samples_to_spans,
    should_resample,
    time_gap_threshold,
    window_query,
)
from pennsieve_streaming_spark.operators.montage import (
    MONTAGE_SCHEMES,
    MontageValidationError,
    montage_name,
    montage_two_channels,
    parse_montage_name,
    validate_montage,
)
from pennsieve_streaming_spark.operators.spikes import cut_bucket_expr
from pennsieve_streaming_spark.operators.window import (
    QueryLimitExceeded,
    check_query_limit,
)


# --------------------------------------------------------------------------
# pure-python reference arithmetic
# --------------------------------------------------------------------------

def test_resample_chunk_params_rounding_edges():
    # chunk = round(pixel*rate/1e6) [Scala floor(x+0.5)], n = floor(total/chunk)
    # 2.5 samples/chunk -> 3 (Scala round-half-up)
    chunk, n, t = resample_chunk_params(12_500, 200.0, 1_000_000)
    assert chunk == 3  # 12500*200/1e6 = 2.5
    assert n == math.floor(200 / 3)
    assert t == 3 / 200.0 * 1e6
    # exact integer case
    chunk, n, _ = resample_chunk_params(10_000, 200.0, 10_000_000)
    assert chunk == 2 and n == 1000


def test_should_resample_threshold():
    # ratio must be strictly > 3.0 (TimeSeriesQueryUtils.scala:175-182)
    assert not should_resample(200.0, 15_000)   # ratio = 3.0 exactly
    assert should_resample(200.0, 15_001)
    assert not should_resample(200.0, 14_999)


def test_time_gap_threshold():
    # floor((1e6/rate) * mult)
    assert time_gap_threshold(3.0, 2.0) == math.floor(1e6 / 3 * 2)
    assert time_gap_threshold(250.0, 2.0) == 8000


def test_check_query_limit():
    check_query_limit(0, 100_000_000, 1000.0, limit=100_000)  # exactly at limit
    with pytest.raises(QueryLimitExceeded):
        check_query_limit(0, 100_001_000, 1000.0, limit=100_000)


def _cut_reference(m: int, n: int) -> list[int]:
    """Direct transcription of the reference `cut` boundary rule
    (round(i*m/n)) to slice assignment, for property-testing the
    closed form."""
    targets = [int(math.floor(i * m / n + 0.5)) for i in range(n + 1)]
    out = []
    for j in range(m):
        for i in range(n):
            if targets[i] <= j < targets[i + 1]:
                out.append(i)
                break
    return out


def test_cut_closed_form_matches_boundary_rule(spark):
    cases = [(m, n) for m in range(1, 30) for n in (1, 2, 3, 5, 7, 10)]
    rows = [(m, n, j) for m, n in cases for j in range(m)]
    df = spark.createDataFrame(rows, "m long, n long, pos long")
    got = (
        df.withColumn("bucket", cut_bucket_expr(F.col("pos"), F.col("m"), F.col("n")))
        .orderBy("m", "n", "pos")
        .collect()
    )
    idx = 0
    for m, n in cases:
        want = _cut_reference(m, n)
        for j in range(m):
            r = got[idx]
            assert (r["m"], r["n"], r["pos"]) == (m, n, j)
            assert r["bucket"] == want[j], (m, n, j)
            idx += 1


# --------------------------------------------------------------------------
# DataFrame operators
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ramp_samples(spark):
    """FIXTURES.md montage fixture: ch1 = 0,1,2,... ch2 = 0,2,4,...
    at 1 Hz starting at t=0."""
    rows = []
    for i in range(21):
        rows.append(("ch1", i * 1_000_000, float(i)))
        rows.append(("ch2", i * 1_000_000, float(2 * i)))
    return spark.createDataFrame(rows, "channel string, ts long, value double")


def test_montage_golden_ramp(ramp_samples):
    """Montage golden: ch1 - ch2 = 0, -1, -2, ... (reference
    TimeSeriesFlowSpec ramp fixture)."""
    out = (
        montage_two_channels(ramp_samples, "ch1", "ch2").orderBy("ts").collect()
    )
    assert [r["value"] for r in out] == [float(-i) for i in range(21)]
    assert out[0]["channel"] == "ch1<->ch2"


def test_apply_montage_full_scheme(spark):
    """bipolar_ant_pos over a full 10-20 channel set: every pair
    yields a virtual channel whose value is lead - secondary."""
    from pennsieve_streaming_spark.operators.montage import (
        apply_montage,
        montage_pairs,
    )

    names = sorted({c for p in MONTAGE_SCHEMES["bipolar_ant_pos"] for c in p})
    base = {ch: float(i + 1) for i, ch in enumerate(names)}
    rows = [
        (ch, t * 1_000_000, base[ch] * 10 + t) for ch in names for t in range(5)
    ]
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    pairs = montage_pairs(spark, "bipolar_ant_pos")
    out = apply_montage(samples, pairs)
    got = {(r["channel"], r["ts"]): r["value"] for r in out.collect()}
    assert len(got) == len(MONTAGE_SCHEMES["bipolar_ant_pos"]) * 5
    for lead, sec in MONTAGE_SCHEMES["bipolar_ant_pos"]:
        for t in range(5):
            want = (base[lead] - base[sec]) * 10  # the +t offsets cancel
            assert got[(f"{lead}<->{sec}", t * 1_000_000)] == want


def test_montage_naming_roundtrip():
    assert montage_name("Fp1", "F7") == "Fp1<->F7"
    assert parse_montage_name("Fp1<->F7") == ("Fp1", "F7")
    assert parse_montage_name("Fp1") == ("Fp1", None)
    with pytest.raises(MontageValidationError):
        parse_montage_name("a<->b<->c")


def test_montage_validation():
    names = {c for pair in MONTAGE_SCHEMES["referential_vs_cz"] for c in pair}
    validate_montage(sorted(names), "referential_vs_cz")
    with pytest.raises(MontageValidationError):
        validate_montage(sorted(names - {"Cz"}), "referential_vs_cz")


def test_window_query_bounds(ramp_samples):
    out = window_query(ramp_samples, "ch1", 2_000_000, 5_000_000).orderBy("ts").collect()
    # start inclusive, end exclusive
    assert [r["value"] for r in out] == [2.0, 3.0, 4.0]
    assert window_query(ramp_samples, "ch1", 0, 10**9, limit=0).count() == 0


def test_downsample_count_golden(spark):
    """1000-sample ramp, chunk 64: 15 full chunks, ragged tail dropped;
    chunk k = [64k, 64k+63]."""
    rows = [("c", i * 1000, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = downsample_minmax_count(df, 64).orderBy("bucket").collect()
    assert len(out) == 15
    for k, r in enumerate(out):
        assert r["min_val"] == 64.0 * k
        assert r["max_val"] == 64.0 * k + 63
        assert r["n_samples"] == 64


def test_downsample_time_pulse_train(spark):
    """±1 square wave: every bucket that spans a transition must have
    (min, max) == (-1, 1) — the invariant behind the reference's
    pulse-train resampling goldens."""
    rate, pulse_s, total_s = 200, 5, 100
    rows = []
    for i in range(rate * total_s):
        t_us = i * 5000
        v = 1.0 if (t_us // (pulse_s * 1_000_000)) % 2 == 0 else -1.0
        rows.append(("p", t_us, v))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    bucket_us = 10_000_000  # 10 s buckets: each contains a transition
    out = downsample_minmax_time(df, 0, total_s * 1_000_000, bucket_us).collect()
    assert len(out) == 10
    for r in out:
        assert (r["min_val"], r["max_val"]) == (-1.0, 1.0)
        assert r["n_samples"] == 2000


def test_downsample_count_pulse_train_reference_golden(spark):
    """Reference ResamplingSpec golden: 200 Hz ±1 square wave (5 s
    pulses), query duration 23 s, pixel 166646 µs → chunk size 33,
    139 chunks; run-length pattern of identical (min,max) pairs is
    [30, 1, 29, 1, 29, 1, 30, 1, 17] (the trailing 17 is the cut-off
    remainder)."""
    chunk, n_chunks, _ = resample_chunk_params(166_646, 200.0, 23_000_000)
    assert (chunk, n_chunks) == (33, 139)
    total = int(23_000_000 / 1e6 * 200)  # samples within the request
    rows = [
        ("p", i * 5000, 1.0 if (i // 1000) % 2 == 0 else -1.0)
        for i in range(total)
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = downsample_minmax_count(df, chunk).orderBy("bucket").collect()
    assert len(out) == n_chunks
    pairs = [(r["min_val"], r["max_val"]) for r in out]
    runs, prev, cnt = [], None, 0
    for p in pairs:
        if p == prev:
            cnt += 1
        else:
            if prev is not None:
                runs.append(cnt)
            prev, cnt = p, 1
    runs.append(cnt)
    assert runs == [30, 1, 29, 1, 29, 1, 30, 1, 17]


def test_contig_reference_golden():
    """Reference ResamplingSpec contig golden: [(1,4),(5,8),(10,12),
    (13,18)] with threshold 2 merges to [(1,8),(10,18)]."""
    def contig(pairs, threshold):
        out = []
        for lo, hi in pairs:
            if out and lo - out[-1][1] < threshold:
                out[-1] = (out[-1][0], hi)
            else:
                out.append((lo, hi))
        return out

    assert contig([(1, 4), (5, 8), (10, 12), (13, 18)], 2) == [(1, 8), (10, 18)]


def test_contiguous_spans_reference_golden(spark):
    """Same golden through the Spark sessionization operator."""
    df = spark.createDataFrame(
        [("c", 1, 4), ("c", 5, 8), ("c", 10, 12), ("c", 13, 18)],
        "channel string, lo long, hi long",
    )
    out = contiguous_spans(df, 2).orderBy("span_lo").collect()
    assert [(r["span_lo"], r["span_hi"]) for r in out] == [(1, 8), (10, 18)]


def test_contiguous_spans_threshold_semantics(spark):
    """Merge iff gap < threshold; gap == threshold starts a new span
    (reference combine: `(first.lo - last.hi) >= threshold` separates)."""
    thr = 1000
    rows = [
        ("c", 0, 100),
        ("c", 100 + thr - 1, 200 + thr),   # gap thr-1 -> merge
        ("c", 200 + thr + thr, 5000),      # gap == thr -> new span
    ]
    df = spark.createDataFrame(rows, "channel string, lo long, hi long")
    out = contiguous_spans(df, thr).orderBy("span_lo").collect()
    assert len(out) == 2
    assert (out[0]["span_lo"], out[0]["span_hi"], out[0]["n_segments"]) == (
        0,
        200 + thr,
        2,
    )
    assert out[1]["n_segments"] == 1


def test_gap_spans_from_point_samples(spark):
    rows = [("c", t, 0.0) for t in [0, 10, 20, 5000, 5010, 90000]]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = (
        contiguous_spans(samples_to_spans(df), 1000).orderBy("span_lo").collect()
    )
    assert [(r["span_lo"], r["span_hi"], r["n_segments"]) for r in out] == [
        (0, 20, 3),
        (5000, 5010, 2),
        (90000, 90000, 1),
    ]


def test_fill_gaps_casework(spark):
    """fillGap: disjoint-up extends max to successor min; disjoint-down
    extends min to successor max; overlap/containment unchanged; last
    row self-flipped (unchanged)."""
    rows = [
        ("c", 0, 0.0, 1.0),    # next (2,3) disjoint-up  -> (0,2)
        ("c", 1, 2.0, 3.0),    # next (0.5,1.5): min1>max2 -> (1.5,3)
        ("c", 2, 0.5, 1.5),    # next (1.0,1.2) contained -> unchanged
        ("c", 3, 1.0, 1.2),    # last -> unchanged
    ]
    df = spark.createDataFrame(rows, "channel string, bucket long, min_val double, max_val double")
    out = {r["bucket"]: r for r in fill_gaps(df).collect()}
    assert (out[0]["filled_min"], out[0]["filled_max"]) == (0.0, 2.0)
    assert (out[1]["filled_min"], out[1]["filled_max"]) == (1.5, 3.0)
    assert (out[2]["filled_min"], out[2]["filled_max"]) == (0.5, 1.5)
    assert (out[3]["filled_min"], out[3]["filled_max"]) == (1.0, 1.2)


def test_event_summary_data_driven_chunking(spark):
    """Data-driven buckets start at the first event and roll when an
    event lands >= pixel_width after the chunk start (the
    PredicateStreamChunker rule) — verify against a direct simulation."""
    rng = np.random.default_rng(42)
    ts = np.cumsum(rng.integers(1, 3000, size=300)).tolist()
    rows = [("e", int(t), 0.0) for t in ts]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    pixel = 5000
    out = (
        event_summary_data_driven(df, 0, 10**12, pixel)
        .orderBy("bucket")
        .collect()
    )
    # simulate
    chunks, start = [], None
    for t in ts:
        if start is None or t - start >= pixel:
            chunks.append([])
            start = t
        chunks[-1].append(t)
    assert len(out) == len(chunks)
    for r, c in zip(out, chunks):
        assert r["min_time"] == c[0]
        assert r["max_time"] == c[-1]
        assert r["count"] == len(c)
        assert r["avg_time"] == (c[0] + c[-1]) // 2


# --------------------------------------------------------------------------
# A4 realtime resample: calculateChunks Long-division semantics
# --------------------------------------------------------------------------

def test_realtime_chunk_count_long_division(spark):
    """calculateChunks divides two Longs BEFORE Math.round, so
    span=1e6 / pixel=10001 must give 99 chunks, not round(99.99)=100
    (reference ResamplingSpec case; TimeSeriesQueryUtils.scala:237-238)."""
    from pennsieve_streaming_spark.operators.realtime import (
        resample_ingest_segments,
    )

    data = [float(i) for i in range(1000)]  # period 1000 µs -> span 1e6
    segs = spark.createDataFrame(
        [("c", 0, 1000.0, data)],
        "channel string, start_ts long, sample_period double, data array<double>",
    )
    out = resample_ingest_segments(segs, 10001).collect()
    assert len(out) == 99  # floor(1_000_000 / 10_001)
    assert all(r["is_min_max"] for r in out)
    assert {r["bucket"] for r in out} == set(range(99))


def test_realtime_chunk_count_zero_emits_nothing(spark):
    """span < pixelDuration -> chunkCount 0 -> cut(data, 0) is empty in
    the reference; the engine must emit no rows (not a divide-by-zero
    bucket)."""
    from pennsieve_streaming_spark.operators.realtime import (
        resample_ingest_segments,
    )

    segs = spark.createDataFrame(
        [("c", 0, 50_000.0, [1.0]), ("d", 0, 200_000.0, [2.0, 3.0])],
        "channel string, start_ts long, sample_period double, data array<double>",
    )
    out = resample_ingest_segments(segs, 100_000).collect()
    # 'c' resamples with chunk_count 0 -> dropped; 'd' passes through raw
    assert {r["channel"] for r in out} == {"d"}
    assert all(not r["is_min_max"] for r in out)


def test_explode_segments_integer_period(spark):
    """Fractional sample periods must materialize as
    ts = start + pos * round(period) — a constant integer step, not
    per-sample rounding drift (QuerySequencer rounds 1e6/rate to Long
    once; QuerySequencer.scala:82-87)."""
    from pennsieve_streaming_spark.streaming import explode_segments_to_samples

    segs = spark.createDataFrame(
        [("c", 0, 4000.5, [float(i) for i in range(10)])],
        "channel string, start_ts long, sample_period double, data array<double>",
    )
    ts = [r["ts"] for r in
          explode_segments_to_samples(segs).orderBy("ts").collect()]
    assert ts == [i * 4001 for i in range(10)]  # NOT round(i * 4000.5)


def test_jaccard_hot_shingle_cap_bounds_join(spark):
    """A shingle shared by every doc must not explode the all-pairs
    join when max_doc_freq caps it; pairs then reflect only the
    non-boilerplate overlap."""
    from pennsieve_streaming_spark.llm.dedup import jaccard_pairs

    # 30 docs all share shingle 999; docs 0/1 also share shingle 7
    rows = [(d, 999) for d in range(30)] + [(0, 7), (1, 7)]
    sh = spark.createDataFrame(rows, "doc_id long, sh long")
    capped = jaccard_pairs(sh, max_doc_freq=10).collect()
    # without the cap: C(30,2)=435 pairs; with it only (0,1) survives
    assert len(capped) == 1
    r = capped[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    # sizes still count ALL shingles (jaccard is the capped lower bound)
    assert r["n_a"] == 2 and r["n_b"] == 2 and r["inter"] == 1
    uncapped = jaccard_pairs(sh).collect()
    assert len(uncapped) == 435


def test_count_downsample_regular_fast_path(spark):
    """On gap-free regular channels the arithmetic-index variant must
    equal the window-based count variant exactly — and its plan must
    contain no Window (the whole point: no per-channel sort through
    one task)."""
    from pennsieve_streaming_spark.operators import (
        downsample_minmax_count,
        downsample_minmax_count_regular,
    )

    rows = [
        (ch, 500 + i * 4000, float((i * 7 + hash(ch)) % 101))
        for ch in ("a", "b")
        for i in range(1003)
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    slow = downsample_minmax_count(df, 50)
    fast = downsample_minmax_count_regular(df, 50, period_us=4000)
    assert sorted(map(tuple, slow.collect())) == sorted(map(tuple, fast.collect()))
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_reference_realtime_resample_goldens(spark):
    """Port of the reference's resampleMessage goldens
    (TimeSeriesFlowSpec.scala:587-644): data 1..100 at period 10000.
    pixel 10001 -> 99 min/max chunks starting (1,1),(2,2)..;
    pixel 30001 -> chunkCount 33, samplePeriod 1e6/33;
    pixel == period and pixel < period -> passthrough, not min/max."""
    from pennsieve_streaming_spark.operators.realtime import (
        resample_ingest_segments,
    )

    data = [float(i) for i in range(1, 101)]
    segs = spark.createDataFrame(
        [("abc", 0, 10000.0, data)],
        "channel string, start_ts long, sample_period double, data array<double>",
    )

    r = sorted(
        resample_ingest_segments(segs, 10001).collect(),
        key=lambda x: x["bucket"],
    )
    assert len(r) == 99 and all(x["is_min_max"] for x in r)
    first_ten = [v for x in r[:5] for v in (x["min_val"], x["max_val"])]
    assert first_ten == [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0, 5.0, 5.0]

    r = resample_ingest_segments(segs, 30001).collect()
    assert {x["bucket"] for x in r} == set(range(33))
    assert all(x["is_min_max"] for x in r)
    period = r[0]["out_period"]
    assert round(period * 10000) / 10000.0 == 30303.0303  # 1e6 / 33

    for pixel in (10000, 1000):  # equal / finer pixel -> passthrough
        r = sorted(
            resample_ingest_segments(segs, pixel).collect(),
            key=lambda x: x["bucket"],
        )
        assert len(r) == 100 and not any(x["is_min_max"] for x in r)
        assert [x["min_val"] for x in r[:10]] == data[:10]


def test_reference_fill_gaps_golden_vectors(spark):
    """The exact fillGaps sequences the reference pins
    (TimeSeriesRequestSpec.scala:59-85): clean ramps untouched,
    disjoint-up stretches max to next min, disjoint-down pulls min
    back, containment (either direction) untouched."""
    cases = [
        ([(0.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 4.0)],
         [(0.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 4.0)]),
        ([(0.0, 1.0), (1.1, 2.0), (2.1, 3.0), (3.1, 4.0)],
         [(0.0, 1.1), (1.1, 2.1), (2.1, 3.1), (3.1, 4.0)]),
        ([(3.0, 4.0), (2.0, 2.9)],
         [(2.9, 4.0), (2.0, 2.9)]),
        ([(1.0, 10.0), (2.0, 9.0)],
         [(1.0, 10.0), (2.0, 9.0)]),
        ([(2.0, 9.0), (1.0, 10.0)],
         [(2.0, 9.0), (1.0, 10.0)]),
    ]
    for seq, want in cases:
        df = spark.createDataFrame(
            [("c", i, lo, hi) for i, (lo, hi) in enumerate(seq)],
            "channel string, bucket long, min_val double, max_val double",
        )
        got = [
            (r["filled_min"], r["filled_max"])
            for r in fill_gaps(df).orderBy("bucket").collect()
        ]
        assert got == want, (seq, got, want)


def test_reference_montage_fixture_golden(spark):
    """Custom-montage golden from the reference flow spec
    (TimeSeriesFlowSpec.scala:472, fixtures montage/channel{1,2}):
    ramp 0,1,2,.. minus ramp 0,2,4,.. = 0,-1,-2,..,-10 over the
    requested window."""
    import os

    base = "/root/reference/src/test/resources/montage"
    if not os.path.exists(f"{base}/channel1"):
        pytest.skip("reference fixture not available")

    from pennsieve_streaming_spark.sources import read_value_files

    vals = read_value_files(spark, f"{base}/channel*")
    samples = vals.select(
        F.when(F.col("location") == "channel1", "lead").otherwise("sec").alias("channel"),
        (F.col("pos") * 1_000_000).alias("ts"),
        "value",
    )
    out = (
        montage_two_channels(samples, "lead", "sec")
        .filter(F.col("ts") <= 10_000_000)
        .orderBy("ts")
        .collect()
    )
    assert [r["value"] for r in out] == [float(-i) for i in range(11)]
    assert out[0]["channel"] == "lead<->sec"


def test_blocked_sessionization_equals_single_pass(spark):
    """Two-phase blocked contiguous_spans must equal the single-window
    formulation on adversarial data: gaps exactly at/around the
    threshold, spans straddling block boundaries, multiple channels."""
    import random

    from pennsieve_streaming_spark.operators.gaps import contiguous_spans

    rng = random.Random(42)
    rows = []
    for ch in ("a", "b", "c"):
        t = 0
        for _ in range(500):
            # mix of sub-threshold steps, exact-threshold, and big gaps
            t += rng.choice([1, 5, 9, 10, 11, 40, 100])
            dur = rng.choice([0, 3, 12])  # spans can cross block edges
            rows.append((ch, t, t + dur))
    spans = spark.createDataFrame(rows, "channel string, lo long, hi long")
    single = sorted(
        map(tuple, contiguous_spans(spans, threshold_us=10).collect())
    )
    for block in (7, 10, 16, 1000):
        blocked = sorted(
            map(
                tuple,
                contiguous_spans(spans, threshold_us=10, block_us=block).collect(),
            )
        )
        assert blocked == single, f"block_us={block}"


def test_rolling_stats_golden(spark):
    """Trailing RANGE window: hand-checked frame membership, exact
    quantized sum, duplicate-ts peers included."""
    from pennsieve_streaming_spark.operators.rolling import rolling_stats

    rows = [
        ("c", 0, 1.0),
        ("c", 5, 2.5),
        ("c", 10, -1.0),
        ("c", 25, 4.0),      # outside the 10-unit window of ts<=10
        ("c", 25, 6.0),      # duplicate ts: frame peer of the row above
        ("d", 7, 100.0),     # other channel never leaks in
    ]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = {
        (r.channel, r.ts, r.value): r
        for r in rolling_stats(df, window_us=10).collect()
    }
    r0 = out[("c", 0, 1.0)]
    assert r0.n_window == 1 and r0.win_min == 1.0 and r0.win_mean == 1.0
    r10 = out[("c", 10, -1.0)]
    assert r10.n_window == 3
    assert r10.win_min == -1.0 and r10.win_max == 2.5
    assert r10.win_sum_q == 2_500_000
    assert r10.win_mean == 2_500_000 / 1_000_000 / 3
    # duplicate ts rows are peers: both ts=25 rows see both values
    for v in (4.0, 6.0):
        r25 = out[("c", 25, v)]
        assert r25.n_window == 2 and r25.win_sum_q == 10_000_000
    rd = out[("d", 7, 100.0)]
    assert rd.n_window == 1 and rd.win_mean == 100.0


def test_rolling_stats_time_bounds(spark):
    from pennsieve_streaming_spark.operators.rolling import rolling_stats

    rows = [("c", t, float(t)) for t in range(0, 100, 10)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = rolling_stats(df, window_us=20, start_us=30, end_us=70).collect()
    # only ts in [30, 70) survive, and frames see only surviving rows
    assert sorted(r.ts for r in out) == [30, 40, 50, 60]
    first = [r for r in out if r.ts == 30][0]
    assert first.n_window == 1  # ts 10/20 were filtered before framing


def test_rolling_stats_blocked_equals_single_pass(spark):
    """The blocked-halo plan must be bit-identical to the single-pass
    window for any block size >= window, including rows at block
    boundaries and ties."""
    import random

    from pennsieve_streaming_spark.operators.rolling import rolling_stats

    rng = random.Random(21)
    rows = []
    for ch in ("a", "b"):
        t = 0
        for _ in range(300):
            t += rng.choice([1, 3, 7, 25, 100])
            rows.append((ch, t, round(rng.uniform(-50, 50), 3)))
        # exact block-boundary and duplicate-ts rows
        rows.append((ch, 1000, 1.5))
        rows.append((ch, 1000, 2.5))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    single = sorted(map(tuple, rolling_stats(df, window_us=50).collect()))
    for blk in (50, 100, 1000):
        blocked = sorted(
            map(tuple, rolling_stats(df, window_us=50, block_us=blk).collect())
        )
        assert blocked == single, f"block_us={blk}"


def test_rolling_stats_blocked_rejects_small_block(spark):
    import pytest

    from pennsieve_streaming_spark.operators.rolling import rolling_stats

    df = spark.createDataFrame([("c", 1, 1.0)], "channel string, ts long, value double")
    with pytest.raises(ValueError, match="block_us"):
        rolling_stats(df, window_us=100, block_us=50)


def test_event_xcorr_matches_bruteforce(spark):
    """Bucketized interval join == O(n²) brute force on a random
    two-channel point process, including the half-open lag edge."""
    import random

    from pennsieve_streaming_spark.operators.events import event_xcorr

    rng = random.Random(31)
    rows = [("a", rng.randrange(0, 10_000)) for _ in range(120)]
    rows += [("b", rng.randrange(0, 10_000)) for _ in range(130)]
    ev = spark.createDataFrame(rows, "channel string, ts long")
    L, B = 500, 100
    got = {(r.ch_a, r.ch_b, r.lag_bin): (r.lag_lo_us, r.n)
           for r in event_xcorr(ev, L, B).collect()}
    want = {}
    ta = [t for c, t in rows if c == "a"]
    tb = [t for c, t in rows if c == "b"]
    for x in ta:
        for y in tb:
            dt = y - x
            if -L <= dt < L:
                k = (dt + L) // B
                want[("a", "b", k)] = want.get(("a", "b", k), 0) + 1
    assert {k: v[1] for k, v in got.items()} == want
    for (ca, cb, k), (lag_lo, _) in got.items():
        assert lag_lo == k * B - L


def test_event_xcorr_plan_no_cartesian(spark):
    from pennsieve_streaming_spark.operators.events import event_xcorr

    ev = spark.createDataFrame([("a", 0), ("b", 10)], "channel string, ts long")
    plan = (
        event_xcorr(ev, 100, 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_rate_bursts_flags_injected_burst(spark):
    from pennsieve_streaming_spark.operators.events import rate_bursts

    rows = []
    for bucket in range(50):
        n = 40 if bucket == 30 else 10   # burst in bucket 30
        for i in range(n):
            rows.append(("c", bucket * 1000 + i))
    ev = spark.createDataFrame(rows, "channel string, ts long")
    out = rate_bursts(ev, bucket_us=1000, z_threshold=3.0).collect()
    assert [(r.channel, r.bucket_ts, r.n) for r in out] == [("c", 30000, 40)]
    assert out[0].z > 5


def test_key_skew_report_golden(spark):
    from pennsieve_streaming_spark.operators.events import key_skew_report

    rows = [(1,)] * 50 + [(2,)] * 30 + [(3,)] * 15 + [(4,)] * 5
    df = spark.createDataFrame(rows, "user_id long")
    out = key_skew_report(df, "user_id", top_k=3).collect()
    assert [(r.key, r.n, r.rank) for r in out] == [
        ("1", 50, 1), ("2", 30, 2), ("3", 15, 3)
    ]
    assert abs(out[0].share - 0.5) < 1e-12


def test_event_autocorr_matches_bruteforce(spark):
    import random

    from pennsieve_streaming_spark.operators.events import event_autocorr

    rng = random.Random(53)
    ts = sorted(rng.sample(range(0, 5000), 150))
    ev = spark.createDataFrame([("a", t) for t in ts], "channel string, ts long")
    L, B = 400, 100
    got = {r.lag_bin: r.n for r in event_autocorr(ev, L, B).collect()}
    want = {}
    for i, x in enumerate(ts):
        for y in ts[i + 1:]:
            dt = y - x
            if 0 < dt <= L:
                want[(dt - 1) // B] = want.get((dt - 1) // B, 0) + 1
    assert got == want


def test_flatline_runs_golden(spark):
    from pennsieve_streaming_spark.operators.gaps import flatline_runs

    vals = [1.0, 5.0, 5.0, 5.0, 2.0, 2.0, 7.0, 7.0, 7.0, 7.0]
    rows = [("c", i * 10, v) for i, v in enumerate(vals)]
    rows.append(("d", 0, 9.9))  # healthy single sample
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    got = sorted(
        (r.channel, r.value, r.run_start, r.run_end, r.run_len)
        for r in flatline_runs(df, min_run=2).collect()
    )
    assert got == [
        ("c", 2.0, 40, 50, 2),
        ("c", 5.0, 10, 30, 3),
        ("c", 7.0, 60, 90, 4),
    ]
    # min_run gate
    assert flatline_runs(df, min_run=4).count() == 1


def test_event_triggered_average_locks_to_response(spark):
    """A signal with a deterministic bump exactly +2 bins after every
    trigger shows the bump in that offset bin only; samples outside
    ±L of any trigger never contribute; a trigger on a channel with
    no samples contributes nothing."""
    from pennsieve_streaming_spark.operators.events import (
        event_triggered_average,
    )

    L, B = 100, 10
    samples, triggers = [], []
    for k in range(5):
        t0 = 1000 + k * 10_000  # triggers far apart (windows disjoint)
        triggers.append(("c1", t0))
        for off in range(-L, L, B):
            v = 9.0 if off == 20 else 1.0  # bump at +2 bins
            samples.append(("c1", t0 + off, v))
    samples.append(("c1", 500_000, 77.0))   # far from any trigger
    triggers.append(("empty", 1234))        # channel with no samples
    s = spark.createDataFrame(samples, "channel string, ts long, value double")
    tr = spark.createDataFrame(triggers, "channel string, ts long")
    out = {r.off_bin: r for r in
           event_triggered_average(s, tr, L, B, 100).collect()}
    assert len(out) == 2 * L // B
    for ob, r in out.items():
        assert r.n == 5 and r.channel == "c1"
        assert r.off_lo_us == ob * B - L
        assert r.mean_value == (9.0 if r.off_lo_us == 20 else 1.0)


def test_dispersion_index_orders_regular_poisson_bursty(spark):
    """A perfectly regular stream (1/bucket) has D = 0; a clumped
    stream (all events in one of many buckets) has D ≈ n_events; a
    channel whose span includes EMPTY buckets counts them (doubling
    the span halves the mean and raises D)."""
    from pennsieve_streaming_spark.operators.events import (
        dispersion_index,
    )

    rows = []
    for i in range(10):
        rows.append(("regular", i * 100 + 5))   # one per bucket
        rows.append(("clumped", 3 * 100 + i))   # all in bucket 3
    rows.append(("clumped", 9 * 100))           # pin the span to 10
    df = spark.createDataFrame(rows, "channel string, ts long")
    out = {r.channel: r for r in dispersion_index(df, 100).collect()}
    assert out["regular"].n_buckets == 10
    assert out["regular"].dispersion == 0.0
    c = out["clumped"]
    # B=7 (buckets 3..9), S=11, sum_sq=101 -> D=(7*101-121)/(7*11)
    assert c.n_buckets == 7 and c.total == 11 and c.sum_sq == 101
    assert abs(c.dispersion - (7 * 101 - 121) / (7 * 11)) < 1e-9
    assert c.dispersion > 5.0


def test_interarrival_ks_rejects_regular_accepts_exponential(spark):
    """A metronome stream (all gaps equal) is maximally un-exponential
    (D -> e^-1 as n grows) and rejected; gaps drawn from an actual
    exponential pass; the tiny-channel guards drop."""
    import math
    import numpy as np

    from pennsieve_streaming_spark.operators.events import interarrival_ks

    rows = []
    t = 0
    for i in range(400):   # regular: every gap exactly 1000
        rows.append(("metronome", i * 1000))
    rng = np.random.default_rng(8)
    t = 0
    for g in rng.exponential(1000.0, size=400):
        t += max(1, int(g))
        rows.append(("poisson", t))
    rows.append(("tiny", 5))
    df = spark.createDataFrame(rows, "channel string, ts long")
    out = {r.channel: r for r in interarrival_ks(df).collect()}
    assert "tiny" not in out
    m = out["metronome"]
    # all mass at x = 1000, lambda = n/span ~ 1/1000: the empirical
    # CDF jumps 0 -> 1 at x=1000, so D = max(F, 1-F) = F ≈ 1 - 1/e
    assert abs(m.ks_stat - (1.0 - math.exp(-m.lam * 1000.0))) < 0.01
    assert m.rejected
    assert not out["poisson"].rejected
