"""Unit-channel serving path: summary vs spikes vs raw decision."""

from __future__ import annotations

import pytest

from pennsieve_streaming_spark.serving import QuerySession, TimeSeriesRequest


@pytest.fixture()
def unit_session(spark):
    events = spark.createDataFrame(
        [("u1", t * 1000, 0.0) for t in range(0, 100_000, 100)],
        "channel string, ts long, value double",
    )
    waveforms = spark.createDataFrame(
        [("u1", t * 1000, [float(i) for i in range(32)]) for t in range(0, 100_000, 1000)],
        "channel string, spike_ts long, waveform array<double>",
    )
    samples = spark.createDataFrame([], "channel string, ts long, value double")
    sess = QuerySession(spark, samples, {"u1": 250.0}, "u-sess")
    return sess, events, waveforms


def test_raw_event_timestamps(unit_session):
    sess, events, _ = unit_session
    out = sess.run_unit(
        TimeSeriesRequest("u-sess", ["u1"], 0, 10_000_000, pixel_width=0), events
    )
    rows = out["u1"].collect()
    assert len(rows) == 101  # inclusive end (P2 trimEvents semantics)
    assert set(out["u1"].columns) == {"channel", "ts"}


def test_event_summary_mode(unit_session):
    sess, events, _ = unit_session
    out = sess.run_unit(
        TimeSeriesRequest("u-sess", ["u1"], 0, 100_000_000, pixel_width=10_000_000),
        events,
    )
    rows = out["u1"].orderBy("bucket").collect()
    assert len(rows) == 10
    assert all(r["count"] == 100 for r in rows)


def test_spike_mode_when_zoomed(unit_session):
    sess, events, waveforms = unit_session
    # spike_duration 2_000_000 µs; pixel 100_000 -> 100_000*10 < 2_000_000
    out = sess.run_unit(
        TimeSeriesRequest("u-sess", ["u1"], 0, 10_000_000, pixel_width=100_000),
        events,
        waveforms=waveforms,
        spike_duration_us=2_000_000,
    )
    rows = out["u1"].collect()
    # 11 spikes in window x 20 resample points
    spikes = {r["spike_ts"] for r in rows}
    assert len(spikes) == 11
    per_spike = [r for r in rows if r["spike_ts"] == 0]
    assert len(per_spike) == 20
