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


def test_unit_path_end_to_end_from_binaries(spark, tmp_path):
    """Full S2/S4/S3/G4/A3 chain, reference-shaped: 9-byte tsindex
    event records + BE-double tsblob waveform files decode, pair
    waveform k with the k-th spike timestamp (WsClient.getSpikes),
    and min/max cut-resample to pixel points — checked against a
    NumPy simulation of the reference's cut()."""
    import gzip
    import struct

    import numpy as np

    from pennsieve_streaming_spark.operators.events import index_events
    from pennsieve_streaming_spark.operators.spikes import (
        resample_positions_minmax,
        spike_data_point_count,
        waveforms_from_positions,
    )
    from pennsieve_streaming_spark.sources import (
        decode_binary_positions,
        decode_event_files,
    )

    rate, spike_dur_us = 30_000.0, 533  # ~16 points per waveform
    ppc = spike_data_point_count(spike_dur_us, rate)
    rng = np.random.default_rng(21)
    chans = {"u1": 9, "u2": 7}  # spikes per channel
    spike_ts = {c: sorted(rng.choice(10**9, n, replace=False).tolist())
                for c, n in chans.items()}
    waves = {c: rng.standard_normal((n, ppc)) for c, n in chans.items()}

    for c in chans:
        # tsindex: 8-byte BE ts + 1 classification byte (gzipped, S4)
        idx = b"".join(struct.pack(">q", t) + b"\x03" for t in spike_ts[c])
        (tmp_path / f"{c}.tsindex").write_bytes(gzip.compress(idx))
        # tsblob: concatenated BE-double waveforms (S3 kernel)
        blob = waves[c].astype(">f8").tobytes()
        (tmp_path / f"{c}.tsblob").write_bytes(blob)

    ev_catalog = spark.createDataFrame(
        [(f"{c}.tsindex", c) for c in chans], "location string, channel string"
    )
    blob_catalog = spark.createDataFrame(
        [(f"{c}.tsblob", c) for c in chans], "location string, channel string"
    )
    events = decode_event_files(spark, str(tmp_path / "*.tsindex"), ev_catalog)
    indexed = index_events(events.select("channel", "ts"))
    positions = decode_binary_positions(spark, str(tmp_path / "*.tsblob"))
    wf = waveforms_from_positions(positions, blob_catalog, indexed, ppc)

    n_pixels = 4
    out = resample_positions_minmax(
        wf, n_pixels, key_cols=("channel", "spike_ts")
    ).collect()

    # NumPy simulation of cut(): slice boundaries at round(i*m/n)
    def cut_minmax(v, n):
        m = len(v)
        bounds = [int(np.floor(i * m / n + 0.5)) for i in range(n + 1)]
        return {
            i: (v[a:b].min(), v[a:b].max())
            for i, (a, b) in enumerate(zip(bounds, bounds[1:]))
            if b > a
        }

    expected = {}
    for c in chans:
        for k, t in enumerate(spike_ts[c]):
            for b, (lo, hi) in cut_minmax(waves[c][k], n_pixels).items():
                expected[(c, t, b)] = (lo, hi)
    got = {(r["channel"], r["spike_ts"], r["bucket"]): (r["min_val"], r["max_val"])
           for r in out}
    assert got == expected
