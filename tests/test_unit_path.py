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


def test_reference_unit_data_goldens(spark):
    """Port of UnitDataRequestSpec (src/test/scala/com/pennsieve/
    streaming/UnitDataRequestSpec.scala:43-149) against the reference's
    own events fixture: (a) the first spike waveform min/max-resampled
    to 17 points, (b) the data-driven event summary (avgTime, count)
    stream and the global index range, both in the reference's file
    order."""
    import os

    import pytest as _pytest

    src = "/root/reference/src/test/resources/events"
    if not os.path.exists(src):
        _pytest.skip("reference fixture not available")

    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.operators.events import (
        event_summary_data_driven,
    )
    from pennsieve_streaming_spark.operators.spikes import (
        resample_positions_minmax,
    )
    from pennsieve_streaming_spark.sources import read_value_files

    vals = read_value_files(spark, src)  # (location, pos, value)

    # (a) spike waveforms: group the value stream per 52 points,
    # resample each waveform to spikeDuration/pixelWidth = 1733/100 = 17
    wf = vals.select(
        F.floor(F.col("pos") / 52).cast("long").alias("spike_ts"),
        (F.col("pos") % 52).alias("pos"),
        F.lit(52).cast("long").alias("m"),
        F.col("value").alias("v"),
    )
    first = (
        resample_positions_minmax(wf, 17, key_cols=("spike_ts",))
        .filter(F.col("spike_ts") == 0)
        .orderBy("bucket")
        .collect()
    )
    expected_first_wave = [
        (0.0, 1.19974637e8), (1.06728613e8, 9.67618823e8),
        (1.57007241e8, 3.17041814e8), (1.31918108e8, 5.87785243e8),
        (1.31918108e8, 7.13118493e8), (1.80543303e8, 5.87785243e8),
        (1.57007241e8, 9.5105654e8), (1.06728613e8, 9.67618823e8),
        (1.06953895e8, 5.8139775e8), (1.06728613e8, 9.67618823e8),
        (1.57007241e8, 3.17041814e8), (1.31918108e8, 5.87785243e8),
        (1.31918108e8, 7.13118493e8), (1.80543303e8, 5.87785243e8),
        (1.57007241e8, 9.5105654e8), (1.06728613e8, 9.67618823e8),
        (1.1627955e8, 1.19974637e8),
    ]
    assert [(r["min_val"], r["max_val"]) for r in first] == expected_first_wave

    # (b) event summary in file order (reference stream order), pixel
    # width 100000 µs: golden (avgTime, count) pairs + index range
    events = vals.select(
        F.lit("u").alias("channel"),
        F.col("value").cast("long").alias("ts"),
        "pos",
    )
    summary = event_summary_data_driven(
        events, 0, 2**62, 100_000, order_cols=("pos",)
    ).orderBy("bucket").collect()
    assert [(r["avg_time"], r["count"]) for r in summary] == [
        (0, 1), (113464266, 2), (534781953, 947), (552674525, 300),
    ]
    assert summary[0]["min_index"] == 0
    assert summary[-1]["max_index"] == 1249
