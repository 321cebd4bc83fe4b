"""Serving-layer tests: protocol parsing, session state, execution,
epoch cancellation plumbing."""

from __future__ import annotations

import json

import pytest

from pennsieve_streaming_spark.operators.montage import MontageValidationError
from pennsieve_streaming_spark.serving import (
    ClearFilterRequest,
    DumpBufferRequest,
    FilterRequest,
    KeepAlive,
    MontageRequest,
    QuerySession,
    TimeSeriesRequest,
    parse_request,
)


def test_parse_request_cascade():
    r = parse_request(json.dumps({
        "session": "s1",
        "virtualChannels": [{"id": "x", "name": "Fp1<->Cz"}, "C3"],
        "startTime": 100, "endTime": 200, "pixelWidth": 10,
    }))
    assert isinstance(r, TimeSeriesRequest)
    assert r.virtual_channels == ["Fp1<->Cz", "C3"]
    assert isinstance(parse_request('{"montage": "referential_vs_cz"}'), MontageRequest)
    f = parse_request(json.dumps({
        "filter": "lowpass", "filterParameters": [4, 30.0], "channels": ["C3"],
    }))
    assert isinstance(f, FilterRequest) and f.filter_parameters == [4.0, 30.0]
    assert isinstance(parse_request('{"clearFilter": true}'), ClearFilterRequest)
    assert isinstance(parse_request('{"dumpBuffer": true}'), DumpBufferRequest)
    assert isinstance(parse_request('{"keepAlive": true}'), KeepAlive)
    with pytest.raises(ValueError):
        parse_request('{"bogus": 1}')


@pytest.fixture()
def session(spark):
    rows = []
    for i in range(100):
        for ch, slope in (("Fp1", 1.0), ("Cz", 2.0), ("C3", 3.0)):
            rows.append((ch, i * 1_000_000, slope * i))
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    rates = {"Fp1": 1.0, "Cz": 1.0, "C3": 1.0}
    return QuerySession(spark, samples, rates, "sess-1")


def test_raw_window_request(session):
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3"], 10_000_000, 20_000_000, pixel_width=0
    ))
    rows = out["C3"].orderBy("ts").collect()
    assert [r["value"] for r in rows] == [30.0 + 3 * i for i in range(10)]


def test_montage_request(session):
    out = session.run(TimeSeriesRequest(
        "sess-1", ["Fp1<->Cz"], 0, 10_000_000, pixel_width=0
    ))
    rows = out["Fp1<->Cz"].orderBy("ts").collect()
    assert [r["value"] for r in rows] == [float(-i) for i in range(10)]


def test_downsample_decision(session):
    # pixel 10 s at 1 Hz -> ratio 10 > 3 -> min/max buckets
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3"], 0, 100_000_000, pixel_width=10_000_000
    ))
    rows = out["C3"].orderBy("bucket").collect()
    assert len(rows) == 10
    assert rows[0]["min_val"] == 0.0 and rows[0]["max_val"] == 27.0
    # pixel 2 s at 1 Hz -> ratio 2 <= 3 -> raw passthrough
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3"], 0, 100_000_000, pixel_width=2_000_000
    ))
    assert "bucket" not in out["C3"].columns


def test_montage_validation_via_state(session):
    with pytest.raises(MontageValidationError):
        session.set_montage(MontageRequest("sess-1", "referential_vs_cz"))


def test_filter_lifecycle(session):
    session.handle(json.dumps({
        "filter": "lowpass", "filterParameters": [2, 0.1], "channels": ["C3"],
    }))
    assert "C3" in session.state.filters
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3"], 0, 100_000_000, pixel_width=0
    ))
    assert out["C3"].count() == 100  # filtered, same cardinality
    session.handle(json.dumps({"clearFilter": True}))
    assert not session.state.filters


def test_epoch_bump_on_dump(session):
    g0 = session.job_group
    epoch = session.handle(json.dumps({"dumpBuffer": True}))
    assert epoch == 1
    assert session.job_group != g0


def test_rollup_routing(spark):
    """A session with a rollup ladder answers wide pixel queries from
    the rollup, identically to the direct raw-scan path."""
    from pennsieve_streaming_spark.operators.rollups import build_rollup

    rows = [("C3", i * 1_000_000, float(i % 97)) for i in range(7200)]
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    ladder = {
        1_000_000: build_rollup(samples, 1_000_000),
        60_000_000: build_rollup(samples, 60_000_000),
    }
    with_r = QuerySession(spark, samples, {"C3": 1.0}, "r1", rollups=ladder)
    without = QuerySession(spark, samples, {"C3": 1.0}, "r2")
    req = TimeSeriesRequest("r", ["C3"], 0, 7200_000_000, pixel_width=600_000_000)
    a = {(r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
         for r in with_r.run(req)["C3"].collect()}
    b = {(r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
         for r in without.run(req)["C3"].collect()}
    assert a == b and len(a) == 12


def test_start_at_epoch_rebase(spark, session):
    session.package_min_ts = 50_000_000
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3"], 0, 10_000_000, pixel_width=0, start_at_epoch=True
    ))
    rows = out["C3"].orderBy("ts").collect()
    # window shifted to [50s, 60s)
    assert rows[0]["value"] == 3.0 * 50


def test_rollup_routing_unaligned_window_falls_back(spark):
    """A window whose start is NOT on the rollup grid must not use the
    rollup (the straddling first bucket would be dropped); results must
    equal the direct path bit-for-bit."""
    from pennsieve_streaming_spark.operators.rollups import build_rollup

    rows = [("C3", i * 1_000_000, float(i % 97)) for i in range(7200)]
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    ladder = {60_000_000: build_rollup(samples, 60_000_000)}
    with_r = QuerySession(spark, samples, {"C3": 1.0}, "ru1", rollups=ladder)
    without = QuerySession(spark, samples, {"C3": 1.0}, "ru2")
    # start 30s: divisible by the pixel? no — and not by the 60s level
    req = TimeSeriesRequest(
        "r", ["C3"], 30_000_000, 6_630_000_000, pixel_width=600_000_000
    )
    a = sorted(
        (r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
        for r in with_r.run(req)["C3"].collect()
    )
    b = sorted(
        (r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
        for r in without.run(req)["C3"].collect()
    )
    assert a == b and len(a) == 11

def test_custom_montage_set_and_run(session):
    """Mirror of the reference custom-montage flow
    (WebServerSpec.scala:474-545): set CUSTOM_MONTAGE with a montageMap,
    get the virtual-channel list back, then run a montaged request."""
    details = session.handle(json.dumps({
        "montage": "CUSTOM_MONTAGE",
        "montageMap": [["Fp1", "Cz"], ["C3", "Cz"]],
    }))
    assert details == [
        {"id": "Fp1_id", "name": "Fp1<->Cz"},
        {"id": "C3_id", "name": "C3<->Cz"},
    ]
    assert session.state.montage == "custom"
    out = session.run(TimeSeriesRequest(
        "sess-1", ["C3<->Cz"], 0, 10_000_000, pixel_width=0
    ))
    rows = out["C3<->Cz"].orderBy("ts").collect()
    # C3 slope 3, Cz slope 2 -> diff = i
    assert [r["value"] for r in rows] == [float(i) for i in range(10)]
    # a pair outside the custom map is rejected
    with pytest.raises(ValueError):
        session.run(TimeSeriesRequest(
            "sess-1", ["Fp1<->C3"], 0, 10_000_000, pixel_width=0
        ))


def test_custom_montage_missing_channel_rejected(session):
    with pytest.raises(MontageValidationError) as ei:
        session.handle(json.dumps({
            "montage": "CUSTOM_MONTAGE",
            "montageMap": [["Fp1", "F7"]],  # F7 not in package
        }))
    assert "F7" in ei.value.channel_names


def test_custom_montage_requires_map(session):
    with pytest.raises(MontageValidationError):
        session.handle(json.dumps({"montage": "CUSTOM_MONTAGE"}))


def test_wire_montage_names(session):
    from pennsieve_streaming_spark.serving.session import parse_request

    r = parse_request('{"montage": "NOT_MONTAGED"}')
    assert r.montage is None
    r = parse_request('{"montage": "BIPOLAR_ANT_POS"}')
    assert r.montage == "bipolar_ant_pos"
