"""Protobuf wire-format round-trips mirroring the reference goldens
(SegmentProtobufSpec.scala:33-62, IngestSegmentSpec.scala:25-45) plus
the engine adapter from Segment-shaped rows."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pennsieve_streaming_spark.serving.protobuf import (
    Event,
    IngestSegment,
    Segment,
    TimeSeriesMessage,
    rebase_message,
    segment_row_to_message,
)

NOW = 1_723_400_000_000


def test_segment_roundtrip_golden():
    """Mirror of SegmentProtobufSpec: 123-point segment, serialize,
    parse, all fields match."""
    seg = Segment(
        start_ts=NOW,
        source="abc123",
        last_used=NOW,
        unit="V",
        sample_period=1.23,
        page_start=123,
        is_min_max=False,
        unit_m=123,
        segment_type="Continuous",
        nr_points=123,
        data=[float(i) for i in range(123)],
    )
    msg = TimeSeriesMessage(segment=seg)
    raw = msg.to_bytes()
    back = TimeSeriesMessage.from_bytes(raw)
    assert back == msg
    assert back.segment.last_used == NOW
    assert back.segment.segment_type == "Continuous"
    assert back.segment.data == [float(i) for i in range(123)]


def test_event_roundtrip():
    ev = Event(
        source="chan-1",
        page_start=0,
        page_end=1_000_000,
        sample_period=500.0,
        points_per_event=32,
        times=[10, 3, 600_000, 7],
        data=[0.5, -0.5, 1.5],
    )
    msg = TimeSeriesMessage(event=ev, total_responses=2, response_sequence_id=1)
    back = TimeSeriesMessage.from_bytes(msg.to_bytes())
    assert back == msg


def test_ingest_segment_roundtrip():
    """Mirror of IngestSegmentSpec: 999-point ingest segment."""
    i = IngestSegment(
        channel_id="abc123",
        start_time=123,
        sample_period=1000.0,
        data=[float(x) for x in range(1, 1000)],
    )
    assert IngestSegment.from_bytes(i.to_bytes()) == i


def test_default_values_omitted_and_restored():
    # proto3: defaults are not on the wire; empty message is zero bytes
    assert TimeSeriesMessage().to_bytes() == b""
    assert TimeSeriesMessage.from_bytes(b"") == TimeSeriesMessage()
    seg = Segment()
    assert seg.to_bytes() == b""
    assert Segment.from_bytes(b"") == seg


def test_negative_int64_roundtrip():
    # epoch-rebased times can go negative (startAtEpoch on pre-min data)
    seg = Segment(start_ts=-5, page_start=-123456789, page_end=1)
    assert Segment.from_bytes(seg.to_bytes()) == seg


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.lists(st.floats(allow_nan=False, width=64), max_size=20),
    st.text(max_size=30),
)
def test_segment_property_roundtrip(ts, data, name):
    seg = Segment(start_ts=ts, data=data, channel_name=name, nr_points=len(data))
    assert Segment.from_bytes(seg.to_bytes()) == seg


def test_rebase_message():
    seg = Segment(start_ts=1000, page_start=1000, page_end=2000)
    ev = Event(page_start=1000, page_end=2000, times=[1500, 3, 1800, 2])
    msg = TimeSeriesMessage(segment=seg, event=ev, total_responses=1)
    out = rebase_message(msg, 1000)
    assert out.segment.start_ts == 0
    assert out.segment.page_start == 0 and out.segment.page_end == 1000
    # times alternate [timestamp, count]: counts must NOT shift
    # (server/TimeSeriesFlow.scala:410-421 grouped(2) rebasing)
    assert out.event.times == [500, 3, 800, 2]
    assert out.total_responses == 1


def test_engine_segment_rows_serialize(spark):
    """End-to-end: downsample -> build_segments_minmax -> protobuf frame
    -> parse -> payload matches the DataFrame row."""
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_minmax_time,
    )
    from pennsieve_streaming_spark.operators.segments import (
        build_segments_minmax,
    )

    rows = [("c1", i * 1_000_000, float(i % 10)) for i in range(100)]
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    mm = downsample_minmax_time(samples, 0, 100_000_000, 10_000_000)
    segs = build_segments_minmax(
        mm, 0, 100_000_000, 10_000_000, 10_000_000
    ).collect()
    assert len(segs) == 1
    msg = segment_row_to_message(segs[0], total_responses=1)
    back = TimeSeriesMessage.from_bytes(msg.to_bytes())
    assert back == msg
    assert back.segment.channel_name == "c1"
    assert back.segment.is_min_max is True
    assert back.segment.nr_points == 10
    assert len(back.segment.data) == 20  # interleaved [min,max] pairs
    assert back.segment.data[0] == 0.0 and back.segment.data[1] == 9.0


def test_unit_rows_map_to_event_messages():
    from pennsieve_streaming_spark.serving.protobuf import (
        data_message_to_protobuf,
    )

    # event-summary rows -> Event with interleaved [avgTime, count]
    msg = data_message_to_protobuf(
        {
            "channel": "u1",
            "totalResponses": 2,
            "responseSequenceId": 1,
            "rows": [
                {"bucket": 1, "avg_time": 500, "count": 3},
                {"bucket": 0, "avg_time": 100, "count": 7},
            ],
        }
    )
    assert msg.segment is None and msg.event is not None
    assert msg.event.source == "u1"
    assert msg.event.times == [100, 7, 500, 3]
    back = TimeSeriesMessage.from_bytes(msg.to_bytes())
    assert back == msg
    # raw unit timestamps -> bare times
    msg = data_message_to_protobuf(
        {"channel": "u1", "rows": [{"channel": "u1", "ts": 9}, {"channel": "u1", "ts": 4}]}
    )
    assert msg.event.times == [4, 9]
