"""Native session_window streaming agg: emission semantics + parity
with both the batch sessionizer and the custom stateful sessionizer."""

from __future__ import annotations

import tempfile

from pennsieve_streaming_spark.operators.gaps import (
    contiguous_spans,
    samples_to_spans,
)
from pennsieve_streaming_spark.streaming.session_window import (
    stream_session_agg,
)

T0 = 694_224_000_000_000
GAP = 5_000_000  # 5 s


def _drive(spark, rows):
    base = tempfile.mkdtemp(prefix="pss_sw_test_")
    spark.createDataFrame(
        rows, "channel string, ts long, value double"
    ).coalesce(1).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    q = (
        stream_session_agg(stream, GAP)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.channel, r.session_lo, r.session_end, r.n, r.min_val, r.max_val)
        for r in spark.read.parquet(f"{base}/out").collect()
    )


def test_session_rule_matches_batch_sessionizer(spark):
    # bursts at 0-2s, 10-11s, 30s; gaps 8s and 19s both >= 5s
    rows = [
        ("a", T0 + t * 1_000_000, float(i))
        for i, t in enumerate([0, 1, 2, 10, 11, 30])
    ] + [("a", T0 + 60_000_000, 9.9)]  # tail far out so all above close
    got = _drive(spark, rows)
    spans = {
        (r.channel, r.span_lo, r.span_hi, r.n_segments)
        for r in contiguous_spans(
            samples_to_spans(
                spark.createDataFrame(
                    rows, "channel string, ts long, value double"
                ).select("channel", "ts", "value")
            ),
            GAP,
        ).collect()
    }
    for ch, lo, end, n, _, _ in got:
        assert (ch, lo, end - GAP, n) in spans
    # the three early sessions closed; the tail session stays open
    assert [g[1] for g in got] == [T0, T0 + 10_000_000, T0 + 30_000_000]


def test_session_boundary_merge_vs_split(spark):
    # 4.999s gap merges (< gap), 5s gap splits (>= gap) — the
    # reference rule, pinned on the native operator
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + GAP - 1, 2.0),        # merges
        ("a", T0 + 2 * GAP - 1 + GAP, 3.0),  # ts - prev = GAP -> splits
        ("a", T0 + 100_000_000, 0.0),    # closer
    ]
    got = _drive(spark, rows)
    assert [(g[1], g[3]) for g in got] == [
        (T0, 2),
        (T0 + 3 * GAP - 1, 1),
    ]


def test_session_aggregates_min_max(spark):
    rows = [
        ("a", T0, 5.0),
        ("a", T0 + 1_000_000, -2.0),
        ("a", T0 + 2_000_000, 3.0),
        ("a", T0 + 50_000_000, 0.0),
    ]
    [(ch, lo, end, n, mn, mx)] = _drive(spark, rows)
    assert (ch, n, mn, mx) == ("a", 3, -2.0, 5.0)
