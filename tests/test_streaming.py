"""Structured Streaming ingest path: segment explosion, realtime
resample inside micro-batches, session-window gap spans."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.streaming import (
    explode_segments_to_samples,
    read_ingest_stream,
    realtime_resample_stream,
    streaming_gap_sessions,
)


@pytest.fixture()
def segment_dir(spark):
    """A parquet directory of ingest segments: 2 channels × 10 segments
    of 50 samples at 1 kHz (1000 µs period), gap-free concatenation."""
    d = tempfile.mkdtemp(prefix="ingest_segs_")
    rows = []
    for ch in ("c1", "c2"):
        t = 1_000_000
        for _ in range(10):
            data = [float(i) for i in range(50)]
            rows.append((ch, t, 1000.0, data))
            t += 50 * 1000
    df = spark.createDataFrame(
        rows, "channel string, start_ts long, sample_period double, data array<double>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_explode_segments_gap_free(spark, segment_dir):
    segs = spark.read.parquet(segment_dir)
    samples = explode_segments_to_samples(segs)
    pdf = samples.filter("channel = 'c1'").orderBy("ts").toPandas()
    assert len(pdf) == 500
    diffs = pdf["ts"].diff().dropna().unique().tolist()
    assert diffs == [1000], "materialized timestamps must be gap-free"


def test_streaming_ingest_to_memory_sink(spark, segment_dir):
    stream = read_ingest_stream(spark, segment_dir, max_files_per_trigger=2)
    assert stream.isStreaming
    samples = explode_segments_to_samples(stream)
    q = (
        samples.writeStream.format("memory")
        .queryName("ingested")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) c FROM ingested").collect()[0]["c"]
    assert n == 1000


def test_streaming_realtime_resample(spark, segment_dir):
    stream = read_ingest_stream(spark, segment_dir)
    resampled = realtime_resample_stream(stream, realtime_pixel_duration_us=10_000)
    q = (
        resampled.writeStream.format("memory")
        .queryName("rt")
        .outputMode("complete" if resampled.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM rt").collect()
    # 50 samples * 1000 µs span per segment / 10000 µs pixel = 5 chunks
    assert all(r["is_min_max"] for r in rows)
    per_seg = {}
    for r in rows:
        per_seg.setdefault((r["channel"], r["start_ts"]), []).append(r)
    assert all(len(v) == 5 for v in per_seg.values())
    # chunk of 10 values 0..9 per bucket of the 0..49 ramp
    first = sorted(
        per_seg[("c1", 1_000_000)], key=lambda r: r["bucket"]
    )
    assert [r["min_val"] for r in first] == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert [r["max_val"] for r in first] == [9.0, 19.0, 29.0, 39.0, 49.0]


def test_streaming_gap_sessions(spark, segment_dir):
    segs = spark.read.parquet(segment_dir)
    # make two bursts per channel by shifting half the segments far away
    samples = explode_segments_to_samples(segs).withColumn(
        "ts",
        F.when(F.col("ts") >= 1_250_000, F.col("ts") + 60_000_000).otherwise(
            F.col("ts")
        ),
    )
    stream_dir = tempfile.mkdtemp(prefix="samples_stream_")
    try:
        samples.write.mode("overwrite").parquet(stream_dir)
        stream = (
            spark.readStream.schema(samples.schema).parquet(stream_dir)
        )
        sessions = streaming_gap_sessions(stream, gap_us=5_000_000)
        q = (
            sessions.writeStream.format("memory")
            .queryName("sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("SELECT * FROM sessions ORDER BY channel, span_lo").collect()
        assert len(rows) == 4  # 2 channels × 2 bursts
        for r in rows:
            assert r["span_hi"] > r["span_lo"]
    finally:
        shutil.rmtree(stream_dir, ignore_errors=True)


def test_stream_quality_profile_split_invariant(spark, tmp_path):
    """Draining the quality monitor over ANY file split equals the
    batch single-pass profile (associative counters)."""
    from pennsieve_streaming_spark.streaming.quality import (
        drain_quality_profile,
    )

    rows = [
        ("a", 0, 5.0), ("a", 10, None), ("a", 20, -3.0),
        ("b", 5, 120.0), ("b", 15, 50.0), ("a", 30, 60.0),
    ]
    # two uneven file slices
    df1 = spark.createDataFrame(rows[:2], "channel string, ts long, value double")
    df2 = spark.createDataFrame(rows[2:], "channel string, ts long, value double")
    src = str(tmp_path / "src")
    df1.coalesce(1).write.mode("append").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    out = drain_quality_profile(
        spark, stream, 0.0, 100.0, str(tmp_path / "ckpt"),
        query_name="qprof_test",
    )
    got = {r.channel: r for r in out.collect()}
    a = got["a"]
    assert (a.n, a.n_null, a.n_below, a.n_above) == (4, 1, 1, 0)
    assert (a.ts_min, a.ts_max, a.v_min, a.v_max) == (0, 30, -3.0, 60.0)
    b = got["b"]
    assert (b.n, b.n_null, b.n_below, b.n_above) == (2, 0, 0, 1)


def test_stream_distinct_events_dedups_across_batches(spark, tmp_path):
    """Duplicates arriving in LATER micro-batches are still suppressed
    (cross-batch state), and each key is emitted exactly once."""
    from pennsieve_streaming_spark.streaming.dedup_events import (
        drain_distinct_events,
    )

    src = str(tmp_path / "src")
    d1 = spark.createDataFrame([(1,), (2,), (3,)], "event_id long")
    d2 = spark.createDataFrame([(2,), (3,), (4,)], "event_id long")  # overlaps
    d1.coalesce(1).write.mode("append").parquet(src)
    d2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema("event_id long").parquet(src)
    out = drain_distinct_events(
        spark, stream, str(tmp_path / "ckpt"), query_name="dd_test"
    )
    ids = sorted(r.event_id for r in out.collect())
    assert ids == [1, 2, 3, 4]


def test_stream_trend_drain_equals_batch(spark, tmp_path):
    """Multi-file availableNow drain of the trend-moment aggregation
    equals batch trend_segments (associative moments + shared
    finish)."""
    import numpy as np
    import pandas as pd

    from pennsieve_streaming_spark.operators.stats import trend_segments
    from pennsieve_streaming_spark.streaming.trend import (
        drain_trend_segments,
    )

    rng = np.random.default_rng(3)
    rows = []
    for ch in ("a", "b"):
        for t in range(400):
            rows.append((ch, t * 7, float(rng.uniform(0, 50) + t * 0.1)))
    pdf = pd.DataFrame(rows, columns=["channel", "ts", "value"])
    src = str(tmp_path / "src")
    # two files -> two micro-batch candidates
    spark.createDataFrame(pdf.iloc[:500]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(pdf.iloc[500:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    got = drain_trend_segments(
        spark, stream, 700, 70, str(tmp_path / "ckpt"),
        query_name="trseg_test",
    ).collect()
    df = spark.createDataFrame(pdf)
    want = trend_segments(df, 700, 70).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0


def test_stream_drift_drain_equals_batch(spark, tmp_path):
    """Multi-file availableNow drain of the PSI counter aggregation
    equals batch distribution_drift (associative counters + shared
    densify/PSI finish), including channels with empty bins and an
    all-reference channel."""
    import numpy as np
    import pandas as pd

    from pennsieve_streaming_spark.operators.stats import (
        distribution_drift,
    )
    from pennsieve_streaming_spark.streaming.drift import (
        drain_distribution_drift,
    )

    rng = np.random.default_rng(11)
    rows = []
    for ch, shift in (("a", 0.0), ("b", 30.0)):
        for t in range(600):
            # ts >= 5000 is the "current" window; channel b drifts
            v = rng.uniform(0, 60) + (shift if t * 10 >= 5000 else 0.0)
            rows.append((ch, t * 10, float(v)))
    for t in range(50):  # all-reference channel (n_cur = 0)
        rows.append(("refonly", t, float(rng.uniform(0, 60))))
    pdf = pd.DataFrame(rows, columns=["channel", "ts", "value"])
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf.iloc[:700]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(pdf.iloc[700:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    got = drain_distribution_drift(
        spark, stream, 5000, 0.0, 100.0, 10, str(tmp_path / "ckpt"),
        query_name="drift_test",
    ).collect()
    df = spark.createDataFrame(pdf)
    want = distribution_drift(df, 5000, 0.0, 100.0, 10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    by_ch = {r.channel: r for r in got}
    assert by_ch["b"].psi > by_ch["a"].psi  # planted drift detected
    assert by_ch["refonly"].n_cur == 0


def test_stream_histogram_drain_equals_batch(spark, tmp_path):
    """Multi-file availableNow drain of the histogram counters equals
    batch value_histogram, including out-of-range rows dropped on
    both paths."""
    import numpy as np
    import pandas as pd

    from pennsieve_streaming_spark.operators.stats import value_histogram
    from pennsieve_streaming_spark.streaming.histogram import (
        drain_value_histogram,
    )

    rng = np.random.default_rng(4)
    rows = [
        (ch, int(t), float(v))
        for ch in ("a", "b")
        for t, v in enumerate(rng.uniform(-20, 120, size=300))
    ]
    pdf = pd.DataFrame(rows, columns=["channel", "ts", "value"])
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf.iloc[:350]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(pdf.iloc[350:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    got = drain_value_histogram(
        spark, stream, 0.0, 100.0, 10, str(tmp_path / "ckpt"),
        query_name="vh_test",
    ).collect()
    want = value_histogram(
        spark.createDataFrame(pdf), 0.0, 100.0, 10
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert sum(r.n for r in got) < len(rows)  # out-of-range dropped
