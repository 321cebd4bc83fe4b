"""Streaming windowed min/max downsample: emission semantics and
batch-boundary independence."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.streaming.downsample import (
    stream_minmax_downsample,
)

T0 = 694_224_000_000_000  # epoch-µs 1992-01-01 (epoch-aligned buckets)
B = 10_000_000            # 10 s windows


def _drive(spark, rows, n_files, max_files_per_trigger=None):
    """Write ``rows`` as ``n_files`` time-ordered slices (ascending
    mtimes so the file source replays them in event-time order — the
    ingest contract; out-of-order arrival is legitimate late data and
    WOULD change the emitted set, that's what the watermark is for)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tempfile.mkdtemp(prefix="pss_smm_test_")
    os.makedirs(f"{base}/src")
    ordered = sorted(rows, key=lambda r: r[1])
    per = (len(ordered) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = ordered[i * per : (i + 1) * per]
        if not chunk:
            continue
        pdf = pd.DataFrame(chunk, columns=["channel", "ts", "value"])
        path = f"{base}/src/slice_{i:03d}.parquet"
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), path
        )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))
    reader = spark.readStream.schema("channel string, ts long, value double")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(f"{base}/src")
    q = (
        stream_minmax_downsample(stream, B)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.channel, r.win_start, r.min_val, r.max_val, r.n)
        for r in spark.read.parquet(f"{base}/out").collect()
    )


def _expected(rows):
    """Batch downsample restricted to windows closed by the final
    watermark (max event time floored to ms)."""
    wm = max(t for _, t, _ in rows) // 1000 * 1000
    agg = {}
    for ch, t, v in rows:
        k = (ch, t // B * B)
        lo, hi, n = agg.get(k, (v, v, 0))
        agg[k] = (min(lo, v), max(hi, v), n + 1)
    return sorted(
        (ch, ws, lo, hi, n)
        for (ch, ws), (lo, hi, n) in agg.items()
        if ws + B <= wm
    )


def _mkrows():
    rows = []
    for ch, base_off in [("a", 0), ("b", 3_000_000)]:
        for i in range(40):
            rows.append((ch, T0 + base_off + i * 1_700_000, float((i * 7) % 13)))
    return rows


def test_emitted_equals_closed_batch_windows(spark):
    rows = _mkrows()
    assert _drive(spark, rows, n_files=1) == _expected(rows)


def test_batch_boundaries_do_not_change_emitted_set(spark):
    rows = _mkrows()
    one = _drive(spark, rows, n_files=1)
    many = _drive(spark, rows, n_files=8, max_files_per_trigger=1)
    assert one == many == _expected(rows)


def test_window_ending_exactly_at_watermark_emits(spark):
    rows = [("a", T0, 1.0), ("a", T0 + 5_000_000, 2.0), ("a", T0 + B, 9.0)]
    # max ts == end of window [T0, T0+B) -> that window closes; the
    # window holding the max stays open
    got = _drive(spark, rows, n_files=1)
    assert got == [("a", T0, 1.0, 2.0, 2)]
