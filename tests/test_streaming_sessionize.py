"""Streaming sessionization: emitted closed spans + the still-open
per-channel span must equal the BATCH contiguous_spans output over
everything ingested, wherever the micro-batch boundaries fall."""

from __future__ import annotations

import os
import random
import shutil
import tempfile

from pennsieve_streaming_spark.operators.gaps import contiguous_spans
from pennsieve_streaming_spark.streaming.sessionize import sessionize_stream

THRESHOLD = 1_000


def _run_stream(spark, batch_dirs, name):
    src = tempfile.mkdtemp(prefix="sess_src_")
    stream = (
        spark.readStream.schema("channel string, lo long, hi long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream(stream, THRESHOLD)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        for i, b in enumerate(batch_dirs):
            for f in os.listdir(b):
                if f.startswith(".") or not f.endswith(".parquet"):
                    continue
                shutil.copy(os.path.join(b, f), os.path.join(src, f"{i}_{f}"))
            q.processAllAvailable()
        return spark.sql(
            f"SELECT * FROM {name} ORDER BY channel, span_lo"
        ).collect()
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def _write_batches(spark, rows_per_batch):
    dirs = []
    for rows in rows_per_batch:
        d = tempfile.mkdtemp(prefix="sess_batch_")
        spark.createDataFrame(
            rows, "channel string, lo long, hi long"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        dirs.append(d)
    return dirs


def _gen_spans(rng, channel, n):
    """Per-channel spans with a mix of small gaps (merge) and large
    gaps (close), non-decreasing lo."""
    spans, t = [], rng.randrange(0, 500)
    for _ in range(n):
        width = rng.randrange(10, 400)
        spans.append((channel, t, t + width))
        gap = rng.choice([5, 50, 500, 2_000, 10_000])
        t = t + width + gap
    return spans


def test_stream_equals_batch_modulo_open_span(spark):
    rng = random.Random(7)
    all_rows = []
    for ch in ("a", "b", "c"):
        all_rows.extend(_gen_spans(rng, ch, 30))
    # split each channel's ordered spans at arbitrary points into 3
    # micro-batches (order preserved per channel)
    batches = [[], [], []]
    by_ch = {}
    for r in all_rows:
        by_ch.setdefault(r[0], []).append(r)
    for ch, rows in by_ch.items():
        c1, c2 = sorted(rng.sample(range(1, len(rows)), 2))
        batches[0].extend(rows[:c1])
        batches[1].extend(rows[c1:c2])
        batches[2].extend(rows[c2:])

    dirs = _write_batches(spark, batches)
    try:
        streamed = _run_stream(spark, dirs, "sess_out_eq")
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    batch_df = contiguous_spans(
        spark.createDataFrame(all_rows, "channel string, lo long, hi long"),
        THRESHOLD,
    )
    expected = sorted(
        (r["channel"], r["span_lo"], r["span_hi"], r["n_segments"])
        for r in batch_df.collect()
    )
    got = sorted(
        (r["channel"], r["span_lo"], r["span_hi"], r["n_segments"])
        for r in streamed
    )
    # the stream withholds exactly the still-open (last) span per channel
    open_spans = {}
    for tup in expected:
        open_spans[tup[0]] = tup  # last per channel in sorted order
    expected_closed = [t for t in expected if t != open_spans[t[0]]]
    assert got == expected_closed


def test_single_batch_emits_all_but_open(spark):
    rows = [
        ("x", 0, 100),
        ("x", 150, 300),      # gap 50 < threshold: merges
        ("x", 5_000, 5_100),  # gap >= threshold: closes first span
        ("x", 9_000, 9_050),  # closes second span
    ]
    dirs = _write_batches(spark, [rows])
    try:
        got = _run_stream(spark, dirs, "sess_out_single")
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    tuples = [(r["span_lo"], r["span_hi"], r["n_segments"]) for r in got]
    assert tuples == [(0, 300, 2), (5_000, 5_100, 1)]


def test_merge_across_batch_boundary(spark):
    # span 2 continues span 1 across the micro-batch boundary; nothing
    # is emitted until the closing gap arrives in batch 2
    b1 = [("y", 0, 100)]
    b2 = [("y", 120, 200), ("y", 50_000, 50_010)]
    dirs = _write_batches(spark, [b1, b2])
    try:
        got = _run_stream(spark, dirs, "sess_out_bound")
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    tuples = [(r["span_lo"], r["span_hi"], r["n_segments"]) for r in got]
    assert tuples == [(0, 200, 2)]
