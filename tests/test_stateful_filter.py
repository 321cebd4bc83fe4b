"""Streaming stateful filter: two micro-batches must produce output
bit-identical to one-shot BATCH filtering (state continuity + the same
reflected prewarm as dsp.filtering._filter_run), and a gap must reset
state and re-prewarm from the post-gap samples."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest

from pennsieve_streaming_spark.dsp import FilterSpec, butter_sos
from pennsieve_streaming_spark.dsp.butterworth import filter_transient_length
from pennsieve_streaming_spark.dsp.filtering import _filter_run
from pennsieve_streaming_spark.streaming.stateful_filter import (
    stateful_filter_stream,
)

FS = 250.0
SPEC = FilterSpec("lowpass", 4, 30.0)


def _run_stream(spark, batch_dirs):
    """Drive a file-source stream one directory at a time."""
    src = tempfile.mkdtemp(prefix="sfilt_src_")
    out_rows = []
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    filtered = stateful_filter_stream(stream, SPEC, FS)
    q = (
        filtered.writeStream.format("memory")
        .queryName("sfilt_out")
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
        return spark.sql("SELECT * FROM sfilt_out ORDER BY channel, ts").collect()
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


@pytest.mark.parametrize("gap", [False, True])
def test_two_batches_vs_oneshot(spark, gap):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    # batch 2 either continues seamlessly or jumps far ahead (reset)
    offset = 200 * period + (10**9 if gap else 0)
    rows1 = [("c", i * period, float(x[i])) for i in range(200)]
    rows2 = [("c", offset + (i - 200) * period, float(x[i])) for i in range(200, 400)]

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows1, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d1)
        spark.createDataFrame(rows2, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d2)
        got = [r["value"] for r in _run_stream(spark, [d1, d2])]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)

    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    assert pad <= 200  # prewarm draws only on first-batch samples
    if gap:
        # reset: each half prewarmed + filtered independently, exactly
        # like the batch path splits contiguous runs
        want = np.concatenate(
            [_filter_run(x[:200], sos, pad), _filter_run(x[200:], sos, pad)]
        )
    else:
        # seamless: identical to one-shot batch filtering of the whole
        # run (prewarm uses the first pad samples, all in batch 1)
        want = _filter_run(x, sos, pad)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sub_pad_first_batch_matches_batch_path(spark):
    """ADVICE r2: the first micro-batch holding FEWER than pad samples
    must not seed a short-run prewarm — the run buffers in state until
    pad samples arrive, so streamed output is bit-identical to one-shot
    batch filtering regardless of micro-batch boundaries."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    split = pad // 2  # strictly below pad
    rows1 = [("c", i * period, float(x[i])) for i in range(split)]
    rows2 = [("c", i * period, float(x[i])) for i in range(split, 400)]

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows1, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d1)
        spark.createDataFrame(rows2, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d2)
        got = [r["value"] for r in _run_stream(spark, [d1, d2])]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)

    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    want = _filter_run(x, sos, pad)
    assert len(got) == 400
    np.testing.assert_allclose(got, want, atol=1e-12)
