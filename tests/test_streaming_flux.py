"""stream==batch equivalence for the spectral-flux onset front-end."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest

from pyspark.sql import functions as F

WS, RATE, FREQS = 50, 1000.0, (100.0, 200.0)


def _rows():
    rng = np.random.default_rng(5)
    rows = []
    amp = lambda w: [0.0, 1.0, 1.0, 4.0, 4.0, 0.5, 6.0, 6.0][w % 8]
    for t in range(50 * 16):
        w = t // 50
        v = amp(w) * float(np.sin(2 * np.pi * 100.0 * t / RATE)) + \
            0.01 * float(rng.normal())
        rows.append(("a", t, v))
    return rows


def _drain(spark, rows, n_files):
    base = tempfile.mkdtemp(prefix="pss_stream_flux_")
    src = f"{base}/src"
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    # write the ts-range chunks SEQUENTIALLY: FileStreamSource orders
    # files by modification time, and a single write job gives all
    # parts near-identical mtimes (arbitrary tie-break = out-of-order
    # arrival, violating the in-order contract)
    import time

    n = df.count()
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        chunk = df.filter(
            (F.col("ts") >= i * step) & (F.col("ts") < (i + 1) * step)
        )
        chunk.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.2)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from pennsieve_streaming_spark.streaming.flux import flux_stream

    q = (
        flux_stream(stream, FREQS, RATE, WS)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_flux_equals_batch(spark, n_files):
    """Drained streaming flux is bit-identical to the batch operator's
    flux column across micro-batch splits (frames straddle batches at
    n_files=4)."""
    from pennsieve_streaming_spark.dsp.spectral import (
        spectral_flux_onsets,
    )

    rows = _rows()
    got = {
        (r.channel, r.win): r.flux_q
        for r in _drain(spark, rows, n_files).collect()
    }
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    want = {
        (r.channel, r.win): r.flux_q
        for r in spectral_flux_onsets(df, FREQS, RATE, WS).collect()
    }
    assert got == want
