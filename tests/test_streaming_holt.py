"""Streaming Holt == batch Holt wherever the micro-batch boundaries
fall (ordered-arrival contract); state is the (level, trend) pair."""

from __future__ import annotations

import os
import tempfile

import numpy as np

from pennsieve_streaming_spark.dsp.filtering import holt_filter
from pennsieve_streaming_spark.streaming.holt import holt_stream

ALPHA = 0.25
BETA = 0.125


def _drive(spark, rows, n_files, max_files=1):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tempfile.mkdtemp(prefix="pss_sholt_")
    os.makedirs(f"{base}/src")
    ordered = sorted(rows, key=lambda r: r[1])
    per = (len(ordered) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = ordered[i * per : (i + 1) * per]
        if not chunk:
            continue
        pdf = pd.DataFrame(chunk, columns=["channel", "ts", "value"])
        p = f"{base}/src/slice_{i:03d}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", max_files)
        .parquet(f"{base}/src")
    )
    q = (
        holt_stream(stream, ALPHA, BETA)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.channel, r.ts, r.value, r.level, r.trend, r.forecast)
        for r in spark.read.parquet(f"{base}/out").collect()
    )


def _rows():
    rng = np.random.default_rng(9)
    rows = []
    for ch in ("a", "b"):
        for t, v in enumerate(rng.uniform(-2, 2, 300)):
            rows.append((ch, t * 1000, float(v)))
    return rows


def _batch(spark, rows):
    return sorted(
        map(
            tuple,
            holt_filter(
                spark.createDataFrame(
                    rows, "channel string, ts long, value double"
                ),
                ALPHA,
                BETA,
            ).collect(),
        )
    )


def test_stream_equals_batch_single_batch(spark):
    rows = _rows()
    assert _drive(spark, rows, n_files=1) == _batch(spark, rows)


def test_stream_equals_batch_across_boundaries(spark):
    rows = _rows()
    # 7 ordered slices, one file per trigger -> 7 micro-batches; the
    # carried (level, trend) state must reproduce the batch recurrence
    # bit-exactly, including the trend's dependence on the PREVIOUS
    # level across a batch boundary
    assert _drive(spark, rows, n_files=7) == _batch(spark, rows)
