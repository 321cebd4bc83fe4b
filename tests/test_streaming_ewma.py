"""Streaming EWMA == batch EWMA wherever the micro-batch boundaries
fall (ordered-arrival contract)."""

from __future__ import annotations

import os
import tempfile

import numpy as np

from pennsieve_streaming_spark.dsp.filtering import ewma_filter
from pennsieve_streaming_spark.streaming.ewma import ewma_stream

ALPHA = 0.125


def _drive(spark, rows, n_files, max_files=1):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tempfile.mkdtemp(prefix="pss_sewma_")
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
        ewma_stream(stream, ALPHA)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.channel, r.ts, r.value, r.ewma)
        for r in spark.read.parquet(f"{base}/out").collect()
    )


def _rows():
    rng = np.random.default_rng(6)
    rows = []
    for ch in ("a", "b"):
        for t, v in enumerate(rng.uniform(-2, 2, 300)):
            rows.append((ch, t * 1000, float(v)))
    return rows


def test_stream_equals_batch_single_batch(spark):
    rows = _rows()
    batch = sorted(
        map(
            tuple,
            ewma_filter(
                spark.createDataFrame(
                    rows, "channel string, ts long, value double"
                ),
                ALPHA,
            ).collect(),
        )
    )
    assert _drive(spark, rows, n_files=1) == batch


def test_stream_equals_batch_across_boundaries(spark):
    rows = _rows()
    batch = sorted(
        map(
            tuple,
            ewma_filter(
                spark.createDataFrame(
                    rows, "channel string, ts long, value double"
                ),
                ALPHA,
            ).collect(),
        )
    )
    # 7 ordered slices, one file per trigger -> 7 micro-batches; the
    # carried one-double state must reproduce the batch recurrence
    # bit-exactly
    assert _drive(spark, rows, n_files=7) == batch
