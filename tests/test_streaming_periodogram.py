"""Streaming periodogram: complete-mode drain == batch operator
bit-exactly (associative sums + shared finish + batch-median
calibration centers)."""

from __future__ import annotations

import math
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY = 86_400_000_000


def _mk_rows():
    rng = random.Random(17)
    rows = []
    for ch in ("a", "b"):
        t = 0
        for _ in range(300):
            t += rng.randrange(1_000_000_000, 8_000_000_000)
            v = 50.0 * math.sin(2 * math.pi * (t % DAY) / DAY) + (
                10.0 if ch == "a" else -4.0
            )
            rows.append((ch, t, v))
    return rows


def test_stream_periodogram_drain_equals_batch(spark):
    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram
    from pennsieve_streaming_spark.streaming.periodogram import (
        batch_centers,
        drain_periodogram,
    )

    periods = (DAY // 4, DAY)
    df = spark.createDataFrame(
        _mk_rows(), "channel string, ts long, value double"
    )
    batch = {
        (r.channel, r.period_us): r
        for r in uneven_periodogram(df, periods, 256, 100).collect()
    }

    base = tempfile.mkdtemp(prefix="pss_pgm_test_")
    # three files -> three potential micro-batches
    df.repartition(3).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    drained = {
        (r.channel, r.period_us): r
        for r in drain_periodogram(
            spark, stream, batch_centers(df, 100), periods,
            f"{base}/ckpt", 256, 100, query_name="pgm_test",
        ).collect()
    }

    assert set(drained) == set(batch)
    for key, b in batch.items():
        d = drained[key]
        assert (d.n, d.sc, d.ss) == (b.n, b.sc, b.ss), key
        assert d.power == b.power, key
    # the planted daily line dominates on both channels
    for ch in ("a", "b"):
        assert batch[(ch, DAY)].power > 20 * batch[(ch, DAY // 4)].power
