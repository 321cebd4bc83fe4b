"""Streaming CUSUM == batch CUSUM wherever the micro-batch boundaries
fall (ordered-arrival contract); state is the post-reset (g+, g-)
pair — including the reset-to-zero carried ACROSS a batch boundary
when the alarm row is the last row of a micro-batch."""

from __future__ import annotations

import os
import tempfile

import numpy as np

from pennsieve_streaming_spark.dsp.filtering import cusum_monitor
from pennsieve_streaming_spark.streaming.cusum import cusum_stream

PARAMS = {"a": (0.0, 0.5, 4.0), "b": (10.0, 1.0, 6.0)}


def _drive(spark, rows, n_files, max_files=1):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = tempfile.mkdtemp(prefix="pss_scusum_")
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
        cusum_stream(stream, PARAMS)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(
        (r.channel, r.ts, r.value, r.gpos, r.gneg, r.alarm)
        for r in spark.read.parquet(f"{base}/out").collect()
    )


def _rows():
    # drifting mean on 'a' (upward ramps -> g+ alarms), level shifts on
    # 'b' below mu0 (g- alarms); both cross their h several times so
    # the reset path runs repeatedly
    rng = np.random.default_rng(17)
    rows = []
    for t in range(300):
        drift = 1.5 if (t // 50) % 2 else -0.2
        rows.append(("a", t * 1000, float(rng.uniform(-1, 1) + drift)))
        shift = 6.0 if (t // 40) % 3 == 1 else 10.0
        rows.append(("b", t * 1000, float(rng.uniform(-2, 2) + shift)))
    # an unconfigured channel must be dropped by both operators
    rows.append(("zz", 0, 1.0))
    return rows


def _batch(spark, rows):
    return sorted(
        map(
            tuple,
            cusum_monitor(
                spark.createDataFrame(
                    rows, "channel string, ts long, value double"
                ),
                PARAMS,
            ).collect(),
        )
    )


def test_batch_alarms_and_resets():
    # pure-python replay of the recurrence semantics on a tiny series:
    # mu0=0, k=0.5, h=4 -> four 2.0 samples alarm on the 3rd
    # (1.5, 3.0, 4.5>h) and the reset restarts g+ at 1.5
    import pandas as pd

    gp = 0.0
    stats = []
    for x in [2.0, 2.0, 2.0, 2.0]:
        raw = (gp + (x - 0.0)) - 0.5
        e = raw if raw > 0.0 else 0.0
        a = e > 4.0
        stats.append((e, a))
        gp = 0.0 if a else e
    assert stats == [(1.5, False), (3.0, False), (4.5, True), (1.5, False)]


def test_stream_equals_batch_single_batch(spark):
    rows = _rows()
    got = _drive(spark, rows, n_files=1)
    want = _batch(spark, rows)
    assert got == want
    assert not any(r[0] == "zz" for r in got)
    assert any(r[5] for r in got)  # alarms present -> resets exercised


def test_stream_equals_batch_across_boundaries(spark):
    rows = _rows()
    # 7 ordered slices, one file per trigger -> 7 micro-batches; the
    # carried post-reset (g+, g-) must reproduce the batch recurrence
    # bit-exactly, including a reset crossing a batch boundary
    assert _drive(spark, rows, n_files=7) == _batch(spark, rows)
