"""Streaming montage: the stream-stream ts equi-join must reproduce
the batch montage over everything ingested, wherever micro-batch
boundaries fall — including partners split across batches."""

from __future__ import annotations

import os
import shutil
import tempfile

from pennsieve_streaming_spark.operators.montage import montage_two_channels
from pennsieve_streaming_spark.streaming.montage import montage_stream


def _run_stream(spark, batch_dirs, name):
    src = tempfile.mkdtemp(prefix="smont_src_")
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = montage_stream(stream, "Fp1", "Cz", watermark="1 hour")
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
        return spark.sql(f"SELECT * FROM {name} ORDER BY ts").collect()
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


def _write_batches(spark, rows_per_batch):
    dirs = []
    for rows in rows_per_batch:
        d = tempfile.mkdtemp(prefix="smont_batch_")
        spark.createDataFrame(
            rows, "channel string, ts long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        dirs.append(d)
    return dirs


def test_stream_montage_equals_batch(spark):
    period = 1_000_000
    # realistic epoch (2020-09-13): ts exactly 0 µs would hit Spark's
    # initial-watermark late filter (documented edge in the module)
    base = 1_600_000_000_000_000
    rows = []
    for i in range(60):
        rows.append(("Fp1", base + i * period, float(i)))
        rows.append(("Cz", base + i * period, 2.0 * i))
        if i % 7 == 0:
            rows.append(("C3", base + i * period, 9.9))  # bystander channel
    # split so some ts pairs straddle the batch boundary: batch 1 has
    # Fp1 up to i<40 but Cz only to i<25
    b1 = [r for r in rows if (r[0] == "Fp1" and r[1] < base + 40 * period)
          or (r[0] == "Cz" and r[1] < base + 25 * period) or r[0] == "C3"]
    b2 = [r for r in rows if r not in b1]
    dirs = _write_batches(spark, [b1, b2])
    try:
        streamed = _run_stream(spark, dirs, "smont_eq")
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    batch = montage_two_channels(
        spark.createDataFrame(rows, "channel string, ts long, value double"),
        "Fp1",
        "Cz",
    ).collect()
    got = sorted((r["channel"], r["ts"], r["value"]) for r in streamed)
    expected = sorted((r["channel"], r["ts"], r["value"]) for r in batch)
    assert got == expected
    assert len(got) == 60
    assert all(ch == "Fp1<->Cz" for ch, _, _ in got)
    # montage arithmetic: lead - secondary = i - 2i = -i
    assert all(v == -((ts - base) // period) for _, ts, v in got)
