"""Streaming LZ76 monitor: emitted windows == batch operator
bit-exactly, with the partial-window state carried across micro-batch
boundaries (windows deliberately straddle files)."""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_stream_lz_drain_equals_batch_across_boundaries(spark):
    from pennsieve_streaming_spark.operators.stats import lz_complexity
    from pennsieve_streaming_spark.streaming.lz import lz_stream

    rng = random.Random(41)
    rows = []
    # 300 samples per channel with ws=64 -> 4 complete windows + a
    # 44-sample tail that must stay in state, never emitted
    for ch in ("a", "b"):
        for t in range(300):
            rows.append((ch, t, float(rng.randrange(-50, 51))))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    batch = {
        (r.channel, r.win): (r.n, r.ones, r.c_phrases, r.lz_norm)
        for r in lz_complexity(df, 64, 100).collect()
    }
    assert len(batch) == 8

    base = tempfile.mkdtemp(prefix="pss_lz_stream_test_")
    # range-partition by ts so window 2 straddles the file boundary
    df.repartitionByRange(3, "ts").write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    q = (
        lz_stream(stream, 64, 100)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = {
        (r.channel, r.win): (r.n, r.ones, r.c_phrases, r.lz_norm)
        for r in spark.read.parquet(f"{base}/out").collect()
    }
    assert drained == batch
