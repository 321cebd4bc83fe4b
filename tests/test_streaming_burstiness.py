"""Streaming gap extraction: the drained gap table equals the batch
per-(user, type) lag bit-exactly, with the last-ts state carried
across micro-batch boundaries (pairs deliberately straddle files)."""

from __future__ import annotations

import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _batch_gaps(df):
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    return (
        df.select(
            "event_type",
            F.expr("(ts - lag(ts) over (partition by user_id, event_type "
                   "order by ts, event_id)) div 1000000").alias("gs"),
        )
        .filter(F.col("gs").isNotNull())
    )


def test_stream_gaps_drain_equals_batch_across_boundaries(spark):
    from pennsieve_streaming_spark.streaming.burstiness import gaps_stream

    rng = random.Random(43)
    rows = []
    eid = 0
    for u in range(6):
        t = 0
        for _ in range(40):
            t += rng.randrange(1, 5_000_000)
            rows.append((u, "click" if u % 2 else "view", t, eid))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long"
    )
    batch = sorted(
        (r.event_type, r.gs) for r in _batch_gaps(df).collect()
    )
    assert len(batch) == 6 * 39

    base = tempfile.mkdtemp(prefix="pss_burst_stream_test_")
    # range-partition by ts so per-user runs straddle file boundaries
    df.repartitionByRange(4, "ts").write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts long, event_id long"
    ).parquet(f"{base}/src")
    q = (
        gaps_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = sorted(
        (r.event_type, r.gs)
        for r in spark.read.parquet(f"{base}/out").collect()
    )
    assert drained == batch
