"""Streaming windowed min/max downsample (A1, streaming flavor).

The batch operator ``operators.downsample.downsample_minmax_time``
buckets samples into fixed time windows and keeps min/max per bucket
(reference resample semantics, query/TimeSeriesQueryUtils.scala). For
a live ingest feed the same aggregation runs as the canonical
Structured Streaming shape: event-time window + watermark + windowed
min/max/count in APPEND mode — Spark's native stateful aggregation,
no custom state code at all.

Emission semantics (what makes this oracle-replayable): with a
watermark delay of 0, a window finalizes once the global maximum
event time seen reaches PAST its end; on an ``availableNow`` drain the
final watermark is the stream's overall max event time, so the emitted
rows are exactly the batch downsample restricted to windows with
``win_end <= max_ts`` — the one still-open window per the global tail
(plus any window the max falls exactly on the boundary of) stays in
state. That restriction is plain SQL, which is how the driver oracle
replays this operator. Under the ingest contract (event-time-ordered
arrival across batches, the same contract the stateful filter and
sessionizer hold), batch-boundary placement cannot change the emitted
set, only when each row appears; out-of-order arrival is late data,
dropped by the watermark by design.

At 100 TB this is the right shape: state is one (min, max, count)
triple per (channel, window); the shuffle carries partially-aggregated
window rows (map-side combine applies); watermark eviction bounds the
state store to the windows still within the delay horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_minmax_downsample(
    samples_stream: DataFrame,
    bucket_us: int,
    watermark: str = "0 microseconds",
) -> DataFrame:
    """Windowed min/max/count over a streaming (channel, ts µs, value)
    feed; epoch-aligned windows of ``bucket_us``. Output (append mode):
    (channel, win_start µs, min_val, max_val, n).
    """
    b = int(bucket_us)
    win = F.window(F.col("tsw"), f"{b} microseconds")
    return (
        samples_stream.withColumn("tsw", F.timestamp_micros(F.col("ts")))
        .withWatermark("tsw", watermark)
        .groupBy("channel", win.alias("win"))
        .agg(
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            "channel",
            F.unix_micros(F.col("win.start")).alias("win_start"),
            "min_val",
            "max_val",
            "n",
        )
    )
