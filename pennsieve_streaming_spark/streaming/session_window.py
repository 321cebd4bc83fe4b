"""Streaming session-window aggregation via Spark's NATIVE
``session_window`` (A6's semantics on the engine's built-in stateful
operator, complementing the custom applyInPandasWithState sessionizer
in streaming/sessionize.py — two independent implementations of the
same semantics, cross-checked by tests).

Session rule parity: ``session_window(ts, gap)`` merges an event into
the open session while ``ts < last_ts + gap`` and starts a new one at
``ts >= last_ts + gap`` — exactly the reference merge rule
(``lo - prev_hi >= threshold`` starts a span,
query/TimeSeriesQueryUtils.scala:316-321) with the session end
reported as ``last_ts + gap``.

Emission (append mode, 0-delay watermark, availableNow drain): a
session emits once the watermark (= max event time seen, floored to
Spark's ms watermark precision) reaches its end, so the emitted rows
are the batch sessionization restricted to
``last_ts + gap <= watermark`` — plain SQL for the driver oracle.
Same in-order-arrival contract as streaming/downsample.py.

At 100 TB: state is one (start, end, aggregates) tuple per open
session per channel; the shuffle carries session rows keyed by
channel; watermark eviction bounds the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_session_agg(
    events_stream: DataFrame,
    gap_us: int,
    watermark: str = "0 microseconds",
) -> DataFrame:
    """Sessionize a streaming (channel, ts µs, value) feed with the
    native session_window. Output (append mode): (channel, session_lo,
    session_end µs — exclusive, = last_ts + gap, n, min_val, max_val).
    """
    g = int(gap_us)
    return (
        events_stream.withColumn("tsw", F.timestamp_micros(F.col("ts")))
        .withWatermark("tsw", watermark)
        .groupBy(
            "channel",
            F.session_window(F.col("tsw"), f"{g} microseconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
        )
        .select(
            "channel",
            F.unix_micros(F.col("sw.start")).alias("session_lo"),
            F.unix_micros(F.col("sw.end")).alias("session_end"),
            "n",
            "min_val",
            "max_val",
        )
    )
