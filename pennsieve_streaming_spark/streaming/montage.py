"""Streaming montage (J1/F2, streaming flavor): re-reference a LIVE
ingest feed.

The batch operator subtracts two aligned channel streams with a ts
equi-join (``operators.montage.montage_two_channels``,
reference server/Montage.scala zip semantics). On a live feed the
same join runs as a Structured Streaming stream-stream inner join:
each side is the ingest stream filtered to one electrode, both carry
an event-time watermark so the join state evicts rows older than the
allowed skew, and the equality key includes the event-time-derived
``ts`` so Spark can bound state with the watermark.

Emission semantics: a montaged sample appears once BOTH electrodes'
samples for that ts have arrived (inner join) — exactly the batch
result over everything ingested, wherever micro-batch boundaries
fall, as long as matching samples arrive within the watermark skew of
each other. A sample whose partner never arrives emits nothing (the
batch join drops it too); one that arrives beyond the skew may be
dropped from evicted state — choose the watermark from the ingest
path's real jitter (the reference's alignment contract says paired
electrodes ship together, so skew is bounded by one segment).

At scale: join state is per-ts rows of TWO filtered channels only
(the channel filters push to the scan); the stream-stream join
shuffles both sides by the join key — the same exchange the batch
join does, bounded by watermark-evicted state instead of history.

Edge: Spark's event-time watermark initializes to epoch 0, and its
late-row filter drops rows at-or-before the watermark — so a sample
whose ts is EXACTLY 0 µs never joins. No real recording starts at
the 1970 epoch boundary; the tests pin the behavior with realistic
timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.operators.montage import montage_name


def montage_stream(
    samples_stream: DataFrame,
    lead: str,
    secondary: str,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Montage a streaming (channel, ts, value) frame — ts is µs-epoch
    LONG, as everywhere in the engine.

    Output: (channel='lead<->secondary', ts, value=lead - secondary).
    """
    def side(ch: str, alias: str) -> DataFrame:
        return (
            samples_stream.filter(F.col("channel") == ch)
            .select(
                F.col("ts").alias(f"{alias}_ts"),
                F.timestamp_micros(F.col("ts")).alias(f"{alias}_et"),
                F.col("value").alias(f"{alias}_v"),
            )
            .withWatermark(f"{alias}_et", watermark)
        )

    l = side(lead, "l")
    s = side(secondary, "s")
    joined = l.join(
        s,
        (F.col("l_ts") == F.col("s_ts")) & (F.col("l_et") == F.col("s_et")),
        "inner",
    )
    return joined.select(
        F.lit(montage_name(lead, secondary)).alias("channel"),
        F.col("l_ts").alias("ts"),
        (F.col("l_v") - F.col("s_v")).alias("value"),
    )
