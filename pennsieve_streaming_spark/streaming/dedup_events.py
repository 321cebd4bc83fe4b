"""Streaming idempotent ingest: exactly-once event admission by key.

Upstream feeds redeliver (at-least-once buses, retried batches);
``stream_distinct_events`` admits each ``event_id`` exactly once using
Spark's streaming ``dropDuplicates`` state. The emitted set over an
``availableNow`` drain equals batch ``SELECT DISTINCT event_id`` —
the set of admitted keys is replay- and batch-boundary-independent,
which is what lets a batch oracle gate the streaming operator. (Only
the KEY column is emitted: which duplicate's payload is "first seen"
IS batch-boundary dependent, so payload pass-through is deliberately
out of the deterministic contract.)

State: one row per distinct key — unbounded over an infinite stream.
Production bounds it with ``withWatermark("ts", ...)`` +
``dropDuplicatesWithinWatermark`` (same plan shape; keys older than
the watermark age out), trading unbounded memory for the standard
"duplicates arrive within the watermark" assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_distinct_events(events_stream: DataFrame) -> DataFrame:
    """Admit each event_id once (append mode, one state row per key)."""
    return events_stream.select("event_id").dropDuplicates(["event_id"])


def drain_distinct_events(
    spark: SparkSession,
    events_stream: DataFrame,
    checkpoint: str,
    query_name: str = "distinct_events",
) -> DataFrame:
    """availableNow drain → the admitted event_id set (== batch
    DISTINCT)."""
    distinct = stream_distinct_events(events_stream)
    q = (
        distinct.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
