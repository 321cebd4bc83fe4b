"""Streaming data-quality monitor: the ingest validation screen as a
LIVE aggregation.

Same complete-mode justification as the streaming CMS: the aggregation
state is |channels| rows BY CONSTRUCTION (counts, min/max extremes —
all associative), so state and per-trigger emission are constant
regardless of stream volume, and an ``availableNow`` drain equals the
batch profile over the same data — batch-boundary independent, so one
batch SQL oracle gates the streaming operator.

The batch :func:`operators.stats.quality_profile` additionally counts
duplicate timestamps; that needs a second aggregation level, which
structured streaming forbids (multiple streaming aggregations), so the
streaming monitor covers the single-pass subset (rows, NULLs, range
violations, extremes) and dup-ts detection stays a batch audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_quality_profile(
    samples_stream: DataFrame, lo: float, hi: float
) -> DataFrame:
    """Per-channel live quality counters (single streaming agg,
    |channels|-bounded state)."""
    return samples_stream.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.sum(F.when(F.col("value") < lo, 1).otherwise(0))
        .cast("long")
        .alias("n_below"),
        F.sum(F.when(F.col("value") > hi, 1).otherwise(0))
        .cast("long")
        .alias("n_above"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


def drain_quality_profile(
    spark: SparkSession,
    samples_stream: DataFrame,
    lo: float,
    hi: float,
    checkpoint: str,
    query_name: str = "quality_profile",
) -> DataFrame:
    """availableNow drain of the live monitor → the final per-channel
    profile table (== the batch single-pass profile)."""
    prof = stream_quality_profile(samples_stream, lo, hi)
    q = (
        prof.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
