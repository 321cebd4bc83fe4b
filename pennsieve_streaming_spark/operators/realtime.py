"""Realtime ingest resampling (A4/S9/T9).

The reference resamples each incoming protobuf ``IngestSegment`` on
arrival when its sample period is finer than the realtime pixel
duration (query/TimeSeriesQueryUtils.scala:243-285):

  end        = start + period * n          (toLong truncation)
  chunkCount = round((end - start) / pixelDuration)
  minmax     = cut(data, chunkCount)       (equal-cut slices, A3)
  newPeriod  = (end - start) / chunkCount

Expressed here as a stateless DataFrame transform over rows of
``(channel, start_ts, sample_period, data ARRAY<DOUBLE>)`` — usable
identically on a static DataFrame or inside a Structured Streaming
micro-batch (streaming/ingest.py wires it to readStream/foreachBatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.operators.spikes import cut_bucket_expr


def resample_ingest_segments(
    segments: DataFrame, realtime_pixel_duration_us: int
) -> DataFrame:
    """Per-segment min/max resample, exploded to one row per chunk.

    Segments with ``sample_period >= pixelDuration`` pass through as
    single-sample chunks flagged ``is_min_max = false`` (reference
    passthrough branch); finer segments emit
    ``chunk_count = round(span/pixelDuration)`` (min,max) chunks.

    Output: (channel, start_ts, bucket, min_val, max_val, is_min_max,
    out_period).
    """
    seg = segments.select(
        "channel",
        "start_ts",
        "sample_period",
        F.size("data").alias("m"),
        F.posexplode("data").alias("pos", "v"),
    )
    return resample_ingest_positions(seg, realtime_pixel_duration_us)


def resample_ingest_positions(
    positioned: DataFrame, realtime_pixel_duration_us: int
) -> DataFrame:
    """A4 on long-form rows (channel, start_ts, sample_period, pos, m,
    v) — same semantics as resample_ingest_segments without requiring
    array-typed input."""
    seg = positioned.withColumn(
        "end_ts",
        F.col("start_ts")
        + (F.col("sample_period") * F.col("m")).cast("long"),
    )
    span = F.col("end_ts") - F.col("start_ts")
    resample = F.col("sample_period") < F.lit(realtime_pixel_duration_us)
    # calculateChunks (TimeSeriesQueryUtils.scala:237-238) divides two
    # Longs BEFORE Math.round — round(Float) is identity on the
    # truncated quotient, so the semantics are floor(span/pixel), not
    # round. chunkCount == 0 (span < pixel) means cut(data, 0) → the
    # reference emits an EMPTY resample, so those segments are dropped.
    chunk_count = F.floor(span / F.lit(realtime_pixel_duration_us)).cast("long")
    seg = seg.withColumn("_cc", chunk_count).filter(
        ~(resample & (F.col("_cc") == F.lit(0)))
    )
    chunk_count = F.col("_cc")
    seg = seg.withColumn(
        "bucket",
        F.when(resample, cut_bucket_expr(F.col("pos"), F.col("m"), chunk_count))
        .otherwise(F.col("pos").cast("long")),
    ).withColumn(
        "out_period",
        F.when(resample, span / chunk_count).otherwise(F.col("sample_period")),
    ).withColumn("is_min_max", resample)
    return seg.groupBy(
        "channel", "start_ts", "bucket", "is_min_max", "out_period"
    ).agg(F.min("v").alias("min_val"), F.max("v").alias("max_val"))
