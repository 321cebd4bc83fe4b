"""Query-result (Segment) assembly — the engine's wire shape (S7/S8).

The reference emits protobuf ``Segment`` messages
(query/BaseTimeSeriesQuery.scala:114-173: startTs, source, unit,
samplePeriod, requestedSamplePeriod, pageStart, pageEnd, isMinMax,
unitM, segmentType, nrPoints, data[], channelName). Spark-natively the
result of a query IS a DataFrame; this operator packages it into
Segment-shaped rows (one per channel) for a serving layer to serialize
(protobuf/JSON/Arrow — transport out of engine scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_segments_minmax(
    minmax: DataFrame,
    page_start: int,
    page_end: int,
    chunk_time_us: float,
    requested_period_us: int,
    unit: str = "V",
    unit_m: int = 1000,
    segment_type: str = "Continuous",
) -> DataFrame:
    """Package downsampled (channel, bucket, min_val, max_val) rows into
    one Segment row per channel with the interleaved [min,max,...]
    payload (BaseTimeSeriesQuery.scala:86-88 wire format).
    """
    return (
        minmax.groupBy("channel")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("bucket", "min_val", "max_val"))
                    ),
                    lambda s: F.array(s["min_val"], s["max_val"]),
                )
            ).alias("data"),
            F.min("bucket").alias("_b0"),
        )
        .select(
            F.col("channel").alias("channel_name"),
            F.col("channel").alias("source"),
            (F.lit(page_start) + F.col("_b0") * F.lit(int(chunk_time_us))).alias(
                "start_ts"
            ),
            F.lit(page_start).alias("page_start"),
            F.lit(page_end).alias("page_end"),
            F.lit(float(chunk_time_us)).alias("sample_period"),
            F.lit(float(requested_period_us)).alias("requested_sample_period"),
            F.lit(True).alias("is_min_max"),
            F.lit(unit).alias("unit"),
            F.lit(unit_m).alias("unit_m"),
            F.lit(segment_type).alias("segment_type"),
            (F.size("data") / 2).cast("long").alias("nr_points"),
            "data",
        )
    )


def build_segments_raw(
    samples: DataFrame,
    page_start: int,
    page_end: int,
    rate_hz: float,
    requested_period_us: int,
    unit: str = "V",
    unit_m: int = 1000,
    segment_type: str = "Continuous",
) -> DataFrame:
    """Package raw (channel, ts, value) rows into one Segment row per
    channel (the below-resample-threshold path)."""
    return (
        samples.groupBy("channel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "value"))),
                lambda s: s["value"],
            ).alias("data"),
            F.min("ts").alias("start_ts"),
        )
        .select(
            F.col("channel").alias("channel_name"),
            F.col("channel").alias("source"),
            "start_ts",
            F.lit(page_start).alias("page_start"),
            F.lit(page_end).alias("page_end"),
            F.lit(1e6 / rate_hz).alias("sample_period"),
            F.lit(float(requested_period_us)).alias("requested_sample_period"),
            F.lit(False).alias("is_min_max"),
            F.lit(unit).alias("unit"),
            F.lit(unit_m).alias("unit_m"),
            F.lit(segment_type).alias("segment_type"),
            F.size("data").cast("long").alias("nr_points"),
            "data",
        )
    )


def to_json_rows(segments: DataFrame) -> DataFrame:
    """S8 REST JSON sink shape: one JSON document per segment row."""
    return segments.select(F.to_json(F.struct(*segments.columns)).alias("json"))


def filter_channels_by_type(channels: DataFrame, expected: str) -> DataFrame:
    """P3 channel-type guard: route only matching channels to an
    executor path (reference channelTypeMatch,
    server/TimeSeriesFlow.scala:885-890)."""
    return channels.filter(F.col("type") == expected)
