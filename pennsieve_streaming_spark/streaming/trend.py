"""Streaming trend segments: the fixed-window OLS moment aggregation
(operators/stats.trend_segments) run as a LIVE complete-mode
aggregation.

Same justification as the streaming quality/CMS monitors: the five
per-(channel, window) moments (n, Sx, Sy, Sxy, Sxx) are associative
integer sums, so state is |channels|×|active windows| rows by
construction, any availableNow drain equals the batch aggregation
over the same data, and the batch SQL oracle gates the streaming
operator. The closed-form slope/direction finish is applied AFTER the
drain via the SHARED ``finish_trend_segments`` (identical expressions
over identical exact integers ⇒ bit-identical output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_trend_moments(
    samples_stream: DataFrame, win_us: int, x_unit_us: int, quant: int = 100
) -> DataFrame:
    """Live per-(channel, window) OLS moments (single streaming agg,
    bounded state) — the SHARED operators/stats.trend_moments builder
    applied to the streaming frame, so the batch and streaming moment
    expressions are one definition by construction."""
    from pennsieve_streaming_spark.operators.stats import trend_moments

    return trend_moments(samples_stream, win_us, x_unit_us, quant)


def drain_trend_segments(
    spark: SparkSession,
    samples_stream: DataFrame,
    win_us: int,
    x_unit_us: int,
    checkpoint: str,
    quant: int = 100,
    min_n: int = 2,
    query_name: str = "trend_segments",
) -> DataFrame:
    """availableNow drain of the live moments → the finished trend
    table (== batch trend_segments over the same data)."""
    from pennsieve_streaming_spark.operators.stats import (
        finish_trend_segments,
    )

    mom = stream_trend_moments(samples_stream, win_us, x_unit_us, quant)
    q = (
        mom.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return finish_trend_segments(
        spark.table(query_name), quant=quant, min_n=min_n
    )
