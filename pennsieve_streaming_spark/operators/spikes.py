"""Spike-waveform extraction and equal-cut resampling (G4, A3).

The reference groups the spike-waveform blob into fixed-length
waveforms (``spikeDataPointCount`` doubles each) and min/max-resamples
each waveform to ``spikeDuration / pixelWidth`` points using ``cut`` —
splitting a vector of length m into n nearly-equal slices with
boundaries at ``round(i*m/n)`` (query/TimeSeriesQueryUtils.scala:208-235,
query/WsClient.scala:85-97).

``cut`` has a closed form: index j of an m-vector falls in slice
``floor(((2j+1)*n - 1) / (2m))`` — which lets the whole operator stay
in JVM-side SQL (posexplode + groupBy) instead of a pandas UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.datamodel import SEND_SPIKE_THRESHOLD


def should_send_spikes(
    pixel_width_us: int, spike_duration_us: int, threshold: int = SEND_SPIKE_THRESHOLD
) -> bool:
    """Waveforms are only sent when zoomed in enough:
    ``pixelWidth * 10 < spikeDuration``
    (query/TimeSeriesUnitQueryRawHttp.scala:51,77-79)."""
    return pixel_width_us * threshold < spike_duration_us


def spike_data_point_count(spike_duration_us: int, rate_hz: float) -> int:
    """ceil(spikeDuration * rate / 1e6) points per waveform
    (server/TSJsonSupport.scala:186-187)."""
    return int(math.ceil(spike_duration_us * rate_hz / 1e6))


def cut_bucket_expr(pos: Column, m: Column, n: Column) -> Column:
    """Closed form of the reference ``cut`` slice assignment: element
    ``pos`` (0-based) of an ``m``-vector belongs to slice
    ``floor(((2*pos+1)*n - 1) / (2*m))`` — identical to boundaries at
    ``round(i*m/n)`` (Scala Math.round = floor(x+0.5)),
    query/TimeSeriesQueryUtils.scala:208-224."""
    return F.floor(((pos * 2 + 1) * n - 1) / (m * 2)).cast("long")


def resample_positions_minmax(
    positioned: DataFrame,
    n_chunks: int,
    key_cols: tuple[str, ...] = ("channel", "spike_ts"),
) -> DataFrame:
    """A3 on pre-positioned rows: input (keys..., pos, m, v) where pos
    is the 0-based element index and m the vector length. Lets callers
    that already have long-form data skip array construction entirely.
    """
    bucket = cut_bucket_expr(F.col("pos"), F.col("m"), F.lit(n_chunks))
    return (
        positioned.withColumn("bucket", bucket)
        .groupBy(*key_cols, "bucket")
        .agg(F.min("v").alias("min_val"), F.max("v").alias("max_val"))
    )


def resample_arrays_minmax(
    arrays: DataFrame,
    n_chunks: int,
    array_col: str = "waveform",
    key_cols: tuple[str, ...] = ("channel", "spike_ts"),
) -> DataFrame:
    """A3/G4 — equal-cut min/max resample of each array row.

    Output: one row per (keys, bucket) with (min_val, max_val); empty
    slices (possible when n > m) produce no row, matching the
    reference's ``collect { case x if x.length > 0 }``
    (query/TimeSeriesQueryUtils.scala:231-234).
    """
    exploded = arrays.select(
        *key_cols,
        F.size(F.col(array_col)).alias("m"),
        F.posexplode(F.col(array_col)).alias("pos", "v"),
    )
    return resample_positions_minmax(exploded, n_chunks, key_cols)


def waveforms_from_positions(
    positions: DataFrame,
    catalog: DataFrame,
    events_indexed: DataFrame,
    points_per_spike: int,
) -> DataFrame:
    """G4 waveform pairing (query/WsClient.scala:85-97): the tsblob
    stream of doubles groups into fixed-length waveforms of
    ``spikeDataPointCount`` points, and waveform k belongs to the k-th
    spike timestamp of the channel's tsindex stream.

    - ``positions``: (location, pos, value) from
      ``sources.decode_binary_positions`` over tsblob files.
    - ``catalog``: (location, channel) — the unit_ranges tsblob role.
    - ``events_indexed``: (channel, ts, idx) — indexed spike times
      (``events.index_events``).

    Output: (channel, spike_ts, pos, m, v) — long form ready for
    ``resample_positions_minmax`` (A3) or array collection.
    """
    grouped = positions.join(F.broadcast(catalog), "location").select(
        "channel",
        F.floor(F.col("pos") / F.lit(points_per_spike)).cast("long").alias("idx"),
        (F.col("pos") % F.lit(points_per_spike)).alias("point"),
        F.col("value").alias("v"),
    )
    return grouped.join(events_indexed, ["channel", "idx"]).select(
        "channel",
        F.col("ts").alias("spike_ts"),
        F.col("point").alias("pos"),
        F.lit(points_per_spike).cast("long").alias("m"),
        "v",
    )
