"""Range-index catalog operations (S1/S2/J3).

The reference resolves every query through a Postgres range index:
``SELECT ... FROM timeseries.ranges WHERE channel = ? AND
range && int8range(qstart, qend) ORDER BY lo ASC``
(server/WebServerPorts.scala:57-61). In the Spark-native layout,
Parquet partition pruning and row-group min/max stats play that role —
but the catalog-shaped operators remain for parity, for the `/segments`
endpoint, and for driving the legacy binary readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_lookup(
    ranges: DataFrame,
    channel: str | None,
    start_us: int,
    end_us: int,
) -> DataFrame:
    """S1: channel equality + interval-overlap filter, ordered by lo —
    the int8range ``&&`` operator as a plain predicate. Returns the
    matching catalog rows (one per stored segment/file)."""
    df = ranges.filter((F.col("lo") <= end_us) & (F.col("hi") >= start_us))
    if channel is not None:
        df = df.filter(F.col("channel") == channel)
    return df.orderBy("lo")


def _numbered_spans(spans: DataFrame) -> DataFrame:
    """Shared catalog numbering: deterministic per-channel sequence ids
    over (span_lo, span_hi) order, plus the `channel_id` storage-key
    stem both catalogs derive their locations from. Keeping this in
    one place keeps ranges and unit_ranges ids in correspondence."""
    from pyspark.sql import Window

    w = Window.partitionBy("channel").orderBy("span_lo", "span_hi")
    return spans.withColumn(
        "id", (F.row_number().over(w) - F.lit(1)).cast("long")
    ).withColumn(
        "_key", F.concat(F.col("channel"), F.lit("_"), F.col("id").cast("string"))
    )


def spans_to_unit_ranges(spans: DataFrame) -> DataFrame:
    """S2: build a ``timeseries.unit_ranges``-shaped catalog from
    contiguous event spans. Reference row shape
    ``UnitRangeEntry(id, min, max, channel, count, tsindex, tsblob)``
    (server/UnitQueryService.scala:70-78; H2 DDL
    src/test/scala/com/pennsieve/streaming/TestDependencies.scala:49-57):
    ``tsindex``/``tsblob`` are the S3 keys of the spike-time index and
    waveform blob files for the span."""
    return _numbered_spans(spans).select(
        "id",
        "channel",
        F.col("n_segments").alias("count"),
        F.col("span_lo").alias("lo"),
        F.col("span_hi").alias("hi"),
        F.concat(F.col("_key"), F.lit(".tsindex")).alias("tsindex"),
        F.concat(F.col("_key"), F.lit(".tsblob")).alias("tsblob"),
    )


def spans_to_ranges(spans: DataFrame, rate_hz: float) -> DataFrame:
    """Build a ranges catalog from contiguous spans (channel, span_lo,
    span_hi): deterministic ids via per-channel sequence numbers."""
    return _numbered_spans(spans).select(
        "id",
        "channel",
        F.lit(rate_hz).alias("rate"),
        F.col("span_lo").alias("lo"),
        F.col("span_hi").alias("hi"),
        F.col("_key").alias("location"),
    )
