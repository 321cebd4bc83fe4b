"""Streaming periodicity monitor: the uneven-timestamp Schuster
periodogram run as a LIVE complete-mode aggregation.

Same justification as the streaming trend/quality monitors: the
per-channel trig sums (dsp/spectral.periodogram_sums) are associative
BIGINT sums over (ts, xc) rows, so state is |channels| wide rows by
construction, any availableNow drain equals the batch aggregation
over the same data, and the batch SQL oracle gates the streaming
operator through the SHARED finish_periodogram.

Centering contract: the batch operator derives the per-channel median
from the batch itself; a live stream cannot (medians aren't
associative), so the stream takes an explicit CENTERS table
(channel, med_q) — in production a calibration pass, in the drain
parity test the batch medians over the same data, which makes
drain == batch bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_periodogram_sums(
    samples_stream: DataFrame,
    centers: DataFrame,
    periods_us: tuple,
    k: int = 256,
    quant: int = 100,
) -> DataFrame:
    """Live per-channel trig sums: quantize, subtract the broadcast
    calibration center, run the SHARED associative builder."""
    from pennsieve_streaming_spark.dsp.spectral import periodogram_sums

    q = int(quant)
    centered = (
        samples_stream.select(
            "channel",
            "ts",
            F.expr(f"CAST(round(value * {q}) AS BIGINT)").alias("xq"),
        )
        .join(F.broadcast(centers), "channel")
        .withColumn("xc", F.col("xq") - F.col("med_q"))
    )
    return periodogram_sums(centered, periods_us, k)


def drain_periodogram(
    spark: SparkSession,
    samples_stream: DataFrame,
    centers: DataFrame,
    periods_us: tuple,
    checkpoint: str,
    k: int = 256,
    quant: int = 100,
    query_name: str = "periodogram",
) -> DataFrame:
    """availableNow drain of the live sums → the finished periodogram
    table (== batch uneven_periodogram when ``centers`` are the batch
    medians over the same data)."""
    from pennsieve_streaming_spark.dsp.spectral import finish_periodogram

    sums = stream_periodogram_sums(
        samples_stream, centers, periods_us, k, quant
    )
    q = (
        sums.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return finish_periodogram(spark.table(query_name), periods_us, quant)


def batch_centers(samples: DataFrame, quant: int = 100) -> DataFrame:
    """The batch per-channel median-order-statistic centers table —
    the calibration input for the streaming monitor (identical to the
    centering inside the batch operator)."""
    from pyspark.sql import Window

    q = int(quant)
    ranked = samples.select(
        "channel",
        "ts",
        "value",
        F.expr(f"CAST(round(value * {q}) AS BIGINT)").alias("xq"),
    )
    aw = Window.partitionBy("channel").orderBy("xq", "ts", "value")
    cnt = ranked.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return (
        ranked.withColumn("_ar", F.row_number().over(aw).cast("long"))
        .join(F.broadcast(cnt), "channel")
        .filter(F.expr("_ar = (_n + 1) div 2"))
        .select("channel", F.col("xq").alias("med_q"))
    )
