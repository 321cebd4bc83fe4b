"""Streaming per-channel amplitude histogram: the
operators/stats.value_histogram aggregation run as a LIVE
complete-mode streaming query.

The histogram is one conditional-count groupBy — associative by
construction — so state is |channels|×|bins| rows, any availableNow
drain equals the batch aggregation over the same data, and the batch
SQL oracle gates the streaming operator (the drift/trend monitor
family). The electrode-health dashboard reads the live counter table;
the PSI drift monitor (streaming/drift.py) is this histogram's
two-window sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_value_histogram(
    samples_stream: DataFrame, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """Live per-(channel, bin) counts — the SHARED
    operators/stats.value_histogram builder applied to the streaming
    frame (one definition; the full select including bin_lo is
    stream-safe: map + one aggregation)."""
    from pennsieve_streaming_spark.operators.stats import value_histogram

    return value_histogram(samples_stream, lo, hi, n_bins)


def drain_value_histogram(
    spark: SparkSession,
    samples_stream: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    checkpoint: str,
    query_name: str = "value_hist",
) -> DataFrame:
    """availableNow drain of the live histogram (== batch
    value_histogram over the same data)."""
    q = (
        stream_value_histogram(samples_stream, lo, hi, n_bins)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
