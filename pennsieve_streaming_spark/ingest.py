"""Batch ingest: materialize the engine's native table layout.

SURVEY §7.1 design stance — tables, not files+index. The reference
needs a Postgres range catalog because its storage is opaque per-file
binary; Spark-natively the layout IS the index:

- ``samples`` partitioned by ``channel_bucket`` (hash of channel, so
  directory listing stays bounded at millions of channels) and sorted
  by (channel, ts) within files → Parquet row-group min/max stats give
  the reference's `timeseries.ranges` pruning for free.
- time-range predicates push down to the scan (PushedFilters); channel
  predicates prune partitions (PartitionFilters).

At 100 TB: add a second-level ``time_bucket`` (e.g. day) partition so
both dimensions prune; keep files ~128-512 MB via
``spark.sql.files.maxRecordsPerFile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def channel_bucket(col, n_buckets: int):
    return F.abs(F.hash(col)) % n_buckets


def materialize_samples(
    samples: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    time_bucket_us: int | None = None,
) -> None:
    """Write samples to the partitioned, stats-friendly layout."""
    df = samples.withColumn("channel_bucket", channel_bucket(F.col("channel"), n_buckets))
    parts = ["channel_bucket"]
    if time_bucket_us:
        df = df.withColumn("time_bucket", (F.col("ts") / time_bucket_us).cast("long"))
        parts.append("time_bucket")
    (
        df.repartition(*[F.col(p) for p in parts])
        .sortWithinPartitions("channel", "ts")
        .write.mode("overwrite")
        .partitionBy(*parts)
        .parquet(out_dir)
    )


def materialize_samples_bucketed(
    samples: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 8,
) -> None:
    """Write samples as a ts-BUCKETED table: ``bucketBy(n, ts)`` +
    in-bucket sort.

    Why bucket on ts: the montage zip-join (J1) is a self-join of the
    samples table on ts. With both sides reading the same ts-bucketed,
    ts-sorted layout, the sort-merge join needs NO exchange and NO
    sort — the reference's positional zip re-created as a co-located
    join (`tests/test_layout.py` asserts the plan is exchange-free).
    Channel predicates still prune via row-group stats.
    """
    (
        samples.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, "ts")
        .sortBy("ts")
        .saveAsTable(table)
    )


def read_samples(spark: SparkSession, path: str) -> DataFrame:
    """Read the materialized layout back, dropping layout columns."""
    return spark.read.parquet(path).drop("channel_bucket", "time_bucket")


def pruned_channel_scan(
    spark: SparkSession,
    path: str,
    channel: str,
    start_us: int,
    end_us: int,
    n_buckets: int = 8,
) -> DataFrame:
    """Channel+window scan that prunes partitions explicitly: the
    channel's bucket is computable driver-side, so the scan touches
    exactly one partition directory and parquet skips row groups via
    ts min/max stats."""
    df = spark.read.parquet(path)
    return (
        df.filter(F.col("channel_bucket") == channel_bucket(F.lit(channel), n_buckets))
        .filter(
            (F.col("channel") == channel)
            & (F.col("ts") >= start_us)
            & (F.col("ts") < end_us)
        )
        .drop("channel_bucket", "time_bucket")
    )
