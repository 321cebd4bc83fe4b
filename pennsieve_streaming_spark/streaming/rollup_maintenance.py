"""Incremental rollup maintenance for the streaming ingest path.

Problem: keeping the continuous-aggregate ladder (operators/rollups.py)
fresh as samples stream in, without Delta/Iceberg MERGE (jars absent)
and without rewriting closed buckets.

Solution — append PARTIAL aggregates, re-aggregate on read:
min/max/count form a commutative monoid, so a bucket's true value is
recoverable from any set of partial (min, max, count) rows covering
it. Each micro-batch appends its per-bucket partials (idempotent-able
via batch-id dedup in a real sink); readers fold duplicates/partials
with one groupBy. Compaction is an optimization, not a correctness
requirement — a periodic batch job can rewrite partitions to one row
per bucket using the SAME fold.

This is the classic "summary table via upsert-free append" pattern;
exactness is proven in tests against a from-raw rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pennsieve_streaming_spark.operators.rollups import build_rollup


def rollup_partials_for_batch(
    batch: DataFrame, level_us: int, origin_us: int = 0
) -> DataFrame:
    """Per-micro-batch partial rollup rows (same schema as a rollup)."""
    return build_rollup(batch, level_us, origin_us)


def merge_rollup_partials(partials: DataFrame) -> DataFrame:
    """Fold partial rows to the exact rollup (the read-side fold)."""
    return (
        partials.groupBy("channel", "bucket")
        .agg(
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.sum("n_samples").alias("n_samples"),
            F.min("bucket_start").alias("bucket_start"),
        )
        .select("channel", "bucket", "min_val", "max_val", "n_samples", "bucket_start")
    )


def start_rollup_maintenance(
    samples_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    level_us: int,
    origin_us: int = 0,
) -> "StreamingQuery":  # noqa: F821
    """writeStream job appending per-batch rollup partials.

    foreachBatch + append parquet: restarts may re-append a batch's
    partials; the read-side fold is insensitive to duplicate COVERAGE
    of min/max but not count — a production sink dedupes on
    (batch_id) or uses an idempotent table format. The batch id is
    recorded per row to make that dedup possible downstream.
    """

    def emit(batch: DataFrame, batch_id: int) -> None:
        (
            rollup_partials_for_batch(batch, level_us, origin_us)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return (
        samples_stream.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Read the partials table back as an exact rollup (dedup replayed
    batches by (batch_id, channel, bucket) first, then fold)."""
    partials = (
        spark.read.parquet(path)
        .dropDuplicates(["batch_id", "channel", "bucket"])
        .drop("batch_id")
    )
    return merge_rollup_partials(partials)


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Periodic maintenance: rewrite the partials table to one row per
    bucket using the same fold the readers apply.

    Stage-and-swap (never collect: the partials table can be
    channels × buckets large): fold into a staging directory, then
    swap it in. Rename is atomic on local/HDFS; object stores want a
    versioned table format (Delta/Iceberg) instead. Compacted rows
    carry batch_id = -1 so replay-dedup keys stay unique and further
    appends keep folding on top.
    """
    import shutil

    from pyspark.sql import functions as F

    staging = path.rstrip("/") + "_compacting"
    (
        read_rollup(spark, path)
        .withColumn("batch_id", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .parquet(staging)
    )
    old = path.rstrip("/") + "_old"
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)
