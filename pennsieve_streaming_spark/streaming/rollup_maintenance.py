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


def read_rollup(
    spark: SparkSession, path: str, max_batch_id: int | None = None
) -> DataFrame:
    """Read the partials table back as an exact rollup (dedup replayed
    batches by (batch_id, channel, bucket) first, then fold).

    ``max_batch_id`` restricts the fold to batches at or below it —
    the compaction snapshot boundary."""
    partials = spark.read.parquet(path)
    if max_batch_id is not None:
        partials = partials.filter(F.col("batch_id") <= max_batch_id)
    partials = partials.dropDuplicates(
        ["batch_id", "channel", "bucket"]
    ).drop("batch_id")
    return merge_rollup_partials(partials)


def recover_compaction(path: str) -> None:
    """Make the partials table whole after a compaction crash.

    The swap below has exactly three crash states, each deterministic:

    - staging + live table both present -> an aborted fold; the live
      table is authoritative, drop the stale staging.
    - live table MISSING, staging present -> crashed between the two
      moves; staging holds the complete folded table, promote it.
    - live + ``_old`` present, no staging -> crashed before the final
      cleanup; the swap finished, drop ``_old``.

    Idempotent; ``compact_rollup`` self-heals by calling this first.
    """
    import os
    import shutil

    staging = path.rstrip("/") + "_compacting"
    old = path.rstrip("/") + "_old"
    if not os.path.exists(path) and os.path.exists(staging):
        shutil.move(staging, path)
    if os.path.exists(path) and os.path.exists(staging):
        shutil.rmtree(staging)
    if os.path.exists(path) and os.path.exists(old):
        shutil.rmtree(old)


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Periodic maintenance: rewrite the partials table to one row per
    bucket using the same fold the readers apply.

    **Run with the maintenance stream STOPPED** (or between triggers):
    partials appended after the final carry-over read below would be
    lost in the swap. Concurrency with the stream is bounded, not
    eliminated — a snapshot batch-id boundary carries over partials
    appended *during* the fold, but not ones appended after it.

    Crash-safe stage-and-swap (never collect: the partials table can
    be channels × buckets large): fold batches ≤ the snapshot
    boundary into a staging directory, carry newer partials over
    verbatim, then swap. ``_old`` is kept until the swap fully
    succeeds; any crash state is recoverable via
    ``recover_compaction`` (called on entry, so a rerun self-heals).
    ``shutil`` operates on LOCAL paths only — on HDFS/object stores
    use a transactional table format (Delta/Iceberg) instead of this
    directory swap. Compacted rows carry batch_id = -1 so replay-dedup
    keys stay unique and further appends keep folding on top.
    """
    import shutil

    recover_compaction(path)
    staging = path.rstrip("/") + "_compacting"
    old = path.rstrip("/") + "_old"
    row = spark.read.parquet(path).agg(F.max("batch_id")).collect()[0]
    snap_max = row[0]
    if snap_max is None:
        return  # empty table: nothing to compact
    (
        read_rollup(spark, path, max_batch_id=snap_max)
        .withColumn("batch_id", F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .parquet(staging)
    )
    # carry over partials a live stream appended while the fold ran —
    # they stay un-folded (the read-side fold absorbs them) instead of
    # being silently deleted with the old directory
    (
        spark.read.parquet(path)
        .filter(F.col("batch_id") > snap_max)
        .write.mode("append")
        .parquet(staging)
    )
    shutil.move(path, old)
    shutil.move(staging, path)
    shutil.rmtree(old)
