"""Multi-resolution min/max rollups (continuous-aggregate pattern).

The reference recomputes every pixel query from raw samples. At 100 TB
that is the wrong plan: a visual query at 1 px = 1 hour over a year of
1 kHz data would scan ~3·10^10 raw points per channel. The standard
TSDB answer (continuous aggregates / hypertable rollups) is a ladder of
pre-aggregated min/max tables at increasing bucket sizes, maintained
incrementally at ingest; a pixel query reads the coarsest level whose
bucket divides the requested pixel width and re-aggregates by an
integral factor.

min/max (and count) re-aggregate losslessly: min over a 60 s bucket ==
min over its sixty 1 s buckets — so results are IDENTICAL to computing
from raw, verified against the direct operator in tests and the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bucket ladder: 1 s, 1 min, 1 h (µs)
DEFAULT_LEVELS_US = [1_000_000, 60_000_000, 3_600_000_000]


def build_rollup(samples: DataFrame, level_us: int, origin_us: int = 0) -> DataFrame:
    """One rollup level: (channel, bucket, bucket_start, min_val,
    max_val, n_samples) at ``level_us`` buckets anchored at origin."""
    bucket = F.floor((F.col("ts") - F.lit(origin_us)) / F.lit(level_us)).cast("long")
    return (
        samples.withColumn("bucket", bucket)
        .groupBy("channel", "bucket")
        .agg(
            F.min("value").alias("min_val"),
            F.max("value").alias("max_val"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .withColumn(
            "bucket_start", F.lit(origin_us) + F.col("bucket") * F.lit(level_us)
        )
    )


def rollup_from_rollup(finer: DataFrame, factor: int) -> DataFrame:
    """Coarsen a rollup by an integral factor (the incremental-ingest
    maintenance step: each level is built from the previous one, never
    from raw)."""
    return (
        finer.withColumn("cbucket", F.floor(F.col("bucket") / F.lit(factor)).cast("long"))
        .groupBy("channel", "cbucket")
        .agg(
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.sum("n_samples").alias("n_samples"),
            F.min("bucket_start").alias("bucket_start"),
        )
        .withColumnRenamed("cbucket", "bucket")
        .select("channel", "bucket", "min_val", "max_val", "n_samples", "bucket_start")
    )


def choose_level(pixel_width_us: int, levels_us: list[int] | None = None) -> int | None:
    """Coarsest level that divides the pixel width (None -> raw scan)."""
    levels = sorted(levels_us or DEFAULT_LEVELS_US)
    best = None
    for lv in levels:
        if pixel_width_us % lv == 0 and lv <= pixel_width_us:
            best = lv
    return best


def downsample_from_rollup(
    rollup: DataFrame,
    level_us: int,
    start_us: int,
    end_us: int,
    pixel_width_us: int,
    origin_us: int = 0,
) -> DataFrame:
    """Answer a min/max pixel query from a rollup level.

    Requires ``pixel_width_us % level_us == 0`` and window bounds
    aligned to the level grid (the serving layer aligns pixel grids).
    Output schema matches downsample_minmax_time.
    """
    if pixel_width_us % level_us != 0:
        raise ValueError("pixel width must be a multiple of the rollup level")
    windowed = rollup.filter(
        (F.col("bucket_start") >= start_us) & (F.col("bucket_start") < end_us)
    )
    pixel_bucket = F.floor(
        (F.col("bucket_start") - F.lit(start_us)) / F.lit(pixel_width_us)
    ).cast("long")
    return (
        windowed.withColumn("pbucket", pixel_bucket)
        .groupBy("channel", "pbucket")
        .agg(
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
            F.sum("n_samples").alias("n_samples"),
        )
        .withColumnRenamed("pbucket", "bucket")
        .withColumn(
            "bucket_start",
            F.lit(start_us) + F.col("bucket") * F.lit(pixel_width_us),
        )
        .select("channel", "bucket", "min_val", "max_val", "n_samples", "bucket_start")
    )
