"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    CPU-heavy narrow operators (shingling, dot products, pandas UDFs)
    inherit the scan's partitioning; a small single-file input would
    otherwise run on one core. At real scale (inputs with >= cores
    partitions) this is a no-op — no shuffle is added.
    """
    spark = df.sparkSession
    try:
        target = spark.sparkContext.defaultParallelism
        # classic API only: plan→RDD conversion is cheap here (no job
        # runs), but the attribute does not exist under Spark Connect
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - Spark Connect path
        # Connect: partition count is not observable; repartitioning to
        # the default parallelism is a safe no-op-ish choice for the
        # small inputs this guard exists for.
        return df.repartition(*key_cols) if key_cols else df
    if current < max(2, target // 2):
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df
