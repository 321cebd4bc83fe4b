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
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
    return df
