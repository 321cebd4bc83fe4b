"""Local newline-delimited value files (S5) — the reference's test
storage backend (LocalFilesystemWsClient, query/WsClient.scala:224-243):
one numeric value per line per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_value_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read newline-delimited doubles with their source file + line
    position (position = sample index for ts materialization).

    Output: (location, pos, value).
    """
    df = (
        spark.read.text(path_glob)
        .withColumn("path", F.input_file_name())
        .withColumn("location", F.element_at(F.split("path", "/"), -1))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("location").orderBy(F.monotonically_increasing_id())
    return (
        df.withColumn("pos", F.row_number().over(w) - F.lit(1))
        .select("location", "pos", F.col("value").cast("double").alias("value"))
    )
