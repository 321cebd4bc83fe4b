"""Streaming count-min sketch: token-frequency counters maintained as
a LIVE streaming aggregation.

The CMS is the textbook case where Spark's ``complete`` output mode is
actually scale-safe: the aggregation state is capped at depth×width
integer counters BY CONSTRUCTION (that is the entire point of the
sketch), so the state store and the per-trigger emission stay constant
no matter how many tokens stream through. Counter sums are associative
integers, so the final counter table after an ``availableNow`` drain
equals the batch ``llm/sketch.cms_counters`` over the same corpus —
batch-boundary independent, which is what lets the driver's batch
oracle gate the streaming operator.

Heavy-hitter extraction then runs batch-side against the materialized
counters (broadcast join, as in the batch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.sketch import _cms_bucket_exprs


def stream_cms_counters(
    tokens_stream: DataFrame,
    col_expr: str,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Streaming (row, bucket, cnt) counter aggregation over a token
    feed — state bounded at depth×width rows."""
    pairs = ", ".join(
        f"named_struct('row', {j}, 'bucket', {b})"
        for j, b in enumerate(_cms_bucket_exprs(col_expr, depth, width))
    )
    return (
        tokens_stream.select(
            F.explode(F.expr(f"array({pairs})")).alias("rb")
        )
        .select(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def drain_cms_counters(
    spark: SparkSession,
    tokens_stream: DataFrame,
    col_expr: str,
    checkpoint: str,
    depth: int = 3,
    width: int = 1024,
    query_name: str = "cms_counters",
) -> DataFrame:
    """Run the streaming counter aggregation to completion
    (availableNow, complete mode → memory sink) and return the final
    counter table — equal to the batch counters over the same data."""
    counters = stream_cms_counters(tokens_stream, col_expr, depth, width)
    q = (
        counters.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
