"""Streaming CMS == batch CMS regardless of batch composition (counter
sums are associative integers — unlike the watermark operators, even
out-of-order arrival cannot change the result)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.sketch import cms_counters
from pennsieve_streaming_spark.streaming.cms import drain_cms_counters


def _drive(spark, words, n_files, tag):
    base = tempfile.mkdtemp(prefix="pss_scms_")
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    df.repartition(n_files).write.parquet(f"{base}/src")  # random split: fine
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    got = drain_cms_counters(
        spark, stream, "tok", f"{base}/ckpt", depth=3, width=64,
        query_name=f"cms_test_{tag}",
    )
    return sorted((r.row, r.bucket, r.cnt) for r in got.collect())


def test_stream_counters_equal_batch(spark):
    words = [f"w{i % 37}" for i in range(500)]
    batch = sorted(
        (r.row, r.bucket, r.cnt)
        for r in cms_counters(
            spark.createDataFrame([(w,) for w in words], "tok string"),
            "tok", depth=3, width=64,
        ).collect()
    )
    assert _drive(spark, words, 1, "a") == batch


def test_stream_counters_split_invariant(spark):
    words = [f"w{i % 29}" for i in range(400)]
    one = _drive(spark, words, 1, "b1")
    many = _drive(spark, words, 6, "b6")  # 6 micro-batches, random split
    assert one == many


def test_stream_state_is_bounded(spark):
    # 2000 distinct tokens but never more than depth*width counter rows
    words = [f"tok{i}" for i in range(2000)]
    rows = _drive(spark, words, 3, "c")
    assert len(rows) <= 3 * 64
    assert sum(c for _, _, c in rows) == 3 * 2000  # every occurrence, 3x
