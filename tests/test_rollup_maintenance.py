"""Streaming rollup maintenance: append-partials + fold-on-read must
equal a from-raw rollup."""

from __future__ import annotations

import shutil
import tempfile

from pennsieve_streaming_spark.operators.rollups import build_rollup
from pennsieve_streaming_spark.streaming.rollup_maintenance import (
    read_rollup,
    start_rollup_maintenance,
)

LEVEL = 10_000_000  # 10 s buckets


def _key(rows):
    return sorted(
        (r["channel"], r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
        for r in rows
    )


def test_streaming_partials_fold_to_exact_rollup(spark):
    src = tempfile.mkdtemp(prefix="rm_src_")
    out = tempfile.mkdtemp(prefix="rm_out_")
    ckpt = tempfile.mkdtemp(prefix="rm_ckpt_")
    try:
        # two files -> two micro-batches splitting buckets mid-way
        rows = [("c%d" % (i % 3), i * 1_000_000, float(i % 17)) for i in range(600)]
        all_df = spark.createDataFrame(rows, "channel string, ts long, value double")
        # split mid-bucket (355 is inside bucket 35) so batches overlap buckets
        spark.createDataFrame(rows[:355], all_df.schema).coalesce(1)\
            .write.mode("overwrite").parquet(src + "/b0")
        spark.createDataFrame(rows[355:], all_df.schema).coalesce(1)\
            .write.mode("overwrite").parquet(src + "/b1")

        stream = (
            spark.readStream.schema(all_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = start_rollup_maintenance(stream, out, ckpt, LEVEL)
        q.processAllAvailable()
        q.stop()

        got = read_rollup(spark, out)
        want = build_rollup(all_df, LEVEL)
        assert _key(got.collect()) == _key(want.collect())
        # partial rows really did split buckets across batches
        n_partials = spark.read.parquet(out).count()
        assert n_partials > want.count()
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)
