"""stream==batch equivalence + goldens for the KMV distinct sketch."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.streaming.kmv import (
    KMV_K,
    md5_hash64_py,
)


def _drain(spark, uids, n_files):
    base = tempfile.mkdtemp(prefix="pss_stream_kmv_t_")
    src = f"{base}/src"
    df = spark.createDataFrame([(u,) for u in uids], "user_id long")
    df.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from pennsieve_streaming_spark.streaming.kmv import kmv_stream

    q = (
        kmv_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    mx = out.agg(F.max("n_seen").alias("_mx"))
    return (
        out.crossJoin(F.broadcast(mx))
        .filter(F.col("n_seen") == F.col("_mx"))
        .select("rank", "h")
    )


def test_hash_matches_engine(spark):
    """md5_hash64_py == the Spark md5-prefix expression on the same
    decimal string (the cross-engine hash contract)."""
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    ids = [0, 1, 42, 999_999_999_999]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    got = {
        r.user_id: r.h
        for r in df.select(
            "user_id",
            F.expr(
                md5_hash64_expr("CAST(user_id AS STRING)")
            ).alias("h"),
        ).collect()
    }
    for i in ids:
        assert got[i] == md5_hash64_py(i)


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_equals_batch_kmv(spark, n_files):
    """The drained bottom-k set is bit-identical to the batch SQL
    regardless of the micro-batch split (min-k commutes)."""
    uids = [(i * 37) % 101 for i in range(400)]  # 101 distinct, dups
    got = sorted(
        (r.rank, r.h) for r in _drain(spark, uids, n_files).collect()
    )
    want = sorted(
        enumerate(sorted({md5_hash64_py(u) for u in uids})[:KMV_K], 1)
    )
    assert got == [(int(r), int(h)) for r, h in want]
    assert len(got) == KMV_K


def test_kmv_underfull_exact(spark):
    """Fewer distinct keys than k: the sketch IS the distinct set and
    the estimator reports the exact count."""
    got = _drain(spark, [5, 5, 7, 7, 9], 1).collect()
    assert len(got) == 3
    assert sorted(r.h for r in got) == sorted(
        md5_hash64_py(u) for u in (5, 7, 9)
    )
