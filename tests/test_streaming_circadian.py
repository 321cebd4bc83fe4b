"""stream==batch equivalence for the circadian profile."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F


def _drain(spark, rows, n_files):
    base = tempfile.mkdtemp(prefix="pss_stream_circ_")
    src = f"{base}/src"
    df = spark.createDataFrame(rows, "user_id long, ts long")
    # n_files parquet files -> availableNow processes them as separate
    # micro-batches (maxFilesPerTrigger=1)
    df.repartition(n_files).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from pennsieve_streaming_spark.streaming.circadian import (
        circadian_stream,
    )

    q = (
        circadian_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    # last snapshot per user = row with max n_events (monotone)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_equals_batch_circadian(spark, n_files):
    from pennsieve_streaming_spark.operators.analytics import (
        circadian_rhythm,
    )

    H = 3_600_000_000
    rows = []
    for u in range(7):
        for i in range(30):
            rows.append((u, ((u * 5 + i * (u + 1)) % 24) * H + i * 24 * H))
    got = {
        r.user_id: r for r in _drain(spark, rows, n_files).collect()
    }
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    want = {r.user_id: r for r in circadian_rhythm(ev).collect()}
    assert set(got) == set(want)
    for u in want:
        g, w_ = got[u], want[u]
        assert (g.n_events, g.peak_hour, g.circadian) == (
            w_.n_events, w_.peak_hour, w_.circadian
        )
        assert g.r == w_.r and g.rayleigh_z == w_.rayleigh_z
        assert g.peak_share == w_.peak_share
