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


def test_full_wiring_ingest_to_served_pixel_query(spark, tmp_path):
    """The production loop end-to-end: segment stream -> exploded
    samples appended to the layout + streaming rollup partials ->
    QuerySession over the read-back table with the maintained rollup
    ladder -> an aligned wide pixel query must use the rollup path and
    equal the direct raw-scan computation exactly."""
    import shutil

    from pennsieve_streaming_spark.serving.session import (
        QuerySession,
        TimeSeriesRequest,
    )
    from pennsieve_streaming_spark.streaming import (
        explode_segments_to_samples,
        read_ingest_stream,
    )
    from pennsieve_streaming_spark.streaming.rollup_maintenance import (
        read_rollup,
        start_rollup_maintenance,
    )

    seg_dir = str(tmp_path / "segs")
    samples_dir = str(tmp_path / "samples")
    rollup_dir = str(tmp_path / "rollup")

    # 2 channels x 40 segments x 100 samples at 1 kHz
    rows = []
    for ch in ("a", "b"):
        t = 0
        for s in range(40):
            rows.append((ch, t, 1000.0,
                         [float((s * 100 + i) % 83) for i in range(100)]))
            t += 100 * 1000
    (spark.createDataFrame(
        rows,
        "channel string, start_ts long, sample_period double, data array<double>")
     .coalesce(1).write.mode("overwrite").parquet(seg_dir))

    stream = read_ingest_stream(spark, seg_dir, max_files_per_trigger=4)
    samples = explode_segments_to_samples(stream)
    q1 = (samples.writeStream.format("parquet")
          .option("path", samples_dir)
          .option("checkpointLocation", str(tmp_path / "ck1"))
          .trigger(availableNow=True).start())
    q2 = start_rollup_maintenance(
        samples, rollup_dir, str(tmp_path / "ck2"), level_us=100_000)
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()

    table = spark.read.parquet(samples_dir)
    ladder = {100_000: read_rollup(spark, rollup_dir)}
    with_r = QuerySession(spark, table, {"a": 1000.0, "b": 1000.0},
                          "wired", rollups=ladder)
    direct = QuerySession(spark, table, {"a": 1000.0, "b": 1000.0}, "direct")
    # 4s window, 200ms pixels: aligned to the 100ms rollup grid
    req = TimeSeriesRequest("s", ["a", "b"], 0, 4_000_000, pixel_width=200_000)
    for name in ("a", "b"):
        got = sorted(
            (r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
            for r in with_r.run(req)[name].collect()
        )
        want = sorted(
            (r["bucket"], r["min_val"], r["max_val"], r["n_samples"])
            for r in direct.run(req)[name].collect()
        )
        assert got == want and len(got) == 20


def test_compaction_preserves_rollup_and_shrinks(spark, tmp_path):
    """compact_rollup must leave read_rollup's answer identical while
    reducing the partials table to one row per (channel, bucket), and
    further appends must keep folding correctly on top."""
    from pennsieve_streaming_spark.operators.rollups import build_rollup
    from pennsieve_streaming_spark.streaming.rollup_maintenance import (
        compact_rollup,
        read_rollup,
        rollup_partials_for_batch,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "partials")
    rows = [("c", i * 1000, float(i % 31)) for i in range(5000)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    # three "micro-batches" overlapping bucket boundaries
    for b, (lo, hi) in enumerate([(0, 1837), (1837, 3641), (3641, 5000)]):
        batch = df.filter((F.col("ts") >= lo * 1000) & (F.col("ts") < hi * 1000))
        (rollup_partials_for_batch(batch, 100_000)
         .withColumn("batch_id", F.lit(b).cast("long"))
         .write.mode("append").parquet(path))

    want = sorted(map(tuple, read_rollup(spark, path).collect()))
    n_before = spark.read.parquet(path).count()
    compact_rollup(spark, path)
    assert sorted(map(tuple, read_rollup(spark, path).collect())) == want
    n_after = spark.read.parquet(path).count()
    assert n_after == 50 and n_before > n_after  # one row per bucket

    # appends after compaction still fold exactly
    late = df.filter(F.col("ts") >= 4_000_000)
    (rollup_partials_for_batch(late, 100_000)
     .withColumn("batch_id", F.lit(9).cast("long"))
     .write.mode("append").parquet(path))
    merged = read_rollup(spark, path)
    direct = build_rollup(df, 100_000)
    got = {(r["channel"], r["bucket"]): (r["min_val"], r["max_val"])
           for r in merged.collect()}
    exp = {(r["channel"], r["bucket"]): (r["min_val"], r["max_val"])
           for r in direct.collect()}
    assert got == exp


def test_compaction_crash_recovery_and_late_partials(spark, tmp_path):
    """ADVICE r2: compaction must be crash-recoverable at every stage
    and must not delete partials appended after the snapshot.

    - a crash between the two directory moves leaves no live table;
      recover_compaction promotes the complete staging dir.
    - a crash before the final cleanup leaves _old; recovery drops it.
    - partials with batch_id beyond the fold snapshot are carried over
      verbatim (simulated by a concurrent append into the table the
      carry-over read sees)."""
    import shutil as sh

    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.streaming.rollup_maintenance import (
        compact_rollup,
        read_rollup,
        recover_compaction,
        rollup_partials_for_batch,
    )

    path = str(tmp_path / "partials")
    rows = [("c", i * 1_000, float(i % 7)) for i in range(5_000)]
    samples = spark.createDataFrame(rows, "channel string, ts long, value double")
    for bid in (0, 1):
        half = samples.filter((F.col("ts") / 1_000 % 2) == bid)
        rollup_partials_for_batch(half, 100_000).withColumn(
            "batch_id", F.lit(bid).cast("long")
        ).write.mode("append").parquet(path)
    want = sorted(map(tuple, read_rollup(spark, path).collect()))

    # crash state A: fold finished, first move done, second move not
    compact_rollup(spark, path)  # produce a compacted table first
    sh.copytree(path, path + "_compacting")
    sh.move(path, path + "_old")
    recover_compaction(path)
    assert sorted(map(tuple, read_rollup(spark, path).collect())) == want
    import os

    assert not os.path.exists(path + "_old")
    assert not os.path.exists(path + "_compacting")

    # crash state B: stale staging next to a live table -> dropped
    sh.copytree(path, path + "_compacting")
    recover_compaction(path)
    assert not os.path.exists(path + "_compacting")

    # late partials: append a batch AFTER the compacted fold; the next
    # compaction's snapshot boundary folds it in exactly
    late = samples.filter((F.col("value") == 3.0))
    rollup_partials_for_batch(late, 100_000).withColumn(
        "batch_id", F.lit(99).cast("long")
    ).write.mode("append").parquet(path)
    want2 = sorted(map(tuple, read_rollup(spark, path).collect()))
    compact_rollup(spark, path)
    assert sorted(map(tuple, read_rollup(spark, path).collect())) == want2
