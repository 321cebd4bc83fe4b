"""Streaming as-of join: emitted rows must equal the BATCH
align.asof_join output over everything ingested, wherever the
micro-batch boundaries fall (per-channel ts-ordered arrival, the
streaming append contract)."""

from __future__ import annotations

import os
import random
import shutil
import tempfile

from pennsieve_streaming_spark.operators.align import asof_join
from pennsieve_streaming_spark.streaming.asof import asof_join_stream

COLS = ["event_id", "channel", "probe_ts", "value", "src_ts", "stale_us", "matched"]


def _write(spark, rows, schema, d):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)


def _run_stream(spark, sample_batches, probe_batches, name):
    """One availableNow run per epoch against a shared checkpoint:
    state carries across restarts, and each epoch's samples AND probes
    are fully on disk before the trigger fires — the deterministic way
    to honor the operator's in-order arrival contract with two file
    sources (a live query could fire a micro-batch between the two
    copy steps, feeding epoch-k probes after epoch-k samples had
    already advanced the carry)."""
    base = tempfile.mkdtemp(prefix="asof_run_")
    s_src, p_src = f"{base}/s", f"{base}/p"
    os.makedirs(s_src), os.makedirs(p_src)
    tmp_dirs = []
    try:
        for i, (sb, pb) in enumerate(zip(sample_batches, probe_batches)):
            for rows, schema, src in (
                (sb, "channel string, ts long, value double", s_src),
                (pb, "channel string, ts long, event_id long", p_src),
            ):
                if not rows:
                    continue
                d = tempfile.mkdtemp(prefix="asof_b_")
                tmp_dirs.append(d)
                _write(spark, rows, schema, d)
                for f in os.listdir(d):
                    if f.startswith(".") or not f.endswith(".parquet"):
                        continue
                    shutil.copy(os.path.join(d, f), os.path.join(src, f"{i}_{f}"))
            s_stream = (
                spark.readStream.schema("channel string, ts long, value double")
                .parquet(s_src)
            )
            p_stream = (
                spark.readStream.schema("channel string, ts long, event_id long")
                .parquet(p_src)
            )
            out = asof_join_stream(s_stream, p_stream)
            q = (
                out.writeStream.format("parquet")
                .option("path", f"{base}/out")
                .option("checkpointLocation", f"{base}/ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return [
            tuple(r[c] for c in COLS)
            for r in spark.read.parquet(f"{base}/out").collect()
        ]
    finally:
        for d in [base, *tmp_dirs]:
            shutil.rmtree(d, ignore_errors=True)


def _batch_rows(spark, samples, probes):
    s = spark.createDataFrame(samples, "channel string, ts long, value double")
    p = spark.createDataFrame(probes, "channel string, ts long, event_id long")
    return [
        tuple(r[c] for c in COLS) for r in asof_join(s, p).collect()
    ]


def _gen(rng, channels, n, t_hi):
    samples, probes, eid = [], [], 0
    for ch in channels:
        # unique (channel, ts) sample times per the asof_join precondition
        s_ts = sorted(rng.sample(range(0, t_hi), n))
        samples.extend((ch, t, round(rng.uniform(-5, 5), 3)) for t in s_ts)
        for _ in range(n):
            # probe ts can collide with sample ts (inclusive as-of) or
            # precede the first sample (unmatched path)
            probes.append((ch, rng.randrange(0, t_hi), eid))
            eid += 1
    return samples, probes


def _split_by_epoch(rows, bounds):
    batches = [[] for _ in range(len(bounds) + 1)]
    for r in rows:
        for i, b in enumerate(bounds):
            if r[1] < b:
                batches[i].append(r)
                break
        else:
            batches[-1].append(r)
    return batches


def test_stream_equals_batch_across_boundaries(spark):
    rng = random.Random(11)
    samples, probes = _gen(rng, ("a", "b", "c"), 25, 3_000)
    bounds = (1_000, 2_000)
    got = _run_stream(
        spark,
        _split_by_epoch(samples, bounds),
        _split_by_epoch(probes, bounds),
        "asof_stream_eq",
    )
    want = _batch_rows(spark, samples, probes)
    assert sorted(got) == sorted(want)


def test_carry_crosses_empty_batches(spark):
    # sample in batch 0, nothing in batch 1, probe in batch 2: the
    # state carry must survive quiet batches
    samples = [("x", 10, 1.5)]
    probes = [("x", 5, 1), ("x", 2_500, 2)]
    got = _run_stream(
        spark,
        [[("x", 10, 1.5)], [], []],
        [[("x", 5, 1)], [], [("x", 2_500, 2)]],
        "asof_stream_carry",
    )
    want = _batch_rows(spark, samples, probes)
    assert sorted(got) == sorted(want)
    by_eid = {t[0]: t for t in got}
    assert by_eid[1][-1] is False and by_eid[1][3] == 0.0  # before first sample
    assert by_eid[2][-1] is True and by_eid[2][4] == 10  # src_ts carried


def test_exact_hit_and_duplicate_ts_winner(spark):
    # probe at a sample's exact ts takes that sample (inclusive as-of);
    # duplicate-ts samples inside one batch resolve to max value, the
    # batch window-order winner
    samples = [("y", 100, 1.0), ("y", 100, 9.0), ("y", 200, 2.0)]
    probes = [("y", 100, 1), ("y", 150, 2)]
    got = _run_stream(
        spark, [samples], [probes], "asof_stream_exact"
    )
    by_eid = {t[0]: t for t in got}
    assert by_eid[1][3] == 9.0 and by_eid[1][4] == 100
    assert by_eid[2][3] == 9.0 and by_eid[2][4] == 100
    # batch comparison needs unique (channel, ts): pre-aggregated
    want = _batch_rows(
        spark, [("y", 100, 9.0), ("y", 200, 2.0)], probes
    )
    assert sorted(got) == sorted(want)


def test_string_payload_roundtrip(spark):
    s_src = tempfile.mkdtemp(prefix="asof_sp_")
    p_src = tempfile.mkdtemp(prefix="asof_pp_")
    _write(spark, [("z", 10, 4.0)], "channel string, ts long, value double", s_src)
    _write(
        spark,
        [("z", 20, "tag-a")],
        "channel string, ts long, label string",
        p_src,
    )
    s_stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(s_src)
    )
    p_stream = (
        spark.readStream.schema("channel string, ts long, label string")
        .parquet(p_src)
    )
    out = asof_join_stream(s_stream, p_stream, payload_cols=("label",))
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream_str")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM asof_stream_str").collect()
    finally:
        q.stop()
        shutil.rmtree(s_src, ignore_errors=True)
        shutil.rmtree(p_src, ignore_errors=True)
    assert len(rows) == 1
    assert rows[0]["label"] == "tag-a" and rows[0]["value"] == 4.0


def test_int64_payload_exact_above_2_53(spark):
    """A nullable int64 payload column crosses Arrow->pandas as float64
    and silently rounds ids above 2^53; the string round-trip must keep
    the column int64-exact end to end — including when a genuinely
    NULL probe payload shares the micro-batch (one NULL used to poison
    the whole chunk's dtype to float64)."""
    big = (1 << 53) + 1
    s_src = tempfile.mkdtemp(prefix="asof_big_s_")
    p_src = tempfile.mkdtemp(prefix="asof_big_p_")
    _write(spark, [("z", 10, 4.0)], "channel string, ts long, value double", s_src)
    _write(
        spark,
        [("z", 20, big), ("z", 25, None)],
        "channel string, ts long, event_id long",
        p_src,
    )
    s_stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(s_src)
    )
    p_stream = (
        spark.readStream.schema("channel string, ts long, event_id long")
        .parquet(p_src)
    )
    out = asof_join_stream(s_stream, p_stream)
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream_big")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM asof_stream_big").collect()
    finally:
        q.stop()
        shutil.rmtree(s_src, ignore_errors=True)
        shutil.rmtree(p_src, ignore_errors=True)
    by_ts = {r["probe_ts"]: r for r in rows}
    assert len(rows) == 2
    assert by_ts[20]["event_id"] == big  # would be 2^53 under float64
    assert by_ts[20]["value"] == 4.0 and by_ts[20]["matched"] is True
    assert by_ts[25]["event_id"] is None  # NULL payload preserved
