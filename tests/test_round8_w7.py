"""Round-8 wave-7 operator goldens."""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _series(spark, vals, channel="a"):
    return spark.createDataFrame(
        [(channel, i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )


def test_katz_fd_golden(spark):
    from pennsieve_streaming_spark.operators.stats import katz_fd

    # 0,1,2,1,0: L = 4, d = 2, n_steps = 4 ->
    # FD = ln4 / (ln4 + ln(2/4)) = 2
    out = katz_fd(_series(spark, [0, 1, 2, 1, 0]), quant=1).collect()[0]
    assert out.lpath == 4 and out.dmax == 2 and out.n_points == 5
    want = math.log(4) / (math.log(4) + math.log(2 / 4))
    assert out.fd == round(want, 9) == 2.0


def test_katz_fd_flat_and_line_sentinels(spark):
    from pennsieve_streaming_spark.operators.stats import katz_fd

    # flat: L = 0 -> sentinel
    flat = katz_fd(_series(spark, [3, 3, 3]), quant=1).collect()[0]
    assert flat.fd == 0.0
    # straight line: d == L (ln argument 1 -> degenerate) -> sentinel
    line = katz_fd(_series(spark, [0, 1, 2, 3]), quant=1).collect()[0]
    assert line.dmax == line.lpath and line.fd == 0.0


def test_max_drawdown_golden(spark):
    from pennsieve_streaming_spark.operators.stats import max_drawdown

    # peak 10 at ts1, trough 2 at ts3 -> dd 8; later peak 12 no dd
    out = max_drawdown(
        _series(spark, [5, 10, 7, 2, 12]), quant=1
    ).collect()[0]
    assert out.max_dd_q == 8 and out.trough_ts == 3
    assert out.peak_q == 10
    assert out.dd_frac == 0.8


def test_max_drawdown_monotone_zero(spark):
    from pennsieve_streaming_spark.operators.stats import max_drawdown

    out = max_drawdown(_series(spark, [1, 2, 3]), quant=1).collect()[0]
    # never below the running peak: dd = 0 everywhere; the first row
    # attaining dd = 0 is ts 0
    assert out.max_dd_q == 0 and out.trough_ts == 0
    assert out.dd_frac == 0.0


def test_bloom_positions_and_membership():
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_M,
        BLOOM_PROBES,
        bloom_pos_py,
        bloom_words_from_hashes,
    )

    hs = [12345678901234567, 999, 42]
    words = bloom_words_from_hashes(hs)
    for h in hs:
        for i in range(BLOOM_PROBES):
            p = bloom_pos_py(h, i)
            assert 0 <= p < BLOOM_M
            w = words[p // 64]
            if w < 0:
                w += 1 << 64
            assert (w >> (p % 64)) & 1 == 1


def test_bloom_contamination_no_false_negatives(spark):
    """Bloom has one-sided error: every exact hit MUST be a bloom hit
    (n_bloom_hits >= n_exact on every doc)."""
    from pennsieve_streaming_spark.llm.curation import (
        bloom_contamination,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma something else entirely here",
        "unrelated words with no overlap at all present",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    bench = docs.filter(F.col("doc_id") == 0)
    out = {
        r.doc_id: r
        for r in bloom_contamination(docs, bench, k=3).collect()
    }
    # doc 0 IS the benchmark: full overlap both ways
    assert out[0].n_exact == out[0].n_shingles
    assert out[0].n_bloom_hits == out[0].n_shingles
    assert out[0].exact_contaminated and out[0].bloom_contaminated
    # doc 1 shares the 'alpha beta gamma' shingle exactly
    assert out[1].n_exact == 1
    assert out[1].n_bloom_hits >= 1
    for r in out.values():
        assert r.n_bloom_hits >= r.n_exact
        assert r.n_false_pos == r.n_bloom_hits - r.n_exact


def _drain_keyed(spark, rows, stream_fn, n_files, ordinal):
    """Generic sequential-slice drain for keyed stateful streams."""
    import glob
    import shutil
    import time

    base = tempfile.mkdtemp(prefix="pss_w7_stream_t_")
    src = f"{base}/src"
    os.makedirs(src)
    ordered = sorted(rows, key=lambda r: (r[1], r[2]))
    step = (len(ordered) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = ordered[i * step : (i + 1) * step]
        if not chunk:
            continue
        tmp = f"{base}/tmp{i}"
        spark.createDataFrame(
            chunk, "channel string, ts long, value double"
        ).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(f"{tmp}/part-*.parquet")
        shutil.copy(part, f"{src}/{i:05d}.parquet")
        time.sleep(0.05)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_fn(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    from pyspark.sql import Window

    w = Window.partitionBy("channel").orderBy(F.desc(ordinal))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_benford_equals_batch(spark, n_files):
    import random

    from pennsieve_streaming_spark.operators.stats import benford_digits
    from pennsieve_streaming_spark.streaming.benford import (
        benford_stream,
    )

    rng = random.Random(11)
    rows = [
        ("x", t, float(rng.randrange(1, 5000)) / 10.0)
        for t in range(200)
    ]
    batch = benford_digits(
        spark.createDataFrame(
            rows, "channel string, ts long, value double"
        ),
        quant=10,
    ).collect()[0]
    got = _drain_keyed(
        spark, rows, lambda s: benford_stream(s, quant=10), n_files, "n"
    ).collect()[0]
    assert got.n == batch.n
    for i in range(1, 10):
        assert got[f"c{i}"] == batch[f"c{i}"]


@pytest.mark.parametrize("n_files", [1, 3])
def test_stream_bollinger_equals_batch(spark, n_files):
    import random

    from pennsieve_streaming_spark.operators.stats import (
        bollinger_breaks,
    )
    from pennsieve_streaming_spark.streaming.bollinger import (
        bollinger_stream,
    )

    rng = random.Random(13)
    vals = []
    for t in range(120):
        v = rng.randrange(90, 110)
        if t in (40, 41, 90):
            v = 500 if t != 90 else -500
        vals.append(("x", t, float(v)))
    batch = bollinger_breaks(
        spark.createDataFrame(
            vals, "channel string, ts long, value double"
        ),
        window=20,
        k=2,
        quant=1,
    ).collect()[0]
    got = _drain_keyed(
        spark,
        vals,
        lambda s: bollinger_stream(s, window=20, k=2, quant=1),
        n_files,
        "n_tested",
    ).collect()[0]
    assert (
        got.n_tested,
        got.n_upper,
        got.n_lower,
        got.last_upper_ts,
        got.last_lower_ts,
    ) == (
        batch.n_tested,
        batch.n_upper,
        batch.n_lower,
        batch.last_upper_ts,
        batch.last_lower_ts,
    )
    assert batch.n_upper >= 1 and batch.n_lower >= 1
