"""Round-8 wave-6 operator goldens."""

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


def test_bollinger_spike_detected(spark):
    from pennsieve_streaming_spark.operators.stats import (
        bollinger_breaks,
    )

    # stable alternating window then a huge spike up and a dip down
    vals = [10, 12] * 10 + [100] + [10, 12] * 10 + [-100]
    out = bollinger_breaks(
        _series(spark, vals), window=20, k=2, quant=1
    ).collect()[0]
    assert out.n_upper >= 1 and out.last_upper_ts == 20
    assert out.n_lower >= 1 and out.last_lower_ts == len(vals) - 1
    # only rows past the 20-sample warmup are tested
    assert out.n_tested == len(vals) - 20


def test_bollinger_constant_never_breaks(spark):
    from pennsieve_streaming_spark.operators.stats import (
        bollinger_breaks,
    )

    out = bollinger_breaks(
        _series(spark, [5] * 30), window=20, k=2, quant=1
    ).collect()[0]
    assert out.n_upper == 0 and out.n_lower == 0
    assert out.last_upper_ts == -1 and out.last_lower_ts == -1


def test_turning_points_alternating_vs_ramp(spark):
    from pennsieve_streaming_spark.operators.stats import turning_points

    # perfect alternation: every interior point is a turn
    alt = turning_points(_series(spark, [0, 1] * 15), quant=1).collect()[0]
    assert alt.n_turns == alt.n_points - 2
    assert alt.verdict == "oscillating" and alt.z > 1.96
    # monotone ramp: no turns
    ramp = turning_points(_series(spark, range(30)), quant=1).collect()[0]
    assert ramp.n_turns == 0 and ramp.verdict == "trending"
    # golden z for the ramp
    n = 30
    z = (0 - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert ramp.z == round(z, 9)


def test_turning_points_ties_not_turns(spark):
    from pennsieve_streaming_spark.operators.stats import turning_points

    # plateau peaks (1,2,2,1) are NOT strict turns by contract
    out = turning_points(
        _series(spark, [1, 2, 2, 1, 2, 2, 1]), quant=1
    ).collect()[0]
    # ts3 (2>1<2) is the ONLY strict turn; the plateau peaks at
    # ts1-2 / ts4-5 are not turns by contract
    assert out.n_turns == 1


def test_case_profile_golden(spark):
    from pennsieve_streaming_spark.llm.text import case_profile

    df = spark.createDataFrame(
        [(0, "NASA Report on mars2020 IX"), (1, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in case_profile(df).collect()}
    d = out[0]
    # NASA, IX all-caps; Report TitleCase; mars2020 digit word
    assert d.n_words == 5
    assert d.n_caps_words == 2
    assert d.n_title_words == 1
    assert d.n_digit_words == 1
    assert d.caps_share == 0.4
    e = out[1]
    assert e.n_words == 0 and e.caps_share == 0.0


def test_ab_cuped_null_experiment_theta(spark):
    from pennsieve_streaming_spark.operators.analytics import ab_cuped

    # engineered feed: pre-period activity perfectly predicts the
    # post-period metric (y = 100*x in cents), identical across
    # variants -> theta 100, adjusted diff 0, z 0
    rows = []
    for u in range(8):
        k = (u // 2) % 2 + 1  # 1 or 2 pre events
        for i in range(k):
            rows.append((u, "click", 100 + i, 0.0))
        rows.append((u, "purchase", 1000, float(k)))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, value double"
    )
    out = ab_cuped(ev).collect()[0]
    assert out.n_a == 4 and out.n_b == 4
    assert out.theta == 100.0
    assert out.diff_raw == 0.0 and out.diff_adj == 0.0
    assert out.z_adj == 0.0 and not out.significant


def test_ab_cuped_variance_reduction_catches_effect(spark):
    from pennsieve_streaming_spark.operators.analytics import ab_cuped

    # y = 100*x + 50-cent lift for variant B (odd users): raw diff is
    # noisy across x, adjusted diff isolates the lift exactly
    rows = []
    for u in range(20):
        k = u % 5 + 1
        for i in range(k):
            rows.append((u, "click", 100 + i, 0.0))
        lift = 0.5 if u % 2 == 1 else 0.0
        rows.append((u, "purchase", 1000, float(k) + lift))
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, value double"
    )
    out = ab_cuped(ev).collect()[0]
    # adjusted diff (A - B) = -50 cents exactly; the covariate
    # explains ALL residual variance, so the z denominator is 0 and
    # the documented 0.0 sentinel fires (real data exercises z via
    # the oracle parity gate)
    assert out.diff_adj == -50.0
    assert out.z_adj == 0.0 and not out.significant


def _drain_records(spark, rows, n_files):
    import glob
    import shutil
    import time

    base = tempfile.mkdtemp(prefix="pss_rec_stream_t_")
    src = f"{base}/src"
    os.makedirs(src)
    # ts-ordered slices written SEQUENTIALLY (distinct mtimes) so the
    # file source replays them as in-order micro-batches — the
    # operator's documented in-order arrival contract
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
    from pennsieve_streaming_spark.streaming.records import (
        records_stream,
    )

    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        records_stream(stream, quant=1)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    from pyspark.sql import Window

    w = Window.partitionBy("channel").orderBy(F.desc("n_points"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_records_equals_batch(spark, n_files):
    from pennsieve_streaming_spark.operators.stats import record_counts

    import random

    rng = random.Random(7)
    rows = []
    for ch in ("x", "y"):
        for t in range(60):
            rows.append((ch, t, float(rng.randrange(-50, 50))))
    batch = {
        r.channel: r
        for r in record_counts(
            spark.createDataFrame(
                rows, "channel string, ts long, value double"
            ),
            quant=1,
        ).collect()
    }
    got = {
        r.channel: r for r in _drain_records(spark, rows, n_files).collect()
    }
    for ch in ("x", "y"):
        b, g = batch[ch], got[ch]
        assert (
            g.n_points,
            g.n_record_highs,
            g.n_record_lows,
            g.last_high_ts,
            g.last_low_ts,
        ) == (
            b.n_points,
            b.n_record_highs,
            b.n_record_lows,
            b.last_high_ts,
            b.last_low_ts,
        )
