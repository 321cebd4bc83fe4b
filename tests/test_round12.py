"""Round-12 optimization fences.

1. mann_whitney's tie correction was folded into the rank-window
   aggregation (Σ_rows(_t²−1) == Σ_groups(t³−t) exactly), deleting the
   dataset-scale pair-membership checkpoint (ADVICE r11). The golden
   below has PARTIAL ties (neither none nor all), so a wrong fold
   moves z.
2. pin_big (persist + count) must deduplicate a shared stage like the
   checkpoint pin did, and live_plan_counts must see the cached read
   as ZERO live source scans while the cached lineage still prints in
   the explain output.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_mann_whitney_partial_ties_golden(spark):
    from pennsieve_streaming_spark.operators.analytics import mann_whitney

    rows = [("a", float(v)) for v in [1, 1, 2, 3]]
    rows += [("b", float(v)) for v in [1, 2, 2, 4]]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = mann_whitney(ev).collect()[0]
    # pooled: value 1 x3, 2 x3, 3 x1, 4 x1 -> tie3 = 2*(27-3) = 48
    # 2*rank: v1 -> 4, v2 -> 10, v3 -> 14, v4 -> 16; R1_2 = 4+4+10+14
    assert (out.n_a, out.n_b) == (4, 4)
    assert out.u2 == 12  # 32 - 4*5
    var_u = (16 / 12.0) * (9 - 48 / 56.0)  # tie-corrected, n=8
    assert out.z == round((12 - 16) / (2 * math.sqrt(var_u)), 9)
    assert not out.significant


def test_pin_big_shares_stage_and_counts_zero_live_scans(spark, sf_dir):
    from pennsieve_streaming_spark.util import live_plan_counts, pin_big

    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = pin_big(base)
    try:
        out = p.alias("x").join(
            p.alias("y"),
            F.col("x.event_type") == F.col("y.event_type"),
        )
        c = live_plan_counts(
            out, {"scan": "Scan parquet", "imts": "InMemoryTableScan"}
        )
        # both join legs read the cache; the parquet scan inside the
        # cached lineage is NOT live work
        assert c["scan"] == 0 and c["imts"] == 2
        # the full explain output still shows the cached lineage
        full = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Scan parquet" in full
    finally:
        p.unpersist()


def test_pin_big_streaming_passthrough(spark):
    from pennsieve_streaming_spark.util import pin, pin_big

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    # localCheckpoint/persist would raise or be meaningless on a
    # stream; both pins must pass it through untouched (ADVICE r11)
    assert pin(stream) is stream
    assert pin_big(stream) is stream
