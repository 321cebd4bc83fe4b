"""Bucketed co-location (sources/bucketing.py): plan-level proof that
the pay-shuffle-once-at-ingest trade works — joins and aggregations on
the bucket key must run with ZERO shuffle Exchanges, and results must
equal the unbucketed plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pennsieve_streaming_spark.sources.bucketing import (
    read_bucketed,
    write_bucketed,
)


def _executed_plan(df) -> str:
    df.collect()  # force AQE to finalize
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def bucketed_samples(spark, tmp_path_factory):
    rows = []
    for ch in range(6):
        for i in range(200):
            rows.append((f"ch{ch}", i * 1000, float(ch * 1000 + i)))
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    base = tmp_path_factory.mktemp("buckets")
    for name in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed(
            df, name, "channel", n_buckets=4, sort_cols=("channel", "ts"),
            path=str(base / name),
        )
    yield df
    for name in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_samples):
    # disable broadcast so the join takes the big-big sort-merge path —
    # the case bucketing exists for (a broadcast join never shuffles
    # anyway and would prove nothing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed(spark, "bkt_a")
        b = read_bucketed(spark, "bkt_b").select(
            "channel", F.col("ts").alias("ts_b"), F.col("value").alias("v_b")
        )
        # channel-key join with a RANGE secondary condition (the montage
        # /as-of shape) — an equality on ts would be folded into the
        # join keys and change the required partitioning
        j = a.join(b, ["channel"]).filter(
            (F.col("ts_b") >= F.col("ts")) & (F.col("ts_b") < F.col("ts") + 2000)
        )
        agg = j.groupBy("channel").agg(F.count(F.lit(1)).alias("n"))
        plan = _executed_plan(agg)
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan
        # same result as the unbucketed computation: each ts matches
        # itself and its successor (except the last row matches 1)
        got = {r.channel: r.n for r in agg.collect()}
        assert got == {f"ch{c}": 399 for c in range(6)}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_samples):
    a = read_bucketed(spark, "bkt_a")
    agg = a.groupBy("channel").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    got = {r.channel: (r.lo, r.hi) for r in agg.collect()}
    want = {
        f"ch{c}": (float(c * 1000), float(c * 1000 + 199)) for c in range(6)
    }
    assert got == want


def test_unbucketed_same_join_does_shuffle(spark, bucketed_samples):
    """Control: the identical join over plain parquet DOES exchange —
    i.e. the bucketing metadata, not luck, removes the shuffle."""
    df = bucketed_samples
    b = df.select(
        "channel", F.col("ts").alias("ts_b"), F.col("value").alias("v_b")
    )
    j = df.join(b, ["channel"]).filter(
        (F.col("ts_b") >= F.col("ts")) & (F.col("ts_b") < F.col("ts") + 2000)
    )
    agg = j.groupBy("channel").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed_plan(agg)
    assert "Exchange hashpartitioning" in plan
