"""Materialized-layout tests: partition pruning and predicate pushdown
must actually show up in the physical plan."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.ingest import (
    materialize_samples,
    pruned_channel_scan,
    read_samples,
)


@pytest.fixture(scope="module")
def layout_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="samples_layout_")
    samples = TBL.samples_view(spark, sf_dir)
    materialize_samples(samples, d, n_buckets=8)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_roundtrip_preserves_rows(spark, sf_dir, layout_dir):
    orig = TBL.samples_view(spark, sf_dir)
    back = read_samples(spark, layout_dir)
    assert back.count() == orig.count()
    a = sorted([tuple(r) for r in orig.collect()])
    b = sorted([tuple(r) for r in back.select("channel", "ts", "value").collect()])
    assert a == b


def test_pruned_scan_plan(spark, layout_dir):
    df = pruned_channel_scan(spark, layout_dir, "ch3", 0, 10**18)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition pruning on channel_bucket
    assert "PartitionFilters: [" in plan
    assert "channel_bucket" in plan.split("PartitionFilters:")[1][:200]
    # ts/channel predicates pushed to the parquet reader
    pushed = plan.split("PushedFilters:")[1][:300]
    assert "GreaterThanOrEqual(ts" in pushed or "ts" in pushed
    assert "EqualTo(channel" in pushed


def test_pruned_scan_reads_one_partition(spark, layout_dir):
    full = spark.read.parquet(layout_dir)
    n_buckets = full.select("channel_bucket").distinct().count()
    assert 1 <= n_buckets <= 8  # 8 channels may collide into fewer buckets
    df = pruned_channel_scan(spark, layout_dir, "ch3", 0, 10**18)
    # correctness: identical result to the unpruned filter
    want = full.filter("channel = 'ch3'").count()
    assert df.count() == want


def test_bucketed_montage_join_is_exchange_free(spark, tmp_path):
    """J1 co-location: over the ts-bucketed samples table, the montage
    self-join on ts runs without any shuffle exchange — the zip-like
    sort-merge join the layout is designed for."""
    from pennsieve_streaming_spark.ingest import materialize_samples_bucketed
    from pennsieve_streaming_spark.operators.montage import montage_two_channels

    rows = [(ch, i * 1_000_000, float(i + (1 if ch == "lead" else 0)))
            for ch in ("lead", "sec") for i in range(2000)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    materialize_samples_bucketed(
        df, "samples_bucketed_t", str(tmp_path / "bkt"), n_buckets=4
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at 100 TB neither montage side is broadcastable; force the
        # at-scale sort-merge shape so bucketing is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        tbl = spark.table("samples_bucketed_t")
        out = montage_two_channels(tbl, "lead", "sec")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        got = out.orderBy("ts").limit(3).collect()
        assert [r["value"] for r in got] == [1.0, 1.0, 1.0]
        assert out.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS samples_bucketed_t")
