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
