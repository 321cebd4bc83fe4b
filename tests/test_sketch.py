"""HyperLogLog + KMV distinct-count sketches (llm/sketch.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pennsieve_streaming_spark.llm.sketch import hll_distinct, kmv_distinct


def _values(spark, n, prefix="value-"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("s")
    )


def test_hll_large_range_accuracy(spark):
    # m=256 -> relative error ~1.04/sqrt(256) = 6.5%; allow 3 sigma.
    n = 5000
    row = hll_distinct(_values(spark, n), "s", p=8).collect()[0]
    assert row.m == 256
    assert abs(row.estimate - n) / n < 0.20
    # raw == corrected in the large range (no linear counting)
    assert row.estimate == row.raw_estimate


def test_hll_small_range_linear_counting(spark):
    n = 20
    row = hll_distinct(_values(spark, n), "s", p=8).collect()[0]
    assert row.zero_buckets >= 256 - n
    # linear counting is near-exact at n << m
    assert abs(row.estimate - n) < 2


def test_hll_duplicates_do_not_inflate(spark):
    base = _values(spark, 100)
    dup = base.union(base).union(base)
    a = hll_distinct(base, "s", p=8).collect()[0]
    b = hll_distinct(dup, "s", p=8).collect()[0]
    assert a.estimate == b.estimate


def test_hll_deterministic_across_partitionings(spark):
    df1 = _values(spark, 3000).repartition(1)
    df32 = _values(spark, 3000).repartition(32)
    a = hll_distinct(df1, "s", p=8).collect()[0]
    b = hll_distinct(df32, "s", p=8).collect()[0]
    assert a == b


def test_kmv_accuracy_and_exact_small(spark):
    n = 5000
    row = kmv_distinct(_values(spark, n), "s", k=64).collect()[0]
    # k=64 -> sigma ~ 1/sqrt(62) = 12.7%; allow 3 sigma
    assert abs(row.estimate - n) / n < 0.4
    assert row.n_seen == 64
    # below k the sketch IS the exact count
    exact = kmv_distinct(_values(spark, 30), "s", k=64).collect()[0]
    assert exact.n_seen == 30 and exact.estimate == 30.0


def test_kmv_duplicates_do_not_inflate(spark):
    base = _values(spark, 500)
    dup = base.union(base)
    a = kmv_distinct(base, "s", k=32).collect()[0]
    b = kmv_distinct(dup, "s", k=32).collect()[0]
    assert a == b


def test_sketches_empty_input(spark):
    import pyspark.sql.functions as F

    empty = spark.range(0).select(F.col("id").cast("string").alias("s"))
    h = hll_distinct(empty, "s", p=8).collect()[0]
    assert h.zero_buckets == 256 and h.estimate == 0.0
    k = kmv_distinct(empty, "s", k=8).collect()[0]
    assert k.n_seen == 0 and k.kth_min is None and k.estimate == 0.0


def test_hll_merge_equals_combined(spark):
    """Sharded sketches merged per-bucket must estimate EXACTLY what a
    single sketch over the union estimates — HLL's mergeability, the
    property that lets per-day/per-shard sketches roll up."""
    from pennsieve_streaming_spark.llm.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = _values(spark, 2000)                      # value-0..1999
    b = _values(spark, 3000, prefix="other-")     # disjoint
    c = _values(spark, 2000)                      # duplicates of a
    combined = a.union(b).union(c)
    merged = hll_merge(
        hll_registers(a, "s"), hll_registers(b, "s"), hll_registers(c, "s")
    )
    one_shot = hll_distinct(combined, "s", p=8).collect()[0]
    via_merge = hll_estimate(merged, p=8).collect()[0]
    assert via_merge == one_shot
    # and hll_distinct is itself registers + estimate
    direct = hll_estimate(hll_registers(combined, "s"), p=8).collect()[0]
    assert direct == one_shot


def test_hll_by_source_groups_independent(spark):
    """Grouped HLL: each group's estimate equals the single-sketch
    estimate over that group alone."""
    from pennsieve_streaming_spark.llm.sketch import hll_distinct_by
    import pyspark.sql.functions as F

    a = _values(spark, 1500).withColumn("g", F.lit("ga"))
    b = _values(spark, 40, prefix="x-").withColumn("g", F.lit("gb"))
    both = a.union(b)
    grouped = {
        r.g: (r.zero_buckets, r.raw_estimate, r.estimate)
        for r in hll_distinct_by(both, "g", "s", p=8).collect()
    }
    for name, df in (("ga", a), ("gb", b)):
        solo = hll_distinct(df, "s", p=8).collect()[0]
        assert grouped[name] == (
            solo.zero_buckets, solo.raw_estimate, solo.estimate
        ), name
