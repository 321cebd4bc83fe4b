"""Scale smoke: the core operators over 10M synthesized rows.

Not a micro-benchmark (the box is shared; wall-time asserts would
flake) — this proves the plans EXECUTE at 100× the usual test
cardinality with bounded shuffles and that aggregate invariants hold
exactly. Run time ~30-60 s on local[32].
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 10_000_000
CHANNELS = 64


@pytest.fixture(scope="module")
def big_samples(spark):
    # 64 channels x ~156k samples each, 1 kHz spacing, sawtooth values
    return (
        spark.range(N)
        .select(
            F.concat(F.lit("ch"), (F.col("id") % CHANNELS).cast("string")).alias(
                "channel"
            ),
            ((F.col("id") / CHANNELS).cast("long") * 1000).alias("ts"),
            (F.col("id") % 1013).cast("double").alias("value"),
        )
    )


def test_downsample_10m(spark, big_samples):
    per_chan = N // CHANNELS  # samples per channel
    span_us = per_chan * 1000
    bucket_us = span_us // 100
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_minmax_time,
    )

    out = downsample_minmax_time(big_samples, 0, span_us, bucket_us)
    rows = out.collect()
    assert len(rows) == CHANNELS * 100
    # bucket populations differ by at most 1 (1562/1563: the 1000-µs
    # grid doesn't divide the bucket evenly) and sum exactly per channel
    assert all(r.n_samples in (1562, 1563) for r in rows)
    per = {}
    for r in rows:
        per[r.channel] = per.get(r.channel, 0) + r.n_samples
    assert all(v == per_chan for v in per.values())
    # min/max bounded by the sawtooth modulus
    assert all(0.0 <= r.min_val <= r.max_val <= 1012.0 for r in rows)


def test_gap_spans_10m(spark, big_samples):
    """Inject one gap per channel; sessionization must find exactly 2
    spans per channel over 10M rows."""
    from pennsieve_streaming_spark.operators.gaps import contiguous_spans
    from pennsieve_streaming_spark.operators.gaps import samples_to_spans

    shifted = big_samples.withColumn(
        "ts",
        F.when(
            F.col("ts") >= 50_000_000, F.col("ts") + F.lit(10_000_000)
        ).otherwise(F.col("ts")),
    )
    spans = contiguous_spans(
        samples_to_spans(shifted), threshold_us=5_000_000
    ).collect()
    assert len(spans) == CHANNELS * 2
    per_chan = {}
    for r in spans:
        per_chan.setdefault(r.channel, []).append(r)
    assert all(len(v) == 2 for v in per_chan.values())
    assert all(
        sum(r.n_segments for r in v) == N // CHANNELS for v in per_chan.values()
    )


def test_exact_dedup_10m_docs(spark):
    """1M short docs with 100k distinct texts: digest dedup keeps
    exactly the distinct count; text never shuffles (digest groupBy)."""
    from pennsieve_streaming_spark.llm.dedup import exact_dedup

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text nr "), (F.col("id") % 100_000).cast("string")).alias(
            "text"
        ),
    )
    out = exact_dedup(docs)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dup_count").alias("total"),
    ).collect()[0]
    assert agg.n == 100_000
    assert agg.total == 1_000_000


def test_substring_dup_2m_docs(spark):
    """duplicated_span_stats at 2M short docs: the 8-gram explode is
    the heaviest map in the new dedup surface (k-fold row growth);
    every odd doc duplicates doc-1's text, so exactly the duplicated
    half carries full coverage."""
    from pennsieve_streaming_spark.llm.dedup import duplicated_span_stats

    n = 2_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 1,
            F.lit("alpha beta gamma delta epsilon zeta eta theta"),
        )
        .otherwise(
            F.concat(
                F.lit("unique"),
                F.col("id").cast("string"),
                F.lit(" beta gamma delta epsilon zeta eta theta"),
            )
        )
        .alias("text"),
    )
    out = duplicated_span_stats(docs, k=8)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("dup_fraction") == 1.0, 1).otherwise(0)).alias("full"),
    ).collect()[0]
    assert agg.n == n
    # every odd doc is one shared text: full coverage for all of them
    assert agg.full == n // 2


def test_hll_kmv_10m_values(spark):
    """Sketches over 10M values with 1M distinct: estimates inside
    loose 3-sigma bands, state stays constant-size."""
    from pennsieve_streaming_spark.llm.sketch import hll_distinct, kmv_distinct

    df = spark.range(10_000_000).select(
        F.concat(F.lit("v"), (F.col("id") % 1_000_000).cast("string")).alias("s")
    )
    hll = hll_distinct(df, "s", p=8).collect()[0]
    assert abs(hll.estimate - 1_000_000) / 1_000_000 < 0.25
    kmv = kmv_distinct(df, "s", k=64).collect()[0]
    assert abs(kmv.estimate - 1_000_000) / 1_000_000 < 0.5


def test_locf_grid_10m(spark, big_samples):
    """LOCF over a 2.6M-point distributed grid (64 channels): the
    sliced grid generation plus the union-window pass execute at
    scale; every grid point lands on a sample or carries one forward
    exactly (ts spacing is regular, so fill values are reconstructable
    in closed form)."""
    from pennsieve_streaming_spark.operators.align import (
        asof_locf,
        channel_grid,
    )

    per_chan = N // CHANNELS
    span_us = per_chan * 1000
    ch = (
        big_samples.groupBy("channel")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    grid = channel_grid(ch, span_us // 40_000, slice_points=4096)
    out = asof_locf(big_samples, grid)
    n_grid = grid.count()
    assert n_grid >= 40_000 * CHANNELS
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nulls"),
        F.max("stale_us").alias("max_stale"),
    ).collect()[0]
    assert got.n == n_grid and got.nulls == 0
    # regular 1000-µs spacing: no fill can be staler than one step
    assert got.max_stale < 1000


def test_span_point_join_1m_points(spark):
    """Bucketized interval join at 1M points x 10k spans — the
    equi-join on buckets keeps this tractable (an all-pairs plan would
    be 1e10 comparisons)."""
    from pennsieve_streaming_spark.operators.align import span_point_join

    spans = spark.range(10_000).select(
        F.lit("s").alias("channel"),
        (F.col("id") * 100_000).alias("span_lo"),
        (F.col("id") * 100_000 + 49_999).alias("span_hi"),
    )
    pts = spark.range(1_000_000).select(
        F.lit("p").alias("channel"),
        F.col("id").alias("ts"),
        F.lit(1.0).alias("value"),
    )
    out = span_point_join(spans, pts, 50_000)
    got = out.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n_points").alias("pts")
    ).collect()[0]
    assert got.rows == 10_000
    # spans cover [k*1e5, k*1e5+49999]: the first 10 spans hold all
    # 1M points' overlap = 10 spans x 50k points each
    assert got.pts == 10 * 50_000


def test_event_xcorr_1m_events(spark):
    """Bucketized correlogram over 1M events × 4 channels: candidate
    volume stays pair-density bounded (the plan never goes cartesian)
    and total pair counts match the closed form on a uniform grid."""
    from pennsieve_streaming_spark.operators.events import event_xcorr

    n = 1_000_000
    ev = spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 4).cast("string")).alias("channel"),
        ((F.col("id") / 4).cast("long") * 100).alias("ts"),
    )
    out = event_xcorr(ev, max_lag_us=1000, bin_us=200)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = out.collect()
    # 6 channel pairs x 10 bins, all occupied on the uniform grid
    assert len(rows) == 60
    total_pairs = sum(r.n for r in rows)
    # each of 250k grid ticks contributes ~20 in-window partners per
    # ordered pair of distinct channels (edge ticks a few less)
    assert 0.95 * 6 * 250_000 * 19 < total_pairs < 6 * 250_000 * 20


def test_pagerank_200k_edges(spark):
    """PageRank over a 200k-edge ring+chords graph: 3 iterations
    complete, mass conserved within integer-floor leakage."""
    from pennsieve_streaming_spark.llm.graph import pagerank

    n = 100_000
    docs = spark.range(n).withColumnRenamed("id", "doc_id")
    ring = spark.range(n).select(
        F.col("id").alias("doc_a"),
        ((F.col("id") + 1) % n).alias("doc_b"),
    )
    chords = spark.range(n).select(
        F.col("id").alias("doc_a"),
        ((F.col("id") * 7919 + 13) % n).alias("doc_b"),
    )
    pr = pagerank(docs, ring.union(chords), n_iter=3)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert 0.98 < total <= 1.0 + 1e-9


def test_global_rank_matches_single_task_window(spark):
    """util.global_rank must be bit-identical to the single-task
    Window.orderBy row_number under a total order — including with
    heavy duplication in the primary sort key — while running as a
    range-partitioned parallel plan."""
    from pyspark.sql import Window

    from pennsieve_streaming_spark.util import global_rank

    df = spark.range(100_000).selectExpr(
        "id", "id % 97 AS c", "concat('t', id) AS t"
    )
    order = [F.desc("c"), "t"]
    want = {
        (r.id, r.rk)
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        (r.id, r.rank)
        for r in global_rank(df, order, num_partitions=16).collect()
    }
    assert got == want


def test_global_rank_empty_and_tiny(spark):
    from pennsieve_streaming_spark.util import global_rank

    empty = spark.range(0).selectExpr("id AS c")
    assert global_rank(empty, ["c"]).count() == 0
    one = global_rank(spark.range(1).selectExpr("id AS c"), ["c"]).collect()
    assert one[0].rank == 1
