"""Gap-aware contiguous-span merging (A6) — classic sessionization.

Reference ``contig`` folds sorted (lo, hi) pairs, merging a pair into
the previous span when ``lo - prev_hi < threshold``
(query/TimeSeriesQueryUtils.scala:303-349; served by `/segments`,
server/SegmentService.scala:37-59). In Spark this is lag() + a running
sum of gap flags — one window pass per channel, no driver loop, and the
same shape works in Structured Streaming as ``session_window``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_gap_threshold(rate_hz: float, gap_multiple: float = 2.0) -> int:
    """floor((1e6/rate) * gapMultiple) — reference
    query/TimeSeriesQueryUtils.scala:333-335."""
    return int(math.floor((1e6 / rate_hz) * gap_multiple))


def samples_to_spans(samples: DataFrame) -> DataFrame:
    """Treat each sample as a point span (lo = hi = ts)."""
    return samples.select("channel", F.col("ts").alias("lo"), F.col("ts").alias("hi"))


def contiguous_spans(
    spans: DataFrame, threshold_us: int, block_us: int | None = None
) -> DataFrame:
    """Merge per-channel (lo, hi) spans whose gap is < threshold.

    A new span starts when ``lo - lag(hi) >= threshold`` (the reference
    merges on strict ``<``, keeps separate on ``>=`` —
    TimeSeriesQueryUtils.scala:316-321). Output:
    (channel, span_lo, span_hi, n_segments).

    ``block_us=None``: one window pass partitioned by channel — each
    channel's whole history routes through ONE task, fine when channel
    count >> cores. ``block_us=<µs>``: two-phase blocked sessionization
    for the 100 TB shape (few channels × billions of samples): phase 1
    sessionizes within (channel, time-block) — parallelism
    |channels|×|blocks| — phase 2 re-merges only across block
    boundaries on the phase-1 SPAN rows (orders of magnitude fewer).
    Identical output: block splitting only severs adjacent pairs, never
    joins them, and phase 2 re-evaluates exactly the severed pairs with
    the same rule.
    """
    if block_us is not None:
        blocked = spans.withColumn(
            "_blk", F.floor(F.col("lo") / F.lit(int(block_us)))
        )
        wb = Window.partitionBy("channel", "_blk").orderBy("lo", "hi")
        prev_hi_b = F.lag("hi").over(wb)
        new_b = F.when(
            prev_hi_b.isNull() | ((F.col("lo") - prev_hi_b) >= threshold_us), 1
        ).otherwise(0)
        phase1 = (
            blocked.withColumn(
                "_sid",
                F.sum(new_b).over(
                    wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("channel", "_blk", "_sid")
            .agg(
                F.min("lo").alias("lo"),
                F.max_by("hi", F.struct("lo", "hi")).alias("hi"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select("channel", "lo", "hi", "_n")
        )
        w2 = Window.partitionBy("channel").orderBy("lo", "hi")
        prev_hi2 = F.lag("hi").over(w2)
        new2 = F.when(
            prev_hi2.isNull() | ((F.col("lo") - prev_hi2) >= threshold_us), 1
        ).otherwise(0)
        return (
            phase1.withColumn(
                "_sid",
                F.sum(new2).over(
                    w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("channel", "_sid")
            .agg(
                F.min("lo").alias("span_lo"),
                F.max_by("hi", F.struct("lo", "hi")).alias("span_hi"),
                F.sum("_n").alias("n_segments"),
            )
            .drop("_sid")
        )

    w = Window.partitionBy("channel").orderBy("lo", "hi")
    prev_hi = F.lag("hi").over(w)
    new_span = F.when(
        prev_hi.isNull() | ((F.col("lo") - prev_hi) >= threshold_us), 1
    ).otherwise(0)
    df = spans.withColumn(
        "span_id",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        df.groupBy("channel", "span_id")
        .agg(
            F.min("lo").alias("span_lo"),
            F.max_by("hi", F.struct("lo", "hi")).alias("span_hi"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .drop("span_id")
    )


def number_sequentially(spans: DataFrame, order_col: str = "span_lo") -> DataFrame:
    """W2 sequence numbering: per-channel sequence id + total count
    (reference numberSequentially, server/TSJsonSupport.scala:106-107 —
    page requests are numbered so the client can track progress)."""
    w = Window.partitionBy("channel").orderBy(order_col)
    wc = Window.partitionBy("channel")
    return spans.withColumn(
        "sequence_id", (F.row_number().over(w) - F.lit(1)).cast("long")
    ).withColumn("total_requests", F.count(F.lit(1)).over(wc))


def flatline_runs(
    samples: DataFrame, min_run: int = 3
) -> DataFrame:
    """Stuck-sensor detection: maximal runs of >= ``min_run``
    consecutive IDENTICAL values per channel — the railed-electrode /
    frozen-transducer QC screen (a healthy physical signal never
    repeats exactly; a DC-railed or disconnected one does nothing
    else).

    Runs are maximal in (ts, value) order: a run starts where the
    value differs from its predecessor (lag + cumulative-flag
    sessionization, the `contiguous_spans` technique keyed on value
    changes instead of time gaps). Output: (channel, value, run_start,
    run_end, run_len) for qualifying runs — all exact.

    Plan: one per-channel window pass + a groupBy on the derived run
    key; parallelism |channels|, blocked two-phase split applies as in
    `contiguous_spans` for single-channel deep histories.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("channel").orderBy("ts", "value")
    flagged = samples.select("channel", "ts", "value").withColumn(
        "new_run",
        F.when(
            F.lag("value").over(w).isNull()
            | (F.lag("value").over(w) != F.col("value")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    keyed = flagged.withColumn(
        "run",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        keyed.groupBy("channel", "run")
        .agg(
            F.min("value").alias("value"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .filter(F.col("run_len") >= int(min_run))
        .select("channel", "value", "run_start", "run_end", "run_len")
    )


DAY_US = 86_400_000_000


def coverage_panel(samples: DataFrame, period_us: int = 100_000) -> DataFrame:
    """Per-channel ingest-completeness panel — the data-quality
    readout an acquisition pipeline publishes per channel: calendar
    coverage (active days / extent days), sample fill against the
    nominal rate, and the worst calendar outage. Complements
    gap_spans (which lists the gaps) with the rolled-up health
    number a dashboard ranks channels by.

    ``period_us``: nominal sample period in exact integer µs (100 ms
    at the derived 10 Hz rate), so the expected count over the extent
    is pure integer arithmetic: (end − start) div period + 1.

    Determinism: day indexes and counts are exact integers; both
    ratios are single fixed divisions rounded to 9 dp.

    Output: (channel, start_day, end_day, span_days, active_days,
    day_coverage, n_samples, expected_samples, fill_ratio,
    max_outage_days) — one row per channel; max_outage_days = longest
    run of fully-empty calendar days strictly inside the extent.

    Plan / 100 TB: one partial-agg distinct on (channel, day) — the
    shuffle carries at most channels × days rows — one per-channel
    lag window over those day rows, and one per-channel scan agg;
    the two 1-row-per-channel sides meet in a broadcast join.
    """
    base = samples.select(
        "channel", "ts", F.expr(f"ts div {DAY_US}").alias("_day")
    )
    per_chan = base.groupBy("channel").agg(
        F.min("ts").alias("_start_ts"),
        F.max("ts").alias("_end_ts"),
        F.count(F.lit(1)).cast("long").alias("n_samples"),
    )
    w = Window.partitionBy("channel").orderBy("_day")
    days = (
        base.select("channel", "_day")
        .distinct()
        .withColumn("_prev", F.lag("_day").over(w))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_days"),
            F.max(
                F.expr(
                    "CASE WHEN _prev IS NULL THEN 0 "
                    "ELSE _day - _prev - 1 END"
                )
            )
            .cast("long")
            .alias("max_outage_days"),
        )
    )
    return per_chan.join(F.broadcast(days), "channel").select(
        "channel",
        F.expr(f"_start_ts div {DAY_US}").cast("long").alias(
            "start_day"
        ),
        F.expr(f"_end_ts div {DAY_US}").cast("long").alias("end_day"),
        F.expr(
            f"_end_ts div {DAY_US} - _start_ts div {DAY_US} + 1"
        )
        .cast("long")
        .alias("span_days"),
        "active_days",
        F.expr(
            f"round(active_days / CAST(_end_ts div {DAY_US} "
            f"- _start_ts div {DAY_US} + 1 AS DOUBLE), 9)"
        ).alias("day_coverage"),
        "n_samples",
        F.expr(f"(_end_ts - _start_ts) div {int(period_us)} + 1")
        .cast("long")
        .alias("expected_samples"),
        F.expr(
            f"round(n_samples / CAST((_end_ts - _start_ts) "
            f"div {int(period_us)} + 1 AS DOUBLE), 9)"
        ).alias("fill_ratio"),
        "max_outage_days",
    )


def rate_estimate(
    samples: DataFrame, nominal_hz: float = 10.0, tol: float = 0.05
) -> DataFrame:
    """Per-channel empirical sample-rate estimate from the
    inter-sample gap distribution — the ingest sanity check that the
    data actually arrives at the rate the catalog claims (a mislabeled
    rate silently corrupts every downstream gap threshold, resample
    ratio and expected-count fill metric). Reports the gap order
    statistics, the rate implied by the median gap, timing jitter
    (p90 − p10), and a tolerance flag against the nominal rate.

    Determinism: gaps are exact BIGINT µs diffs over the (ts, value)
    total order; the p10 / median (lower) / p90 picks are INTEGER
    percentile_disc ranks over the (gap, ordinal) total order;
    est_rate_hz is ONE fixed division rounded to 9 dp and the flag
    compares that rounded value.

    Output: (channel, n_gaps, p10_gap_us, median_gap_us, p90_gap_us,
    jitter_us, est_rate_hz, rate_ok); channels with < 2 samples drop
    (no gaps to estimate from).

    Plan / 100 TB: one lag window per channel, one rank window over
    GAP rows, one 1-row-per-channel rank-pick agg meeting the count
    side in a broadcast join.
    """
    w = Window.partitionBy("channel").orderBy("ts", "value")
    gaps = (
        samples.select("channel", "ts", "value")
        .withColumn("_prev", F.lag("ts").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "channel",
            F.expr("ts - _prev").cast("long").alias("gap"),
            "ts",
            "value",
        )
    )
    rw = Window.partitionBy("channel").orderBy("gap", "ts", "value")
    ranked = gaps.select(
        "channel", "gap", F.row_number().over(rw).alias("_rk")
    )
    n_per = gaps.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps")
    )
    k10 = "((1 * n_gaps + 9) div 10)"
    kmed = "((n_gaps + 1) div 2)"
    k90 = "((9 * n_gaps + 9) div 10)"
    g = (
        ranked.join(F.broadcast(n_per), "channel")
        .groupBy("channel")
        .agg(
            F.max("n_gaps").alias("n_gaps"),
            F.max(F.expr(f"CASE WHEN _rk = {k10} THEN gap END"))
            .cast("long")
            .alias("p10_gap_us"),
            F.max(F.expr(f"CASE WHEN _rk = {kmed} THEN gap END"))
            .cast("long")
            .alias("median_gap_us"),
            F.max(F.expr(f"CASE WHEN _rk = {k90} THEN gap END"))
            .cast("long")
            .alias("p90_gap_us"),
        )
    )
    est = (
        "CASE WHEN median_gap_us > 0 THEN "
        "round(1000000e0 / CAST(median_gap_us AS DOUBLE), 9) "
        "ELSE 0e0 END"
    )
    return g.select(
        "channel",
        "n_gaps",
        "p10_gap_us",
        "median_gap_us",
        "p90_gap_us",
        F.expr("p90_gap_us - p10_gap_us").cast("long").alias(
            "jitter_us"
        ),
        F.expr(est).alias("est_rate_hz"),
        F.expr(
            f"abs(({est}) - {float(nominal_hz)!r}D) "
            f"<= {float(tol)!r}D * {float(nominal_hz)!r}D"
        ).alias("rate_ok"),
    )
