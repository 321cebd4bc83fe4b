"""Event (spike) summarization (A5, P2, W4).

The reference summarizes neural-unit event timestamps per pixel: it
chunks the sorted per-channel event stream and emits per chunk
``EventSummary(minTime, maxTime, minIndex, maxIndex, count)`` with
``avgTime = (minTime+maxTime)/2`` (query/WsClient.scala:39-49,131-139;
emitted at query/TimeSeriesUnitQueryRawHttp.scala:137).

Two bucketing flavors:
- **fixed** — aligned tumbling buckets of pixel_width µs. Pure
  groupBy; the scalable default and SQL-oracle-friendly.
- **data-driven** — reference-exact: a chunk starts at its first event
  and closes when an incoming event satisfies
  ``ts - chunk_first_ts >= pixel_width`` (PredicateStreamChunker +
  longEnough, query/WsClient.scala:114-129,
  chunker/PredicateStreamChunker.scala:47-64). Inherently sequential
  per channel → applyInPandas with a per-channel loop. Channels
  parallelize; within-channel is a recurrence, same as the reference.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def index_events(events: DataFrame, order_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """W4 — zipWithIndex equivalent: 0-based per-channel event index in
    ts order (query/WsClient.scala:115). Extra ``order_cols`` break ties
    deterministically when ts collides."""
    w = Window.partitionBy("channel").orderBy(*order_cols)
    return events.withColumn("idx", (F.row_number().over(w) - F.lit(1)).cast("long"))


def _summary_agg(df: DataFrame, *group_cols: str) -> DataFrame:
    return (
        df.groupBy(*group_cols)
        .agg(
            F.min("ts").alias("min_time"),
            F.max("ts").alias("max_time"),
            F.min("idx").alias("min_index"),
            F.max("idx").alias("max_index"),
            F.count(F.lit(1)).alias("count"),
        )
        # (min+max)/2 in Long arithmetic (EventSummary.avgTime,
        # query/WsClient.scala:49); expressed overflow-safely.
        .withColumn(
            "avg_time",
            F.col("min_time")
            + F.floor((F.col("max_time") - F.col("min_time")) / F.lit(2)).cast("long"),
        )
    )


def event_summary_fixed(
    events: DataFrame,
    start_us: int,
    end_us: int,
    pixel_width_us: int,
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Aligned tumbling-bucket event summary.

    Output: (channel, bucket, min_time, max_time, min_index, max_index,
    count, avg_time).
    """
    df = index_events(
        events.filter((F.col("ts") >= start_us) & (F.col("ts") <= end_us)),
        order_cols,
    ).withColumn(
        "bucket",
        F.floor((F.col("ts") - F.lit(start_us)) / F.lit(pixel_width_us)).cast("long"),
    )
    return _summary_agg(df, "channel", "bucket")


def event_summary_data_driven(
    events: DataFrame,
    start_us: int,
    end_us: int,
    pixel_width_us: int,
    order_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Reference-exact data-driven bucketing (A5 edge semantics).

    Chunk k starts at the first unassigned event t0; an event e joins
    the chunk while ``e.ts - t0 < pixel_width``; the event that reaches
    the threshold starts the next chunk (PredicateStreamChunker emits
    the buffer *before* appending the triggering element).

    ``order_cols`` defines the STREAM ORDER (both the zipWithIndex
    numbering and the chunk walk). The default ts order is the
    engine's canonical choice; pass a file-position column to replay
    the reference's exact file-order behavior (its source yields
    unsorted file order — WsClient.summaryFlow).
    """
    trimmed = index_events(
        events.filter((F.col("ts") >= start_us) & (F.col("ts") <= end_us)),
        order_cols,
    ).select("channel", "ts", "idx")

    def chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        # idx encodes the stream order chosen via order_cols
        pdf = pdf.sort_values(["idx"]).reset_index(drop=True)
        buckets = []
        bucket = -1
        chunk_start = None
        for t in pdf["ts"]:
            if chunk_start is None or t - chunk_start >= pixel_width_us:
                bucket += 1
                chunk_start = t
            buckets.append(bucket)
        pdf["bucket"] = buckets
        return pdf

    schema = "channel string, ts long, idx long, bucket long"
    chunked = trimmed.groupBy("channel").applyInPandas(chunk, schema=schema)
    return _summary_agg(chunked, "channel", "bucket")


def event_xcorr(
    events: DataFrame, max_lag_us: int, bin_us: int
) -> DataFrame:
    """Point-process cross-correlogram between event channels: for
    every channel pair (a < b), the histogram of time differences
    t_b - t_a for event pairs within ±``max_lag_us``, in ``bin_us``
    bins — the spike-train correlation analysis run downstream of the
    reference's NeuralPoint event streams (the reference serves the
    spike times; this computes the correlogram engine-side).

    All integer arithmetic: lag_bin = (t_b - t_a + L) div bin over
    [-L, L), exact counts. Output: (ch_a, ch_b, lag_bin, lag_lo_us, n)
    for non-empty bins; lag_lo_us = lag_bin*bin - L is the bin's left
    edge.

    Plan: bucketized interval join — each left event joins only the
    three L-width time buckets that can contain partners (explode ×3
    is narrow), so candidate volume is pair-density bounded, never
    |events|². Then one partial-agg groupBy to
    C(|channels|,2)×(2L/bin) rows.
    """
    L = int(max_lag_us)
    b = int(bin_us)
    left = events.select(
        F.col("channel").alias("ch_a"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.expr(f"array(ts div {L} - 1, ts div {L}, ts div {L} + 1)")
        ).alias("bk"),
    )
    right = events.select(
        F.col("channel").alias("ch_b"),
        F.col("ts").alias("ts_b"),
        F.expr(f"ts div {L}").alias("bk"),
    )
    pairs = (
        left.join(right, "bk")
        .filter(F.col("ch_a") < F.col("ch_b"))
        .withColumn("dt", F.col("ts_b") - F.col("ts_a"))
        .filter((F.col("dt") >= -L) & (F.col("dt") < L))
    )
    return (
        pairs.withColumn("lag_bin", F.expr(f"(dt + {L}) div {b}"))
        .groupBy("ch_a", "ch_b", "lag_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "ch_a",
            "ch_b",
            "lag_bin",
            (F.col("lag_bin") * b - L).alias("lag_lo_us"),
            "n",
        )
    )


def rate_bursts(
    events: DataFrame, bucket_us: int, z_threshold: float
) -> DataFrame:
    """Event-rate burst detection: per (channel, time bucket) counts
    scored against the channel's mean bucket rate under the Poisson
    approximation, z = (c - λ) / sqrt(λ) — the classic seizure-burst /
    traffic-spike screen over point-event feeds.

    λ = total/n_buckets uses the OBSERVED bucket span (first to last
    occupied bucket inclusive), so silence inside the span counts
    toward the baseline but leading/trailing void does not. Counts are
    exact integers; z is one fixed float expression, gated on its 9-dp
    rounding. Output: (channel, bucket_ts, n, z) for flagged buckets.

    Plan: one partial-agg groupBy to occupied (channel, bucket) rows,
    a |channels|-row baseline broadcast back — two scans of nothing
    but counter rows.
    """
    b = int(bucket_us)
    per_bucket = (
        events.select(
            "channel", F.expr(f"(ts div {b}) * {b}").alias("bucket_ts")
        )
        .groupBy("channel", "bucket_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    base = per_bucket.groupBy("channel").agg(
        F.sum("n").cast("long").alias("total"),
        (
            (F.max("bucket_ts") - F.min("bucket_ts")) / b + 1
        ).cast("long").alias("n_buckets"),
    )
    j = per_bucket.join(F.broadcast(base), "channel")
    lam = "CAST(total AS DOUBLE) / CAST(n_buckets AS DOUBLE)"
    z = f"(CAST(n AS DOUBLE) - {lam}) / sqrt({lam})"
    return (
        j.withColumn("z", F.expr(z))
        .filter(F.expr(f"round({z}, 9)") > float(z_threshold))
        .select("channel", "bucket_ts", "n", "z")
    )


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Shuffle-skew diagnostic for a prospective join/groupBy key: the
    top-k hottest key values with their absolute counts and share of
    all rows — the report you run BEFORE a 100 TB join to decide
    whether a key needs salting or AQE skew-split (one key holding >1%
    of a petabyte is a straggler task).

    Output: (key, n, share, rank) ordered hottest-first with
    deterministic (count desc, key) tie-break.

    Plan: one map-side-partial groupBy to |distinct keys| rows, a
    broadcast of the 1-row total, and a TakeOrderedAndProject top-k —
    the diagnostic never shuffles more than the key cardinality.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n"), "key")
        .limit(int(top_k))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), "key")
            ).cast("long"),
        )
    )


def event_autocorr(
    events: DataFrame, max_lag_us: int, bin_us: int
) -> DataFrame:
    """Point-process AUTOcorrelogram: for each channel, the histogram
    of time differences between its own event pairs within
    (0, ``max_lag_us``) — refractory-period and burst-rhythm structure
    of a single spike train (positive lags only; the correlogram is
    symmetric and the zero-lag self-pair is excluded by construction).

    Same bucketized interval join and exact integer bins as
    :func:`event_xcorr`. Output: (channel, lag_bin, lag_lo_us, n).

    Bin convention: lag_bin = (dt - 1) div bin_us, so bin k covers the
    half-open-on-the-LEFT interval (k·bin_us, (k+1)·bin_us] — dt equal
    to an exact bin boundary lands in the LOWER bin, and ``lag_lo_us``
    = k·bin_us is therefore an EXCLUSIVE left edge. (This differs from
    :func:`event_xcorr`, whose lag_lo_us is an inclusive left edge of
    [k·bin_us, (k+1)·bin_us); autocorr shifts by one because dt = 0 is
    excluded while dt = max_lag_us is included.)
    """
    L = int(max_lag_us)
    b = int(bin_us)
    left = events.select(
        F.col("channel"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.expr(f"array(ts div {L}, ts div {L} + 1)")
        ).alias("bk"),
    )
    right = events.select(
        "channel",
        F.col("ts").alias("ts_b"),
        F.expr(f"ts div {L}").alias("bk"),
    )
    pairs = (
        left.join(right, ["channel", "bk"])
        .withColumn("dt", F.col("ts_b") - F.col("ts_a"))
        .filter((F.col("dt") > 0) & (F.col("dt") <= L))
    )
    return (
        pairs.withColumn("lag_bin", F.expr(f"(dt - 1) div {b}"))
        .groupBy("channel", "lag_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "channel",
            "lag_bin",
            (F.col("lag_bin") * b).alias("lag_lo_us"),
            "n",
        )
    )


def event_triggered_average(
    samples: DataFrame,
    triggers: DataFrame,
    max_offset_us: int,
    bin_us: int,
    quant: int = 100,
) -> DataFrame:
    """Peri-event signal average — the evoked-response / PSTH operator
    of every EEG/ephys pipeline: for each trigger event, collect the
    signal's samples within ±``max_offset_us`` on the SAME channel,
    bucket them by offset from the trigger, and average per
    (channel, offset bin). A consistent deflection around offset 0 is
    the event-locked response; the reference serves the raw samples
    and the NeuralPoint event times separately and leaves exactly this
    computation to the client.

    ``triggers`` is (channel, ts); ``samples`` is (channel, ts,
    value). Offsets are sample_ts − trigger_ts in [−L, L), binned as
    ``(dt + L) div bin_us``.

    Determinism: integer offset binning; per-bin sums are exact
    BIGINT sums of ``round(value·quant)``; the mean is one fixed
    float expression rounded to 9 dp (value-scale magnitudes — ulp
    far below the rounding step).

    Output: (channel, off_bin, off_lo_us, n, mean_value) for
    non-empty bins.

    Plan (the event_xcorr bucketized-interval shape): each trigger
    explodes into the three L-width time buckets that can hold its
    window — candidate volume is density-bounded, never
    |triggers|×|samples|; then one partial-agg groupBy to
    |channels|×(2L/bin) rows.
    """
    L = int(max_offset_us)
    b = int(bin_us)
    q = int(quant)
    trig = triggers.select(
        "channel",
        F.col("ts").alias("ev_ts"),
        F.explode(
            F.expr(f"array(ts div {L} - 1, ts div {L}, ts div {L} + 1)")
        ).alias("bk"),
    )
    smp = samples.select(
        "channel",
        "ts",
        F.expr(f"CAST(round(value * {q}) AS BIGINT)").alias("xq"),
        F.expr(f"ts div {L}").alias("bk"),
    )
    j = (
        trig.join(smp, ["channel", "bk"])
        .withColumn("dt", F.col("ts") - F.col("ev_ts"))
        .filter((F.col("dt") >= -L) & (F.col("dt") < L))
    )
    return (
        j.withColumn("off_bin", F.expr(f"(dt + {L}) div {b}"))
        .groupBy("channel", "off_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xq").cast("long").alias("sxq"),
        )
        .select(
            "channel",
            "off_bin",
            (F.col("off_bin") * b - L).cast("long").alias("off_lo_us"),
            "n",
            F.expr(
                f"round(CAST(sxq AS DOUBLE) "
                f"/ (CAST(n AS DOUBLE) * {q}), 9)"
            ).alias("mean_value"),
        )
    )


def dispersion_index(events: DataFrame, bucket_us: int) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio, the Fano factor)
    of per-bucket event counts per channel — the one-number Poisson
    test: D ≈ 1 for a memoryless stream, D > 1 over-dispersed
    (bursty — :func:`operators.bursts.kleinberg_bursts` then finds
    WHERE), D < 1 under-dispersed (regular/refractory, the neural
    spike-train signature).

    Empty buckets inside the channel's span COUNT (they carry the
    zeros the variance needs); the bucket count is the closed-form
    span/bucket+1, so no bucket densify join is required:

        D = (B·Σn² − S²) / (B·S)

    over exact integers (B buckets, S total events, Σn² over
    non-empty buckets — empty ones add 0).

    Output: (channel, n_buckets, total, sum_sq, dispersion);
    channels with zero events in span drop out (S=0 undefined).

    Overflow envelope: Σn² ≤ S², so a single channel must stay under
    ~3e9 events for the BIGINT sum (the worst case is all events in
    one bucket) — widen sum_sq to DECIMAL(38,0)/HUGEINT (the
    power_spectrum pattern) for corpora beyond that.

    Plan: one map + two partial-agg groupBys down to |channels| rows.
    """
    b = int(bucket_us)
    per = (
        events.select(
            "channel", F.expr(f"ts div {b}").alias("bk")
        )
        .groupBy("channel", "bk")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    g = per.groupBy("channel").agg(
        (F.max("bk") - F.min("bk") + 1).cast("long").alias("n_buckets"),
        F.sum("n").cast("long").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_sq"),
    )
    return g.withColumn(
        "dispersion",
        F.expr(
            "round((CAST(n_buckets AS DOUBLE) * CAST(sum_sq AS DOUBLE) "
            "- CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) "
            "/ (CAST(n_buckets AS DOUBLE) * CAST(total AS DOUBLE)), 9)"
        ),
    )


def interarrival_ks(events: DataFrame, alpha_c: float = 1.358) -> DataFrame:
    """Kolmogorov-Smirnov goodness-of-fit of each channel's
    inter-arrival gaps against the exponential distribution with the
    channel's own rate λ = n/span — the distributional Poisson test
    completing the panel (``dispersion_index`` tests the second
    moment; this tests the whole CDF):

        D_n = max_i max( i/n − F(x_(i)),  F(x_(i)) − (i−1)/n ),
        F(x) = 1 − e^{−λx}

    with ``rejected`` = D_n > c/√n (c = 1.358 ≈ the α = 0.05
    asymptotic critical value; estimating λ from the data makes the
    test conservative — the standard Lilliefors caveat, documented).

    Determinism: gaps are exact µs integers; λ and every per-row
    D-term are fixed float expressions (terms rounded to 9 dp before
    the exact MAX selection); the rejection compares the rounded D
    against the fixed critical expression.

    Output: (channel, n, lam, ks_stat, rejected); channels with < 2
    gaps or zero span drop out.

    Plan: one lag window + one per-channel rank over the collapsed
    gap rows + a partial-agg rollup to |channels| rows.
    """
    w = Window.partitionBy("channel").orderBy("ts")
    gaps = (
        events.select("channel", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "channel",
            F.col("prev_ts").alias("a"),
            F.col("ts").alias("b"),
            (F.col("ts") - F.col("prev_ts")).alias("x"),
        )
    )
    params = (
        gaps.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.max("b") - F.min("a")).cast("long").alias("span"),
        )
        .filter((F.col("n") >= 2) & (F.col("span") > 0))
        .withColumn(
            "lam", F.expr("CAST(n AS DOUBLE) / CAST(span AS DOUBLE)")
        )
    )
    rw = Window.partitionBy("channel").orderBy("x", "b", "a")
    ranked = (
        gaps.join(F.broadcast(params), "channel")
        .withColumn("i", F.row_number().over(rw))
    )
    term = (
        "round(greatest("
        "CAST(i AS DOUBLE) / CAST(n AS DOUBLE) "
        "- (1.0D - exp(-lam * CAST(x AS DOUBLE))), "
        "(1.0D - exp(-lam * CAST(x AS DOUBLE))) "
        "- CAST(i - 1 AS DOUBLE) / CAST(n AS DOUBLE)), 9)"
    )
    g = (
        ranked.withColumn("d", F.expr(term))
        .groupBy("channel")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lam").alias("lam"),
            F.max("d").alias("ks_stat"),
        )
    )
    return g.withColumn(
        "rejected",
        F.expr(
            f"ks_stat > {float(alpha_c)!r} / sqrt(CAST(n AS DOUBLE))"
        ),
    )
