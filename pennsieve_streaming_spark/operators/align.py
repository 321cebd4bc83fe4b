"""Time-alignment operators: uniform grids, as-of (LOCF) fill, linear
interpolation, and the bucketized interval (range) join.

Not literal reference operators — the reference resamples by min/max
bucketing only (query/TimeSeriesQueryUtils.scala resample paths) — but
every downstream consumer of an EEG store re-grids irregular samples
before analysis (TimescaleDB ``locf``/``interpolate``, InfluxDB
``fill(previous)``/``fill(linear)`` are the public prior art). These
are the Spark-first forms:

- **Grid**: per-channel uniform timestamps generated distributedly
  (sliced ``sequence`` + ``explode`` — no driver loop, bounded array
  size per row, so a 10-year 1 kHz grid never materializes one giant
  array).
- **As-of / LOCF**: the union-window trick — grid points and samples
  union into ONE per-channel ordered window pass where
  ``last_value(... IGNORE NULLS)`` carries the most recent sample
  forward. One shuffle on (channel), no join, no UDF. This is also a
  general as-of join: "latest right-side row at-or-before each left
  timestamp".
- **Linear interpolation**: same single pass, plus
  ``first_value IGNORE NULLS`` over the following frame for the next
  sample; the lerp is one fixed float expression (identical text on
  both engines ⇒ bit-identical output, each IEEE op is correctly
  rounded — no folds, so no association-order hazard).
- **Range join**: spans × points by time-bucket equi-join + residual
  BETWEEN filter — the standard scale-safe interval join (never a
  cartesian; each (span, point) pair meets in exactly one bucket
  because the point has one bucket and the span explodes each covered
  bucket once).

Determinism contract (cross-engine oracle parity): window order is
``(ts, is_grid, value)`` — samples sort before the grid point at the
same timestamp (so LOCF at an exact hit returns that sample), and
duplicate-timestamp samples resolve by value, so "which sample wins a
tie" is pinned on both engines. Point-value sums in the range join are
1e-6-quantized BIGINTs (associative ⇒ partition-order independent),
the same contract as operators/rolling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 value quantum for exact sums (rolling.py contract)

# max grid points emitted per exploded array row — bounds task memory
# at scale (a channel's grid is sliced into ceil(n/SLICE) arrays)
GRID_SLICE = 65_536


def channel_grid(
    channels: DataFrame, interval_us: int, slice_points: int = GRID_SLICE
) -> DataFrame:
    """Uniform per-channel timestamp grid: ``start_ts + k*interval`` for
    ``k = 0 .. floor((end_ts - start_ts)/interval)``.

    ``channels`` needs (channel, start_ts, end_ts). Generation is
    distributed and sliced: each row first explodes into grid *slices*
    of at most ``slice_points`` points, then each slice explodes its own
    bounded ``sequence`` — so no single array row ever holds a whole
    channel's grid (a 100 TB-scale guard; both explodes are narrow).
    """
    iv = int(interval_us)
    sp = int(slice_points)
    n = (F.floor((F.col("end_ts") - F.col("start_ts")) / iv) + 1).alias("_n")
    sliced = channels.select(
        "channel", "start_ts", n
    ).withColumn(
        "_slice", F.explode(F.sequence(F.lit(0), ((F.col("_n") - 1) / sp).cast("long")))
    )
    k_lo = F.col("_slice") * sp
    k_hi = F.least(F.col("_n") - 1, (F.col("_slice") + 1) * sp - 1)
    return sliced.select(
        "channel", "start_ts", F.explode(F.sequence(k_lo, k_hi)).alias("_k")
    ).select(
        "channel",
        (F.col("start_ts") + F.col("_k") * F.lit(iv)).alias("ts"),
    )


def _union_grid_samples(samples: DataFrame, grid: DataFrame) -> DataFrame:
    s = samples.select(
        "channel", "ts", "value", F.lit(0).alias("is_grid")
    )
    g = grid.select(
        "channel",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_grid"),
    )
    return s.unionByName(g)


def asof_locf(samples: DataFrame, grid: DataFrame) -> DataFrame:
    """Last-observation-carried-forward fill of ``grid`` timestamps from
    ``samples`` — equivalently, an as-of backward join of grid onto
    samples per channel.

    Output: (channel, ts, value, src_ts, stale_us) — ``value``/``src_ts``
    are NULL for grid points before a channel's first sample;
    ``stale_us = ts - src_ts`` is the fill age.

    Plan: ONE window pass per channel over the unioned rows (no join).
    At production channel counts the (channel) partitioning parallelizes
    fully; for few-channels × deep-history, pre-split on time blocks
    with a one-sample halo (the rolling.py blocked-halo pattern applies
    verbatim since LOCF lookback is exactly one preceding sample).
    """
    w = (
        Window.partitionBy("channel")
        .orderBy("ts", "is_grid", "value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = _union_grid_samples(samples, grid)
    src_ts = F.when(F.col("is_grid") == 0, F.col("ts"))
    return (
        u.withColumn("_fill", F.last("value", ignorenulls=True).over(w))
        .withColumn("_src", F.last(src_ts, ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select(
            "channel",
            "ts",
            F.col("_fill").alias("value"),
            F.col("_src").alias("src_ts"),
            (F.col("ts") - F.col("_src")).alias("stale_us"),
        )
    )


def interp_resample(samples: DataFrame, grid: DataFrame) -> DataFrame:
    """Linear interpolation of ``samples`` onto ``grid`` timestamps.

    For each grid point: ``prev`` = latest sample at-or-before, ``next``
    = earliest sample strictly after (in window order). Value:

    - exact hit (``prev_ts == ts``) → that sample's value;
    - both neighbors → ``prev_v + (next_v - prev_v) * (ts - prev_ts)
      / (next_ts - prev_ts)`` (fixed expression, bit-identical across
      engines);
    - boundary (missing neighbor, no exact hit) → row dropped (the
      value is undefined; LOCF is the edge-tolerant variant). A
      missing ``next_ts`` on an exact-hit row reports as -1 so the
      output is NULL-free (hashable/sortable row contract).

    Same single per-channel window pass as :func:`asof_locf`.
    """
    ob = ["ts", "is_grid", "value"]
    wp = (
        Window.partitionBy("channel")
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("channel")
        .orderBy(*ob)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = _union_grid_samples(samples, grid)
    sample_ts = F.when(F.col("is_grid") == 0, F.col("ts"))
    out = (
        u.withColumn("prev_v", F.last("value", ignorenulls=True).over(wp))
        .withColumn("prev_ts", F.last(sample_ts, ignorenulls=True).over(wp))
        .withColumn("next_v", F.first("value", ignorenulls=True).over(wn))
        .withColumn("next_ts", F.first(sample_ts, ignorenulls=True).over(wn))
        .filter(F.col("is_grid") == 1)
    )
    lerp = F.expr(
        "prev_v + (next_v - prev_v) * "
        "(CAST(ts - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE))"
    )
    value = (
        F.when(F.col("prev_ts") == F.col("ts"), F.col("prev_v"))
        .when(F.col("prev_ts").isNotNull() & F.col("next_ts").isNotNull(), lerp)
        .otherwise(F.lit(None).cast("double"))
    )
    return (
        out.select(
            "channel",
            "ts",
            value.alias("value"),
            "prev_ts",
            F.coalesce(F.col("next_ts"), F.lit(-1)).alias("next_ts"),
        )
        .filter(F.col("value").isNotNull())
    )


def span_point_join(
    spans: DataFrame, points: DataFrame, bucket_us: int
) -> DataFrame:
    """Interval join: for each span, aggregate the points whose ``ts``
    falls in ``[span_lo, span_hi]`` (bounds inclusive, matching the
    reference's inclusive span semantics in contiguous_spans).

    ``spans``: (channel, span_lo, span_hi) — channel renamed to
    ``span_channel`` in the output; ``points``: (channel, ts, value),
    joined regardless of channel (the use-case is "which error events
    fall inside each click session").

    Output: (span_channel, span_lo, span_hi, n_points, first_pt_ts,
    last_pt_ts, sum_value_q) — empty spans kept with n_points = 0,
    sum 0 and -1 extremes (NULL-free row contract); ``sum_value_q`` is
    the exact BIGINT 1e-6-quantized value sum.

    Plan (100 TB-safe): spans explode to the time buckets they cover,
    points map to their one bucket, equi-join on bucket + residual
    BETWEEN — each (span, point) pair meets exactly once, never a
    cartesian. Pick ``bucket_us`` ≳ median span length so the explode
    factor stays ~2; AQE handles residual bucket skew.
    """
    b = int(bucket_us)
    sp = spans.select(
        F.col("channel").alias("span_channel"), "span_lo", "span_hi"
    )
    sp_b = sp.withColumn(
        "_blk",
        F.explode(
            F.sequence(F.floor(F.col("span_lo") / b), F.floor(F.col("span_hi") / b))
        ),
    )
    pt = points.select(
        F.floor(F.col("ts") / b).alias("_blk"),
        F.col("ts").alias("pt_ts"),
        F.expr(f"CAST(round(value * {QUANT}) AS BIGINT)").alias("_q"),
    )
    hits = (
        sp_b.join(pt, "_blk")
        .filter(
            (F.col("pt_ts") >= F.col("span_lo"))
            & (F.col("pt_ts") <= F.col("span_hi"))
        )
        .groupBy("span_channel", "span_lo", "span_hi")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("pt_ts").alias("first_pt_ts"),
            F.max("pt_ts").alias("last_pt_ts"),
            F.sum("_q").cast("long").alias("sum_value_q"),
        )
    )
    return (
        sp.join(hits, ["span_channel", "span_lo", "span_hi"], "left")
        .select(
            "span_channel",
            "span_lo",
            "span_hi",
            F.coalesce(F.col("n_points"), F.lit(0)).cast("long").alias("n_points"),
            F.coalesce(F.col("first_pt_ts"), F.lit(-1)).alias("first_pt_ts"),
            F.coalesce(F.col("last_pt_ts"), F.lit(-1)).alias("last_pt_ts"),
            F.coalesce(F.col("sum_value_q"), F.lit(0)).cast("long").alias(
                "sum_value_q"
            ),
        )
    )


def asof_join(
    samples: DataFrame,
    probes: DataFrame,
    payload_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """As-of backward join: for each probe row, the latest sample
    at-or-before its timestamp on the same channel — "what was the
    sensor reading when this event fired", the kdb ``aj`` / pandas
    ``merge_asof`` primitive.

    ``probes``: (channel, ts, *payload_cols); ``samples``: (channel,
    ts, value). Callers must ensure at most one sample per (channel,
    ts) (pre-aggregate otherwise) so "the" as-of value is well defined
    — that is also what makes the DuckDB ``ASOF JOIN`` oracle
    deterministic.

    Output: (*payload_cols, channel, probe_ts, value, src_ts,
    stale_us, matched) — probes before a channel's first sample get
    matched = false, value 0.0 and -1 ts/stale (NULL-free row
    contract).

    Plan: the :func:`asof_locf` union-window trick generalized to
    carry probe payload columns — ONE window pass per channel over the
    unioned rows, no join, no UDF. Probe rows order AFTER the sample
    at an equal timestamp (is_probe breaks the tie), giving the
    inclusive ``sample_ts <= probe_ts`` as-of semantics. At scale the
    (channel) partitioning parallelizes across channels; few-channels
    × deep-history splits with the rolling.py blocked-halo pattern
    (lookback is one preceding sample row).
    """
    pay = list(payload_cols)
    s = samples.select(
        "channel",
        "ts",
        "value",
        F.lit(0).alias("is_probe"),
        *[F.lit(None).cast("long").alias(c) for c in pay],
    )
    p = probes.select(
        "channel",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_probe"),
        *pay,
    )
    w = (
        Window.partitionBy("channel")
        .orderBy("ts", "is_probe", "value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = s.unionByName(p)
    src_ts = F.when(F.col("is_probe") == 0, F.col("ts"))
    return (
        u.withColumn("_fill", F.last("value", ignorenulls=True).over(w))
        .withColumn("_src", F.last(src_ts, ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select(
            *pay,
            "channel",
            F.col("ts").alias("probe_ts"),
            F.coalesce(F.col("_fill"), F.lit(0.0)).alias("value"),
            F.coalesce(F.col("_src"), F.lit(-1)).alias("src_ts"),
            F.coalesce(F.col("ts") - F.col("_src"), F.lit(-1)).alias(
                "stale_us"
            ),
            F.col("_src").isNotNull().alias("matched"),
        )
    )
