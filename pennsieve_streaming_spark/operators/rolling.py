"""Rolling (trailing-window) per-channel statistics.

Not a reference operator — the reference's aggregations are
fixed-bucket (downsample) or whole-history (gap spans) — but trailing
stats are the first thing an EEG reviewer derives client-side
(baseline drift = rolling mean, artifact flags from rolling range),
so the engine serves them directly: one RANGE-framed window per
channel, Catalyst's native windowed aggregation, no UDFs.

Determinism contract: a windowed FLOAT sum is association-order
dependent and engines genuinely differ (Spark accumulates in frame
order, DuckDB uses segment trees) — at ~10^5 rows a post-hoc 9-dp
round WILL hit a boundary somewhere. So the sum is computed over
values quantized to 1e-6 as BIGINT (integer addition is associative —
bit-exact under ANY evaluation order or engine), and the mean derives
from that exact sum with a fixed two-division expression. min/max/
count are exact as-is. The 1e-6 quantum is the documented resolution
of the rolling mean, far below any physiological signal scale.

100 TB note: by default a RANGE window routes each channel through
one task (same caveat as the count-bucket downsample). Pass
``block_us`` (must be >= window_us) for the blocked-halo plan: rows
partition into (channel, time-block) with each block's trailing
``window_us`` strip REPLICATED into the next block as lookback halo,
windows evaluate within (channel, block), and halo rows are dropped
after supplying history — bit-identical output (equivalence-tested)
at |channels| x |blocks| parallelism for the cost of one narrow
row-replication map (halo fraction = window_us / block_us).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 value quantum for the exact windowed sum


def rolling_stats(
    samples: DataFrame,
    window_us: int,
    start_us: int | None = None,
    end_us: int | None = None,
    block_us: int | None = None,
) -> DataFrame:
    """Trailing-window stats per sample: for each (channel, ts), the
    aggregate over that channel's samples in [ts - window_us, ts]
    (RANGE frame, bounds inclusive; ties-by-ts are frame peers on both
    engines).

    Output: (channel, ts, value, n_window, win_min, win_max,
    win_sum_q, win_mean) — win_sum_q is the exact BIGINT sum of
    1e-6-quantized values; win_mean = win_sum_q / 1e6 / n_window.

    ``block_us``: opt-in blocked-halo execution (see module
    docstring); requires block_us >= window_us so one halo strip
    covers the full lookback.
    """
    df = samples
    if start_us is not None:
        df = df.filter(F.col("ts") >= start_us)
    if end_us is not None:
        df = df.filter(F.col("ts") < end_us)
    q = F.expr(f"CAST(round(value * {QUANT}) AS BIGINT)")
    df = df.withColumn("_q", q)

    if block_us is None:
        w = (
            Window.partitionBy("channel")
            .orderBy("ts")
            .rangeBetween(-int(window_us), 0)
        )
        part_cols = []
    else:
        if block_us < window_us:
            raise ValueError(
                f"block_us ({block_us}) must be >= window_us ({window_us})"
            )
        blk = int(block_us)
        own = df.withColumn("_blk", F.floor(F.col("ts") / blk)).withColumn(
            "_halo", F.lit(False)
        )
        # the trailing window_us strip of each block doubles as the
        # next block's lookback; halo rows never emit
        halo = (
            df.filter(F.col("ts") % blk >= blk - int(window_us))
            .withColumn("_blk", F.floor(F.col("ts") / blk) + 1)
            .withColumn("_halo", F.lit(True))
        )
        df = own.unionByName(halo)
        w = (
            Window.partitionBy("channel", "_blk")
            .orderBy("ts")
            .rangeBetween(-int(window_us), 0)
        )
        part_cols = ["_halo"]

    out = (
        df.select(
            "channel",
            "ts",
            "value",
            *part_cols,
            F.count(F.lit(1)).over(w).cast("long").alias("n_window"),
            F.min("value").over(w).alias("win_min"),
            F.max("value").over(w).alias("win_max"),
            F.sum("_q").over(w).cast("long").alias("win_sum_q"),
        )
        .withColumn(
            "win_mean",
            F.expr(f"CAST(win_sum_q AS DOUBLE) / {QUANT} / n_window"),
        )
    )
    if part_cols:
        out = out.filter(~F.col("_halo")).drop("_halo")
    return out
