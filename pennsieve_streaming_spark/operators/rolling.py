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

100 TB note: a RANGE window routes each channel through one task
(same caveat as the count-bucket downsample); the serving path sits
behind the 100k admission guard, and bulk jobs over few channels
should pre-split by time block like ``contiguous_spans(block_us=...)``
— for trailing windows the blocks must overlap by ``window_us`` and
drop the warmup strip, a standard map-side halo.
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
) -> DataFrame:
    """Trailing-window stats per sample: for each (channel, ts), the
    aggregate over that channel's samples in [ts - window_us, ts]
    (RANGE frame, bounds inclusive; ties-by-ts are frame peers on both
    engines).

    Output: (channel, ts, value, n_window, win_min, win_max,
    win_sum_q, win_mean) — win_sum_q is the exact BIGINT sum of
    1e-6-quantized values; win_mean = win_sum_q / 1e6 / n_window.
    """
    df = samples
    if start_us is not None:
        df = df.filter(F.col("ts") >= start_us)
    if end_us is not None:
        df = df.filter(F.col("ts") < end_us)
    q = F.expr(f"CAST(round(value * {QUANT}) AS BIGINT)")
    w = (
        Window.partitionBy("channel")
        .orderBy("ts")
        .rangeBetween(-int(window_us), 0)
    )
    return (
        df.withColumn("_q", q)
        .select(
            "channel",
            "ts",
            "value",
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
