"""Kleinberg burst detection (Kleinberg, KDD 2002): the 2-state
infinite-automaton model over an event stream's inter-arrival gaps.

State 0 emits gaps at the base rate λ0 = n/span, state 1 at λ1 = s·λ0
(s > 1); a gap x costs −ln(λq·e^{−λq·x}) = λq·x − ln λq in state q,
and entering the burst state costs γ·ln n. The minimum-cost state
sequence marks the bursty stretches — the principled alternative to
the per-bucket z-score alarm (:func:`operators.analytics` rate
bursts), able to bridge single quiet gaps inside a burst.

Decoding without a backtrack: the optimal label per gap comes from
the forward/backward cost decomposition

    state_i = 1  iff  f1(i) + b1(i) < f0(i) + b0(i)

with f_q(i) the min cost of gaps 1..i ending in state q and b_q(i)
the min cost of gaps i+1..n given state q at i (ties → state 0).
Both recursions carry TWO numbers per channel per step — the
DuckDB oracle replays them as two recursive CTEs (the
Butterworth/Holt/CUSUM recurrence class) with no path list to grow.

Determinism: gaps are exact µs integers; λq and the per-gap cost
terms are fixed float expressions over (n, span), with the rate-cost
product and the two ln terms each quantized to 1e-9 BIGINTs
(``round(λq·x·1e9) − round(ln λq·1e9)``, the PSI 9-dp-ln
convention) so the DP runs on exact integers end to end. The
ln-derived constants are computed ONCE per channel in Spark SQL (not
per gap, not in Python) and joined in.

Output: one row per detected burst — (channel, start_ts, end_ts,
n_gaps) — derived from the per-gap states by the gaps-and-islands
grouping. Channels with < 2 gaps or zero span drop out.

Scale: one lag window + one tiny per-channel param join, then the
sequential DP per channel inside Arrow batches (the stateful-filter
family shape); the islands pass is one more per-channel window over
burst-gap rows only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NANO = 10**9


def burst_states(
    x: np.ndarray, lam0: float, lam1: float, lnq0: int, lnq1: int, trans_q: int
) -> np.ndarray:
    """The forward/backward integer DP over one channel's gap vector;
    returns the 0/1 state per gap. ONE definition — the goldens and
    the Spark path both call it; the oracle replays it in SQL."""
    n = len(x)
    c0 = np.floor(lam0 * x * NANO + 0.5).astype(np.int64) - lnq0
    c1 = np.floor(lam1 * x * NANO + 0.5).astype(np.int64) - lnq1
    f0 = np.empty(n, dtype=np.int64)
    f1 = np.empty(n, dtype=np.int64)
    f0[0] = c0[0]
    f1[0] = trans_q + c1[0]  # the automaton starts in state 0
    for i in range(1, n):
        f0[i] = min(f0[i - 1], f1[i - 1]) + c0[i]
        f1[i] = min(f0[i - 1] + trans_q, f1[i - 1]) + c1[i]
    b0 = np.empty(n, dtype=np.int64)
    b1 = np.empty(n, dtype=np.int64)
    b0[n - 1] = 0
    b1[n - 1] = 0
    for i in range(n - 2, -1, -1):
        d0 = c0[i + 1] + b0[i + 1]
        d1 = c1[i + 1] + b1[i + 1]
        b0[i] = min(d0, trans_q + d1)
        b1[i] = min(d0, d1)
    return (f1 + b1 < f0 + b0).astype(np.int64)


def kleinberg_bursts(
    events: DataFrame, s: float = 3.0, gamma: float = 1.0
) -> DataFrame:
    """Detect bursts per channel in an (channel, ts) event stream."""
    sc = float(s)
    gm = float(gamma)
    w = Window.partitionBy("channel").orderBy("ts")
    gaps = (
        events.select("channel", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "channel",
            F.col("prev_ts").alias("gap_start_ts"),
            F.col("ts").alias("gap_end_ts"),
            (F.col("ts") - F.col("prev_ts")).alias("x"),
        )
    )
    params = (
        gaps.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.max("gap_end_ts") - F.min("gap_start_ts"))
            .cast("long")
            .alias("span"),
        )
        .filter((F.col("n") >= 2) & (F.col("span") > 0))
        .select(
            "channel",
            "n",
            F.expr("CAST(n AS DOUBLE) / CAST(span AS DOUBLE)").alias("lam0"),
            F.expr(
                f"{sc!r} * (CAST(n AS DOUBLE) / CAST(span AS DOUBLE))"
            ).alias("lam1"),
            F.expr(
                "CAST(round(ln(CAST(n AS DOUBLE) / CAST(span AS DOUBLE)) "
                f"* {NANO}) AS BIGINT)"
            ).alias("lnq0"),
            F.expr(
                f"CAST(round(ln({sc!r} * (CAST(n AS DOUBLE) "
                f"/ CAST(span AS DOUBLE))) * {NANO}) AS BIGINT)"
            ).alias("lnq1"),
            F.expr(
                f"CAST(round({gm!r} * ln(CAST(n AS DOUBLE)) * {NANO}) "
                "AS BIGINT)"
            ).alias("trans_q"),
        )
    )
    tagged = gaps.join(F.broadcast(params), "channel")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["gap_end_ts", "gap_start_ts"]).reset_index(
            drop=True
        )
        st = burst_states(
            pdf["x"].to_numpy(dtype=np.float64),
            float(pdf["lam0"].iloc[0]),
            float(pdf["lam1"].iloc[0]),
            int(pdf["lnq0"].iloc[0]),
            int(pdf["lnq1"].iloc[0]),
            int(pdf["trans_q"].iloc[0]),
        )
        return pd.DataFrame(
            {
                "channel": pdf["channel"],
                "gap_idx": np.arange(len(pdf), dtype=np.int64),
                "gap_start_ts": pdf["gap_start_ts"],
                "gap_end_ts": pdf["gap_end_ts"],
                "state": st,
            }
        )

    states = tagged.groupBy("channel").applyInPandas(
        run,
        schema=(
            "channel string, gap_idx long, gap_start_ts long, "
            "gap_end_ts long, state long"
        ),
    )
    bursty = states.filter(F.col("state") == 1)
    iw = Window.partitionBy("channel").orderBy("gap_idx")
    return (
        bursty.withColumn(
            "grp", F.col("gap_idx") - F.row_number().over(iw)
        )
        .groupBy("channel", "grp")
        .agg(
            F.min("gap_start_ts").cast("long").alias("start_ts"),
            F.max("gap_end_ts").cast("long").alias("end_ts"),
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
        )
        .drop("grp")
    )
