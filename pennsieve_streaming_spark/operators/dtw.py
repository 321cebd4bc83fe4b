"""Dynamic-time-warping channel similarity (Berndt & Clifford 1994;
Sakoe & Chiba 1978) over PAA-reduced sequences (Keogh et al. 2001).

The reference engine serves raw per-channel samples; "which electrodes
behave alike, allowing for time shifts" is the canonical downstream
similarity question DTW answers and lockstep metrics (correlation,
Euclidean) cannot — DTW aligns the sequences elastically before
measuring distance.

Pipeline:

1. **Reduce** each channel to a short PAA sketch: rank rows in
   (ts, value) order, cut into ``seg_len``-row segments (at most
   ``max_segs``), segment value = ``round(exact_sum / seg_len)`` in
   ``quant`` units — one fixed float division over an exact BIGINT
   sum, so the sketch is engine-replayable. Incomplete trailing
   segments are dropped (explicit contract; a channel shorter than
   one segment drops out of the pair table entirely).
2. **Pair** the per-channel sketches (channel_a < channel_b). The
   sketch table is |channels| rows — the join is a broadcast of a
   tiny dimension, never a data-scale shuffle.
3. **DP** per pair inside one Arrow batch (``mapInPandas``): the
   classic O(la·lb) band-free recurrence on int64 costs

       dp[i][j] = |a_i − b_j| + min(dp[i−1][j], dp[i][j−1],
                                    dp[i−1][j−1])

   with the sentinel-initialized virtual row 0 (dp0[0]=0, else INF)
   giving the standard boundary conditions. Every cost is an exact
   integer, so the DP — and therefore the DuckDB oracle's
   cell-by-cell recursive-CTE replay — is bit-exact.

Determinism: integer DP end-to-end; the only floats are the PAA
rounding division and the final normalized distance, both fixed
single expressions over exact integers evaluated identically on both
engines.

Scale: the heavy stage is the PAA reduction — one row-ranking window
per channel plus a partial-agg groupBy, both partitioned by channel.
The DP runs on |channels|² pairs of ``max_segs``-length sketches:
independent of corpus row count, embarrassingly parallel across
pairs. For |channels| in the thousands, band the pair generation
(e.g. by electrode group) before the cross join; the sketch table
stays broadcastable far beyond that.

Reference parity note: no DTW exists in pennsieve-streaming (its
QuerySequencer serves windows only, `query/QuerySequencer.scala`) —
this is a scale-extension operator in the SURVEY §2.13 family.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INF = np.int64(1) << np.int64(62)


def dtw_int(a: np.ndarray, b: np.ndarray) -> int:
    """Exact int64 DTW distance between two BIGINT-quantized
    sequences; the kernel both the Spark path and the unit goldens
    call (ONE definition — the stream==batch copy-parity rule)."""
    la, lb = len(a), len(b)
    prev = np.full(lb + 1, _INF, dtype=np.int64)
    prev[0] = 0
    for i in range(la):
        cur = np.full(lb + 1, _INF, dtype=np.int64)
        ai = a[i]
        for j in range(1, lb + 1):
            c = abs(int(ai) - int(b[j - 1]))
            m = min(prev[j], prev[j - 1], cur[j - 1])
            cur[j] = c + m
        prev = cur
    return int(prev[lb])


def paa_sketch(
    samples: DataFrame, seg_len: int, max_segs: int, quant: int
) -> DataFrame:
    """Per-channel PAA sketch: (channel, seg, pq) with
    ``pq = round(sum(round(value·quant)) / seg_len)`` over complete
    ``seg_len``-row segments, at most ``max_segs`` per channel."""
    sl = int(seg_len)
    q = int(quant)
    w = Window.partitionBy("channel").orderBy("ts", "value")
    ranked = samples.select(
        "channel",
        (F.row_number().over(w) - 1).alias("rn"),
        F.expr(f"CAST(round(value * {q}) AS BIGINT)").alias("xq"),
    ).filter(F.col("rn") < sl * int(max_segs))
    return (
        ranked.withColumn("seg", (F.col("rn") / sl).cast("long"))
        .groupBy("channel", "seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xq").cast("long").alias("sx"),
        )
        .filter(F.col("n") == sl)
        .select(
            "channel",
            "seg",
            F.expr(
                f"CAST(round(CAST(sx AS DOUBLE) / {sl}) AS BIGINT)"
            ).alias("pq"),
        )
    )


def dtw_channel_distances(
    samples: DataFrame,
    seg_len: int = 64,
    max_segs: int = 16,
    quant: int = 10**6,
) -> DataFrame:
    """All-pairs DTW distance between channels over their PAA
    sketches.

    Output: (channel_a, channel_b, la, lb, dtw_q, dtw_norm) with
    ``dtw_q`` the exact integer DTW cost in ``quant`` units and
    ``dtw_norm = dtw_q / (quant · (la + lb))`` the length-normalized
    distance in value units.
    """
    q = int(quant)
    sk = paa_sketch(samples, seg_len, max_segs, quant)
    arrs = sk.groupBy("channel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seg", "pq"))),
            lambda s: s["pq"],
        ).alias("vals"),
        F.count(F.lit(1)).cast("long").alias("n_segs"),
    )
    pairs = (
        arrs.alias("a")
        .join(
            F.broadcast(arrs.alias("b")),
            F.col("a.channel") < F.col("b.channel"),
        )
        .select(
            F.col("a.channel").alias("channel_a"),
            F.col("b.channel").alias("channel_b"),
            F.col("a.n_segs").alias("la"),
            F.col("b.n_segs").alias("lb"),
            F.col("a.vals").alias("va"),
            F.col("b.vals").alias("vb"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "channel_a": pdf["channel_a"],
                "channel_b": pdf["channel_b"],
                "la": pdf["la"].astype("int64"),
                "lb": pdf["lb"].astype("int64"),
                "dtw_q": [
                    dtw_int(
                        np.asarray(a, dtype=np.int64),
                        np.asarray(b, dtype=np.int64),
                    )
                    for a, b in zip(pdf["va"], pdf["vb"])
                ],
            }
            yield pd.DataFrame(out)

    d = pairs.mapInPandas(
        run,
        schema=(
            "channel_a string, channel_b string, la long, lb long, "
            "dtw_q long"
        ),
    )
    return d.withColumn(
        "dtw_norm",
        F.expr(f"CAST(dtw_q AS DOUBLE) / ({q} * CAST(la + lb AS DOUBLE))"),
    )
