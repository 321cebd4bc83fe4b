"""Streaming LZ76 complexity monitor: the batch per-window parse
(operators/stats.lz_complexity) run incrementally over a live feed.

State per channel is (next window index, the partial window's
quantized values — at most ws−1 longs); each micro-batch concatenates
the carry with its own sorted rows and emits every COMPLETED window's
phrase count. Under the in-order-arrival contract the emitted table
is bit-identical to the batch operator over everything ingested so
far (windows are count-based on the same global order, the kernel is
the same ``lz76_phrase_count``, and the normalization literal is the
same python-evaluated log2), so the batch SQL oracle gates the
streaming operator wherever the micro-batch boundaries fall.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("win", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("ones", T.LongType()),
        T.StructField("c_phrases", T.LongType()),
        T.StructField("lz_norm", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("win_offset", T.LongType()),
        T.StructField("carry", T.ArrayType(T.LongType())),
    ]
)


def lz_stream(
    samples_stream: DataFrame, window_samples: int = 128, quant: int = 100
) -> DataFrame:
    """Live per-(channel, window) LZ76 complexity; emits one row per
    COMPLETED window (the batch operator's ragged-tail rule means the
    in-flight partial window is exactly the carried state)."""
    from pennsieve_streaming_spark.operators.stats import (
        lz76_phrase_count,
    )

    ws = int(window_samples)
    q = int(quant)
    kmed = (ws + 1) // 2
    log2ws = math.log2(ws)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "value"]).reset_index(drop=True)
        off, carry = state.get if state.exists else (0, [])
        # xq was quantized by Spark SQL round() UPSTREAM of the
        # stateful operator — numpy rint is half-to-even while SQL
        # round is half-up, so quantizing here would diverge at exact
        # .5 boundaries
        xq = np.concatenate(
            [
                np.asarray(carry, dtype=np.int64),
                rows["xq"].to_numpy(np.int64),
            ]
        )
        wins, ones, cs = [], [], []
        i = 0
        while i + ws <= len(xq):
            w = xq[i : i + ws]
            med = int(np.sort(w)[kmed - 1])
            bits = "".join("1" if v > med else "0" for v in w)
            wins.append(int(off + len(wins)))
            ones.append(int((w > med).sum()))
            cs.append(lz76_phrase_count(bits))
            i += ws
        state.update((int(off + len(wins)), [int(v) for v in xq[i:]]))
        if not wins:
            return
        yield pd.DataFrame(
            {
                "channel": pd.Series([channel] * len(wins), dtype=str),
                "win": pd.Series(wins, dtype="int64"),
                "n": pd.Series([ws] * len(wins), dtype="int64"),
                "ones": pd.Series(ones, dtype="int64"),
                "c_phrases": pd.Series(cs, dtype="int64"),
                "lz_norm": pd.Series(
                    [c * log2ws / ws for c in cs], dtype="float64"
                ),
            }
        )

    from pyspark.sql import functions as F

    quantized = samples_stream.withColumn(
        "xq", F.expr(f"CAST(round(value * {q}) AS BIGINT)")
    )
    return quantized.groupBy("channel").applyInPandasWithState(
        step,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
