"""Streaming Benford digit profile: the batch first-digit counts
(operators/stats.benford_digits) maintained incrementally per channel.

State is the 9-bin first-digit count vector + the survivor total —
exact integers, counts commute, so like circadian/kmv this is an
order-INDEPENDENT stateful operator: the drained snapshot equals the
batch counts bit-exactly under any micro-batch split. The chi²/MAD
finishes are NOT computed here — the caller applies the SAME shared
``benford_exprs()`` Spark SQL expressions to the drained counts, so
the finish arithmetic is engine-identical by construction (the
stream_burstiness pattern: stream the exact state, finish in SQL).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [T.StructField("channel", T.StringType())]
    + [T.StructField(f"c{i}", T.LongType()) for i in range(1, 10)]
    + [T.StructField("n", T.LongType())]
)

STATE_SCHEMA = T.StructType(
    [T.StructField(f"c{i}", T.LongType()) for i in range(1, 10)]
)


def benford_stream(
    samples_stream: DataFrame, quant: int = 100
) -> DataFrame:
    """Incremental per-channel first-digit counts over a streaming
    (channel, value) feed. Emits one cumulative snapshot per touched
    channel per micro-batch; the snapshot with the largest n
    (monotone) carries the batch counts."""
    q = int(quant)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        counts = list(state.get) if state.exists else [0] * 9
        for v in rows["value"].to_numpy():
            # BigDecimal HALF_UP quantization (the flux rule)
            xq = abs(
                int(
                    Decimal(repr(float(v) * q)).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
            )
            if xq > 0:
                d = int(str(xq)[0])
                counts[d - 1] += 1
        state.update(tuple(counts))
        snap = {"channel": channel}
        for i in range(9):
            snap[f"c{i + 1}"] = counts[i]
        snap["n"] = sum(counts)
        yield pd.DataFrame([snap])

    return samples_stream.select("channel", "value").groupBy(
        "channel"
    ).applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
