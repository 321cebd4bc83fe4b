"""Streaming Bollinger-band breakout monitor: the batch
operators/stats.bollinger_breaks fold maintained incrementally per
channel.

State is the trailing ``window`` quantized samples (an exact integer
ring, newest last) plus the running breakout counters — the SAME pure
int64 band algebra as the batch operator ((n·x − S)² > k²(n·SS − S²)),
so under the in-order arrival contract (the records/burstiness class)
the drained snapshot is bit-identical to the batch window fold and
the batch SQL is the oracle.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("n_tested", T.LongType()),
        T.StructField("n_upper", T.LongType()),
        T.StructField("n_lower", T.LongType()),
        T.StructField("last_upper_ts", T.LongType()),
        T.StructField("last_lower_ts", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ring", T.ArrayType(T.LongType())),
        T.StructField("n_tested", T.LongType()),
        T.StructField("n_upper", T.LongType()),
        T.StructField("n_lower", T.LongType()),
        T.StructField("last_upper_ts", T.LongType()),
        T.StructField("last_lower_ts", T.LongType()),
    ]
)


def bollinger_stream(
    samples_stream: DataFrame,
    window: int = 20,
    k: int = 2,
    quant: int = 100,
) -> DataFrame:
    """Incremental per-channel Bollinger breakout counting over a
    streaming (channel, ts, value) feed. Emits one cumulative
    snapshot per touched channel per micro-batch once the window is
    warm; the snapshot with the largest n_tested (monotone) is the
    batch answer."""
    w = int(window)
    q = int(quant)
    kk = int(k)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["ts", "value"], kind="mergesort")
        if state.exists:
            ring, nt, nu, nl, lut, llt = state.get
            ring = list(ring)
        else:
            ring, nt, nu, nl, lut, llt = [], 0, 0, 0, -1, -1
        for ts, v in zip(
            rows["ts"].to_numpy(), rows["value"].to_numpy()
        ):
            xq = int(
                Decimal(repr(float(v) * q)).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP
                )
            )
            if len(ring) == w:
                s = sum(ring)
                ss = sum(x * x for x in ring)
                lhs = (w * xq - s) * (w * xq - s)
                rhs = kk * kk * (w * ss - s * s)
                nt += 1
                if w * xq - s > 0 and lhs > rhs:
                    nu += 1
                    lut = int(ts)
                elif w * xq - s < 0 and lhs > rhs:
                    nl += 1
                    llt = int(ts)
            ring.append(xq)
            if len(ring) > w:
                ring.pop(0)
        state.update((ring, nt, nu, nl, lut, llt))
        if nt > 0:
            yield pd.DataFrame(
                [
                    {
                        "channel": channel,
                        "n_tested": nt,
                        "n_upper": nu,
                        "n_lower": nl,
                        "last_upper_ts": lut,
                        "last_lower_ts": llt,
                    }
                ]
            )

    return samples_stream.select("channel", "ts", "value").groupBy(
        "channel"
    ).applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
