"""Streaming running-record tracker: the batch record_counts fold
(operators/stats.record_counts) maintained incrementally per channel.

State is the exact integer frontier — (running max, running min,
n_points, n_highs, n_lows, last_high_ts, last_low_ts) — so every
snapshot is an exact-integer recompute; under the in-order arrival
contract (the burstiness/flux class: the feed is ts-ordered, rows
within a micro-batch are sorted before folding) the drained snapshot
is bit-identical to the batch window fold, and the batch SQL is the
oracle.

A record is STRICT: the first point of a channel sets the frontier
but scores no record (the record_counts contract; −1 ts sentinels
until the first break).
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
        T.StructField("n_points", T.LongType()),
        T.StructField("n_record_highs", T.LongType()),
        T.StructField("n_record_lows", T.LongType()),
        T.StructField("last_high_ts", T.LongType()),
        T.StructField("last_low_ts", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("mx", T.LongType()),
        T.StructField("mn", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("n_highs", T.LongType()),
        T.StructField("n_lows", T.LongType()),
        T.StructField("last_high_ts", T.LongType()),
        T.StructField("last_low_ts", T.LongType()),
    ]
)


def records_stream(samples_stream: DataFrame, quant: int = 100) -> DataFrame:
    """Incremental per-channel record counting over a streaming
    (channel, ts, value) feed. Emits one snapshot per touched channel
    per micro-batch; the snapshot with the largest n_points (monotone)
    is the batch answer."""
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
        # the batch fold's total order within the batch
        rows = rows.sort_values(["ts", "value"], kind="mergesort")
        if state.exists:
            mx, mn, n, nh, nl, lht, llt = state.get
        else:
            mx = mn = None
            n = nh = nl = 0
            lht = llt = -1
        for ts, v in zip(
            rows["ts"].to_numpy(), rows["value"].to_numpy()
        ):
            # BigDecimal HALF_UP semantics (the flux rule — Python's
            # round() is half-even and floor(x+0.5) is off by one ulp
            # below .5 boundaries)
            xq = int(
                Decimal(repr(float(v) * q)).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP
                )
            )
            if mx is None:
                mx = mn = xq
            else:
                if xq > mx:
                    nh += 1
                    lht = int(ts)
                    mx = xq
                if xq < mn:
                    nl += 1
                    llt = int(ts)
                    mn = xq
            n += 1
        state.update((mx, mn, n, nh, nl, lht, llt))
        yield pd.DataFrame(
            [
                {
                    "channel": channel,
                    "n_points": n,
                    "n_record_highs": nh,
                    "n_record_lows": nl,
                    "last_high_ts": lht,
                    "last_low_ts": llt,
                }
            ]
        )

    return samples_stream.select(
        "channel", "ts", "value"
    ).groupBy("channel").applyInPandasWithState(
        step,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
