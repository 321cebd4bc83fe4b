"""Streaming as-of backward join (the X34-family streaming analogue of
``operators.align.asof_join``).

For a live feed, "what was the sensor reading when this event fired"
must answer incrementally: probes and samples arrive interleaved on
the same channels, and each probe row joins against the latest sample
at-or-before its timestamp. The batch operator answers it with one
union-window pass (align.py); here the SAME union runs through
``applyInPandasWithState`` with the carried state being exactly the
window's running aggregate — the last sample (ts, value) per channel.
That is the natural pairing with streaming/stateful_filter.py (carries
IIR state) and streaming/sessionize.py (carries the open span): state
is one tiny tuple per channel, the shuffle is the groupBy(channel)
exchange, and each micro-batch does a local sort + linear walk.

Ordering contract (same as sessionize/stateful_filter): within a
micro-batch rows sort by (ts, is_probe, value) — bit-identical to the
batch window order, so a sample at a probe's exact timestamp wins
(inclusive as-of), and duplicate-ts samples resolve to the max value —
and across micro-batches each channel's rows must arrive with ts at or
after everything already ingested (the realtime append path's
guarantee). A sample arriving late (behind an already-emitted probe)
belongs on the batch path: re-run ``align.asof_join`` over the
repaired history. Under the contract, emitted rows equal the batch
operator's output over everything ingested so far wherever the
micro-batch boundaries fall (stream==batch suite), because the carry
after each batch equals the window's running last-sample.

Scale: state per channel is ONE (ts, value) pair — millions of
channels fit trivially in the state store; nothing ever buffers
unbounded rows (contrast a stream-stream interval join, which must
retain a watermark-deep buffer on both sides).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def asof_join_stream(
    samples_stream: DataFrame,
    probes_stream: DataFrame,
    payload_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """As-of backward join of a streaming probe feed against a
    streaming sample feed, per channel.

    ``samples_stream``: (channel, ts, value); ``probes_stream``:
    (channel, ts, *payload_cols). Same row contract as the batch
    operator: (*payload_cols, channel, probe_ts, value, src_ts,
    stale_us, matched), probes before a channel's first sample get
    matched = false / value 0.0 / -1 ts fields. Payload placeholder
    types derive from the probes' schema (any column type works).
    """
    pay = list(payload_cols)
    pay_types = {c: probes_stream.schema[c].dataType for c in pay}
    # A nullable int64 column crosses Arrow→pandas as float64 inside
    # applyInPandasWithState, silently rounding ids above 2^53
    # (snowflake ids corrupt) — and NULLs can come from EITHER side:
    # the sample-side placeholders, or a probe row whose payload is
    # genuinely NULL (one such row poisons the whole chunk's dtype).
    # Integral payloads therefore round-trip the pandas boundary as
    # STRINGS (object dtype — exact at all 64 bits, NULL-preserving)
    # and cast back to their declared type on the way out.
    integral = {
        c
        for c, dt in pay_types.items()
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
    }
    inner_types = {
        c: (T.StringType() if c in integral else pay_types[c]) for c in pay
    }
    pay_fields = [T.StructField(c, inner_types[c]) for c in pay]
    out_schema = T.StructType(
        pay_fields
        + [
            T.StructField("channel", T.StringType()),
            T.StructField("probe_ts", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("src_ts", T.LongType()),
            T.StructField("stale_us", T.LongType()),
            T.StructField("matched", T.BooleanType()),
        ]
    )

    s = samples_stream.select(
        "channel",
        "ts",
        "value",
        F.lit(0).alias("is_probe"),
        *[F.lit(None).cast(inner_types[c]).alias(c) for c in pay],
    )
    p = probes_stream.select(
        "channel",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_probe"),
        *[F.col(c).cast(inner_types[c]).alias(c) for c in pay],
    )
    u = s.unionByName(p)

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:  # pragma: no cover - NoTimeout only
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        # bit-identical to the batch window order (ts, is_probe, value);
        # NaN probe values sort last within a ts group, which is
        # irrelevant (probes don't feed the carry)
        rows = rows.sort_values(
            ["ts", "is_probe", "value"], kind="mergesort"
        )
        carry = list(state.get) if state.exists else None  # [ts, value]
        out: dict[str, list] = {f.name: [] for f in out_schema.fields}
        for rec in rows.itertuples(index=False):
            if rec.is_probe == 0:
                # within a ts group samples are value-ascending, so the
                # final assignment is the max value — the window's
                # duplicate-ts winner
                carry = [int(rec.ts), float(rec.value)]
            else:
                for c in pay:
                    out[c].append(getattr(rec, c))
                out["channel"].append(channel)
                out["probe_ts"].append(int(rec.ts))
                if carry is None:
                    out["value"].append(0.0)
                    out["src_ts"].append(-1)
                    out["stale_us"].append(-1)
                    out["matched"].append(False)
                else:
                    out["value"].append(carry[1])
                    out["src_ts"].append(carry[0])
                    out["stale_us"].append(int(rec.ts) - carry[0])
                    out["matched"].append(True)
        if carry is not None:
            state.update(tuple(carry))
        if out["channel"]:
            yield pd.DataFrame(out)

    out = u.groupBy("channel").applyInPandasWithState(
        step,
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    # restore integral payloads to their declared types (exact: string
    # → long never loses bits, unlike the float64 detour)
    for c in integral:
        out = out.withColumn(c, F.col(c).cast(pay_types[c]))
    return out
