"""Streaming gap-span sessionization (A6, streaming flavor).

The batch operator ``operators.gaps.contiguous_spans`` merges
per-channel (lo, hi) spans whose gap is < threshold (reference rule:
new span on ``lo - prev_hi >= threshold``,
TimeSeriesQueryUtils.scala:316-321). For a live ingest feed the same
rule runs incrementally here: one open span per channel is carried
across micro-batches via ``applyInPandasWithState``; a batch merges
its (sorted) spans into the carried span and EMITS every span that got
closed by a later-starting one. The still-open span stays in state —
so at any moment the emitted rows plus the open state equal the batch
operator's output over everything ingested so far (the equivalence the
tests assert).

Ordering contract: within a batch, spans sort by (lo, hi) — exactly
the batch operator's window order — and across batches each channel's
spans must arrive with ``lo`` at or after the carried span's ``lo``
(the realtime ingest path appends in time order — the same contract
the stateful filter holds). Under that contract the merge rule here
is bit-identical to the batch lag(hi) rule, including the detail that
a merged span's ``hi`` is the LATEST row's hi in sort order, not the
running max. Late replays that violate the contract belong on the
batch path (re-run ``contiguous_spans`` over the repaired history).

``flush_timeout_ms``: opt-in processing-time timeout that closes and
emits a channel's open span after that much quiet time (same
trade-off as stateful_filter: ProcessingTimeTimeout keeps the query
running cleanup batches, so the test harness's processAllAvailable
never quiesces under it — leave None in tests).

At scale this is the canonical Structured Streaming shape: state is
ONE (lo, hi, n) triple per channel, shuffle is the groupBy(channel)
exchange of span rows only.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("channel", T.StringType()),
        T.StructField("span_lo", T.LongType()),
        T.StructField("span_hi", T.LongType()),
        T.StructField("n_segments", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("lo", T.LongType()),
        T.StructField("hi", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    spans_stream: DataFrame,
    threshold_us: int,
    flush_timeout_ms: int | None = None,
) -> DataFrame:
    """Merge a streaming (channel, lo, hi) span feed into contiguous
    spans, emitting each span once it is closed by a gap >=
    ``threshold_us``. Output: (channel, span_lo, span_hi, n_segments).
    """

    def step(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (channel,) = key
        if state.hasTimedOut:
            if state.exists:
                lo, hi, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "channel": [channel],
                        "span_lo": [lo],
                        "span_hi": [hi],
                        "n_segments": [n],
                    }
                )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["lo", "hi"], kind="mergesort")
        cur = list(state.get) if state.exists else None
        closed_lo, closed_hi, closed_n = [], [], []
        for lo, hi in zip(rows["lo"].to_numpy(), rows["hi"].to_numpy()):
            lo, hi = int(lo), int(hi)
            if cur is None:
                cur = [lo, hi, 1]
            elif lo - cur[1] < threshold_us:
                # same rule as the batch lag(hi) test: merge, hi takes
                # the LATEST row's hi (sorted order), not the max
                cur[1] = hi
                cur[2] += 1
            else:
                closed_lo.append(cur[0])
                closed_hi.append(cur[1])
                closed_n.append(cur[2])
                cur = [lo, hi, 1]
        state.update(tuple(cur))
        if flush_timeout_ms is not None:
            state.setTimeoutDuration(flush_timeout_ms)
        if closed_lo:
            yield pd.DataFrame(
                {
                    "channel": channel,
                    "span_lo": closed_lo,
                    "span_hi": closed_hi,
                    "n_segments": closed_n,
                }
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        spans_stream.groupBy("channel")
        .applyInPandasWithState(
            step, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
        )
    )
