"""Streaming stateful filter: two micro-batches must produce output
bit-identical to one-shot BATCH filtering (state continuity + the same
reflected prewarm as dsp.filtering._filter_run), and a gap must reset
state and re-prewarm from the post-gap samples."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pytest

from pennsieve_streaming_spark.dsp import FilterSpec, butter_sos
from pennsieve_streaming_spark.dsp.butterworth import filter_transient_length
from pennsieve_streaming_spark.dsp.filtering import _filter_run
from pennsieve_streaming_spark.streaming.stateful_filter import (
    HAS_TRANSFORM_WITH_STATE,
    stateful_filter_stream,
    stateful_filter_stream_tws,
)

FS = 250.0
SPEC = FilterSpec("lowpass", 4, 30.0)


def _run_stream(spark, batch_dirs, flavor="apply"):
    """Drive a file-source stream one directory at a time."""
    src = tempfile.mkdtemp(prefix="sfilt_src_")
    out_rows = []
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    if flavor == "tws":
        filtered = stateful_filter_stream_tws(stream, SPEC, FS)
    else:
        filtered = stateful_filter_stream(stream, SPEC, FS)
    q = (
        filtered.writeStream.format("memory")
        .queryName("sfilt_out")
        .outputMode("append")
        .start()
    )
    try:
        for i, b in enumerate(batch_dirs):
            for f in os.listdir(b):
                if f.startswith(".") or not f.endswith(".parquet"):
                    continue
                shutil.copy(os.path.join(b, f), os.path.join(src, f"{i}_{f}"))
            q.processAllAvailable()
        return spark.sql("SELECT * FROM sfilt_out ORDER BY channel, ts").collect()
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)


@pytest.mark.parametrize("gap", [False, True])
def test_two_batches_vs_oneshot(spark, gap):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    # batch 2 either continues seamlessly or jumps far ahead (reset)
    offset = 200 * period + (10**9 if gap else 0)
    rows1 = [("c", i * period, float(x[i])) for i in range(200)]
    rows2 = [("c", offset + (i - 200) * period, float(x[i])) for i in range(200, 400)]

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows1, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d1)
        spark.createDataFrame(rows2, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d2)
        got = [r["value"] for r in _run_stream(spark, [d1, d2])]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)

    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    assert pad <= 200  # prewarm draws only on first-batch samples
    if gap:
        # reset: each half prewarmed + filtered independently, exactly
        # like the batch path splits contiguous runs
        want = np.concatenate(
            [_filter_run(x[:200], sos, pad), _filter_run(x[200:], sos, pad)]
        )
    else:
        # seamless: identical to one-shot batch filtering of the whole
        # run (prewarm uses the first pad samples, all in batch 1)
        want = _filter_run(x, sos, pad)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sub_pad_first_batch_matches_batch_path(spark):
    """ADVICE r2: the first micro-batch holding FEWER than pad samples
    must not seed a short-run prewarm — the run buffers in state until
    pad samples arrive, so streamed output is bit-identical to one-shot
    batch filtering regardless of micro-batch boundaries."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    split = pad // 2  # strictly below pad
    rows1 = [("c", i * period, float(x[i])) for i in range(split)]
    rows2 = [("c", i * period, float(x[i])) for i in range(split, 400)]

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows1, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d1)
        spark.createDataFrame(rows2, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d2)
        got = [r["value"] for r in _run_stream(spark, [d1, d2])]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)

    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    want = _filter_run(x, sos, pad)
    assert len(got) == 400
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.skipif(
    not HAS_TRANSFORM_WITH_STATE,
    reason="transformWithState unavailable (Spark < 4.0, or the "
    "google.protobuf state-server dependency is not installed)",
)
@pytest.mark.parametrize("gap", [False, True])
def test_tws_flavor_bit_identical(spark, gap):
    """Spark 4 transformWithStateInPandas dual-path check (SURVEY
    §7.4): same input micro-batches, output bit-identical to the
    applyInPandasWithState path AND to one-shot batch filtering."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    offset = 200 * period + (10**9 if gap else 0)
    rows1 = [("c", i * period, float(x[i])) for i in range(200)]
    rows2 = [
        ("c", offset + (i - 200) * period, float(x[i]))
        for i in range(200, 400)
    ]

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    try:
        spark.createDataFrame(rows1, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d1)
        spark.createDataFrame(rows2, "channel string, ts long, value double")\
            .coalesce(1).write.mode("overwrite").parquet(d2)
        got_tws = [
            r["value"] for r in _run_stream(spark, [d1, d2], flavor="tws")
        ]
        got_legacy = [r["value"] for r in _run_stream(spark, [d1, d2])]
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)

    assert got_tws == got_legacy  # bit-identical across the two APIs
    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    if gap:
        want = np.concatenate(
            [_filter_run(x[:200], sos, pad), _filter_run(x[200:], sos, pad)]
        )
    else:
        want = _filter_run(x, sos, pad)
    np.testing.assert_allclose(got_tws, want, atol=1e-12)


class _FakeValueState:
    """In-memory ValueState double (same .exists/.get/.update/.clear
    surface) so the ACTUAL processor code runs without Spark's
    protobuf state-server transport."""

    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, new_value):
        self.v = tuple(new_value)

    def clear(self):
        self.v = None


class _FakeHandle:
    def getValueState(self, name, schema, ttlDurationMs=None):
        return _FakeValueState()


@pytest.mark.parametrize("gap", [False, True])
def test_tws_processor_logic_matches_batch(gap):
    """Drive ButterworthStatefulProcessor.handleInputRows directly
    (fake handle) across two micro-batches: output must equal the
    one-shot batch filter (no gap) or two independent runs (gap) —
    the processor-level half of the dual-path guarantee, runnable
    even where the protobuf transport dependency is absent."""
    import pandas as pd

    from pennsieve_streaming_spark.datamodel import (
        FILTER_RESET_SAMPLE_PERIODS,
    )
    from pennsieve_streaming_spark.streaming.stateful_filter import (
        ButterworthStatefulProcessor,
    )

    rng = np.random.default_rng(13)
    x = rng.standard_normal(400)
    period = int(1e6 / FS)
    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    proc = ButterworthStatefulProcessor(
        sos_flat=sos.ravel().tolist(),
        n_sections=int(sos.shape[0]),
        gap_us=FILTER_RESET_SAMPLE_PERIODS / FS * 1e6,
        pad=pad,
    )
    proc.init(_FakeHandle())

    offset = 200 * period + (10**9 if gap else 0)
    b1 = pd.DataFrame(
        {"ts": [i * period for i in range(200)], "value": x[:200]}
    )
    b2 = pd.DataFrame(
        {
            "ts": [offset + i * period for i in range(200)],
            "value": x[200:],
        }
    )
    got = []
    for batch in (b1, b2):
        for out in proc.handleInputRows(("c",), iter([batch]), None):
            got.extend(out["value"].tolist())
    proc.close()

    if gap:
        want = np.concatenate(
            [_filter_run(x[:200], sos, pad), _filter_run(x[200:], sos, pad)]
        )
    else:
        want = _filter_run(x, sos, pad)
    assert len(got) == 400
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_advance_property_random_splits():
    """Property (hypothesis): for ANY micro-batch segmentation of a
    contiguous stream — including sub-pad first batches and 1-sample
    batches — chaining _advance produces output bit-identical to the
    one-shot batch filter. This is the invariant both streaming APIs
    inherit from the shared core."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from pennsieve_streaming_spark.datamodel import (
        FILTER_RESET_SAMPLE_PERIODS,
    )
    from pennsieve_streaming_spark.streaming.stateful_filter import (
        _advance,
    )

    sos = butter_sos(SPEC.order, SPEC.freq, FS, SPEC.btype)
    pad = filter_transient_length(SPEC.order, SPEC.max_freq, FS)
    period = int(1e6 / FS)
    gap_us = FILTER_RESET_SAMPLE_PERIODS / FS * 1e6

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=300),
        cuts=st.lists(
            st.integers(min_value=1, max_value=299),
            max_size=6,
            unique=True,
        ),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, cuts, seed):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(n)
        bounds = [0] + sorted(c for c in cuts if c < n) + [n]
        state = None
        got = []
        for lo, hi in zip(bounds, bounds[1:]):
            if lo == hi:
                continue
            pdf = pd.DataFrame(
                {
                    "ts": [i * period for i in range(lo, hi)],
                    "value": x[lo:hi],
                }
            )
            outs, state = _advance(
                "c", pdf, state, sos, sos.shape[0], gap_us, pad
            )
            for o in outs:
                got.extend(o["value"].tolist())
        # drain: a run still buffered below pad samples flushes with
        # the short-run casework (what the timeout path does)
        zi_flat, _last, buf_ts, buf_val = state
        if not zi_flat and buf_ts:
            got.extend(
                _filter_run(np.asarray(buf_val, dtype=float), sos, pad)
            )
        want = _filter_run(x, sos, pad)
        assert len(got) == n
        np.testing.assert_array_equal(got, want)  # BIT-identical

    check()
