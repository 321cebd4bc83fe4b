"""Round-8 wave-10 operator goldens."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _series(spark, vals, channel="a"):
    return spark.createDataFrame(
        [(channel, i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )


def test_sma_cross_detects_regime_flip(spark):
    from pennsieve_streaming_spark.operators.stats import sma_crossovers

    # long downtrend then sharp sustained rally: the fast SMA must
    # cross above the slow one exactly once (golden), never back
    vals = list(range(100, 40, -1)) + list(range(40, 140))
    out = sma_crossovers(
        _series(spark, vals), fast=5, slow=10, quant=1
    ).collect()[0]
    assert out.n_golden == 1 and out.n_death == 0
    assert out.last_golden_ts > 60 and out.last_death_ts == -1
    assert out.n_tested == len(vals) - 9


def test_sma_cross_constant_no_events(spark):
    from pennsieve_streaming_spark.operators.stats import sma_crossovers

    out = sma_crossovers(
        _series(spark, [7] * 30), fast=5, slow=10, quant=1
    ).collect()[0]
    # sign stays 0 forever: no nonzero prev, no crossings
    assert out.n_golden == 0 and out.n_death == 0


def test_mattr_golden(spark):
    from pennsieve_streaming_spark.llm.text import mattr

    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "x y"), (2, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in mattr(docs, window=4).collect()}
    d = out[0]
    # windows of 4 over [a b a b a b]: 3 windows, each {a,b} -> 2
    assert d.n_tokens == 6 and d.n_windows == 3
    assert d.mattr == round(6 / 12, 9)  # sum 6 / (3 windows * 4)
    # short doc: whole-doc TTR fallback
    assert out[1].n_windows == 1 and out[1].mattr == 1.0
    assert out[2].mattr == 0.0


def test_cosine_thresholds_golden(spark):
    import math

    from pennsieve_streaming_spark.llm.similarity import (
        cosine_threshold_counts,
    )

    # probe at angle 0; corpus at angles with known cosines
    vecs = [
        (0, [1.0, 0.0]),
        (1, [math.cos(0.2), math.sin(0.2)]),   # cos ~ 0.98
        (2, [math.cos(0.9), math.sin(0.9)]),   # cos ~ 0.62
        (3, [0.0, 1.0]),                        # cos 0
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    out = cosine_threshold_counts(
        df, df.filter(F.col("vec_id") == 0), thresholds=(0.5, 0.7, 0.9)
    ).collect()[0]
    assert out.n_corpus == 3
    assert (out.n_ge_1, out.n_ge_2, out.n_ge_3) == (2, 1, 1)
    assert out.share_1 == round(2 / 3, 9)
