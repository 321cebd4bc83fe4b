"""Round-8 wave-9 operator goldens."""

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


def test_spectral_shape_pure_tone(spark):
    import math

    from pennsieve_streaming_spark.dsp.spectral import spectral_shape

    # pure bin-2 tone over one 16-sample window: centroid = 2,
    # bandwidth = 0
    n = 16
    vals = [math.sin(2 * math.pi * 2 * t / n) for t in range(n)]
    out = spectral_shape(
        _series(spark, vals), n_bins=4, window_samples=n
    ).collect()[0]
    assert out.centroid_bin == 2.0
    assert out.bandwidth_bins == 0.0


def test_spectral_shape_flat_sentinel(spark):
    from pennsieve_streaming_spark.dsp.spectral import spectral_shape

    out = spectral_shape(
        _series(spark, [0.0] * 16), n_bins=4, window_samples=16
    ).collect()[0]
    assert out.centroid_bin == 0.0 and out.bandwidth_bins == 0.0


def test_variogram_random_walk_vs_noise(spark):
    from pennsieve_streaming_spark.operators.stats import variogram

    # alternating noise: gamma flat across lags at even/odd parity;
    # ramp (random-walk-like): gamma grows as h^2
    ramp = {
        r.lag_days: r
        for r in variogram(
            _series(spark, range(40)), step_us=1, lags=(1, 2, 4), quant=1
        ).collect()
    }
    # ramp: (x_{t+h} - x_t)^2 = h^2 -> gamma = h^2 / 2
    assert ramp[1].semivariance == 0.5
    assert ramp[2].semivariance == 2.0
    assert ramp[4].semivariance == 8.0
    assert ramp[1].n_pairs == 39 and ramp[4].n_pairs == 36


def test_hapax_ratio_golden(spark):
    from pennsieve_streaming_spark.llm.text import hapax_ratio

    docs = spark.createDataFrame(
        [
            (0, "a b b c", "s1"),
            (1, "c d", "s1"),
            (2, "", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in hapax_ratio(docs).collect()}
    s1 = out["s1"]
    # s1 tokens: a b b c c d -> types {a,b,c,d}, hapax {a,d}
    assert s1.n_tokens == 6 and s1.n_types == 4 and s1.n_hapax == 2
    assert s1.hapax_type_share == 0.5
    assert s1.hapax_token_share == round(2 / 6, 9)
    # empty source emits no token rows at all
    assert "s2" not in out
