"""Count-min sketch + int8 quantization goldens and properties."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.quantize import int8_quantize
from pennsieve_streaming_spark.llm.sketch import (
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
)


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "tok string")


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------

def test_cms_counters_bounded_and_total_preserved(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    cnt = cms_counters(_toks(spark, words), "tok", depth=3, width=16)
    rows = cnt.collect()
    assert len(rows) <= 3 * 16
    # each of the d rows counts every occurrence exactly once
    per_row = {j: 0 for j in range(3)}
    for r in rows:
        per_row[r.row] += r.cnt
    assert per_row == {0: 10, 1: 10, 2: 10}


def test_cms_estimate_never_undercounts(spark):
    rng = np.random.default_rng(3)
    words = [f"w{int(i)}" for i in rng.integers(0, 50, size=400)]
    true = {}
    for w in words:
        true[w] = true.get(w, 0) + 1
    df = _toks(spark, words)
    cnt = cms_counters(df, "tok", depth=3, width=64)
    items = df.distinct()
    est = {
        r.item: r.est
        for r in cms_estimate(cnt, items, "tok", depth=3, width=64).collect()
    }
    assert set(est) == set(true)
    for w, t in true.items():
        assert est[w] >= t  # CMS upper bound property


def test_cms_estimate_exact_when_no_collisions(spark):
    words = ["x"] * 7 + ["y"] * 2
    df = _toks(spark, words)
    cnt = cms_counters(df, "tok", depth=3, width=1024)
    est = {
        r.item: r.est
        for r in cms_estimate(cnt, df.distinct(), "tok", depth=3, width=1024).collect()
    }
    assert est == {"x": 7, "y": 2}


def test_cms_heavy_hitters_finds_all_true_hitters(spark):
    words = ["hot"] * 50 + ["warm"] * 10 + [f"cold{i}" for i in range(30)]
    hh = {
        r.item: r.est
        for r in cms_heavy_hitters(
            _toks(spark, words), "tok", threshold=40, depth=3, width=256
        ).collect()
    }
    assert "hot" in hh and hh["hot"] >= 50
    assert "warm" not in hh  # 10 + tiny collision noise < 40 at this width


# --------------------------------------------------------------------------
# int8 quantization
# --------------------------------------------------------------------------

def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_int8_golden(spark):
    out = int8_quantize(_emb(spark, [(1, [1.0, -0.5, 0.25])])).collect()[0]
    # scale = 1/127; codes = round(v*127) = 127, -64 (rounds away), 32
    assert out.n_dims == 3
    assert out.scale == pytest.approx(1.0 / 127)
    assert out.codes == "127,-64,32"
    assert (out.q_min, out.q_max) == (-64, 127)


def test_int8_zero_vector(spark):
    out = int8_quantize(_emb(spark, [(1, [0.0, 0.0])])).collect()[0]
    assert out.scale == 0.0 and out.codes == "0,0" and out.recon_err == 0.0


def test_int8_roundtrip_error_bound(spark):
    rng = np.random.default_rng(11)
    vecs = [(i, rng.standard_normal(32).astype("float32").tolist()) for i in range(20)]
    for r in int8_quantize(_emb(spark, vecs)).collect():
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 32
        assert all(-127 <= c <= 127 for c in codes)
        orig = np.array(dict(vecs)[r.vec_id], dtype=np.float64)
        recon = np.array(codes, dtype=np.float64) * r.scale
        # per-element error bounded by scale/2 (+ rounding slack)
        assert np.max(np.abs(orig - recon)) <= r.scale / 2 + 1e-9
        assert r.recon_err == pytest.approx(float(np.sum((orig - recon) ** 2)), abs=1e-6)


def test_int8_is_narrow_plan(spark):
    df = int8_quantize(_emb(spark, [(1, [1.0, 2.0])]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map, zero shuffle


# --------------------------------------------------------------------------
# embedding standardization
# --------------------------------------------------------------------------

def test_dim_stats_match_numpy(spark):
    from pennsieve_streaming_spark.llm.quantize import embedding_dim_stats

    rng = np.random.default_rng(4)
    vecs = [(i, rng.uniform(-2, 2, 8).astype("float32").tolist()) for i in range(100)]
    stats = {r.dim: (r.n, r.mean, r.std) for r in embedding_dim_stats(
        _emb(spark, vecs)).collect()}
    arr = np.array([v for _, v in vecs], dtype=np.float64)
    for d in range(8):
        n, mean, std = stats[d]
        assert n == 100
        assert mean == pytest.approx(arr[:, d].mean(), abs=1e-5)
        assert std == pytest.approx(arr[:, d].std(), abs=1e-5)


def test_standardize_zero_mean_unit_var(spark):
    from pennsieve_streaming_spark.llm.quantize import (
        embedding_dim_stats,
        standardize_embeddings,
    )

    rng = np.random.default_rng(8)
    vecs = [(i, rng.normal(3.0, 2.0, 4).astype("float32").tolist()) for i in range(200)]
    emb = _emb(spark, vecs)
    z = standardize_embeddings(emb, embedding_dim_stats(emb))
    arr = np.array([r.embedding for r in z.orderBy("vec_id").collect()])
    assert arr.shape == (200, 4)
    assert np.abs(arr.mean(axis=0)).max() < 1e-4
    assert np.abs(arr.std(axis=0) - 1.0).max() < 1e-4


def test_standardize_constant_dim_maps_to_zero(spark):
    from pennsieve_streaming_spark.llm.quantize import (
        embedding_dim_stats,
        standardize_embeddings,
    )

    vecs = [(i, [7.0, float(i)]) for i in range(10)]
    emb = _emb(spark, vecs)
    z = standardize_embeddings(emb, embedding_dim_stats(emb))
    for r in z.collect():
        assert r.embedding[0] == 0.0


def test_channel_mad_golden(spark):
    from pennsieve_streaming_spark.operators.stats import channel_mad

    # values 1..9 plus a 1000 outlier (n=10): median interpolates
    # between sorted[4]=5 and sorted[5]=6 -> 5.5; deviations |x-5.5|
    # sorted: .5,.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 -> MAD = 2.5
    rows = [("a", t, float(v)) for t, v in enumerate(range(1, 10))] + [("a", 99, 1000.0)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    [r] = channel_mad(df).collect()
    assert (r.n, r.median, r.mad) == (10, 5.5, 2.5)
    # robustness: the outlier barely moves the MAD; std would be ~297


def test_embedding_outliers_flags_injected_artifact(spark):
    from pennsieve_streaming_spark.llm.quantize import (
        embedding_dim_stats,
        embedding_outliers,
    )

    import random

    rng = random.Random(41)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)
    ]
    rows.append((999, [25.0] * 16))  # broken encoder row
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_outliers(
        embs, embedding_dim_stats(embs), z_threshold=3.0
    ).collect()
    assert [r.vec_id for r in out] == [999]
    assert out[0].score > 3.0
