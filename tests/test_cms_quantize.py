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
