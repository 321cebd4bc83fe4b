"""Power-iteration PCA: recovers the dominant direction, is
partitioning-invariant, and projects consistently."""

from __future__ import annotations

import numpy as np
import pytest

from pennsieve_streaming_spark.llm.pca import (
    pca_loadings_df,
    power_iteration_pca,
    project_top_component,
)

DIM = 8


def _emb(spark, arr):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(arr)],
        "vec_id long, embedding array<float>",
    )


def _planted(n=300, seed=0, strength=6.0):
    rng = np.random.default_rng(seed)
    direction = np.zeros(DIM)
    direction[2] = 0.8
    direction[5] = -0.6
    scores = rng.normal(0, strength, n)
    noise = rng.normal(0, 0.5, (n, DIM))
    return scores[:, None] * direction[None, :] + noise, direction


def test_pca_recovers_planted_direction(spark):
    arr, direction = _planted()
    v, eigval = power_iteration_pca(_emb(spark, arr), DIM, n_iter=10)
    v = np.array(v)
    cos = abs(float(v @ direction))  # sign is init-dependent
    assert cos > 0.99
    assert eigval > 0


def test_pca_partitioning_invariant(spark):
    arr, _ = _planted(seed=3)
    df = _emb(spark, arr)
    v1, e1 = power_iteration_pca(df.coalesce(1), DIM, n_iter=5)
    v2, e2 = power_iteration_pca(df.repartition(13), DIM, n_iter=5)
    assert v1 == v2 and e1 == e2  # bit-identical (quantized sums)


def test_pca_loadings_df_shape_and_unit_norm(spark):
    arr, _ = _planted(seed=5)
    rows = pca_loadings_df(spark, _emb(spark, arr), DIM, n_iter=6).collect()
    assert len(rows) == DIM
    norm = sum(r.loading**2 for r in rows) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-6)
    assert len({r.eigval for r in rows}) == 1


def test_projection_matches_numpy_dot(spark):
    arr, _ = _planted(n=50, seed=7)
    df = _emb(spark, arr)
    v, _ = power_iteration_pca(df, DIM, n_iter=6)
    got = {r.vec_id: r.score for r in project_top_component(df, v).collect()}
    f32 = arr.astype(np.float32).astype(np.float64)
    for i in range(50):
        want = 0.0
        for d in range(DIM):  # same ordered fold
            want += f32[i, d] * v[d]
        assert got[i] == pytest.approx(round(want, 9), abs=1e-9)


def test_all_but_top_residual_orthogonal(spark):
    """Removing the top component leaves residuals ~orthogonal to it:
    total residual energy << total energy along the planted axis."""
    import numpy as np

    arr, _ = _planted(n=200, seed=9, strength=8.0)
    df = _emb(spark, arr)
    v, eigval = power_iteration_pca(df, DIM, n_iter=10)
    vlit = v
    from pyspark.sql import functions as F

    dot_expr = (
        "aggregate(zip_with(embedding, array("
        + ", ".join(repr(float(x)) for x in vlit)
        + "), (x, w) -> CAST(x AS DOUBLE) * w), CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    scored = df.select(
        F.expr(dot_expr).alias("dot"),
        F.expr(
            "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (a, b) -> a + b)"
        ).alias("norm2"),
    ).collect()
    total = sum(r.norm2 for r in scored)
    along = sum(r.dot * r.dot for r in scored)
    # the planted axis dominates: at least 90% of energy is along it
    assert along / total > 0.9
