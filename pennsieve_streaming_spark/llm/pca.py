"""Power-iteration PCA over the embedding corpus (top principal
component; Mises/von Mises iteration — the textbook distributed PCA
building block).

Use-cases in the pipeline: dimensionality reduction before ANN,
whitening diagnostics, and the all-but-the-top embedding
post-processing trick (Mu & Viswanath 2018) that removes the dominant
common direction.

Each iteration is ONE Spark job: per row, ``dot = <x, v>`` (an
in-array ordered fold, JVM-side), then per-dimension sums of
``x_d * dot`` — quantized to 1e-6 BIGINTs so the cross-row reduction
is exact under any partitioning (the operators/rolling.py contract).
Only the dim-length vector (model state) reaches the driver, exactly
like ``kmeans_fit``; normalization + the 9-dp per-iteration rounding
happen driver-side with the same IEEE ops the SQL oracle replays in
chained CTEs — the fit is bit-reproducible cross-engine.

Init is the exact binary vector [1/8, 1/8, ...] for dim 64 (any dim:
1/sqrt(dim) rounded to 9 dp), so there is no RNG anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def _round9(x: float) -> float:
    return round(x, 9)


def power_iteration_pca(
    embeddings: DataFrame,
    dim: int,
    n_iter: int = 8,
    vec_col: str = "embedding",
) -> tuple[list[float], float]:
    """Returns (unit loading vector rounded to 9 dp per iteration,
    eigenvalue estimate = ||X^T X v|| at the last step, 9 dp)."""
    v = [_round9(1.0 / math.sqrt(dim))] * dim
    eigval = 0.0
    for _ in range(int(n_iter)):
        v_lit = "array(" + ", ".join(repr(float(x)) for x in v) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {v_lit}, "
            "(x, w) -> CAST(x AS DOUBLE) * w), "
            "CAST(0 AS DOUBLE), (a, b) -> a + b)"
        )
        sums = (
            embeddings.select(
                F.expr(dot).alias("_dot"), F.col(vec_col).alias("_v")
            )
            .select(
                F.posexplode(
                    F.expr(
                        f"transform(_v, x -> "
                        f"CAST(round(CAST(x AS DOUBLE) * _dot * {QUANT}) AS BIGINT))"
                    )
                ).alias("dim", "c")
            )
            .groupBy("dim")
            .agg(F.sum("c").cast("long").alias("s"))
            .collect()
        )
        s = [0] * dim
        for row in sums:
            s[row["dim"]] = int(row["s"])
        w = [sd / QUANT for sd in s]
        acc = 0.0
        for d in range(dim):
            acc = acc + w[d] * w[d]
        norm = math.sqrt(acc)
        if norm == 0.0:
            break
        v = [_round9(w[d] / norm) for d in range(dim)]
        eigval = _round9(norm)
    return v, eigval


def pca_loadings_df(
    spark, embeddings: DataFrame, dim: int, n_iter: int = 8
) -> DataFrame:
    """(dim, loading, eigval) rows for the fitted top component."""
    v, eigval = power_iteration_pca(embeddings, dim, n_iter)
    return spark.createDataFrame(
        [(d, v[d], eigval) for d in range(dim)],
        "dim long, loading double, eigval double",
    )


def project_top_component(
    embeddings: DataFrame, loadings: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Score each vector on the component: (vec_id, score) with the
    same ordered-fold dot product as the fit — a narrow map, no
    shuffle."""
    v_lit = "array(" + ", ".join(repr(float(x)) for x in loadings) + ")"
    dot = (
        f"aggregate(zip_with({vec_col}, {v_lit}, "
        "(x, w) -> CAST(x AS DOUBLE) * w), "
        "CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    return embeddings.select(
        "vec_id", F.expr(f"round({dot}, 9)").alias("score")
    )
