"""Embedding scalar quantization (int8) — the standard storage/serve
compression for ANN corpora (public prior art: faiss
``ScalarQuantizer`` QT_8bit, Lucene/Elasticsearch int8_hnsw).

Per-vector symmetric quantization: ``scale = max|x| / 127``, code_i =
round(x_i / scale) ∈ [-127, 127]. At 100 TB this is a pure narrow map
(zero shuffle, whole-stage codegen inside Catalyst higher-order
functions); the 4×-smaller codes then feed the ANN index builders in
llm/similarity.py.

Determinism contract (oracle parity): element arithmetic casts FLOAT →
DOUBLE up front on both engines, each per-element op is a single
correctly-rounded IEEE op (one division, one round-half-away, one
multiply), and the only fold — the reconstruction error — runs in
array order on both engines (Spark ``aggregate`` and DuckDB
``list_reduce`` are both left folds), then quantizes to 9 dp. Codes
serialize as a comma-joined string so the row contract stays
scalar-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def int8_quantize(embeddings: DataFrame) -> DataFrame:
    """Symmetric per-vector int8 quantization of ``embedding``.

    Output: (vec_id, n_dims, scale, codes, q_min, q_max, recon_err) —
    ``codes`` is the comma-joined int8 code vector, ``recon_err`` the
    9-dp-quantized sum of squared reconstruction residuals. Zero
    vectors (scale = 0) encode as all-zero codes with zero error.
    """
    scale = F.expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), "
        "(acc, v) -> greatest(acc, abs(CAST(v AS DOUBLE)))) / 127.0"
    )
    codes_arr = F.expr(
        "CASE WHEN scale = 0 THEN transform(embedding, v -> 0) "
        "ELSE transform(embedding, v -> "
        "CAST(round(CAST(v AS DOUBLE) / scale) AS INT)) END"
    )
    err = F.expr(
        "CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) ELSE round("
        "aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + "
        "(CAST(v AS DOUBLE) - CAST(round(CAST(v AS DOUBLE) / scale) AS INT) * scale)"
        " * (CAST(v AS DOUBLE) - CAST(round(CAST(v AS DOUBLE) / scale) AS INT) * scale)"
        "), 9) END"
    )
    return (
        embeddings.select(
            "vec_id",
            F.size("embedding").cast("long").alias("n_dims"),
            scale.alias("scale"),
            F.col("embedding"),
        )
        .withColumn("_codes", codes_arr)
        .withColumn("recon_err", err)
        .select(
            "vec_id",
            "n_dims",
            "scale",
            F.array_join(
                F.expr("transform(_codes, c -> CAST(c AS STRING))"), ","
            ).alias("codes"),
            F.array_min("_codes").cast("long").alias("q_min"),
            F.array_max("_codes").cast("long").alias("q_max"),
            "recon_err",
        )
    )


def embedding_dim_stats(embeddings: DataFrame, quant: int = 1_000_000) -> DataFrame:
    """Per-dimension corpus statistics of the embedding column — the
    fit step of feature standardization (z-norm), PCA preprocessing,
    and drift monitoring.

    Output: (dim, n, mean, std) — moments from exact ``quant``-quantized
    BIGINT sums (associative ⇒ partition-order independent; with
    |v| ≲ 10 and quant 1e6 the squared sums hold to ~1e9 vectors per
    dimension before int64 pressure — drop quant to 1e3 beyond that),
    then one fixed float expression. Plan: posexplode (narrow) + one
    partial-agg groupBy to |dims| rows.
    """
    q = int(quant)
    el = embeddings.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.expr(f"CAST(round(CAST(v AS DOUBLE) * {q}) AS BIGINT)").alias("vq"),
        F.expr(
            f"CAST(round(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * {q}) AS BIGINT)"
        ).alias("vq2"),
    )
    agg = el.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vq").cast("long").alias("sq"),
        F.sum("vq2").cast("long").alias("sq2"),
    )
    return agg.select(
        "dim",
        "n",
        F.expr(f"CAST(sq AS DOUBLE) / {q} / n").alias("mean"),
        F.expr(
            f"sqrt(greatest(CAST(sq2 AS DOUBLE) / {q} / n "
            f"- (CAST(sq AS DOUBLE) / {q} / n) * (CAST(sq AS DOUBLE) / {q} / n), "
            "CAST(0 AS DOUBLE)))"
        ).alias("std"),
    )


def standardize_embeddings(
    embeddings: DataFrame, dim_stats: DataFrame
) -> DataFrame:
    """Z-normalize each embedding against per-dimension (mean, std)
    from :func:`embedding_dim_stats` — zero-std dimensions map to 0.

    Output: (vec_id, embedding array<double>). Plan: posexplode →
    broadcast join on the |dims|-row stats → re-assemble in position
    order (the per-vector array is bounded by the dimensionality, so
    the collect is safe at any corpus size).
    """
    el = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "v")
    joined = el.join(F.broadcast(dim_stats.select("dim", "mean", "std")), "dim")
    z = F.expr(
        "CASE WHEN std = 0 THEN CAST(0 AS DOUBLE) "
        "ELSE (CAST(v AS DOUBLE) - mean) / std END"
    )
    return (
        joined.select("vec_id", "dim", z.alias("z"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(dim, z))), s -> s.z)"
            ).alias("embedding")
        )
    )


def embedding_outliers(
    embeddings: DataFrame,
    dim_stats: DataFrame,
    z_threshold: float,
) -> DataFrame:
    """Embedding-space outlier screen: vectors whose standardized
    Mahalanobis-diagonal distance (the L2 norm of the z-normalized
    vector, scaled by 1/sqrt(d)) exceeds ``z_threshold`` — broken
    encoders, padding artifacts and off-manifold rows surface here
    before they poison ANN indexes or k-means fits.

    The norm is a sequential fold over the standardized array (same
    determinism contract as every dot product here); the gate compares
    the score's 9-dp rounding. Output: (vec_id, score) for flagged
    rows, score = ||z(v)||₂ / sqrt(d).

    Plan: standardization is a broadcast of |dims| stats; the score is
    a narrow map — zero extra shuffles over the scan.
    """
    std = standardize_embeddings(embeddings, dim_stats)
    score = (
        "sqrt(aggregate(embedding, CAST(0 AS DOUBLE), "
        "(acc, x) -> acc + x * x) / size(embedding))"
    )
    return (
        std.withColumn("score", F.expr(score))
        .filter(F.expr(f"round({score}, 9)") > float(z_threshold))
        .select("vec_id", "score")
    )
