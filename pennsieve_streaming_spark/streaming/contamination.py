"""Streaming benchmark decontamination: the batch
``contamination_screened`` rule (llm/curation.py — bloom pre-screen
as a narrow map, exact ``array_intersect`` behind the ratio gate)
applied per document AS IT ARRIVES.

The screen is STATELESS — each document's verdict depends only on its
own text plus the fixed benchmark model (bloom word array + sorted
shingle set), so the streaming flavor is a pure projection over a
stream-static broadcast join: no state store, no watermark, append
mode, and the drained table is bit-identical to the batch operator on
the same rows — the batch SQL is the oracle verbatim. This is the
ingest-time shape of decontamination a production corpus feed runs
(screen at the door, not in a nightly sweep).

The benchmark model is built ONCE driver-side from the static
benchmark DataFrame (bounded model state, the BPE-merge rule) and
ships as a 1-row broadcast joined on a literal key — the standard
stream-static equi-join, so a megabit bloom still costs one broadcast,
never a per-row literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.curation import (
    _bloom_p2,
    benchmark_shingle_set,
    bloom_bits_for,
    bloom_test_col_expr,
    bloom_words_from_hashes,
    shingle_hash_arr_expr,
    TOKS,
)


def contamination_screen_stream(
    docs_stream: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    n_bits: int | None = None,
) -> DataFrame:
    """Per-arriving-document screened-decontamination verdicts.

    ``docs_stream``: streaming (doc_id, text) rows. ``benchmark``: a
    STATIC DataFrame (the eval set is fixed at stream start; a changed
    benchmark is a new query). Output columns and arithmetic are the
    batch :func:`~pennsieve_streaming_spark.llm.curation.
    contamination_screened` contract verbatim: (doc_id, n_shingles,
    n_bloom_hits, n_overlap, overlap_ratio, contaminated).

    Plan / 100 TB stream: one BroadcastHashJoin on the literal key
    (the 1-row model side), then a narrow projection per micro-batch —
    stateless, so throughput is scan-bound and backpressure-free.
    """
    if n_bits is not None:
        _bloom_p2(n_bits)  # validate up front: ValueError off-ladder
    bench_set = benchmark_shingle_set(benchmark, k)
    bench_hashes = [
        int(h) for h in (bench_set.collect()[0]["bench_sh"] or [])
    ]
    m = bloom_bits_for(len(bench_hashes)) if n_bits is None else n_bits
    words = bloom_words_from_hashes(bench_hashes, m)
    spark = benchmark.sparkSession
    model = spark.createDataFrame(
        [(1, words, bench_hashes)],
        "_jk int, bloom_words array<bigint>, bench_sh array<bigint>",
    )
    test = bloom_test_col_expr("h", m)
    sh_arr = shingle_hash_arr_expr(k)
    docs = docs_stream.select(
        "doc_id",
        F.expr(TOKS).alias("toks"),
        F.lit(1).alias("_jk"),
    ).select("doc_id", F.expr(sh_arr).alias("doc_sh"), "_jk")
    joined = docs.join(F.broadcast(model), "_jk")
    screened = joined.select(
        "doc_id",
        "doc_sh",
        "bench_sh",
        F.expr("size(doc_sh)").cast("long").alias("n_shingles"),
        F.expr(f"size(filter(doc_sh, h -> {test}))")
        .cast("long")
        .alias("n_bloom_hits"),
    ).select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        F.expr(
            f"CASE WHEN CAST(n_bloom_hits AS DOUBLE) <= "
            f"{threshold} * CAST(n_shingles AS DOUBLE) "
            "THEN CAST(0 AS BIGINT) "
            "ELSE CAST(size(array_intersect(doc_sh, bench_sh)) "
            "AS BIGINT) END"
        ).alias("n_overlap"),
    )
    return screened.select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        "n_overlap",
        F.expr(
            "CASE WHEN n_shingles = 0 THEN CAST(0 AS DOUBLE) "
            "ELSE n_overlap / CAST(n_shingles AS DOUBLE) END"
        ).alias("overlap_ratio"),
    ).withColumn(
        "contaminated", F.col("overlap_ratio") > F.lit(threshold)
    )
