"""Streaming crawl-dedup pre-screen: the batch
``crawl_bloom_screen`` rule (llm/dedup.py — the standing corpus's
shingle set folded into one bitset, every new document scored in one
narrow map) applied per document AS IT ARRIVES.

Like the decontamination stream, the screen is STATELESS — each
verdict depends only on the arriving text plus the fixed
standing-corpus bloom — so the streaming flavor is a pure projection
over a stream-static broadcast join: no state store, no watermark,
append mode, and the drained table is bit-identical to the batch
operator on the same rows (the batch SQL is the oracle verbatim).
This is the ingest-time shape of crawl dedup: flag near-dups of the
standing corpus at the door, queue only the flagged few for the exact
containment audit.

The bloom is built ONCE from the static standing corpus with the
DISTRIBUTED ``standing_bloom`` fold (the driver holds only the
finished m/64-word bitset — corpus shingles never collect), then
ships as a 1-row broadcast joined on a literal key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.curation import (
    TOKS,
    bloom_test_col_expr,
    shingle_hash_arr_expr,
)
from pennsieve_streaming_spark.llm.dedup import shingles, standing_bloom


def crawl_screen_stream(
    docs_stream: DataFrame,
    standing_docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    n_bits: int | None = None,
) -> DataFrame:
    """Per-arriving-document bloom containment verdicts against the
    standing corpus.

    ``docs_stream``: streaming (doc_id, text) rows. ``standing_docs``:
    a STATIC DataFrame (the standing corpus is fixed at stream start;
    the next crawl's corpus is a new query). Output columns and
    arithmetic are the batch :func:`~pennsieve_streaming_spark.llm.
    dedup.crawl_bloom_screen` contract verbatim: (doc_id, n_shingles,
    n_bloom_hits, bloom_ratio, flagged).

    Plan / 100 TB stream: one BroadcastHashJoin on the literal key
    (the 1-row bitset side), then a narrow projection per
    micro-batch — stateless, scan-bound, backpressure-free.
    """
    words, m = standing_bloom(shingles(standing_docs, k), n_bits)
    spark = standing_docs.sparkSession
    model = spark.createDataFrame(
        [(1, words)], "_jk int, bloom_words array<bigint>"
    )
    test = bloom_test_col_expr("h", m)
    docs = docs_stream.select(
        "doc_id",
        F.expr(TOKS).alias("toks"),
        F.lit(1).alias("_jk"),
    ).select(
        "doc_id", F.expr(shingle_hash_arr_expr(k)).alias("doc_sh"), "_jk"
    )
    return (
        docs.join(F.broadcast(model), "_jk")
        .select(
            "doc_id",
            F.expr("size(doc_sh)").cast("long").alias("n_shingles"),
            F.expr(f"size(filter(doc_sh, h -> {test}))")
            .cast("long")
            .alias("n_bloom_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_bloom_hits",
            F.expr(
                "CASE WHEN n_shingles = 0 THEN CAST(0 AS DOUBLE) "
                "ELSE n_bloom_hits / CAST(n_shingles AS DOUBLE) END"
            ).alias("bloom_ratio"),
            F.expr(
                "CASE WHEN n_shingles = 0 THEN false "
                "ELSE n_bloom_hits / CAST(n_shingles AS DOUBLE) "
                f">= {threshold} END"
            ).alias("flagged"),
        )
    )
