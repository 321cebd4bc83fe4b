"""Round-11 additions: the composed incremental-crawl build
(doc_incremental_build) and supporting fixes."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry  # noqa: E402


def _mini_corpus(spark, tmp_path):
    """Hand-built corpus exercising every stage of the incremental
    build: delta-internal exact dup, standing-corpus near-dup,
    a multi-sequence survivor, and a small survivor. lang=de (rate
    1.0) so the sampling gate always passes and the golden stays
    hand-checkable."""
    big = " ".join(f"w{i}" for i in range(300))  # 300 distinct tokens
    rows = [
        # standing corpus (source != src0)
        (1, "zz yy xx ww vv uu tt", "de", "src1"),
        (2, "mm nn oo pp qq rr", "de", "src1"),
        (29, "b1 b2 b3 b4", "de", "src1"),  # the benchmark doc (29%29=0)
        # delta (src0)
        (11, "aa bb cc dd ee ff gg hh", "de", "src0"),
        (12, "aa bb cc dd ee ff gg hh", "de", "src0"),  # exact dup of 11
        (13, "zz yy xx ww vv uu tt", "de", "src0"),  # copy of standing 1
        (14, big, "de", "src0"),
        (15, "small unique doc here now ok", "de", "src0"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    d = str(tmp_path / "mini")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    texts = {r[0]: r[1] for r in rows}
    return d, texts


def test_incremental_build_golden(spark, tmp_path):
    """End-to-end hand golden: survivors are exactly {11, 14, 15}
    (12 exact-deduped, 13 screened against the standing corpus), the
    pack offsets cross one sequence boundary, and every manifest mass
    and checksum is replayed independently."""
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    d, texts = _mini_corpus(spark, tmp_path)
    out = {
        r.shard: (
            r.n_docs,
            r.n_tokens,
            r.n_chars,
            r.n_seqs_touched,
            r.checksum,
        )
        for r in entry.q_incremental_build(spark, d).collect()
    }

    # survivors and their pack spans, hand-derived (PACK_BUDGET=256,
    # doc_id order within src0): 11 -> offset 0, seqs {0};
    # 14 (300 toks) -> offset 8, seqs {0, 1}; 15 -> offset 308, {1}
    surv = {11: (8, {0}), 14: (300, {0, 1}), 15: (6, {1})}

    # replay the shard / content hashes through the same SQL exprs
    # (the EXPRESSIONS are golden-pinned by the shard-manifest tests)
    ref = {
        r.doc_id: (r.shard, r.h)
        for r in spark.createDataFrame(
            [(i, texts[i]) for i in surv], "doc_id long, text string"
        )
        .selectExpr(
            "doc_id",
            f"pmod({md5_hash64_expr('CAST(doc_id AS STRING)')}, 8)"
            " AS shard",
            f"{md5_hash64_expr('text')} AS h",
        )
        .collect()
    }
    exp: dict[int, list] = {}
    for doc_id, (n_toks, seqs) in surv.items():
        shard, h = ref[doc_id]
        e = exp.setdefault(shard, [0, 0, 0, set(), 0])
        e[0] += 1
        e[1] += n_toks
        e[2] += len(texts[doc_id])
        e[3] |= seqs
        e[4] = (e[4] + h) % 9223372036854775807
    assert out == {
        s: (v[0], v[1], v[2], len(v[3]), v[4]) for s, v in exp.items()
    }


def test_incremental_build_delta_only(spark, tmp_path):
    """The manifest covers ONLY delta survivors: total docs across
    shards == 3, and re-running is deterministic (same checksums)."""
    d, _ = _mini_corpus(spark, tmp_path)
    a = entry.q_incremental_build(spark, d).collect()
    assert sum(r.n_docs for r in a) == 3
    b = entry.q_incremental_build(spark, d).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_incremental_build_funnel_vs_parts(spark, sf_dir):
    """Composition consistency on real testdata: the build's kept doc
    mass equals what the standalone parts produce — delta exact-dedup
    minus screen dups minus gate rejects."""
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.llm.curation import curate_corpus
    from pennsieve_streaming_spark.llm.dedup import (
        cross_corpus_containment,
        exact_dedup,
        shingles,
    )

    docs = entry._docs(spark, sf_dir)
    delta = docs.filter(F.col("source") == "src0")
    standing = docs.filter(F.col("source") != "src0")
    keep = exact_dedup(delta).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    dd = delta.join(keep, "doc_id", "left_semi")
    screen = cross_corpus_containment(
        shingles(standing.unionByName(dd)),
        dd.select("doc_id"),
        threshold=0.5,
        max_doc_freq=entry.JACCARD_MAX_DF,
    )
    dup_ids = screen.filter(F.col("is_dup")).select("doc_id")
    fresh = dd.join(dup_ids, "doc_id", "left_anti")
    cur = curate_corpus(
        fresh,
        docs.filter(F.col("doc_id") % entry.CONTAM_BENCH_MOD == 0),
        entry.SAMPLE_RATES,
        pack_budget=entry.PACK_BUDGET,
    )
    want_docs = cur.count()
    want_tokens = (
        cur.agg(F.sum("n_tokens")).collect()[0][0] or 0
    )
    out = entry.q_incremental_build(spark, sf_dir).collect()
    assert sum(r.n_docs for r in out) == want_docs
    assert sum(r.n_tokens for r in out) == want_tokens
