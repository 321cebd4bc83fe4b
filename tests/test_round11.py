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


def test_standing_bloom_matches_driver_fold(spark):
    """The distributed bit_or bloom build is bit-identical to the
    driver-side bloom_words_from_hashes fold on the same hash set —
    the invariant that lets the corpus-scale build replace the
    collect-based one."""
    from pennsieve_streaming_spark.llm.curation import (
        bloom_words_from_hashes,
    )
    from pennsieve_streaming_spark.llm.dedup import standing_bloom

    hashes = [h * 2_654_435_761 % (1 << 61) for h in range(1, 400)]
    df = spark.createDataFrame([(h,) for h in hashes], "sh long")
    words, m = standing_bloom(df, n_bits=16_384)
    assert m == 16_384
    assert words == bloom_words_from_hashes(hashes, 16_384)


def test_standing_bloom_autosize_and_ladder(spark):
    from pennsieve_streaming_spark.llm.dedup import standing_bloom
    import pytest as _pytest

    df = spark.createDataFrame([(h,) for h in range(2_000)], "sh long")
    _, m = standing_bloom(df)  # 2000 * 16 = 32000 -> 32768 rung
    assert m == 32_768
    with _pytest.raises(ValueError):
        standing_bloom(df, n_bits=10_000)


def test_crawl_screen_no_false_negatives(spark, sf_dir):
    """Bloom ratio >= exact containment on EVERY delta doc (the no-
    false-negative contract the screened audit's gate relies on), and
    every exact dup is flagged."""
    from pyspark.sql import functions as F

    scr = {
        r.doc_id: r
        for r in entry.q_crawl_screen(spark, sf_dir).collect()
    }
    exact = {
        r.doc_id: r
        for r in entry.q_incremental_dedup(spark, sf_dir).collect()
    }
    assert set(exact) <= set(scr)  # screen covers shingle-less docs too
    for doc_id, e in exact.items():
        s = scr[doc_id]
        assert s.n_shingles == e.n_shingles
        assert s.bloom_ratio >= e.containment - 1e-12
        if e.is_dup:
            assert s.flagged


def test_screened_verdicts_match_exact(spark, sf_dir):
    """is_dup verdicts of the screened composition are identical to
    the unscreened exact audit, and flagged rows carry the exact
    containment values."""
    scr = {
        r.doc_id: r
        for r in entry.q_incremental_dedup_screened(
            spark, sf_dir
        ).collect()
    }
    exact = {
        r.doc_id: r
        for r in entry.q_incremental_dedup(spark, sf_dir).collect()
    }
    for doc_id, e in exact.items():
        s = scr[doc_id]
        assert s.is_dup == e.is_dup
        if s.bloom_ratio >= 0.5 and s.n_shingles > 0:
            assert (s.best_match_id, s.inter, s.containment) == (
                e.best_match_id,
                e.inter,
                e.containment,
            )
        else:
            assert (s.best_match_id, s.inter, s.containment) == (
                -1,
                0,
                0.0,
            )


def test_crawl_gain_mass_conservation(spark, sf_dir):
    """novel + dup token masses equal the delta's total token mass,
    and dup doc counts equal the exact audit's."""
    from pyspark.sql import functions as F

    out = entry.q_crawl_gain(spark, sf_dir).collect()
    docs = entry._docs(spark, sf_dir).filter(F.col("source") == "src0")
    from pennsieve_streaming_spark.llm.curation import N_TOKENS

    tot = docs.selectExpr(f"sum({N_TOKENS}) AS t", "count(1) AS n").collect()[0]
    assert sum(r.novel_tokens + r.dup_tokens for r in out) == tot.t
    assert sum(r.n_docs for r in out) == tot.n
    n_dup = sum(
        1
        for r in entry.q_incremental_dedup(spark, sf_dir).collect()
        if r.is_dup
    )
    assert sum(r.n_dups for r in out) == n_dup


def test_coverage_panel_golden(spark):
    """Hand golden: ch A spans days 10..14 with day 12-13 dark (one
    2-day outage), 6 samples against an exact expected count; ch B is
    a single-sample channel (span 1 day, expected 1, fill 1.0)."""
    from pennsieve_streaming_spark.operators.gaps import (
        DAY_US,
        coverage_panel,
    )

    rows = [
        ("A", 10 * DAY_US + 0, 1.0),
        ("A", 10 * DAY_US + 100_000, 1.0),
        ("A", 11 * DAY_US, 1.0),
        ("A", 14 * DAY_US, 1.0),
        ("A", 14 * DAY_US + 200_000, 1.0),
        ("A", 14 * DAY_US + 300_000, 1.0),
        ("B", 20 * DAY_US + 5, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "channel string, ts long, value double"
    )
    out = {r.channel: r for r in coverage_panel(df).collect()}
    a = out["A"]
    assert (a.start_day, a.end_day, a.span_days) == (10, 14, 5)
    assert (a.active_days, a.max_outage_days) == (3, 2)
    assert a.day_coverage == round(3 / 5, 9)
    expected = (14 * DAY_US + 300_000 - 10 * DAY_US) // 100_000 + 1
    assert (a.n_samples, a.expected_samples) == (6, expected)
    assert a.fill_ratio == round(6 / expected, 9)
    b = out["B"]
    assert (b.span_days, b.active_days, b.max_outage_days) == (1, 1, 0)
    assert (b.expected_samples, b.fill_ratio) == (1, 1.0)


def test_loudness_range_golden(spark):
    """Hand golden: 3 complete 4-sample frames with energies 4, 400,
    40000 (n=3 -> p10 rank 1, p95 rank 3): e_p10=4, e_p95=40000,
    dyn range = 10*log10(10000) = 40 dB exactly; a ragged 2-sample
    tail frame drops."""
    from pennsieve_streaming_spark.dsp.spectral import loudness_range

    vals = [1, -1, 1, -1, 10, -10, 10, -10, 100, -100, 100, -100, 7, 7]
    rows = [("a", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "channel string, ts long, value double"
    )
    out = loudness_range(df, frame=4, quant=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_frames, r.e_p10, r.e_p95) == (3, 4, 40000)
    assert r.dyn_range_db == 40.0


def test_rate_estimate_golden(spark):
    """Hand golden: channel at a perfect 100ms cadence with one
    10x outage gap — 10 gaps: nine 100_000s and one 1_000_000.
    p10 rank=(10+9)//10=1 -> 100000; median rank=(11)//2=5 -> 100000;
    p90 rank=(90+9)//10=9 -> 100000 (the outage sits at rank 10);
    est 10 Hz exactly, rate_ok true. A 2-sample channel estimates
    from its single gap."""
    from pennsieve_streaming_spark.operators.gaps import rate_estimate

    rows = [("a", i * 100_000, 1.0) for i in range(10)]
    rows.append(("a", 9 * 100_000 + 1_000_000, 1.0))
    rows += [("b", 0, 1.0), ("b", 200_000, 1.0)]
    df = spark.createDataFrame(
        rows, "channel string, ts long, value double"
    )
    out = {r.channel: r for r in rate_estimate(df).collect()}
    a = out["a"]
    assert a.n_gaps == 10
    assert (a.p10_gap_us, a.median_gap_us, a.p90_gap_us) == (
        100_000,
        100_000,
        100_000,
    )
    assert a.jitter_us == 0
    assert a.est_rate_hz == 10.0
    assert a.rate_ok
    b = out["b"]
    assert (b.n_gaps, b.median_gap_us, b.est_rate_hz) == (
        1,
        200_000,
        5.0,
    )
    assert not b.rate_ok


def test_matryoshka_recall_invariants(spark, sf_dir):
    """Recall at prefix 32 >= recall at prefix 16 is NOT guaranteed
    pointwise, but both are in [0,1], full-dim self-recall is 1 by
    construction, and n_queries matches the ground-truth query set."""
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.llm.similarity import cosine_topk

    out = {
        r.prefix_dim: r
        for r in entry.q_matryoshka_recall(spark, sf_dir).collect()
    }
    assert set(out) == {32, 16}
    embs = entry._embs(spark, sf_dir)
    nq = (
        cosine_topk(embs, embs.filter(F.col("vec_id") < 20), k=5)
        .select("query_id")
        .distinct()
        .count()
    )
    for r in out.values():
        assert r.n_queries == nq
        assert 0.0 <= r.min_recall <= r.mean_recall <= 1.0
