"""Round-10 golden back-fill (VERDICT r9 item 5): the 10 thinnest
registry queries per tools/golden_density.py get hand-computed goldens
through the REAL q_ functions over a hand-built miniature sf_dir —
every expected value below is derived on paper, including the epoch
arithmetic (1995-01-01 = day 9131 = 788 918 400 000 000 µs).

Covered: ts_channel_minmax, ts_epoch_rebase, ts_resample_decision,
ts_interleave, doc_token_stats, doc_lang_id, doc_langid_confusion,
doc_dedup_stats, doc_dedup_filter, emb_norms.
"""

from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

E95 = 788_918_400_000_000  # epoch_us('1995-01-01') — 9131 * 86400e6
T1992 = 694_224_000_000_000
WEEK_US = 7 * 86_400 * 1_000_000
# all mini samples land in week bucket floor((E95+δ − T1992)/week) = 156
BUCKET = (E95 - T1992) // WEEK_US
DUP_TEXT = "the cat and the dog in a house of it is"


@pytest.fixture(scope="module")
def mini_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mini_sf"))
    day = datetime.date(1995, 1, 1)
    li = spark.createDataFrame(
        [
            (1, 1, 0, 100.0, day),
            (2, 1, 0, 300.0, day),
            (1, 2, 1, 50.0, day),
            (3, 1, 1, 70.0, day),
        ],
        "l_orderkey long, l_linenumber long, l_suppkey long, "
        "l_extendedprice double, l_shipdate date",
    )
    li.coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    docs = spark.createDataFrame(
        [
            (0, DUP_TEXT, "en", "web", len(DUP_TEXT)),
            (1, "der hund ist nicht ein das und der", "de", "blog", 34),
            (2, "zzz qqq", "en", "blog", 7),
            (3, DUP_TEXT, "en", "blog", len(DUP_TEXT)),
            (4, DUP_TEXT, "en", "web", len(DUP_TEXT)),
            (5, "Hello, world!", "en", "misc", 13),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    embs = spark.createDataFrame(
        [
            (0, [3.0, 4.0], 0),
            (1, [1.0, 0.0], 1),
            (2, [0.0, 0.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    embs.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_channel_minmax_golden(spark, mini_dir):
    out = {r.channel: r for r in
           entry.q_channel_minmax(spark, mini_dir).collect()}
    assert set(out) == {"ch0", "ch1"}
    r0 = out["ch0"]
    # ch0: prices 100/300, ts = E95 + orderkey*10 + linenumber
    assert (r0.min_val, r0.max_val) == (100.0, 300.0)
    assert (r0.start_ts, r0.end_ts) == (E95 + 11, E95 + 21)
    r1 = out["ch1"]
    assert (r1.min_val, r1.max_val) == (50.0, 70.0)
    assert (r1.start_ts, r1.end_ts) == (E95 + 12, E95 + 31)


def test_epoch_rebase_golden(spark, mini_dir):
    out = {r.channel: r for r in
           entry.q_epoch_rebase(spark, mini_dir).collect()}
    # ch0 span = (E95+21) - (E95+11) = 10 µs; ch1 = 31 - 12 = 19 µs
    assert (out["ch0"].max_rebased_ts, out["ch0"].n_samples) == (10, 2)
    assert (out["ch1"].max_rebased_ts, out["ch1"].n_samples) == (19, 2)


def test_resample_decision_golden(spark, mini_dir):
    # channels_view pins rate = 10.0 Hz -> period 1e5 µs; resample iff
    # pixel_width / period > 3, i.e. width > 300 000
    out = {(r.channel, r.pixel_width): r.resample
           for r in entry.q_resample_decision(spark, mini_dir).collect()}
    for ch in ("ch0", "ch1"):
        assert out[(ch, 200_000)] is False
        assert out[(ch, 350_000)] is True
        assert out[(ch, 5_000_000)] is True


def test_interleave_golden(spark, mini_dir):
    # one occupied week bucket per channel -> the wire order is
    # [min at pos 2b, max at pos 2b+1]
    out = {(r.channel, r.pos): r.v
           for r in entry.q_interleave(spark, mini_dir).collect()}
    assert out == {
        ("ch0", 2 * BUCKET): 100.0,
        ("ch0", 2 * BUCKET + 1): 300.0,
        ("ch1", 2 * BUCKET): 50.0,
        ("ch1", 2 * BUCKET + 1): 70.0,
    }


def test_token_stats_golden(spark, mini_dir):
    out = {r.doc_id: r for r in
           entry.q_token_stats(spark, mini_dir).collect()}
    r = out[5]  # "Hello, world!"
    assert (r.n_chars, r.n_tokens, r.n_alpha, r.n_punct) == (13, 2, 10, 2)
    assert r.avg_token_len == 6.0  # "Hello," + "world!" = 12 chars / 2
    # BPE pretokenizer: ["Hello", ",", " world", "!"]
    assert r.n_tokens_bpe == 4
    r2 = out[2]  # "zzz qqq"
    assert (r2.n_chars, r2.n_tokens, r2.n_alpha, r2.n_punct) == (7, 2, 6, 0)


def test_lang_id_golden(spark, mini_dir):
    out = {r.doc_id: r for r in
           entry.q_lang_id(spark, mini_dir).collect()}
    # doc0: 7 en-marker hits (the x2, and, in, a, of, is) vs 0 others
    assert out[0].predicted_lang == "en" and out[0].correct
    # doc1: 7 de-marker hits (der x2, und, das, ist, nicht, ein)
    assert out[1].predicted_lang == "de" and out[1].correct
    # doc2: all scores 0 -> tie resolves to priority head 'en'
    assert out[2].predicted_lang == "en" and out[2].correct
    assert out[5].predicted_lang == "en"


def test_langid_confusion_golden(spark, mini_dir):
    out = {(r.lang, r.predicted_lang): r for r in
           entry.q_langid_confusion(spark, mini_dir).collect()}
    # en-labeled: docs 0,2,3,4,5 all predicted en; de-labeled: doc1
    assert set(out) == {("en", "en"), ("de", "de")}
    assert out[("en", "en")].n == 5 and out[("en", "en")].share == 1.0
    assert out[("de", "de")].n == 1 and out[("de", "de")].share == 1.0


def test_dedup_stats_golden(spark, mini_dir):
    out = {r.source: r for r in
           entry.q_dedup_stats(spark, mini_dir).collect()}
    # web: docs 0 and 4 share one digest -> 2 docs / 1 unique
    assert (out["web"].n_docs, out["web"].n_unique,
            out["web"].n_dups, out["web"].dup_rate) == (2, 1, 1, 0.5)
    # blog: 1, 2, 3 all distinct texts within the source
    assert (out["blog"].n_docs, out["blog"].n_unique,
            out["blog"].n_dups, out["blog"].dup_rate) == (3, 3, 0, 0.0)
    assert (out["misc"].n_docs, out["misc"].n_unique) == (1, 1)


def test_dedup_filter_golden(spark, mini_dir):
    # docs 0/3/4 are byte-identical 11-token texts -> LSH pairs with
    # jaccard 1.0 -> the higher ids (3, 4) drop; docs 2 and 5 are
    # under the 3-token shingle floor -> never paired -> survive
    out = sorted(r.doc_id for r in
                 entry.q_dedup_filter(spark, mini_dir).collect())
    assert out == [0, 1, 2, 5]


def test_emb_norms_golden(spark, mini_dir):
    out = {r.vec_id: r for r in
           entry.queries()["emb_norms"](spark, mini_dir).collect()}
    assert (out[0].l2_norm, out[0].dim) == (5.0, 2)
    assert (out[1].l2_norm, out[1].dim) == (1.0, 2)
    assert (out[2].l2_norm, out[2].dim) == (0.0, 2)
