"""BM25 search + inverted index (llm/text.py retrieval surface)."""

from __future__ import annotations

import math

from pennsieve_streaming_spark.llm.text import bm25_search, inverted_index


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_golden(spark):
    docs = _docs(
        spark,
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "Apple"),
            (4, "   "),  # empty after trim: excluded entirely
        ],
    )
    rows = {r.term: r for r in inverted_index(docs).collect()}
    assert set(rows) == {"apple", "banana", "cherry"}
    assert rows["apple"].df == 2 and rows["apple"].cf == 3
    assert rows["apple"].postings == "1,3"
    assert rows["banana"].df == 2 and rows["banana"].postings == "1,2"
    assert rows["cherry"].df == 1 and rows["cherry"].cf == 1
    # min_df filters rare terms
    kept = {r.term for r in inverted_index(docs, min_df=2).collect()}
    assert kept == {"apple", "banana"}


def _bm25_ref(docs, query_terms, k1=1.2, b=0.75):
    """Plain-python BM25 with the operator's 9-dp quantization."""
    toks = {d: t.split() for d, t in docs.items() if t.strip()}
    n_docs = len(docs)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n_docs
    df = {}
    for ts in toks.values():
        for t in set(x.lower() for x in ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for d, ts in toks.items():
        low = [x.lower() for x in ts]
        parts = []
        for t in sorted(set(query_terms) & set(low)):
            tf = low.count(t)
            idf = round(math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)), 9)
            part = round(
                idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl[d] / avgdl))),
                9,
            )
            parts.append(part)
        if parts:
            s = 0.0
            for p in parts:
                s += p
            scores[d] = s
    return scores


def test_bm25_golden_and_ranks(spark):
    corpus = {
        1: "apple banana apple cherry",
        2: "banana banana banana",
        3: "apple cherry cherry durian",
        4: "unrelated words entirely",
        5: "",
    }
    docs = _docs(spark, list(corpus.items()))
    out = bm25_search(docs, [(7, "apple cherry")], top_k=3).collect()
    got = {r.doc_id: (r.score, r.rank) for r in out}
    assert all(r.query_id == 7 for r in out)
    ref = _bm25_ref(corpus, ["apple", "cherry"])
    # docs 4 and 5 match nothing -> absent
    assert set(got) == set(ref) == {1, 3}
    for d in ref:
        assert abs(got[d][0] - ref[d]) < 1e-12, d
    # doc 3 has cherry twice -> must outrank doc 1? verify against ref
    order = sorted(ref, key=lambda d: (-ref[d], d))
    assert [d for d, _ in sorted(got.items(), key=lambda kv: kv[1][1])] == order


def test_bm25_rank_tie_breaks_by_doc_id(spark):
    docs = _docs(spark, [(10, "same text"), (2, "same text")])
    out = bm25_search(docs, [(0, "same")], top_k=10).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    assert by_rank == {1: 2, 2: 10}


def test_bm25_top_k_enforced(spark):
    docs = _docs(spark, [(i, f"shared word{i}") for i in range(20)])
    out = bm25_search(docs, [(0, "shared")], top_k=5).collect()
    assert len(out) == 5
    assert sorted(r.rank for r in out) == [1, 2, 3, 4, 5]


def test_bm25_multi_query_independent(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma")])
    out = bm25_search(docs, [(0, "alpha"), (1, "gamma")], top_k=10).collect()
    q0 = {r.doc_id for r in out if r.query_id == 0}
    q1 = {r.doc_id for r in out if r.query_id == 1}
    assert q0 == {1}
    assert q1 == {2, 3}


def test_bm25_random_vs_bruteforce(spark):
    import random

    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(15)]
    corpus = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30)))
        for i in range(1, 26)
    }
    qterms = ["t1", "t5", "t9"]
    docs = _docs(spark, list(corpus.items()))
    out = bm25_search(docs, [(0, " ".join(qterms))], top_k=1000).collect()
    got = {r.doc_id: r.score for r in out}
    ref = _bm25_ref(corpus, qterms)
    assert set(got) == set(ref)
    for d in ref:
        assert abs(got[d] - ref[d]) < 1e-12, d


def test_vocab_and_encoding_golden(spark):
    from pennsieve_streaming_spark.llm.text import build_vocab, encode_token_ids

    docs = _docs(
        spark,
        [
            (1, "b a b c B"),
            (2, "a c"),
            (3, "   "),
        ],
    )
    vocab = {r.term: (r.token_id, r["count"]) for r in build_vocab(docs).collect()}
    # counts: b=3 (lowercased), a=2, c=2 -> rank b=1, then a<c
    assert vocab == {"b": (1, 3), "a": (2, 2), "c": (3, 2)}
    enc = {r.doc_id: r for r in encode_token_ids(docs, build_vocab(docs)).collect()}
    assert enc[1].token_ids == "1,2,1,3,1"
    assert enc[1].n_tokens == 5
    assert enc[2].token_ids == "2,3"
    assert enc[3].token_ids == "" and enc[3].n_tokens == 0


def test_encoding_unknown_terms_are_zero(spark):
    from pennsieve_streaming_spark.llm.text import build_vocab, encode_token_ids

    train = _docs(spark, [(1, "known words only")])
    test = _docs(spark, [(9, "known unknown words")])
    vocab = build_vocab(train)
    enc = encode_token_ids(test, vocab).collect()[0]
    ids = enc.token_ids.split(",")
    assert len(ids) == 3
    assert "0" in ids  # 'unknown' not in the training vocab


def test_vocab_min_count(spark):
    from pennsieve_streaming_spark.llm.text import build_vocab

    docs = _docs(spark, [(1, "a a a b")])
    kept = {r.term for r in build_vocab(docs, min_count=2).collect()}
    assert kept == {"a"}


def test_inverted_index_max_df_drops_stopword_postings(spark):
    from pennsieve_streaming_spark.llm.text import inverted_index

    docs = _docs(spark, [(i, f"the word{i}") for i in range(10)])
    full = {r.term for r in inverted_index(docs).collect()}
    assert "the" in full
    capped = {r.term for r in inverted_index(docs, max_df=5).collect()}
    assert "the" not in capped
    assert len(capped) == 10  # every word{i} survives


# -------------------------------------------------------------- winnowing


def _winnow_py(tokens, k, w):
    """Reference winnowing per the SIGMOD'03 paper: rightmost min of
    each window of k-gram hashes (same md5-prefix-int hash family)."""
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 40)

    grams = [
        h(" ".join(tokens[i:i + k])) for i in range(len(tokens) - k + 1)
    ]
    sel = set()
    for e in range(w - 1, len(grams)):
        win = grams[e - w + 1:e + 1]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, v in enumerate(win) if v == m)
        sel.add((e - w + 1 + off + 1, m))  # 1-based gram pos
    return sel


def test_winnow_matches_reference_implementation(spark):
    import random

    from pennsieve_streaming_spark.llm.dedup import winnow_fingerprints

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(10):
        n = rng.randrange(3, 40)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(docs, k=3, window=4).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for d, text in rows:
        toks = text.split()
        want = _winnow_py(toks, 3, 4) if len(toks) >= 3 else set()
        assert got.get(d, set()) == want, f"doc {d}"


def test_winnow_shared_run_guarantee(spark):
    """Any shared token run of window + k - 1 tokens must produce at
    least one shared fingerprint between the two documents."""
    from pennsieve_streaming_spark.llm.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "x1 x2 x3 " + shared + " y1 y2"),
        (2, "z9 z8 " + shared + " q5 q6 q7"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=5, window=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    # shared run length 8 == window + k - 1 -> guaranteed overlap
    assert fps[1] & fps[2]


def test_winnow_overlap_containment(spark):
    """A document fully embedded in a larger one scores containment
    1.0 when the host preserves every winnowed fingerprint region."""
    from pennsieve_streaming_spark.llm.dedup import winnow_overlap_pairs

    core = " ".join(f"tok{i}" for i in range(30))
    rows = [
        (1, core),
        (2, "pre1 pre2 pre3 " + core + " post1 post2"),
        (3, "completely different words entirely here now ok then"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_overlap_pairs(docs, k=5, window=4, min_shared=1).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # every fingerprint of doc 1 interior should recur in doc 2
    assert r.containment >= 0.8
    assert not any(3 in p for p in pairs)


def test_zipf_fit_recovers_power_law(spark):
    """A synthetic corpus with freq(rank) = C / rank must fit slope
    ≈ -1; numpy polyfit on the same (ln r, ln c) points agrees."""
    import math

    import numpy as np

    from pennsieve_streaming_spark.llm.text import zipf_fit

    # term_i appears floor(1000/i) times
    words = []
    for i in range(1, 60):
        words += [f"w{i:03d}"] * (1000 // i)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    [r] = zipf_fit(docs).collect()
    assert r.n_terms == 59
    xs = [math.log(i) for i in range(1, 60)]
    ys = [math.log(1000 // i) for i in range(1, 60)]
    want_slope, want_icpt = np.polyfit(xs, ys, 1)
    assert abs(r.slope - want_slope) < 1e-3
    assert abs(r.intercept - want_icpt) < 2e-1


# --------------------------------------------------------------------------
# BPE tokenizer training (llm/text.bpe_merges)
# --------------------------------------------------------------------------

def _ref_bpe(texts, k):
    """Sennrich reference loop: overlapping pair counts, greedy
    left-to-right merge, (n DESC, l, r) tie-break."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            words[w.lower()] += 1
    state = {w: list(w) for w in words}
    out = []
    for it in range(1, k + 1):
        stats = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                stats[(a, b)] += words[w]
        if not stats:
            break
        (l, r), n = sorted(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        out.append((it, l, r, n))
        for w, toks in state.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            state[w] = merged
    return out


def test_bpe_matches_reference_impl(spark):
    from pennsieve_streaming_spark.llm.text import bpe_merges

    texts = [
        "the cat sat on the mat",
        "the hat of the cat",
        "aaaa aaa banana bandana",
        "low lower lowest newer newest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.it, r.left_tok, r.right_tok, r.pair_count)
        for r in bpe_merges(docs, n_merges=10).orderBy("it").collect()
    ]
    assert got == _ref_bpe(texts, 10)


def test_bpe_run_parity_greedy(spark):
    """'a a a a' must merge to [aa, aa] (5+ raw pair count, 2 merges),
    'aaa' to [aa, a] — the greedy left-to-right convention, where the
    relational run-parity rule earns its keep."""
    from pennsieve_streaming_spark.llm.text import bpe_merges

    docs = spark.createDataFrame(
        [(0, "aaaa aaa aa")], "doc_id long, text string"
    )
    got = [
        (r.it, r.left_tok, r.right_tok, r.pair_count)
        for r in bpe_merges(docs, n_merges=2).orderBy("it").collect()
    ]
    # iter 1: (a,a) with overlapping count 3+2+1 = 6
    assert got[0] == (1, "a", "a", 6)
    # after greedy merge: aaaa->[aa,aa], aaa->[aa,a], aa->[aa]
    # iter 2 pairs: (aa,aa)=1, (aa,a)=1 -> tie broken by (l, r): (aa,a)
    assert got[1] == (2, "aa", "a", 1)


def test_bpe_exhausts_pairs_early(spark):
    from pennsieve_streaming_spark.llm.text import bpe_merges

    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    got = bpe_merges(docs, n_merges=5).collect()
    # one merge (a,b) then single-token words -> no pairs -> stop
    assert len(got) == 1 and (got[0].left_tok, got[0].right_tok) == ("a", "b")


def test_bpe_encode_matches_reference(spark):
    from pennsieve_streaming_spark.llm.text import bpe_encode

    texts = ["low lower lowest", "new newer newest", "low new"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    k = 6
    got = {}
    for r in bpe_encode(docs, n_merges=k, min_count=2).collect():
        got.setdefault(r.doc_id, []).append((r.seq, r.token_id, r.tok))
    for v in got.values():
        v.sort()

    # python reference: train (min_count=2), segment, rank inventory
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.split():
            words[w.lower()] += 1
    trained = {w: c for w, c in words.items() if c >= 2}
    state = {w: list(w) for w in trained}
    for _ in range(k):
        stats = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                stats[(a, b)] += trained[w]
        if not stats:
            break
        (l, r), _n = sorted(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        for w, toks in state.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            state[w] = merged
    freq = Counter()
    for w, toks in state.items():
        for t in toks:
            freq[t] += trained[w]
    inv = {
        t: i + 1
        for i, (t, _) in enumerate(
            sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    want = {}
    for d, text in enumerate(texts):
        seq = 0
        out = []
        for w in text.split():
            w = w.lower()
            toks = state.get(w, list(w))  # OOV -> characters
            for t in toks:
                out.append((seq, inv.get(t, 0), t))
                seq += 1
        want[d] = out
    assert got == want


def test_collocations_pmi_semantics(spark):
    """A phrase pair occurring only together gets the maximal PMI for
    its frequency; a pair of independent common words lands near 0 and
    falls below the threshold; min_count gates rare pairs."""
    import math

    # 20 docs: "alpha beta" always adjacent (phrase), "x"/"y" common
    # but paired randomly, "rare pair" appears twice only
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta x y x y"))
    rows.append((100, "rare pair"))
    rows.append((101, "rare pair"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pennsieve_streaming_spark.llm.text import collocations

    out = {r.bigram: r for r in collocations(df, 3, 0.5).collect()}
    assert "alpha beta" in out
    r = out["alpha beta"]
    assert r.c_ab == 20 and r.c_a == 20 and r.c_b == 20
    # exact PMI: ln(c_ab*N1^2 / (N2*c_a*c_b))
    n1 = 20 * 6 + 4
    n2 = 20 * 5 + 2
    want = round(math.log(20 * n1 * n1 / (n2 * 20 * 20)), 9)
    assert abs(r.pmi - want) < 1e-9
    assert "rare pair" not in out          # min_count = 3 > 2
    assert all(b != "y x" or out[b].pmi < 1.0 for b in out)


def test_rake_keywords_golden(spark):
    """Hand-computed RAKE: degree counts phrase lengths with
    multiplicity; the co-occurring word lifts its phrases; ties break
    on phrase text; stopword-only docs vanish."""
    from pennsieve_streaming_spark.llm.text import rake_keywords

    rows = [
        (1, "deep learning of the deep network"),
        (2, "the of and"),            # all stopwords -> no phrases
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rake_keywords(df, 3).collect()
    d1 = sorted(
        [(r.phrase, r.n_words, r.score, r.rank) for r in out if r.doc_id == 1]
    )
    # freq: deep 2, learning 1, network 1; deg: deep 4, learning 2,
    # network 2 -> wscores 2.0 each -> both phrases score 4.0
    assert d1 == [
        ("deep learning", 2, 4.0, 1),
        ("deep network", 2, 4.0, 2),
    ]
    assert not [r for r in out if r.doc_id == 2]
    d3 = [r for r in out if r.doc_id == 3]
    assert len(d3) == 1 and d3[0].phrase == "solo" and d3[0].score == 1.0


def test_rake_keywords_case_folding(spark):
    from pennsieve_streaming_spark.llm.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "Graph THE graph")], "doc_id long, text string"
    )
    out = rake_keywords(df, 3).collect()
    # "Graph" and "graph" are one word; two 1-word phrases collapse
    assert len(out) == 1
    r = out[0]
    assert (r.phrase, r.score) == ("graph", 1.0)


def test_chunk_passages_coverage_and_overlap(spark):
    """Every token is covered, consecutive chunks overlap by
    size - stride, the fully-covered runt is skipped, and short docs
    yield exactly one chunk."""
    from pennsieve_streaming_spark.llm.text import chunk_passages

    words = [f"w{i}" for i in range(50)]
    rows = [
        (1, " ".join(words)),          # 50 tokens
        (2, "a b c"),                  # 3 tokens -> one chunk
        (3, ""),                       # empty -> nothing
        (4, " ".join(f"x{i}" for i in range(32))),  # exactly one window
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_passages(df, 8, 6).collect()

    d1 = sorted(
        [r for r in out if r.doc_id == 1], key=lambda r: r.chunk_id
    )
    # starts 0,6,...,42 emit; 48 is NOT emitted (42+8=50 covers all)
    assert [r.start_tok for r in d1] == [0, 6, 12, 18, 24, 30, 36, 42]
    assert all(r.n_chunk_tokens == 8 for r in d1)
    # overlap: chunk k starts 2 tokens before chunk k-1 ends
    assert d1[1].chunk_text.split()[:2] == words[6:8]
    # full coverage: union of [start, start+8) spans 0..50
    covered = set()
    for r in d1:
        covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
    assert covered == set(range(50))

    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_chunk_tokens == 3
    assert not [r for r in out if r.doc_id == 3]

    out4 = chunk_passages(df.filter("doc_id = 4"), 32, 24).collect()
    assert len(out4) == 1 and out4[0].n_chunk_tokens == 32


def test_passage_bm25_localizes_the_match(spark):
    """A long document with the query terms buried in one region must
    surface the CONTAINING passage; the passage outranks chunks of
    the same doc without the terms."""
    from pennsieve_streaming_spark.llm.text import (
        bm25_search,
        chunk_passages,
    )
    from pyspark.sql import functions as F

    filler = " ".join(f"w{i}" for i in range(60))
    target = "spark window agg"
    rows = [
        (1, filler + " " + target + " " + filler),
        (2, " ".join(f"z{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_passages(df, 16, 12)
    corpus = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    out = bm25_search(corpus, [(0, target)], top_k=3).collect()
    best = min(out, key=lambda r: r.rank)
    src, cid = best.doc_id // 1000, best.doc_id % 1000
    assert src == 1
    # the winning chunk actually contains the query terms
    win = [r.chunk_text for r in chunks.collect()
           if r.doc_id == 1 and r.chunk_id == cid][0]
    assert "spark" in win and "agg" in win


def test_textrank_hub_word_wins(spark):
    """'spark' co-occurs with every other candidate (hub) so PageRank
    ranks it first; a single-candidate doc survives via dangling
    redistribution; stopwords never appear."""
    from pennsieve_streaming_spark.llm.text import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "spark engine and spark cluster and spark shuffle"),
            (2, "hello"),
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in textrank_keywords(docs, n_iter=3, k=3).collect():
        out.setdefault(r.doc_id, []).append((r.rank, r.word, r.score))
    top1 = sorted(out[1])[0]
    assert top1[1] == "spark"
    assert all(w not in ("and",) for _, w, _ in out[1])
    assert sorted(out[2]) == [(1, "hello", out[2][0][2])]
    assert abs(out[2][0][2] - 1.0) < 1e-6   # all mass stays on the word


def test_heaps_law_power_corpus(spark):
    """A corpus engineered so V = N^0.5 exactly at every checkpoint
    (doc d contributes 2d-1 tokens, all new -> N_d = d^2 = V_d^2...
    actually V grows linearly: make every token new so V = N and
    beta = 1; and a repeat-heavy corpus drives beta down."""
    from pennsieve_streaming_spark.llm.text import heaps_law

    # all-new tokens: V(N) = N -> beta = 1, ln_k = 0
    docs1 = spark.createDataFrame(
        [(d, " ".join(f"w{d}_{i}" for i in range(5))) for d in range(1, 21)],
        "doc_id long, text string",
    )
    [r1] = heaps_law(docs1).collect()
    assert r1.n_docs == 20 and r1.total_tokens == 100 and r1.vocab == 100
    assert abs(r1.beta - 1.0) < 1e-6 and abs(r1.ln_k) < 1e-6

    # one shared token repeated: vocab saturates -> beta near 0
    docs2 = spark.createDataFrame(
        [(d, "same same same same") for d in range(1, 21)],
        "doc_id long, text string",
    )
    [r2] = heaps_law(docs2).collect()
    assert r2.vocab == 1 and r2.beta < 0.1


def test_global_cumsum_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pennsieve_streaming_spark.util import global_cumsum

    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(500)], "k long, v long"
    )
    got = {
        r.k: r.c
        for r in global_cumsum(df, ["k"], "v", "c", num_partitions=7)
        .collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.c
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert got == want
