"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query.

Derived-view arithmetic (pennsieve_streaming_spark/tables.py) is kept
bit-identical between the Spark (DataFrame) and DuckDB (SQL) sides so
order-insensitive value hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.operators import (
    apply_montage,
    contiguous_spans,
    downsample_minmax_count,
    downsample_minmax_time,
    event_summary_fixed,
    event_summary_data_driven,
    fill_gaps,
    montage_pairs,
    number_sequentially,
    resample_arrays_minmax,
    resample_ingest_segments,
    samples_to_spans,
    window_query,
)
from pennsieve_streaming_spark.tables import with_views
from pennsieve_streaming_spark.util import pin
from pennsieve_streaming_spark.llm import (
    cosine_topk,
    exact_dedup,
    fingerprint,
    jaccard_pairs,
    lang_id,
    lsh_band_keys,
    lsh_bucketed_ann,
    lsh_candidate_pairs,
    minhash_signatures,
    minhash_wide,
    quality_score,
    shingles,
    simhash,
    simhash_near_pairs,
    token_stats,
)
from pennsieve_streaming_spark.llm.hashing import (
    P_MINHASH,
    md5_hash64_duck,
    minhash_perm_constants,
    poly_hash_duck,
)
from pennsieve_streaming_spark.llm.curation import (
    block_dedup,
    contamination,
    curate_corpus,
    mixture_weights,
    pack_sequences,
    pii_scrub,
    quality_thresholds,
    repetition_stats,
    unigram_lm_score,
    source_best,
    stratified_sample,
)
from pennsieve_streaming_spark.llm.multimodal import (
    extract_features,
    media_from_documents,
    sample_frames,
)

# ---------------------------------------------------------------------------
# Shared literal parameters (identical on both engines)
# ---------------------------------------------------------------------------
US = 1_000_000
T1992 = 694_224_000_000_000      # epoch_us('1992-01-01')
T1995 = 788_918_400_000_000      # epoch_us('1995-01-01')
T1995H2 = 804_556_800_000_000    # epoch_us('1995-07-01')
T1999 = 915_148_800_000_000      # epoch_us('1999-01-01')
EV_START = 1_704_067_200_000_000  # epoch_us('2024-01-01')
EV_END = EV_START + 35 * 86_400 * US
WEEK_US = 7 * 86_400 * US
PIXEL_EV_US = 6 * 3600 * US      # 6h event-summary pixel
GAP_THRESHOLD_US = 1800 * US     # 30 min session gap
CHUNK_SIZE = 50                   # count-downsample chunk
CUT_CHUNKS = 3                    # A3 equal-cut target
RT_PIXEL_US = 100_000             # realtime pixel duration
# Butterworth golden-window query (G1-G3): bounded so the DuckDB
# recursive-CTE oracle replays the recurrence sample-by-sample
BW_TS_END = 1_500_000             # lead channel, first 1500 samples
BW_TYPE, BW_ORDER, BW_FREQ, BW_RATE = "lowpass", 4, 100.0, 1000.0
ANN_PLANES, ANN_DIM, ANN_K = 8, 64, 5
IVF_LISTS, IVF_PROBE = 16, 2
EMB_NEAR_DUP_COS = 0.3            # near-dup threshold (synthetic embs)
EMB_SAMPLE_CAP = 20               # per-cluster cap for cluster_sample
EMB_LSH_TABLES, EMB_LSH_BITS = 4, 8  # banded hyperplane LSH (B tables × r bits)
PQ_M, PQ_CODES = 8, 16            # PQ subspaces / codewords
IVFPQ_PROBE = 4                   # IVF-PQ coarse lists probed per query
DOC_QUALITY_TAU = 0.48            # pipeline quality gate (corpus median)
JACCARD_MAX_DF = 64               # hot-shingle cap for all-pairs mode


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: weekly min/max downsample of all derived channels at
    sf0.001 (the reference's visually-load-bearing A1 operator)."""
    sf_dir = "/root/testdata/sf0.001"
    samples = TBL.samples_view(spark, sf_dir)
    return downsample_minmax_time(samples, T1992, T1999, WEEK_US)


# ---------------------------------------------------------------------------
# Query callables
# ---------------------------------------------------------------------------

def q_window(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    return window_query(s, "ch3", T1995, T1995H2, limit=500)


def q_window_limit0(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    return window_query(s, "ch3", T1995, T1995H2, limit=0)


def q_downsample_time(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    return downsample_minmax_time(s, T1992, T1999, WEEK_US)


def q_downsample_count(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    return downsample_minmax_count(s, CHUNK_SIZE)


def q_fill_gaps(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    mm = downsample_minmax_time(s, T1992, T1999, WEEK_US)
    return fill_gaps(mm).select(
        "channel", "bucket", "min_val", "max_val", "filled_min", "filled_max"
    )


def q_gap_spans(spark, sf_dir):
    # Single-pass sessionization: at sf0.1 (100k events, 5 channels) one
    # window per channel beats the two-phase form (the extra stage costs
    # more than 5->175-task parallelism buys). At 100 TB per-channel
    # cardinality, pass block_us to contiguous_spans for the blocked
    # two-phase plan — bit-identical output (property-tested in
    # test_operators.py, oracle-checked both ways this round).
    ev = TBL.chan_events_view(spark, sf_dir)
    return contiguous_spans(samples_to_spans(ev), GAP_THRESHOLD_US)


def q_sequence_numbering(spark, sf_dir):
    spans = q_gap_spans(spark, sf_dir)
    return number_sequentially(spans)


def q_montage(spark, sf_dir):
    s = TBL.samples_aligned_view(spark, sf_dir)
    pairs = montage_pairs(spark, [("lead", "sec")])
    return apply_montage(s, pairs)


def q_event_summary(spark, sf_dir):
    ev = TBL.chan_events_view(spark, sf_dir)
    return event_summary_fixed(
        ev, EV_START, EV_END, PIXEL_EV_US, order_cols=("ts", "value")
    )


def q_event_index(spark, sf_dir):
    ev = TBL.chan_events_view(spark, sf_dir)
    w = Window.partitionBy("channel").orderBy("ts", "value")
    return ev.withColumn("idx", (F.row_number().over(w) - F.lit(1)).cast("long"))


def q_epoch_rebase(spark, sf_dir):
    # Optimization r11 (guide §2.4): the original form windowed
    # ``ts - min(ts) OVER (PARTITION BY channel)`` over every sample
    # and then aggregated — one full exchange+sort of the sample table
    # just to subtract a per-channel constant that the final
    # aggregation re-derives anyway. Since ts is integral,
    # ``max(ts - min_c) == max(ts) - min(ts)`` exactly, so the whole
    # query is ONE partial-aggregated groupBy (map-side combine, an
    # 8-row shuffle) with bit-identical output. The serving-path
    # epoch-rebase operator (operators/window.py) still rebases real
    # streams; this registry query's per-channel summary needs no
    # window at all.
    s = TBL.samples_view(spark, sf_dir)
    return s.groupBy("channel").agg(
        (F.max("ts") - F.min("ts")).alias("max_rebased_ts"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def q_channels_catalog(spark, sf_dir):
    return TBL.channels_view(spark, sf_dir)


def q_resample_decision(spark, sf_dir):
    ch = TBL.channels_view(spark, sf_dir)
    widths = spark.createDataFrame(
        [(200_000,), (350_000,), (5_000_000,)], "pixel_width long"
    )
    # A2: resample iff pixel_width/(1e6/rate) > 3.0
    return ch.crossJoin(widths).select(
        "channel",
        "pixel_width",
        (
            (F.col("pixel_width") / (F.lit(1e6) / F.col("rate"))) > F.lit(3.0)
        ).alias("resample"),
    )


def _lineitem_positions(spark, sf_dir):
    """Long-form (key, pos, m, v) per order — window-based, no array
    materialization (pos = row_number, m = count over the order)."""
    from pennsieve_streaming_spark.operators.spikes import resample_positions_minmax  # noqa: F401

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    wo = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_extendedprice")
    wc = Window.partitionBy("l_orderkey")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_extendedprice").alias("v"),
        (F.row_number().over(wo) - F.lit(1)).cast("long").alias("pos"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )


def q_cut_resample(spark, sf_dir):
    from pennsieve_streaming_spark.operators.spikes import resample_positions_minmax

    pos = _lineitem_positions(spark, sf_dir).withColumnRenamed("l_orderkey", "spike_ts")
    return resample_positions_minmax(pos, CUT_CHUNKS, key_cols=("spike_ts",))


def q_realtime_resample(spark, sf_dir):
    # Optimization r11 (guide §2.4, exchange reuse by the subset
    # rule): position the rows with a window keyed on the DERIVED
    # segment key ``start_ts`` (= l_orderkey * 1e6, a bijection, so
    # pos/m are unchanged) instead of the raw l_orderkey. The
    # operator's groupBy(channel, start_ts, bucket, ...) then contains
    # the window's partition key as the same attribute, and
    # HashPartitioning(start_ts) satisfies the aggregation's
    # ClusteredDistribution — the second full exchange of the
    # positioned rows disappears (2 Exchange -> 1).
    from pennsieve_streaming_spark.operators.realtime import (
        resample_ingest_positions,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select(
        F.concat(F.lit("rt"), (F.col("l_orderkey") % 4).cast("string")).alias("channel"),
        (F.col("l_orderkey") * 1_000_000).alias("start_ts"),
        (F.lit(75_000.0) * (F.lit(1) + F.col("l_orderkey") % 3)).alias("sample_period"),
        "l_linenumber",
        F.col("l_extendedprice").alias("v"),
    )
    wo = Window.partitionBy("start_ts").orderBy("l_linenumber", "v")
    wc = Window.partitionBy("start_ts")
    pos = base.select(
        "channel",
        "start_ts",
        "sample_period",
        (F.row_number().over(wo) - F.lit(1)).cast("long").alias("pos"),
        F.count(F.lit(1)).over(wc).alias("m"),
        "v",
    )
    return resample_ingest_positions(pos, RT_PIXEL_US)


def q_downsample_salted(spark, sf_dir):
    """Skew-resistant two-stage A1 (identical results to the direct
    operator — same oracle)."""
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_minmax_time_salted,
    )

    s = TBL.samples_view(spark, sf_dir)
    return downsample_minmax_time_salted(s, T1992, T1999, WEEK_US)


def q_page_concat(spark, sf_dir):
    """U1 page concatenation: two page scans unioned then windowed —
    pages vanish into one time-ordered stream."""
    s = TBL.samples_view(spark, sf_dir)
    mid = (T1995 + T1995H2) // 2
    page1 = window_query(s, "ch1", T1995, mid)
    page2 = window_query(s, "ch1", mid, T1995H2)
    return page1.unionByName(page2).orderBy("ts", "value").limit(800)


def q_emb_norms(spark, sf_dir):
    """Sequential-fold L2 norms (the dot-product kernel, oracle-gated)."""
    embs = _embs(spark, sf_dir)
    return embs.select(
        "vec_id",
        F.sqrt(
            F.expr(
                "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
                "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
                "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        ).alias("l2_norm"),
        F.size("embedding").cast("long").alias("dim"),
    )


def q_dedup_filter(spark, sf_dir):
    """End-to-end dedup: survivors after dropping LSH-verified
    near-duplicates (jaccard >= 0.5)."""
    from pennsieve_streaming_spark.llm.dedup import dedup_filter

    docs = _docs(spark, sf_dir)
    pairs = q_lsh_pairs(spark, sf_dir)
    return dedup_filter(docs, pairs, 0.5).select("doc_id", "source", "lang")


BM25_QUERIES = [
    (0, "spark window agg"),
    (1, "fast hash join"),
    (2, "slow scan customer"),
]


def q_bm25(spark, sf_dir):
    """Okapi BM25 ranking of the corpus against a fixed query set —
    the retrieval side of the text stack (tf/df reuse the TF-IDF
    aggregations; the query set is broadcast)."""
    from pennsieve_streaming_spark.llm.text import bm25_search

    return bm25_search(_docs(spark, sf_dir), BM25_QUERIES, top_k=10)


def q_passage_bm25(spark, sf_dir):
    """Passage-level BM25 — the actual RAG retrieval path: the
    gated chunker feeds the gated ranker (chunks as the corpus,
    passage_id = doc_id*1000 + chunk_id), so relevance lands on the
    best PASSAGE, not the whole document."""
    from pennsieve_streaming_spark.llm.text import (
        bm25_search,
        chunk_passages,
    )

    chunks = chunk_passages(_docs(spark, sf_dir), CHUNK_SIZE, CHUNK_STRIDE)
    corpus = chunks.select(
        (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )
    out = bm25_search(corpus, BM25_QUERIES, top_k=10)
    return out.select(
        "query_id",
        F.col("doc_id").alias("passage_id"),
        F.expr("doc_id div 1000").cast("long").alias("src_doc_id"),
        F.expr("doc_id % 1000").cast("long").alias("chunk_id"),
        "score",
        "rank",
    )


def q_inverted_index(spark, sf_dir):
    """Full-text inverted index: term -> (df, cf, ascending posting
    list as a comma-joined string)."""
    from pennsieve_streaming_spark.llm.text import inverted_index

    return inverted_index(_docs(spark, sf_dir))


def q_ann_filtered(spark, sf_dir):
    """Metadata-prefiltered exact ANN: cosine top-k over only the
    corpus rows passing a label predicate (the vector-DB 'filtered
    search' feature) — the filter prunes at the scan, before any
    scoring."""
    embs = _embs(spark, sf_dir)
    return cosine_topk(
        embs.filter(F.col("label") == 0),
        embs.filter(F.col("vec_id") < 20),
        k=5,
    )


def q_ann_two_stage(spark, sf_dir):
    """Two-stage retrieval: coarse rank on the first 32 vector
    components, exact re-rank of 40 candidates to the final top-5."""
    from pennsieve_streaming_spark.llm.similarity import cosine_topk_two_stage

    embs = _embs(spark, sf_dir)
    return cosine_topk_two_stage(
        embs, embs.filter(F.col("vec_id") < 20), k=5, coarse_dim=32, refine_k=40
    )


def _shingle_strings(spark, sf_dir):
    """Raw 3-token shingle strings (pre-hash) — the high-cardinality
    column the distinct-count sketches estimate."""
    toks = "split(trim(text), '\\\\s+')"
    arr = (
        f"CASE WHEN size({toks}) < 3 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 2), "
        f"i -> concat_ws(' ', element_at({toks}, i), "
        f"element_at({toks}, i + 1), element_at({toks}, i + 2))) END"
    )
    return _docs(spark, sf_dir).select(F.explode(F.expr(arr)).alias("s"))


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog estimate of the corpus's distinct shingle count —
    constant-state replacement for exact COUNT(DISTINCT) at scale."""
    from pennsieve_streaming_spark.llm.sketch import hll_distinct

    return hll_distinct(_shingle_strings(spark, sf_dir), "s", p=8)


def q_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) estimate of the distinct shingle count
    — integer-only sketch state, one final division."""
    from pennsieve_streaming_spark.llm.sketch import kmv_distinct

    return kmv_distinct(_shingle_strings(spark, sf_dir), "s", k=64)


def q_hll_by_source(spark, sf_dir):
    """Per-source distinct-shingle estimates — the GROUP BY form of
    the HLL sketch (constant register state per group)."""
    from pennsieve_streaming_spark.llm.sketch import hll_distinct_by

    toks = "split(trim(text), '\\\\s+')"
    arr = (
        f"CASE WHEN size({toks}) < 3 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 2), "
        f"i -> concat_ws(' ', element_at({toks}, i), "
        f"element_at({toks}, i + 1), element_at({toks}, i + 2))) END"
    )
    pairs = _docs(spark, sf_dir).select(
        "source", F.explode(F.expr(arr)).alias("s")
    )
    return hll_distinct_by(pairs, "source", "s", p=8)


def q_mix_weights_temp(spark, sf_dir):
    """Temperature-scaled (T=2) mixture weights — flattens the source
    distribution toward uniform without hand-written targets."""
    from pennsieve_streaming_spark.llm.curation import (
        mixture_weights_temperature,
    )

    return mixture_weights_temperature(_docs(spark, sf_dir), temperature=2.0)


ROLL_WINDOW_US = 7 * 86_400 * 1_000_000  # 1-week trailing window


def q_rolling_stats(spark, sf_dir):
    """Trailing-window per-channel stats (rolling mean/min/max over a
    1-week RANGE frame) — exact integer-quantized sum so the windowed
    aggregation is bit-stable under any evaluation order."""
    from pennsieve_streaming_spark.operators.rolling import rolling_stats

    s = TBL.samples_view(spark, sf_dir)
    return rolling_stats(
        s.filter(F.col("channel").isin("ch1", "ch3")),
        ROLL_WINDOW_US,
        start_us=T1995,
        end_us=T1995H2,
    )


def q_stream_sessionize(spark, sf_dir):
    """Streaming gap-span sessionization driven to completion over the
    events feed (availableNow): the emitted rows are every CLOSED span
    — the batch contiguous_spans output minus each channel's one
    still-open (latest) span, an invariant that holds wherever the
    micro-batch boundaries fall, which is what makes this
    oracle-replayable."""
    import tempfile

    from pennsieve_streaming_spark.streaming.sessionize import (
        sessionize_stream,
    )

    ev = TBL.chan_events_view(spark, sf_dir)
    spans = samples_to_spans(ev)
    base = tempfile.mkdtemp(prefix="pss_stream_sess_")
    src = f"{base}/src"
    spans.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, lo long, hi long")
        .parquet(src)
    )
    out = sessionize_stream(stream, GAP_THRESHOLD_US)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_bigram_lm(spark, sf_dir):
    """Bigram conditional-likelihood scoring — one Markov order above
    the unigram perplexity filter (catches token-order degeneracy)."""
    from pennsieve_streaming_spark.llm.curation import bigram_lm_score

    return bigram_lm_score(_docs(spark, sf_dir))


BPE_K = 8
BPE_MIN_COUNT = 2


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer training: the top-8 learned merges over the
    corpus word-frequency table — Sennrich get_stats/merge semantics
    (overlapping pair counts, greedy left-to-right merge via the
    relational run-parity rule), replayed exactly by an 8-stage
    unrolled DuckDB oracle. All-integer, no quantization."""
    from pennsieve_streaming_spark.llm.text import bpe_merges

    return bpe_merges(
        _docs(spark, sf_dir), n_merges=BPE_K, min_count=BPE_MIN_COUNT
    )


def q_bpe_word_tokens(spark, sf_dir):
    """The BPE tokenizer table: every vocab word's segmentation after
    the 8 learned merges (= the training loop's final state; the
    oracle replay's last unrolled stage is this table verbatim)."""
    from pennsieve_streaming_spark.llm.text import bpe_word_tokens

    return bpe_word_tokens(
        _docs(spark, sf_dir), n_merges=BPE_K, min_count=BPE_MIN_COUNT
    )


def q_bpe_token_ids(spark, sf_dir):
    """End-to-end BPE corpus encode: each doc's subword-id sequence
    under the trained tokenizer (OOV words fall back to characters,
    unknown chars to id 0) — collapsed to the doc_token_ids CSV row
    contract. The oracle rebuilds the same encode from the unrolled
    training replay's final stage."""
    from pennsieve_streaming_spark.llm.text import bpe_encode

    docs = _docs(spark, sf_dir)
    enc = bpe_encode(docs, n_merges=BPE_K, min_count=BPE_MIN_COUNT)
    agg = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_subtokens"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(seq, "
            "token_id))), s -> CAST(s.token_id AS STRING)), ',')"
        ).alias("token_ids"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_subtokens"), F.lit(0)).cast("long").alias(
            "n_subtokens"
        ),
        F.coalesce(F.col("token_ids"), F.lit("")).alias("token_ids"),
    )


def q_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility per language: subword tokens emitted per
    whitespace word under the trained BPE — the standard
    tokenizer-quality / language-equity metric (high fertility = the
    tokenizer fragments that language). Exact integer token/word
    sums, one float division; the oracle composes the gated
    doc_bpe_token_ids replay."""
    from pennsieve_streaming_spark.llm.text import TOKS, bpe_encode

    docs = _docs(spark, sf_dir)
    enc = bpe_encode(docs, n_merges=BPE_K, min_count=BPE_MIN_COUNT)
    per_doc = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sub")
    )
    words = docs.select(
        "doc_id", "lang", F.expr(f"size({TOKS})").cast("long").alias("n_words")
    )
    return (
        words.join(per_doc, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subtokens"),
        )
        .withColumn(
            "fertility",
            F.expr("CAST(n_subtokens AS DOUBLE) / n_words"),
        )
    )


HOLT_ANOM_K = 2.0


def q_holt_backtest(spark, sf_dir):
    """Rolling-origin one-step Holt backtest per channel: bit-exact
    residuals quantized per row to BIGINT, exact order-free MAE/MAPE
    sums, fixed final divisions."""
    from pennsieve_streaming_spark.dsp.filtering import holt_backtest

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return holt_backtest(s, HOLT_ALPHA, HOLT_BETA)


def q_holt_anomalies(spark, sf_dir):
    """Model-based anomaly detection: one-step-ahead Holt forecast
    residuals outside the per-channel median ± k·MAD envelope.
    Residuals are bit-exact (recursive-CTE class) and the envelope
    uses the explicit order-statistic interpolation, so the flag set
    is engine-identical with no quantization."""
    from pennsieve_streaming_spark.dsp.filtering import holt_anomalies

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return holt_anomalies(s, HOLT_ALPHA, HOLT_BETA, k=HOLT_ANOM_K)


def q_vocab(spark, sf_dir):
    """Frequency-ranked vocabulary build (the tokenizer table)."""
    from pennsieve_streaming_spark.llm.text import build_vocab

    return build_vocab(_docs(spark, sf_dir))


CL_MIN_COUNT, CL_MIN_PMI = 3, 0.3   # 40 collocations at sf0.01 (0 at pmi>=2 on this
#                                     independent-draw corpus) — both filters exercised


def q_collocations(spark, sf_dir):
    """PMI collocation mining: adjacent bigrams that co-occur far
    above chance (exact counts, one fixed-expression PMI, rounded
    threshold) — the phrase-promotion pass of a tokenizer pipeline."""
    from pennsieve_streaming_spark.llm.text import collocations

    return collocations(_docs(spark, sf_dir), CL_MIN_COUNT, CL_MIN_PMI)


def q_token_ids(spark, sf_dir):
    """Documents encoded as token-id sequences under the corpus vocab
    — the final step before tokenized training shards."""
    from pennsieve_streaming_spark.llm.text import build_vocab, encode_token_ids

    docs = _docs(spark, sf_dir)
    return encode_token_ids(docs, build_vocab(docs))


def q_quality_classifier(spark, sf_dir):
    """Distilled quality classifier: logistic regression trained on
    the corpus against the heuristic-quality gate (kmeans_fit-style
    driver loop, one aggregation per iteration), then scored over
    every document. The oracle replays standardization AND all ten
    training iterations as chained SQL CTEs."""
    from pennsieve_streaming_spark.llm.curation import (
        quality_classifier_fit,
        quality_classifier_score,
    )

    docs = _docs(spark, sf_dir)
    model = quality_classifier_fit(docs, lr=2.0, n_iter=10)
    return quality_classifier_score(docs, model)


def q_substring_scrub(spark, sf_dir):
    """Remove cross-document duplicated 8-gram spans, keeping the
    first occurrence (min doc_id owns the gram)."""
    from pennsieve_streaming_spark.llm.dedup import scrub_duplicated_spans

    return scrub_duplicated_spans(_docs(spark, sf_dir), k=8)


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprint selection: rightmost-min-of-window
    over 5-gram hashes, window 4 — packed-integer window-min so the
    tie rule is engine-independent."""
    from pennsieve_streaming_spark.llm.dedup import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=5, window=4)


def q_substring_dup(spark, sf_dir):
    """Exact-substring duplication profile: fraction of each document
    covered by token 8-grams that appear in >= 2 documents (fixed-width
    simplification of suffix-array dedup)."""
    from pennsieve_streaming_spark.llm.dedup import duplicated_span_stats

    return duplicated_span_stats(_docs(spark, sf_dir), k=8)


def _verified_pairs(spark, sf_dir, threshold=0.5):
    """LSH-verified near-dup pairs at the dedup threshold — the edge
    list both cluster queries consume. jaccard is an exact ratio of
    integers, so the threshold cut is bit-identical cross-engine."""
    return q_lsh_pairs(spark, sf_dir).filter(F.col("jaccard") >= threshold)


def q_dup_clusters(spark, sf_dir):
    """Duplicate-cluster labels: LSH near-dup pairs collapsed into
    connected components (large-star/small-star), every document
    labeled with the min doc_id reachable through the pair relation;
    unpaired docs are their own singleton component."""
    from pennsieve_streaming_spark.llm.graph import components_for

    return components_for(_docs(spark, sf_dir), _verified_pairs(spark, sf_dir))


def q_lp_communities(spark, sf_dir):
    """Deterministic synchronous label propagation over the verified
    near-dup graph (3 rounds, count-then-min-label argmax) — the
    community view next to the connectivity view of doc_dup_clusters;
    unrolled-CTE oracle (the PageRank iteration pattern)."""
    from pennsieve_streaming_spark.llm.graph import label_propagation

    return label_propagation(
        _docs(spark, sf_dir), _verified_pairs(spark, sf_dir), n_rounds=3
    )


def q_cluster_dedup(spark, sf_dir):
    """Cluster-level dedup: one survivor (min doc_id) per connected
    duplicate cluster — survives chained duplicates A~B~C that
    pairwise dedup would let slip through."""
    from pennsieve_streaming_spark.llm.graph import cluster_dedup

    return cluster_dedup(
        _docs(spark, sf_dir), _verified_pairs(spark, sf_dir)
    ).select("doc_id", "source", "lang", "cluster_n")


def q_graph_triangles(spark, sf_dir):
    """Triangle counts + local clustering coefficient over the
    LSH-verified near-dup graph (degree-ordered orientation, the
    standard distributed algorithm): tight template families score
    high, chain-shaped false-positive strings score low."""
    from pennsieve_streaming_spark.llm.graph import triangle_counts

    return triangle_counts(_verified_pairs(spark, sf_dir))


def q_pagerank(spark, sf_dir):
    """PageRank centrality over the LSH-verified near-dup graph:
    which copy in a duplicate neighborhood is the canonical one.
    Integer-scaled deterministic formulation (rank mass as BIGINT,
    floor-division edge shares, exact BIGINT receive sums) so the
    3-iteration fixpoint is bit-identical across engines and
    partitionings; dangling mass redistributes uniformly."""
    from pennsieve_streaming_spark.llm.graph import pagerank

    return pagerank(
        _docs(spark, sf_dir), _verified_pairs(spark, sf_dir), n_iter=3
    )


def q_interleave(spark, sf_dir):
    """Segment payload wire order as rows: the interleaved
    [min,max,min,max,...] stream (BaseTimeSeriesQuery.scala:86-88)
    with explicit positions so the oracle can hash it."""
    mm = q_downsample_time(spark, sf_dir)
    mins = mm.select(
        "channel", (F.col("bucket") * 2).alias("pos"), F.col("min_val").alias("v")
    )
    maxs = mm.select(
        "channel", (F.col("bucket") * 2 + 1).alias("pos"), F.col("max_val").alias("v")
    )
    return mins.unionByName(maxs)


def q_rollup_downsample(spark, sf_dir):
    """Continuous-aggregate path: weekly min/max pixels answered from a
    daily rollup (must equal the direct raw-scan downsample — the
    oracle computes the direct form)."""
    from pennsieve_streaming_spark.operators import build_rollup, downsample_from_rollup

    s = TBL.samples_view(spark, sf_dir)
    daily = build_rollup(
        s.filter((F.col("ts") >= T1992) & (F.col("ts") < T1999)),
        86_400_000_000,
        origin_us=T1992,
    )
    return downsample_from_rollup(daily, 86_400_000_000, T1992, T1999, WEEK_US)


def q_spike_waveforms(spark, sf_dir):
    """G4: min/max-resample fixed-length waveforms (the embeddings
    arrays stand in for spike waveform blobs) to 8 pixel points via the
    equal-cut rule."""
    embs = _embs(spark, sf_dir)
    arrays = embs.select(
        F.col("vec_id").alias("spike_ts"),
        F.col("embedding").cast("array<double>").alias("waveform"),
    )
    return resample_arrays_minmax(arrays, 8, key_cols=("spike_ts",))


def q_build_segments(spark, sf_dir):
    """S7: Segment wire-shape assembly from the downsample output,
    exploded to (segment metadata, pos, v) rows so every payload value
    and its wire position is oracle-hashable (the array column itself
    is unhashable by the driver's canonicalizer)."""
    from pennsieve_streaming_spark.operators import build_segments_minmax

    mm = q_downsample_time(spark, sf_dir)
    seg = build_segments_minmax(
        mm, T1992, T1999, chunk_time_us=float(WEEK_US), requested_period_us=WEEK_US
    )
    return seg.select(
        "channel_name",
        "source",
        "start_ts",
        "page_start",
        "page_end",
        "sample_period",
        "requested_sample_period",
        "is_min_max",
        "unit",
        "unit_m",
        "segment_type",
        "nr_points",
        F.posexplode("data").alias("pos", "v"),
    ).withColumn("pos", F.col("pos").cast("long")).withColumn(
        "unit_m", F.col("unit_m").cast("long")
    )


def q_range_lookup(spark, sf_dir):
    """S1/J3: overlap lookup against a ranges catalog built from the
    sessionized event spans (the reference's timeseries.ranges role)."""
    from pennsieve_streaming_spark.sources import range_lookup, spans_to_ranges

    spans = q_gap_spans(spark, sf_dir).drop("n_segments")
    ranges = spans_to_ranges(spans, TBL.DERIVED_RATE_HZ)
    return range_lookup(ranges, "purchase", EV_START + 5 * 86_400 * US, EV_START + 20 * 86_400 * US)


def q_channel_minmax(spark, sf_dir):
    """A7/A8: whole-stream fold to (min, max) + extent per channel."""
    s = TBL.samples_view(spark, sf_dir)
    return s.groupBy("channel").agg(
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


def q_butterworth(spark, sf_dir):
    """G1-G3: per-channel Butterworth lowpass over a bounded window —
    prewarm reflection + DF2T biquad cascade, gated by a DuckDB
    recursive-CTE oracle that replays the exact recurrence (the
    reference pins the same semantics with a golden vector,
    src/test/scala/com/pennsieve/streaming/FilterSpec.scala:52-65)."""
    from pennsieve_streaming_spark.dsp import FilterSpec, apply_filter

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= F.lit(BW_TS_END))
    )
    # ts step is 1000 µs (orderkey*1000) → nominal 1000 Hz
    return apply_filter(s, FilterSpec(BW_TYPE, BW_ORDER, BW_FREQ), rate_hz=BW_RATE)


# --- LLM-pipeline queries (documents / embeddings tables) -----------------

def _as_long(df, *cols):
    """Upcast INT columns to BIGINT at the comparison layer.

    The driver's value hash is dtype-sensitive; the oracle-type fence
    (tests/oracle_compare.py) admits only VARCHAR/BIGINT/DOUBLE/BOOLEAN,
    so library operators that naturally emit 32-bit ints (list ids,
    signature row indices, hamming distances) are widened here — in the
    registry wrapper, not in the operator — to keep library schemas
    untouched."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("long"))
    return df


def _docs(spark, sf_dir):
    TBL.ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark, sf_dir):
    TBL.ensure_session_confs(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_novelty(spark, sf_dir):
    """Per-document shingle novelty vs the corpus prefix (min-doc_id
    first-occurrence): the curriculum/boilerplate signal — exact
    counts over the shared shingle table, one fixed-expression ratio."""
    from pennsieve_streaming_spark.llm.dedup import shingle_novelty

    return shingle_novelty(_docs(spark, sf_dir))


def q_exact_dedup(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_quality_vs_dup(spark, sf_dir):
    """Quality-decile × duplicate-rate cross-signal — the curation
    sanity check that low-quality strata carry the duplication mass
    (template spam scores low AND duplicates): per quality decile,
    the share of docs whose exact-md5 group has >1 member. Composes
    two gated signals; the decile cut floors the identical quality
    double both engines compute."""
    from pennsieve_streaming_spark.llm.text import with_quality

    docs = with_quality(_docs(spark, sf_dir)).select(
        "doc_id", "text", "quality"
    )
    dup = docs.groupBy(F.md5("text").alias("_d")).agg(
        F.count(F.lit(1)).cast("long").alias("_c")
    )
    j = docs.join(dup, F.md5(docs["text"]) == F.col("_d")).select(
        F.expr(
            "CAST(least(9, CAST(floor(quality * 10) AS BIGINT)) "
            "AS BIGINT)"
        ).alias("decile"),
        F.expr("CASE WHEN _c > 1 THEN 1 ELSE 0 END").alias("_isdup"),
    )
    return j.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_isdup").cast("long").alias("n_dups"),
        F.expr(
            "CAST(SUM(_isdup) AS DOUBLE) / COUNT(*)"
        ).alias("dup_share"),
    )


def q_source_kl(spark, sf_dir):
    """Per-source KL divergence of the unigram distribution vs the
    corpus mix (dataset-mixing diagnostic) — exact nano-nat integer
    sums in DECIMAL(38,0)/HUGEINT (markov_entropy's determinism
    class)."""
    from pennsieve_streaming_spark.llm.curation import (
        source_kl_divergence,
    )

    return source_kl_divergence(_docs(spark, sf_dir))


def q_heaps_law(spark, sf_dir):
    """Heaps-law vocabulary-growth fit: exact per-doc prefix sums on
    the two-phase global cumsum, nano-nat OLS in log-log space."""
    from pennsieve_streaming_spark.llm.text import heaps_law

    return heaps_law(_docs(spark, sf_dir))


def q_textrank(spark, sf_dir):
    """TextRank keywords: 3 damped integer-PageRank rounds over the
    per-doc word-adjacency graph, top-3 words per doc."""
    from pennsieve_streaming_spark.llm.text import textrank_keywords

    return textrank_keywords(_docs(spark, sf_dir), n_iter=3, k=3)


def q_dedup_funnel(spark, sf_dir):
    """Dedup-funnel summary — docs remaining after each dedup stage
    (the pipeline-shrinkage report every curation run ends with):
    total -> exact (distinct md5) -> near-dup (one survivor per
    connected LSH cluster) -> semantic (SemDeDup survivors). Every
    stage composes an already-gated operator; counts are exact."""
    from pennsieve_streaming_spark.llm.dedup import exact_dedup
    from pennsieve_streaming_spark.llm.graph import cluster_dedup

    docs = _docs(spark, sf_dir)
    # pin the 1-row total (optimization r11): it feeds both its funnel
    # stage and the share divisor, and the second reference replayed
    # the corpus count scan.
    total = pin(docs.agg(F.count(F.lit(1)).cast("long").alias("n")))
    exact = exact_dedup(docs).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    near = cluster_dedup(docs, _verified_pairs(spark, sf_dir)).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    sem = q_semdedup(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    stages = [
        ("0_total", total),
        ("1_exact", exact),
        ("2_near_dup", near),
        ("3_semantic", sem),
    ]
    out = None
    for name, df in stages:
        s = df.select(F.lit(name).alias("stage"), "n")
        out = s if out is None else out.unionByName(s)
    return out.crossJoin(
        F.broadcast(total.select(F.col("n").alias("_t")))
    ).select(
        "stage",
        F.col("n").cast("long").alias("docs_remaining"),
        F.expr("CAST(n AS DOUBLE) / _t").alias("share"),
    )


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (Rabin boundary rule): rolling-hash
    boundaries, md5 chunk fingerprints, corpus-wide copy counts —
    the storage-dedup view of the corpus."""
    from pennsieve_streaming_spark.llm.dedup import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir))


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights: per-doc log-likelihood ratio of the
    src0 unigram LM vs the corpus LM (add-one smoothing over the
    corpus vocab), nano-nat exact sums in DECIMAL(38,0)."""
    from pennsieve_streaming_spark.llm.curation import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), "src0")


def q_curriculum_order(spark, sf_dir):
    """Curriculum ordering: the corpus ranked easiest-first by the
    heuristic quality score — an exact total order (quality is
    bit-identical cross-engine, doc_id breaks ties) materialized with
    the two-phase util.global_rank, never a single-task window."""
    from pennsieve_streaming_spark.util import global_rank

    q = quality_score(_docs(spark, sf_dir)).select("doc_id", "quality")
    return global_rank(
        q, [F.desc("quality"), F.asc("doc_id")], out_col="rank"
    ).select(
        "doc_id", "quality", F.col("rank").cast("long").alias("rank")
    )


def q_lang_id(spark, sf_dir):
    return lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return fingerprint(_docs(spark, sf_dir))


def q_minhash(spark, sf_dir):
    return _as_long(
        minhash_signatures(shingles(_docs(spark, sf_dir))), "j"
    )


# Hot-bucket skew guard for LSH candidate generation: buckets larger
# than this switch to star pairing (see lsh_candidate_pairs). The
# oracle SQL replays the identical cap, so parity holds even when a
# corpus actually trips it.
LSH_MAX_BUCKET = 50


def q_lsh_pairs(spark, sf_dir):
    # Two-phase execution: the shingle set feeds both the signature
    # pipeline and the jaccard verify, and the candidate set is read
    # three times (pair join + the two sides of the doc semi-join).
    # pin (eager localCheckpoint) instead of lazy cache+count
    # (optimization r11): a lazily cached subtree is recomputed
    # CONCURRENTLY by every independent AQE leaf stage that references
    # it before the first fill lands — observed as racing duplicate
    # shingle-pipeline jobs — while a pinned RDD is computed exactly
    # once and every consumer reads the stored blocks.
    sh = pin(shingles(_docs(spark, sf_dir)))
    cands = pin(
        lsh_candidate_pairs(
            lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
        )
    )
    return jaccard_pairs(sh, candidates=cands)


def q_jaccard_histogram(spark, sf_dir):
    """Pair-similarity histogram: df-capped exact Jaccard pairs
    bucketed into 10 similarity deciles — the threshold-tuning panel
    for dedup (where does the near-dup mass sit). Integer bucketing
    of an identically-computed double; j = 1.0 clamps into the top
    decile."""
    # pinned shingles (optimization r11): the q_ngram_jaccard rule —
    # all-pairs jaccard references the table 5x.
    sh = pin(shingles(_docs(spark, sf_dir)))
    pairs = jaccard_pairs(sh, max_doc_freq=JACCARD_MAX_DF)
    return (
        pairs.select(
            F.expr(
                "least(CAST(floor(jaccard * 10) AS BIGINT), 9)"
            ).alias("decile")
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn(
            "j_lo", F.expr("CAST(decile AS DOUBLE) / 10")
        )
    )


LSH_EVAL_TAU = 0.2  # the ngram-jaccard near-dup gate


def q_lsh_eval(spark, sf_dir):
    """MinHash-LSH index-quality evaluation (the text-dedup analogue
    of emb_ann_recall): candidate precision (how much of the banded
    candidate set survives the >= tau verify) and recall against the
    exact df-capped Jaccard ground truth. Exact integer counts, one
    fixed float division each; the oracle composes both gated
    queries' SQL verbatim."""
    sh = pin(shingles(_docs(spark, sf_dir)))
    cands = pin(
        lsh_candidate_pairs(
            lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
        )
    )
    pred = jaccard_pairs(sh, candidates=cands)
    truth = jaccard_pairs(
        sh, min_jaccard=LSH_EVAL_TAU, max_doc_freq=JACCARD_MAX_DF
    )
    a = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum(
            F.when(F.col("jaccard") >= LSH_EVAL_TAU, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_pred"),
    )
    b = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    c = (
        pred.filter(F.col("jaccard") >= LSH_EVAL_TAU)
        .select("doc_a", "doc_b")
        .join(truth.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            "n_candidates",
            "n_pred",
            "n_truth",
            "n_hit",
            F.expr(
                "CASE WHEN n_candidates > 0 THEN "
                "CAST(n_pred AS DOUBLE) / n_candidates END"
            ).alias("cand_precision"),
            F.expr(
                "CASE WHEN n_truth > 0 THEN "
                "CAST(n_hit AS DOUBLE) / n_truth END"
            ).alias("recall"),
        )
    )


def q_kmeans(spark, sf_dir):
    """Two Lloyd iterations from the golden init, then the trained
    assignment — the learned-centroid path for IVF/SemDeDup."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_centroids,
        kmeans_assign,
        kmeans_fit,
    )

    embs = _embs(spark, sf_dir)
    cents = kmeans_fit(
        embs,
        IVF_LISTS,
        ANN_DIM,
        n_iter=2,
        init=golden_centroids(IVF_LISTS, ANN_DIM),
    )
    return _as_long(kmeans_assign(embs, cents), "list_id")


def q_importance_weights(spark, sf_dir):
    from pennsieve_streaming_spark.llm.curation import importance_weights

    return importance_weights(_docs(spark, sf_dir), target_lang="en")


def q_semdedup(spark, sf_dir):
    """SemDeDup embedding-cluster dedup over the synthetic embeddings:
    golden centroids so the oracle replays assignment exactly; the
    near-dup threshold reuses the corpus-calibrated EMB_NEAR_DUP_COS."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_centroids,
        semdedup,
    )

    return _as_long(
        semdedup(
            _embs(spark, sf_dir),
            golden_centroids(IVF_LISTS, ANN_DIM),
            min_cosine=EMB_NEAR_DUP_COS,
        ),
        "list_id",
    )


def q_tfidf(spark, sf_dir):
    from pennsieve_streaming_spark.llm.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


def q_stream_neardup(spark, sf_dir):
    """Streaming near-dup corpus fold (streaming/corpus.py:148) driven
    to completion and compared against batch semantics: the whole
    corpus arrives as ONE availableNow micro-batch, so the fold's drop
    rule (doc collides with a smaller doc_id via any shared LSH band
    key) is exactly the batch min-doc_id band-bucket dedup the oracle
    replays in SQL. Multi-batch history-store behavior is covered by
    the stream tests (batch splits change winners, so it can't be
    oracle-hashed)."""
    import tempfile

    from pennsieve_streaming_spark.streaming.corpus import (
        read_document_stream,
        start_neardup_dedup_stream,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    base = tempfile.mkdtemp(prefix="pss_stream_nd_")
    src = f"{base}/src"
    docs.coalesce(1).write.parquet(src)
    stream = read_document_stream(spark, src, max_files_per_trigger=1_000)
    q = start_neardup_dedup_stream(
        stream, f"{base}/out", f"{base}/store", f"{base}/ckpt"
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{base}/out")
        .select("doc_id", "lang", "source")
    )


def q_ngram_jaccard(spark, sf_dir):
    # pin the shingle table (optimization r11): all-pairs mode
    # references it 5x (hot-df cap, both self-join legs, set sizes)
    # and each reference replayed the corpus explode + md5 pass.
    sh = pin(shingles(_docs(spark, sf_dir)))
    return jaccard_pairs(sh, min_jaccard=0.2, max_doc_freq=JACCARD_MAX_DF)


def q_simhash(spark, sf_dir):
    return simhash(shingles(_docs(spark, sf_dir)))


def q_simhash_pairs(spark, sf_dir):
    return _as_long(
        simhash_near_pairs(
            simhash(shingles(_docs(spark, sf_dir))),
            max_bucket_size=LSH_MAX_BUCKET,
        ),
        "hamming",
    )


def q_cosine_topk(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return cosine_topk(embs, embs.filter(F.col("vec_id") < 20), k=5)


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of the cosine and MIPS rankers (the
    hybrid-retrieval standard, ranking-agnostic): 1/(60+rank)
    contributions folded in ranker order, top-5 per query."""
    from pennsieve_streaming_spark.llm.similarity import (
        mips_topk,
        rrf_fusion,
    )

    embs = _embs(spark, sf_dir)
    qs = embs.filter(F.col("vec_id") < 20)
    return rrf_fusion(
        [cosine_topk(embs, qs, k=10).select(
            "query_id", "neighbor_id", "rank"),
         mips_topk(embs, qs, k=10).select(
            "query_id", "neighbor_id", "rank")],
        k=5,
    )


def q_centroid_drift(spark, sf_dir):
    """Per-label embedding-centroid drift vs the corpus centroid:
    exact quantized per-dim integer sums, index-ordered cosine fold
    over the raw sums (the 1/n factors cancel)."""
    from pennsieve_streaming_spark.llm.similarity import centroid_drift

    return centroid_drift(_embs(spark, sf_dir))


MMR_K, MMR_LAM = 5, 0.7


def q_mmr_topk(spark, sf_dir):
    """MMR diversified top-5 per query: greedy lambda-tradeoff
    between query relevance and max similarity to the already-
    selected slate; bit-identical cosines, Python-evaluated lambda
    literals, argmax ties on neighbor_id; oracle unrolls the 5
    greedy steps."""
    from pennsieve_streaming_spark.llm.similarity import mmr_topk

    embs = _embs(spark, sf_dir)
    return mmr_topk(
        embs, embs.filter(F.col("vec_id") < 20), MMR_K, MMR_LAM
    )


def q_bq_topk(spark, sf_dir):
    """Binary-quantization retrieval: sign-bit words (2 BIGINTs for
    the 64-dim corpus), exact Hamming stage-1 with refine_k=20, exact
    cosine rerank — the training-free compressed exhaustive scan next
    to LSH/IVF/PQ."""
    from pennsieve_streaming_spark.llm.similarity import (
        binary_hamming_topk,
    )

    embs = _embs(spark, sf_dir)
    return binary_hamming_topk(
        embs, embs.filter(F.col("vec_id") < 20), k=5, refine_k=20, dim=64
    )


def q_mips_topk(spark, sf_dir):
    """Exact top-5 maximum-inner-product neighbors per query vector —
    the unnormalized retrieval score (dual-encoder / recommender
    ranking); queries broadcast, corpus never shuffles, partial top-k
    before the single exchange (the cosine_topk plan shape)."""
    from pennsieve_streaming_spark.llm.similarity import mips_topk

    embs = _embs(spark, sf_dir)
    return mips_topk(embs, embs.filter(F.col("vec_id") < 20), k=5)


TRUNC_DIM = 16  # matryoshka prefix: first 16 of the 64 dims


def q_truncation_recall(spark, sf_dir):
    """Matryoshka truncation eval: recall@k of the exact top-k under
    the FIRST 16 dims against the full-64-dim exact truth — the
    quality-vs-4× cost trade the two-stage rerank (emb_ann_two_stage)
    exploits, measured directly. Composes two gated SQLs."""
    embs = _embs(spark, sf_dir)
    tr = embs.select(
        "vec_id",
        F.expr(f"slice(embedding, 1, {TRUNC_DIM})").alias("embedding"),
    )
    trunc = cosine_topk(tr, tr.filter(F.col("vec_id") < 20), k=5).select(
        "query_id", "neighbor_id"
    )
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_vs_exact(exact, trunc, 5)


def q_ann_lsh(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return lsh_bucketed_ann(embs, embs.filter(F.col("vec_id") < 20), k=5)


def q_emb_isotropy(spark, sf_dir):
    """Embedding-space isotropy (mean pairwise cosine via the
    sum-vector identity — no pairwise pass): quantized unit vectors,
    exact per-dim integer sums, DECIMAL(38,0) squares, one fixed
    finish."""
    from pennsieve_streaming_spark.llm.similarity import (
        embedding_isotropy,
    )

    return embedding_isotropy(_embs(spark, sf_dir), dim=ANN_DIM)


def q_knn_graph(spark, sf_dir):
    """k-NN graph construction (every vector's top-3 in-bucket cosine
    neighbors): the LSH bucket equi-join applied corpus-to-corpus —
    the build step of graph-ANN indexes and embedding-dedup passes; at
    scale n_planes grows with the corpus so per-bucket work stays
    bounded (the dedup-cap discipline). broadcast_queries=False: both
    sides are corpus-sized, so the join shuffle-partitions on bucket
    instead of broadcasting (ADVICE r7 — a corpus broadcast is an OOM
    hazard at scale)."""
    embs = _embs(spark, sf_dir)
    return lsh_bucketed_ann(embs, embs, k=3, broadcast_queries=False)


def q_ann_ivf(spark, sf_dir):
    """IVF-Flat ANN with deterministic literal centroids so the DuckDB
    oracle replays list assignment, probing, and in-list scoring."""
    from pennsieve_streaming_spark.llm.similarity import golden_centroids, ivf_ann

    embs = _embs(spark, sf_dir)
    return ivf_ann(
        embs,
        embs.filter(F.col("vec_id") < 20),
        k=ANN_K,
        n_lists=IVF_LISTS,
        n_probe=IVF_PROBE,
        centroids=golden_centroids(IVF_LISTS, ANN_DIM),
    )


def q_unit_range_lookup(spark, sf_dir):
    """S2: timeseries.unit_ranges-shaped catalog lookup (count +
    tsindex/tsblob columns; server/UnitQueryService.scala:70-78)."""
    from pennsieve_streaming_spark.sources import range_lookup, spans_to_unit_ranges

    spans = q_gap_spans(spark, sf_dir)
    ur = spans_to_unit_ranges(spans)
    return range_lookup(
        ur, "purchase", EV_START + 5 * 86_400 * US, EV_START + 20 * 86_400 * US
    )


def q_doc_pipeline(spark, sf_dir):
    """End-to-end training-data pipeline: near-dup removal (MinHash
    LSH, jaccard >= 0.5) ∘ quality gate ∘ language gate — the composed
    corpus-preparation flow a 100 TB ingest would run, as ONE Spark
    plan (dedup anti-join + two narrow score joins)."""
    docs = _docs(spark, sf_dir)
    q = quality_score(docs).select("doc_id", "quality")
    lang = lang_id(docs).select("doc_id", "predicted_lang")
    survivors = q_dedup_filter(spark, sf_dir).select("doc_id", "source")
    return (
        survivors.join(q, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality") >= F.lit(DOC_QUALITY_TAU))
            & (F.col("predicted_lang") == "en")
        )
        .select("doc_id", "source", "predicted_lang", "quality")
    )


def q_butterworth_bulk(spark, sf_dir):
    """The lane-vectorized bulk filter on the same golden window —
    must produce BIT-identical output to the streaming path, so it
    shares the recursive-CTE oracle."""
    from pennsieve_streaming_spark.dsp import FilterSpec, apply_filter_bulk

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= F.lit(BW_TS_END))
    )
    return apply_filter_bulk(s, FilterSpec(BW_TYPE, BW_ORDER, BW_FREQ), rate_hz=BW_RATE)


def q_downsample_count_regular(spark, sf_dir):
    """Arithmetic-index count downsample on a regular gap-free channel
    (the bulk fast path) — equals the window-based variant, so the
    oracle is the plain row_number formulation."""
    from pennsieve_streaming_spark.operators import downsample_minmax_count_regular

    s = TBL.samples_aligned_view(spark, sf_dir).filter(F.col("channel") == "lead")
    return downsample_minmax_count_regular(s, CHUNK_SIZE, period_us=1000)


def q_ann_lsh_multiprobe(spark, sf_dir):
    embs = _embs(spark, sf_dir)
    return lsh_bucketed_ann(
        embs, embs.filter(F.col("vec_id") < 20), k=5, multi_probe=True
    )


def q_ann_pq(spark, sf_dir):
    """PQ asymmetric-distance ANN: corpus reduced to m-int codes, ADC
    table-lookup scoring (the IVF-PQ memory layout for 100 TB ANN)."""
    from pennsieve_streaming_spark.llm.similarity import pq_ann

    embs = _embs(spark, sf_dir)
    return pq_ann(
        embs, embs.filter(F.col("vec_id") < 20),
        k=ANN_K, m=PQ_M, n_codes=PQ_CODES, dim=ANN_DIM,
    )


def q_sq8_distortion(spark, sf_dir):
    """SQ8 scalar-quantization distortion per dimension (1 byte/dim
    affine codes): exact per-dim min/max, fixed code/recon chains,
    1e9-quantized exact error sums — completes BQ/PQ/SQ."""
    from pennsieve_streaming_spark.llm.similarity import sq8_distortion

    return sq8_distortion(_embs(spark, sf_dir), dim=ANN_DIM)


def q_pq_distortion(spark, sf_dir):
    """Per-subspace PQ reconstruction MSE — the quantization-quality
    panel for the compressed-vector ANN path (1e-9-quantized exact
    error sums over the golden codebooks)."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_codebooks,
        pq_distortion,
    )

    return pq_distortion(
        _embs(spark, sf_dir),
        golden_codebooks(PQ_M, PQ_CODES, ANN_DIM // PQ_M),
    )


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (dedup flavor): BANDED
    hyperplane-LSH blocked self-join (B independent r-bit tables,
    candidate = agree in any table), exact cosine >= threshold on the
    deduped candidate set."""
    from pennsieve_streaming_spark.llm.similarity import cosine_near_dup_pairs

    return cosine_near_dup_pairs(
        _embs(spark, sf_dir), min_cosine=EMB_NEAR_DUP_COS,
        n_tables=EMB_LSH_TABLES, bits_per_table=EMB_LSH_BITS, dim=ANN_DIM,
    )


def q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ composition: golden coarse centroids prune to n_probe
    lists, PQ ADC scores in-list — both stages individually
    oracle-gated (emb_ann_ivf, emb_ann_pq); this row gates the
    composition itself."""
    from pennsieve_streaming_spark.llm.similarity import ivf_pq_ann

    embs = _embs(spark, sf_dir)
    return ivf_pq_ann(
        embs, embs.filter(F.col("vec_id") < 20),
        k=ANN_K, n_lists=IVF_LISTS, n_probe=IVFPQ_PROBE,
        m=PQ_M, n_codes=PQ_CODES, dim=ANN_DIM,
    )


def q_media_features(spark, sf_dir):
    media = media_from_documents(_docs(spark, sf_dir))
    return extract_features(media).select("media_id", "kind", "n_bytes", "digest")


def q_frame_sample(spark, sf_dir):
    return sample_frames(media_from_documents(_docs(spark, sf_dir))).withColumn(
        "frame_idx", F.col("frame_idx").cast("long")
    )


def q_video_scene_cuts(spark, sf_dir):
    """Scene-cut detection through the REAL MJPEG AVI codec path:
    each synthetic clip plants one hard cut at 4 + doc_id % 5; encode
    → decode → frame-diff detector must recover exactly it (median-
    adaptive threshold); the oracle recomputes the planted position
    from the closed form."""
    from pennsieve_streaming_spark.llm.video import scene_cut_synthetic

    return scene_cut_synthetic(_docs(spark, sf_dir))


def q_gif_roundtrip(spark, sf_dir):
    """GIF LZW codec proven through the driver gate: encode the
    synthetic luminance field, decode it back, emit exact pixel sums
    — the oracle recomputes them from the field's closed form, so any
    codec bit error is a gate mismatch."""
    from pennsieve_streaming_spark.llm.gif import gif_roundtrip_stats

    return gif_roundtrip_stats(_docs(spark, sf_dir))


def q_edge_density(spark, sf_dir):
    """Sobel edge density + mean gradient energy per media: exact
    integer gx/gy over the synthetic luminance field via the REAL
    sobel_stats kernel; threshold separates the smooth interior from
    mod-256 wrap edges."""
    from pennsieve_streaming_spark.llm.imagehash import (
        edge_density_synthetic,
    )

    return edge_density_synthetic(_docs(spark, sf_dir))


def q_image_quality(spark, sf_dir):
    """Per-media quality metrics: RMS contrast² and variance of
    Laplacian (the autofocus/blur score) — exact integer sums over
    the synthetic luminance field via the REAL quality_stats kernel."""
    from pennsieve_streaming_spark.llm.imagehash import quality_synthetic

    return quality_synthetic(_docs(spark, sf_dir))


def q_image_ssim(spark, sf_dir):
    """Global SSIM between each synthetic field and its planted
    contrast/2 +40 degradation: exact BIGINT pixel moments (oracle
    replays the closed form), one shared fixed SSIM expression."""
    from pennsieve_streaming_spark.llm.imagehash import ssim_synthetic

    return ssim_synthetic(_docs(spark, sf_dir))


def q_image_phash(spark, sf_dir):
    """64-bit DCT perceptual hash (pHash) per media item: integer
    bilinear DCT forms against Python-quantized basis tables, lower
    median of the 8x8 low-frequency block as the bit threshold —
    every step exact integers, oracle-replayable (llm/imagehash)."""
    from pennsieve_streaming_spark.llm.imagehash import phash_synthetic

    return phash_synthetic(_docs(spark, sf_dir))


def q_image_dhash(spark, sf_dir):
    """64-bit perceptual difference hash per media item — integer
    block-sum comparisons, engine-exact; the synthetic luminance field
    makes the REAL dhash64 kernel oracle-replayable (llm/imagehash)."""
    from pennsieve_streaming_spark.llm.imagehash import dhash_synthetic

    return dhash_synthetic(_docs(spark, sf_dir))


def q_dhash_near_pairs(spark, sf_dir):
    """Image near-dup pairs: the SimHash banded machinery applied to
    the 64-bit dHash (5 bands, pigeonhole over hamming<=4) — image
    bytes never shuffle, only 8-byte hashes do. Synthetic field has
    mod-256 identical-image groups, the duplicate shape dedup exists
    to catch. Capped-listing semantics (same documented contract as
    doc_simhash_near_pairs): inside a >cap bucket only the two-star
    anchor pairs are LISTED — every member stays connected through
    the anchors (cluster membership unchanged), but a direct pair
    between two non-anchor members is transitive, not listed. The
    oracle replays the identical cap."""
    from pennsieve_streaming_spark.llm.imagehash import dhash_synthetic

    dh = dhash_synthetic(_docs(spark, sf_dir)).select(
        F.col("media_id").alias("doc_id"), F.col("dhash").alias("simhash")
    )
    p = simhash_near_pairs(
        dh, max_hamming=4, bits=64, max_bucket_size=LSH_MAX_BUCKET
    )
    return p.select(
        F.col("doc_a").alias("media_a"),
        F.col("doc_b").alias("media_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_event_summary_datadriven(spark, sf_dir):
    ev = TBL.chan_events_view(spark, sf_dir)
    return event_summary_data_driven(
        ev, EV_START, EV_END, PIXEL_EV_US, order_cols=("ts", "value")
    )


# --- corpus-curation queries (llm/curation.py) ----------------------------

CONTAM_BENCH_MOD = 29          # benchmark set = doc_id % 29 == 0
SAMPLE_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.75}  # zh -> 0.0
PACK_BUDGET = 256


def q_repetition(spark, sf_dir):
    return repetition_stats(_docs(spark, sf_dir))


def q_contamination(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    return contamination(docs, bench, k=3, threshold=0.5)


def q_stratified_sample(spark, sf_dir):
    return stratified_sample(_docs(spark, sf_dir), SAMPLE_RATES)


def q_pack_sequences(spark, sf_dir):
    return pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET)


def q_source_best(spark, sf_dir):
    return source_best(_docs(spark, sf_dir))


def q_mix_weights(spark, sf_dir):
    return mixture_weights(_docs(spark, sf_dir))


BLOCK_TOKENS = 4
BLOCK_MAX_DF = 2


def q_block_dedup(spark, sf_dir):
    return block_dedup(
        _docs(spark, sf_dir),
        block_tokens=BLOCK_TOKENS,
        max_doc_freq=BLOCK_MAX_DF,
    )


def q_pii_scrub(spark, sf_dir):
    return pii_scrub(_docs(spark, sf_dir))


def q_corpus_curation(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    return curate_corpus(
        docs, bench, SAMPLE_RATES, pack_budget=PACK_BUDGET
    )


def q_quality_thresholds(spark, sf_dir):
    return quality_thresholds(_docs(spark, sf_dir), drop_fraction=0.2)


def q_unigram_lm(spark, sf_dir):
    """Gates (doc_id, n_tokens, avg_logprob): the in-doc fold is
    engineered bit-exact, but the derived perplexity = exp(-avg) hits
    1-ulp libm exp() divergence between the JVM and DuckDB, so the
    exp-derived column stays operator-level only."""
    return unigram_lm_score(_docs(spark, sf_dir), k=0.5).drop("perplexity")


CHUNK_SIZE, CHUNK_STRIDE = 32, 24


def q_chunk_passages(spark, sf_dir):
    """RAG passage chunking: overlapping 32-token windows every 24
    tokens, trailing fully-covered runts skipped — pure integer
    window arithmetic, one narrow explode, no shuffle."""
    from pennsieve_streaming_spark.llm.text import chunk_passages

    return chunk_passages(_docs(spark, sf_dir), CHUNK_SIZE, CHUNK_STRIDE)


def q_rake_keywords(spark, sf_dir):
    """Top-3 RAKE keyphrases per document: stopword-delimited phrase
    islands, degree/frequency word scores (one BIGINT division each),
    position-ordered phrase-score fold."""
    from pennsieve_streaming_spark.llm.text import rake_keywords

    return rake_keywords(_docs(spark, sf_dir), 3)


def q_readability(spark, sf_dir):
    """Flesch reading ease + Flesch-Kincaid grade per document:
    exact integer word/sentence/vowel-group counts, fixed float score
    expressions shared verbatim with the oracle; no shuffle, no UDF."""
    from pennsieve_streaming_spark.llm.text import readability

    return readability(_docs(spark, sf_dir))


def q_score_spearman(spark, sf_dir):
    """Spearman rank correlation between the heuristic quality score
    and the unigram-LM likelihood (doc_id tie-breaks): two two-phase
    ranks, one exact BIGINT sum of squared rank differences, one
    fixed rho expression — the do-my-filters-agree diagnostic."""
    from pennsieve_streaming_spark.llm.curation import score_spearman

    return score_spearman(_docs(spark, sf_dir))


def q_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail split: corpus ranked by the bit-exact
    unigram avg_logprob (DESC) and cut into NTILE(3) equal-mass
    buckets via the two-phase global rank + closed-form bucket rule —
    never a single-task window."""
    from pennsieve_streaming_spark.llm.curation import perplexity_buckets

    return perplexity_buckets(_docs(spark, sf_dir), 3, 0.5)


# ---------------------------------------------------------------------------
# round-4b: alignment / distribution operators
# ---------------------------------------------------------------------------

GRID_INTERVAL_US = 86_400 * US          # 1-day resample grid
GRID_CHANNELS = ("ch2", "ch5")
RJ_BUCKET_US = 4 * GAP_THRESHOLD_US     # 2 h interval-join bucket
HIST_LO, HIST_HI, HIST_BINS = 0.0, 105_000.0, 50
ZSCORE_THRESHOLD = 3.0
CROSS_THRESHOLD = 100_000.0


def _grid(spark, sf_dir):
    from pennsieve_streaming_spark.operators.align import channel_grid

    ch = TBL.channels_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    return ch, channel_grid(ch, GRID_INTERVAL_US)


def q_locf_resample(spark, sf_dir):
    """LOCF (as-of backward) fill of a uniform 1-day grid — the
    union-window as-of join, one pass per channel, no join node."""
    from pennsieve_streaming_spark.operators.align import asof_locf

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    return asof_locf(s, grid)


def q_interp_resample(spark, sf_dir):
    """Linear interpolation onto the same 1-day grid: prev/next neighbor
    via one bidirectional window pass; the lerp is a fixed float
    expression, identical text on both engines."""
    from pennsieve_streaming_spark.operators.align import interp_resample

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    return interp_resample(s, grid)


def q_span_point_join(spark, sf_dir):
    """Interval (range) join: error events aggregated into each click
    session span — bucketized equi-join, never a cartesian."""
    from pennsieve_streaming_spark.operators.align import span_point_join

    ev = TBL.chan_events_view(spark, sf_dir)
    spans = contiguous_spans(
        samples_to_spans(ev.filter(F.col("channel") == "click")),
        GAP_THRESHOLD_US,
    ).select("channel", "span_lo", "span_hi")
    pts = ev.filter(F.col("channel") == "error")
    return span_point_join(spans, pts, RJ_BUCKET_US)


def q_value_histogram(spark, sf_dir):
    """Per-channel fixed-width amplitude histogram (integer counts)."""
    from pennsieve_streaming_spark.operators.stats import value_histogram

    s = TBL.samples_view(spark, sf_dir)
    return value_histogram(s, HIST_LO, HIST_HI, HIST_BINS)


def q_stream_histogram(spark, sf_dir):
    """Streaming amplitude histogram drained with availableNow: the
    shared value_histogram builder as one complete-mode agg
    (associative counts ⇒ drain == batch); the batch oracle gates it."""
    import tempfile

    from pennsieve_streaming_spark.streaming.histogram import (
        drain_value_histogram,
    )

    s = TBL.samples_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_vh_")
    s.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    return drain_value_histogram(
        spark, stream, HIST_LO, HIST_HI, HIST_BINS, f"{base}/ckpt",
        query_name=f"vh_{abs(hash(base)) % 10**9}",
    )


DG_BINS = 22  # amplitude bins of the density display grid


def q_density_grid(spark, sf_dir):
    """2-D time×amplitude density rollup (heat-map display product):
    per (channel, 4-week bucket, value bin) counts with edge-bin
    clamping — one partial-agg groupBy, embarrassingly parallel."""
    from pennsieve_streaming_spark.operators.stats import density_grid

    return density_grid(
        TBL.samples_view(spark, sf_dir), TREND_WIN_US, HQ_LO, HQ_HI, DG_BINS
    )


def q_zscore_outliers(spark, sf_dir):
    """|z| > 3 artifact flags against exact quantized channel moments
    (event stream — its value tail actually exceeds 3σ)."""
    from pennsieve_streaming_spark.operators.stats import zscore_outliers

    ev = TBL.chan_events_view(spark, sf_dir)
    return zscore_outliers(ev, ZSCORE_THRESHOLD)


def q_threshold_crossings(spark, sf_dir):
    """Upward threshold-crossing counts per channel (spike-rate proxy)."""
    from pennsieve_streaming_spark.operators.stats import threshold_crossings

    s = TBL.samples_view(spark, sf_dir)
    return threshold_crossings(s, CROSS_THRESHOLD)


CMS_DEPTH, CMS_WIDTH = 3, 1024
HH_THRESHOLD = 400                      # heavy-hitter min estimated count
SMM_CHANNELS = ("ch0", "ch4")           # streaming minmax channels


def q_stream_minmax(spark, sf_dir):
    """Streaming windowed min/max downsample driven to completion
    (availableNow): event-time window + 0-delay watermark in APPEND
    mode. The emitted rows are the batch downsample restricted to
    windows closed by the final watermark (= max event time floored to
    Spark's ms watermark precision) — an invariant independent of
    micro-batch boundaries, which is what makes it oracle-replayable."""
    import tempfile

    from pennsieve_streaming_spark.streaming.downsample import (
        stream_minmax_downsample,
    )

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*SMM_CHANNELS)
    )
    base = tempfile.mkdtemp(prefix="pss_stream_mm_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    out = stream_minmax_downsample(stream, WEEK_US)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_cluster_sample(spark, sf_dir):
    """Cluster-balanced deterministic subsample: nearest golden
    centroid per vector (narrow-map argmin), at most EMB_SAMPLE_CAP
    vectors kept per cluster by multiplicative-hash order."""
    from pennsieve_streaming_spark.llm.similarity import (
        cluster_sample,
        golden_centroids,
    )

    return _as_long(
        cluster_sample(
            _embs(spark, sf_dir),
            golden_centroids(IVF_LISTS, ANN_DIM),
            cap=EMB_SAMPLE_CAP,
        ),
        "list_id",
    )


def _recall_vs_exact(exact, ann, k):
    """The shared recall@k finish of the ANN eval matrix: per-query
    hit count of ``ann`` against the ``exact`` ground-truth top-k,
    zero-filled for queries with no hits.

    ``exact`` is PINNED (optimization r11): the ground-truth table
    feeds BOTH the semi-join and the per-query id list, and each
    reference used to replay the whole exact-top-k corpus scoring
    pass. It is |queries| x k rows — trivially small at any scale."""
    exact = pin(exact)
    hits = (
        exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    per_q = exact.select("query_id").distinct()
    return (
        per_q.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.lit(k)
            ).alias("recall"),
        )
    )


def q_ann_recall(spark, sf_dir):
    """ANN index-quality evaluation: recall@k of the hyperplane-LSH
    index against the exact cosine top-k ground truth, per query.
    Both sides are the already-oracle-gated queries, so the metric's
    own replay composes their SQL verbatim. The ann side is
    deduplicated on BOTH engines so the metric is independent of join
    multiplicity (a duplicate (query_id, neighbor_id) row would
    overcount in the oracle's COUNT-over-LEFT-JOIN otherwise)."""
    ann = q_ann_lsh(spark, sf_dir).select("query_id", "neighbor_id").distinct()
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_vs_exact(exact, ann, ANN_K)


def q_bq_recall(spark, sf_dir):
    """Recall@k of binary-quantization retrieval against the exact
    cosine top-k — how much the 1-bit compression costs at refine_k=20
    (completes the eval matrix: LSH, multiprobe, IVF, BQ)."""
    ann = q_bq_topk(spark, sf_dir).select("query_id", "neighbor_id").distinct()
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_vs_exact(exact, ann, ANN_K)


def q_ann_recall_ivf(spark, sf_dir):
    """Recall@k of the IVF-Flat index against the exact top-k ground
    truth — closes the ANN eval matrix's remaining cell (LSH and
    multiprobe recalls already ship); both sides compose the gated
    queries, ann side deduplicated for multiplicity independence."""
    ann = q_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id").distinct()
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_vs_exact(exact, ann, ANN_K)


def q_ann_recall_multiprobe(spark, sf_dir):
    """Recall@k of the MULTIPROBE hyperplane-LSH index against the
    exact top-k ground truth — completes the ANN eval matrix next to
    emb_ann_recall (single-probe): the standard recall-vs-probes
    trade-off panel. Same multiplicity-independent dedup contract."""
    ann = (
        q_ann_lsh_multiprobe(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .distinct()
    )
    exact = q_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_vs_exact(exact, ann, ANN_K)


def q_orc_roundtrip(spark, sf_dir):
    """ORC corpus egress + ingest round trip under the pinned schema —
    identity oracle, proving the columnar interchange path is lossless
    (unicode, NULLs, embedded newlines)."""
    import tempfile

    from pennsieve_streaming_spark.sources.columnar import (
        read_orc_corpus,
        write_orc_corpus,
    )

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="pss_orc_") + "/corpus"
    write_orc_corpus(docs, path, shards=4)
    return read_orc_corpus(spark, path)


def q_jsonl_roundtrip(spark, sf_dir):
    """JSONL corpus egress + ingest round trip: write the documents
    table as JSONL, read it back under the fixed schema with the
    PERMISSIVE quarantine column — output must equal the source table
    exactly (the oracle is the table itself), proving the interchange
    path is lossless for embedded newlines/quotes/unicode."""
    import tempfile

    from pennsieve_streaming_spark.sources.text import (
        quarantine_split,
        read_jsonl_corpus,
        write_jsonl_corpus,
    )

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="pss_jsonl_") + "/corpus"
    write_jsonl_corpus(docs, path, shards=4)
    clean, _bad = quarantine_split(read_jsonl_corpus(spark, path))
    return clean


def q_csv_roundtrip(spark, sf_dir):
    """CSV egress + ingest round trip (RFC-4180 quoting, multiLine
    read) — same identity oracle as the JSONL path."""
    import tempfile

    from pennsieve_streaming_spark.sources.text import (
        quarantine_split,
        read_csv_corpus,
        write_csv_corpus,
    )

    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="pss_csv_") + "/corpus"
    write_csv_corpus(docs, path, shards=4)
    clean, _bad = quarantine_split(read_csv_corpus(spark, path))
    return clean


DECIMATE_FACTOR = 4
ACF_LAGS_US = (GRID_INTERVAL_US, 7 * GRID_INTERVAL_US, 30 * GRID_INTERVAL_US)


def q_decimate(spark, sf_dir):
    """Anti-aliased downsample (lowpass + every-4th sample) over the
    Butterworth golden window — scipy.signal.decimate semantics on the
    engine's filter path."""
    from pennsieve_streaming_spark.dsp import FilterSpec
    from pennsieve_streaming_spark.dsp.filtering import decimate

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= F.lit(BW_TS_END))
    )
    return decimate(
        s, FilterSpec(BW_TYPE, BW_ORDER, BW_FREQ), BW_RATE, DECIMATE_FACTOR
    )


def q_minhash_jaccard_est(spark, sf_dir):
    """MinHash agreement-fraction Jaccard estimate for the LSH
    candidate pairs — candidate verification from n_hashes integers
    per doc instead of the full shingle sets."""
    from pennsieve_streaming_spark.llm.dedup import minhash_jaccard_estimate

    sh = shingles(_docs(spark, sf_dir))
    sigs = minhash_signatures(sh)
    cands = lsh_candidate_pairs(
        lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
    )
    return minhash_jaccard_estimate(sigs, cands)


def q_autocorrelation(spark, sf_dir):
    """Per-channel sample autocorrelation at 1/7/30-day lags on the
    LOCF day grid — periodicity/drift diagnostics from exact quantized
    sums."""
    from pennsieve_streaming_spark.operators.align import (
        asof_locf,
        channel_grid,
    )
    from pennsieve_streaming_spark.operators.stats import (
        channel_autocorrelation,
    )

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    aligned = asof_locf(s, grid).select("channel", "ts", "value")
    return channel_autocorrelation(aligned, ACF_LAGS_US, CORR_QUANT)


LB_LAGS_US = tuple(GRID_INTERVAL_US * k for k in range(1, 6))


ACF_HL_LAGS = tuple(GRID_INTERVAL_US * k for k in range(1, 11))


def q_acf_halflife(spark, sf_dir):
    """Decorrelation time per channel: the first of lags 1..10 days
    whose ACF drops below 0.5 — the memory-length summary of the ACF
    panel (NULL-free: channels never decorrelating within 10 days
    report lag 0 as the 'longer than measured' sentinel). Built on
    the bit-identical pairwise-Pearson ACFs."""
    from pennsieve_streaming_spark.operators.stats import (
        channel_autocorrelation,
    )
    from pennsieve_streaming_spark.operators.align import asof_locf
    from pyspark.sql import Window

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    aligned = asof_locf(s, grid).select("channel", "ts", "value")
    # pin the |channels| x |lags| ACF table (optimization r11): the
    # crossed filter and the channel list both reference it, and each
    # used to replay the LOCF pass + the 10-lag correlation pipeline.
    acf = pin(channel_autocorrelation(aligned, ACF_HL_LAGS, CORR_QUANT))
    crossed = acf.filter(F.col("r") < 0.5).groupBy("channel").agg(
        F.min("lag_us").cast("long").alias("halflife_lag_us")
    )
    chans = acf.select("channel").distinct()
    return chans.join(crossed, "channel", "left").select(
        "channel",
        F.coalesce("halflife_lag_us", F.lit(0)).cast("long")
        .alias("halflife_lag_us"),
    )


def q_ljungbox(spark, sf_dir):
    """Ljung-Box whiteness test per channel over the LOCF day grid
    (lags 1..5 days): bit-identical pairwise-Pearson ACFs, exact
    overlap counts, one fixed-order Q expression vs the chi-square(5)
    literal — the residual diagnostic of the AR/Holt/seasonal family."""
    from pennsieve_streaming_spark.operators.align import asof_locf
    from pennsieve_streaming_spark.operators.stats import (
        ljung_box_whiteness,
    )

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    aligned = asof_locf(s, grid).select("channel", "ts", "value")
    return ljung_box_whiteness(aligned, LB_LAGS_US, CORR_QUANT)


def q_emb_dim_stats(spark, sf_dir):
    """Per-dimension embedding moments (standardization fit) — exact
    quantized sums to |dims| rows."""
    from pennsieve_streaming_spark.llm.quantize import embedding_dim_stats

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_dim_stats(emb)


def q_emb_standardize(spark, sf_dir):
    """Z-normalization end-to-end: per-vector squared L2 norm of the
    standardized embedding (array emitted operator-level; the scalar
    norm keeps the row contract — its dim-ordered fold is identical on
    both engines)."""
    from pennsieve_streaming_spark.llm.quantize import (
        embedding_dim_stats,
        standardize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    z = standardize_embeddings(emb, embedding_dim_stats(emb))
    return z.select(
        "vec_id",
        F.size("embedding").cast("long").alias("n_dims"),
        F.expr(
            "round(aggregate(embedding, CAST(0 AS DOUBLE), "
            "(acc, v) -> acc + v * v), 9)"
        ).alias("znorm2"),
    )


def q_channel_mad(spark, sf_dir):
    """Robust per-channel scale: median + MAD via the explicit
    order-statistic machinery."""
    from pennsieve_streaming_spark.operators.stats import channel_mad

    return channel_mad(TBL.samples_view(spark, sf_dir))


PCA_ITERS = 8


def q_pca(spark, sf_dir):
    """Top principal component by power iteration — per-iteration
    9-dp rounding + quantized integer sums make all 8 iterations
    bit-replayable by the oracle's chained CTEs (the kmeans/classifier
    replay pattern)."""
    from pennsieve_streaming_spark.llm.pca import pca_loadings_df

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pca_loadings_df(spark, emb, ANN_DIM, PCA_ITERS)


def _user_events(spark, sf_dir):
    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        TBL.epoch_micros_col(ev, "ts").alias("ts"),
        "event_id",
        "user_id",
        "event_type",
    )


SESSION_GAP_US = 1800 * 1_000_000  # 30-minute inactivity boundary


def q_user_sessions(spark, sf_dir):
    """Inactivity-gap sessionization of per-user event paths (lag +
    cumulative-flag), all-integer output."""
    from pennsieve_streaming_spark.operators.analytics import user_sessions

    return user_sessions(_user_events(spark, sf_dir), SESSION_GAP_US).drop(
        "sess"
    )


def q_event_transitions(spark, sf_dir):
    """Top-20 event-type transition bigrams over the per-user
    (ts, event_id)-ordered event path."""
    from pennsieve_streaming_spark.operators.analytics import (
        event_transitions,
    )

    return event_transitions(_user_events(spark, sf_dir), k=20)


def q_markov_entropy(spark, sf_dir):
    """Per-source-type transition entropy of the event Markov chain —
    exact nano-nat integer sums (token_entropy's determinism class)."""
    from pennsieve_streaming_spark.operators.analytics import (
        markov_entropy,
    )

    return markov_entropy(_user_events(spark, sf_dir))


def q_ab_conversion(spark, sf_dir):
    """Two-proportion A/B conversion test over hash-assigned variants
    (user_id % 2): exact integer counts, one fixed float expression
    for rates and the pooled z statistic (IEEE sqrt is correctly
    rounded, so the double is engine-identical)."""
    from pennsieve_streaming_spark.operators.analytics import (
        ab_conversion_test,
    )

    return ab_conversion_test(_user_events(spark, sf_dir), "purchase")


def q_user_entropy(spark, sf_dir):
    """Per-user behavioral entropy over event types (nano-nat exact
    integer folds, 1e9-quantized logs both engines), normalized by
    ln(distinct types) — the explorer-vs-specialist segmentation
    signal."""
    from pennsieve_streaming_spark.operators.analytics import (
        user_behavior_entropy,
    )

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return user_behavior_entropy(ev.select("user_id", "event_type"))


def q_conversion_lag(spark, sf_dir):
    """Time-to-convert distribution: first-event -> first-purchase
    lag per converting user, exact integer microseconds, global
    p50/p90 via two-phase-rank order statistics + one fixed
    interpolation expression."""
    from pennsieve_streaming_spark.operators.analytics import (
        conversion_lag_stats,
    )

    return conversion_lag_stats(_user_events(spark, sf_dir), "purchase")


def q_ab_power(spark, sf_dir):
    """Per-surface A/B power analysis: required per-variant sample
    size to detect a 10% relative lift at alpha=.05 / power=.80 from
    the observed base rate; exact counts, one fixed expression chain,
    (z_a+z_b)^2 as a Python literal."""
    from pennsieve_streaming_spark.operators.analytics import (
        ab_power_analysis,
    )

    return ab_power_analysis(_user_events(spark, sf_dir))


def q_ab_srm(spark, sf_dir):
    """Sample-ratio-mismatch guardrail per exposure surface: exposed
    users per event_type split by the hash assignment must be 50/50;
    exact integer counts, one fixed chi-square expression, flag vs
    the 3.841 chi-square(1) literal."""
    from pennsieve_streaming_spark.operators.analytics import ab_srm_check

    return ab_srm_check(_user_events(spark, sf_dir))


def q_linear_attribution(spark, sf_dir):
    """Linear multi-touch attribution of purchases: each conversion
    splits one credit unit equally over the touches in its
    inter-conversion segment — exact BIGINT nano-credit sums, no
    order-dependent float fold."""
    from pennsieve_streaming_spark.operators.analytics import (
        linear_attribution,
    )

    return linear_attribution(_user_events(spark, sf_dir), "purchase")


def q_gini(spark, sf_dir):
    """Gini coefficient of per-user activity per event type — the
    power-user concentration number; within-type ranks via ONE
    two-phase global rank + broadcast offsets (no single-task window),
    DECIMAL(38,0) weighted sum, one fixed float finish."""
    from pennsieve_streaming_spark.operators.analytics import (
        gini_concentration,
    )

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return gini_concentration(ev.select("event_type", "user_id"))


def q_assoc_rules(spark, sf_dir):
    """Association rules a -> b over per-user event-type baskets
    (pair-depth market-basket mining): exact BIGINT basket counts,
    co-partitioned self-join with bounded per-user fan-out, fixed
    float support/confidence/lift finishes shared with the oracle."""
    from pennsieve_streaming_spark.operators.analytics import assoc_rules

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return assoc_rules(ev.select("user_id", "event_type"), 5)


def q_rfm_scores(spark, sf_dir):
    """RFM customer segmentation: per-user recency/frequency/monetary
    metrics bucketed into quintiles (1 = best) — NTILE semantics
    computed via three two-phase global ranks + the closed-form bucket
    rule, never a single-task window; monetary is the exact
    cent-quantized BIGINT sum."""
    from pennsieve_streaming_spark.operators.analytics import rfm_scores

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rfm_scores(
        ev.select(
            TBL.epoch_micros_col(ev, "ts").alias("ts"),
            "user_id",
            "value",
        )
    )


def q_inter_event_gaps(spark, sf_dir):
    """Per-type inter-arrival stats (exact integer µs sums/extremes)
    attributed to the earlier event of each consecutive pair."""
    from pennsieve_streaming_spark.operators.analytics import (
        inter_event_gaps,
    )

    return inter_event_gaps(_user_events(spark, sf_dir))


def q_daily_active(spark, sf_dir):
    """DAU over the events feed — exact distinct users per epoch day,
    reduced to user-days before the daily rollup."""
    from pennsieve_streaming_spark.operators.analytics import daily_active

    return daily_active(_user_events(spark, sf_dir))


def q_weekly_retention(spark, sf_dir):
    """Week-over-week retention cohorts from deduped user-week rows."""
    from pennsieve_streaming_spark.operators.analytics import (
        weekly_retention,
    )

    return weekly_retention(_user_events(spark, sf_dir))


def q_funnel(spark, sf_dir):
    """signup→purchase conversion funnel: first-touch to first
    qualifying follow-up, exact integer µs delays."""
    from pennsieve_streaming_spark.operators.analytics import funnel

    return funnel(_user_events(spark, sf_dir), "signup", "purchase")


FW_WINDOW_US = 7 * 86_400_000_000   # 7-day attribution window


def q_funnel_windowed(spark, sf_dir):
    """Attribution-windowed funnel: signup->purchase conversions that
    land within 7 days of the first signup; capture_share = windowed /
    all-time conversions."""
    from pennsieve_streaming_spark.operators.analytics import (
        funnel_windowed,
    )

    return funnel_windowed(
        _user_events(spark, sf_dir), "signup", "purchase", FW_WINDOW_US
    )


FUNNEL_STEPS = ["signup", "view", "purchase"]


def q_funnel_steps(spark, sf_dir):
    """3-step ordered funnel (signup → view → purchase), greedy
    earliest-match semantics; per-step completion counts."""
    from pennsieve_streaming_spark.operators.analytics import funnel_steps

    return funnel_steps(_user_events(spark, sf_dir), FUNNEL_STEPS)


def q_last_touch(spark, sf_dir):
    """Last-touch attribution of purchases to the most recent prior
    non-purchase event type."""
    from pennsieve_streaming_spark.operators.analytics import last_touch

    return last_touch(_user_events(spark, sf_dir), "purchase")


def q_session_stats(spark, sf_dir):
    """Corpus-wide session-length summary: exact interpolated
    p50/p90/p99 + mean of inactivity-gap session durations — global
    order statistics via the two-phase rank, never a single-task
    window."""
    from pennsieve_streaming_spark.operators.analytics import (
        session_duration_stats,
    )

    return session_duration_stats(
        _user_events(spark, sf_dir), SESSION_GAP_US
    )


MADZ_THRESHOLD = 3.5  # modified z-score cutoff (Iglewicz & Hoaglin)


def q_all_but_top(spark, sf_dir):
    """All-but-the-top post-processing (Mu & Viswanath 2018): score on
    the fitted top component and the residual norm after removing it —
    the fit replays via the PCA chained CTEs, the projection via the
    same ordered folds."""
    from pennsieve_streaming_spark.llm.pca import power_iteration_pca

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v, _ = power_iteration_pca(emb, ANN_DIM, PCA_ITERS)
    v_lit = "array(" + ", ".join(repr(float(x)) for x in v) + ")"
    dot = (
        f"aggregate(zip_with(embedding, {v_lit}, "
        "(x, w) -> CAST(x AS DOUBLE) * w), "
        "CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    return emb.select(
        "vec_id",
        F.expr(f"round({dot}, 9)").alias("score"),
        F.expr(
            f"round(aggregate(zip_with(embedding, {v_lit}, "
            f"(x, w) -> (CAST(x AS DOUBLE) - ({dot}) * w) "
            f"* (CAST(x AS DOUBLE) - ({dot}) * w)), "
            "CAST(0 AS DOUBLE), (a, b) -> a + b), 9)"
        ).alias("resid_norm2"),
    )


def q_mad_outliers(spark, sf_dir):
    """Modified z-score outliers (0.6745*(x - median)/MAD, the
    Iglewicz–Hoaglin rule) over the event stream — the robust
    companion to ts_zscore_outliers, immune to the artifacts that
    inflate the std."""
    from pennsieve_streaming_spark.operators.stats import channel_mad

    ev = TBL.chan_events_view(spark, sf_dir)
    mad = channel_mad(ev)
    j = ev.join(F.broadcast(mad.select("channel", "median", "mad")), "channel")
    mz = F.expr("0.6745e0 * (value - median) / mad")
    return (
        j.withColumn("mz", mz)
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.round(F.col("mz"), 9)) > MADZ_THRESHOLD)
        )
        .select("channel", "ts", "value", "mz")
    )


BP_FREQS = (1.0, 5.0, 10.0)   # Goertzel target frequencies (Hz)
BP_WINDOW = 500               # samples per spectral window


def q_band_power(spark, sf_dir):
    """Per-window Goertzel band power over the bounded golden window —
    the single-bin DFT recurrence, replayed bit-exactly by a DuckDB
    recursive CTE (same class as the Butterworth/EWMA oracles)."""
    from pennsieve_streaming_spark.dsp.spectral import band_power

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    )
    return band_power(s, BP_FREQS, BW_RATE, BP_WINDOW)


AF_FREQS = (20.0, 40.0, 60.0, 80.0, 120.0, 160.0, 240.0, 320.0, 400.0)
AF_WINDOW = 100               # samples per fingerprint frame


def q_audio_fingerprint(spark, sf_dir):
    """Philips-style robust audio fingerprint: per-frame sign bits of
    time×frequency band-energy deltas over the Goertzel energies — the
    audio analogue of mm_image_dhash, engine-identical because the
    energies are recursive-CTE bit-exact and everything after is
    subtraction/comparison/integer packing."""
    from pennsieve_streaming_spark.dsp.spectral import audio_fingerprint

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    )
    return audio_fingerprint(s, AF_FREQS, BW_RATE, AF_WINDOW)


def q_stream_flux(spark, sf_dir):
    """Streaming spectral flux drained with availableNow over the same
    bounded lead window as mm_audio_onsets; the drained (win, flux_q)
    table is bit-identical to the batch flux (stream==batch suite
    incl. frame-straddling splits), so applying the batch median/onset
    rule afterwards reproduces the batch operator — the batch oracle
    gates the STREAMING front-end too."""
    import tempfile

    from pennsieve_streaming_spark.streaming.flux import flux_stream

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    )
    base = tempfile.mkdtemp(prefix="pss_stream_flux_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    q = (
        flux_stream(stream, AF_FREQS, BW_RATE, AF_WINDOW)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fx = spark.read.parquet(f"{base}/out")
    from pyspark.sql import Window

    aw = Window.partitionBy("channel").orderBy("flux_q", "win")
    cnt = fx.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    med = (
        fx.withColumn("_ar", F.row_number().over(aw).cast("long"))
        .join(F.broadcast(cnt), "channel")
        .filter(F.expr("_ar = (_n + 1) div 2"))
        .select("channel", F.col("flux_q").alias("med_q"))
    )
    return fx.join(F.broadcast(med), "channel").select(
        "channel",
        "win",
        "flux_q",
        F.expr("flux_q > 2 * med_q").alias("is_onset"),
    )


def q_audio_onsets(spark, sf_dir):
    """Positive-spectral-flux onset detection over the lead audio
    channel: Goertzel band energies (recursive-CTE bit-exact), fixed
    band-order GREATEST fold, welch-rule BIGINT flux, integer
    2x-median onset rule."""
    from pennsieve_streaming_spark.dsp.spectral import (
        spectral_flux_onsets,
    )

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    )
    return spectral_flux_onsets(s, AF_FREQS, BW_RATE, AF_WINDOW, 2)


def q_audio_vad(spark, sf_dir):
    """Energy VAD over the lead audio channel: exact BIGINT frame
    energies, median-order-statistic noise floor, integer 2x-median
    activity rule, hangover-merged segments."""
    from pennsieve_streaming_spark.dsp.spectral import energy_vad

    s = (
        TBL.samples_aligned_view(spark, sf_dir)
        .filter(F.col("channel") == "lead")
        # deterministic 1-in-4 burst gate so the fixture has actual
        # loud/quiet structure (raw totalprice frame energies are
        # near-uniform and never clear 2x the median)
        .withColumn(
            "value",
            F.expr(
                "CASE WHEN (ts div 256000) % 4 = 0 "
                "THEN value * 10 ELSE value END"
            ),
        )
    )
    return energy_vad(s, frame=64, quant=1, factor=2, hangover=1)


def q_audio_match_pairs(spark, sf_dir):
    """H&K fingerprint matching: the level-shifted re-encode of the
    lead channel (2x + 10) is recovered as a near-dup of the original
    — exact sub-fingerprint posting hits (df-capped buckets) propose
    the pair, aligned per-frame hamming scores it; audio bytes never
    shuffle, only 8-byte sub-fingerprints do."""
    from pennsieve_streaming_spark.dsp.spectral import (
        audio_fingerprint,
        fingerprint_match_pairs,
    )

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    ).select("channel", "ts", "value")
    x = s.select(
        F.lit("leadx").alias("channel"),
        "ts",
        F.expr("value * 2e0 + 1e1").alias("value"),
    )
    fp = audio_fingerprint(
        s.unionByName(x), AF_FREQS, BW_RATE, AF_WINDOW
    )
    return fingerprint_match_pairs(fp)


def q_spectral_entropy(spark, sf_dir):
    """Spectral entropy per (channel, window): Shannon entropy of the
    normalized DFT power distribution (spectral flatness — white
    noise → ln(bins), pure tone → 0); welch-class BIGINT power
    quantization + nano-nat integer entropy weights."""
    from pennsieve_streaming_spark.dsp.spectral import spectral_entropy

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return spectral_entropy(s, PS_BINS, PS_WINDOW, PS_QUANT)


def q_coherence(spark, sf_dir):
    """Welch-averaged magnitude-squared coherence between the two
    time-aligned channels at DFT bins 1..8 — the EEG connectivity
    metric; per-window BIGINT cross-spectral terms from the shared
    quantized-DFT sums, exact integer window averages, one fixed
    float expression at the end."""
    from pennsieve_streaming_spark.dsp.spectral import msc_coherence

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return msc_coherence(s, "lead", "sec", PS_BINS, PS_WINDOW, PS_QUANT)


def q_plv(spark, sf_dir):
    """Phase-locking value between the two time-aligned channels at
    DFT bins 1..8 — coherence's amplitude-blind sibling (Lachaux
    1999): every complete window contributes a UNIT cross-spectrum
    phasor (1e9-quantized fixed expression over the exact BIGINT
    re/im), the cross-window reduction is an exact integer sum, and
    PLV is one fixed float expression at the end."""
    from pennsieve_streaming_spark.dsp.spectral import phase_locking_value

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return phase_locking_value(
        s, "lead", "sec", PS_BINS, PS_WINDOW, PS_QUANT
    )


DTW_SEG_LEN, DTW_MAX_SEGS, DTW_QUANT = 64, 16, 10**6


def q_dtw_distance(spark, sf_dir):
    """All-pairs elastic channel similarity: exact-integer DTW over
    per-channel PAA sketches (64-row segments, ≤16 per channel) —
    the alignment-tolerant distance lockstep correlation can't give;
    integer DP end-to-end, cell-by-cell recursive-CTE oracle."""
    from pennsieve_streaming_spark.operators.dtw import (
        dtw_channel_distances,
    )

    return dtw_channel_distances(
        TBL.samples_view(spark, sf_dir), DTW_SEG_LEN, DTW_MAX_SEGS,
        DTW_QUANT,
    )


AF_SHIFT_SAMPLES = 500        # query clip starts 5 frames into the db
AF_MAX_LAG = 20


def q_audio_offset_search(spark, sf_dir):
    """H&K fingerprint search with unknown offset: a level-shifted
    query clip cut 5 frames into the lead channel is located by
    posting-hit lag votes (deterministic argmax) + aligned hamming
    verify — the 'identify this snippet' primitive; the true lag wins
    on the lead channel."""
    from pennsieve_streaming_spark.dsp.spectral import (
        audio_fingerprint,
        fingerprint_offset_search,
    )
    from pyspark.sql import Window

    s_all = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    ).select("channel", "ts", "value")
    w = Window.partitionBy("channel").orderBy("ts", "value")
    qsrc = (
        s_all.filter(F.col("channel") == "lead")
        .withColumn("_rn", F.row_number().over(w) - 1)
        .filter(F.col("_rn") >= AF_SHIFT_SAMPLES)
        .select(
            F.lit("q").alias("channel"),
            "ts",
            F.expr("value * 2e0 + 1e1").alias("value"),
        )
    )
    # pin the fingerprint table before the db/query split (optimization
    # r11): the per-frame FFT pandas stage runs ONCE here; the
    # operator's own side pins then materialize cheap filters of this
    # table instead of re-running the fingerprint per side.
    fp = pin(
        audio_fingerprint(
            s_all.unionByName(qsrc), AF_FREQS, BW_RATE, AF_WINDOW
        )
    )
    return fingerprint_offset_search(
        fp.filter(F.col("channel") != "q"),
        fp.filter(F.col("channel") == "q"),
        AF_MAX_LAG,
    )


PS_BINS, PS_WINDOW, PS_QUANT = 8, 100, 10**6


PAC_SLOW, PAC_FAST = 1, 6


def q_pac(spark, sf_dir):
    """Phase-amplitude coupling per channel (Tort modulation index,
    octant-binned): slow-bin DFT phase octant (pure integer
    comparisons on exact BIGINT sums — no atan2) vs fast-bin power
    mass; ordered-fold entropy finish."""
    from pennsieve_streaming_spark.dsp.spectral import (
        phase_amplitude_coupling,
    )

    return phase_amplitude_coupling(
        TBL.samples_view(spark, sf_dir), PAC_SLOW, PAC_FAST, PS_WINDOW,
        PS_QUANT,
    )


BB_BIN, BB_MULT, BB_MINW = 3, 2, 2  # 20 bursts at sf0.01; 0 at mult=4


def q_band_bursts(spark, sf_dir):
    """Spindle-style band-limited burst detection over the sample
    feed: ≥2 consecutive windows with bin-3 power above 2× the
    channel's lower-median window power — integer end-to-end
    (quantized powers, order-statistic baseline, exact comparison)."""
    from pennsieve_streaming_spark.dsp.spectral import band_bursts

    return band_bursts(
        TBL.samples_view(spark, sf_dir), BB_BIN, PS_WINDOW, BB_MULT,
        BB_MINW, PS_QUANT,
    )


TH_FUND, TH_NHARM = 2, 3  # fundamental bin 2; harmonics at bins 4, 6


def q_harmonics(spark, sf_dir):
    """Total harmonic distortion per (channel, window): harmonic
    power (bins 4, 6) over the fundamental (bin 2) from the quantized
    power spectrum — the signal-purity / mains-contamination check."""
    from pennsieve_streaming_spark.dsp.spectral import harmonic_distortion

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= F.lit(BW_TS_END)
    )
    return harmonic_distortion(s, TH_FUND, TH_NHARM, PS_WINDOW, PS_QUANT)


def q_spectral_slope(spark, sf_dir):
    """1/f spectral exponent per channel: Welch-averaged codegen DFT
    periodogram, bit-identical per-window powers rounded to BIGINT
    before the exact cross-window sum, shared-literal log-log fit
    with a one-quantum floor on empty bins."""
    from pennsieve_streaming_spark.dsp.spectral import spectral_slope

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= F.lit(BW_TS_END)
    )
    return spectral_slope(s, PS_BINS, PS_WINDOW, PS_QUANT)


def q_power_spectrum(spark, sf_dir):
    """Full low-bin DFT power spectrum per (channel, window) — the
    codegen-only direct form (quantized-integer dot products against
    literal basis tables), complementing the Goertzel recurrence."""
    from pennsieve_streaming_spark.dsp.spectral import power_spectrum

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= F.lit(BW_TS_END)
    )
    # energy_q2 is DECIMAL(38,0) in Spark but HUGEINT in the DuckDB
    # oracle — stringify on both engines so the value hash is
    # dtype-stable (both render the same plain integer digits).
    return power_spectrum(s, PS_BINS, PS_WINDOW, PS_QUANT).withColumn(
        "energy_q2", F.col("energy_q2").cast("string")
    )


def q_spectral_edge(spark, sf_dir):
    """SEF95 per (channel, window): the lowest bin holding >= 95% of
    the window's exact integer spectral energy — the anesthesia-depth
    summary number; integer cross-multiplied test, no float anywhere."""
    from pennsieve_streaming_spark.dsp.spectral import spectral_edge

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= F.lit(BW_TS_END)
    )
    return spectral_edge(s, PS_BINS, PS_WINDOW, PS_QUANT)


EWMA_ALPHA = 0.125  # exact binary representation — no decimal noise


def q_ewma(spark, sf_dir):
    """First-order IIR smoothing (EWMA) over the aligned fixture
    channels, bounded like the Butterworth golden window so the DuckDB
    recursive CTE replays the recurrence sample-by-sample."""
    from pennsieve_streaming_spark.dsp.filtering import ewma_filter

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return ewma_filter(s, EWMA_ALPHA)


HOLT_ALPHA = 0.25   # exact binary representations — no decimal noise
HOLT_BETA = 0.125


def q_holt_smoothing(spark, sf_dir):
    """Holt double-exponential smoothing (level + trend) — the
    drift-aware EWMA extension; same recursive-CTE oracle class, the
    CTE carries (level, trend) and recomputes the level inside the
    trend expression with the identical IEEE op sequence."""
    from pennsieve_streaming_spark.dsp.filtering import holt_filter

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return holt_filter(s, HOLT_ALPHA, HOLT_BETA)


def q_stream_ewma(spark, sf_dir):
    """Streaming EWMA drained with availableNow over the same bounded
    golden window as ts_ewma — the carried one-double state reproduces
    the batch recurrence bit-exactly (equivalence-tested across
    micro-batch splits), so the recursive-CTE oracle gates the
    STREAMING operator too."""
    import tempfile

    from pennsieve_streaming_spark.streaming.ewma import ewma_stream

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    base = tempfile.mkdtemp(prefix="pss_stream_ewma_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    q = (
        ewma_stream(stream, EWMA_ALPHA)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_stream_holt(spark, sf_dir):
    """Streaming Holt smoothing drained with availableNow over the
    same bounded golden window as ts_holt_smoothing — the carried
    (level, trend) state reproduces the batch recurrence bit-exactly
    (equivalence-tested across micro-batch splits), so the
    recursive-CTE oracle gates the STREAMING operator too."""
    import tempfile

    from pennsieve_streaming_spark.streaming.holt import holt_stream

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    base = tempfile.mkdtemp(prefix="pss_stream_holt_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    q = (
        holt_stream(stream, HOLT_ALPHA, HOLT_BETA)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


# Per-channel (mu0, k, h) control limits calibrated offline on the
# golden window (lead: mean 246k / sd 144k; sec: mean 743 / sd 431) —
# slack ~ sigma/2, decision limit ~ 4 sigma, round constants so the
# literals are exactly representable in both engines' parsers.
CUSUM_PARAMS = {
    "lead": (250000.0, 75000.0, 600000.0),
    "sec": (750.0, 220.0, 1800.0),
}


def q_cusum_monitor(spark, sf_dir):
    """Two-sided tabular CUSUM control monitor (Page 1954): per-channel
    running g+/g- mean-shift statistics with alarm-and-reset at the
    per-channel decision limit — the sequential online counterpart of
    the offline ts_change_points argmax, O(1) state per channel; the
    recursive-CTE oracle replays the clamp-at-zero recurrence
    bit-exactly (ewma/holt class)."""
    from pennsieve_streaming_spark.dsp.filtering import cusum_monitor

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    return cusum_monitor(s, CUSUM_PARAMS)


def q_stream_cusum(spark, sf_dir):
    """Streaming CUSUM monitor drained with availableNow over the same
    bounded golden window as ts_cusum_monitor — the carried post-reset
    (g+, g-) state reproduces the batch recurrence bit-exactly
    (equivalence-tested across micro-batch splits), so the
    recursive-CTE oracle gates the STREAMING operator too."""
    import tempfile

    from pennsieve_streaming_spark.streaming.cusum import cusum_stream

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= BW_TS_END
    )
    base = tempfile.mkdtemp(prefix="pss_stream_cusum_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    q = (
        cusum_stream(stream, CUSUM_PARAMS)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_stream_session_agg(spark, sf_dir):
    """Native session_window streaming sessionization of the events
    feed, drained with availableNow: emitted rows == batch gap-span
    sessionization restricted to sessions closed by the final
    watermark (last_ts + gap <= max event time floored to ms)."""
    import tempfile

    from pennsieve_streaming_spark.streaming.session_window import (
        stream_session_agg,
    )

    ev = TBL.chan_events_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_sw_")
    src = f"{base}/src"
    ev.select("channel", "ts", "value").coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    out = stream_session_agg(stream, GAP_THRESHOLD_US)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over the corpus token stream —
    d×w integer counters, broadcast lookup, min-estimate; all-integer
    so the sketch replays bit-exactly in the oracle."""
    from pennsieve_streaming_spark.llm.sketch import cms_heavy_hitters
    from pennsieve_streaming_spark.llm.text import TOKS

    toks = _docs(spark, sf_dir).select(F.explode(F.expr(TOKS)).alias("tok"))
    return cms_heavy_hitters(toks, "tok", HH_THRESHOLD, CMS_DEPTH, CMS_WIDTH)


def q_stream_heavy_hitters(spark, sf_dir):
    """Streaming CMS drained with availableNow: the complete-mode
    counter aggregation's state is bounded at d×w BY CONSTRUCTION, and
    integer counter sums are batch-boundary independent, so the final
    heavy hitters equal the batch operator — one oracle gates both."""
    import tempfile

    from pennsieve_streaming_spark.llm.sketch import cms_estimate
    from pennsieve_streaming_spark.llm.text import TOKS
    from pennsieve_streaming_spark.streaming.cms import drain_cms_counters

    docs = _docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_cms_")
    toks = docs.select(F.explode(F.expr(TOKS)).alias("tok"))
    toks.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema("tok string").parquet(f"{base}/src")
    counters = drain_cms_counters(
        spark, stream, "tok", f"{base}/ckpt", CMS_DEPTH, CMS_WIDTH,
        query_name=f"cms_{abs(hash(base)) % 10**9}",
    )
    items = toks.select(F.col("tok").alias("it")).where(
        F.col("it").isNotNull() & (F.length("it") > 0)
    ).distinct()
    est = cms_estimate(counters, items, "it", CMS_DEPTH, CMS_WIDTH)
    return est.filter(F.col("est") >= HH_THRESHOLD).select("item", "est")


def q_int8_quant(spark, sf_dir):
    """Per-vector symmetric int8 scalar quantization of the embedding
    corpus (faiss QT_8bit shape) — a pure narrow map; codes join as a
    string to keep the row contract scalar-only."""
    from pennsieve_streaming_spark.llm.quantize import int8_quantize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return int8_quantize(emb)


CORR_QUANT = 100                        # correlation value quantum (1e-2)
PCTS = (0.5, 0.9, 0.99)
TOPQ_K = 3                              # top-quality docs kept per language


def q_channel_percentiles(spark, sf_dir):
    """Exact per-channel p50/p90/p99 by explicit order statistics —
    built-in percentile/quantile_cont float evaluation is not pinned
    cross-engine; the explicit bracketing + fixed lerp is."""
    from pennsieve_streaming_spark.operators.stats import channel_percentiles

    return channel_percentiles(TBL.samples_view(spark, sf_dir), PCTS)


def q_channel_correlation(spark, sf_dir):
    """Pearson correlation matrix over all channel pairs, time-aligned
    by LOCF onto a SHARED epoch-day grid (the per-channel grids of
    ``channel_grid`` would not line up across channels) — exact
    quantized-integer sums, one fixed float formula."""
    from pennsieve_streaming_spark.operators.align import asof_locf
    from pennsieve_streaming_spark.operators.stats import channel_correlation

    s = TBL.samples_view(spark, sf_dir)
    ch = TBL.channels_view(spark, sf_dir)
    day = GRID_INTERVAL_US
    bounds = ch.agg(
        F.max("start_ts").alias("lo"), F.min("end_ts").alias("hi")
    )
    grid_ts = bounds.select(
        F.explode(
            F.expr(f"sequence(((lo + {day} - 1) div {day}) * {day}, hi, {day})")
        ).alias("ts")
    )
    grid = ch.select("channel").crossJoin(F.broadcast(grid_ts))
    # pinned (optimization r11): the pair self-join references the
    # aligned grid twice; each used to replay the LOCF pass.
    aligned = pin(asof_locf(s, grid).select("channel", "ts", "value"))
    return channel_correlation(aligned, CORR_QUANT)


PEAK_HEIGHT, PEAK_PROM = 90_000.0, 5_000.0
QP_LO, QP_HI = 1_000.0, 100_000.0  # calibrated quality envelope


SOURCE_CAP = 15  # per-source cap (20 sources × ~25 docs at sf0.01)


def q_source_cap(spark, sf_dir):
    """Per-source document cap (the per-domain cap of web curation) —
    deterministic multiplicative-hash selection."""
    from pennsieve_streaming_spark.llm.curation import source_cap

    return source_cap(_docs(spark, sf_dir), cap=SOURCE_CAP)


def q_stream_distinct_events(spark, sf_dir):
    """Streaming idempotent admission drained with availableNow: the
    admitted event_id set equals batch DISTINCT — duplicated source
    files notwithstanding (the writer doubles one slice)."""
    import tempfile

    from pennsieve_streaming_spark.streaming.dedup_events import (
        drain_distinct_events,
    )

    ev = _user_events(spark, sf_dir).select("event_id")
    base = tempfile.mkdtemp(prefix="pss_stream_dd_")
    # simulate at-least-once delivery: write the feed, then append a
    # duplicate slice of it
    ev.coalesce(2).write.parquet(f"{base}/src")
    ev.limit(200).coalesce(1).write.mode("append").parquet(f"{base}/src")
    stream = spark.readStream.schema("event_id long").parquet(f"{base}/src")
    return drain_distinct_events(
        spark, stream, f"{base}/ckpt",
        query_name=f"dd_{abs(hash(base)) % 10**9}",
    )


HQ_LO, HQ_HI, HQ_BINS = 0.0, 110_000.0, 220  # grid: width 500, covers data


def q_hist_quantiles(spark, sf_dir):
    """Mergeable histogram-sketch quantiles (error ≤ one bin width):
    the bounded-state alternative to the exact ranking percentiles."""
    from pennsieve_streaming_spark.operators.stats import (
        histogram_quantiles,
    )

    return histogram_quantiles(
        TBL.samples_view(spark, sf_dir), HQ_LO, HQ_HI, HQ_BINS
    )


BURST_BUCKET_US = 86_400 * 1_000_000
BURST_Z = 2.0


EMB_OUT_Z = 1.01  # standardized-norm outlier gate; uniform synthetic
                  # vectors span 0.977-1.021 so this flags the top
                  # decile (production embeddings use ~1.5)


def q_emb_outliers(spark, sf_dir):
    """Embedding outlier screen: ||z(v)||/sqrt(d) above the gate."""
    from pennsieve_streaming_spark.llm.quantize import (
        embedding_dim_stats,
        embedding_outliers,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return embedding_outliers(
        emb, embedding_dim_stats(emb), EMB_OUT_Z
    )


def q_rate_bursts(spark, sf_dir):
    """Poisson burst screen over per-day event-channel rates."""
    from pennsieve_streaming_spark.operators.events import rate_bursts

    ev = TBL.chan_events_view(spark, sf_dir).select("channel", "ts")
    return rate_bursts(ev, BURST_BUCKET_US, BURST_Z)


def q_key_skew(spark, sf_dir):
    """Hot-key skew report for the events user_id key — the pre-join
    salting diagnostic."""
    from pennsieve_streaming_spark.operators.events import key_skew_report

    return key_skew_report(_user_events(spark, sf_dir), "user_id", top_k=10)


def q_zipf_fit(spark, sf_dir):
    """Zipf slope/intercept of the corpus vocabulary (quantized OLS
    over 9-dp ln terms)."""
    from pennsieve_streaming_spark.llm.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir))


XC_LAG_US = 6 * 3600 * 1_000_000   # ±6 h correlogram span
XC_BIN_US = 3600 * 1_000_000       # 1 h bins


def q_interarrival_ks(spark, sf_dir):
    """KS goodness-of-fit of inter-arrival gaps vs the channel's own
    exponential — the distributional Poisson test next to the Fano
    factor; fixed-expression CDF terms, exact MAX selection."""
    from pennsieve_streaming_spark.operators.events import interarrival_ks

    return interarrival_ks(TBL.chan_events_view(spark, sf_dir))


def q_dispersion(spark, sf_dir):
    """Fano factor (variance/mean of bucket counts, empty buckets
    included via the closed-form bucket count) per event channel —
    the one-number Poisson/burstiness test pairing with
    ev_kleinberg_bursts."""
    from pennsieve_streaming_spark.operators.events import dispersion_index

    return dispersion_index(
        TBL.chan_events_view(spark, sf_dir), BURST_BUCKET_US
    )


def q_event_xcorr(spark, sf_dir):
    """Point-process cross-correlogram between event channels
    (bucketized interval join, exact integer lag bins)."""
    from pennsieve_streaming_spark.operators.events import event_xcorr

    ev = TBL.chan_events_view(spark, sf_dir).select("channel", "ts")
    return event_xcorr(ev, XC_LAG_US, XC_BIN_US)


def q_stickiness(spark, sf_dir):
    """DAU over trailing-30-day MAU per active day."""
    from pennsieve_streaming_spark.operators.analytics import stickiness

    return stickiness(_user_events(spark, sf_dir), window_days=30)


def q_flatline_runs(spark, sf_dir):
    """Stuck-sensor QC: maximal identical-value runs >= 2 per channel
    over the event-channel feed (the synthetic samples never repeat;
    the coarser event values do)."""
    from pennsieve_streaming_spark.operators.gaps import flatline_runs

    return flatline_runs(TBL.chan_events_view(spark, sf_dir), min_run=2)


def q_event_autocorr(spark, sf_dir):
    """Single-channel event autocorrelogram (positive lags, exact
    integer bins)."""
    from pennsieve_streaming_spark.operators.events import event_autocorr

    ev = TBL.chan_events_view(spark, sf_dir).select("channel", "ts")
    return event_autocorr(ev, XC_LAG_US, XC_BIN_US)


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5): a pure
    function of doc_id, stable under corpus growth."""
    from pennsieve_streaming_spark.llm.curation import corpus_split

    return corpus_split(_docs(spark, sf_dir))


def q_winsorize(spark, sf_dir):
    """Percentile winsorization: clamp to the per-channel [p05, p95]
    envelope, flagging clipped rows."""
    from pennsieve_streaming_spark.operators.stats import winsorize

    return winsorize(TBL.samples_view(spark, sf_dir))


PSI_SPLIT_TS = 900_000_000_000_000  # mid-corpus reference/current split


def q_distribution_drift(spark, sf_dir):
    """PSI drift alarm per channel between the pre/post split windows
    on the shared value grid (add-half smoothing, 9-dp ln terms)."""
    from pennsieve_streaming_spark.operators.stats import (
        distribution_drift,
    )

    return distribution_drift(
        TBL.samples_view(spark, sf_dir), PSI_SPLIT_TS, HQ_LO, HQ_HI, 22
    )


def q_stream_drift(spark, sf_dir):
    """Streaming PSI drift monitor drained with availableNow: the
    per-(channel, bin) ref/cur counters run as one complete-mode
    streaming agg (associative conditional sums ⇒ drain == batch) and
    the shared densify+PSI finish makes the output bit-identical to
    ts_distribution_drift — one batch SQL oracle gates both."""
    import tempfile

    from pennsieve_streaming_spark.streaming.drift import (
        drain_distribution_drift,
    )

    s = TBL.samples_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_dr_")
    s.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    return drain_distribution_drift(
        spark, stream, PSI_SPLIT_TS, HQ_LO, HQ_HI, 22, f"{base}/ckpt",
        query_name=f"drift_{abs(hash(base)) % 10**9}",
    )


def q_cohort_matrix(spark, sf_dir):
    """Full retention cohort triangle by first-active week, tracked
    8 weeks out (deduped user-week joins only)."""
    from pennsieve_streaming_spark.operators.analytics import cohort_matrix

    return cohort_matrix(_user_events(spark, sf_dir), max_weeks=8)


def q_retention_halflife(spark, sf_dir):
    """Retention half-life in weeks: ln(pooled cohort retention) fit
    against age by exact nano-quantized least squares; slope and
    half-life are single fixed expressions, ln 2 a Python literal."""
    from pennsieve_streaming_spark.operators.analytics import (
        retention_halflife,
    )

    return retention_halflife(_user_events(spark, sf_dir), max_weeks=8)


KM_REGISTRY_CENSOR_US = 43_200_000_000  # 12h: the synthetic users are
# near-uniformly active across the month, so the production 7-day
# horizon censors everyone at test SFs; 12h yields a real curve at
# sf0.001/0.01/0.1 (5/40/489 deaths).


def q_circadian(spark, sf_dir):
    """Per-user circadian concentration: mean resultant length of
    hour-of-day angles (circular statistics), exact pivoted hour
    counts, shared trig literals, Rayleigh uniformity flag."""
    from pennsieve_streaming_spark.operators.analytics import (
        circadian_rhythm,
    )

    return circadian_rhythm(_user_events(spark, sf_dir))


def q_stream_circadian(spark, sf_dir):
    """Streaming circadian profile drained with availableNow: exact
    24-bin count state per user, every snapshot recomputed from the
    shared literal table — the last snapshot per user is bit-identical
    to ev_circadian, so the batch oracle gates the STREAMING operator
    too (counts commute: the one stateful operator with no in-order
    contract)."""
    import tempfile

    from pennsieve_streaming_spark.streaming.circadian import (
        circadian_stream,
    )

    ev = _user_events(spark, sf_dir).select("user_id", "ts")
    base = tempfile.mkdtemp(prefix="pss_stream_circ_")
    src = f"{base}/src"
    ev.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts long").parquet(src)
    )
    q = (
        circadian_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_ab_sequential(spark, sf_dir):
    """Always-valid sequential A/B monitoring (mixture SPRT): daily
    cumulative two-proportion ln-Lambda, running-min always-valid p;
    log-space so decisive experiments can't overflow exp."""
    from pennsieve_streaming_spark.operators.analytics import (
        ab_sequential_msprt,
    )

    return ab_sequential_msprt(_user_events(spark, sf_dir), "purchase")


def q_new_vs_returning(spark, sf_dir):
    """Daily DAU split into new vs returning users (growth
    accounting): exact first-day MIN, one fixed share division."""
    from pennsieve_streaming_spark.operators.analytics import (
        new_vs_returning,
    )

    return new_vs_returning(_user_events(spark, sf_dir))


def q_pareto_alpha(spark, sf_dir):
    """Power-law exponent of per-user activity (Clauset-Shalizi-Newman
    MLE): 1e9-quantized lns in DECIMAL(38,0), one fixed finish."""
    from pennsieve_streaming_spark.operators.analytics import pareto_alpha

    return pareto_alpha(_user_events(spark, sf_dir))


def q_markov_stationary(spark, sf_dir):
    """Stationary distribution of the event-type Markov chain: 5
    damped integer-mass power-iteration rounds (pagerank contract)
    over the user-path transition counts."""
    from pennsieve_streaming_spark.operators.analytics import (
        markov_stationary,
    )

    return markov_stationary(_user_events(spark, sf_dir), n_iter=5)


def q_survival_km(spark, sf_dir):
    """Kaplan-Meier user-lifetime survival: exact risk-set / death
    counts per duration day, 1e9-quantized ln hazards summed exactly,
    one exp + round(·, 9) finish; users active within the censor
    horizon of the corpus end are right-censored."""
    from pennsieve_streaming_spark.operators.analytics import survival_km

    return survival_km(
        _user_events(spark, sf_dir), censor_us=KM_REGISTRY_CENSOR_US
    )


def q_langid_confusion(spark, sf_dir):
    """Lang-ID evaluation confusion matrix: labeled lang × predicted
    lang counts plus per-cell share of the labeled row."""
    pred = q_lang_id(spark, sf_dir).select("lang", "predicted_lang")
    per_lang = pred.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_lang")
    )
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return cells.join(F.broadcast(per_lang), "lang").select(
        "lang",
        "predicted_lang",
        "n",
        (F.col("n").cast("double") / F.col("n_lang").cast("double")).alias(
            "share"
        ),
    )


def q_change_points(spark, sf_dir):
    """CUSUM level-shift change point per channel: integer-scaled
    prefix-sum deviation argmax (earliest-ts ties)."""
    from pennsieve_streaming_spark.operators.stats import change_points

    return change_points(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_stream_quality(spark, sf_dir):
    """Streaming ingest-quality monitor drained with availableNow:
    single complete-mode agg, |channels|-bounded state; associative
    counters make the drain equal the batch single-pass profile."""
    import tempfile

    from pennsieve_streaming_spark.streaming.quality import (
        drain_quality_profile,
    )

    s = TBL.samples_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_q_")
    s.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    return drain_quality_profile(
        spark, stream, QP_LO, QP_HI, f"{base}/ckpt",
        query_name=f"qprof_{abs(hash(base)) % 10**9}",
    )


def q_silhouette(spark, sf_dir):
    """Per-cluster simplified silhouette of the golden-centroid model
    — separation next to inertia's compactness; exact quantized
    per-vector scores, corpus never shuffles."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_centroids,
        kmeans_silhouette,
    )

    return kmeans_silhouette(
        _embs(spark, sf_dir), golden_centroids(IVF_LISTS, ANN_DIM)
    )


def q_kmeans_inertia(spark, sf_dir):
    """Per-cluster inertia of the golden-centroid model: quantized
    BIGINT d² sums — the elbow/drift metric for the IVF quantizer."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_centroids,
        kmeans_inertia,
    )

    return _as_long(
        kmeans_inertia(
            _embs(spark, sf_dir), golden_centroids(IVF_LISTS, ANN_DIM)
        ),
        "list_id",
    )


def q_dedup_stats(spark, sf_dir):
    """Per-source dedup health rollup (exact content digests)."""
    from pennsieve_streaming_spark.llm.dedup import dedup_stats

    return dedup_stats(_docs(spark, sf_dir))


SEASONAL_Z = 1.25  # demo cutoff: synthetic data is uniform (max mz ~1.35);
                   # production callers pass the standard 3.5


def q_seasonal_outliers(spark, sf_dir):
    """Day-of-week-aware robust outliers: modified z-score against the
    per-(channel, weekday) median/MAD baseline."""
    from pennsieve_streaming_spark.operators.stats import (
        seasonal_mad_outliers,
    )

    return seasonal_mad_outliers(
        TBL.samples_view(spark, sf_dir), z=SEASONAL_Z
    )


def q_winnow_overlap(spark, sf_dir):
    """MOSS-style near-dup pairs by winnowing-fingerprint overlap with
    containment scoring (catches embedded-document duplication)."""
    from pennsieve_streaming_spark.llm.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _docs(spark, sf_dir), k=5, window=4, min_shared=2, max_df=50
    )


TREND_WIN_US = 28 * 86_400_000_000   # 4-week trend segments
TREND_X_US = 86_400_000_000          # x = day offset within segment


def q_trend_segments(spark, sf_dir):
    """Piecewise-linear trend summary: exact OLS slope per (channel,
    4-week window) with x = in-window day offset — integer-quantized
    sums, DECIMAL(38,0)/HUGEINT exact normal-equation products, sign
    of the numerator classifies rising/falling."""
    from pennsieve_streaming_spark.operators.stats import trend_segments

    return trend_segments(
        TBL.samples_view(spark, sf_dir), TREND_WIN_US, TREND_X_US
    )


def q_stream_trend(spark, sf_dir):
    """Streaming trend segments drained with availableNow: the OLS
    moment aggregation runs as a single complete-mode streaming agg
    (associative integer sums ⇒ drain == batch), and the shared
    closed-form finish makes the output bit-identical to
    ts_trend_segments — one batch SQL oracle gates both."""
    import tempfile

    from pennsieve_streaming_spark.streaming.trend import (
        drain_trend_segments,
    )

    s = TBL.samples_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_tr_")
    s.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    return drain_trend_segments(
        spark, stream, TREND_WIN_US, TREND_X_US, f"{base}/ckpt",
        query_name=f"trseg_{abs(hash(base)) % 10**9}",
    )


KB_S, KB_GAMMA = 2.0, 0.3   # burst rate scaling / entry cost (data-
#                             exercised: 136 bursts at sf0.01, 0 at γ=1)


def q_kleinberg_bursts(spark, sf_dir):
    """Kleinberg 2-state burst detection over each event channel's
    inter-arrival gaps: integer forward/backward DP on 1e-9-quantized
    gap costs, burst intervals from the per-gap optimal states —
    two-recursive-CTE oracle (the Butterworth recurrence class)."""
    from pennsieve_streaming_spark.operators.bursts import (
        kleinberg_bursts,
    )

    return kleinberg_bursts(
        TBL.chan_events_view(spark, sf_dir), KB_S, KB_GAMMA
    )


def q_hjorth(spark, sf_dir):
    """Hjorth activity/mobility/complexity per (channel, 128-sample
    window) — the classic EEG descriptor triple from exact windowed
    difference variances; activity ships as BIGINT milli-units (the
    ar2 sigma2 magnitude rule)."""
    from pennsieve_streaming_spark.operators.stats import (
        hjorth_parameters,
    )

    return hjorth_parameters(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT
    )


SE_WINDOW, SE_M, SE_RFRAC, SE_QUANT = 128, 2, 0.2, 100
BS_MIN_RUN = 4


def q_line_length(spark, sf_dir):
    """Line length (coastline) + median-crossing rate per (channel,
    128-sample window) — the cheapest EEG seizure-screen feature pair:
    exact BIGINT Σ|Δxq| and exact integer strict sign flips about the
    channel-median order statistic."""
    from pennsieve_streaming_spark.operators.stats import (
        line_length_features,
    )

    return line_length_features(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT
    )


def q_allan_variance(spark, sf_dir):
    """Allan variance per channel at tau = 1,2,4,8: exact BIGINT block
    sums, DECIMAL(38,0) squared-delta accumulation, one fixed finish
    per tau — the time-domain stability curve beside the 1/f slope."""
    from pennsieve_streaming_spark.operators.stats import allan_variance

    return allan_variance(TBL.samples_view(spark, sf_dir), (1, 2, 4, 8),
                          SE_QUANT)


def q_hampel(spark, sf_dir):
    """Hampel despiking over tumbling 32-sample windows: exact
    median/MAD order statistics, integer spike rule, median
    replacement."""
    from pennsieve_streaming_spark.operators.stats import hampel_despike

    return hampel_despike(TBL.samples_view(spark, sf_dir), 32, SE_QUANT, 3)


def q_wavelet_denoise(spark, sf_dir):
    """Haar wavelet shrinkage: integer transform, MAD hard threshold
    (pure integer keep-rule), dyadic-exact reconstruction — edges
    survive, dither dies."""
    from pennsieve_streaming_spark.operators.stats import haar_denoise

    return haar_denoise(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, HAAR_LEVELS, SE_QUANT, 3
    )


def q_higuchi_fd(spark, sf_dir):
    """Higuchi fractal dimension per channel: k-decimated sub-curve
    lengths from exact quantized |Δ| sums (1e6-quantized per-offset,
    summed exactly), log-log slope with shared Python-literal fit
    weights — the complexity index beside Hjorth and sample entropy."""
    from pennsieve_streaming_spark.operators.stats import higuchi_fd

    return higuchi_fd(TBL.samples_view(spark, sf_dir), kmax=5, quant=SE_QUANT)


def q_tkeo_energy(spark, sf_dir):
    """Mean Teager-Kaiser energy per (channel, 128-sample window) —
    the nonlinear energy operator ψ = x² − x₋·x₊, the classic
    spike-detection signal; exact BIGINT per-window sums, mean as
    BIGINT milli-units (the hjorth activity magnitude rule)."""
    from pennsieve_streaming_spark.operators.stats import tkeo_energy

    return tkeo_energy(TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT)


def q_burst_suppression(spark, sf_dir):
    """Burst-suppression ratio per (channel, 128-sample window): the
    anesthesia-EEG monitor metric — fraction of samples inside runs of
    ≥4 consecutive below-half-median amplitudes; all-integer
    (order-stat threshold, gaps-and-islands runs), one fixed final
    division."""
    from pennsieve_streaming_spark.operators.stats import (
        burst_suppression,
    )

    return burst_suppression(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT, BS_MIN_RUN
    )


UP_PERIODS = (21_600_000_000, 43_200_000_000, 86_400_000_000,
              604_800_000_000)  # 6h, 12h, 1d, 7d candidate periods
UP_K = 256


def q_uneven_periodogram(spark, sf_dir):
    """Schuster periodogram at 6h/12h/1d/7d candidate periods over
    the RAW uneven timestamps (the gap-tolerant Lomb-Scargle-style
    screen the dense-grid DFT family cannot express): median-centered
    BIGINT values x shared integer phase-bin trig literals -> exact
    order-free sums, one fixed float power expression."""
    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram

    return uneven_periodogram(
        TBL.samples_view(spark, sf_dir), UP_PERIODS, UP_K, SE_QUANT
    )


RQA_WINDOW = 64


def q_rqa(spark, sf_dir):
    """Recurrence quantification per (channel, 64-sample window):
    recurrence rate + determinism (diagonal-line mass) from integer
    pair comparisons under the bit-exact IQR tolerance — all
    DataFrame ops, no kernel."""
    from pennsieve_streaming_spark.operators.stats import (
        recurrence_quantification,
    )

    return recurrence_quantification(
        TBL.samples_view(spark, sf_dir), RQA_WINDOW, SE_RFRAC, SE_QUANT, 2
    )


def q_higher_moments(spark, sf_dir):
    """Windowed skewness + excess kurtosis per (channel, 128-sample
    window): exact BIGINT mean, position-ordered double folds for the
    central moments (the ordered-fold class — x^4 overflows BIGINT
    and 128-bit casts aren't correctly rounded), fixed final ratios."""
    from pennsieve_streaming_spark.operators.stats import higher_moments

    return higher_moments(TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT)


def q_stream_periodogram(spark, sf_dir):
    """Streaming periodicity monitor drained with availableNow: the
    trig sums run as one complete-mode aggregation (associative
    BIGINT sums => drain == batch), centered on the batch-median
    calibration table, finished by the SHARED finish_periodogram —
    the batch oracle gates both."""
    import tempfile

    from pennsieve_streaming_spark.streaming.periodogram import (
        batch_centers,
        drain_periodogram,
    )

    s = TBL.samples_view(spark, sf_dir)
    centers = batch_centers(s, SE_QUANT)
    base = tempfile.mkdtemp(prefix="pss_stream_pg_")
    s.coalesce(2).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(f"{base}/src")
    return drain_periodogram(
        spark, stream, centers, UP_PERIODS, f"{base}/ckpt", UP_K,
        SE_QUANT, query_name=f"pgm_{abs(hash(base)) % 10**9}",
    )


def q_lz_complexity(spark, sf_dir):
    """Lempel-Ziv (LZ76) complexity per (channel, 128-sample window):
    median-binarized exact phrase parsing (integer end-to-end; the
    oracle replays the parse phrase-by-phrase in a recursive CTE),
    normalized by the log2(ws)/n literal."""
    from pennsieve_streaming_spark.operators.stats import lz_complexity

    return lz_complexity(TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT)


def q_stream_lz(spark, sf_dir):
    """Streaming LZ76 monitor drained with availableNow: per-channel
    state carries (next window index, the partial window's Spark-
    quantized values), so emitted windows equal the batch parse
    bit-exactly wherever the micro-batch boundaries fall — the batch
    recursive-CTE oracle gates the streaming operator too."""
    import tempfile

    from pennsieve_streaming_spark.streaming.lz import lz_stream

    s = TBL.samples_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_lz_")
    src = f"{base}/src"
    s.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(src)
    )
    q = (
        lz_stream(stream, SE_WINDOW, SE_QUANT)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_permutation_entropy(spark, sf_dir):
    """Permutation entropy per (channel, 128-sample window) — the
    Bandt-Pompe ordinal-pattern complexity measure (order 3,
    position-stable tie-breaks): exact integer pattern counts, the
    nano-nat entropy fold, ln(6) as a shared Python literal."""
    from pennsieve_streaming_spark.operators.stats import (
        permutation_entropy,
    )

    return permutation_entropy(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_QUANT
    )


HAAR_LEVELS = 4


def q_haar_energy(spark, sf_dir):
    """Haar wavelet detail-energy profile per (channel, 128-sample
    window, level 1..4): exact +-1-signed BIGINT block sums squared,
    one fixed energy/share division — the multiresolution complement
    of the Fourier band powers."""
    from pennsieve_streaming_spark.operators.stats import haar_energy

    return haar_energy(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, HAAR_LEVELS, SE_QUANT
    )


MSE_SCALES = (1, 2, 4)


def q_multiscale_entropy(spark, sf_dir):
    """Multiscale entropy (Costa 2002): SampEn of the coarse-grained
    series at scales 1/2/4 — integer coarse SUMS with the tolerance
    scaled by s (exact equivalent of mean-comparisons under the fixed
    original-series IQR tolerance)."""
    from pennsieve_streaming_spark.operators.stats import (
        multiscale_entropy,
    )

    return multiscale_entropy(
        TBL.samples_view(spark, sf_dir), MSE_SCALES, SE_WINDOW, SE_M,
        SE_RFRAC, SE_QUANT,
    )


def q_sample_entropy(spark, sf_dir):
    """Per-(channel, 128-sample window) sample entropy — the EEG/HRV
    complexity measure: exact integer Chebyshev template-match counts
    (m=2 vs 3) under a bit-exact IQR-derived tolerance, one fixed
    −ln(A/B) at the end."""
    from pennsieve_streaming_spark.operators.stats import sample_entropy

    return sample_entropy(
        TBL.samples_view(spark, sf_dir), SE_WINDOW, SE_M, SE_RFRAC,
        SE_QUANT,
    )


HURST_SCALES = (64, 128, 256, 512)
HURST_QUANT = 10


def q_hurst_rs(spark, sf_dir):
    """Hurst exponent per channel by rescaled-range analysis: exact
    integer R (n-scaled cumulative deviations) over exact integer
    scaled variance per window, 1e-6-quantized window averages, and a
    zipf-class quantized-OLS fit of ln(R/S) against ln(n) — the
    long-memory diagnostic, fully engine-replayable."""
    from pennsieve_streaming_spark.operators.stats import hurst_rs

    return hurst_rs(
        TBL.samples_view(spark, sf_dir), HURST_SCALES, HURST_QUANT
    )


def q_hourly_profile(spark, sf_dir):
    """Typical-day seasonal profile: per (channel, hour-of-day) count
    and exact-quantized mean."""
    from pennsieve_streaming_spark.operators.stats import hourly_profile

    return hourly_profile(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_quality_profile(spark, sf_dir):
    """Ingest validation screen: per-channel row/NULL/dup-ts counts and
    range violations against the calibrated envelope."""
    from pennsieve_streaming_spark.operators.stats import quality_profile

    return quality_profile(TBL.samples_view(spark, sf_dir), QP_LO, QP_HI)


def q_isi_cv(spark, sf_dir):
    """Inter-spike-interval CV + Goh-Barabasi burstiness per channel
    over the gated peak set: exact second-floored BIGINT gap moments,
    fixed float finishes shared with the oracle."""
    from pennsieve_streaming_spark.operators.stats import isi_stats

    return isi_stats(TBL.samples_view(spark, sf_dir), PEAK_HEIGHT, PEAK_PROM)


HRV_NN_S = 3600  # pNN threshold: one hour at this train's day scale


def q_hrv_metrics(spark, sf_dir):
    """RMSSD + pNN over the gated peak train: exact second-floored
    BIGINT successive-difference moments (ms squares overflow at
    month-scale gaps), fixed float finishes — beat-to-beat
    variability next to ts_isi_cv's total variance."""
    from pennsieve_streaming_spark.operators.stats import hrv_metrics

    return hrv_metrics(
        TBL.samples_view(spark, sf_dir), PEAK_HEIGHT, PEAK_PROM, HRV_NN_S
    )


CFAR_TRAIN, CFAR_GUARD, CFAR_NUM, CFAR_DEN = 8, 2, 3, 1


def q_adf_test(spark, sf_dir):
    """Dickey-Fuller unit-root test per channel on the LOCF day grid
    (zero-lag, no-constant form): exact BIGINT regression moments,
    fixed rho/t finishes, verdict vs the -1.95 critical literal."""
    from pennsieve_streaming_spark.operators.stats import adf_test

    return adf_test(
        TBL.locf_day_grid(spark, sf_dir).select("channel", "ts", "value"),
        CORR_QUANT,
    )


def q_randomness_tests(spark, sf_dir):
    """Turning-point + Wald-Wolfowitz runs tests per channel: exact
    integer extrema/run counts under quantized comparisons, two fixed
    z finishes — the nonparametric whiteness panel beside
    ts_ljungbox."""
    from pennsieve_streaming_spark.operators.stats import (
        randomness_tests,
    )

    return randomness_tests(TBL.samples_view(spark, sf_dir), SE_QUANT)


def q_cfar_peaks(spark, sf_dir):
    """CA-CFAR adaptive detection per channel: a cell fires when its
    amplitude exceeds 3x the mean of 16 surrounding training cells
    (2 guard cells each side); integer cross-multiplied predicate,
    exact window-frame sums, one fixed score division."""
    from pennsieve_streaming_spark.operators.stats import cfar_peaks

    return cfar_peaks(
        TBL.samples_view(spark, sf_dir), CFAR_TRAIN, CFAR_GUARD,
        CFAR_NUM, CFAR_DEN, SE_QUANT,
    )


def q_detect_peaks(spark, sf_dir):
    """Local-maximum peaks per channel above height/prominence gates
    (plateau-first convention, edges excluded)."""
    from pennsieve_streaming_spark.operators.stats import detect_peaks

    return detect_peaks(
        TBL.samples_view(spark, sf_dir), PEAK_HEIGHT, PEAK_PROM
    )


XCORR_LAGS_US = (-7 * GRID_INTERVAL_US, 0, 7 * GRID_INTERVAL_US)


def _locf_day_grid(spark, sf_dir):
    """The shared LOCF day-grid construction (ONE definition — now
    pennsieve_streaming_spark.tables.locf_day_grid, so the sqlapi
    views use the same rounding rule the grid-family oracles
    replicate): every channel filled onto the ceil-to-day grid over
    [MAX(start_ts), MIN(end_ts)].

    Pinned (optimization r11): most grid consumers reference the grid
    2-3x (self-joins, moment-agg + join-back shapes — e.g. kpss's
    base feeds both the total agg and the demeaned window), and every
    reference replayed the raw-samples scan + the per-channel LOCF
    sort-window pass. The pinned grid is |channels| x |days| rows —
    tiny at any scale against the raw pass it saves. sqlapi's lazy
    view registration deliberately keeps the UNPINNED
    tables.locf_day_grid (registration must not run jobs)."""
    return pin(TBL.locf_day_grid(spark, sf_dir, GRID_INTERVAL_US))


def q_cross_correlation(spark, sf_dir):
    """Cross-correlogram over channel pairs at signed ±7-day lags on
    the shared LOCF day grid — lead/lag coupling between channels,
    exact quantized-integer sums."""
    from pennsieve_streaming_spark.operators.stats import (
        channel_cross_correlation,
    )

    return channel_cross_correlation(
        _locf_day_grid(spark, sf_dir), XCORR_LAGS_US, CORR_QUANT
    )


def q_seasonal_decompose(spark, sf_dir):
    """Classical additive decomposition on the LOCF day grid:
    centered 7-day moving-average trend, day-of-week seasonal means
    of the n-scaled integer detrended values, residual from the
    rounded components — the dashboard decomposition whose residual
    feeds anomaly detection."""
    from pennsieve_streaming_spark.operators.stats import (
        seasonal_decompose,
    )

    return seasonal_decompose(
        _locf_day_grid(spark, sf_dir), GRID_INTERVAL_US, 7, CORR_QUANT
    )


def q_ar2_model(spark, sf_dir):
    """Per-channel AR(2) Yule-Walker model on the shared LOCF day
    grid: lag-1/lag-2 autoregressive coefficients and innovation
    variance from eleven exact BIGINT moments; expression text shared
    verbatim with the oracle (operators/stats.ar2_exprs)."""
    from pennsieve_streaming_spark.operators.stats import ar2_yule_walker

    return ar2_yule_walker(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend per channel on the LOCF day grid: the
    median pairwise slope (k-th-smallest under a total order);
    O(days^2) per channel by construction."""
    from pennsieve_streaming_spark.operators.stats import theil_sen_slope

    return theil_sen_slope(
        _locf_day_grid(spark, sf_dir), GRID_INTERVAL_US, CORR_QUANT
    )


def q_entropy_rate(spark, sf_dir):
    """Entropy rate H(X_t | X_{t-1}) of the binned day-grid series per
    channel: mutual_information's integer bins, exact lag-1 transition
    counts, nano-nat DECIMAL(38,0) fold, ln(B)-normalized."""
    from pennsieve_streaming_spark.operators.stats import entropy_rate

    return entropy_rate(_locf_day_grid(spark, sf_dir), 8, CORR_QUANT)


def q_mutual_info(spark, sf_dir):
    """Binned mutual information between aligned channel pairs on the
    LOCF day grid: exact integer equal-width bins, nano-nat
    DECIMAL(38,0) cell weights — the model-free coupling detector
    next to correlation/coherence/Granger."""
    from pennsieve_streaming_spark.operators.stats import (
        mutual_information,
    )

    return mutual_information(_locf_day_grid(spark, sf_dir), 8, CORR_QUANT)


def q_granger_screen(spark, sf_dir):
    """Granger-style lead-lag causality screen over directed channel
    pairs on the shared LOCF day grid: does x's yesterday improve the
    prediction of y's today beyond y's own yesterday — closed-form
    lag-1 regression from exact BIGINT moments, expression text shared
    verbatim with the oracle (operators/stats.G_*)."""
    from pennsieve_streaming_spark.operators.stats import granger_screen

    return granger_screen(
        _locf_day_grid(spark, sf_dir), GRID_INTERVAL_US, CORR_QUANT
    )


def q_token_entropy(spark, sf_dir):
    """Per-document Shannon entropy of the token distribution (integer
    nano-nat weights ⇒ order-free exact sum)."""
    from pennsieve_streaming_spark.llm.text import token_entropy

    return token_entropy(_docs(spark, sf_dir))


def q_kmv_by_source(spark, sf_dir):
    """Per-source KMV distinct-shingle estimates — the GROUP BY form of
    the KMV sketch (two-stage salted min-k, integers until one
    division)."""
    from pennsieve_streaming_spark.llm.sketch import kmv_distinct_by

    toks = "split(trim(text), '\\\\s+')"
    arr = (
        f"CASE WHEN size({toks}) < 3 THEN array() "
        f"ELSE transform(sequence(1, size({toks}) - 2), "
        f"i -> concat_ws(' ', element_at({toks}, i), "
        f"element_at({toks}, i + 1), element_at({toks}, i + 2))) END"
    )
    pairs = _docs(spark, sf_dir).select(
        "source", F.explode(F.expr(arr)).alias("s")
    )
    return kmv_distinct_by(pairs, "source", "s", k=64)


def q_top_quality_per_lang(spark, sf_dir):
    """Top-k highest-quality documents per language (deterministic
    doc_id tiebreak) — the per-stratum selection step of a curation
    pipeline."""
    from pennsieve_streaming_spark.llm.text import (
        quality_score,
        top_k_per_group,
    )

    docs = _docs(spark, sf_dir)
    q = quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return top_k_per_group(
        q.select("doc_id", "lang", "quality"),
        ["lang"],
        [F.col("quality").desc(), F.col("doc_id").asc()],
        TOPQ_K,
    )


# --- round-5b additions ----------------------------------------------------

TOP_PATHS_STEPS, TOP_PATHS_K = 3, 20
WSAMPLE_N = 100                  # weighted-sample draw size
LTOB_BUCKET = 50                 # samples per LTOB bucket
SAX_WINDOW, SAX_SEGMENTS = 64, 8
CONT_MIN = 0.2                   # containment pair floor
FUZZY_TAU = 0.5                  # fuzzy-contamination est threshold
BENCH_MOD, BENCH_REM = 10, 7     # benchmark split: doc_id % 10 == 7


def q_top_paths(spark, sf_dir):
    """Top-20 3-step event-type paths of the per-user ordered event
    sequence (clickstream journey mining)."""
    from pennsieve_streaming_spark.operators.analytics import (
        top_event_paths,
    )

    return top_event_paths(
        _user_events(spark, sf_dir), steps=TOP_PATHS_STEPS, k=TOP_PATHS_K
    )


def q_weighted_sample(spark, sf_dir):
    """Exact-size weighted sample without replacement (A-ES keys over
    a deterministic per-doc uniform; weight = n_chars)."""
    from pennsieve_streaming_spark.llm.curation import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), n=WSAMPLE_N)


def q_ltob_downsample(spark, sf_dir):
    """Largest-Triangle-One-Bucket visual downsample of one channel —
    integer-exact area argmax per bucket."""
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_ltob,
    )

    s = TBL.samples_view(spark, sf_dir).filter(F.col("channel") == "ch3")
    return downsample_ltob(s, LTOB_BUCKET)


def q_sax_words(spark, sf_dir):
    """SAX symbolization: z-normalized PAA over 64-sample windows,
    8 segments, 4-letter alphabet."""
    from pennsieve_streaming_spark.operators.sax import sax_words

    return sax_words(
        TBL.samples_view(spark, sf_dir), SAX_WINDOW, SAX_SEGMENTS
    )


def q_sax_motifs(spark, sf_dir):
    """SAX motif discovery: the 3 most frequent SAX words per channel
    (dominant shapes) with exact support counts — deterministic
    (count DESC, word ASC) ranking over the bounded word table."""
    from pennsieve_streaming_spark.operators.sax import sax_motifs

    return sax_motifs(
        TBL.samples_view(spark, sf_dir), SAX_WINDOW, SAX_SEGMENTS
    )


def q_sax_discords(spark, sf_dir):
    """SAX discord discovery (HOT SAX rarity heuristic): the windows
    whose SAX word is among the channel's 3 rarest — anomaly
    candidates ranked count ASC, word ASC over the bounded word
    table."""
    from pennsieve_streaming_spark.operators.sax import sax_discords

    return sax_discords(
        TBL.samples_view(spark, sf_dir), SAX_WINDOW, SAX_SEGMENTS
    )


def q_welch_psd(spark, sf_dir):
    """Welch PSD: cross-window average of the Goertzel periodograms
    over the bounded golden window (exact integer cross-window sum)."""
    from pennsieve_streaming_spark.dsp.spectral import welch_psd

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        (F.col("channel") == "lead") & (F.col("ts") <= BW_TS_END)
    )
    return welch_psd(s, BP_FREQS, BW_RATE, BP_WINDOW)


def q_asof_join(spark, sf_dir):
    """As-of backward join: each event probes the latest sample
    at-or-before its (rebased) timestamp on its mapped channel. The
    oracle is DuckDB's native ASOF LEFT JOIN; the engine side is the
    union-window pass (align.asof_join)."""
    from pennsieve_streaming_spark.operators.align import asof_join

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    span = T1999 - T1992
    probes = ev.select(
        "event_id",
        F.concat(
            F.lit("ch"), (F.length("event_type") % 8).cast("string")
        ).alias("channel"),
        (TBL.epoch_micros_col(ev, "ts") % span + T1992).alias("ts"),
    )
    s = (
        TBL.samples_view(spark, sf_dir)
        .groupBy("channel", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(s, probes)


ETA_L_US, ETA_BIN_US = 43_200_000_000, 3_600_000_000  # ±12 h, 1 h bins


def q_event_triggered_avg(spark, sf_dir):
    """Peri-event signal average (evoked response / PSTH): samples
    within ±12 h of each mapped, rebased event averaged per
    (channel, hourly offset bin) — the bucketized-interval join shape,
    exact quantized per-bin sums."""
    from pennsieve_streaming_spark.operators.events import (
        event_triggered_average,
    )

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    span = T1999 - T1992
    triggers = ev.select(
        F.concat(
            F.lit("ch"), (F.length("event_type") % 8).cast("string")
        ).alias("channel"),
        (TBL.epoch_micros_col(ev, "ts") % span + T1992).alias("ts"),
    )
    return event_triggered_average(
        TBL.samples_view(spark, sf_dir), triggers, ETA_L_US, ETA_BIN_US,
        CORR_QUANT,
    )


def q_asof_join_blocked(spark, sf_dir):
    """Same as-of join on the blocked-halo plan: windows evaluate
    within (channel, 26-week block) with a carry-in halo, so few
    channels × deep history parallelizes at |channels|×|blocks|.
    Shares ts_asof_join's oracle — blocked must be bit-identical."""
    from pennsieve_streaming_spark.operators.align import asof_join

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    span = T1999 - T1992
    probes = ev.select(
        "event_id",
        F.concat(
            F.lit("ch"), (F.length("event_type") % 8).cast("string")
        ).alias("channel"),
        (TBL.epoch_micros_col(ev, "ts") % span + T1992).alias("ts"),
    )
    s = (
        TBL.samples_view(spark, sf_dir)
        .groupBy("channel", "ts")
        .agg(F.max("value").alias("value"))
    )
    return asof_join(s, probes, block_us=26 * WEEK_US)


def q_stream_asof_join(spark, sf_dir):
    """Streaming as-of join driven to completion (availableNow) over
    the same sample/probe feeds as ts_asof_join: per-channel last
    sample carried in applyInPandasWithState state, one tiny (ts,
    value) tuple per channel. A single availableNow batch satisfies
    the in-order arrival contract trivially, so the emitted rows equal
    the batch operator's output — the same DuckDB ASOF JOIN oracle."""
    import tempfile

    from pennsieve_streaming_spark.streaming.asof import asof_join_stream

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    span = T1999 - T1992
    probes = ev.select(
        "event_id",
        F.concat(
            F.lit("ch"), (F.length("event_type") % 8).cast("string")
        ).alias("channel"),
        (TBL.epoch_micros_col(ev, "ts") % span + T1992).alias("ts"),
    )
    s = (
        TBL.samples_view(spark, sf_dir)
        .groupBy("channel", "ts")
        .agg(F.max("value").alias("value"))
    )
    base = tempfile.mkdtemp(prefix="pss_stream_asof_")
    s.coalesce(1).write.parquet(f"{base}/s")
    probes.select("channel", "ts", "event_id").coalesce(1).write.parquet(
        f"{base}/p"
    )
    s_stream = (
        spark.readStream.schema("channel string, ts long, value double")
        .parquet(f"{base}/s")
    )
    p_stream = (
        spark.readStream.schema("channel string, ts long, event_id long")
        .parquet(f"{base}/p")
    )
    out = asof_join_stream(s_stream, p_stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_ngram_containment(spark, sf_dir):
    """Exact shingle-set containment pairs (asymmetric near-dup: short
    doc swallowed by long doc), hot-shingle df cap as in jaccard."""
    from pennsieve_streaming_spark.llm.dedup import containment_pairs

    # pinned shingles (optimization r11): the q_ngram_jaccard rule —
    # containment_pairs references the table 5x.
    return containment_pairs(
        pin(shingles(_docs(spark, sf_dir))),
        max_doc_freq=JACCARD_MAX_DF,
        min_containment=CONT_MIN,
    )


def q_contamination_fuzzy(spark, sf_dir):
    """MinHash-LSH decontamination of the corpus split against the
    benchmark split (doc_id % 10 == 7): banded-collision candidates,
    signature-agreement similarity estimate, per-corpus-doc verdict."""
    from pennsieve_streaming_spark.llm.curation import contamination_fuzzy

    docs = _docs(spark, sf_dir)
    bench = docs.filter(
        F.col("doc_id") % BENCH_MOD == F.lit(BENCH_REM)
    )
    corpus = docs.filter(
        F.col("doc_id") % BENCH_MOD != F.lit(BENCH_REM)
    )
    return contamination_fuzzy(corpus, bench, threshold=FUZZY_TAU)




def q_matrix_profile(spark, sf_dir):
    """Tumbling-window matrix profile on the LOCF day grid: per
    channel, each complete 7-day window's nearest neighbor by exact
    BIGINT squared distance (unnormalized so the argmin is an integer
    order statistic) — the discord/motif primitive; high profile =
    anomalous week."""
    from pennsieve_streaming_spark.operators.stats import matrix_profile

    return matrix_profile(_locf_day_grid(spark, sf_dir), m=7, quant=CORR_QUANT)


def q_variance_ratio(spark, sf_dir):
    """Lo-MacKinlay variance-ratio panel VR(2/4/8) on the day grid:
    exact BIGINT increment moments, fixed float finishes rounded to
    9 dp — random-walk vs mean-reversion vs trending, beside
    ts_adf_test and ts_hurst_rs."""
    from pennsieve_streaming_spark.operators.stats import variance_ratio

    return variance_ratio(_locf_day_grid(spark, sf_dir), (2, 4, 8), CORR_QUANT)


def q_kpss(spark, sf_dir):
    """KPSS level-stationarity statistic (l = 0) on the day grid:
    n-scaled exact-integer partial sums, DECIMAL(38,0) quadratic
    accumulators, one fixed division rounded to 9 dp — the
    stationarity-null mirror of ts_adf_test."""
    from pennsieve_streaming_spark.operators.stats import kpss_stat

    return kpss_stat(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_poincare(spark, sf_dir):
    """Poincaré SD1/SD2/ratio per channel on the day grid: exact
    BIGINT/DECIMAL moments of successive differences and sums, fixed
    sqrt finishes rounded to 9 dp — the geometric variability
    descriptor next to ts_hrv_metrics."""
    from pennsieve_streaming_spark.operators.stats import poincare_sd

    return poincare_sd(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_dfa(spark, sf_dir):
    """Detrended fluctuation analysis (boxes 4/8/16 days) on the day
    grid: exact integer profile, per-box closed-form OLS SSE quantized
    before the cross-box sum, literal-weight log-log slope rounded to
    9 dp — the nonstationarity-robust scaling exponent beside
    ts_hurst_rs / ts_higuchi_fd."""
    from pennsieve_streaming_spark.operators.stats import dfa

    return dfa(_locf_day_grid(spark, sf_dir), (4, 8, 16), CORR_QUANT)




def q_lorenz_deciles(spark, sf_dir):
    """Lorenz curve of user activity in ten rank deciles: two-phase
    global rank (no single-task window), exact integer decile sums,
    share/cumulative-share divisions rounded to 9 dp — the curve
    behind ev_gini's single number."""
    from pennsieve_streaming_spark.operators.analytics import (
        lorenz_deciles,
    )

    return lorenz_deciles(_user_events(spark, sf_dir))


def q_ev_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of pooled per-user
    inter-arrival gaps per event type (second-floored exact integer
    moments, fixed sqrt finish, 9 dp) — Poisson vs bursty traffic at
    a glance."""
    from pennsieve_streaming_spark.operators.analytics import burstiness

    return burstiness(_user_events(spark, sf_dir))


def q_type_pmi(spark, sf_dir):
    """User-level PMI between event-type pairs: nano-nat quantized
    four-term log fold over exact co-occurrence counts — which
    behaviors bundle, which repel."""
    from pennsieve_streaming_spark.operators.analytics import type_pmi

    return type_pmi(_user_events(spark, sf_dir))


def q_dow_chi2(spark, sf_dir):
    """Day-of-week uniformity chi-square per event type via pure
    integer dow arithmetic ((epoch_days+4)%7) and one fixed finish
    against the chi-square(6) literal — weekly seasonality flags."""
    from pennsieve_streaming_spark.operators.analytics import dow_chi2

    return dow_chi2(_user_events(spark, sf_dir))


def q_cohort_ltv(spark, sf_dir):
    """Cumulative events per user by cohort age (0..8 weeks): exact
    integer densified rollup + per-cohort cumsum, one division per
    row — the LTV curve over ev_cohort_matrix's triangle."""
    from pennsieve_streaming_spark.operators.analytics import cohort_ltv

    return cohort_ltv(_user_events(spark, sf_dir), max_weeks=8)



def q_char_trigram_lm(spark, sf_dir):
    """Character-trigram LM score per doc (add-one smoothing over the
    corpus char vocabulary): nano-nat quantized per-occurrence logs,
    exact DECIMAL sums — the mojibake/base64/keyboard-mash quality
    signal one level below the word LMs."""
    from pennsieve_streaming_spark.llm.text import char_trigram_lm

    return char_trigram_lm(_docs(spark, sf_dir))


def q_stopword_profile(spark, sf_dir):
    """Per-source stopword-ratio decile histogram: exact token
    counts, one exact ratio division, engine-identical decile floor —
    the distributional view of the quality score's stopword term."""
    from pennsieve_streaming_spark.llm.text import stopword_profile

    return stopword_profile(_docs(spark, sf_dir))


def q_length_quantiles(spark, sf_dir):
    """Per-source p50/p90/p99 document length via the explicit
    order-statistic interpolation over exact integer ranks — the
    curation cutoff panel."""
    from pennsieve_streaming_spark.llm.text import length_quantiles

    return length_quantiles(_docs(spark, sf_dir))


def q_ngram_entropy(spark, sf_dir):
    """Word-bigram conditional entropy per source (nano-nat exact
    folds) — templated-vs-rich-prose diversity rate beside
    doc_heaps_law."""
    from pennsieve_streaming_spark.llm.text import ngram_entropy

    return ngram_entropy(_docs(spark, sf_dir))


def q_minhash_calibration(spark, sf_dir):
    """|MinHash estimate − exact Jaccard| error histogram over the
    capped LSH candidates: is n_hashes = 16 tight enough for the
    dedup threshold — the estimator-quality eval beside
    doc_lsh_eval's recall."""
    from pennsieve_streaming_spark.llm.dedup import minhash_calibration

    # Cache the shared stages (the q_lsh_pairs rule): the shingle set
    # feeds signatures AND the exact-jaccard verify, and the candidate
    # set is read by both branches — uncached, the whole LSH pipeline
    # replays per subtree (~60-exchange plan).
    sh = pin(shingles(_docs(spark, sf_dir)))
    cands = pin(
        lsh_candidate_pairs(
            lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
        )
    )
    return minhash_calibration(sh, minhash_signatures(sh), cands)



def q_jl_distortion(spark, sf_dir):
    """Johnson-Lindenstrauss ±1 projection (64→16) distortion audit
    over the probe pairs: exact integer projections and distances,
    one fixed ratio division — how much error 4x compression costs
    on this corpus."""
    from pennsieve_streaming_spark.llm.similarity import jl_distortion

    return jl_distortion(_embs(spark, sf_dir), out_dim=16, dim=ANN_DIM)


def q_pq_balance(spark, sf_dir):
    """PQ code-usage balance per subspace (usage entropy + hottest
    code share) from the golden-codebook assignments — the index
    health readout beside emb_pq_distortion."""
    from pennsieve_streaming_spark.llm.similarity import (
        golden_codebooks,
        pq_balance,
    )

    return pq_balance(
        _embs(spark, sf_dir),
        golden_codebooks(PQ_M, PQ_CODES, ANN_DIM // PQ_M),
    )



def q_image_colorfulness(spark, sf_dir):
    """Hasler-Süsstrunk colorfulness per media item over the
    phase-shifted synthetic RGB field: exact opponent-axis BIGINT
    moments through the REAL kernel, one fixed sqrt finish."""
    from pennsieve_streaming_spark.llm.imagehash import (
        colorfulness_synthetic,
    )

    return colorfulness_synthetic(_docs(spark, sf_dir))


def q_image_blockiness(spark, sf_dir):
    """Block-boundary vs interior gradient ratio (8-px blocks) per
    media item — the codec-damage screen; exact integer gradient
    sums, one fixed division."""
    from pennsieve_streaming_spark.llm.imagehash import (
        blockiness_synthetic,
    )

    return blockiness_synthetic(_docs(spark, sf_dir))


def q_audio_zcr(spark, sf_dir):
    """Per-frame zero-crossing rate of the demeaned lead audio
    channel (n-scaled exact-integer signs, integer crossing test) —
    the voiced/unvoiced half of the two-feature VAD next to
    mm_audio_vad's energy half."""
    from pennsieve_streaming_spark.dsp.spectral import (
        zero_crossing_rate,
    )

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("channel") == "lead"
    )
    return zero_crossing_rate(s, frame=64, quant=1)



def q_stream_burstiness(spark, sf_dir):
    """Streaming burstiness: per-(user, type) last-ts carry state
    emits append-only second-floored gap rows; the drained gap table
    is bit-identical to the batch lag under in-order arrival, so the
    SAME fixed moment/finish aggregation shares ev_burstiness's
    oracle (the flux/lz stream==batch gating pattern)."""
    import tempfile

    from pennsieve_streaming_spark.streaming.burstiness import (
        gaps_stream,
    )

    ev = _user_events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    base = tempfile.mkdtemp(prefix="pss_stream_burst_")
    src = f"{base}/src"
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts long, event_id long"
    ).parquet(src)
    q = (
        gaps_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    gaps = spark.read.parquet(f"{base}/out")
    g = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gs").cast("long").alias("sg"),
        F.sum(F.expr("CAST(gs AS DECIMAL(38,0)) * gs")).alias("sgg"),
    )
    var = (
        "(CAST(sgg AS DOUBLE) / n_gaps "
        "- (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))"
    )
    mu = "(CAST(sg AS DOUBLE) / n_gaps)"
    return g.select(
        "event_type",
        "n_gaps",
        F.expr(f"round({mu}, 9)").alias("mean_gap_s"),
        F.expr(
            f"CASE WHEN {var} > 0e0 AND sqrt({var}) + {mu} > 0e0 "
            f"THEN round((sqrt({var}) - {mu}) / (sqrt({var}) + {mu}), 9) "
            f"ELSE 0e0 END"
        ).alias("burstiness"),
    )



def q_binseg_changepoints(spark, sf_dir):
    """Two-level binary segmentation on the day grid: the global CUSUM
    argmax plus the within-half argmaxes — up to three level-shift
    candidates per channel, every argmax a pure integer order
    statistic (segment-length-scaled deviations)."""
    from pennsieve_streaming_spark.operators.stats import (
        binseg_change_points,
    )

    return binseg_change_points(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_pacf(spark, sf_dir):
    """Partial autocorrelation at 1/2/3-day lags via Durbin-Levinson
    over the 9-dp-rounded exact-moment ACFs — the Box-Jenkins order-
    identification panel beside ts_autocorrelation/ts_ar2_model."""
    from pennsieve_streaming_spark.operators.align import asof_locf
    from pennsieve_streaming_spark.operators.stats import pacf3

    s = TBL.samples_view(spark, sf_dir).filter(
        F.col("channel").isin(*GRID_CHANNELS)
    )
    _, grid = _grid(spark, sf_dir)
    # pinned (optimization r11): pacf3's lag joins reference the
    # aligned grid several times; each used to replay the LOCF pass.
    aligned = pin(asof_locf(s, grid).select("channel", "ts", "value"))
    return pacf3(aligned, GRID_INTERVAL_US, CORR_QUANT)


def q_growth_accounting(spark, sf_dir):
    """Weekly growth accounting: active users split into new /
    retained / resurrected (+ churned from last week) over the exact
    user-week lattice; quick ratio = (new + resurrected)/churned."""
    from pennsieve_streaming_spark.operators.analytics import (
        growth_accounting,
    )

    return growth_accounting(_user_events(spark, sf_dir))


def q_dedup_method_agreement(spark, sf_dir):
    """Cross-method near-dup agreement: the MinHash-LSH verified pair
    set (jaccard ≥ 0.5) vs the SimHash banded pair set (hamming ≤ 4)
    — intersection/only counts + pair-set Jaccard, the method-
    triangulation eval for dedup threshold tuning."""
    a = _verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    b = q_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    fa = a.withColumn("_a", F.lit(1))
    fb = b.withColumn("_b", F.lit(1))
    u = fa.join(fb, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("_a", F.lit(0)).alias("a"),
        F.coalesce("_b", F.lit(0)).alias("b"),
    )
    g = u.agg(
        F.sum(F.expr("CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_both"),
        F.sum(F.expr("CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_only_minhash"),
        F.sum(F.expr("CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END"))
        .cast("long").alias("n_only_simhash"),
    )
    return g.select(
        "n_both",
        "n_only_minhash",
        "n_only_simhash",
        F.expr(
            "CASE WHEN n_both + n_only_minhash + n_only_simhash > 0 "
            "THEN round(CAST(n_both AS DOUBLE) "
            "/ (n_both + n_only_minhash + n_only_simhash), 9) "
            "ELSE 0e0 END"
        ).alias("pair_jaccard"),
    )


def q_assign_margin(spark, sf_dir):
    """IVF assignment-margin panel per list: relative best-vs-second
    centroid distance gap, 1e-9-quantized exact per-list sums — the
    boundary-mass diagnostic that predicts single-probe recall."""
    from pennsieve_streaming_spark.llm.similarity import (
        assign_margin,
        golden_centroids,
    )

    return assign_margin(
        _embs(spark, sf_dir), golden_centroids(IVF_LISTS, ANN_DIM)
    )



def q_crest_factor(spark, sf_dir):
    """Per-frame crest factor (peak/RMS): exact integer peak and
    energy per 64-sample frame, one fixed sqrt division — the
    impulsiveness metric beside energy (VAD) and ZCR."""
    from pennsieve_streaming_spark.dsp.spectral import crest_factor

    return crest_factor(TBL.samples_view(spark, sf_dir), frame=64,
                        quant=CORR_QUANT)


def q_seasonal_strength(spark, sf_dir):
    """STL-style seasonal strength F_s = max(0, 1 − Var(resid)/
    Var(seasonal+resid)) per channel over the classical decomposition
    — does the channel actually have a weekly cycle."""
    from pennsieve_streaming_spark.operators.stats import (
        seasonal_strength,
    )

    return seasonal_strength(
        _locf_day_grid(spark, sf_dir), GRID_INTERVAL_US, 7
    )


def q_source_jsd(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (nano-nat exact folds, missing-token ln2 mass from
    exact totals) — the symmetric source-similarity matrix beside
    doc_source_kl."""
    from pennsieve_streaming_spark.llm.curation import source_jsd

    return source_jsd(_docs(spark, sf_dir))


def q_emb_hubness(spark, sf_dir):
    """Hubness histogram of the exact top-k lists: how many corpus
    vectors appear in 1, 2, ... of the probe result lists — the
    high-dimensional hub pathology check on retrieval quality."""
    embs = _embs(spark, sf_dir)
    tk = cosine_topk(embs, embs.filter(F.col("vec_id") < 20), k=5)
    per = tk.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return per.groupBy("n_hits").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )


def q_audio_clipping(spark, sf_dir):
    """Clipping diagnostics on the lead audio channel: clipped-sample
    fraction vs the literal full-scale threshold + the longest
    clipped run (islands trick) — audio QA beside mm_audio_vad."""
    from pennsieve_streaming_spark.dsp.spectral import clipping_stats

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("channel") == "lead"
    )
    return clipping_stats(s, clip_threshold=400000.0, quant=1)



def q_stationarity_panel(spark, sf_dir):
    """ADF × KPSS cross-test verdict per channel: the two unit-root
    tests have OPPOSITE nulls, so only their conjunction is decisive —
    stationary (both agree), unit_root (both agree the other way),
    conflict / inconclusive otherwise. Pure composition of the two
    gated tests."""
    from pennsieve_streaming_spark.operators.stats import (
        adf_test,
        kpss_stat,
    )

    # The shared grid is PINNED in _locf_day_grid (optimization r11):
    # adf references it once, kpss twice, and each reference used to
    # replay the raw-samples LOCF pass — 9 planned scans for this
    # panel; now the derivation runs once and all three read it.
    grid = _locf_day_grid(spark, sf_dir)
    a = adf_test(grid, CORR_QUANT).select(
        "channel", F.col("stationary").alias("adf_stationary")
    )
    k = kpss_stat(grid, CORR_QUANT).select(
        "channel", F.col("stationary").alias("kpss_stationary")
    )
    return a.join(k, "channel").select(
        "channel",
        "adf_stationary",
        "kpss_stationary",
        F.expr(
            "CASE WHEN adf_stationary AND kpss_stationary "
            "THEN 'stationary' "
            "WHEN NOT adf_stationary AND NOT kpss_stationary "
            "THEN 'unit_root' "
            "WHEN adf_stationary AND NOT kpss_stationary "
            "THEN 'conflict' ELSE 'inconclusive' END"
        ).alias("verdict"),
    )


def q_c4_filters(spark, sf_dir):
    """C4-style line-filter panel: terminal-punctuation / min-words
    line rules, placeholder + code markers, composed keep flag —
    the classic web-scrape curation pass at line granularity."""
    from pennsieve_streaming_spark.llm.curation import c4_line_filters

    return c4_line_filters(_docs(spark, sf_dir))


def q_image_entropy(spark, sf_dir):
    """Grayscale histogram entropy per media item (nano-nat exact
    fold over exact level counts via the REAL kernel) — the texture-
    information number beside contrast/blur/colorfulness."""
    from pennsieve_streaming_spark.llm.imagehash import (
        image_entropy_synthetic,
    )

    return image_entropy_synthetic(_docs(spark, sf_dir))


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per channel on the LOCF day grid:
    exact pairwise sign sum + tie-corrected variance, one sqrt-divide
    z finish — the significance test for ts_theil_sen's slope
    (same O(days²)-by-contract pair join)."""
    from pennsieve_streaming_spark.operators.stats import mann_kendall

    return mann_kendall(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_benford(spark, sf_dir):
    """Benford first-digit conformance per channel: digits from the
    decimal string of the exact quantized integer (no log10 in the
    digit path), χ² + MAD against the shared Python-literal Benford
    table — the fabricated/truncated-feed screen."""
    from pennsieve_streaming_spark.operators.stats import benford_digits

    return benford_digits(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_cointegration(spark, sf_dir):
    """Engle-Granger cointegration screen over channel pairs on the
    day grid: exact-moment OLS, integer-requantized residuals, the
    no-intercept Dickey-Fuller coefficient — long-run equilibrium
    detection beside ts_granger_screen's short-run test."""
    from pennsieve_streaming_spark.operators.stats import engle_granger

    return engle_granger(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_mann_whitney(spark, sf_dir):
    """Mann-Whitney U rank-sum test between every event-type pair's
    value distributions: exact half-unit tied ranks, tie-corrected
    variance, one fixed z finish — the nonparametric A/B value
    comparison."""
    from pennsieve_streaming_spark.operators.analytics import (
        mann_whitney,
    )

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return mann_whitney(ev.select("event_type", "value"))


def q_simpson_diversity(spark, sf_dir):
    """Per-user Simpson concentration / Gini-Simpson diversity over
    event types: exact count folds, two fixed divisions — the
    dominance-sensitive complement of ev_user_entropy."""
    from pennsieve_streaming_spark.operators.analytics import (
        simpson_diversity,
    )

    return simpson_diversity(_user_events(spark, sf_dir))


def q_gopher_quality(spark, sf_dir):
    """Gopher quality-signal panel per doc: word-count/mean-word-
    length bands, symbol/bullet/ellipsis ratios, alpha-word floor,
    stopword rule — every rule an exact integer cross-multiplication,
    composed keep flag."""
    from pennsieve_streaming_spark.llm.curation import (
        gopher_quality_filters,
    )

    return gopher_quality_filters(_docs(spark, sf_dir))


def q_lexical_diversity(spark, sf_dir):
    """Lexical-diversity panel per doc: TTR, root TTR, Herdan's C,
    Maas a² from exact token/type counts — the length-corrected
    vocabulary-richness signals beside doc_heaps_law."""
    from pennsieve_streaming_spark.llm.text import lexical_diversity

    return lexical_diversity(_docs(spark, sf_dir))


def q_intrinsic_dim(spark, sf_dir):
    """TwoNN intrinsic-dimension estimate over the probe set: μ =
    d₂/d₁ angular-distance ratios from the gated exact top-k,
    nano-nat ln MLE — how much of the ambient dimension the corpus
    actually uses."""
    from pennsieve_streaming_spark.llm.similarity import (
        twonn_intrinsic_dim,
    )

    embs = _embs(spark, sf_dir)
    return twonn_intrinsic_dim(embs, embs.filter(F.col("vec_id") < 20))


def q_knn_assortativity(spark, sf_dir):
    """In-degree assortativity of the gated kNN graph: exact degree
    moments, one Pearson finish — the hub-structure health readout
    for graph-ANN routing."""
    from pennsieve_streaming_spark.llm.similarity import (
        knn_degree_assortativity,
    )

    embs = _embs(spark, sf_dir)
    edges = lsh_bucketed_ann(embs, embs, k=3, broadcast_queries=False)
    return knn_degree_assortativity(edges)


def q_image_orientation(spark, sf_dir):
    """Integer-Sobel edge-orientation octant histogram per media item
    over the synthetic luminance field (REAL kernel, no atan2
    anywhere) — the texture-anisotropy readout beside
    mm_image_edges' density."""
    from pennsieve_streaming_spark.llm.imagehash import (
        edge_orientation_synthetic,
    )

    return edge_orientation_synthetic(_docs(spark, sf_dir))


def q_dynamic_range(spark, sf_dir):
    """Loudness-range macro-dynamics of the lead audio channel: p95/
    p10 frame-energy order statistics (exact integers), one log10 dB
    finish — the compression detector beside ts_crest_factor."""
    from pennsieve_streaming_spark.dsp.spectral import dynamic_range

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("channel") == "lead"
    )
    return dynamic_range(s, frame=64, quant=1)


def q_records(spark, sf_dir):
    """Running-record counts per channel (records theory: i.i.d. sets
    ~ln n records, trends set Θ(n)) — the distribution-free trend
    screen beside ts_mann_kendall."""
    from pennsieve_streaming_spark.operators.stats import record_counts

    return record_counts(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_stream_kmv(spark, sf_dir):
    """Streaming KMV bottom-k distinct sketch over the user feed:
    order-independent min-k state (the circadian commutativity
    class), md5-prefix hashes, the (k−1)/R_k estimator — drained
    snapshot bit-identical to the batch SQL, so the batch oracle
    gates the STREAMING operator."""
    import tempfile

    from pennsieve_streaming_spark.streaming.kmv import (
        KMV_EST,
        kmv_stream,
    )

    ev = _user_events(spark, sf_dir).select("user_id")
    base = tempfile.mkdtemp(prefix="pss_stream_kmv_")
    src = f"{base}/src"
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id long").parquet(src)
    q = (
        kmv_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    mx = out.agg(F.max("n_seen").alias("_mx"))
    last = out.crossJoin(F.broadcast(mx)).filter(
        F.col("n_seen") == F.col("_mx")
    )
    m = last.agg(
        F.max("h").cast("long").alias("hk"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    return last.crossJoin(F.broadcast(m)).select(
        "rank",
        "h",
        "n_kept",
        F.expr(KMV_EST).alias("est_distinct"),
    )


def q_bollinger_breaks(spark, sf_dir):
    """Bollinger-band breakout counts per channel: trailing 20-sample
    mean ± 2σ tests cross-multiplied to PURE int64 algebra (no floats
    anywhere) — the volatility-envelope event detector beside
    ts_cusum_monitor."""
    from pennsieve_streaming_spark.operators.stats import (
        bollinger_breaks,
    )

    return bollinger_breaks(
        TBL.samples_view(spark, sf_dir), window=20, k=2,
        quant=CORR_QUANT,
    )


def q_turning_points(spark, sf_dir):
    """Turning-point randomness test per channel on the LOCF day
    grid: strict local-extrema counts vs the i.i.d. null 2(n−2)/3 —
    the cheapest trend/oscillation screen."""
    from pennsieve_streaming_spark.operators.stats import (
        turning_points,
    )

    return turning_points(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_case_profile(spark, sf_dir):
    """Capitalization/digit profile per doc: ALL-CAPS, TitleCase and
    digit-word shares from anchored ASCII regex classes — the
    orthographic quality axis."""
    from pennsieve_streaming_spark.llm.text import case_profile

    return case_profile(_docs(spark, sf_dir))


def q_ab_cuped(spark, sf_dir):
    """CUPED variance-reduced A/B comparison: pre-period activity
    covariate, pooled θ, moment-space adjusted diff and z — the
    estimator production experimentation platforms ship."""
    from pennsieve_streaming_spark.operators.analytics import ab_cuped

    TBL.ensure_session_confs(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ab_cuped(
        ev.select(
            "user_id",
            "event_type",
            TBL.epoch_micros_col(ev, "ts").alias("ts"),
            "value",
        )
    )


def q_stream_records(spark, sf_dir):
    """Streaming running-record tracker over the event channels:
    exact integer frontier state per channel (in-order contract, the
    burstiness class) — the drained snapshot is bit-identical to the
    batch window fold, so the batch SQL gates the STREAMING
    operator."""
    import tempfile

    from pennsieve_streaming_spark.streaming.records import (
        records_stream,
    )

    ce = TBL.chan_events_view(spark, sf_dir).orderBy("ts", "value")
    base = tempfile.mkdtemp(prefix="pss_stream_rec_")
    src = f"{base}/src"
    ce.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    q = (
        records_stream(stream, quant=CORR_QUANT)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    w = Window.partitionBy("channel").orderBy(F.desc("n_points"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_katz_fd(spark, sf_dir):
    """Katz fractal dimension per channel: exact path-length and
    excursion folds, one shared ln finish — the one-pass waveform
    complexity number beside ts_higuchi_fd."""
    from pennsieve_streaming_spark.operators.stats import katz_fd

    return katz_fd(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_drawdown(spark, sf_dir):
    """Maximum drawdown per channel: deepest drop below the running
    peak, first-trough tie-break, exact integer algebra — the risk
    number beside ts_records' frontier counts."""
    from pennsieve_streaming_spark.operators.stats import max_drawdown

    return max_drawdown(TBL.samples_view(spark, sf_dir), CORR_QUANT)


def q_bloom_contamination(spark, sf_dir):
    """Bloom-filter decontamination screen audited against the exact
    set test in the same pass: constant-size (2 KB) bitset broadcast,
    %·+ probe positions, reported false-positive surplus — the
    100 TB shape of benchmark-overlap checking."""
    from pennsieve_streaming_spark.llm.curation import (
        bloom_contamination,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    return bloom_contamination(docs, bench, k=3, threshold=0.5)


def q_contamination_screened(spark, sf_dir):
    """Production-shaped decontamination: bloom pre-screen over the
    whole corpus, exact overlap audit behind a CASE guard on the
    flagged rows only — identical verdicts to doc_contamination (the
    bloom test has no false negatives) at screen cost plus the exact
    cost of just the flagged fraction."""
    from pennsieve_streaming_spark.llm.curation import (
        contamination_screened,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    # n_bits pinned to the module default: the DuckDB oracle's probe
    # set is built at BLOOM_M, so the gated run must not auto-size.
    from pennsieve_streaming_spark.llm.curation import BLOOM_M

    return contamination_screened(
        docs, bench, k=3, threshold=0.5, n_bits=BLOOM_M
    )


# ---------------------------------------------------------------------------
# round-10 wave-1: volatility / SPC / two-sample / traffic-anomaly panel
# ---------------------------------------------------------------------------

CPK_LSL = 0.0          # spec limits for the SPC capability panel
CPK_USL = 120_000.0    # just above the samples value ceiling


def q_arch_lm(spark, sf_dir):
    """Engle ARCH(1) LM volatility-clustering test per channel on the
    LOCF day grid: squared rounded-integer-demeaned series regressed
    on its lag, LM = n·R² vs the χ²(1) 5% critical value — exact
    DECIMAL(38,0) moments, one fixed R² finish."""
    from pennsieve_streaming_spark.operators.stats import arch_lm

    return arch_lm(_locf_day_grid(spark, sf_dir), CORR_QUANT)


def q_process_capability(spark, sf_dir):
    """Cp/Cpk process-capability panel per channel against fixed spec
    limits [0, 120000]: exact quantized moments (Σx BIGINT, Σx²
    DECIMAL(38,0)), fixed sqrt-division finishes, the ≥1.33 capable
    flag — ONE partial-agg groupBy, no window, no join."""
    from pennsieve_streaming_spark.operators.stats import (
        process_capability,
    )

    return process_capability(
        TBL.samples_view(spark, sf_dir), CPK_LSL, CPK_USL, CORR_QUANT
    )


def q_ks_two_sample(spark, sf_dir):
    """Exact two-sample KS between ch2 and ch5 value distributions:
    integer supremum numerator max|n_b·cum_a − n_a·cum_b| over the
    pooled value grid (two-phase cumsum, never a single-task window),
    one rounded division, the 1.358-coefficient 5% rejection rule."""
    from pennsieve_streaming_spark.operators.stats import ks_two_sample

    return ks_two_sample(
        TBL.samples_view(spark, sf_dir), *GRID_CHANNELS, CORR_QUANT
    )


def q_daily_anomalies(spark, sf_dir):
    """Robust daily-volume anomaly screen over the events feed:
    exact integer daily counts, two-phase-rank median and MAD, the
    Iglewicz-Hoaglin |z| > 3.5 flag as an exact integer
    cross-multiplication."""
    from pennsieve_streaming_spark.operators.analytics import (
        daily_anomalies,
    )

    return daily_anomalies(_user_events(spark, sf_dir))


# round-10 wave-2: audio pitch/tempo/SNR + image palette

PITCH_FRAME, PITCH_LO, PITCH_HI = 64, 2, 32
TEMPO_LO, TEMPO_HI = 4, 32
AUDIO_RATE_HZ = 1000.0


def q_audio_pitch(spark, sf_dir):
    """Frame-wise autocorrelation pitch track over the audio lanes:
    exact BIGINT frame-demean, DECIMAL(38,0) lag products, argmax
    under (R DESC, lag ASC), integer-cross-multiplied 0.3 voicing
    gate — the periodicity member of the VAD/ZCR front-end trio."""
    from pennsieve_streaming_spark.dsp.spectral import pitch_track

    return pitch_track(
        TBL.samples_aligned_view(spark, sf_dir),
        PITCH_FRAME, PITCH_LO, PITCH_HI, CORR_QUANT, AUDIO_RATE_HZ,
    )


def q_audio_tempo(spark, sf_dir):
    """Energy-novelty tempo estimate per audio lane: exact integer
    onset strength (clamped frame-energy delta, de-scaled div 1024),
    lag autocorrelation argmax, one fixed BPM finish."""
    from pennsieve_streaming_spark.dsp.spectral import tempo_estimate

    return tempo_estimate(
        TBL.samples_aligned_view(spark, sf_dir),
        PITCH_FRAME, TEMPO_LO, TEMPO_HI, CORR_QUANT, AUDIO_RATE_HZ,
    )


def q_audio_snr(spark, sf_dir):
    """Channel SNR from the energy_vad frame split (signal = frames
    above 2x median energy): exact integer energies and split,
    DECIMAL(38,0) channel sums, one log10-inside-round dB finish."""
    from pennsieve_streaming_spark.dsp.spectral import snr_estimate

    return snr_estimate(
        TBL.samples_aligned_view(spark, sf_dir), PITCH_FRAME, CORR_QUANT
    )


def q_incremental_dedup(spark, sf_dir):
    """Incremental-crawl dedup screen: the src0 delta scored by best
    shingle-containment match in the standing corpus (every other
    source) — dedups the new batch WITHOUT re-pairing the standing
    corpus against itself. Exact counts, one integer-ratio division,
    total-order best-match pick, −1/0.0 sentinels for matchless
    docs."""
    from pennsieve_streaming_spark.llm.dedup import (
        cross_corpus_containment_presplit,
    )

    docs = _docs(spark, sf_dir)
    new_ids = docs.filter(F.col("source") == "src0").select("doc_id")
    # pre-split (optimization r11): shingle the delta and the standing
    # corpus from their own document rows instead of semi/anti-
    # splitting a full-corpus shingle explode per plan reference —
    # identical rows (shingling commutes with the doc-level split).
    return cross_corpus_containment_presplit(
        shingles(docs.filter(F.col("source") == "src0")),
        shingles(docs.filter(F.col("source") != "src0")),
        new_ids=new_ids,
        threshold=0.5,
        max_doc_freq=JACCARD_MAX_DF,
    )


def q_dedup_token_funnel(spark, sf_dir):
    """Dedup-funnel shrinkage in TOKEN mass, not doc counts — the
    number a training-budget owner actually needs (docs_remaining
    says how many rows survived; tokens_remaining says how much
    training data). Text stages only (total -> exact content digest
    -> near-dup cluster survivors); every stage composes an
    already-gated operator and all masses are exact BIGINTs."""
    from pennsieve_streaming_spark.llm.curation import N_TOKENS
    from pennsieve_streaming_spark.llm.dedup import exact_dedup
    from pennsieve_streaming_spark.llm.graph import cluster_dedup

    docs = _docs(spark, sf_dir)
    d = docs.select("doc_id", F.expr(N_TOKENS).alias("_nt"))
    keep = exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    near = cluster_dedup(docs, _verified_pairs(spark, sf_dir)).select(
        "doc_id"
    )

    # ONE corpus pass (optimization r11): the per-stage formulation
    # (3 stage aggs + the total) evaluated `d` — and with it the
    # whitespace-split token count over every document — FOUR times.
    # Both id sets are unique (groupBy representative / anti-join of a
    # unique corpus), so a left-join flag is row-for-row the old
    # semi-join and the three stages fold into one conditional
    # aggregation; the stage rows are then unpivoted from the single
    # result row (explode of a literal array — order preserved).
    # Empty-stage semantics match the old aggs exactly: count -> 0,
    # conditional sum with no matching rows -> NULL.
    flags = d.join(
        keep.withColumn("_k", F.lit(1)), "doc_id", "left"
    ).join(near.withColumn("_n", F.lit(1)), "doc_id", "left")
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("d0"),
        F.sum("_nt").cast("long").alias("t0"),
        F.count("_k").cast("long").alias("d1"),
        F.sum(F.when(F.col("_k").isNotNull(), F.col("_nt")))
        .cast("long")
        .alias("t1"),
        F.count("_n").cast("long").alias("d2"),
        F.sum(F.when(F.col("_n").isNotNull(), F.col("_nt")))
        .cast("long")
        .alias("t2"),
    )
    rows = agg.select(
        F.explode(
            F.expr(
                "array("
                "named_struct('stage', '0_total', "
                "  'docs_remaining', d0, 'tokens_remaining', t0), "
                "named_struct('stage', '1_exact', "
                "  'docs_remaining', d1, 'tokens_remaining', t1), "
                "named_struct('stage', '2_near_dup', "
                "  'docs_remaining', d2, 'tokens_remaining', t2))"
            )
        ).alias("r"),
        F.col("t0").alias("_tt"),
    )
    return rows.select(
        F.col("r.stage").alias("stage"),
        F.col("r.docs_remaining").alias("docs_remaining"),
        F.col("r.tokens_remaining").alias("tokens_remaining"),
        F.expr(
            "round(CAST(r.tokens_remaining AS DOUBLE) / _tt, 9)"
        ).alias("token_share"),
    )


def q_stream_shard_manifest(spark, sf_dir):
    """Streaming shard manifest drained with availableNow: the
    per-doc (shard, tokens, chars, digest) projection is STATELESS,
    and the manifest finish (counts, masses, mod-2^63 checksum) is
    commutative — so the drained rows aggregate to the batch
    manifest bit-exactly and doc_shard_manifest's oracle gates the
    stream verbatim. The ingest-time shape: the manifest accretes as
    shards are written, no end-of-job corpus pass."""
    import tempfile

    from pennsieve_streaming_spark.llm.curation import N_TOKENS
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="pss_stream_manifest_")
    src = f"{base}/src"
    docs.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    rows = stream.select(
        F.expr(
            f"pmod({md5_hash64_expr('CAST(doc_id AS STRING)')}, "
            f"{SHARD_COUNT})"
        ).cast("long").alias("shard"),
        F.expr(N_TOKENS).alias("_nt"),
        F.expr("CAST(length(text) AS BIGINT)").alias("_nc"),
        F.expr(md5_hash64_expr("text")).alias("_h"),
    )
    q = (
        rows.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.read.parquet(f"{base}/out")
    return drained.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum("_nc").cast("long").alias("n_chars"),
        F.expr(
            "sum(CAST(_h AS DECIMAL(38,0))) % 9223372036854775807"
        ).cast("long").alias("checksum"),
    )


def q_classifier_calibration(spark, sf_dir):
    """Reliability diagram for the distilled quality classifier:
    scores bucketed into deciles, per-bucket label rate vs mean
    predicted score and the calibration gap — the is-the-score-a-
    probability eval every model-based filter needs before its scores
    drive sampling temperatures. Scores are the 9-dp-quantized
    sigmoids (bit-replayable), so decile edges, nano-int score sums
    and the single-expression gap are engine-exact."""
    cls = q_quality_classifier(spark, sf_dir)
    g = cls.select(
        F.expr(
            "least(CAST(floor(score * 10) AS BIGINT), CAST(9 AS BIGINT))"
        ).alias("decile"),
        F.expr("CASE WHEN label THEN 1 ELSE 0 END").alias("_pos"),
        F.expr("CAST(round(score * 1000000000) AS BIGINT)").alias("_sn"),
    ).groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_pos").cast("long").alias("n_label_pos"),
        F.sum("_sn").cast("long").alias("_sum_nano"),
    )
    return g.select(
        "decile",
        "n_docs",
        "n_label_pos",
        F.expr(
            "round(CAST(n_label_pos AS DOUBLE) / n_docs, 9)"
        ).alias("label_rate"),
        F.expr(
            "round(CAST(_sum_nano AS DOUBLE) / n_docs / 1e9, 9)"
        ).alias("mean_score"),
        F.expr(
            "round(CAST(_sum_nano AS DOUBLE) / n_docs / 1e9 "
            "- CAST(n_label_pos AS DOUBLE) / n_docs, 9)"
        ).alias("calib_gap"),
    )


SHARD_COUNT = 8


def q_shard_manifest(spark, sf_dir):
    """Deterministic training-shard manifest: every doc hashed to one
    of 8 shards (the stratified-sample hash discipline — stable under
    re-runs and engine-portable), with per-shard doc/token/char
    masses and an order-independent content checksum (sum of per-doc
    md5-int64 digests mod 2^63) — the reproducibility artifact a
    corpus export publishes so a training job can verify its inputs."""
    from pennsieve_streaming_spark.llm.curation import N_TOKENS
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    docs = _docs(spark, sf_dir)
    h = md5_hash64_expr("text")
    return (
        docs.select(
            F.expr(f"pmod({md5_hash64_expr('CAST(doc_id AS STRING)')}, "
                   f"{SHARD_COUNT})").cast("long").alias("shard"),
            F.expr(N_TOKENS).alias("_nt"),
            F.expr("CAST(length(text) AS BIGINT)").alias("_nc"),
            F.expr(h).alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_chars"),
            # _h is the non-negative 60-bit md5 prefix, so plain %
            # equals pmod on both engines; the DECIMAL(38,0) sum is
            # exact at any shard size
            F.expr(
                "sum(CAST(_h AS DECIMAL(38,0))) % 9223372036854775807"
            ).cast("long").alias("checksum"),
        )
    )


def q_stream_contamination(spark, sf_dir):
    """Streaming screened decontamination drained with availableNow:
    the batch bloom->exact rule as a STATELESS stream-static
    broadcast-join projection (no state store, append mode), so the
    drained table is bit-identical to the batch operator and
    doc_contamination_screened's oracle gates the stream verbatim."""
    import tempfile

    from pennsieve_streaming_spark.llm.curation import BLOOM_M
    from pennsieve_streaming_spark.streaming.contamination import (
        contamination_screen_stream,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    base = tempfile.mkdtemp(prefix="pss_stream_contam_")
    src = f"{base}/src"
    docs.select("doc_id", "text").coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    out = contamination_screen_stream(
        stream, bench, k=3, threshold=0.5, n_bits=BLOOM_M
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def q_contamination_by_source(spark, sf_dir):
    """Per-source rollup of the screened-decontamination verdicts
    (which feeds leak the eval set): bloom screen + ratio-gated exact
    audit with source carried through the SAME single corpus scan,
    exact BIGINT masses, fixed rate divisions."""
    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_M,
        contamination_by_source,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    return contamination_by_source(
        docs, bench, k=3, threshold=0.5, n_bits=BLOOM_M
    )


def q_pack_efficiency(spark, sf_dir):
    """Tokenizer-aware packing efficiency per source shard: the
    trained-BPE subtoken counts (the doc_bpe_token_ids encode) fed
    through the pack_sequences rule, reporting fill ratio, boundary-
    straddling docs, and docs per sequence — what the token budget
    actually buys, under the real tokenizer rather than whitespace."""
    from pennsieve_streaming_spark.llm.curation import pack_efficiency
    from pennsieve_streaming_spark.llm.text import bpe_encode

    docs = _docs(spark, sf_dir)
    enc = bpe_encode(docs, n_merges=BPE_K, min_count=BPE_MIN_COUNT)
    per_doc = enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    counts = docs.select("doc_id", "source").join(
        per_doc, "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias(
            "n_tokens"
        ),
    )
    return pack_efficiency(counts, budget=PACK_BUDGET)


def q_lsh_tuning(spark, sf_dir):
    """Data-driven LSH banding tuner: every power-of-two (bands,
    rows) split of the 16-perm MinHash signature scored against the
    observed df-capped exact-Jaccard pair distribution — expected
    candidate / false-candidate / missed mass as exact nano-int sums
    of repeated-squaring S-curve terms (no libm pow in the masses)."""
    from pennsieve_streaming_spark.llm.dedup import lsh_tuning_panel

    # pinned shingles (optimization r11): the q_ngram_jaccard rule.
    sh = pin(shingles(_docs(spark, sf_dir)))
    pairs = jaccard_pairs(sh, max_doc_freq=JACCARD_MAX_DF)
    return lsh_tuning_panel(pairs, n_perms=16, tau=LSH_EVAL_TAU)


def q_corpus_build(spark, sf_dir):
    """The composed end-to-end corpus build as ONE plan: exact dedup
    (keep min doc_id per md5) -> the full curate_corpus gate cascade
    (quality / repetition / decontamination / per-language sampling)
    -> concat-and-chunk packing -> per-source shard report (inputs,
    unique, kept, tokens, sequences, fill). The benchmark set stays
    the RAW corpus's doc_id % 29 split — the eval set is external to
    dedup. The keeper derivation is exact_dedup's rule verbatim
    (min doc_id per md5 digest) with the keeper's source carried
    through the same aggregation."""
    from pennsieve_streaming_spark.llm.curation import curate_corpus

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    # pin the keeper list (optimization r11): dd is referenced by BOTH
    # the per-source unique counts and the curation cascade, and each
    # reference replayed the corpus-wide md5 groupBy; the pinned list
    # is the narrow proxy, so the digest agg runs once. The pin also
    # carries the keeper's source (min_by = the min-doc_id row's
    # source, i.e. exactly the source of the kept doc), so
    # n_exact_unique aggregates the tiny pinned table directly instead
    # of re-scanning the corpus for a semi-join + groupBy.
    keep = pin(
        docs.withColumn("digest", F.md5(F.col("text")))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.expr("min_by(source, doc_id)").alias("source"),
        )
        .select("doc_id", "source")
    )
    dd = docs.join(keep.select("doc_id"), "doc_id", "left_semi")
    cur = curate_corpus(dd, bench, SAMPLE_RATES, pack_budget=PACK_BUDGET)
    per_in = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_input")
    )
    per_dd = keep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_unique")
    )
    per_kept = cur.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_tokens").cast("long").alias("kept_tokens"),
    )
    n_seqs = (
        "(CASE WHEN kept_tokens IS NULL OR kept_tokens = 0 "
        "THEN CAST(0 AS BIGINT) "
        f"ELSE (kept_tokens + {PACK_BUDGET - 1}) div {PACK_BUDGET} END)"
    )
    return (
        per_in.join(per_dd, "source", "left")
        .join(per_kept, "source", "left")
        .select(
            "source",
            "n_input",
            F.coalesce(F.col("n_exact_unique"), F.lit(0))
            .cast("long")
            .alias("n_exact_unique"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias(
                "n_kept"
            ),
            F.coalesce(F.col("kept_tokens"), F.lit(0))
            .cast("long")
            .alias("kept_tokens"),
            F.expr(n_seqs).alias("n_seqs"),
            F.expr(
                f"CASE WHEN {n_seqs} > 0 THEN "
                "round(CAST(kept_tokens AS DOUBLE) "
                f"/ ({n_seqs} * {PACK_BUDGET}), 9) ELSE 0e0 END"
            ).alias("fill_ratio"),
        )
    )


def q_incremental_build(spark, sf_dir):
    """Incremental-crawl corpus build composed as ONE plan — the
    recurring production shape (doc_corpus_build covers only the
    from-scratch build): the src0 delta is exact-deduped within
    itself, screened against the standing corpus by best shingle
    containment (the broadcast-delta fast path: the standing corpus's
    shingle table never shuffles), passed through the full curation
    gate cascade (quality / repetition / decontamination /
    per-language sampling), packed, and published as the per-shard
    manifest DELTA a recurring crawl appends: doc/token/char masses,
    distinct training sequences touched, and the order-independent
    content checksum a training job verifies. Benchmark set stays
    doc_id % 29 of the RAW corpus (external to dedup). Shingle-less
    delta docs (< 3 tokens) cannot be near-dups and pass the screen."""
    from pennsieve_streaming_spark.llm.curation import curate_corpus
    from pennsieve_streaming_spark.llm.dedup import (
        cross_corpus_containment_presplit,
        exact_dedup,
    )
    from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

    docs = _docs(spark, sf_dir)
    delta = docs.filter(F.col("source") == "src0")
    standing = docs.filter(F.col("source") != "src0")
    keep = exact_dedup(delta).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    # pin: dd (the exact-deduped delta, delta-sized) feeds the shingle
    # union, the screen id list, and the fresh anti-join — unpinned,
    # the dedup agg re-executes per reference
    dd = pin(delta.join(keep, "doc_id", "left_semi"))
    # pre-split screen (optimization r11): shingle the surviving delta
    # and the standing corpus separately instead of shingling
    # standing ∪ dd and letting the containment join semi/anti-split
    # the union per plan reference — identical verdicts, and the
    # union+explode is no longer replayed 4x. Dropped exact dups
    # still never reach the standing side (dd IS the survivor set).
    screen = cross_corpus_containment_presplit(
        shingles(dd),
        shingles(standing),
        new_ids=dd.select("doc_id"),
        threshold=0.5,
        max_doc_freq=JACCARD_MAX_DF,
    )
    dup_ids = screen.filter(F.col("is_dup")).select("doc_id")
    # pin: fresh embeds the whole screen and feeds BOTH the gate
    # cascade and the manifest join — unpinned, the screen (and its
    # corpus shingle scans) executes once per consumer
    fresh = pin(dd.join(F.broadcast(dup_ids), "doc_id", "left_anti"))
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    cur = curate_corpus(
        fresh, bench, SAMPLE_RATES, pack_budget=PACK_BUDGET
    )
    man = pin(
        fresh.select("doc_id", "text")
        .join(
            cur.select("doc_id", "n_tokens", "start_seq", "end_seq"),
            "doc_id",
        )
        .select(
            F.expr(
                f"pmod({md5_hash64_expr('CAST(doc_id AS STRING)')}, "
                f"{SHARD_COUNT})"
            )
            .cast("long")
            .alias("shard"),
            F.col("n_tokens").alias("_nt"),
            F.expr("CAST(length(text) AS BIGINT)").alias("_nc"),
            F.expr(md5_hash64_expr("text")).alias("_h"),
            "start_seq",
            "end_seq",
        )
    )
    per = man.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
        F.sum("_nc").cast("long").alias("n_chars"),
        F.expr(
            "sum(CAST(_h AS DECIMAL(38,0))) % 9223372036854775807"
        )
        .cast("long")
        .alias("checksum"),
    )
    seqs = (
        man.select(
            "shard",
            F.explode(F.expr("sequence(start_seq, end_seq)")).alias(
                "_seq"
            ),
        )
        .distinct()
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_seqs_touched"))
    )
    # seqs is one row per occupied shard (bounded by SHARD_COUNT)
    return per.join(F.broadcast(seqs), "shard").select(
        "shard",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_seqs_touched",
        "checksum",
    )


def q_crawl_screen(spark, sf_dir):
    """Bloom containment pre-screen of the src0 crawl delta against
    the standing corpus: the standing shingle set folds into ONE
    bitset (distributed bit_or build — the driver only ever holds the
    finished words), every delta doc scored in one narrow map. No
    false negatives: unflagged docs are provably not near-dups, so
    only the flagged few pay the exact containment join."""
    from pennsieve_streaming_spark.llm.dedup import (
        CRAWL_BLOOM_M,
        crawl_bloom_screen,
    )

    docs = _docs(spark, sf_dir)
    new_ids = docs.filter(F.col("source") == "src0").select("doc_id")
    # n_bits pinned to the module rung: the DuckDB oracle's position
    # set is built at CRAWL_BLOOM_M, so the gated run must not
    # auto-size.
    return crawl_bloom_screen(
        docs, new_ids, k=3, threshold=0.5, n_bits=CRAWL_BLOOM_M
    )


def q_incremental_dedup_screened(spark, sf_dir):
    """Production-scale incremental-crawl dedup: bloom pre-screen
    decides WHICH delta docs pay the exact containment join —
    verdicts identical to doc_incremental_dedup, sentinels for the
    provably-clean unflagged rows (the contamination_screened
    contract applied to crawl dedup)."""
    from pennsieve_streaming_spark.llm.dedup import (
        CRAWL_BLOOM_M,
        cross_corpus_containment_screened,
    )

    docs = _docs(spark, sf_dir)
    new_ids = docs.filter(F.col("source") == "src0").select("doc_id")
    return cross_corpus_containment_screened(
        docs,
        new_ids,
        k=3,
        threshold=0.5,
        max_doc_freq=JACCARD_MAX_DF,
        n_bits=CRAWL_BLOOM_M,
    )


def q_crawl_gain(spark, sf_dir):
    """The crawl KPI: per-language novel-content mass of the src0
    delta — how much NEW training data this crawl brought. Joins the
    exact incremental-dedup verdicts with per-doc token masses and
    rolls up (docs, dups, novel/dup tokens, novelty rate) per lang;
    exact BIGINT masses, one fixed rate division."""
    from pennsieve_streaming_spark.llm.curation import N_TOKENS

    docs = _docs(spark, sf_dir)
    verdicts = q_incremental_dedup(spark, sf_dir).select(
        "doc_id", "is_dup"
    )
    delta = docs.filter(F.col("source") == "src0").select(
        "doc_id", "lang", F.expr(N_TOKENS).alias("n_tokens")
    )
    return (
        delta.join(verdicts, "doc_id", "left")
        .select(
            "lang",
            "n_tokens",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CASE WHEN is_dup THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("n_dups"),
            F.sum(
                F.expr("CASE WHEN is_dup THEN 0 ELSE n_tokens END")
            )
            .cast("long")
            .alias("novel_tokens"),
            F.sum(
                F.expr("CASE WHEN is_dup THEN n_tokens ELSE 0 END")
            )
            .cast("long")
            .alias("dup_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_dups",
            "novel_tokens",
            "dup_tokens",
            F.expr(
                "round(CASE WHEN novel_tokens + dup_tokens = 0 "
                "THEN CAST(0 AS DOUBLE) ELSE novel_tokens "
                "/ CAST(novel_tokens + dup_tokens AS DOUBLE) END, 9)"
            ).alias("novelty_rate"),
        )
    )


def q_stream_crawl_screen(spark, sf_dir):
    """Streaming crawl-dedup pre-screen drained with availableNow:
    the batch bloom rule as a STATELESS stream-static broadcast-join
    projection (no state store, append mode), so the drained table is
    bit-identical to the batch operator and doc_crawl_screen's oracle
    gates the stream verbatim."""
    import tempfile

    from pennsieve_streaming_spark.llm.dedup import CRAWL_BLOOM_M
    from pennsieve_streaming_spark.streaming.crawl import (
        crawl_screen_stream,
    )

    docs = _docs(spark, sf_dir)
    standing = docs.filter(F.col("source") != "src0")
    base = tempfile.mkdtemp(prefix="pss_stream_crawl_")
    src = f"{base}/src"
    docs.filter(F.col("source") == "src0").select(
        "doc_id", "text"
    ).coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(src)
    out = crawl_screen_stream(
        stream, standing, k=3, threshold=0.5, n_bits=CRAWL_BLOOM_M
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{base}/out")


def q_coverage_panel(spark, sf_dir):
    """Per-channel ingest-completeness panel: calendar coverage
    (active days / extent days), sample fill vs the nominal 10 Hz
    rate (exact integer expected count), and the longest calendar
    outage — the rolled-up channel-health number beside ts_gap_spans'
    per-gap listing."""
    from pennsieve_streaming_spark.operators.gaps import coverage_panel

    return coverage_panel(
        TBL.samples_view(spark, sf_dir), period_us=100_000
    )


def q_audio_dynamics(spark, sf_dir):
    """Loudness range (EBU-R128-style dynamics) of the lead audio
    lane: exact integer frame energies, integer percentile_disc
    p10/p95 order statistics, one dB finish inside round(,9) — the
    compression gate beside mm_audio_clipping."""
    from pennsieve_streaming_spark.dsp.spectral import loudness_range

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("channel") == "lead"
    )
    return loudness_range(s, frame=64, quant=1)


def q_rate_estimate(spark, sf_dir):
    """Per-channel empirical sample-rate estimate from the
    inter-sample gap order statistics (exact integer percentile_disc
    picks): median-gap-implied rate, p90−p10 jitter, and a 5%
    agreement flag against the nominal 10 Hz catalog rate — the
    ingest sanity check behind every gap/resample threshold."""
    from pennsieve_streaming_spark.operators.gaps import rate_estimate

    return rate_estimate(
        TBL.samples_view(spark, sf_dir), nominal_hz=10.0, tol=0.05
    )


def q_matryoshka_recall(spark, sf_dir):
    """Matryoshka (prefix-dimension) retrieval quality: recall@k of
    the exact cosine top-k computed on the first 32 / 16 of 64 dims
    against the full-dim ground truth — the quality-vs-cost curve
    for MRL-style adaptive retrieval, composed from the already
    oracle-gated exact top-k on both sides."""
    from pennsieve_streaming_spark.llm.similarity import cosine_topk

    embs = _embs(spark, sf_dir)
    # pin the full-dim ground truth (optimization r11): it is
    # referenced FOUR times (semi-join + distinct id list, x2 prefix
    # dims) and every reference replayed the exact-top-k corpus
    # scoring pass; pinned it is |queries| x k rows computed once.
    exact = pin(
        cosine_topk(
            embs, embs.filter(F.col("vec_id") < 20), k=ANN_K
        ).select("query_id", "neighbor_id")
    )
    outs = []
    for pdim in (32, 16):
        sl = embs.select(
            "vec_id",
            F.expr(f"slice(embedding, 1, {pdim})").alias("embedding"),
        )
        pre = cosine_topk(
            sl, sl.filter(F.col("vec_id") < 20), k=ANN_K
        ).select("query_id", "neighbor_id")
        hits = (
            exact.join(pre, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
        )
        per_q = (
            exact.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                F.coalesce("n_hit", F.lit(0)).cast("long").alias(
                    "n_hit"
                )
            )
        )
        outs.append(
            per_q.agg(
                F.count(F.lit(1)).cast("long").alias("n_queries"),
                F.sum("n_hit").cast("long").alias("_sh"),
                F.min("n_hit").cast("long").alias("_mn"),
            ).select(
                F.lit(pdim).cast("long").alias("prefix_dim"),
                "n_queries",
                F.expr(
                    f"round(_sh / CAST(n_queries * {ANN_K} "
                    "AS DOUBLE), 9)"
                ).alias("mean_recall"),
                F.expr(
                    f"round(_mn / CAST({ANN_K} AS DOUBLE), 9)"
                ).alias("min_recall"),
            )
        )
    return outs[0].unionByName(outs[1])


def q_mmd(spark, sf_dir):
    """Linear-time MMD² two-sample test between even- and odd-label
    embeddings: quadratic kernel (exact fold dot products, no
    transcendental), nano-quantized h sums, fixed mean/z finishes —
    the distribution-shift detector beyond centroid drift."""
    from pennsieve_streaming_spark.llm.similarity import mmd_linear

    return mmd_linear(_embs(spark, sf_dir))


def q_lsh_bucket_balance(spark, sf_dir):
    """Per-table LSH load-balance panel (bucket count, max bucket,
    expected probe cost Σsize²/N) over the banded lattice hyperplane
    index — the skew diagnostic that predicts ANN latency tails."""
    from pennsieve_streaming_spark.llm.similarity import (
        lsh_bucket_balance,
    )

    return lsh_bucket_balance(_embs(spark, sf_dir), dim=ANN_DIM)


def q_image_palette(spark, sf_dir):
    """Top-4 dominant RGB bins (2 bits/channel uniform cube) per
    media item over the synthetic RGB field via the REAL
    palette_counts kernel — exact counts, total-order top-k, one
    fixed share division."""
    from pennsieve_streaming_spark.llm.imagehash import (
        palette_synthetic,
    )

    return palette_synthetic(_docs(spark, sf_dir))


def q_stream_benford(spark, sf_dir):
    """Streaming Benford digit profile over the event channels:
    commutative count state (order-independent), chi²/MAD finished
    on the drained counts with the SAME shared SQL expressions as
    the batch operator — the batch SQL gates the stream."""
    import tempfile

    from pennsieve_streaming_spark.operators.stats import benford_exprs
    from pennsieve_streaming_spark.streaming.benford import (
        benford_stream,
    )

    ce = TBL.chan_events_view(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="pss_stream_benford_")
    src = f"{base}/src"
    ce.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    q = (
        benford_stream(stream, quant=CORR_QUANT)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    w = Window.partitionBy("channel").orderBy(F.desc("n"))
    final = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    chi2, mad = benford_exprs()
    return final.select(
        "channel",
        "n",
        *[f"c{i}" for i in range(1, 10)],
        F.expr(
            f"CASE WHEN n > 0 THEN round({chi2}, 9) ELSE 0e0 END"
        ).alias("chi2"),
        F.expr(
            f"CASE WHEN n > 0 THEN round(({mad}) / 9e0, 9) ELSE 0e0 END"
        ).alias("mad"),
    )


def q_stream_bollinger(spark, sf_dir):
    """Streaming Bollinger breakout monitor over the event channels:
    trailing-window integer ring state, the SAME pure int64 band
    algebra as the batch fold (in-order contract) — the batch SQL
    gates the stream."""
    import tempfile

    from pennsieve_streaming_spark.streaming.bollinger import (
        bollinger_stream,
    )

    ce = TBL.chan_events_view(spark, sf_dir).orderBy("ts", "value")
    base = tempfile.mkdtemp(prefix="pss_stream_boll_")
    src = f"{base}/src"
    ce.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "channel string, ts long, value double"
    ).parquet(src)
    q = (
        bollinger_stream(stream, window=20, k=2, quant=CORR_QUANT)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    w = Window.partitionBy("channel").orderBy(F.desc("n_tested"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_graph_search(spark, sf_dir):
    """Greedy best-neighbor routing over the gated kNN graph (the
    HNSW layer-0 search step, unrolled 3 hops from a fixed entry) —
    completes the graph-ANN triad: build (emb_knn_graph), health
    (emb_knn_assortativity), search (this)."""
    from pennsieve_streaming_spark.llm.similarity import (
        greedy_graph_search,
    )

    embs = _embs(spark, sf_dir)
    edges = lsh_bucketed_ann(
        embs, embs, k=3, broadcast_queries=False
    )
    return greedy_graph_search(
        edges,
        embs,
        embs.filter(F.col("vec_id") < 10),
        hops=3,
        entry_id=0,
    )


def q_rouge_pairs(spark, sf_dir):
    """ROUGE-1/2 P/R/F1 over the LSH-verified near-dup pairs: the
    asymmetric-overlap adjudication view beside the pairs' symmetric
    Jaccard — exact distinct-n-gram intersections, fixed-division
    finishes."""
    from pennsieve_streaming_spark.llm.text import rouge_pairs

    docs = _docs(spark, sf_dir)
    sh = pin(shingles(docs))
    cands = pin(
        lsh_candidate_pairs(
            lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
        )
    )
    # pin the (tiny) verified-pair id list: without it the ROUGE join
    # tree replays the whole LSH candidate pipeline per subtree
    # (~200-exchange plan — the q_lsh_pairs cache rule)

    pairs = pin(
        jaccard_pairs(sh, candidates=cands).select("doc_a", "doc_b")
    )
    return rouge_pairs(docs, pairs)


def q_image_equalize(spark, sf_dir):
    """Histogram-equalization checksum per media item: exact integer
    CDF remap over the synthetic luminance field (REAL kernel) — the
    contrast-enhancement op proven through the driver gate."""
    from pennsieve_streaming_spark.llm.imagehash import (
        equalize_synthetic,
    )

    return equalize_synthetic(_docs(spark, sf_dir))


def q_spectral_shape(spark, sf_dir):
    """Spectral centroid + bandwidth per (channel, window) from the
    gated quantized-DFT bins — the brightness/spread descriptors
    beside spectral entropy and spectral edge."""
    from pennsieve_streaming_spark.dsp.spectral import spectral_shape

    s = TBL.samples_aligned_view(spark, sf_dir).filter(
        F.col("ts") <= F.lit(BW_TS_END)
    )
    return spectral_shape(s, PS_BINS, PS_WINDOW, PS_QUANT)


def q_variogram(spark, sf_dir):
    """Empirical semivariogram per channel at day lags 1/2/4/7/14 on
    the LOCF day grid — the geostatistics range/sill view of temporal
    structure beside ts_allan_variance."""
    from pennsieve_streaming_spark.operators.stats import variogram

    return variogram(
        _locf_day_grid(spark, sf_dir), GRID_INTERVAL_US,
        (1, 2, 4, 7, 14), CORR_QUANT,
    )


def q_hapax_ratio(spark, sf_dir):
    """Per-source hapax-legomena shares: exact (source, token)
    rollups — the corpus-level rarity signal beside doc_heaps_law."""
    from pennsieve_streaming_spark.llm.text import hapax_ratio

    return hapax_ratio(_docs(spark, sf_dir))


def q_stream_simpson(spark, sf_dir):
    """Streaming Simpson diversity: commutative per-(user, type)
    count state; the drained counts aggregate with the SAME shared
    SIMPSON_LAMBDA SQL as the batch operator, so ev_simpson_diversity's
    oracle gates the stream verbatim."""
    import tempfile

    from pennsieve_streaming_spark.operators.analytics import (
        SIMPSON_LAMBDA,
    )
    from pennsieve_streaming_spark.streaming.simpson import (
        type_counts_stream,
    )

    ev = _user_events(spark, sf_dir).select("user_id", "event_type")
    base = tempfile.mkdtemp(prefix="pss_stream_simp_")
    src = f"{base}/src"
    ev.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_type string"
    ).parquet(src)
    q = (
        type_counts_stream(stream)
        .writeStream.format("parquet")
        .option("path", f"{base}/out")
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(f"{base}/out")
    final = out.groupBy("user_id", "event_type").agg(
        F.max("c").cast("long").alias("c")
    )
    g = final.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.expr("c * (c - 1)")).cast("long").alias("num"),
        F.max("c").cast("long").alias("top_c"),
    )
    return g.select(
        "user_id",
        "n_events",
        "n_types",
        F.expr(SIMPSON_LAMBDA).alias("simpson"),
        F.expr(
            f"CASE WHEN n_events > 1 THEN round(1e0 - ({SIMPSON_LAMBDA}), 9) "
            f"ELSE 0e0 END"
        ).alias("gini_simpson"),
        F.expr(
            "round(CAST(top_c AS DOUBLE) / CAST(n_events AS DOUBLE), 9)"
        ).alias("top_share"),
    )


def q_sma_cross(spark, sf_dir):
    """SMA-20/50 crossover events per channel: pure integer
    cross-multiplied sign algebra, zero-touch rows carry the prior
    sign — the trend-following event stream beside
    ts_bollinger_breaks."""
    from pennsieve_streaming_spark.operators.stats import (
        sma_crossovers,
    )

    return sma_crossovers(
        TBL.samples_view(spark, sf_dir), fast=20, slow=50,
        quant=CORR_QUANT,
    )


def q_mattr(spark, sf_dir):
    """Moving-average TTR (window 50) per doc: the length-unbiased
    lexical-diversity number — exact row-local window distinct
    counts, one fixed division."""
    from pennsieve_streaming_spark.llm.text import mattr

    return mattr(_docs(spark, sf_dir), window=50)


def q_cosine_thresholds(spark, sf_dir):
    """Per-probe cosine neighborhood-density curve at τ ∈ {0.5, 0.7,
    0.9}: exact counts over the broadcast-probe scored set — the
    dedup-threshold calibration readout."""
    from pennsieve_streaming_spark.llm.similarity import (
        cosine_threshold_counts,
    )

    embs = _embs(spark, sf_dir)
    return cosine_threshold_counts(
        embs, embs.filter(F.col("vec_id") < 20)
    )


def q_image_rle(spark, sf_dir):
    """RLE compressibility per media item: exact horizontal/vertical
    run counts over the synthetic field — the spatial-arrangement
    screen mm_image_entropy's histogram is blind to."""
    from pennsieve_streaming_spark.llm.imagehash import rle_synthetic

    return rle_synthetic(_docs(spark, sf_dir))


def q_dup_source_mix(spark, sf_dir):
    """Cross- vs within-source split of the verified near-dup pairs —
    the one-row diagnosis that decides global vs per-source dedup
    (a 100 TB shuffle-cost lever)."""
    from pennsieve_streaming_spark.llm.dedup import dup_source_mix

    docs = _docs(spark, sf_dir)
    sh = pin(shingles(docs))
    cands = pin(
        lsh_candidate_pairs(
            lsh_band_keys(minhash_wide(sh)), max_bucket_size=LSH_MAX_BUCKET
        )
    )
    pairs = pin(
        jaccard_pairs(sh, candidates=cands).select("doc_a", "doc_b")
    )
    return dup_source_mix(pairs, docs)


def q_weekend_effect(spark, sf_dir):
    """Weekend-vs-weekday binomial test per event type against the
    2/7 calendar null — the directional complement of ev_dow_chi2."""
    from pennsieve_streaming_spark.operators.analytics import (
        weekend_effect,
    )

    return weekend_effect(_user_events(spark, sf_dir))


# Rotation: through round 8 the driver-gate order was a hand-maintained
# _R8_FRONT list; it is now computed by tools/rotation_plan.py from the
# registry vs. every CORRECTNESS_r*.json the driver has written
# (VERDICT r8 item 5). Priority: never-driver-sampled (newest first,
# i.e. raw registry order) -> stale-red (oldest red round first) ->
# green (stalest green first). tests/test_rotation_plan.py asserts the
# live front-50 equals the tool's output.


def _rotation_order(names: list) -> list:
    """Gate order for queries(): delegate to tools/rotation_plan.py;
    fall back to the raw newest-first registry order (which is itself
    a correct never-sampled-first approximation) if the tool or the
    CORRECTNESS history is unavailable (e.g. a bare checkout)."""
    try:
        import os as _os
        import sys as _sys

        _tools = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "tools"
        )
        if _tools not in _sys.path:
            _sys.path.insert(0, _tools)
        import rotation_plan

        return rotation_plan.priority_order(names)
    except (ImportError, OSError):
        # the genuine bare-checkout cases (tools/ or the CORRECTNESS
        # history missing) — the raw newest-first registry order is a
        # correct approximation there, so stay quiet
        return list(names)
    except Exception as exc:  # tool regression / corrupt history: be LOUD
        import warnings as _warnings

        _warnings.warn(
            f"rotation_plan.priority_order failed ({exc!r}); "
            "falling back to raw registry order — the driver-gate "
            "front-50 may not match tools/rotation_plan.py",
            RuntimeWarning,
            stacklevel=2,
        )
        return list(names)


def _queries_raw() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver's correctness harness may cap how many
    # registry entries it checks per round (r3 checked the first 50 of 61),
    # so the NEWEST / least-proven queries are listed FIRST and the
    # longest-stable ts-core queries last. Keep new work at the top; the
    # live gate order is then refined by _rotation_order in queries().
    q = {
        # round-10 wave-5 additions (newest first)
        "doc_incremental_dedup": q_incremental_dedup,
        "doc_incremental_build": q_incremental_build,
        "doc_crawl_screen": q_crawl_screen,
        "doc_incremental_dedup_screened": q_incremental_dedup_screened,
        "doc_crawl_gain": q_crawl_gain,
        "stream_crawl_screen": q_stream_crawl_screen,
        "ts_coverage_panel": q_coverage_panel,
        "mm_audio_dynamics": q_audio_dynamics,
        "ts_rate_estimate": q_rate_estimate,
        "emb_matryoshka_recall": q_matryoshka_recall,
        "doc_dedup_token_funnel": q_dedup_token_funnel,
        "stream_shard_manifest": q_stream_shard_manifest,
        "doc_classifier_calibration": q_classifier_calibration,
        "doc_shard_manifest": q_shard_manifest,
        # round-10 wave-4 additions
        "stream_contamination": q_stream_contamination,
        "doc_corpus_build": q_corpus_build,
        "doc_pack_efficiency": q_pack_efficiency,
        "doc_contamination_by_source": q_contamination_by_source,
        "doc_lsh_tuning": q_lsh_tuning,
        # round-10 wave-3 additions
        "emb_mmd": q_mmd,
        "emb_lsh_bucket_balance": q_lsh_bucket_balance,
        # round-10 wave-2 additions
        "mm_audio_pitch": q_audio_pitch,
        "mm_audio_tempo": q_audio_tempo,
        "mm_audio_snr": q_audio_snr,
        "mm_image_palette": q_image_palette,
        # round-10 wave-1 additions
        "ts_arch_lm": q_arch_lm,
        "ts_process_capability": q_process_capability,
        "ts_ks_two_sample": q_ks_two_sample,
        "ev_daily_anomalies": q_daily_anomalies,
        # round-9 addition (VERDICT r8 item 4)
        "doc_contamination_screened": q_contamination_screened,
        # round-8 wave-11 additions (newest first)
        "mm_image_rle": q_image_rle,
        "doc_dup_source_mix": q_dup_source_mix,
        "ev_weekend_effect": q_weekend_effect,
        # round-8 wave-10 additions
        "ts_sma_cross": q_sma_cross,
        "doc_mattr": q_mattr,
        "emb_cosine_thresholds": q_cosine_thresholds,
        # round-8 wave-9 additions
        "ts_spectral_shape": q_spectral_shape,
        "ts_variogram": q_variogram,
        "doc_hapax_ratio": q_hapax_ratio,
        "stream_simpson": q_stream_simpson,
        # round-8 wave-8 additions
        "emb_graph_search": q_graph_search,
        "doc_rouge_pairs": q_rouge_pairs,
        "mm_image_equalize": q_image_equalize,
        # round-8 wave-7 additions
        "ts_katz_fd": q_katz_fd,
        "ts_drawdown": q_drawdown,
        "doc_bloom_contamination": q_bloom_contamination,
        "stream_benford": q_stream_benford,
        "stream_bollinger": q_stream_bollinger,
        # round-8 wave-6 additions
        "ts_bollinger_breaks": q_bollinger_breaks,
        "ts_turning_points": q_turning_points,
        "doc_case_profile": q_case_profile,
        "ev_ab_cuped": q_ab_cuped,
        "stream_records": q_stream_records,
        # round-8 wave-5 additions
        "mm_image_orientation": q_image_orientation,
        "mm_audio_dynamic_range": q_dynamic_range,
        "ts_records": q_records,
        "stream_kmv_distinct": q_stream_kmv,
        "doc_gopher_quality": q_gopher_quality,
        "doc_lexical_diversity": q_lexical_diversity,
        "emb_intrinsic_dim": q_intrinsic_dim,
        "emb_knn_assortativity": q_knn_assortativity,
        "ts_mann_kendall": q_mann_kendall,
        "ts_benford": q_benford,
        "ts_cointegration": q_cointegration,
        "ev_mann_whitney": q_mann_whitney,
        "ev_simpson_diversity": q_simpson_diversity,
        # round-8 additions (never driver-sampled yet; queue for the
        # round-9 rotation)
        "ts_matrix_profile": q_matrix_profile,
        "ts_variance_ratio": q_variance_ratio,
        "ts_kpss": q_kpss,
        "ts_poincare": q_poincare,
        "ts_dfa": q_dfa,
        "ev_lorenz_deciles": q_lorenz_deciles,
        "ev_burstiness": q_ev_burstiness,
        "ev_type_pmi": q_type_pmi,
        "ev_dow_chi2": q_dow_chi2,
        "ev_cohort_ltv": q_cohort_ltv,
        "doc_char_trigram_lm": q_char_trigram_lm,
        "doc_stopword_profile": q_stopword_profile,
        "doc_length_quantiles": q_length_quantiles,
        "doc_ngram_entropy": q_ngram_entropy,
        "doc_minhash_calibration": q_minhash_calibration,
        "emb_jl_distortion": q_jl_distortion,
        "emb_pq_balance": q_pq_balance,
        "mm_image_colorfulness": q_image_colorfulness,
        "mm_image_blockiness": q_image_blockiness,
        "mm_audio_zcr": q_audio_zcr,
        "stream_burstiness": q_stream_burstiness,
        "ts_binseg_changepoints": q_binseg_changepoints,
        "ts_pacf": q_pacf,
        "ev_growth_accounting": q_growth_accounting,
        "doc_dedup_method_agreement": q_dedup_method_agreement,
        "emb_assign_margin": q_assign_margin,
        "ts_crest_factor": q_crest_factor,
        "ts_seasonal_strength": q_seasonal_strength,
        "doc_source_jsd": q_source_jsd,
        "emb_hubness": q_emb_hubness,
        "mm_audio_clipping": q_audio_clipping,
        "ts_stationarity_panel": q_stationarity_panel,
        "doc_c4_filters": q_c4_filters,
        "mm_image_entropy": q_image_entropy,
        # round-6: blocked-halo + streaming variants (front-loaded via
        # the rotation list so the driver gates them in turn).
        "ts_asof_join_blocked": q_asof_join_blocked,
        "stream_asof_join": q_stream_asof_join,
        "ts_holt_smoothing": q_holt_smoothing,
        "ev_markov_entropy": q_markov_entropy,
        "stream_holt": q_stream_holt,
        "mm_image_dhash": q_image_dhash,
        "mm_dhash_near_pairs": q_dhash_near_pairs,
        "doc_bpe_merges": q_bpe_merges,
        "doc_bpe_word_tokens": q_bpe_word_tokens,
        "doc_bpe_token_ids": q_bpe_token_ids,
        "doc_curriculum_order": q_curriculum_order,
        "doc_perplexity_buckets": q_perplexity_buckets,
        "doc_score_spearman": q_score_spearman,
        "doc_readability": q_readability,
        "doc_rake_keywords": q_rake_keywords,
        "doc_chunk_passages": q_chunk_passages,
        "doc_passage_bm25": q_passage_bm25,
        "ts_holt_anomalies": q_holt_anomalies,
        "mm_audio_fingerprint": q_audio_fingerprint,
        # round-6b
        "ts_cusum_monitor": q_cusum_monitor,
        "stream_cusum": q_stream_cusum,
        "ev_rfm": q_rfm_scores,
        "ev_gini": q_gini,
        "ev_assoc_rules": q_assoc_rules,
        "ev_ab_srm": q_ab_srm,
        "ev_ab_power": q_ab_power,
        "ev_conversion_lag": q_conversion_lag,
        "ev_user_entropy": q_user_entropy,
        "ev_retention_halflife": q_retention_halflife,
        "ev_survival_km": q_survival_km,
        "ts_higuchi_fd": q_higuchi_fd,
        "doc_graph_triangles": q_graph_triangles,
        "emb_bq_topk": q_bq_topk,
        "ev_circadian": q_circadian,
        "mm_audio_vad": q_audio_vad,
        "doc_dsir_weights": q_dsir_weights,
        "doc_textrank_keywords": q_textrank,
        "ts_wavelet_denoise": q_wavelet_denoise,
        "mm_image_edges": q_edge_density,
        "emb_bq_recall": q_bq_recall,
        "ev_markov_stationary": q_markov_stationary,
        "doc_cdc_chunks": q_cdc_chunks,
        "stream_circadian": q_stream_circadian,
        "ts_mutual_info": q_mutual_info,
        "doc_heaps_law": q_heaps_law,
        "ts_hampel_despike": q_hampel,
        "ts_allan_variance": q_allan_variance,
        "emb_isotropy": q_emb_isotropy,
        "ev_funnel_windowed": q_funnel_windowed,
        "doc_quality_vs_dup": q_quality_vs_dup,
        "emb_sq8_distortion": q_sq8_distortion,
        "ts_entropy_rate": q_entropy_rate,
        "emb_knn_graph": q_knn_graph,
        "ts_theil_sen": q_theil_sen,
        "ev_pareto_alpha": q_pareto_alpha,
        "ev_new_vs_returning": q_new_vs_returning,
        "doc_dedup_funnel": q_dedup_funnel,
        "ev_ab_sequential": q_ab_sequential,
        "ts_spectral_slope": q_spectral_slope,
        "mm_audio_onsets": q_audio_onsets,
        "stream_flux": q_stream_flux,
        "ev_attribution_linear": q_linear_attribution,
        "doc_source_kl": q_source_kl,
        "ts_trend_segments": q_trend_segments,
        "ts_sax_motifs": q_sax_motifs,
        "ts_sax_discords": q_sax_discords,
        "mm_audio_match_pairs": q_audio_match_pairs,
        "ts_coherence": q_coherence,
        "ts_plv": q_plv,
        "ts_dtw_distance": q_dtw_distance,
        "ts_ar2_model": q_ar2_model,
        "ts_seasonal_decompose": q_seasonal_decompose,
        "ts_sample_entropy": q_sample_entropy,
        "ts_permutation_entropy": q_permutation_entropy,
        "ts_lz_complexity": q_lz_complexity,
        "stream_lz": q_stream_lz,
        "ts_spectral_edge": q_spectral_edge,
        "ts_uneven_periodogram": q_uneven_periodogram,
        "ts_ljungbox": q_ljungbox,
        "ts_acf_halflife": q_acf_halflife,
        "ts_higher_moments": q_higher_moments,
        "ts_holt_backtest": q_holt_backtest,
        "ts_rqa": q_rqa,
        "ts_isi_cv": q_isi_cv,
        "stream_periodogram": q_stream_periodogram,
        "ts_multiscale_entropy": q_multiscale_entropy,
        "ts_haar_energy": q_haar_energy,
        "ts_cfar_peaks": q_cfar_peaks,
        "ts_hrv_metrics": q_hrv_metrics,
        "ts_randomness_tests": q_randomness_tests,
        "ts_adf_test": q_adf_test,
        "ts_hjorth": q_hjorth,
        "ts_line_length": q_line_length,
        "ts_tkeo_energy": q_tkeo_energy,
        "ts_burst_suppression": q_burst_suppression,
        "ev_kleinberg_bursts": q_kleinberg_bursts,
        "ev_ab_conversion": q_ab_conversion,
        "mm_image_phash": q_image_phash,
        "mm_image_ssim": q_image_ssim,
        "mm_image_quality": q_image_quality,
        "mm_gif_roundtrip": q_gif_roundtrip,
        "mm_video_scene_cuts": q_video_scene_cuts,
        "ts_granger_screen": q_granger_screen,
        "ts_spectral_entropy": q_spectral_entropy,
        "doc_bpe_fertility": q_bpe_fertility,
        "stream_trend": q_stream_trend,
        "stream_drift": q_stream_drift,
        "ts_density_grid": q_density_grid,
        "doc_lsh_eval": q_lsh_eval,
        "ev_session_stats": q_session_stats,
        "doc_jaccard_histogram": q_jaccard_histogram,
        "mm_audio_offset_search": q_audio_offset_search,
        "emb_ann_recall_multiprobe": q_ann_recall_multiprobe,
        "ts_hurst_rs": q_hurst_rs,
        # round-5b
        "ev_top_paths": q_top_paths,
        "doc_weighted_sample": q_weighted_sample,
        "ts_ltob_downsample": q_ltob_downsample,
        "ts_sax_words": q_sax_words,
        "ts_welch_psd": q_welch_psd,
        "ts_asof_join": q_asof_join,
        "ts_event_triggered_avg": q_event_triggered_avg,
        "doc_ngram_containment": q_ngram_containment,
        "doc_contamination_fuzzy": q_contamination_fuzzy,
        # round-4c: newest first (least-proven gets the oracle)
        "doc_pagerank": q_pagerank,
        "ev_event_transitions": q_event_transitions,
        "ev_inter_event_gaps": q_inter_event_gaps,
        "ev_user_sessions": q_user_sessions,
        "ts_cross_correlation": q_cross_correlation,
        "ts_power_spectrum": q_power_spectrum,
        "ts_harmonics": q_harmonics,
        "ts_band_bursts": q_band_bursts,
        "ts_pac": q_pac,
        "ts_detect_peaks": q_detect_peaks,
        "doc_winnow_fingerprints": q_winnow_fingerprints,
        "doc_winnow_overlap": q_winnow_overlap,
        "ts_seasonal_outliers": q_seasonal_outliers,
        "stream_quality_profile": q_stream_quality,
        "ts_change_points": q_change_points,
        "ev_cohort_matrix": q_cohort_matrix,
        "ts_hist_quantiles": q_hist_quantiles,
        "stream_distinct_events": q_stream_distinct_events,
        "doc_source_cap": q_source_cap,
        "ev_funnel_steps": q_funnel_steps,
        "ev_last_touch": q_last_touch,
        "ts_distribution_drift": q_distribution_drift,
        "ts_winsorize": q_winsorize,
        "doc_corpus_split": q_corpus_split,
        "ts_event_xcorr": q_event_xcorr,
        "doc_zipf_fit": q_zipf_fit,
        "ev_rate_bursts": q_rate_bursts,
        "ev_dispersion": q_dispersion,
        "ev_interarrival_ks": q_interarrival_ks,
        "ev_key_skew": q_key_skew,
        "emb_outliers": q_emb_outliers,
        "ts_event_autocorr": q_event_autocorr,
        "ts_flatline_runs": q_flatline_runs,
        "ev_stickiness": q_stickiness,
        "doc_langid_confusion": q_langid_confusion,
        "emb_kmeans_inertia": q_kmeans_inertia,
        "emb_silhouette": q_silhouette,
        "doc_dedup_stats": q_dedup_stats,
        "ts_hourly_profile": q_hourly_profile,
        "ts_quality_profile": q_quality_profile,
        "emb_cluster_sample": q_cluster_sample,
        "emb_ann_recall": q_ann_recall,
        "emb_truncation_recall": q_truncation_recall,
        "doc_orc_roundtrip": q_orc_roundtrip,
        # round-4b
        "ev_daily_active": q_daily_active,
        "ev_weekly_retention": q_weekly_retention,
        "ev_funnel": q_funnel,
        "stream_heavy_hitters": q_stream_heavy_hitters,
        "emb_pca": q_pca,
        "emb_all_but_top": q_all_but_top,
        "ts_mad_outliers": q_mad_outliers,
        "ts_band_power": q_band_power,
        "stream_ewma": q_stream_ewma,
        "doc_jsonl_roundtrip": q_jsonl_roundtrip,
        "doc_csv_roundtrip": q_csv_roundtrip,
        "ts_decimate": q_decimate,
        "doc_minhash_jaccard_est": q_minhash_jaccard_est,
        "ts_autocorrelation": q_autocorrelation,
        "emb_dim_stats": q_emb_dim_stats,
        "emb_standardize": q_emb_standardize,
        "ts_channel_mad": q_channel_mad,
        "ts_ewma": q_ewma,
        "stream_session_agg": q_stream_session_agg,
        "ts_channel_percentiles": q_channel_percentiles,
        "ts_channel_correlation": q_channel_correlation,
        "doc_token_entropy": q_token_entropy,
        "doc_kmv_by_source": q_kmv_by_source,
        "doc_top_quality_per_lang": q_top_quality_per_lang,
        "stream_minmax_downsample": q_stream_minmax,
        "doc_heavy_hitters": q_heavy_hitters,
        "emb_int8_quant": q_int8_quant,
        "ts_locf_resample": q_locf_resample,
        "ts_interp_resample": q_interp_resample,
        "ts_span_point_join": q_span_point_join,
        "ts_value_histogram": q_value_histogram,
        "stream_histogram": q_stream_histogram,
        "ts_zscore_outliers": q_zscore_outliers,
        "ts_threshold_crossings": q_threshold_crossings,
        # round-4: new operators first (least-proven gets the oracle)
        "emb_ann_filtered": q_ann_filtered,
        "emb_ann_two_stage": q_ann_two_stage,
        "doc_hll_distinct": q_hll_distinct,
        "doc_kmv_distinct": q_kmv_distinct,
        "doc_hll_by_source": q_hll_by_source,
        "doc_mix_weights_temp": q_mix_weights_temp,
        "ts_rolling_stats": q_rolling_stats,
        "stream_sessionize": q_stream_sessionize,
        "doc_bigram_lm": q_bigram_lm,
        "doc_vocab": q_vocab,
        "doc_collocations": q_collocations,
        "doc_token_ids": q_token_ids,
        "doc_quality_classifier": q_quality_classifier,
        "doc_substring_dup": q_substring_dup,
        "doc_substring_scrub": q_substring_scrub,
        "doc_bm25": q_bm25,
        "doc_inverted_index": q_inverted_index,
        "doc_dup_clusters": q_dup_clusters,
        "doc_lp_communities": q_lp_communities,
        "doc_cluster_dedup": q_cluster_dedup,
        "emb_kmeans": q_kmeans,
        "doc_importance_weights": q_importance_weights,
        "emb_semdedup": q_semdedup,
        "doc_tfidf_top_terms": q_tfidf,
        "stream_neardup_dedup": q_stream_neardup,
        # round-3 curation operators — unchecked by the r3 driver harness
        "doc_repetition": q_repetition,
        "doc_contamination": q_contamination,
        "doc_stratified_sample": q_stratified_sample,
        "doc_pack_sequences": q_pack_sequences,
        "doc_source_best": q_source_best,
        "doc_mix_weights": q_mix_weights,
        "doc_block_dedup": q_block_dedup,
        "doc_pii_scrub": q_pii_scrub,
        "doc_corpus_curation": q_corpus_curation,
        "doc_quality_thresholds": q_quality_thresholds,
        "doc_unigram_lm": q_unigram_lm,
        # round-3 event-path queries that erred in CORRECTNESS_r03 (fixed
        # by chan_events_view dtype branch) — keep early until re-proven
        "ts_gap_spans": q_gap_spans,
        "ts_sequence_numbering": q_sequence_numbering,
        "ts_event_summary": q_event_summary,
        "ts_event_summary_datadriven": q_event_summary_datadriven,
        "ts_event_index": q_event_index,
        "ts_range_lookup": q_range_lookup,
        "ts_unit_range_lookup": q_unit_range_lookup,
        # multimodal
        "mm_media_features": q_media_features,
        "mm_frame_sample": q_frame_sample,
        # embeddings / ANN
        "emb_norms": q_emb_norms,
        "emb_cosine_topk": q_cosine_topk,
        "emb_mips_topk": q_mips_topk,
        "emb_mmr_topk": q_mmr_topk,
        "emb_centroid_drift": q_centroid_drift,
        "emb_rrf_fusion": q_rrf_fusion,
        "emb_ann_recall_ivf": q_ann_recall_ivf,
        "emb_ann_lsh": q_ann_lsh,
        "emb_ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "emb_ann_ivf": q_ann_ivf,
        "emb_ann_pq": q_ann_pq,
        "emb_pq_distortion": q_pq_distortion,
        "emb_ann_ivf_pq": q_ann_ivf_pq,
        "emb_near_dup_pairs": q_emb_near_dup,
        # documents / dedup
        "doc_dedup_filter": q_dedup_filter,
        "doc_exact_dedup": q_exact_dedup,
        "doc_novelty": q_novelty,
        "doc_token_stats": q_token_stats,
        "doc_quality_score": q_quality,
        "doc_lang_id": q_lang_id,
        "doc_fingerprint": q_fingerprint,
        "doc_minhash_signatures": q_minhash,
        "doc_pipeline": q_doc_pipeline,
        "doc_minhash_lsh_pairs": q_lsh_pairs,
        "doc_ngram_jaccard": q_ngram_jaccard,
        "doc_simhash": q_simhash,
        "doc_simhash_near_pairs": q_simhash_pairs,
        # ts core — stable since r1/r2
        "ts_window_query": q_window,
        "ts_window_limit0": q_window_limit0,
        "ts_minmax_downsample_time": q_downsample_time,
        "ts_minmax_downsample_count": q_downsample_count,
        "ts_minmax_downsample_count_regular": q_downsample_count_regular,
        "ts_fill_gaps": q_fill_gaps,
        "ts_montage": q_montage,
        "ts_epoch_rebase": q_epoch_rebase,
        "ts_channels_catalog": q_channels_catalog,
        "ts_resample_decision": q_resample_decision,
        "ts_cut_resample": q_cut_resample,
        "ts_realtime_resample": q_realtime_resample,
        "ts_butterworth_filter": q_butterworth,
        "ts_butterworth_filter_bulk": q_butterworth_bulk,
        "ts_channel_minmax": q_channel_minmax,
        "ts_build_segments": q_build_segments,
        "ts_spike_waveforms": q_spike_waveforms,
        "ts_rollup_downsample": q_rollup_downsample,
        "ts_minmax_downsample_salted": q_downsample_salted,
        "ts_page_concat": q_page_concat,
        "ts_interleave": q_interleave,
    }
    return q


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _queries_raw()
    # Loud lookup on purpose: a rotation name not in the registry must
    # KeyError at registry build, not silently shrink the first-50
    # correctness-gate window (priority_order only emits given names,
    # so this can only fire on a tool regression).
    ordered = {k: q[k] for k in _rotation_order(list(q))}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["ts_window_query"] = with_views(
        f"""
        SELECT channel, ts, value FROM samples
        WHERE channel = 'ch3' AND ts >= {T1995} AND ts < {T1995H2}
        ORDER BY ts, value LIMIT 500
        """,
        "samples",
    )

    sql["ts_window_limit0"] = with_views(
        f"""
        SELECT channel, ts, value FROM samples
        WHERE channel = 'ch3' AND ts >= {T1995} AND ts < {T1995H2}
        ORDER BY ts, value LIMIT 0
        """,
        "samples",
    )

    _downsample_time = f"""
        SELECT channel, bucket, MIN(value) AS min_val, MAX(value) AS max_val,
               COUNT(*) AS n_samples,
               {T1992} + bucket * {WEEK_US} AS bucket_start
        FROM (
          SELECT channel, value,
                 CAST(FLOOR((ts - {T1992}) / {WEEK_US}) AS BIGINT) AS bucket
          FROM samples WHERE ts >= {T1992} AND ts < {T1999}
        ) GROUP BY channel, bucket
        """
    sql["ts_minmax_downsample_time"] = with_views(_downsample_time, "samples")
    # rollup and salted paths must equal the direct computation exactly
    sql["ts_rollup_downsample"] = with_views(_downsample_time, "samples")
    sql["ts_minmax_downsample_salted"] = with_views(_downsample_time, "samples")

    sql["ts_interleave"] = with_views(
        f"""
        WITH mm AS ({_downsample_time})
        SELECT channel, bucket * 2 AS pos, min_val AS v FROM mm
        UNION ALL
        SELECT channel, bucket * 2 + 1 AS pos, max_val AS v FROM mm
        """,
        "samples",
    )

    sql["ts_page_concat"] = with_views(
        f"""
        SELECT channel, ts, value FROM samples
        WHERE channel = 'ch1' AND ts >= {T1995} AND ts < {T1995H2}
        ORDER BY ts, value LIMIT 800
        """,
        "samples",
    )

    sql["emb_norms"] = """
        SELECT vec_id,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS l2_norm,
               CAST(len(embedding) AS BIGINT) AS dim
        FROM embeddings
        """

    sql["ts_minmax_downsample_count"] = with_views(
        f"""
        SELECT channel, bucket, MIN(value) AS min_val, MAX(value) AS max_val,
               COUNT(*) AS n_samples
        FROM (
          SELECT channel, value,
                 CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts, value) - 1)
                      / {CHUNK_SIZE}) AS BIGINT) AS bucket
          FROM samples
        ) GROUP BY channel, bucket
        HAVING COUNT(*) = {CHUNK_SIZE}
        """,
        "samples",
    )

    sql["ts_fill_gaps"] = with_views(
        f"""
        WITH mm AS ({_downsample_time}),
        ctx AS (
          SELECT channel, bucket, min_val, max_val,
                 COALESCE(LEAD(min_val) OVER w, max_val) AS min2,
                 COALESCE(LEAD(max_val) OVER w, min_val) AS max2
          FROM mm WINDOW w AS (PARTITION BY channel ORDER BY bucket)
        )
        SELECT channel, bucket, min_val, max_val,
          CASE WHEN (min_val <= min2 AND max_val >= max2)
                 OR (min2 <= min_val AND max2 >= max_val) THEN min_val
               WHEN max_val < min2 THEN min_val
               WHEN min_val > max2 THEN max2
               ELSE min_val END AS filled_min,
          CASE WHEN (min_val <= min2 AND max_val >= max2)
                 OR (min2 <= min_val AND max2 >= max_val) THEN max_val
               WHEN max_val < min2 THEN min2
               WHEN min_val > max2 THEN max_val
               ELSE max_val END AS filled_max
        FROM ctx
        """,
        "samples",
    )

    _gap_spans = f"""
        SELECT channel, MIN(lo) AS span_lo, MAX(hi) AS span_hi,
               COUNT(*) AS n_segments
        FROM (
          SELECT channel, lo, hi,
                 SUM(new_span) OVER (PARTITION BY channel ORDER BY lo, hi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
          FROM (
            SELECT channel, ts AS lo, ts AS hi,
                   CASE WHEN LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts) IS NULL
                          OR ts - LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts)
                             >= {GAP_THRESHOLD_US}
                        THEN 1 ELSE 0 END AS new_span
            FROM chan_events
          )
        ) GROUP BY channel, span_id
        """
    sql["ts_gap_spans"] = with_views(_gap_spans, "chan_events")

    # streaming sessionize replay: closed spans = batch gap spans
    # minus each channel's latest (still-open) span
    sql["stream_sessionize"] = with_views(
        f"""
        SELECT channel, span_lo, span_hi, n_segments FROM (
          SELECT channel, span_lo, span_hi, n_segments,
                 ROW_NUMBER() OVER (PARTITION BY channel
                    ORDER BY span_lo DESC, span_hi DESC) AS rn
          FROM ({_gap_spans})
        ) WHERE rn > 1
        """,
        "chan_events",
    )

    sql["ts_sequence_numbering"] = with_views(
        f"""
        SELECT channel, span_lo, span_hi, n_segments,
               ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo) - 1 AS sequence_id,
               COUNT(*) OVER (PARTITION BY channel) AS total_requests
        FROM ({_gap_spans})
        """,
        "chan_events",
    )

    sql["ts_range_lookup"] = with_views(
        f"""
        SELECT id, channel, rate, lo, hi, location FROM (
          SELECT CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo, span_hi) - 1 AS BIGINT) AS id,
                 channel, CAST(10.0 AS DOUBLE) AS rate,
                 span_lo AS lo, span_hi AS hi,
                 channel || '_' || CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo, span_hi) - 1 AS VARCHAR) AS location
          FROM ({_gap_spans})
        )
        WHERE channel = 'purchase'
          AND lo <= {EV_START + 20 * 86_400 * US} AND hi >= {EV_START + 5 * 86_400 * US}
        """,
        "chan_events",
    )

    sql["ts_channel_minmax"] = with_views(
        """
        SELECT channel, MIN(value) AS min_val, MAX(value) AS max_val,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts
        FROM samples GROUP BY channel
        """,
        "samples",
    )

    sql["ts_montage"] = with_views(
        """
        SELECT 'lead<->sec' AS channel, l.ts AS ts, l.value - s.value AS value
        FROM (SELECT ts, value FROM samples_aligned WHERE channel = 'lead') l
        JOIN (SELECT ts, value FROM samples_aligned WHERE channel = 'sec') s
          ON l.ts = s.ts
        """,
        "samples_aligned",
    )

    _indexed_events = f"""
          SELECT channel, ts,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts, value) - 1 AS idx
          FROM chan_events WHERE ts >= {EV_START} AND ts <= {EV_END}
        """
    sql["ts_event_summary"] = with_views(
        f"""
        SELECT channel, bucket, MIN(ts) AS min_time, MAX(ts) AS max_time,
               MIN(idx) AS min_index, MAX(idx) AS max_index, COUNT(*) AS count,
               MIN(ts) + CAST(FLOOR((MAX(ts) - MIN(ts)) / 2) AS BIGINT) AS avg_time
        FROM (
          SELECT channel, ts, idx,
                 CAST(FLOOR((ts - {EV_START}) / {PIXEL_EV_US}) AS BIGINT) AS bucket
          FROM ({_indexed_events})
        ) GROUP BY channel, bucket
        """,
        "chan_events",
    )

    sql["ts_event_index"] = with_views(
        """
        SELECT channel, ts, value,
               ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts, value) - 1 AS idx
        FROM chan_events
        """,
        "chan_events",
    )

    sql["ts_epoch_rebase"] = with_views(
        """
        SELECT channel, MAX(rts) AS max_rebased_ts, COUNT(*) AS n_samples
        FROM (
          SELECT channel, ts - MIN(ts) OVER (PARTITION BY channel) AS rts
          FROM samples
        ) GROUP BY channel
        """,
        "samples",
    )

    sql["ts_channels_catalog"] = with_views(
        "SELECT channel, start_ts, end_ts, n_samples, rate FROM channels",
        "channels",
    )

    sql["ts_resample_decision"] = with_views(
        """
        SELECT channel, pixel_width,
               (pixel_width / (1e6 / rate)) > 3.0 AS resample
        FROM channels
        CROSS JOIN (SELECT CAST(UNNEST([200000, 350000, 5000000]) AS BIGINT) AS pixel_width)
        """,
        "channels",
    )

    sql["ts_cut_resample"] = f"""
        SELECT spike_ts, bucket, MIN(v) AS min_val, MAX(v) AS max_val
        FROM (
          SELECT l_orderkey AS spike_ts, l_extendedprice AS v,
                 CAST(FLOOR((((ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) - 1)
                      * 2 + 1) * {CUT_CHUNKS} - 1)
                      / (COUNT(*) OVER (PARTITION BY l_orderkey) * 2)) AS BIGINT) AS bucket
          FROM lineitem
        ) GROUP BY spike_ts, bucket
        """

    sql["ts_realtime_resample"] = f"""
        WITH seg AS (
          SELECT 'rt' || CAST(l_orderkey % 4 AS VARCHAR) AS channel,
                 l_orderkey * 1000000 AS start_ts,
                 75000e0 * (1 + l_orderkey % 3) AS sample_period,
                 l_extendedprice AS v,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) - 1 AS pos,
                 COUNT(*) OVER (PARTITION BY l_orderkey) AS m
          FROM lineitem
        ), seg2 AS (
          SELECT *,
                 start_ts + CAST(FLOOR(sample_period * m) AS BIGINT) AS end_ts,
                 sample_period < {RT_PIXEL_US} AS resample
          FROM seg
        ), seg3 AS (
          SELECT *,
                 end_ts - start_ts AS span,
                 -- calculateChunks: Long division THEN Math.round(Float)
                 -- (identity on the truncated quotient) = floor
                 CAST(FLOOR((end_ts - start_ts) / {RT_PIXEL_US}) AS BIGINT) AS chunk_count
          FROM seg2
          -- chunkCount = 0 => cut(data, 0) = empty resample (reference)
          WHERE NOT (sample_period < {RT_PIXEL_US} AND (end_ts - start_ts) < {RT_PIXEL_US})
        )
        SELECT channel, start_ts, bucket, is_min_max, out_period,
               MIN(v) AS min_val, MAX(v) AS max_val
        FROM (
          SELECT channel, start_ts, v,
                 CASE WHEN resample
                      THEN CAST(FLOOR(((pos * 2 + 1) * chunk_count - 1) / (m * 2)) AS BIGINT)
                      ELSE CAST(pos AS BIGINT) END AS bucket,
                 CASE WHEN resample THEN span / chunk_count
                      ELSE sample_period END AS out_period,
                 resample AS is_min_max
          FROM seg3
        ) GROUP BY channel, start_ts, bucket, is_min_max, out_period
        """

    # --- LLM-pipeline oracles ----------------------------------------------

    PH_S = md5_hash64_duck("s")
    PH_TEXT = poly_hash_duck("text")
    TOKS = "regexp_split_to_array(trim(text), '\\s+')"

    # shared CTE prelude: tokens + distinct hashed word-3-shingles
    DOC_PRE = f"""
        doc_toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, {PH_S} AS sh FROM (
            SELECT doc_id, UNNEST(
              CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                   ELSE list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END
            ) AS s
            FROM doc_toks
          )
        )
        """

    perm_rows = ", ".join(
        f"({j}, {a}, {b})"
        for j, (a, b) in enumerate(minhash_perm_constants(16))
    )
    MINHASH_PRE = f"""
        {DOC_PRE},
        perms AS (SELECT * FROM (VALUES {perm_rows}) AS t(j, a, b)),
        mh AS (
          SELECT doc_id, j, MIN((CAST(a AS BIGINT) * (sh % {P_MINHASH}) + b) % {P_MINHASH}) AS minhash
          FROM sh CROSS JOIN perms GROUP BY doc_id, j
        )
        """

    BANDS = """
        bands AS (
          SELECT doc_id, CAST(FLOOR(j / 4) AS BIGINT) AS band,
                 CAST(SUM(minhash * CASE j % 4 WHEN 0 THEN 1 WHEN 1 THEN 31
                          WHEN 2 THEN 961 ELSE 29791 END) AS BIGINT) AS band_key
          FROM mh GROUP BY doc_id, CAST(FLOOR(j / 4) AS BIGINT)
        )
        """

    # Capped candidate generation — replays lsh_candidate_pairs'
    # max_bucket_size semantics: small buckets all-pairs, oversized
    # buckets star-paired to the min-doc_id anchor.
    CAND_CAPPED = f"""
        bstats AS (
          SELECT band, band_key, COUNT(*) AS bn, MIN(doc_id) AS anchor
          FROM bands GROUP BY band, band_key
        ),
        keyed AS (
          SELECT b.doc_id, b.band, b.band_key, s.bn, s.anchor
          FROM bands b JOIN bstats s USING (band, band_key)
        ),
        cand AS (
          SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM keyed a JOIN keyed b
              ON a.band = b.band AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
            WHERE a.bn <= {LSH_MAX_BUCKET}
            UNION ALL
            SELECT anchor AS doc_a, doc_id AS doc_b FROM keyed
            WHERE bn > {LSH_MAX_BUCKET} AND doc_id > anchor
          )
        )
        """

    JACCARD_TAIL = """
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ints AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        """

    SIMHASH_CTE = """
        fp AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
          FROM (
            SELECT doc_id, b, SUM(((((sh % 1000000007) * 2654435761) % 1000000007) >> b & 1) * 2 - 1) AS s
            FROM sh CROSS JOIN (SELECT UNNEST(generate_series(0, 31)) AS b)
            GROUP BY doc_id, b
          ) GROUP BY doc_id
        )
        """

    sql["doc_exact_dedup"] = """
        SELECT md5(text) AS digest, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS dup_count
        FROM documents GROUP BY md5(text)
        """

    sql["doc_token_stats"] = f"""
        WITH doc_toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS BIGINT) AS n_tokens,
               CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
               CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
               CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS DOUBLE)
                    ELSE list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE)
               END AS avg_token_len,
               CAST(len(regexp_extract_all(text,
                    '''(ll|ve|re|[sdmt])| ?[\\p{{L}}]+| ?[\\p{{N}}]+| ?[^\\s\\p{{L}}\\p{{N}}]+|\\s+'))
                    AS BIGINT) AS n_tokens_bpe
        FROM doc_toks
        """

    _stop_arr = ", ".join(f"'{w}'" for w in [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "for", "on", "with", "as", "at", "by", "that", "this",
    ])
    sql["doc_quality_score"] = f"""
        WITH base AS (
          SELECT doc_id,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens,
                 CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
                 len(list_filter({TOKS}, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len({TOKS}) AS DOUBLE) AS stop_ratio
          FROM documents
        )
        SELECT doc_id, n_tokens, alpha_ratio, stop_ratio,
               alpha_ratio * 0.5e0 + stop_ratio * 0.3e0
               + least(n_tokens, 200) / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
        FROM base
        """

    sql["doc_quality_vs_dup"] = f"""
        WITH q AS ({sql["doc_quality_score"]}),
        dup AS (
          SELECT md5(text) AS _d, CAST(COUNT(*) AS BIGINT) AS _c
          FROM documents GROUP BY md5(text)
        ),
        j AS (
          SELECT CAST(LEAST(9, CAST(floor(q.quality * 10) AS BIGINT))
                   AS BIGINT) AS decile,
                 CASE WHEN p._c > 1 THEN 1 ELSE 0 END AS _isdup
          FROM q
          JOIN documents d ON q.doc_id = d.doc_id
          JOIN dup p ON md5(d.text) = p._d
        )
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(_isdup) AS BIGINT) AS n_dups,
               CAST(SUM(_isdup) AS DOUBLE) / COUNT(*) AS dup_share
        FROM j GROUP BY decile
        """

    sql["doc_curriculum_order"] = f"""
        WITH q AS ({sql["doc_quality_score"]})
        SELECT doc_id, quality,
               CAST(ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id)
                    AS BIGINT) AS rank
        FROM q
        """

    # Distilled quality classifier: the oracle RE-TRAINS the model in
    # SQL — feature standardization and every gradient-ascent
    # iteration are chained one-row CTE aggregates mirroring the
    # kmeans-style driver loop (same 9-dp quantization points), then
    # the final weights score the corpus.
    def _classifier_oracle_sql(n_iter: int, lr: float, label_cut: float) -> str:
        feats = f"""
        feats AS (
          SELECT doc_id,
                 CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / CAST(length(text) AS DOUBLE) END AS x1,
                 len(list_filter({TOKS}, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len({TOKS}) AS DOUBLE) AS x2,
                 least(CAST(len({TOKS}) AS BIGINT), 200)
                   / CAST(200.0 AS DOUBLE) AS x3
          FROM documents
        ),
        lbl AS (
          SELECT doc_id, x1, x2, x3,
                 CASE WHEN x1 * 0.5e0 + x2 * 0.3e0 + x3 * 0.2e0
                           >= CAST({label_cut!r} AS DOUBLE)
                      THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE)
                 END AS y
          FROM feats
        ),
        st AS (
          SELECT round(avg(x1), 9) AS m1, round(avg(x1 * x1), 9) AS q1,
                 round(avg(x2), 9) AS m2, round(avg(x2 * x2), 9) AS q2,
                 round(avg(x3), 9) AS m3, round(avg(x3 * x3), 9) AS q3
          FROM lbl
        ),
        sd AS (
          SELECT m1, m2, m3,
                 CASE WHEN round(q1 - m1 * m1, 9) > 0
                      THEN round(sqrt(round(q1 - m1 * m1, 9)), 9)
                      ELSE CAST(1.0 AS DOUBLE) END AS s1,
                 CASE WHEN round(q2 - m2 * m2, 9) > 0
                      THEN round(sqrt(round(q2 - m2 * m2, 9)), 9)
                      ELSE CAST(1.0 AS DOUBLE) END AS s2,
                 CASE WHEN round(q3 - m3 * m3, 9) > 0
                      THEN round(sqrt(round(q3 - m3 * m3, 9)), 9)
                      ELSE CAST(1.0 AS DOUBLE) END AS s3
          FROM st
        ),
        it0 AS (
          SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                 CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3
        )"""
        z = (
            "w0 + w1 * ((x1 - m1) / s1) + w2 * ((x2 - m2) / s2) "
            "+ w3 * ((x3 - m3) / s3)"
        )
        sig = f"round(1 / (1 + exp(-({z}))), 9)"
        xs = [
            "CAST(1 AS DOUBLE)",
            "((x1 - m1) / s1)",
            "((x2 - m2) / s2)",
            "((x3 - m3) / s3)",
        ]
        its = []
        for k in range(n_iter):
            ws = ", ".join(
                f"round(any_value(w{j}) + CAST({lr!r} AS DOUBLE) "
                f"* avg((y - {sig}) * {xs[j]}), 9) AS w{j}"
                for j in range(4)
            )
            its.append(
                f"it{k + 1} AS (SELECT {ws} "
                f"FROM lbl CROSS JOIN it{k} CROSS JOIN sd)"
            )
        return f"""
        WITH {feats},
        {", ".join(its)}
        SELECT doc_id,
               x1 * 0.5e0 + x2 * 0.3e0 + x3 * 0.2e0
                 >= CAST({label_cut!r} AS DOUBLE) AS label,
               {sig} AS score,
               {sig} >= CAST(0.5 AS DOUBLE) AS predicted
        FROM lbl CROSS JOIN it{n_iter} CROSS JOIN sd
        """

    sql["doc_quality_classifier"] = _classifier_oracle_sql(10, 2.0, 0.485)

    _markers = {
        "en": ["the", "and", "of", "to", "in", "is", "a"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
        "es": ["el", "la", "de", "que", "los", "una", "es"],
        "fr": ["le", "les", "et", "des", "une", "est", "dans"],
        "zh": ["的", "是", "不", "了", "在", "我", "有"],
    }
    _score = {
        c: f"len(regexp_extract_all(lower(text), '\\b({'|'.join(ms)})\\b'))"
        for c, ms in _markers.items()
    }
    sql["doc_lang_id"] = f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 {_score['en']} AS s_en, {_score['de']} AS s_de,
                 {_score['es']} AS s_es, {_score['fr']} AS s_fr,
                 {_score['zh']} AS s_zh
          FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                    WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                    WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                    WHEN s_fr >= s_zh THEN 'fr'
                    ELSE 'zh' END AS predicted_lang,
               (CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                     WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                     WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                     WHEN s_fr >= s_zh THEN 'fr'
                     ELSE 'zh' END) = lang AS correct
        FROM scored
        """

    sql["doc_fingerprint"] = f"SELECT doc_id, {PH_TEXT} AS fp FROM documents"

    # --- corpus-curation oracles (llm/curation.py) -------------------------

    N_TOKENS_DUCK = (
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(toks) END AS BIGINT)"
    )

    def _ngram_duck(n: int) -> str:
        if n == 1:
            return "toks"
        join = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
        return (
            f"CASE WHEN len(toks) < {n} THEN CAST([] AS VARCHAR[]) "
            f"ELSE list_transform(generate_series(1, len(toks) - {n - 1}), "
            f"i -> {join}) END"
        )

    def _dup_ratio_duck(n: int) -> str:
        g = _ngram_duck(n)
        return (
            f"CASE WHEN length(trim(text)) = 0 OR len({g}) = 0 "
            "THEN CAST(0 AS DOUBLE) "
            f"ELSE CAST(1 AS DOUBLE) "
            f"- len(list_distinct({g})) / CAST(len({g}) AS DOUBLE) END"
        )

    sql["doc_repetition"] = f"""
        WITH doc_toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
        SELECT doc_id,
               {N_TOKENS_DUCK} AS n_tokens,
               {_dup_ratio_duck(1)} AS dup_1gram_ratio,
               {_dup_ratio_duck(2)} AS dup_2gram_ratio,
               {_dup_ratio_duck(3)} AS dup_3gram_ratio
        FROM doc_toks
        """

    sql["doc_contamination"] = f"""
        WITH doc_toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bench AS (
          SELECT DISTINCT sh FROM doc_sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        ov AS (
          SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(COUNT(b.sh) AS BIGINT) AS n_overlap
          FROM doc_sh d LEFT JOIN bench b USING (sh) GROUP BY d.doc_id
        )
        SELECT t.doc_id,
               COALESCE(ov.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
               COALESCE(ov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
               CASE WHEN COALESCE(ov.n_shingles, 0) = 0 THEN CAST(0 AS DOUBLE)
                    ELSE ov.n_overlap / CAST(ov.n_shingles AS DOUBLE)
               END AS overlap_ratio,
               (CASE WHEN COALESCE(ov.n_shingles, 0) = 0 THEN CAST(0 AS DOUBLE)
                     ELSE ov.n_overlap / CAST(ov.n_shingles AS DOUBLE)
                END) > 0.5 AS contaminated
        FROM documents t LEFT JOIN ov ON t.doc_id = ov.doc_id
        """

    # the sampling arithmetic and rate CASE are engine-portable SQL —
    # reuse the Spark-side builders verbatim so the two sides cannot
    # drift
    from pennsieve_streaming_spark.llm.curation import (
        rate_case_expr,
        sample_u_expr,
    )

    _u = sample_u_expr(salt=0)
    _rate = rate_case_expr(SAMPLE_RATES)
    sql["doc_stratified_sample"] = f"""
        SELECT doc_id, lang, source, {_u} AS sample_u
        FROM documents
        WHERE {_u} < ({_rate})
        """

    _zq = 10**3  # must match zipf_fit's default quant (BIGINT-safe bound)
    _zslope = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    sql["doc_zipf_fit"] = f"""
        WITH tok AS (
          SELECT UNNEST({TOKS}) AS t FROM documents
        ),
        counts AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok WHERE length(t) > 0 GROUP BY t
        ),
        ranked AS (
          SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT) AS r
          FROM counts
        ),
        xy AS (
          SELECT CAST(round(round(ln(CAST(r AS DOUBLE)), 9) * {_zq}) AS BIGINT) AS xq,
                 CAST(round(round(ln(CAST(c AS DOUBLE)), 9) * {_zq}) AS BIGINT) AS yq
          FROM ranked
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
                 CAST(SUM(xq * yq) AS BIGINT) AS sxy,
                 CAST(SUM(xq * xq) AS BIGINT) AS sxx
          FROM xy
        )
        SELECT n AS n_terms, round({_zslope}, 9) AS slope,
               round((CAST(sy AS DOUBLE) / {_zq} - round({_zslope}, 9)
                 * CAST(sx AS DOUBLE) / {_zq}) / n, 9) AS intercept
        FROM agg
        """

    sql["doc_corpus_split"] = f"""
        SELECT doc_id, source, lang, {_u} AS sample_u,
               CASE WHEN {_u} < CAST(0.05 AS DOUBLE) THEN 'val'
                    WHEN {_u} < CAST(0.1 AS DOUBLE) THEN 'test'
                    ELSE 'train' END AS split
        FROM documents
        """

    sql["doc_pack_sequences"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, source, text, {TOKS} AS toks FROM documents
        ),
        t AS (
          SELECT doc_id, source, {N_TOKENS_DUCK} AS n_tokens FROM doc_toks
        ),
        c AS (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) - n_tokens AS tok_offset
          FROM t
        )
        SELECT doc_id, source, n_tokens, tok_offset,
               CAST(tok_offset // {PACK_BUDGET} AS BIGINT) AS start_seq,
               CAST(CASE WHEN n_tokens = 0
                         THEN tok_offset // {PACK_BUDGET}
                         ELSE (tok_offset + n_tokens - 1) // {PACK_BUDGET}
                    END AS BIGINT) AS end_seq
        FROM c
        """

    # same quality arithmetic as doc_quality_score, source retained;
    # (quality DESC, doc_id) row_number == Spark's max(struct(q, -id))
    sql["doc_source_best"] = f"""
        WITH base AS (
          SELECT doc_id, source,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens,
                 CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
                 len(list_filter({TOKS}, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len({TOKS}) AS DOUBLE) AS stop_ratio
          FROM documents
        ),
        q AS (
          SELECT doc_id, source,
                 alpha_ratio * 0.5e0 + stop_ratio * 0.3e0
                 + least(n_tokens, 200) / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
          FROM base
        ),
        r AS (
          SELECT source, doc_id, quality,
                 row_number() OVER (
                   PARTITION BY source ORDER BY quality DESC, doc_id
                 ) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_docs
          FROM q
        )
        SELECT source, CAST(doc_id AS BIGINT) AS keep_doc_id,
               n_docs, quality AS best_quality
        FROM r WHERE rn = 1
        """

    sql["doc_mix_weights"] = f"""
        WITH doc_toks AS (SELECT source, text, {TOKS} AS toks FROM documents),
        t AS (SELECT source, {N_TOKENS_DUCK} AS n_toks FROM doc_toks),
        c AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_toks) AS BIGINT) AS n_tokens
          FROM t GROUP BY source
        ),
        tot AS (
          SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_sources
          FROM c
        )
        SELECT source, n_docs, n_tokens,
               n_tokens / CAST(total_tokens AS DOUBLE) AS token_share,
               (CAST(1 AS DOUBLE) / n_sources)
                 / (n_tokens / CAST(total_tokens AS DOUBLE)) AS weight
        FROM c CROSS JOIN tot
        """

    sql["doc_mix_weights_temp"] = f"""
        WITH doc_toks AS (SELECT source, text, {TOKS} AS toks FROM documents),
        t AS (SELECT source, {N_TOKENS_DUCK} AS n_toks FROM doc_toks),
        c AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_toks) AS BIGINT) AS n_tokens
          FROM t GROUP BY source
        ),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM c),
        shares AS (
          SELECT source, n_docs, n_tokens,
                 n_tokens / CAST(total_tokens AS DOUBLE) AS token_share,
                 round(pow(n_tokens / CAST(total_tokens AS DOUBLE),
                           CAST(0.5 AS DOUBLE)), 9) AS share_t
          FROM c CROSS JOIN tot
        ),
        denom AS (SELECT SUM(share_t) AS d FROM shares)
        SELECT source, n_docs, n_tokens, token_share,
               round(share_t / d / token_share, 9) AS weight
        FROM shares CROSS JOIN denom
        """

    # --- block boilerplate dedup -------------------------------------------

    B, BDF = BLOCK_TOKENS, BLOCK_MAX_DF
    _blocks = (
        f"CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(generate_series(1, CAST(ceil(len(toks) / {B}.0) AS INT)), "
        f"i -> array_to_string(list_transform("
        f"generate_series((i - 1) * {B} + 1, least(len(toks), i * {B})), "
        f"j -> toks[j]), ' ')) END"
    )
    PH_U = md5_hash64_duck("u")
    sql["doc_block_dedup"] = f"""
        WITH doc_toks AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
        blocks AS (
          SELECT doc_id, {_blocks} AS units FROM doc_toks
        ),
        with_h AS (
          SELECT doc_id, units,
                 list_transform(units, u -> {PH_U}) AS hs
          FROM blocks
        ),
        occ AS (
          SELECT DISTINCT doc_id, UNNEST(hs) AS h FROM with_h
        ),
        dfreq AS (SELECT h, COUNT(*) AS c FROM occ GROUP BY h),
        boiler AS (
          SELECT COALESCE(list_sort(list(h)), CAST([] AS BIGINT[])) AS barr
          FROM dfreq WHERE c > {BDF}
        )
        SELECT doc_id,
               CAST(len(units) AS BIGINT) AS n_units,
               CAST(len(units) - len(kept) AS BIGINT) AS n_dropped,
               COALESCE(array_to_string(kept, ' '), '') AS clean_text
        FROM (
          SELECT doc_id, units,
                 list_transform(
                   list_filter(generate_series(1, len(units)),
                               i -> NOT list_contains(barr, hs[i])),
                   i -> units[i]) AS kept
          FROM with_h CROSS JOIN boiler
        )
        """

    # --- PII scrub ---------------------------------------------------------

    from pennsieve_streaming_spark.llm.curation import PII_PATTERNS

    _stages = []
    for i, (_name, pat, repl) in enumerate(PII_PATTERNS, start=1):
        p = pat.replace("'", "''")
        _stages.append(
            f"s{i} AS (SELECT doc_id, "
            + (f"c{i - 1} + " if i > 1 else "")
            + f"CAST(len(regexp_extract_all(t, '{p}')) AS BIGINT) AS c{i}, "
            f"regexp_replace(t, '{p}', '{repl}', 'g') AS t FROM s{i - 1})"
        )
    _n = len(PII_PATTERNS)
    sql["doc_pii_scrub"] = (
        "WITH s0 AS (SELECT doc_id, text AS t FROM documents), "
        + ", ".join(_stages)
        + f" SELECT doc_id, c{_n} AS n_redactions, t AS clean_text FROM s{_n}"
    )

    # --- composed corpus curation ------------------------------------------

    sql["doc_corpus_curation"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, lang, source, text, {TOKS} AS toks FROM documents
        ),
        q AS (
          SELECT doc_id,
                 (CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                       ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                            / CAST(length(text) AS DOUBLE) END) * 0.5e0
                 + len(list_filter(toks, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len(toks) AS DOUBLE) * 0.3e0
                 + least(CAST(len(toks) AS BIGINT), 200)
                   / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
          FROM doc_toks
        ),
        rep AS (
          SELECT doc_id, {_dup_ratio_duck(3)} AS dup_3gram_ratio FROM doc_toks
        ),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bench AS (
          SELECT DISTINCT sh FROM doc_sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        ov AS (
          SELECT d.doc_id, COUNT(*) AS n_sh, COUNT(b.sh) AS n_ov
          FROM doc_sh d LEFT JOIN bench b USING (sh) GROUP BY d.doc_id
        ),
        contam AS (
          SELECT t.doc_id,
                 CASE WHEN COALESCE(ov.n_sh, 0) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE ov.n_ov / CAST(ov.n_sh AS DOUBLE)
                 END AS overlap_ratio
          FROM doc_toks t LEFT JOIN ov ON t.doc_id = ov.doc_id
        ),
        kept AS (
          SELECT d.doc_id, d.lang, d.source, q.quality,
                 rep.dup_3gram_ratio, contam.overlap_ratio,
                 {_u} AS sample_u
          FROM doc_toks d
          JOIN q USING (doc_id) JOIN rep USING (doc_id)
          JOIN contam USING (doc_id)
          WHERE {_u} < ({_rate})
            AND q.quality >= 0.3
            AND rep.dup_3gram_ratio <= 0.2
            AND contam.overlap_ratio <= 0.5
        ),
        surv AS (
          SELECT t.doc_id, t.source, {N_TOKENS_DUCK} AS n_tokens
          FROM doc_toks t JOIN kept USING (doc_id)
        ),
        packed AS (
          SELECT doc_id, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) - n_tokens AS tok_offset
          FROM surv
        )
        SELECT k.doc_id, k.lang, k.source, k.quality, k.dup_3gram_ratio,
               k.overlap_ratio, k.sample_u, p.n_tokens, p.tok_offset,
               CAST(p.tok_offset // {PACK_BUDGET} AS BIGINT) AS start_seq,
               CAST(CASE WHEN p.n_tokens = 0
                         THEN p.tok_offset // {PACK_BUDGET}
                         ELSE (p.tok_offset + p.n_tokens - 1) // {PACK_BUDGET}
                    END AS BIGINT) AS end_seq
        FROM kept k JOIN packed p USING (doc_id)
        """

    # --- per-language quality thresholds -----------------------------------

    sql["doc_quality_thresholds"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, lang, text, {TOKS} AS toks FROM documents
        ),
        q AS (
          SELECT lang,
                 (CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                       ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                            / CAST(length(text) AS DOUBLE) END) * 0.5e0
                 + len(list_filter(toks, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len(toks) AS DOUBLE) * 0.3e0
                 + least(CAST(len(toks) AS BIGINT), 200)
                   / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
          FROM doc_toks
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               quantile_cont(quality, 0.2) AS q_threshold
        FROM q GROUP BY lang
        """

    # --- unigram LM scoring ------------------------------------------------
    # The per-doc fold MUST replay Spark's sequential left fold in
    # document order: list(logp ORDER BY pos) + list_reduce with a
    # prepended 0 is exactly 0 + l1 + l2 + ... — bit-identical.

    sql["doc_unigram_lm"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        tok AS (SELECT UNNEST(toks) AS t FROM doc_toks),
        counts AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
        tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS vocab
          FROM counts
        ),
        probs AS (
          SELECT t, round(ln((c + CAST(0.5 AS DOUBLE))
                       / (total + CAST(0.5 AS DOUBLE) * vocab)), 9) AS logp
          FROM counts CROSS JOIN tot
        ),
        u AS (
          SELECT doc_id, UNNEST(toks) AS t,
                 UNNEST(generate_series(1, len(toks))) AS pos
          FROM doc_toks
        ),
        folded AS (
          SELECT u.doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(p.logp ORDER BY u.pos)), (a, b) -> a + b) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
          FROM u JOIN probs p ON u.t = p.t
          GROUP BY u.doc_id
        )
        SELECT doc_id, n_tokens, s / n_tokens AS avg_logprob
        FROM folded
        """

    # CCNet head/middle/tail: NTILE(3) over the bit-exact unigram LM
    # likelihood (DESC = most fluent first). The Spark side reproduces
    # NTILE via the two-phase global rank + closed-form bucket rule
    # (the ev_rfm equivalence class), so native NTILE here is a true
    # independent check of the whole chain.
    sql["doc_perplexity_buckets"] = f"""
        WITH lm AS ({sql["doc_unigram_lm"]}),
        b AS (
          SELECT doc_id, n_tokens, avg_logprob,
                 CAST(NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id)
                      AS BIGINT) AS bucket
          FROM lm
        )
        SELECT doc_id, n_tokens, avg_logprob, bucket,
               CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS split
        FROM b
        """

    # Passage chunking: pure integer slicing on both engines.
    sql["doc_chunk_passages"] = f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks, len({TOKS}) AS n
          FROM documents WHERE length(trim(text)) > 0
        ),
        e AS (
          SELECT doc_id, toks, n,
                 UNNEST(generate_series(0,
                     CAST((n - 1) // {CHUNK_STRIDE} AS BIGINT))) AS k
          FROM d
        )
        SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
               CAST(k * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
               CAST(len(toks[CAST(k * {CHUNK_STRIDE} + 1 AS INT):
                   CAST(k * {CHUNK_STRIDE} + {CHUNK_SIZE} AS INT)])
                 AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[CAST(k * {CHUNK_STRIDE} + 1 AS INT):
                   CAST(k * {CHUNK_STRIDE} + {CHUNK_SIZE} AS INT)], ' ')
                 AS chunk_text
        FROM e
        WHERE k = 0 OR (k - 1) * {CHUNK_STRIDE} + {CHUNK_SIZE} < n
        """

    # RAKE: word scores are single BIGINT/BIGINT divisions; the
    # phrase score folds member scores in POSITION order via
    # list_reduce (the unigram_lm sequential-fold class); ranking
    # ties break on the phrase text, a total order.
    sql["doc_rake_keywords"] = f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE length(trim(text)) > 0
        ),
        tok AS (
          SELECT doc_id, lower(UNNEST(toks)) AS w,
                 UNNEST(generate_series(1, len(toks))) - 1 AS pos
          FROM d
        ),
        ns AS (
          SELECT doc_id, w, pos FROM tok
          WHERE NOT list_contains([{_stop_arr}], w) AND w <> ''
        ),
        ph AS (
          SELECT doc_id, w, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY pos) AS grp
          FROM ns
        ),
        plen AS (
          SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS n_words
          FROM ph GROUP BY doc_id, grp
        ),
        phl AS (
          SELECT ph.doc_id, ph.w, ph.pos, ph.grp, plen.n_words
          FROM ph JOIN plen ON ph.doc_id = plen.doc_id
               AND ph.grp = plen.grp
        ),
        wst AS (
          SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(n_words) AS BIGINT) AS deg
          FROM phl GROUP BY doc_id, w
        ),
        sc AS (
          SELECT phl.doc_id, phl.grp, phl.pos, phl.w, phl.n_words,
                 CAST(wst.deg AS DOUBLE) / wst.freq AS wscore
          FROM phl JOIN wst ON phl.doc_id = wst.doc_id
               AND phl.w = wst.w
        ),
        phr AS (
          SELECT doc_id, grp,
                 string_agg(w, ' ' ORDER BY pos) AS phrase,
                 MAX(n_words) AS n_words,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(wscore ORDER BY pos)), (a, b) -> a + b) AS score
          FROM sc GROUP BY doc_id, grp
        ),
        uq AS (
          SELECT doc_id, phrase,
                 CAST(MAX(n_words) AS BIGINT) AS n_words,
                 MAX(score) AS score
          FROM phr GROUP BY doc_id, phrase
        ),
        r AS (
          SELECT doc_id, phrase, n_words, score,
                 CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, phrase) AS BIGINT) AS rank
          FROM uq
        )
        SELECT doc_id, phrase, n_words, score, rank FROM r
        WHERE rank <= 3
        """

    # Spearman: both gated per-doc scores ranked under total orders,
    # the rho finish imported verbatim.
    from pennsieve_streaming_spark.llm.curation import (
        SPEARMAN_RHO as _SP_RHO,
    )

    sql["doc_score_spearman"] = f"""
        WITH q AS (
          SELECT doc_id, quality FROM ({sql["doc_quality_score"]})
        ),
        lm AS (
          SELECT doc_id, avg_logprob FROM ({sql["doc_unigram_lm"]})
        ),
        rq AS (
          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY quality, doc_id)
                   AS rq
          FROM q
        ),
        rl AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY avg_logprob, doc_id) AS rl
          FROM lm
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((rq - rl) * (rq - rl)) AS BIGINT) AS d2
          FROM rq JOIN rl USING (doc_id)
        )
        SELECT n, d2, {_SP_RHO} AS rho FROM g WHERE n > 0
        """

    # Readability: integer word/sentence/vowel-group counts mirrored
    # regex-for-regex; the two score finishes are imported from the
    # operator module verbatim.
    from pennsieve_streaming_spark.llm.text import (
        RD_FK_GRADE as _RD_FK,
        RD_FLESCH as _RD_FL,
    )

    sql["doc_readability"] = f"""
        WITH d AS (
          SELECT doc_id, text, {TOKS} AS toks FROM documents
        ),
        c AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(len(toks) AS BIGINT) END AS n_words,
                 GREATEST(CAST(1 AS BIGINT), CAST(len(list_filter(
                     regexp_split_to_array(text, '[.!?]+'),
                     s -> length(trim(s)) > 0)) AS BIGINT)) AS n_sentences,
                 CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                      AS BIGINT)
                 + CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(len(list_filter(toks,
                            t -> NOT regexp_matches(lower(t), '[aeiouy]')))
                          AS BIGINT) END AS n_syllables
          FROM d
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               {_RD_FL} AS flesch,
               {_RD_FK} AS fk_grade
        FROM c
        """

    sql["doc_textrank_keywords"] = f"""
        WITH d AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE length(trim(text)) > 0
        ),
        tok AS (
          SELECT doc_id, lower(UNNEST(toks)) AS w,
                 UNNEST(generate_series(1, len(toks))) - 1 AS pos
          FROM d
        ),
        cand AS (
          SELECT doc_id, w, pos FROM tok
          WHERE NOT list_contains([{_stop_arr}], w) AND w <> ''
        ),
        seq AS (
          SELECT doc_id, w, pos,
                 LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS _nx
          FROM cand
        ),
        adj AS (
          SELECT DISTINCT doc_id, LEAST(w, _nx) AS lo,
                 GREATEST(w, _nx) AS hi
          FROM seq WHERE _nx IS NOT NULL AND _nx <> w
        ),
        tr_edges AS (
          SELECT doc_id, lo AS src, hi AS dst FROM adj
          UNION ALL
          SELECT doc_id, hi AS src, lo AS dst FROM adj
        ),
        tr_verts AS (SELECT DISTINCT doc_id, w FROM cand),
        tr_nv AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS _n
          FROM tr_verts GROUP BY doc_id
        ),
        tr_deg AS (
          SELECT doc_id, src, CAST(COUNT(*) AS BIGINT) AS outdeg
          FROM tr_edges GROUP BY doc_id, src
        ),
        r0 AS (
          SELECT v.doc_id, v.w,
                 CAST(round(1e9 / CAST(_n AS DOUBLE)) AS BIGINT) AS rank_i
          FROM tr_verts v JOIN tr_nv nv ON v.doc_id = nv.doc_id
        ),
        recv1 AS (
          SELECT e.doc_id, e.dst AS w,
                 CAST(SUM(r.rank_i // g.outdeg) AS BIGINT) AS recv_i
          FROM r0 r
          JOIN tr_edges e ON r.doc_id = e.doc_id AND r.w = e.src
          JOIN tr_deg g ON g.doc_id = e.doc_id AND g.src = e.src
          GROUP BY e.doc_id, e.dst
        ),
        dang1 AS (
          SELECT r.doc_id, CAST(SUM(r.rank_i) AS BIGINT) AS dm_i
          FROM r0 r
          LEFT JOIN tr_deg g ON g.doc_id = r.doc_id AND g.src = r.w
          WHERE g.src IS NULL GROUP BY r.doc_id
        ),
        r1 AS (
          SELECT v.doc_id, v.w,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nv._n AS DOUBLE)
                   + 8.5e-1 * (CAST(COALESCE(a.dm_i, 0) AS DOUBLE)
                     / CAST(nv._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM tr_verts v
          JOIN tr_nv nv ON v.doc_id = nv.doc_id
          LEFT JOIN recv1 vv ON vv.doc_id = v.doc_id AND vv.w = v.w
          LEFT JOIN dang1 a ON a.doc_id = v.doc_id
        ),
        recv2 AS (
          SELECT e.doc_id, e.dst AS w,
                 CAST(SUM(r.rank_i // g.outdeg) AS BIGINT) AS recv_i
          FROM r1 r
          JOIN tr_edges e ON r.doc_id = e.doc_id AND r.w = e.src
          JOIN tr_deg g ON g.doc_id = e.doc_id AND g.src = e.src
          GROUP BY e.doc_id, e.dst
        ),
        dang2 AS (
          SELECT r.doc_id, CAST(SUM(r.rank_i) AS BIGINT) AS dm_i
          FROM r1 r
          LEFT JOIN tr_deg g ON g.doc_id = r.doc_id AND g.src = r.w
          WHERE g.src IS NULL GROUP BY r.doc_id
        ),
        r2 AS (
          SELECT v.doc_id, v.w,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nv._n AS DOUBLE)
                   + 8.5e-1 * (CAST(COALESCE(a.dm_i, 0) AS DOUBLE)
                     / CAST(nv._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM tr_verts v
          JOIN tr_nv nv ON v.doc_id = nv.doc_id
          LEFT JOIN recv2 vv ON vv.doc_id = v.doc_id AND vv.w = v.w
          LEFT JOIN dang2 a ON a.doc_id = v.doc_id
        ),
        recv3 AS (
          SELECT e.doc_id, e.dst AS w,
                 CAST(SUM(r.rank_i // g.outdeg) AS BIGINT) AS recv_i
          FROM r2 r
          JOIN tr_edges e ON r.doc_id = e.doc_id AND r.w = e.src
          JOIN tr_deg g ON g.doc_id = e.doc_id AND g.src = e.src
          GROUP BY e.doc_id, e.dst
        ),
        dang3 AS (
          SELECT r.doc_id, CAST(SUM(r.rank_i) AS BIGINT) AS dm_i
          FROM r2 r
          LEFT JOIN tr_deg g ON g.doc_id = r.doc_id AND g.src = r.w
          WHERE g.src IS NULL GROUP BY r.doc_id
        ),
        r3 AS (
          SELECT v.doc_id, v.w,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nv._n AS DOUBLE)
                   + 8.5e-1 * (CAST(COALESCE(a.dm_i, 0) AS DOUBLE)
                     / CAST(nv._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM tr_verts v
          JOIN tr_nv nv ON v.doc_id = nv.doc_id
          LEFT JOIN recv3 vv ON vv.doc_id = v.doc_id AND vv.w = v.w
          LEFT JOIN dang3 a ON a.doc_id = v.doc_id
        )
        SELECT doc_id, w AS word,
               CAST(rank_i AS DOUBLE) / 1e9 AS score, rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY rank_i DESC, w) AS rank
          FROM r3
        ) WHERE rank <= 3
        """

    sql["doc_cdc_chunks"] = """
        WITH d AS (
          SELECT doc_id, text FROM documents WHERE length(text) >= 1
        ),
        chars AS (
          SELECT doc_id, text,
                 CAST(UNNEST(generate_series(0, length(text) - 1))
                   AS BIGINT) AS pos
          FROM d
        ),
        hpos AS (
          SELECT doc_id, pos, substr(text, pos + 1, 1) AS ch,
                 CASE WHEN pos >= 7 AND
                      (((CAST(ascii(substr(text, pos + 1 - 0, 1)) AS BIGINT) * 1 + CAST(ascii(substr(text, pos + 1 - 1, 1)) AS BIGINT) * 31 + CAST(ascii(substr(text, pos + 1 - 2, 1)) AS BIGINT) * 961 + CAST(ascii(substr(text, pos + 1 - 3, 1)) AS BIGINT) * 29791 + CAST(ascii(substr(text, pos + 1 - 4, 1)) AS BIGINT) * 923521 + CAST(ascii(substr(text, pos + 1 - 5, 1)) AS BIGINT) * 28629151 + CAST(ascii(substr(text, pos + 1 - 6, 1)) AS BIGINT) * 887503681 + CAST(ascii(substr(text, pos + 1 - 7, 1)) AS BIGINT) * 27512614111) % 1048576) % 64) = 63
                      THEN 1 ELSE 0 END AS _bnd
          FROM chars
        ),
        cid AS (
          SELECT doc_id, pos, ch,
                 CAST(COALESCE(SUM(_bnd) OVER (PARTITION BY doc_id
                   ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS chunk_id
          FROM hpos
        ),
        chunks AS (
          SELECT doc_id, chunk_id,
                 CAST(MIN(pos) AS BIGINT) AS start_pos,
                 CAST(COUNT(*) AS BIGINT) AS chunk_len,
                 md5(string_agg(ch, '' ORDER BY pos)) AS chunk_md5
          FROM cid GROUP BY doc_id, chunk_id
        ),
        copies AS (
          SELECT chunk_md5, CAST(COUNT(*) AS BIGINT) AS n_copies
          FROM chunks GROUP BY chunk_md5
        )
        SELECT doc_id, chunk_id, start_pos, chunk_len, c.chunk_md5,
               n_copies
        FROM chunks c JOIN copies p ON c.chunk_md5 = p.chunk_md5
        """

    sql["doc_heaps_law"] = r"""
        WITH tok AS (
          SELECT doc_id,
                 UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents
        ),
        tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        per_doc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_d
          FROM tok2 GROUP BY doc_id
        ),
        firsts AS (SELECT t, MIN(doc_id) AS doc_id FROM tok2 GROUP BY t),
        new_terms AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS v_d
          FROM firsts GROUP BY doc_id
        ),
        doc_tbl AS (
          SELECT p.doc_id, p.n_d,
                 CAST(COALESCE(nt.v_d, 0) AS BIGINT) AS v_d
          FROM per_doc p LEFT JOIN new_terms nt ON p.doc_id = nt.doc_id
        ),
        cum AS (
          SELECT doc_id,
                 CAST(SUM(n_d) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS N,
                 CAST(SUM(v_d) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS V
          FROM doc_tbl
        ),
        pts AS (
          SELECT CAST(round(ln(CAST(N AS DOUBLE)) * 1000000000) AS BIGINT) AS lx,
                 CAST(round(ln(CAST(V AS DOUBLE)) * 1000000000) AS BIGINT) AS ly, N, V
          FROM cum WHERE N > 0 AND V > 0
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 SUM(CAST(lx AS HUGEINT)) AS sx,
                 SUM(CAST(ly AS HUGEINT)) AS sy,
                 SUM(CAST(lx AS HUGEINT) * lx) AS sxx,
                 SUM(CAST(lx AS HUGEINT) * ly) AS sxy,
                 CAST(MAX(N) AS BIGINT) AS total_tokens,
                 CAST(MAX(V) AS BIGINT) AS vocab
          FROM pts
        )
        SELECT m AS n_docs, total_tokens, vocab,
               CASE WHEN m > 1 THEN round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) END AS beta,
               CASE WHEN m > 1 THEN round((CAST(sy AS DOUBLE)
                 - ((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / (1000000000.0 * m), 9) END AS ln_k
        FROM agg
        """

    sql["doc_dsir_weights"] = r"""
        WITH tok AS (
          SELECT doc_id, source,
                 UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents
        ),
        dt AS (
          SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS c_td
          FROM tok GROUP BY doc_id, source, t
        ),
        raw AS (
          SELECT t, CAST(SUM(c_td) AS BIGINT) AS c_raw FROM dt GROUP BY t
        ),
        tgt AS (
          SELECT t, CAST(SUM(c_td) AS BIGINT) AS c_tgt
          FROM dt WHERE source = 'src0' GROUP BY t
        ),
        terms AS (
          SELECT raw.t, c_raw,
                 CAST(COALESCE(c_tgt, 0) AS BIGINT) AS c_tgt
          FROM raw LEFT JOIN tgt ON raw.t = tgt.t
        ),
        scal AS (
          SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
                 CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM terms
        ),
        w AS (
          SELECT t,
                 CAST(round(ln(CAST(c_tgt + 1 AS DOUBLE)
                   / CAST(n_tgt + v AS DOUBLE)) * 1000000000) AS BIGINT)
                 - CAST(round(ln(CAST(c_raw + 1 AS DOUBLE)
                   / CAST(n_raw + v AS DOUBLE)) * 1000000000) AS BIGINT)
                   AS w_t
          FROM terms CROSS JOIN scal
        ),
        scored AS (
          SELECT doc_id, CAST(SUM(c_td) AS BIGINT) AS n_tokens,
                 SUM(CAST(c_td AS HUGEINT) * w_t) AS _sq
          FROM dt JOIN w ON dt.t = w.t GROUP BY doc_id
        )
        SELECT doc_id, n_tokens,
               (CAST(_sq AS DOUBLE) / 1000000000) / n_tokens
                 AS dsir_logratio
        FROM scored
        """

    sql["doc_source_kl"] = r"""
        WITH tok AS (
          SELECT source,
                 UNNEST(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents
        ),
        st AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c_ts
          FROM tok GROUP BY source, t
        ),
        ct AS (
          SELECT t, CAST(SUM(c_ts) AS BIGINT) AS c_t FROM st GROUP BY t
        ),
        ns AS (
          SELECT source, CAST(SUM(c_ts) AS BIGINT) AS n_s,
                 CAST(COUNT(*) AS BIGINT) AS n_terms
          FROM st GROUP BY source
        ),
        nn AS (SELECT CAST(SUM(c_ts) AS BIGINT) AS big_n FROM st),
        terms AS (
          -- HUGEINT weights: the Spark side sums the identical exact
          -- integers in DECIMAL(38,0) (markov_entropy's class)
          SELECT st.source,
                 CAST(st.c_ts AS HUGEINT)
                 * (CAST(round(ln(CAST(st.c_ts AS DOUBLE)
                                  / CAST(ns.n_s AS DOUBLE))
                               * 1000000000) AS BIGINT)
                    - CAST(round(ln(CAST(ct.c_t AS DOUBLE)
                                    / CAST(nn.big_n AS DOUBLE))
                                 * 1000000000) AS BIGINT)) AS w
          FROM st
          JOIN ct USING (t)
          JOIN ns USING (source)
          CROSS JOIN nn
        )
        SELECT ns.source, ns.n_s AS n_tokens, ns.n_terms,
               (CAST(SUM(t2.w) AS DOUBLE) / 1000000000) / ns.n_s AS kl
        FROM terms t2
        JOIN ns ON ns.source = t2.source
        GROUP BY ns.source, ns.n_s, ns.n_terms
        """

    sql["doc_minhash_signatures"] = (
        f"WITH {MINHASH_PRE} "
        "SELECT doc_id, CAST(j AS BIGINT) AS j, minhash FROM mh"
    )

    sql["doc_minhash_lsh_pairs"] = f"""
        WITH {MINHASH_PRE}, {BANDS}, {CAND_CAPPED},
        {JACCARD_TAIL}
        SELECT i.doc_a, i.doc_b, sa.n AS n_a, sb.n AS n_b, i.inter,
               i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
        FROM ints i
        JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        """

    # Distinct-count sketches over the raw shingle strings. The
    # shingle construction mirrors _shingle_strings; every hash is the
    # shared 60-bit md5 prefix; HLL folds registers in bucket order
    # with exact power-of-two terms; ln is 9-dp quantized.
    _SH_STR = """
        doc_toks3 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                      FROM documents),
        sstr AS (
          SELECT UNNEST(
            CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END
          ) AS s
          FROM doc_toks3
        )
        """
    _ALPHA8 = round(0.7213 / (1 + 1.079 / 256), 9)
    _PH_SS = md5_hash64_duck("s")
    sql["doc_hll_distinct"] = f"""
        WITH {_SH_STR},
        h AS (SELECT {_PH_SS} AS h FROM sstr WHERE s IS NOT NULL),
        regs AS (
          SELECT h % 256 AS bucket,
                 MAX(CASE WHEN h // 256 = 0 THEN 53
                          ELSE 52 - length(bin(h // 256)) + 1 END) AS rho
          FROM h GROUP BY 1
        ),
        st AS (
          SELECT CAST(256 - COUNT(*) AS BIGINT) AS zero_buckets,
                 list_reduce(
                   list_prepend(CAST(256 - COUNT(*) AS DOUBLE),
                     list(CAST(1 AS DOUBLE)
                          / CAST((CAST(1 AS BIGINT) << rho) AS DOUBLE)
                          ORDER BY bucket)),
                   (a, x) -> a + x) AS z
          FROM regs
        )
        SELECT CAST(256 AS BIGINT) AS m, zero_buckets,
               round(CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z, 9) AS raw_estimate,
               round(CASE WHEN CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z <= 2.5 * 256
                           AND zero_buckets > 0
                          THEN 256 * round(ln(CAST(256 AS DOUBLE) / zero_buckets), 9)
                          ELSE CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z END, 9) AS estimate
        FROM st
        """

    sql["doc_hll_by_source"] = f"""
        WITH doc_toks3g AS (
          SELECT source, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        sstrg AS (
          SELECT source, UNNEST(
            CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END
          ) AS s
          FROM doc_toks3g
        ),
        h AS (SELECT source, {_PH_SS} AS h FROM sstrg WHERE s IS NOT NULL),
        regs AS (
          SELECT source, h % 256 AS bucket,
                 MAX(CASE WHEN h // 256 = 0 THEN 53
                          ELSE 52 - length(bin(h // 256)) + 1 END) AS rho
          FROM h GROUP BY 1, 2
        ),
        st AS (
          SELECT source,
                 CAST(256 - COUNT(*) AS BIGINT) AS zero_buckets,
                 list_reduce(
                   list_prepend(CAST(256 - COUNT(*) AS DOUBLE),
                     list(CAST(1 AS DOUBLE)
                          / CAST((CAST(1 AS BIGINT) << rho) AS DOUBLE)
                          ORDER BY bucket)),
                   (a, x) -> a + x) AS z
          FROM regs GROUP BY source
        )
        SELECT source, CAST(256 AS BIGINT) AS m, zero_buckets,
               round(CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z, 9) AS raw_estimate,
               round(CASE WHEN CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z <= 2.5 * 256
                           AND zero_buckets > 0
                          THEN 256 * round(ln(CAST(256 AS DOUBLE) / zero_buckets), 9)
                          ELSE CAST({_ALPHA8!r} AS DOUBLE) * 256 * 256 / z END, 9) AS estimate
        FROM st
        """

    sql["doc_kmv_distinct"] = f"""
        WITH {_SH_STR},
        h AS (SELECT DISTINCT {_PH_SS} AS h FROM sstr WHERE s IS NOT NULL),
        mins AS (
          SELECT list(h ORDER BY h) AS mins
          FROM (SELECT h FROM h ORDER BY h LIMIT 64)
        )
        SELECT CAST(64 AS BIGINT) AS k,
               CAST(len(mins) AS BIGINT) AS n_seen,
               CAST(mins[len(mins)] AS BIGINT) AS kth_min,
               CASE WHEN len(mins) < 64 THEN CAST(len(mins) AS DOUBLE)
                    ELSE round(CAST(63 AS DOUBLE) * {1 << 60}
                               / mins[len(mins)], 9) END AS estimate
        FROM mins
        """

    # Exact-substring duplication: 8-gram hashes -> distinct-doc
    # counts -> per-doc interval union of duplicated [pos, pos+8)
    # spans. Integers and exact ratios only.
    _WGH = md5_hash64_duck("array_to_string(toks[pos:pos+4], ' ')")
    sql["doc_winnow_fingerprints"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        pos AS (
          SELECT doc_id, toks,
                 UNNEST(generate_series(1, GREATEST(len(toks) - 4, 0))) AS pos
          FROM doc_toks
          WHERE length(trim(array_to_string(toks, ' '))) > 0
        ),
        grams AS (SELECT doc_id, pos, {_WGH} AS gh FROM pos),
        packed AS (
          SELECT doc_id, pos,
                 (gh % {1 << 40}) * {1 << 23} + ({(1 << 23) - 1} - pos) AS key
          FROM grams
        ),
        sel AS (
          SELECT doc_id,
                 MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
          FROM packed
        )
        SELECT DISTINCT doc_id, {(1 << 23) - 1} - (mk % {1 << 23}) AS pos,
               mk // {1 << 23} AS fp
        FROM sel WHERE rn >= 4
        """

    sql["doc_winnow_overlap"] = f"""
        WITH wf AS ({sql["doc_winnow_fingerprints"]}),
        fps AS (SELECT DISTINCT doc_id, fp FROM wf),
        sizes AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
          FROM fps GROUP BY doc_id
        ),
        kept AS (
          SELECT fps.doc_id, fps.fp FROM fps
          JOIN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 50) c
            USING (fp)
        ),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 2
        )
        SELECT s.doc_a, s.doc_b, s.n_shared,
               CAST(s.n_shared AS DOUBLE)
                 / CAST(LEAST(sa.n_fp, sb.n_fp) AS DOUBLE) AS containment
        FROM shared s
        JOIN sizes sa ON s.doc_a = sa.doc_id
        JOIN sizes sb ON s.doc_b = sb.doc_id
        """

    sql["ts_hourly_profile"] = with_views(
        f"""
        SELECT channel, (ts % {86400 * 1_000_000}) // {3600 * 1_000_000} AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * {CORR_QUANT}) AS BIGINT)) AS BIGINT) AS sum_q,
               CAST(SUM(CAST(round(value * {CORR_QUANT}) AS BIGINT)) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * {CORR_QUANT}) AS mean
        FROM samples
        GROUP BY channel, (ts % {86400 * 1_000_000}) // {3600 * 1_000_000}
        """,
        "samples",
    )

    _hu_arr = ", ".join(str(int(n)) for n in HURST_SCALES)
    _hu_slope = (
        "(CAST(n_scales AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(CAST(n_scales AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    _hu_guard = (
        "n_scales >= 2 AND CAST(n_scales AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0"
    )
    sql["ts_hurst_rs"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel,
                 CAST(round(value * {HURST_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        ex AS (
          SELECT channel, CAST(scale AS BIGINT) AS scale,
                 rn // scale AS win, rn % scale AS pos, xq
          FROM rk, UNNEST([{_hu_arr}]) AS t(scale)
        ),
        d AS (
          SELECT channel, scale, win, pos + 1 AS i, xq,
                 SUM(xq) OVER (PARTITION BY channel, scale, win
                     ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s_i,
                 SUM(xq) OVER (PARTITION BY channel, scale, win) AS s_n,
                 SUM(xq * xq) OVER (PARTITION BY channel, scale, win)
                   AS sxx,
                 COUNT(*) OVER (PARTITION BY channel, scale, win) AS nw
          FROM ex
        ),
        g AS (
          SELECT channel, scale, win,
                 CAST(MAX(scale * s_i - i * s_n)
                      - MIN(scale * s_i - i * s_n) AS BIGINT) AS rq,
                 CAST(MAX(scale * sxx - s_n * s_n) AS BIGINT) AS den2
          FROM d WHERE nw = scale GROUP BY channel, scale, win
        ),
        r2 AS (
          SELECT channel, scale, CAST(COUNT(*) AS BIGINT) AS n_w,
                 CAST(SUM(CAST(round((CAST(rq AS DOUBLE)
                     / sqrt(CAST(den2 AS DOUBLE))) * 1000000) AS BIGINT))
                     AS BIGINT) AS srs
          FROM g WHERE den2 > 0 GROUP BY channel, scale
          HAVING SUM(CAST(round((CAST(rq AS DOUBLE)
              / sqrt(CAST(den2 AS DOUBLE))) * 1000000) AS BIGINT)) > 0
        ),
        pts AS (
          SELECT channel,
                 CAST(round(round(ln(CAST(scale AS DOUBLE)), 9) * 1000)
                      AS BIGINT) AS xp,
                 CAST(round(round(ln((CAST(srs AS DOUBLE) / 1000000)
                                     / n_w), 9) * 1000) AS BIGINT) AS yp
          FROM r2
        ),
        agg AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_scales,
                 CAST(SUM(xp) AS BIGINT) AS sx,
                 CAST(SUM(yp) AS BIGINT) AS sy,
                 CAST(SUM(xp * yp) AS BIGINT) AS sxy,
                 CAST(SUM(xp * xp) AS BIGINT) AS sxx
          FROM pts GROUP BY channel
        )
        SELECT channel, n_scales,
               CASE WHEN {_hu_guard} THEN round({_hu_slope}, 9) END
                 AS hurst,
               CASE WHEN {_hu_guard} THEN
                 round((CAST(sy AS DOUBLE) / 1000 - round({_hu_slope}, 9)
                 * CAST(sx AS DOUBLE) / 1000) / n_scales, 9) END
                 AS intercept
        FROM agg
        """,
        "samples",
    )

    sql["ts_trend_segments"] = with_views(
        f"""
        WITH g AS (
          SELECT channel, (ts // {TREND_WIN_US}) * {TREND_WIN_US} AS win_start,
                 (ts - (ts // {TREND_WIN_US}) * {TREND_WIN_US})
                   // {TREND_X_US} AS x,
                 CAST(round(value * 100) AS BIGINT) AS vq
          FROM samples
        ),
        a AS (
          SELECT channel, win_start, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(vq) AS BIGINT) AS sy,
                 CAST(SUM(x * vq) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM g GROUP BY channel, win_start
        ),
        d AS (
          SELECT *,
                 CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
                   - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
                 CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
                   - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den
          FROM a
        )
        SELECT channel, win_start, n,
               (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / 100 AS slope,
               (CAST(sy AS DOUBLE) / 100) / n AS mean_value,
               CASE WHEN num > 0 THEN 'rising'
                    WHEN num < 0 THEN 'falling'
                    ELSE 'flat' END AS direction
        FROM d WHERE n >= 2 AND den > 0
        """,
        "samples",
    )

    # streaming trend segments drain == batch (associative moments,
    # shared finish) — same oracle
    sql["stream_trend"] = sql["ts_trend_segments"]
    # streaming drift: the counters are associative and the finish is
    # shared, so the batch PSI oracle gates the streaming operator too
    # (assigned after ts_distribution_drift is defined below)

    _dg_w = (HQ_HI - HQ_LO) / DG_BINS
    _dg_raw = (
        f"CAST(floor((value - {HQ_LO!r}e0) / {_dg_w!r}e0) AS BIGINT)"
    )
    sql["ts_density_grid"] = with_views(
        f"""
        WITH b AS (
          SELECT channel,
                 (ts // {TREND_WIN_US}) * {TREND_WIN_US} AS t_bucket,
                 CASE WHEN {_dg_raw} < 0 THEN 0
                      WHEN {_dg_raw} > {DG_BINS - 1} THEN {DG_BINS - 1}
                      ELSE {_dg_raw} END AS bin
          FROM samples
        )
        SELECT channel, t_bucket, bin,
               {HQ_LO!r}e0 + bin * {_dg_w!r}e0 AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY channel, t_bucket, bin
        """,
        "samples",
    )

    sql["ts_quality_profile"] = with_views(
        f"""
        WITH per_ts AS (
          SELECT channel, ts, CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
                 CAST(SUM(CASE WHEN value < 1e3 THEN 1 ELSE 0 END) AS BIGINT) AS below,
                 CAST(SUM(CASE WHEN value > 1e5 THEN 1 ELSE 0 END) AS BIGINT) AS above,
                 MIN(value) AS vmin, MAX(value) AS vmax
          FROM samples GROUP BY channel, ts
        )
        SELECT channel, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(nulls) AS BIGINT) AS n_null,
               CAST(SUM(c - 1) AS BIGINT) AS n_dup_ts,
               CAST(SUM(below) AS BIGINT) AS n_below,
               CAST(SUM(above) AS BIGINT) AS n_above,
               MIN(ts) AS ts_min, MAX(ts) AS ts_max,
               MIN(vmin) AS v_min, MAX(vmax) AS v_max
        FROM per_ts GROUP BY channel
        """,
        "samples",
    )

    _GH = md5_hash64_duck("array_to_string(toks[pos:pos+7], ' ')")
    sql["doc_substring_dup"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        pos AS (
          SELECT doc_id, toks,
                 UNNEST(generate_series(1, GREATEST(len(toks) - 7, 0))) AS pos
          FROM doc_toks
          WHERE length(trim(array_to_string(toks, ' '))) > 0
        ),
        grams AS (SELECT doc_id, pos, {_GH} AS gh FROM pos),
        dupg AS (
          SELECT gh FROM (
            SELECT gh, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gh
          ) WHERE nd >= 2
        ),
        dpos AS (SELECT doc_id, pos FROM grams JOIN dupg USING (gh)),
        cov AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
                 CAST(SUM(LEAST(8, COALESCE(next_pos - pos, 8))) AS BIGINT) AS dup_covered
          FROM (
            SELECT doc_id, pos,
                   LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS next_pos
            FROM dpos
          )
          GROUP BY doc_id
        ),
        nt AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(len({TOKS}) AS BIGINT) END AS n_tokens
          FROM documents
        )
        SELECT nt.doc_id, nt.n_tokens,
               CAST(COALESCE(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
               CAST(COALESCE(c.dup_covered, 0) AS BIGINT) AS dup_covered,
               CASE WHEN nt.n_tokens = 0 THEN CAST(0 AS DOUBLE)
                    ELSE COALESCE(c.dup_covered, 0) / CAST(nt.n_tokens AS DOUBLE)
               END AS dup_fraction
        FROM nt LEFT JOIN cov c ON nt.doc_id = c.doc_id
        """

    sql["ts_rolling_stats"] = with_views(
        f"""
        SELECT channel, ts, value, n_window, win_min, win_max, win_sum_q,
               CAST(win_sum_q AS DOUBLE) / 1000000 / n_window AS win_mean
        FROM (
          SELECT channel, ts, value,
                 CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
                 MIN(value) OVER w AS win_min,
                 MAX(value) OVER w AS win_max,
                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS win_sum_q
          FROM samples
          WHERE channel IN ('ch1', 'ch3') AND ts >= {T1995} AND ts < {T1995H2}
          WINDOW w AS (PARTITION BY channel ORDER BY ts
                       RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW)
        )
        """,
        "samples",
    )

    # --- round-4b embedding standardization / MAD --------------------
    _eds = """
        el AS (
          SELECT UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
                 UNNEST(embedding) AS v
          FROM embeddings
        ),
        elq AS (
          SELECT dim,
                 CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS vq,
                 CAST(round(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * 1000000)
                      AS BIGINT) AS vq2
          FROM el
        ),
        dagg AS (
          SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(vq) AS BIGINT) AS sq,
                 CAST(SUM(vq2) AS BIGINT) AS sq2
          FROM elq GROUP BY dim
        ),
        dstats AS (
          SELECT CAST(dim AS BIGINT) AS dim, n,
                 CAST(sq AS DOUBLE) / 1000000 / n AS mean,
                 sqrt(greatest(CAST(sq2 AS DOUBLE) / 1000000 / n
                      - (CAST(sq AS DOUBLE) / 1000000 / n)
                        * (CAST(sq AS DOUBLE) / 1000000 / n),
                      CAST(0 AS DOUBLE))) AS std
          FROM dagg
        )
        """
    sql["emb_dim_stats"] = f"""
        WITH {_eds}
        SELECT dim, n, mean, std FROM dstats
        """

    sql["emb_standardize"] = f"""
        WITH {_eds},
        ev AS (
          SELECT vec_id,
                 UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
                 UNNEST(embedding) AS v
          FROM embeddings
        ),
        zr AS (
          SELECT ev.vec_id, ev.dim,
                 CASE WHEN d.std = 0 THEN CAST(0 AS DOUBLE)
                      ELSE (CAST(ev.v AS DOUBLE) - d.mean) / d.std END AS z
          FROM ev JOIN dstats d ON ev.dim = d.dim
        )
        SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list(z * z ORDER BY dim)), (a, b) -> a + b), 9) AS znorm2
        FROM zr GROUP BY vec_id
        """

    sql["emb_outliers"] = f"""
        WITH {_eds},
        ev AS (
          SELECT vec_id,
                 UNNEST(generate_series(1, len(embedding))) - 1 AS dim,
                 UNNEST(embedding) AS v
          FROM embeddings
        ),
        zr AS (
          SELECT ev.vec_id, ev.dim,
                 CASE WHEN d.std = 0 THEN CAST(0 AS DOUBLE)
                      ELSE (CAST(ev.v AS DOUBLE) - d.mean) / d.std END AS z
          FROM ev JOIN dstats d ON ev.dim = d.dim
        ),
        scored AS (
          SELECT vec_id,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list(z * z ORDER BY dim)), (a, b) -> a + b)
                      / CAST(COUNT(*) AS DOUBLE)) AS score
          FROM zr GROUP BY vec_id
        )
        SELECT vec_id, score FROM scored
        WHERE round(score, 9) > {EMB_OUT_Z!r}
        """

    _mad_pct = (
        "_lo + (_hi - _lo) * "
        "(CAST(0.5 AS DOUBLE) * (n - 1) - floor(CAST(0.5 AS DOUBLE) * (n - 1)))"
    )

    def _med_sql(src: str) -> str:
        return f"""
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n,
                 MAX(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1))
                     THEN value END) AS _lo,
                 MAX(CASE WHEN rn = least(floor(CAST(0.5 AS DOUBLE) * (n - 1)) + 1, n - 1)
                     THEN value END) AS _hi
          FROM (
            SELECT channel, value,
                   ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                     - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY channel) AS n
            FROM {src}
          ) GROUP BY channel
        """

    sql["ts_channel_mad"] = with_views(
        f"""
        WITH m1 AS ({_med_sql('samples')}),
        med AS (SELECT channel, {_mad_pct} AS median FROM m1),
        dev AS (
          SELECT s.channel, s.ts, abs(s.value - med.median) AS value
          FROM samples s JOIN med ON s.channel = med.channel
        ),
        m2 AS ({_med_sql('dev')}),
        madt AS (SELECT channel, n, {_mad_pct} AS mad FROM m2)
        SELECT madt.channel, madt.n, med.median, madt.mad
        FROM madt JOIN med ON madt.channel = med.channel
        """,
        "samples",
    )

    def _pmed_sql(src: str) -> str:
        return f"""
          SELECT channel, phase, CAST(MAX(n) AS BIGINT) AS n,
                 MAX(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1))
                     THEN value END) AS _lo,
                 MAX(CASE WHEN rn = least(floor(CAST(0.5 AS DOUBLE) * (n - 1)) + 1, n - 1)
                     THEN value END) AS _hi
          FROM (
            SELECT channel, phase, value,
                   ROW_NUMBER() OVER (PARTITION BY channel, phase
                       ORDER BY value, ts) - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY channel, phase) AS n
            FROM {src}
          ) GROUP BY channel, phase
        """

    sql["stream_distinct_events"] = "SELECT DISTINCT event_id FROM events"

    from pennsieve_streaming_spark.llm.curation import (
        SAMPLE_MOD as _SC_MOD,
        SAMPLE_MULT as _SC_MULT,
    )

    sql["doc_source_cap"] = f"""
        SELECT doc_id, source, lang, pick FROM (
          SELECT doc_id, source, lang,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY (((doc_id + 0) % {_SC_MOD}) * {_SC_MULT}) % {_SC_MOD},
                            doc_id) AS BIGINT) AS pick
          FROM documents
        ) WHERE pick <= {SOURCE_CAP}
        """

    _hq_w = (HQ_HI - HQ_LO) / HQ_BINS  # 500.0
    _hq_cols = []
    for _p in (0.5, 0.9, 0.99):
        _nm = f"q{str(_p).replace('0.', '').ljust(2, '0')}"
        _rk = f"CAST(ceil(CAST({_p!r} AS DOUBLE) * total) AS BIGINT)"
        _hq_cols.append(
            f"MAX(CASE WHEN cum >= {_rk} AND before < {_rk} THEN "
            f"bin_lo + {_hq_w!r}e0 * (CAST({_rk} - before AS DOUBLE) "
            f"/ CAST(n AS DOUBLE)) END) AS {_nm}"
        )
    sql["ts_hist_quantiles"] = with_views(
        f"""
        WITH hist AS (
          SELECT channel, bin,
                 {HQ_LO!r}e0 + bin * {_hq_w!r}e0 AS bin_lo,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM (
            SELECT channel,
                   CAST(floor((value - {HQ_LO!r}e0) / {_hq_w!r}e0) AS BIGINT) AS bin
            FROM samples
          ) WHERE bin >= 0 AND bin < {HQ_BINS}
          GROUP BY channel, bin
        ),
        cum AS (
          SELECT channel, bin, bin_lo, n,
                 SUM(n) OVER (PARTITION BY channel ORDER BY bin) AS cum,
                 SUM(n) OVER (PARTITION BY channel) AS total,
                 SUM(n) OVER (PARTITION BY channel ORDER BY bin) - n AS before
          FROM hist
        )
        SELECT channel, CAST(MAX(total) AS BIGINT) AS n,
               {", ".join(_hq_cols)}
        FROM cum GROUP BY channel
        """,
        "samples",
    )

    _fs = FUNNEL_STEPS
    sql["ev_funnel_steps"] = f"""
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, user_id, event_type FROM events
        ),
        s0 AS (
          SELECT user_id, MIN(ts) AS t FROM ue
          WHERE event_type = '{_fs[0]}' GROUP BY user_id
        ),
        s1 AS (
          SELECT u.user_id, MIN(u.ts) AS t
          FROM ue u JOIN s0 ON u.user_id = s0.user_id
          WHERE u.event_type = '{_fs[1]}' AND u.ts > s0.t
          GROUP BY u.user_id
        ),
        s2 AS (
          SELECT u.user_id, MIN(u.ts) AS t
          FROM ue u JOIN s1 ON u.user_id = s1.user_id
          WHERE u.event_type = '{_fs[2]}' AND u.ts > s1.t
          GROUP BY u.user_id
        )
        SELECT CAST(0 AS BIGINT) AS step_idx, '{_fs[0]}' AS step,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS n_users
        UNION ALL
        SELECT CAST(1 AS BIGINT), '{_fs[1]}',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)
        UNION ALL
        SELECT CAST(2 AS BIGINT), '{_fs[2]}',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
        """

    sql["ev_last_touch"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events
        ),
        tagged AS (
          SELECT user_id, ts, event_id, event_type,
                 last_value(CASE WHEN event_type <> 'purchase'
                            THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_touch
          FROM ue
        )
        SELECT COALESCE(prior_touch, 'none') AS touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_conversions
        FROM tagged WHERE event_type = 'purchase'
        GROUP BY COALESCE(prior_touch, 'none')
        """

    _psi_nb = 22
    _psi_w = (HQ_HI - HQ_LO) / _psi_nb
    _psi_p = (
        f"(CAST(c_ref AS DOUBLE) + 5e-1) / (CAST(n_ref AS DOUBLE) + 5e-1 * {_psi_nb})"
    )
    _psi_q = (
        f"(CAST(c_cur AS DOUBLE) + 5e-1) / (CAST(n_cur AS DOUBLE) + 5e-1 * {_psi_nb})"
    )
    sql["ts_distribution_drift"] = with_views(
        f"""
        WITH counts AS (
          SELECT channel,
                 CAST(floor((value - {HQ_LO!r}e0) / {_psi_w!r}e0) AS BIGINT) AS bin,
                 CAST(SUM(CASE WHEN ts < {PSI_SPLIT_TS} THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
                 CAST(SUM(CASE WHEN ts < {PSI_SPLIT_TS} THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
          FROM samples
          WHERE floor((value - {HQ_LO!r}e0) / {_psi_w!r}e0) >= 0
            AND floor((value - {HQ_LO!r}e0) / {_psi_w!r}e0) < {_psi_nb}
          GROUP BY channel, CAST(floor((value - {HQ_LO!r}e0) / {_psi_w!r}e0) AS BIGINT)
        ),
        grid AS (
          SELECT c.channel, b.bin
          FROM (SELECT DISTINCT channel FROM counts) c
          CROSS JOIN (SELECT UNNEST(generate_series(0, {_psi_nb - 1})) AS bin) b
        ),
        cells AS (
          SELECT g.channel, g.bin,
                 COALESCE(c.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
          FROM grid g LEFT JOIN counts c
            ON g.channel = c.channel AND g.bin = c.bin
        ),
        tot AS (
          SELECT channel, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                 CAST(SUM(c_cur) AS BIGINT) AS n_cur
          FROM cells GROUP BY channel
        ),
        terms AS (
          SELECT f.channel, t.n_ref, t.n_cur,
                 CAST(round((round({_psi_p} - {_psi_q}, 9)
                   * round(ln(({_psi_p}) / ({_psi_q})), 9)) * 1000000000) AS BIGINT) AS tq
          FROM cells f JOIN tot t ON f.channel = t.channel
        )
        SELECT channel, MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur,
               CAST(SUM(tq) AS DOUBLE) / 1e9 AS psi
        FROM terms GROUP BY channel
        """,
        "samples",
    )
    sql["stream_drift"] = sql["ts_distribution_drift"]

    _WK = 7 * 86_400 * 1_000_000
    sql["ev_cohort_matrix"] = f"""
        WITH uw AS (
          SELECT DISTINCT (epoch_us(ts) // {_WK}) * {_WK} AS week,
                 user_id
          FROM events
        ),
        first AS (
          SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first GROUP BY cohort_week
        ),
        joined AS (
          SELECT f.cohort_week,
                 (u.week - f.cohort_week) // {_WK} AS week_n
          FROM uw u JOIN first f ON u.user_id = f.user_id
          WHERE (u.week - f.cohort_week) // {_WK} <= 8
        ),
        ret AS (
          SELECT cohort_week, week_n, CAST(COUNT(*) AS BIGINT) AS retained
          FROM joined GROUP BY cohort_week, week_n
        )
        SELECT r.cohort_week, r.week_n, s.cohort_size, r.retained,
               CAST(r.retained AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
        FROM ret r JOIN sizes s ON r.cohort_week = s.cohort_week
        """

    # Retention half-life: pooled-by-age ln rates (nano-quantized) →
    # exact OLS moments → the shared slope/half-life finishes.
    from pennsieve_streaming_spark.operators.analytics import (
        RHL_SLOPE as _RHL_S,
    )

    from pennsieve_streaming_spark.operators.analytics import (
        DAY_US as _KM_DAY,
    )
    _KM_CENSOR = KM_REGISTRY_CENSOR_US

    from pennsieve_streaming_spark.operators.analytics import (
        RAYLEIGH_CRIT as _RAY_CRIT,
        circadian_exprs as _circ_exprs,
    )

    _ccos, _csin = _circ_exprs()
    _chour_aggs = ", ".join(
        f"CAST(SUM(CASE WHEN (ts // 3600000000) % 24 = {h} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS _h{h}"
        for h in range(24)
    )
    _cpeak = "GREATEST(" + ", ".join(f"_h{h}" for h in range(24)) + ")"
    _cpeak_hour = (
        "CASE "
        + " ".join(f"WHEN _h{h} = {_cpeak} THEN {h}" for h in range(24))
        + " END"
    )
    _cr = f"sqrt({_ccos} * {_ccos} + {_csin} * {_csin}) / n_events"
    sql["ev_circadian"] = f"""
        WITH ev AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS ts, user_id FROM events
        ),
        g AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                 {_chour_aggs}
          FROM ev GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST({_cpeak_hour} AS BIGINT) AS peak_hour,
               CAST({_cpeak} AS DOUBLE) / n_events AS peak_share,
               {_cr} AS r,
               n_events * ({_cr}) * ({_cr}) AS rayleigh_z,
               n_events * ({_cr}) * ({_cr}) > {_RAY_CRIT:.17e} AS circadian
        FROM g
        """

    sql["ev_new_vs_returning"] = """
        WITH ud AS (
          SELECT DISTINCT
                 (CAST(epoch_us(ts) AS BIGINT) // 86400000000)
                   * 86400000000 AS day,
                 user_id
          FROM events
        ),
        firsts AS (
          SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
        ),
        g AS (
          SELECT day,
                 CAST(COUNT(*) AS BIGINT) AS active_users,
                 CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                      AS BIGINT) AS new_users
          FROM ud JOIN firsts ON ud.user_id = firsts.user_id
          GROUP BY day
        )
        SELECT day, active_users, new_users,
               CAST(active_users - new_users AS BIGINT)
                 AS returning_users,
               CAST(active_users - new_users AS DOUBLE) / active_users
                 AS returning_share
        FROM g
        """

    sql["ev_ab_sequential"] = """
        WITH per AS (
          SELECT ((user_id % 2) + 2) % 2 AS variant,
                 MIN(CAST(epoch_us(ts) AS BIGINT) // 86400000000) AS fd,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN CAST(epoch_us(ts) AS BIGINT) // 86400000000
                     END) AS cd
          FROM events GROUP BY user_id
        ),
        days AS (
          SELECT DISTINCT CAST(epoch_us(ts) AS BIGINT) // 86400000000
                   AS day
          FROM events
        ),
        enter AS (
          SELECT variant, fd, CAST(COUNT(*) AS BIGINT) AS m
          FROM per GROUP BY variant, fd
        ),
        cnv AS (
          SELECT variant, cd, CAST(COUNT(*) AS BIGINT) AS c
          FROM per WHERE cd IS NOT NULL GROUP BY variant, cd
        ),
        n_tbl AS (
          SELECT d.day, e.variant,
                 CAST(COALESCE(SUM(e.m), 0) AS BIGINT) AS n
          FROM days d LEFT JOIN enter e ON e.fd <= d.day
          WHERE e.variant IS NOT NULL
          GROUP BY d.day, e.variant
        ),
        c_tbl AS (
          SELECT d.day, v.variant,
                 CAST(COALESCE(SUM(v.c), 0) AS BIGINT) AS c
          FROM days d LEFT JOIN cnv v ON v.cd <= d.day
          WHERE v.variant IS NOT NULL
          GROUP BY d.day, v.variant
        ),
        nb AS (
          SELECT n.day, n.variant, n.n,
                 CAST(COALESCE(c.c, 0) AS BIGINT) AS c
          FROM n_tbl n LEFT JOIN c_tbl c
            ON n.day = c.day AND n.variant = c.variant
        ),
        g AS (
          SELECT day,
                 CAST(COALESCE(MAX(CASE WHEN variant = 0 THEN n END), 0)
                      AS BIGINT) AS n_a,
                 CAST(COALESCE(MAX(CASE WHEN variant = 0 THEN c END), 0)
                      AS BIGINT) AS conv_a,
                 CAST(COALESCE(MAX(CASE WHEN variant = 1 THEN n END), 0)
                      AS BIGINT) AS n_b,
                 CAST(COALESCE(MAX(CASE WHEN variant = 1 THEN c END), 0)
                      AS BIGINT) AS conv_b
          FROM nb GROUP BY day
        ),
        scored0 AS (
          SELECT day, n_a, conv_a, n_b, conv_b,
                 CASE WHEN n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0
                       AND conv_a + conv_b < n_a + n_b
                      THEN round((5e-1 * ln(((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 / n_a + 1e0 / n_b)) / (((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 / n_a + 1e0 / n_b)) + 1e-2)) + (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) * (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) * 1e-2 / (2e0 * ((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 / n_a + 1e0 / n_b)) * (((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * (1e0 / n_a + 1e0 / n_b)) + 1e-2))), 9)
                      ELSE 0e0 END AS ln_lambda_t
          FROM g
        ),
        scored AS (
          SELECT day, n_a, conv_a, n_b, conv_b, ln_lambda_t,
                 CASE WHEN ln_lambda_t > 0e0
                      THEN round(exp(-ln_lambda_t), 9)
                      ELSE 1e0 END AS _p_day
          FROM scored0
        )
        SELECT day, n_a, conv_a, n_b, conv_b, ln_lambda_t,
               MIN(_p_day) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS p_always_valid,
               MIN(_p_day) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 < 5e-2 AS rejected
        FROM scored
        """

    sql["ev_pareto_alpha"] = """
        WITH per AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY user_id HAVING COUNT(*) >= 1
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 SUM(CAST(CAST(round(ln(CAST(x AS DOUBLE) / 1)
                   * 1000000000) AS BIGINT) AS HUGEINT)) AS _slnq
          FROM per
        )
        SELECT n_users, CAST(1 AS BIGINT) AS xmin,
               CASE WHEN _slnq > 0 THEN 1e0 + CAST(n_users AS DOUBLE)
                 / (CAST(_slnq AS DOUBLE) / 1000000000.0) END AS alpha
        FROM agg
        """

    sql["stream_circadian"] = sql["ev_circadian"]

    sql["ev_markov_stationary"] = f"""
        WITH mev AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS ts, event_id, user_id,
                 event_type
          FROM events WHERE event_type IS NOT NULL
        ),
        mpairs AS (
          SELECT event_type AS src,
                 LEAD(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS dst
          FROM mev
        ),
        mcounts AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
          FROM mpairs WHERE dst IS NOT NULL GROUP BY src, dst
        ),
        mverts AS (SELECT DISTINCT event_type AS t FROM mev),
        mdeg AS (
          SELECT src, CAST(SUM(c) AS BIGINT) AS n_out
          FROM mcounts GROUP BY src
        ),
        mnn AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM mverts),
        mr0 AS (
          SELECT t, CAST(round(1e9 / CAST(_n AS DOUBLE)) AS BIGINT)
                   AS rank_i
          FROM mverts CROSS JOIN mnn
        ),
        mrecv1 AS (
          SELECT c.dst AS t,
                 CAST(SUM((r.rank_i // g.n_out) * c.c) AS BIGINT)
                   AS recv_i
          FROM mr0 r
          JOIN mcounts c ON r.t = c.src
          JOIN mdeg g ON g.src = c.src
          GROUP BY c.dst
        ),
        mdang1 AS (
          SELECT CAST(COALESCE(SUM(r.rank_i), 0) AS BIGINT) AS dm_i
          FROM mr0 r LEFT JOIN mdeg g ON g.src = r.t
          WHERE g.src IS NULL
        ),
        mr1 AS (
          SELECT v.t,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn._n AS DOUBLE)
                   + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM mverts v CROSS JOIN mnn nn CROSS JOIN mdang1 a
          LEFT JOIN mrecv1 vv ON vv.t = v.t
        ),
        mrecv2 AS (
          SELECT c.dst AS t,
                 CAST(SUM((r.rank_i // g.n_out) * c.c) AS BIGINT)
                   AS recv_i
          FROM mr1 r
          JOIN mcounts c ON r.t = c.src
          JOIN mdeg g ON g.src = c.src
          GROUP BY c.dst
        ),
        mdang2 AS (
          SELECT CAST(COALESCE(SUM(r.rank_i), 0) AS BIGINT) AS dm_i
          FROM mr1 r LEFT JOIN mdeg g ON g.src = r.t
          WHERE g.src IS NULL
        ),
        mr2 AS (
          SELECT v.t,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn._n AS DOUBLE)
                   + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM mverts v CROSS JOIN mnn nn CROSS JOIN mdang2 a
          LEFT JOIN mrecv2 vv ON vv.t = v.t
        ),
        mrecv3 AS (
          SELECT c.dst AS t,
                 CAST(SUM((r.rank_i // g.n_out) * c.c) AS BIGINT)
                   AS recv_i
          FROM mr2 r
          JOIN mcounts c ON r.t = c.src
          JOIN mdeg g ON g.src = c.src
          GROUP BY c.dst
        ),
        mdang3 AS (
          SELECT CAST(COALESCE(SUM(r.rank_i), 0) AS BIGINT) AS dm_i
          FROM mr2 r LEFT JOIN mdeg g ON g.src = r.t
          WHERE g.src IS NULL
        ),
        mr3 AS (
          SELECT v.t,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn._n AS DOUBLE)
                   + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM mverts v CROSS JOIN mnn nn CROSS JOIN mdang3 a
          LEFT JOIN mrecv3 vv ON vv.t = v.t
        ),
        mrecv4 AS (
          SELECT c.dst AS t,
                 CAST(SUM((r.rank_i // g.n_out) * c.c) AS BIGINT)
                   AS recv_i
          FROM mr3 r
          JOIN mcounts c ON r.t = c.src
          JOIN mdeg g ON g.src = c.src
          GROUP BY c.dst
        ),
        mdang4 AS (
          SELECT CAST(COALESCE(SUM(r.rank_i), 0) AS BIGINT) AS dm_i
          FROM mr3 r LEFT JOIN mdeg g ON g.src = r.t
          WHERE g.src IS NULL
        ),
        mr4 AS (
          SELECT v.t,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn._n AS DOUBLE)
                   + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM mverts v CROSS JOIN mnn nn CROSS JOIN mdang4 a
          LEFT JOIN mrecv4 vv ON vv.t = v.t
        ),
        mrecv5 AS (
          SELECT c.dst AS t,
                 CAST(SUM((r.rank_i // g.n_out) * c.c) AS BIGINT)
                   AS recv_i
          FROM mr4 r
          JOIN mcounts c ON r.t = c.src
          JOIN mdeg g ON g.src = c.src
          GROUP BY c.dst
        ),
        mdang5 AS (
          SELECT CAST(COALESCE(SUM(r.rank_i), 0) AS BIGINT) AS dm_i
          FROM mr4 r LEFT JOIN mdeg g ON g.src = r.t
          WHERE g.src IS NULL
        ),
        mr5 AS (
          SELECT v.t,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn._n AS DOUBLE)
                   + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn._n AS DOUBLE)
                   + CAST(COALESCE(vv.recv_i, 0) AS DOUBLE))) AS BIGINT)
                   AS rank_i
          FROM mverts v CROSS JOIN mnn nn CROSS JOIN mdang5 a
          LEFT JOIN mrecv5 vv ON vv.t = v.t
        )
        SELECT r.t AS event_type,
               CAST(COALESCE(g.n_out, 0) AS BIGINT) AS n_out,
               CAST(r.rank_i AS DOUBLE) / 1e9 AS pi
        FROM mr5 r LEFT JOIN mdeg g ON g.src = r.t
        """

    sql["ev_survival_km"] = f"""
        WITH ev AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS ts, user_id FROM events
        ),
        per AS (
          SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
          FROM ev GROUP BY user_id
        ),
        obs AS (SELECT MAX(last_ts) AS obs_end FROM per),
        u AS (
          SELECT CAST((last_ts - first_ts) // {_KM_DAY} AS BIGINT)
                   AS duration_days,
                 last_ts > obs_end - {_KM_CENSOR} AS _censored
          FROM per CROSS JOIN obs
        ),
        day AS (
          SELECT duration_days,
                 CAST(SUM(CASE WHEN NOT _censored THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_deaths,
                 CAST(COUNT(*) AS BIGINT) AS _m
          FROM u GROUP BY duration_days
        ),
        sized AS (
          SELECT duration_days, n_deaths,
                 CAST(SUM(_m) OVER (ORDER BY duration_days
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_at_risk
          FROM day
        ),
        hz AS (
          SELECT *,
                 CASE WHEN n_deaths < n_at_risk THEN
                   CAST(round(ln(1e0 - CAST(n_deaths AS DOUBLE)
                     / n_at_risk) * 1000000000) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS _lnq
          FROM sized
        ),
        cum AS (
          SELECT duration_days, n_at_risk, n_deaths,
                 CAST(SUM(_lnq) OVER (ORDER BY duration_days)
                   AS BIGINT) AS _cum,
                 MAX(CASE WHEN n_deaths = n_at_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY duration_days) AS _out
          FROM hz
        )
        SELECT duration_days, n_at_risk, n_deaths,
               CASE WHEN _out = 1 THEN 0e0
                    ELSE round(exp(CAST(_cum AS DOUBLE) / 1000000000.0), 9)
               END AS survival
        FROM cum WHERE n_deaths > 0
        """

    _rhl_ln2 = repr(__import__("math").log(2.0))
    sql["ev_retention_halflife"] = f"""
        WITH cm AS ({sql["ev_cohort_matrix"]}),
        pooled AS (
          SELECT CAST(week_n AS BIGINT) AS k,
                 CAST(SUM(retained) AS BIGINT) AS ret,
                 CAST(SUM(cohort_size) AS BIGINT) AS size
          FROM cm WHERE week_n >= 1 GROUP BY week_n
          HAVING SUM(retained) > 0 AND SUM(cohort_size) > 0
        ),
        pts AS (
          SELECT k,
                 CAST(round(ln(CAST(ret AS DOUBLE) / size)
                     * 1000000000) AS BIGINT) AS yq
          FROM pooled
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_ages,
                 CAST(SUM(k) AS BIGINT) AS sx,
                 CAST(SUM(yq) AS BIGINT) AS sy,
                 CAST(SUM(k * yq) AS BIGINT) AS sxy,
                 CAST(SUM(k * k) AS BIGINT) AS sxx
          FROM pts
        )
        SELECT n_ages, sx, sy, sxy, sxx,
               {_RHL_S} AS slope_per_week,
               CASE WHEN {_RHL_S} < 0 THEN {_rhl_ln2} / (-({_RHL_S}))
               ELSE -1e0 END AS halflife_weeks
        FROM g WHERE n_ages >= 2
        """

    sql["doc_langid_confusion"] = f"""
        WITH pred AS (
          SELECT lang, predicted_lang FROM ({sql["doc_lang_id"]})
        ),
        per_lang AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
          FROM pred GROUP BY lang
        ),
        cells AS (
          SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM pred GROUP BY lang, predicted_lang
        )
        SELECT c.lang, c.predicted_lang, c.n,
               CAST(c.n AS DOUBLE) / CAST(p.n_lang AS DOUBLE) AS share
        FROM cells c JOIN per_lang p ON c.lang = p.lang
        """

    sql["ts_change_points"] = with_views(
        f"""
        WITH cum AS (
          SELECT channel, ts,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
                 SUM(CAST(round(value * {CORR_QUANT}) AS BIGINT)) OVER
                   (PARTITION BY channel ORDER BY ts, value
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
                 COUNT(*) OVER (PARTITION BY channel) AS n,
                 SUM(CAST(round(value * {CORR_QUANT}) AS BIGINT)) OVER
                   (PARTITION BY channel) AS s_n
          FROM samples
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value)
        ),
        dev AS (
          SELECT channel, ts, i, CAST(n AS BIGINT) AS n, s_i, s_n,
                 -- DuckDB promotes BIGINT*BIGINT to HUGEINT; Spark's result
                 -- is LONG — cast back so the compared dtypes agree.
                 CAST(CAST(n AS BIGINT) * s_i - i * s_n AS BIGINT) AS dev_scaled
          FROM cum WHERE i < n
        ),
        best AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY channel
                      ORDER BY abs(dev_scaled) DESC, ts) AS _rk
          FROM dev
        )
        SELECT channel, ts, i AS split_i, n, dev_scaled,
               (CAST(s_n - s_i AS DOUBLE) / CAST(n - i AS DOUBLE)
                - CAST(s_i AS DOUBLE) / CAST(i AS DOUBLE)) / {CORR_QUANT} AS shift
        FROM best WHERE _rk = 1
        """,
        "samples",
    )

    sql["stream_quality_profile"] = with_views(
        """
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(SUM(CASE WHEN value < 1e3 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
               CAST(SUM(CASE WHEN value > 1e5 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               MIN(ts) AS ts_min, MAX(ts) AS ts_max,
               MIN(value) AS v_min, MAX(value) AS v_max
        FROM samples GROUP BY channel
        """,
        "samples",
    )

    sql["doc_dedup_stats"] = """
        WITH per_digest AS (
          SELECT source, md5(text) AS digest, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY source, md5(text)
        )
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_unique,
               CAST(SUM(c) - COUNT(*) AS BIGINT) AS n_dups,
               CAST(SUM(c) - COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_rate
        FROM per_digest GROUP BY source
        """

    sql["ts_seasonal_outliers"] = with_views(
        f"""
        WITH keyed AS (
          SELECT channel, (ts // {86_400_000_000}) % 7 AS phase, ts, value
          FROM samples
        ),
        m1 AS ({_pmed_sql('keyed')}),
        med AS (SELECT channel, phase, {_mad_pct} AS median FROM m1),
        dev AS (
          SELECT k.channel, k.phase, k.ts,
                 abs(k.value - med.median) AS value
          FROM keyed k JOIN med
            ON k.channel = med.channel AND k.phase = med.phase
        ),
        m2 AS ({_pmed_sql('dev')}),
        madt AS (SELECT channel, phase, {_mad_pct} AS mad FROM m2),
        j AS (
          SELECT k.channel, k.phase, k.ts, k.value, med.median, madt.mad
          FROM keyed k
          JOIN med ON k.channel = med.channel AND k.phase = med.phase
          JOIN madt ON k.channel = madt.channel AND k.phase = madt.phase
        )
        SELECT channel, phase, ts, value,
               0.6745e0 * (value - median) / mad AS mz
        FROM j
        WHERE mad > 0
          AND abs(round(0.6745e0 * (value - median) / mad, 9))
              > {SEASONAL_Z}
        """,
        "samples",
    )

    sql["ts_mad_outliers"] = with_views(
        f"""
        WITH m1 AS ({_med_sql('chan_events')}),
        med AS (SELECT channel, {_mad_pct} AS median FROM m1),
        dev AS (
          SELECT e.channel, e.ts, abs(e.value - med.median) AS value
          FROM chan_events e JOIN med ON e.channel = med.channel
        ),
        m2 AS ({_med_sql('dev')}),
        madt AS (SELECT channel, {_mad_pct} AS mad FROM m2),
        j AS (
          SELECT e.channel, e.ts, e.value, med.median, madt.mad
          FROM chan_events e
          JOIN med ON e.channel = med.channel
          JOIN madt ON e.channel = madt.channel
        )
        SELECT channel, ts, value,
               0.6745e0 * (value - median) / mad AS mz
        FROM j
        WHERE mad > 0
          AND abs(round(0.6745e0 * (value - median) / mad, 9))
              > {MADZ_THRESHOLD}
        """,
        "chan_events",
    )

    # --- round-4c event analytics ------------------------------------
    _DAYU = 86_400 * US
    _WEEKU = 7 * _DAYU
    sql["ev_user_sessions"] = f"""
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id FROM events
        ),
        flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER w > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END AS new_sess
          FROM ue
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        keyed AS (
          SELECT user_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(ts) - MIN(ts) AS duration_us
        FROM keyed GROUP BY user_id, sess
        """

    _ss_parts = []
    for _p in (0.5, 0.9, 0.99):
        _nm = f"p{str(_p).replace('0.', '').ljust(2, '0')}"
        _idx = f"CAST(floor(CAST({_p!r} AS DOUBLE) * (t.n - 1)) AS BIGINT)"
        _nxt = f"least({_idx} + 1, t.n - 1)"
        _ss_parts.append(
            f"MAX(CASE WHEN r.r0 = {_idx} THEN r.duration_us END)"
            f" AS _lo_{_nm}, "
            f"MAX(CASE WHEN r.r0 = {_nxt} THEN r.duration_us END)"
            f" AS _hi_{_nm}"
        )
    _ss_posts = ", ".join(
        f"_lo_p{_n} + (_hi_p{_n} - _lo_p{_n}) * "
        f"(CAST({_p!r} AS DOUBLE) * (n_sessions - 1) "
        f"- floor(CAST({_p!r} AS DOUBLE) * (n_sessions - 1))) AS p{_n}"
        for _p, _n in ((0.5, "50"), (0.9, "90"), (0.99, "99"))
    )
    sql["ev_session_stats"] = f"""
        WITH s AS (SELECT * FROM ({sql["ev_user_sessions"]})),
        t AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(duration_us) AS BIGINT) AS sdur
          FROM s
        ),
        r AS (
          SELECT duration_us,
                 ROW_NUMBER() OVER (ORDER BY duration_us, user_id,
                                    session_start) - 1 AS r0
          FROM s
        ),
        sel AS (
          SELECT t.n AS n_sessions, t.sdur AS _sdur,
                 {", ".join(_ss_parts)}
          FROM r, t GROUP BY t.n, t.sdur
        )
        SELECT n_sessions,
               CAST(_sdur AS DOUBLE) / n_sessions AS mean_us,
               {_ss_posts}
        FROM sel
        """

    sql["ev_user_entropy"] = """
        WITH c AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY user_id, event_type
        ),
        per AS (
          SELECT user_id,
                 CAST(SUM(c) AS BIGINT) AS n_events,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE))
                     * 1000000000) AS BIGINT)) AS BIGINT) AS sq
          FROM c GROUP BY user_id
        ),
        h AS (
          SELECT user_id, n_events, n_types,
                 CAST(round(ln(CAST(n_events AS DOUBLE)) * 1000000000)
                     AS BIGINT) * n_events - sq AS h_nn_scaled
          FROM per
        )
        SELECT user_id, n_events, n_types,
               CAST(h_nn_scaled AS DOUBLE) / (1000000000.0 * n_events)
                 AS entropy,
               CASE WHEN n_types > 1 THEN
                 CAST(h_nn_scaled AS DOUBLE) / (CAST(n_events AS DOUBLE)
                 * CAST(round(ln(CAST(n_types AS DOUBLE)) * 1000000000)
                   AS BIGINT)) END AS norm_entropy
        FROM h
        """

    _cl_parts = []
    for _p in (0.5, 0.9):
        _nm = f"p{str(_p).replace('0.', '').ljust(2, '0')}"
        _idx = f"CAST(floor(CAST({_p!r} AS DOUBLE) * (t.n - 1)) AS BIGINT)"
        _nxt = f"least({_idx} + 1, t.n - 1)"
        _cl_parts.append(
            f"MAX(CASE WHEN r.r0 = {_idx} THEN r.lag_us END)"
            f" AS _lo_{_nm}, "
            f"MAX(CASE WHEN r.r0 = {_nxt} THEN r.lag_us END)"
            f" AS _hi_{_nm}"
        )
    _cl_posts = ", ".join(
        f"_lo_p{_n} + (_hi_p{_n} - _lo_p{_n}) * "
        f"(CAST({_p!r} AS DOUBLE) * (n_converted - 1) "
        f"- floor(CAST({_p!r} AS DOUBLE) * (n_converted - 1))) AS p{_n}"
        for _p, _n in ((0.5, "50"), (0.9, "90"))
    )
    sql["ev_conversion_lag"] = f"""
        WITH per AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(ts) END)
                 - MIN(epoch_us(ts)) AS lag_us
          FROM events GROUP BY user_id
          HAVING MIN(CASE WHEN event_type = 'purchase'
                     THEN epoch_us(ts) END) IS NOT NULL
        ),
        t AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(lag_us) AS BIGINT) AS slag
          FROM per
        ),
        r AS (
          SELECT lag_us,
                 ROW_NUMBER() OVER (ORDER BY lag_us, user_id) - 1 AS r0
          FROM per
        ),
        sel AS (
          SELECT t.n AS n_converted, t.slag AS _slag,
                 {", ".join(_cl_parts)}
          FROM r, t GROUP BY t.n, t.slag
        )
        SELECT n_converted,
               CAST(_slag AS DOUBLE) / n_converted AS mean_us,
               {_cl_posts}
        FROM sel
        """

    sql["ev_event_transitions"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events
        ),
        seq AS (
          SELECT event_type AS src_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS dst_type
          FROM ue
        )
        SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE dst_type IS NOT NULL
        GROUP BY src_type, dst_type
        ORDER BY n_transitions DESC, src_type, dst_type
        LIMIT 20
        """

    sql["ev_markov_entropy"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events WHERE event_type IS NOT NULL
        ),
        seq AS (
          SELECT event_type AS src_type,
                 LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS dst_type
          FROM ue
        ),
        c AS (
          SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS c
          FROM seq WHERE dst_type IS NOT NULL
          GROUP BY src_type, dst_type
        ),
        n AS (
          SELECT src_type, CAST(SUM(c) AS BIGINT) AS n_out,
                 CAST(COUNT(*) AS BIGINT) AS distinct_dst
          FROM c GROUP BY src_type
        ),
        hq AS (
          -- HUGEINT product: c can reach 1e9+ where c*|ln p|*1e9
          -- exceeds 2^63 (the Spark side sums in DECIMAL(38,0))
          SELECT c.src_type,
                 SUM(CAST(c.c AS HUGEINT)
                     * CAST(round(ln(CAST(c.c AS DOUBLE) / n.n_out)
                                  * 1000000000) AS BIGINT)) AS hq
          FROM c JOIN n USING (src_type) GROUP BY c.src_type
        )
        SELECT n.src_type, n.n_out, n.distinct_dst,
               -(CAST(hq.hq AS DOUBLE) / 1000000000) / n.n_out AS entropy
        FROM n JOIN hq USING (src_type)
        """

    from pennsieve_streaming_spark.operators.analytics import (
        SRM_CHI2 as _SRM_CHI2,
        SRM_CRIT as _SRM_CRIT,
    )

    from pennsieve_streaming_spark.operators.analytics import (
        PW_MDE as _PW_MDE,
        PW_RATE as _PW_RATE,
        PW_REQ_N as _PW_REQ,
    )

    sql["ev_ab_power"] = f"""
        WITH conv AS (
          SELECT event_type,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_conv
          FROM events GROUP BY event_type
        ),
        total AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events
        )
        SELECT event_type, n_users, n_conv,
               {_PW_RATE} AS base_rate,
               {_PW_MDE} AS mde_abs,
               {_PW_REQ} AS required_n_per_variant
        FROM conv CROSS JOIN total
        """

    sql["ev_ab_srm"] = f"""
        WITH exposed AS (
          SELECT DISTINCT event_type, user_id FROM events
        ),
        g AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_b,
                 CAST(COUNT(*) AS BIGINT) AS n_total
          FROM exposed GROUP BY event_type
        )
        SELECT event_type, n_a, n_b, n_total,
               {_SRM_CHI2} AS chi2,
               {_SRM_CHI2} > {_SRM_CRIT} AS srm
        FROM g
        """

    sql["ev_ab_conversion"] = """
        WITH pu AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
          FROM events GROUP BY user_id
        ),
        one AS (
          SELECT
            CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN converted ELSE 0 END)
                 AS BIGINT) AS conv_a,
            CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
            CAST(SUM(CASE WHEN ((user_id % 2) + 2) % 2 = 1 THEN converted ELSE 0 END)
                 AS BIGINT) AS conv_b
          FROM pu
        )
        SELECT n_a, conv_a, n_b, conv_b,
               CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / n_a
                 ELSE 0e0 END AS rate_a,
               CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / n_b
                 ELSE 0e0 END AS rate_b,
               CASE WHEN n_a > 0 AND n_b > 0
                     AND conv_a + conv_b > 0
                     AND conv_a + conv_b < n_a + n_b
                    THEN (CAST(conv_a AS DOUBLE) / n_a
                          - CAST(conv_b AS DOUBLE) / n_b)
                    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1e0 / n_a + 1e0 / n_b)) ELSE 0e0 END AS z
        FROM one
        """

    sql["ev_attribution_linear"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events
        ),
        base AS (
          SELECT user_id, ts, event_id, event_type,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS seg
          FROM ue
        ),
        touches AS (
          SELECT user_id, seg, event_type,
                 CAST(COUNT(*) AS BIGINT) AS c_t
          FROM base WHERE event_type <> 'purchase'
          GROUP BY user_id, seg, event_type
        ),
        tn AS (
          SELECT *, CAST(SUM(c_t) OVER (PARTITION BY user_id, seg)
                         AS BIGINT) AS n_seg
          FROM touches
        ),
        j AS (
          SELECT COALESCE(t.event_type, 'none') AS touch_type,
                 COALESCE(t.c_t, 1) AS c_t,
                 COALESCE(t.n_seg, 1) AS n_seg
          FROM (SELECT user_id, seg FROM base
                WHERE event_type = 'purchase') c
          LEFT JOIN tn t ON t.user_id = c.user_id AND t.seg = c.seg
        )
        SELECT touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(c_t * CAST(round(1000000000e0 /
                    CAST(n_seg AS DOUBLE)) AS BIGINT)) AS BIGINT)
                 AS credit_q,
               CAST(SUM(c_t * CAST(round(1000000000e0 /
                    CAST(n_seg AS DOUBLE)) AS BIGINT)) AS DOUBLE)
                 / 1000000000 AS credit
        FROM j GROUP BY touch_type
        """

    sql["ev_gini"] = """
        WITH c AS (
          SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, user_id
        ),
        r AS (
          SELECT event_type, user_id, c,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY c, user_id) AS BIGINT) AS i
          FROM c
        ),
        t AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(c) AS BIGINT) AS total_events,
                 SUM(CAST(2 * i - 1 AS HUGEINT) * c) AS num0,
                 SUM(CAST(c AS HUGEINT)) AS sc
          FROM r GROUP BY event_type
        )
        SELECT event_type, n_users, total_events,
               CAST(num0 - n_users * sc AS DOUBLE)
                 / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
                 AS gini
        FROM t
        """

    from pennsieve_streaming_spark.operators.analytics import (
        AR_CONFIDENCE as _AR_C,
        AR_LIFT as _AR_L,
        AR_SUPPORT as _AR_S,
    )

    sql["ev_assoc_rules"] = f"""
        WITH baskets AS (
          SELECT DISTINCT user_id, event_type FROM events
        ),
        nu AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM baskets
        ),
        item AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
          FROM baskets GROUP BY event_type
        ),
        pairs AS (
          SELECT a.event_type AS antecedent, b.event_type AS consequent,
                 CAST(COUNT(*) AS BIGINT) AS n_ab
          FROM baskets a JOIN baskets b ON a.user_id = b.user_id
          WHERE a.event_type <> b.event_type
          GROUP BY a.event_type, b.event_type
          HAVING COUNT(*) >= 5
        ),
        j AS (
          SELECT p.antecedent, p.consequent, p.n_ab,
                 ia.n_item AS n_a, ib.n_item AS n_b, nu.n_users
          FROM pairs p
          JOIN item ia ON ia.event_type = p.antecedent
          JOIN item ib ON ib.event_type = p.consequent
          CROSS JOIN nu
        )
        SELECT antecedent, consequent, n_ab, n_a, n_b, n_users,
               {_AR_S} AS support,
               {_AR_C} AS confidence,
               {_AR_L} AS lift
        FROM j
        """

    sql["ev_rfm"] = """
        WITH pu AS (
          SELECT user_id,
                 MAX(epoch_us(ts)) AS last_ts,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_q
          FROM events GROUP BY user_id
        ),
        r AS (
          SELECT user_id, frequency, monetary_q,
                 CAST(((SELECT MAX(last_ts) FROM pu) - last_ts)
                      // 86400000000 AS BIGINT) AS recency_days
          FROM pu
        ),
        s AS (
          SELECT *,
                 NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_score,
                 NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
                 NTILE(5) OVER (ORDER BY monetary_q DESC, user_id) AS m_score
          FROM r
        )
        SELECT user_id, recency_days, frequency, monetary_q,
               CAST(monetary_q AS DOUBLE) / 100 AS monetary,
               CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
        FROM s
        """

    sql["ev_inter_event_gaps"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events
        ),
        g AS (
          SELECT event_type,
                 LEAD(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) - ts AS gap
          FROM ue
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
               CAST(MIN(gap) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS avg_gap_us
        FROM g WHERE gap IS NOT NULL
        GROUP BY event_type
        """

    sql["ev_daily_active"] = f"""
        WITH ue AS (SELECT epoch_us(ts) AS ts, user_id FROM events),
        pu AS (
          SELECT (ts // {_DAYU}) * {_DAYU} AS day, user_id,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ue GROUP BY (ts // {_DAYU}) * {_DAYU}, user_id
        )
        SELECT day, CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS active_users
        FROM pu GROUP BY day
        """

    sql["ev_weekly_retention"] = f"""
        WITH uw AS (
          SELECT DISTINCT (epoch_us(ts) // {_WEEKU}) * {_WEEKU} AS week,
                 user_id
          FROM events
        ),
        act AS (
          SELECT week, CAST(COUNT(*) AS BIGINT) AS active
          FROM uw GROUP BY week
        ),
        ret AS (
          SELECT a.week, CAST(COUNT(*) AS BIGINT) AS retained
          FROM uw a JOIN uw b
            ON a.user_id = b.user_id AND b.week = a.week + {_WEEKU}
          GROUP BY a.week
        )
        SELECT act.week, act.active,
               CAST(COALESCE(ret.retained, 0) AS BIGINT) AS retained_next_week
        FROM act LEFT JOIN ret ON act.week = ret.week
        """

    sql["ev_funnel_windowed"] = f"""
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, user_id, event_type FROM events
        ),
        f AS (
          SELECT user_id, MIN(ts) AS t1 FROM ue
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        sa AS (
          SELECT s.user_id, MIN(s.ts) AS t2, MAX(f.t1) AS t1
          FROM ue s JOIN f ON s.user_id = f.user_id
          WHERE s.event_type = 'purchase' AND s.ts > f.t1
          GROUP BY s.user_id
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
                 CAST(COALESCE(SUM(CASE WHEN t2 - t1 <= {FW_WINDOW_US}
                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_converted_window
          FROM sa
        ),
        nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_first_users FROM f)
        SELECT n_first_users,
               CAST(COALESCE(n_converted, 0) AS BIGINT) AS n_converted,
               CAST(COALESCE(n_converted_window, 0) AS BIGINT)
                 AS n_converted_window,
               CASE WHEN n_first_users > 0 THEN
                 CAST(n_converted_window AS DOUBLE) / n_first_users END
                 AS window_rate,
               CASE WHEN n_converted > 0 THEN
                 CAST(n_converted_window AS DOUBLE) / n_converted END
                 AS capture_share
        FROM agg CROSS JOIN nf
        """

    sql["ev_funnel"] = """
        WITH ue AS (
          SELECT epoch_us(ts) AS ts, user_id, event_type FROM events
        ),
        f AS (
          SELECT user_id, MIN(ts) AS t1 FROM ue
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        sa AS (
          SELECT s.user_id, MIN(s.ts) AS t2, MAX(f.t1) AS t1
          FROM ue s JOIN f ON s.user_id = f.user_id
          WHERE s.event_type = 'purchase' AND s.ts > f.t1
          GROUP BY s.user_id
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
                 CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) AS sum_delay_us
          FROM sa
        ),
        nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_first_users FROM f)
        SELECT n_first_users, n_converted, sum_delay_us,
               CASE WHEN n_converted = 0 THEN CAST(0 AS DOUBLE)
                    ELSE CAST(sum_delay_us AS DOUBLE) / n_converted
               END AS avg_delay_us
        FROM agg CROSS JOIN nf
        """

    # --- round-4c PCA chained-iteration replay ------------------------
    import math as _math

    _pca_v0 = round(1.0 / _math.sqrt(ANN_DIM), 9)
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # g/n are each referenced twice per iteration — an 8-iteration
    # chain would re-expand exponentially (observed as a hang).
    _pca_parts = [
        f"it0 AS MATERIALIZED (SELECT UNNEST(generate_series(0, {ANN_DIM - 1})) AS dim, "
        f"CAST({_pca_v0!r} AS DOUBLE) AS v)"
    ]
    for _t in range(PCA_ITERS):
        _pca_parts.append(
            f"vl{_t} AS MATERIALIZED (SELECT list(v ORDER BY dim) AS vl FROM it{_t})"
        )
        _pca_parts.append(f"""d{_t} AS MATERIALIZED (
          SELECT embedding, list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(generate_series(1, {ANN_DIM}),
              i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                   * vl[CAST(i AS INT)])),
            (a, b) -> a + b) AS dot
          FROM embeddings CROSS JOIN vl{_t})""")
        _pca_parts.append(f"""g{_t} AS MATERIALIZED (
          SELECT dim, CAST(SUM(c) AS BIGINT) AS s FROM (
            SELECT UNNEST(generate_series(1, {ANN_DIM})) - 1 AS dim,
                   UNNEST(list_transform(generate_series(1, {ANN_DIM}),
                     i -> CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                          * dot * 1000000) AS BIGINT))) AS c
            FROM d{_t}) GROUP BY dim)""")
        _pca_parts.append(f"""n{_t} AS MATERIALIZED (
          SELECT sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list((CAST(s AS DOUBLE) / 1000000) * (CAST(s AS DOUBLE) / 1000000)
                 ORDER BY dim)),
            (a, b) -> a + b)) AS nrm FROM g{_t})""")
        _pca_parts.append(f"""it{_t + 1} AS MATERIALIZED (
          SELECT dim, round((CAST(s AS DOUBLE) / 1000000) / nrm, 9) AS v
          FROM g{_t} CROSS JOIN n{_t})""")
    sql["emb_pca"] = (
        "WITH " + ",\n".join(_pca_parts)
        + f"\nSELECT CAST(dim AS BIGINT) AS dim, v AS loading, "
        f"round((SELECT nrm FROM n{PCA_ITERS - 1}), 9) AS eigval "
        f"FROM it{PCA_ITERS}"
    )

    _ed = f"CAST(embedding[CAST(i AS INT)] AS DOUBLE)"
    sql["emb_all_but_top"] = (
        "WITH " + ",\n".join(_pca_parts)
        + f""",
        vfin AS MATERIALIZED (
          SELECT list(v ORDER BY dim) AS vl FROM it{PCA_ITERS}
        ),
        pj AS MATERIALIZED (
          SELECT e.vec_id, e.embedding, vfin.vl,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(generate_series(1, {ANN_DIM}),
                     i -> {_ed} * vfin.vl[CAST(i AS INT)])),
                   (a, b) -> a + b) AS dot
          FROM embeddings e CROSS JOIN vfin
        )
        SELECT vec_id, round(dot, 9) AS score,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(generate_series(1, {ANN_DIM}),
                   i -> ({_ed} - dot * vl[CAST(i AS INT)])
                        * ({_ed} - dot * vl[CAST(i AS INT)]))),
                 (a, b) -> a + b), 9) AS resid_norm2
        FROM pj
        """
    )

    # --- round-4c Goertzel band-power recursive replay ----------------
    from pennsieve_streaming_spark.dsp.spectral import goertzel_coeff

    def _dblit(x: float) -> str:
        # exponent notation forces DuckDB to type the literal DOUBLE
        # (a bare decimal literal parses as DECIMAL, and DECIMAL*DOUBLE
        # arithmetic would diverge from the engine's recurrence)
        r = repr(float(x))
        return r if ("e" in r or "E" in r) else r + "e0"

    _bp_vals = ", ".join(
        f"({_dblit(f)}, {_dblit(goertzel_coeff(f, BW_RATE))})" for f in BP_FREQS
    )
    from pennsieve_streaming_spark.dsp.spectral import dft_tables

    _ps_cos, _ps_sin = dft_tables(PS_BINS, PS_WINDOW)
    _ps_cos_lit = "[" + ", ".join(_dblit(c) for c in _ps_cos) + "]::DOUBLE[]"
    _ps_sin_lit = "[" + ", ".join(_dblit(s) for s in _ps_sin) + "]::DOUBLE[]"
    sql["ts_power_spectrum"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        tabs AS (SELECT {_ps_cos_lit} AS cos_t, {_ps_sin_lit} AS sin_t),
        rk AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE ts <= {BW_TS_END}
        ),
        ex AS (
          SELECT channel, rn // {PS_WINDOW} AS win, rn % {PS_WINDOW} AS pos,
                 value, UNNEST(generate_series(1, {PS_BINS})) AS bin
          FROM rk
        ),
        ct AS (
          SELECT e.channel, e.win, CAST(e.bin AS BIGINT) AS bin,
                 CAST(round(e.value * t.cos_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS ci,
                 CAST(round(e.value * t.sin_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS si
          FROM ex e CROSS JOIN tabs t
        ),
        agg AS (
          SELECT channel, win, bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ci) AS BIGINT) AS sc, CAST(SUM(si) AS BIGINT) AS ss
          FROM ct GROUP BY channel, win, bin
        )
        SELECT channel, win, bin, n,
               CAST(CAST(sc AS HUGEINT) * sc + CAST(ss AS HUGEINT) * ss
                    AS VARCHAR) AS energy_q2,
               (CAST(sc AS DOUBLE) / {PS_QUANT}) * (CAST(sc AS DOUBLE) / {PS_QUANT})
                 + (CAST(ss AS DOUBLE) / {PS_QUANT}) * (CAST(ss AS DOUBLE) / {PS_QUANT}) AS power
        FROM agg WHERE n = {PS_WINDOW}
        """

    _pac_pw = (
        f"(CAST(fc AS DOUBLE) / {PS_QUANT}) * (CAST(fc AS DOUBLE) / {PS_QUANT}) "
        f"+ (CAST(fs AS DOUBLE) / {PS_QUANT}) * (CAST(fs AS DOUBLE) / {PS_QUANT})"
    )
    _pac_ln8 = "2.0794415416798357"
    sql["ts_spectral_slope"] = f"""
        WITH ps AS ({sql["ts_power_spectrum"]}),
        pq AS (
          SELECT channel, bin, CAST(round(power) AS BIGINT) AS pq
          FROM ps
        ),
        g AS (
          SELECT channel, bin, CAST(COUNT(*) AS BIGINT) AS nw,
                 CAST(SUM(pq) AS BIGINT) AS sp
          FROM pq GROUP BY channel, bin
        ),
        piv AS (
          SELECT channel, CAST(MAX(nw) AS BIGINT) AS n_windows, CAST(MAX(CASE WHEN bin = 1 THEN sp END) AS BIGINT) AS _s1, CAST(MAX(CASE WHEN bin = 2 THEN sp END) AS BIGINT) AS _s2, CAST(MAX(CASE WHEN bin = 3 THEN sp END) AS BIGINT) AS _s3, CAST(MAX(CASE WHEN bin = 4 THEN sp END) AS BIGINT) AS _s4, CAST(MAX(CASE WHEN bin = 5 THEN sp END) AS BIGINT) AS _s5, CAST(MAX(CASE WHEN bin = 6 THEN sp END) AS BIGINT) AS _s6, CAST(MAX(CASE WHEN bin = 7 THEN sp END) AS BIGINT) AS _s7, CAST(MAX(CASE WHEN bin = 8 THEN sp END) AS BIGINT) AS _s8
          FROM g GROUP BY channel
        )
        SELECT channel, n_windows,
               round(-0.38274374502043595 * ln((CAST(_s1 + 1 AS DOUBLE) / n_windows)) + -0.18260593680948164 * ln((CAST(_s2 + 1 AS DOUBLE) / n_windows)) + -0.06553282402955064 * ln((CAST(_s3 + 1 AS DOUBLE) / n_windows)) + 0.01753187140147264 * ln((CAST(_s4 + 1 AS DOUBLE) / n_windows)) + 0.08196185471375746 * ln((CAST(_s5 + 1 AS DOUBLE) / n_windows)) + 0.13460498418140363 * ln((CAST(_s6 + 1 AS DOUBLE) / n_windows)) + 0.17911411595040735 * ln((CAST(_s7 + 1 AS DOUBLE) / n_windows)) + 0.2176696796124269 * ln((CAST(_s8 + 1 AS DOUBLE) / n_windows)), 9) AS slope,
               round(-(-0.38274374502043595 * ln((CAST(_s1 + 1 AS DOUBLE) / n_windows)) + -0.18260593680948164 * ln((CAST(_s2 + 1 AS DOUBLE) / n_windows)) + -0.06553282402955064 * ln((CAST(_s3 + 1 AS DOUBLE) / n_windows)) + 0.01753187140147264 * ln((CAST(_s4 + 1 AS DOUBLE) / n_windows)) + 0.08196185471375746 * ln((CAST(_s5 + 1 AS DOUBLE) / n_windows)) + 0.13460498418140363 * ln((CAST(_s6 + 1 AS DOUBLE) / n_windows)) + 0.17911411595040735 * ln((CAST(_s7 + 1 AS DOUBLE) / n_windows)) + 0.2176696796124269 * ln((CAST(_s8 + 1 AS DOUBLE) / n_windows))), 9) AS alpha
        FROM piv
        """

    sql["ts_pac"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        tabs AS (SELECT {_ps_cos_lit} AS cos_t, {_ps_sin_lit} AS sin_t),
        ex AS (
          SELECT channel, rn // {PS_WINDOW} AS win, rn % {PS_WINDOW} AS pos,
                 value, UNNEST([{PAC_SLOW}, {PAC_FAST}]) AS bin
          FROM rk
        ),
        ct AS (
          SELECT e.channel, e.win, CAST(e.bin AS BIGINT) AS bin,
                 CAST(round(e.value * t.cos_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS ci,
                 CAST(round(e.value * t.sin_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS si
          FROM ex e CROSS JOIN tabs t
        ),
        agg AS (
          SELECT channel, win, bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ci) AS BIGINT) AS sc, CAST(SUM(si) AS BIGINT) AS ss
          FROM ct GROUP BY channel, win, bin
        ),
        pv AS (
          SELECT channel, win,
                 MAX(CASE WHEN bin = {PAC_SLOW} THEN sc END) AS re,
                 MAX(CASE WHEN bin = {PAC_SLOW} THEN ss END) AS im,
                 MAX(CASE WHEN bin = {PAC_FAST} THEN sc END) AS fc,
                 MAX(CASE WHEN bin = {PAC_FAST} THEN ss END) AS fs
          FROM agg WHERE n = {PS_WINDOW} GROUP BY channel, win
        ),
        oc AS (
          SELECT channel,
                 CAST(CASE WHEN im < 0 THEN 4 ELSE 0 END
                    + CASE WHEN re < 0 THEN 2 ELSE 0 END
                    + CASE WHEN abs(im) > abs(re) THEN 1 ELSE 0 END
                   AS BIGINT) AS octant,
                 CAST(round({_pac_pw}) AS BIGINT) AS aq
          FROM pv
        ),
        om AS (
          SELECT channel, octant, CAST(COUNT(*) AS BIGINT) AS nw,
                 CAST(SUM(aq) AS BIGINT) AS mq
          FROM oc WHERE aq > 0 GROUP BY channel, octant
        ),
        gg AS (
          SELECT channel, CAST(SUM(nw) AS BIGINT) AS n_windows_used,
                 CAST(COUNT(*) AS BIGINT) AS n_octants_nz,
                 CAST(SUM(mq) AS BIGINT) AS total_aq
          FROM om GROUP BY channel
        ),
        h AS (
          SELECT o.channel,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list((CAST(o.mq AS DOUBLE) / CAST(g.total_aq AS DOUBLE))
                        * round(ln(CAST(o.mq AS DOUBLE)
                                   / CAST(g.total_aq AS DOUBLE)), 9)
                        ORDER BY o.octant)), (a, b) -> a + b) AS acc
          FROM om o JOIN gg g USING (channel)
          GROUP BY o.channel
        )
        SELECT g.channel, g.n_windows_used, g.n_octants_nz, g.total_aq,
               round(({_pac_ln8} - -h.acc) / {_pac_ln8}, 9) AS mi
        FROM gg g JOIN h USING (channel)
        """,
        "samples",
    )

    sql["ts_band_bursts"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        tabs AS (SELECT {_ps_cos_lit} AS cos_t, {_ps_sin_lit} AS sin_t),
        ex AS (
          SELECT channel, rn // {PS_WINDOW} AS win, rn % {PS_WINDOW} AS pos,
                 value
          FROM rk
        ),
        ct AS (
          SELECT e.channel, e.win,
                 CAST(round(e.value * t.cos_t[({BB_BIN} - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS ci,
                 CAST(round(e.value * t.sin_t[({BB_BIN} - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS si
          FROM ex e CROSS JOIN tabs t
        ),
        agg AS (
          SELECT channel, win, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ci) AS BIGINT) AS sc, CAST(SUM(si) AS BIGINT) AS ss
          FROM ct GROUP BY channel, win
        ),
        pw AS (
          SELECT channel, win,
                 CAST(round((CAST(sc AS DOUBLE) / {PS_QUANT})
                     * (CAST(sc AS DOUBLE) / {PS_QUANT})
                     + (CAST(ss AS DOUBLE) / {PS_QUANT})
                     * (CAST(ss AS DOUBLE) / {PS_QUANT})) AS BIGINT) AS pq
          FROM agg WHERE n = {PS_WINDOW}
        ),
        rkd AS (
          SELECT channel, win, pq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY pq, win) AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS nw
          FROM pw
        ),
        med AS (
          SELECT channel, CAST(MAX(pq) AS BIGINT) AS med_pq
          FROM rkd WHERE rn = (nw + 1) // 2 GROUP BY channel
        ),
        hot AS (
          SELECT p.channel, p.win, p.pq, m.med_pq
          FROM pw p JOIN med m ON p.channel = m.channel
          WHERE p.pq > {BB_MULT} * m.med_pq
        ),
        isl AS (
          SELECT channel, win, pq, med_pq,
                 win - ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY win) AS grp
          FROM hot
        )
        SELECT channel, CAST(MIN(win) AS BIGINT) AS start_win,
               CAST(MAX(win) AS BIGINT) AS end_win,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(MAX(pq) AS BIGINT) AS max_pq,
               CAST(MAX(med_pq) AS BIGINT) AS med_pq
        FROM isl GROUP BY channel, grp
        HAVING COUNT(*) >= {BB_MINW}
        """,
        "samples",
    )

    _th_bins = ", ".join(
        str(TH_FUND * h) for h in range(1, TH_NHARM + 1)
    )
    sql["ts_harmonics"] = f"""
        WITH ps AS (
          SELECT channel, win, bin, CAST(round(power) AS BIGINT) AS pq
          FROM ({sql["ts_power_spectrum"]})
          WHERE bin IN ({_th_bins})
        ),
        g AS (
          SELECT channel, win,
                 CAST(SUM(CASE WHEN bin = {TH_FUND} THEN pq ELSE 0 END)
                      AS BIGINT) AS fund_pq,
                 CAST(SUM(CASE WHEN bin <> {TH_FUND} THEN pq ELSE 0 END)
                      AS BIGINT) AS harm_pq
          FROM ps GROUP BY channel, win
        )
        SELECT channel, win, fund_pq, harm_pq,
               CASE WHEN fund_pq > 0 THEN
                 round(sqrt(CAST(harm_pq AS DOUBLE)
                            / CAST(fund_pq AS DOUBLE)), 9) END AS thd
        FROM g
        """

    # SEF95: casts the gated spectrum's stringified exact energies
    # back to HUGEINT; the edge test is integer cross-multiplication.
    sql["ts_spectral_edge"] = f"""
        WITH ps AS ({sql["ts_power_spectrum"]}),
        e AS (
          SELECT channel, win, bin,
                 CAST(energy_q2 AS HUGEINT) AS eq
          FROM ps
        ),
        c AS (
          SELECT channel, win, bin,
                 SUM(eq) OVER (PARTITION BY channel, win ORDER BY bin
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 SUM(eq) OVER (PARTITION BY channel, win) AS tot
          FROM e
        )
        SELECT channel, win, CAST({PS_BINS} AS BIGINT) AS n_bins,
               CAST(MIN(bin) AS BIGINT) AS sef_bin
        FROM c WHERE tot > 0 AND cum * 20 >= tot * 19
        GROUP BY channel, win
        """

    # --- spectral entropy: power-spectrum replay + nano-nat weights --
    sql["ts_spectral_entropy"] = f"""
        WITH pq AS (
          SELECT channel, win, CAST(round(power) AS BIGINT) AS pq
          FROM ({sql["ts_power_spectrum"]})
          WHERE CAST(round(power) AS BIGINT) > 0
        ),
        g AS (
          SELECT channel, win, CAST(COUNT(*) AS BIGINT) AS n_bins_nz,
                 CAST(SUM(pq) AS BIGINT) AS total_pq
          FROM pq GROUP BY channel, win
        ),
        h AS (
          -- SEQUENTIAL pq-ordered fold (unigram_lm's class): the
          -- same term order as the Spark array_sort+aggregate fold
          SELECT p.channel, p.win,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list((CAST(p.pq AS DOUBLE) / CAST(g.total_pq AS DOUBLE))
                        * round(ln(CAST(p.pq AS DOUBLE)
                                   / CAST(g.total_pq AS DOUBLE)), 9)
                        ORDER BY p.pq)), (a, b) -> a + b) AS acc
          FROM pq p JOIN g USING (channel, win)
          GROUP BY p.channel, p.win
        )
        SELECT g.channel, g.win, g.n_bins_nz, g.total_pq,
               -h.acc AS entropy
        FROM g JOIN h USING (channel, win)
        """

    # --- magnitude-squared coherence: shared DFT-sum replay, paired
    # channels, per-window BIGINT cross terms, exact window average --
    _coh_d = f"CAST({{0}} AS DOUBLE) / {PS_QUANT}"
    _c_sca, _c_ssa = _coh_d.format("sc_a"), _coh_d.format("ss_a")
    _c_scb, _c_ssb = _coh_d.format("sc_b"), _coh_d.format("ss_b")
    sql["ts_coherence"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        tabs AS (SELECT {_ps_cos_lit} AS cos_t, {_ps_sin_lit} AS sin_t),
        rk AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE ts <= {BW_TS_END}
        ),
        ex AS (
          SELECT channel, rn // {PS_WINDOW} AS win, rn % {PS_WINDOW} AS pos,
                 value, UNNEST(generate_series(1, {PS_BINS})) AS bin
          FROM rk
        ),
        ct AS (
          SELECT e.channel, e.win, CAST(e.bin AS BIGINT) AS bin,
                 CAST(round(e.value * t.cos_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS ci,
                 CAST(round(e.value * t.sin_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS si
          FROM ex e CROSS JOIN tabs t
        ),
        agg AS (
          SELECT channel, win, bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ci) AS BIGINT) AS sc, CAST(SUM(si) AS BIGINT) AS ss
          FROM ct GROUP BY channel, win, bin
        ),
        j AS (
          SELECT a.bin,
                 CAST(round(({_c_sca}) * ({_c_scb})
                          + ({_c_ssa}) * ({_c_ssb})) AS BIGINT) AS re_q,
                 CAST(round(({_c_ssa}) * ({_c_scb})
                          - ({_c_sca}) * ({_c_ssb})) AS BIGINT) AS im_q,
                 CAST(round(({_c_sca}) * ({_c_sca})
                          + ({_c_ssa}) * ({_c_ssa})) AS BIGINT) AS pa_q,
                 CAST(round(({_c_scb}) * ({_c_scb})
                          + ({_c_ssb}) * ({_c_ssb})) AS BIGINT) AS pb_q
          FROM (SELECT win, bin, sc AS sc_a, ss AS ss_a FROM agg
                WHERE channel = 'lead' AND n = {PS_WINDOW}) a
          JOIN (SELECT win, bin, sc AS sc_b, ss AS ss_b FROM agg
                WHERE channel = 'sec' AND n = {PS_WINDOW}) b
            USING (win, bin)
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(re_q) AS BIGINT) AS sum_re_q,
               CAST(SUM(im_q) AS BIGINT) AS sum_im_q,
               CAST(SUM(pa_q) AS BIGINT) AS sum_pa_q,
               CAST(SUM(pb_q) AS BIGINT) AS sum_pb_q,
               CASE WHEN SUM(pa_q) <= 0 OR SUM(pb_q) <= 0
                    THEN CAST(NULL AS DOUBLE) ELSE
               (CAST(SUM(re_q) AS DOUBLE) * CAST(SUM(re_q) AS DOUBLE)
                + CAST(SUM(im_q) AS DOUBLE) * CAST(SUM(im_q) AS DOUBLE))
               / (CAST(SUM(pa_q) AS DOUBLE) * CAST(SUM(pb_q) AS DOUBLE))
               END AS coherence
        FROM j GROUP BY bin
        """

    _plv_mag = (
        "sqrt(CAST(re_q AS DOUBLE) * CAST(re_q AS DOUBLE) "
        "+ CAST(im_q AS DOUBLE) * CAST(im_q AS DOUBLE))"
    )
    sql["ts_plv"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        tabs AS (SELECT {_ps_cos_lit} AS cos_t, {_ps_sin_lit} AS sin_t),
        rk AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE ts <= {BW_TS_END}
        ),
        ex AS (
          SELECT channel, rn // {PS_WINDOW} AS win, rn % {PS_WINDOW} AS pos,
                 value, UNNEST(generate_series(1, {PS_BINS})) AS bin
          FROM rk
        ),
        ct AS (
          SELECT e.channel, e.win, CAST(e.bin AS BIGINT) AS bin,
                 CAST(round(e.value * t.cos_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS ci,
                 CAST(round(e.value * t.sin_t[(e.bin - 1) * {PS_WINDOW} + e.pos + 1] * {PS_QUANT}) AS BIGINT) AS si
          FROM ex e CROSS JOIN tabs t
        ),
        agg AS (
          SELECT channel, win, bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ci) AS BIGINT) AS sc, CAST(SUM(si) AS BIGINT) AS ss
          FROM ct GROUP BY channel, win, bin
        ),
        j AS (
          SELECT a.bin,
                 CAST(round(({_c_sca}) * ({_c_scb})
                          + ({_c_ssa}) * ({_c_ssb})) AS BIGINT) AS re_q,
                 CAST(round(({_c_ssa}) * ({_c_scb})
                          - ({_c_sca}) * ({_c_ssb})) AS BIGINT) AS im_q
          FROM (SELECT win, bin, sc AS sc_a, ss AS ss_a FROM agg
                WHERE channel = 'lead' AND n = {PS_WINDOW}) a
          JOIN (SELECT win, bin, sc AS sc_b, ss AS ss_b FROM agg
                WHERE channel = 'sec' AND n = {PS_WINDOW}) b
            USING (win, bin)
        ),
        u AS (
          SELECT bin,
                 CAST(round(CAST(re_q AS DOUBLE) / ({_plv_mag})
                      * 1000000000) AS BIGINT) AS ure_q,
                 CAST(round(CAST(im_q AS DOUBLE) / ({_plv_mag})
                      * 1000000000) AS BIGINT) AS uim_q
          FROM j WHERE NOT (re_q = 0 AND im_q = 0)
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(ure_q) AS BIGINT) AS sum_ure_q,
               CAST(SUM(uim_q) AS BIGINT) AS sum_uim_q,
               sqrt(CAST(SUM(ure_q) AS DOUBLE) * CAST(SUM(ure_q) AS DOUBLE)
                + CAST(SUM(uim_q) AS DOUBLE) * CAST(SUM(uim_q) AS DOUBLE))
               / (CAST(COUNT(*) AS DOUBLE) * 1000000000) AS plv
        FROM u GROUP BY bin
        """

    _dtw_inf = 1 << 62
    sql["ts_dtw_distance"] = f"""
        WITH RECURSIVE samples AS ({TBL.DUCKDB_VIEWS['samples']}),
        rk AS (
          SELECT channel,
                 CAST(round(value * {DTW_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        paa AS (
          SELECT channel, rn // {DTW_SEG_LEN} AS seg,
                 CAST(round(CAST(SUM(xq) AS DOUBLE) / {DTW_SEG_LEN})
                      AS BIGINT) AS pq
          FROM rk WHERE rn < {DTW_SEG_LEN * DTW_MAX_SEGS}
          GROUP BY channel, rn // {DTW_SEG_LEN}
          HAVING COUNT(*) = {DTW_SEG_LEN}
        ),
        arrs AS (
          SELECT channel, list(pq ORDER BY seg) AS vals,
                 CAST(COUNT(*) AS BIGINT) AS n_segs
          FROM paa GROUP BY channel
        ),
        pairs AS (
          SELECT a.channel AS ca, b.channel AS cb,
                 a.n_segs AS la, b.n_segs AS lb,
                 a.vals AS va, b.vals AS vb
          FROM arrs a JOIN arrs b ON a.channel < b.channel
        ),
        rec AS (
          -- cell-by-cell DP walk: state = (i, j) plus the finished
          -- previous DP row and the growing current row (lists are
          -- 1-indexed; position p holds column j = p-1); the virtual
          -- row 0 is [0, INF, ...] giving the standard boundary.
          SELECT ca, cb, la, lb, va, vb,
                 CAST(0 AS BIGINT) AS i, lb AS j,
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(lb),
                     x -> CAST({_dtw_inf} AS BIGINT))) AS prev,
                 CAST(NULL AS BIGINT[]) AS cur
          FROM pairs
          UNION ALL
          SELECT ca, cb, la, lb, va, vb,
                 CASE WHEN j < lb THEN i ELSE i + 1 END AS i,
                 CASE WHEN j < lb THEN j + 1 ELSE CAST(0 AS BIGINT) END
                   AS j,
                 CASE WHEN j < lb THEN prev
                      WHEN i = 0 THEN prev ELSE cur END AS prev,
                 CASE WHEN j < lb THEN list_append(cur,
                        abs(va[i] - vb[j + 1])
                        + least(prev[j + 2], prev[j + 1], cur[j + 1]))
                      ELSE [CAST({_dtw_inf} AS BIGINT)] END AS cur
          FROM rec WHERE NOT (i = la AND j = lb)
        )
        SELECT ca AS channel_a, cb AS channel_b, la, lb,
               cur[lb + 1] AS dtw_q,
               CAST(cur[lb + 1] AS DOUBLE)
                 / ({DTW_QUANT} * CAST(la + lb AS DOUBLE)) AS dtw_norm
        FROM rec WHERE i = la AND j = lb
        """

    sql["ts_band_power"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT value, ROW_NUMBER() OVER (ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE channel = 'lead' AND ts <= {BW_TS_END}
        ),
        wininp AS (
          SELECT CAST(rn // {BP_WINDOW} AS BIGINT) AS win,
                 CAST(rn % {BP_WINDOW} AS BIGINT) AS pos, value AS x
          FROM inp
          WHERE rn < (SELECT (COUNT(*) // {BP_WINDOW}) * {BP_WINDOW} FROM inp)
        ),
        freqs AS (SELECT * FROM (VALUES {_bp_vals}) AS t(freq_hz, c)),
        rec AS (
          SELECT w.win, f.freq_hz, f.c, CAST(-1 AS BIGINT) AS pos,
                 0e0 AS s1, 0e0 AS s2
          FROM (SELECT DISTINCT win FROM wininp) w CROSS JOIN freqs f
          UNION ALL
          SELECT r.win, r.freq_hz, r.c, i.pos,
                 i.x + r.c * r.s1 - r.s2, r.s1
          FROM rec r JOIN wininp i ON i.win = r.win AND i.pos = r.pos + 1
        )
        SELECT 'lead' AS channel, win, freq_hz,
               CAST({BP_WINDOW} AS BIGINT) AS n,
               s1 * s1 + s2 * s2 - c * s1 * s2 AS power
        FROM rec WHERE pos = {BP_WINDOW} - 1
        """

    # --- audio fingerprint: band-power replay + delta/lag/pack --------
    _af_vals = ", ".join(
        f"({_dblit(f)}, {_dblit(goertzel_coeff(f, BW_RATE))}, {i})"
        for i, f in enumerate(AF_FREQS)
    )
    sql["mm_audio_vad"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        gated AS (
          SELECT channel, ts,
                 CASE WHEN (ts // 256000) % 4 = 0
                      THEN value * 10 ELSE value END AS value
          FROM samples_aligned WHERE channel = 'lead'
        ),
        inp AS (
          SELECT channel,
                 CAST(round(value * 1) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS _rn
          FROM gated
        ),
        nch AS (
          SELECT channel, CAST(COUNT(*) // 64 AS BIGINT) AS _nframes
          FROM inp GROUP BY channel
        ),
        en AS (
          SELECT i.channel, CAST(i._rn // 64 AS BIGINT) AS frame,
                 CAST(SUM(xq * xq) AS BIGINT) AS energy_q
          FROM inp i JOIN nch n ON i.channel = n.channel
          WHERE i._rn // 64 < n._nframes
          GROUP BY i.channel, i._rn // 64
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS _n
          FROM en GROUP BY channel
        ),
        med AS (
          SELECT channel, energy_q AS med_q FROM (
            SELECT e.channel, e.energy_q,
                   ROW_NUMBER() OVER (PARTITION BY e.channel
                       ORDER BY e.energy_q, e.frame) AS _ar, c._n
            FROM en e JOIN cnt c ON e.channel = c.channel
          ) WHERE _ar = (_n + 1) // 2
        ),
        active AS (
          SELECT e.channel, e.frame, e.energy_q
          FROM en e JOIN med m ON e.channel = m.channel
          WHERE e.energy_q > 2 * m.med_q
        ),
        seg AS (
          SELECT *, CAST(SUM(_new) OVER (PARTITION BY channel
                     ORDER BY frame) AS BIGINT) AS _seg
          FROM (
            SELECT *, CASE WHEN LAG(frame) OVER (PARTITION BY channel
                             ORDER BY frame) IS NULL
                           OR frame - LAG(frame) OVER (PARTITION BY
                             channel ORDER BY frame) > 2
                           THEN 1 ELSE 0 END AS _new
            FROM active
          )
        )
        SELECT channel,
               CAST(MIN(frame) AS BIGINT) AS start_frame,
               CAST(MAX(frame) AS BIGINT) AS end_frame,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(energy_q) AS BIGINT) AS energy_q,
               CAST(SUM(energy_q) AS DOUBLE)
                 / (COUNT(*) * 64 * CAST(1 AS DOUBLE) * 1)
                 AS mean_energy
        FROM seg GROUP BY channel, _seg
        """

    sql["mm_audio_onsets"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT value, ROW_NUMBER() OVER (ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE channel = 'lead' AND ts <= {BW_TS_END}
        ),
        wininp AS (
          SELECT CAST(rn // {AF_WINDOW} AS BIGINT) AS win,
                 CAST(rn % {AF_WINDOW} AS BIGINT) AS pos, value AS x
          FROM inp
          WHERE rn < (SELECT (COUNT(*) // {AF_WINDOW}) * {AF_WINDOW} FROM inp)
        ),
        freqs AS (SELECT * FROM (VALUES {_af_vals}) AS t(freq_hz, c, band)),
        rec AS (
          SELECT w.win, f.freq_hz, f.c, CAST(f.band AS BIGINT) AS band,
                 CAST(-1 AS BIGINT) AS pos, 0e0 AS s1, 0e0 AS s2
          FROM (SELECT DISTINCT win FROM wininp) w CROSS JOIN freqs f
          UNION ALL
          SELECT r.win, r.freq_hz, r.c, r.band, i.pos,
                 i.x + r.c * r.s1 - r.s2, r.s1
          FROM rec r JOIN wininp i ON i.win = r.win AND i.pos = r.pos + 1
        ),
        bp AS (
          SELECT win, band, s1 * s1 + s2 * s2 - c * s1 * s2 AS power
          FROM rec WHERE pos = {AF_WINDOW} - 1
        ),
        piv AS (
          SELECT win,
                 MAX(CASE WHEN band = 0 THEN power END) AS _p0,
                 MAX(CASE WHEN band = 1 THEN power END) AS _p1,
                 MAX(CASE WHEN band = 2 THEN power END) AS _p2,
                 MAX(CASE WHEN band = 3 THEN power END) AS _p3,
                 MAX(CASE WHEN band = 4 THEN power END) AS _p4,
                 MAX(CASE WHEN band = 5 THEN power END) AS _p5,
                 MAX(CASE WHEN band = 6 THEN power END) AS _p6,
                 MAX(CASE WHEN band = 7 THEN power END) AS _p7,
                 MAX(CASE WHEN band = 8 THEN power END) AS _p8
          FROM bp GROUP BY win
        ),
        lagged AS (
          SELECT win,
                 _p0, _p1, _p2, _p3, _p4, _p5, _p6, _p7, _p8,
                 LAG(_p0) OVER (ORDER BY win) AS _q0,
                 LAG(_p1) OVER (ORDER BY win) AS _q1,
                 LAG(_p2) OVER (ORDER BY win) AS _q2,
                 LAG(_p3) OVER (ORDER BY win) AS _q3,
                 LAG(_p4) OVER (ORDER BY win) AS _q4,
                 LAG(_p5) OVER (ORDER BY win) AS _q5,
                 LAG(_p6) OVER (ORDER BY win) AS _q6,
                 LAG(_p7) OVER (ORDER BY win) AS _q7,
                 LAG(_p8) OVER (ORDER BY win) AS _q8
          FROM piv
        ),
        fx AS (
          SELECT win,
                 CAST(round(GREATEST(0e0, _p0 - _q0) + GREATEST(0e0, _p1 - _q1) + GREATEST(0e0, _p2 - _q2) + GREATEST(0e0, _p3 - _q3) + GREATEST(0e0, _p4 - _q4) + GREATEST(0e0, _p5 - _q5) + GREATEST(0e0, _p6 - _q6) + GREATEST(0e0, _p7 - _q7) + GREATEST(0e0, _p8 - _q8)) AS BIGINT) AS flux_q
          FROM lagged WHERE _q0 IS NOT NULL
        ),
        cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS _n FROM fx),
        med AS (
          SELECT flux_q AS med_q FROM (
            SELECT flux_q,
                   ROW_NUMBER() OVER (ORDER BY flux_q, win) AS _ar
            FROM fx
          ) CROSS JOIN cnt WHERE _ar = (_n + 1) // 2
        )
        SELECT 'lead' AS channel, win, flux_q,
               flux_q > 2 * med_q AS is_onset
        FROM fx CROSS JOIN med
        """

    sql["stream_flux"] = sql["mm_audio_onsets"]

    sql["mm_audio_fingerprint"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT value, ROW_NUMBER() OVER (ORDER BY ts, value) - 1 AS rn
          FROM samples_aligned WHERE channel = 'lead' AND ts <= {BW_TS_END}
        ),
        wininp AS (
          SELECT CAST(rn // {AF_WINDOW} AS BIGINT) AS win,
                 CAST(rn % {AF_WINDOW} AS BIGINT) AS pos, value AS x
          FROM inp
          WHERE rn < (SELECT (COUNT(*) // {AF_WINDOW}) * {AF_WINDOW} FROM inp)
        ),
        freqs AS (SELECT * FROM (VALUES {_af_vals}) AS t(freq_hz, c, band)),
        rec AS (
          SELECT w.win, f.freq_hz, f.c, CAST(f.band AS BIGINT) AS band,
                 CAST(-1 AS BIGINT) AS pos, 0e0 AS s1, 0e0 AS s2
          FROM (SELECT DISTINCT win FROM wininp) w CROSS JOIN freqs f
          UNION ALL
          SELECT r.win, r.freq_hz, r.c, r.band, i.pos,
                 i.x + r.c * r.s1 - r.s2, r.s1
          FROM rec r JOIN wininp i ON i.win = r.win AND i.pos = r.pos + 1
        ),
        bp AS (
          SELECT win, band, s1 * s1 + s2 * s2 - c * s1 * s2 AS power
          FROM rec WHERE pos = {AF_WINDOW} - 1
        ),
        d AS (
          SELECT hi.win, hi.band, hi.power - lo.power AS d
          FROM bp hi JOIN bp lo
            ON hi.win = lo.win AND lo.band = hi.band + 1
        ),
        e AS (
          SELECT win, band, d,
                 LAG(d) OVER (PARTITION BY band ORDER BY win) AS dprev
          FROM d
        )
        SELECT 'lead' AS channel, win,
               CAST(COUNT(*) AS BIGINT) AS n_bits,
               CAST(SUM(CASE WHEN d - dprev > 0
                             THEN CAST(1 AS BIGINT) << CAST(band AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS fp
        FROM e WHERE dprev IS NOT NULL
        GROUP BY win
        """

    # --- audio match pairs: two-channel fingerprint replay + H&K
    # posting-hit candidates + aligned hamming verify -----------------
    sql["mm_audio_match_pairs"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        src AS (
          SELECT 'lead' AS channel, ts, value FROM samples_aligned
          WHERE channel = 'lead' AND ts <= {BW_TS_END}
          UNION ALL
          SELECT 'leadx' AS channel, ts, value * 2e0 + 1e1 AS value
          FROM samples_aligned
          WHERE channel = 'lead' AND ts <= {BW_TS_END}
        ),
        inp AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS cnt
          FROM src
        ),
        wininp AS (
          SELECT channel, CAST(rn // {AF_WINDOW} AS BIGINT) AS win,
                 CAST(rn % {AF_WINDOW} AS BIGINT) AS pos, value AS x
          FROM inp WHERE rn < (cnt // {AF_WINDOW}) * {AF_WINDOW}
        ),
        freqs AS (SELECT * FROM (VALUES {_af_vals}) AS t(freq_hz, c, band)),
        rec AS (
          SELECT w.channel, w.win, f.freq_hz, f.c,
                 CAST(f.band AS BIGINT) AS band,
                 CAST(-1 AS BIGINT) AS pos, 0e0 AS s1, 0e0 AS s2
          FROM (SELECT DISTINCT channel, win FROM wininp) w
          CROSS JOIN freqs f
          UNION ALL
          SELECT r.channel, r.win, r.freq_hz, r.c, r.band, i.pos,
                 i.x + r.c * r.s1 - r.s2, r.s1
          FROM rec r JOIN wininp i
            ON i.channel = r.channel AND i.win = r.win
           AND i.pos = r.pos + 1
        ),
        bp AS (
          SELECT channel, win, band,
                 s1 * s1 + s2 * s2 - c * s1 * s2 AS power
          FROM rec WHERE pos = {AF_WINDOW} - 1
        ),
        d AS (
          SELECT hi.channel, hi.win, hi.band, hi.power - lo.power AS d
          FROM bp hi JOIN bp lo
            ON hi.channel = lo.channel AND hi.win = lo.win
           AND lo.band = hi.band + 1
        ),
        e AS (
          SELECT channel, win, band, d,
                 LAG(d) OVER (PARTITION BY channel, band ORDER BY win)
                   AS dprev
          FROM d
        ),
        fps AS (
          SELECT channel, win,
                 CAST(SUM(CASE WHEN d - dprev > 0
                               THEN CAST(1 AS BIGINT)
                                      << CAST(band AS INTEGER)
                               ELSE 0 END) AS BIGINT) AS fp
          FROM e WHERE dprev IS NOT NULL
          GROUP BY channel, win
        ),
        sizes AS (
          SELECT win, fp, COUNT(*) AS m FROM fps GROUP BY win, fp
        ),
        ok AS (
          SELECT f.channel, f.win, f.fp
          FROM fps f JOIN sizes s ON s.win = f.win AND s.fp = f.fp
          WHERE s.m <= 32
        ),
        cand AS (
          SELECT DISTINCT a.channel AS channel_a, b.channel AS channel_b
          FROM ok a JOIN ok b
            ON a.win = b.win AND a.fp = b.fp AND a.channel < b.channel
        ),
        al AS (
          SELECT c.channel_a, c.channel_b, fa.win,
                 fa.fp AS fp_a, fb.fp AS fp_b
          FROM cand c
          JOIN fps fa ON fa.channel = c.channel_a
          JOIN fps fb ON fb.channel = c.channel_b AND fb.win = fa.win
        )
        SELECT channel_a, channel_b,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN fp_a = fp_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS matched_frames,
               CAST(SUM(bit_count(xor(fp_a, fp_b))) AS BIGINT)
                 AS sum_hamming,
               CAST(SUM(bit_count(xor(fp_a, fp_b))) AS DOUBLE)
                 / COUNT(*) AS mean_hamming
        FROM al GROUP BY channel_a, channel_b
        """

    # --- audio offset search: three-channel fingerprint replay + lag
    # votes + deterministic argmax + aligned hamming ------------------
    sql["mm_audio_offset_search"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        src AS (
          SELECT channel, ts, value FROM samples_aligned
          WHERE channel IN ('lead', 'sec') AND ts <= {BW_TS_END}
          UNION ALL
          SELECT 'q' AS channel, ts, value * 2e0 + 1e1 AS value
          FROM (
            SELECT ts, value,
                   ROW_NUMBER() OVER (ORDER BY ts, value) - 1 AS rn
            FROM samples_aligned
            WHERE channel = 'lead' AND ts <= {BW_TS_END}
          ) WHERE rn >= {AF_SHIFT_SAMPLES}
        ),
        inp AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS cnt
          FROM src
        ),
        wininp AS (
          SELECT channel, CAST(rn // {AF_WINDOW} AS BIGINT) AS win,
                 CAST(rn % {AF_WINDOW} AS BIGINT) AS pos, value AS x
          FROM inp WHERE rn < (cnt // {AF_WINDOW}) * {AF_WINDOW}
        ),
        freqs AS (SELECT * FROM (VALUES {_af_vals}) AS t(freq_hz, c, band)),
        rec AS (
          SELECT w.channel, w.win, f.freq_hz, f.c,
                 CAST(f.band AS BIGINT) AS band,
                 CAST(-1 AS BIGINT) AS pos, 0e0 AS s1, 0e0 AS s2
          FROM (SELECT DISTINCT channel, win FROM wininp) w
          CROSS JOIN freqs f
          UNION ALL
          SELECT r.channel, r.win, r.freq_hz, r.c, r.band, i.pos,
                 i.x + r.c * r.s1 - r.s2, r.s1
          FROM rec r JOIN wininp i
            ON i.channel = r.channel AND i.win = r.win
           AND i.pos = r.pos + 1
        ),
        bp AS (
          SELECT channel, win, band,
                 s1 * s1 + s2 * s2 - c * s1 * s2 AS power
          FROM rec WHERE pos = {AF_WINDOW} - 1
        ),
        d AS (
          SELECT hi.channel, hi.win, hi.band, hi.power - lo.power AS d
          FROM bp hi JOIN bp lo
            ON hi.channel = lo.channel AND hi.win = lo.win
           AND lo.band = hi.band + 1
        ),
        e AS (
          SELECT channel, win, band, d,
                 LAG(d) OVER (PARTITION BY channel, band ORDER BY win)
                   AS dprev
          FROM d
        ),
        fps AS (
          SELECT channel, win,
                 CAST(SUM(CASE WHEN d - dprev > 0
                               THEN CAST(1 AS BIGINT)
                                      << CAST(band AS INTEGER)
                               ELSE 0 END) AS BIGINT) AS fp
          FROM e WHERE dprev IS NOT NULL
          GROUP BY channel, win
        ),
        sizes AS (
          SELECT fp, COUNT(*) AS m FROM fps
          WHERE channel <> 'q' GROUP BY fp
        ),
        ok AS (
          SELECT f.channel, f.win, f.fp
          FROM fps f JOIN sizes s USING (fp)
          WHERE f.channel <> 'q' AND s.m <= 1024
        ),
        qf AS (SELECT win AS q_win, fp AS q_fp FROM fps
               WHERE channel = 'q'),
        hits AS (
          SELECT o.channel, o.win - q.q_win AS lag
          FROM ok o JOIN qf q ON o.fp = q.q_fp
          WHERE abs(o.win - q.q_win) <= {AF_MAX_LAG}
        ),
        votes AS (
          SELECT channel, lag, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM hits GROUP BY channel, lag
        ),
        best AS (
          SELECT channel, lag, n_hits FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY channel
                ORDER BY n_hits DESC, lag) AS rk
            FROM votes) WHERE rk = 1
        ),
        al AS (
          SELECT b.channel, b.lag, b.n_hits, dd.fp, q.q_fp
          FROM best b
          JOIN fps dd ON dd.channel = b.channel
          JOIN qf q ON dd.win = q.q_win + b.lag
        )
        SELECT channel, CAST(lag AS BIGINT) AS lag, n_hits,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(CASE WHEN fp = q_fp THEN 1 ELSE 0 END)
                    AS BIGINT) AS matched_frames,
               CAST(SUM(bit_count(xor(fp, q_fp))) AS BIGINT)
                 AS sum_hamming,
               CAST(SUM(bit_count(xor(fp, q_fp))) AS DOUBLE)
                 / COUNT(*) AS mean_hamming
        FROM al GROUP BY channel, lag, n_hits
        """

    # --- round-4b EWMA recursive replay ------------------------------
    _ew_a, _ew_b = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    sql["ts_ewma"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT channel, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS pos
          FROM samples_aligned WHERE ts <= {BW_TS_END}
        ),
        rec AS (
          SELECT channel, pos, ts, value, value AS ewma
          FROM inp WHERE pos = 0
          UNION ALL
          SELECT i.channel, i.pos, i.ts, i.value,
                 {_ew_a!r} * i.value + {_ew_b!r} * r.ewma
          FROM rec r JOIN inp i
            ON i.channel = r.channel AND i.pos = r.pos + 1
        )
        SELECT channel, ts, value, ewma FROM rec
        """
    # streaming EWMA is bit-identical to the batch operator under the
    # ordered-ingest contract — same oracle
    sql["stream_ewma"] = sql["ts_ewma"]

    _h_a, _h_b = HOLT_ALPHA, 1.0 - HOLT_ALPHA
    _h_g, _h_d = HOLT_BETA, 1.0 - HOLT_BETA
    # the trend expression recomputes the new level with the IDENTICAL
    # IEEE op sequence the level column uses — same bits by construction
    _h_lvl = f"{_h_a!r} * i.value + {_h_b!r} * (r.level + r.trend)"
    sql["ts_holt_smoothing"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT channel, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS pos
          FROM samples_aligned WHERE ts <= {BW_TS_END}
        ),
        rec AS (
          SELECT channel, pos, ts, value, value AS level,
                 CAST(0.0 AS DOUBLE) AS trend
          FROM inp WHERE pos = 0
          UNION ALL
          SELECT i.channel, i.pos, i.ts, i.value,
                 {_h_lvl},
                 {_h_g!r} * (({_h_lvl}) - r.level) + {_h_d!r} * r.trend
          FROM rec r JOIN inp i
            ON i.channel = r.channel AND i.pos = r.pos + 1
        )
        SELECT channel, ts, value, level, trend,
               level + trend AS forecast
        FROM rec
        """
    # streaming Holt is bit-identical to the batch operator under the
    # ordered-ingest contract — same oracle
    sql["stream_holt"] = sql["ts_holt_smoothing"]

    # Holt backtest: composes the gated recursion, lags the forecast
    # one step, quantizes each bit-exact residual to BIGINT so the
    # channel accumulations are exact order-free integer sums.
    sql["ts_holt_backtest"] = f"""
        WITH h AS ({sql["ts_holt_smoothing"]}),
        e AS (
          SELECT channel, value,
                 LAG(forecast) OVER (PARTITION BY channel
                     ORDER BY ts, value) AS pf
          FROM h
        ),
        q AS (
          SELECT channel,
                 CAST(round(abs(value - pf) * 1000000) AS BIGINT) AS ae_q,
                 CASE WHEN value <> 0 THEN CAST(round(abs(value - pf)
                     / abs(value) * 1000000000) AS BIGINT) END AS ape_q
          FROM e WHERE pf IS NOT NULL
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_steps,
                 CAST(COUNT(ape_q) AS BIGINT) AS n_nonzero,
                 CAST(SUM(ae_q) AS BIGINT) AS sae_q,
                 CAST(SUM(ape_q) AS BIGINT) AS sape_q
          FROM q GROUP BY channel
        )
        SELECT channel, n_steps, n_nonzero, sae_q,
               CAST(sae_q AS DOUBLE) / (1000000.0 * n_steps) AS mae,
               CASE WHEN n_nonzero > 0 THEN CAST(sape_q AS DOUBLE)
                    / (1000000000.0 * n_nonzero) END AS mape
        FROM g
        """

    # --- CUSUM control monitor: recursive replay (ewma/holt class) ---
    _cu_vals = ", ".join(
        f"('{c}', {m!r}::DOUBLE, {k!r}::DOUBLE, {h!r}::DOUBLE)"
        for c, (m, k, h) in sorted(CUSUM_PARAMS.items())
    )
    _cu_chans = ", ".join(f"'{c}'" for c in sorted(CUSUM_PARAMS))
    # pre-reset statistics, recomputed with the IDENTICAL op sequence
    # everywhere they appear — same doubles by construction
    _cu_gp = (
        "CASE WHEN (r.cgp + (i.value - p.mu0)) - p.k > 0e0 "
        "THEN (r.cgp + (i.value - p.mu0)) - p.k ELSE 0e0 END"
    )
    _cu_gn = (
        "CASE WHEN (r.cgn + (p.mu0 - i.value)) - p.k > 0e0 "
        "THEN (r.cgn + (p.mu0 - i.value)) - p.k ELSE 0e0 END"
    )
    _cu_alarm = f"(({_cu_gp}) > p.h OR ({_cu_gn}) > p.h)"
    sql["ts_cusum_monitor"] = f"""
        WITH RECURSIVE samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT channel, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS pos
          FROM samples_aligned
          WHERE ts <= {BW_TS_END} AND channel IN ({_cu_chans})
        ),
        p AS (SELECT * FROM (VALUES {_cu_vals}) AS t(channel, mu0, k, h)),
        rec AS (
          SELECT channel, CAST(-1 AS BIGINT) AS pos,
                 CAST(NULL AS BIGINT) AS ts, CAST(NULL AS DOUBLE) AS value,
                 0e0 AS gpos, 0e0 AS gneg, FALSE AS alarm,
                 0e0 AS cgp, 0e0 AS cgn
          FROM (SELECT DISTINCT channel FROM inp)
          UNION ALL
          SELECT i.channel, i.pos, i.ts, i.value,
                 {_cu_gp}, {_cu_gn}, {_cu_alarm},
                 CASE WHEN {_cu_alarm} THEN 0e0 ELSE {_cu_gp} END,
                 CASE WHEN {_cu_alarm} THEN 0e0 ELSE {_cu_gn} END
          FROM rec r
          JOIN inp i ON i.channel = r.channel AND i.pos = r.pos + 1
          JOIN p ON p.channel = i.channel
        )
        SELECT channel, ts, value, gpos, gneg, alarm
        FROM rec WHERE pos >= 0
        """
    # streaming CUSUM is bit-identical to the batch operator under the
    # ordered-ingest contract — same oracle
    sql["stream_cusum"] = sql["ts_cusum_monitor"]

    def _rmed_sql(src: str) -> str:
        """Per-channel median of ``src(channel, ts, value)`` via the
        explicit order-statistic interpolation (channel_mad's class)."""
        return f"""
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n,
                 MAX(CASE WHEN rn = floor(CAST(0.5 AS DOUBLE) * (n - 1))
                     THEN value END) AS _lo,
                 MAX(CASE WHEN rn = least(floor(CAST(0.5 AS DOUBLE) * (n - 1)) + 1, n - 1)
                     THEN value END) AS _hi
          FROM (
            SELECT channel, value,
                   ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                     - 1 AS rn,
                   COUNT(*) OVER (PARTITION BY channel) AS n
            FROM {src}
          ) GROUP BY channel
        """

    _rmed_pct = (
        "(_lo + (_hi - _lo) * "
        "(CAST(0.5 AS DOUBLE) * (n - 1) - floor(CAST(0.5 AS DOUBLE) * (n - 1))))"
    )
    sql["ts_holt_anomalies"] = f"""
        WITH hrec AS ({sql["ts_holt_smoothing"]}),
        hl AS (
          SELECT channel, ts, value,
                 LAG(forecast) OVER (PARTITION BY channel
                                     ORDER BY ts, value) AS pred
          FROM hrec
        ),
        rr AS (
          SELECT channel, ts, value, pred, value - pred AS residual
          FROM hl WHERE pred IS NOT NULL
        ),
        hm1 AS ({_rmed_sql("(SELECT channel, ts, residual AS value FROM rr)")}),
        hmed AS (SELECT channel, {_rmed_pct} AS med FROM hm1),
        hdev AS (
          SELECT rr.channel, rr.ts, abs(rr.residual - hmed.med) AS value
          FROM rr JOIN hmed ON rr.channel = hmed.channel
        ),
        hm2 AS ({_rmed_sql("hdev")}),
        hmadt AS (SELECT channel, {_rmed_pct} AS mad FROM hm2)
        SELECT rr.channel, rr.ts, rr.value, rr.pred, rr.residual,
               hmed.med, hmadt.mad
        FROM rr
        JOIN hmed ON rr.channel = hmed.channel
        JOIN hmadt ON rr.channel = hmadt.channel
        WHERE abs(rr.residual - hmed.med) > {HOLT_ANOM_K!r} * hmadt.mad
        """

    # --- round-4b native session-window streaming replay -------------
    sql["stream_session_agg"] = with_views(
        f"""
        WITH mx AS (
          SELECT (MAX(ts) // 1000) * 1000 AS wm FROM chan_events
        ),
        sess AS (
          SELECT channel, MIN(lo) AS session_lo,
                 MAX(hi) + {GAP_THRESHOLD_US} AS session_end,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 MIN(v) AS min_val, MAX(v) AS max_val
          FROM (
            SELECT channel, lo, hi, v,
                   SUM(new_span) OVER (PARTITION BY channel ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
            FROM (
              SELECT channel, ts AS lo, ts AS hi, value AS v,
                     CASE WHEN LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts) IS NULL
                            OR ts - LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts)
                               >= {GAP_THRESHOLD_US}
                          THEN 1 ELSE 0 END AS new_span
              FROM chan_events
            )
          ) GROUP BY channel, span_id
        )
        SELECT s.channel, s.session_lo, s.session_end, s.n, s.min_val,
               s.max_val
        FROM sess s CROSS JOIN mx WHERE s.session_end <= mx.wm
        """,
        "chan_events",
    )

    # --- round-4b percentiles / correlation / entropy / grouped KMV --
    def _pct_terms(p: float, name: str) -> tuple[str, str]:
        idx = f"floor(CAST({p!r} AS DOUBLE) * (n - 1))"
        lo = f"MAX(CASE WHEN rn = {idx} THEN value END) AS _lo_{name}"
        hi = (
            f"MAX(CASE WHEN rn = least({idx} + 1, n - 1) THEN value END)"
            f" AS _hi_{name}"
        )
        post = (
            f"_lo_{name} + (_hi_{name} - _lo_{name}) * "
            f"(CAST({p!r} AS DOUBLE) * (n - 1) "
            f"- floor(CAST({p!r} AS DOUBLE) * (n - 1))) AS {name}"
        )
        return f"{lo}, {hi}", post

    _pnames = [
        (p, f"p{str(p).replace('0.', '').ljust(2, '0')}") for p in PCTS
    ]
    _pct_aggs = ", ".join(_pct_terms(p, nm)[0] for p, nm in _pnames)
    _pct_posts = ", ".join(_pct_terms(p, nm)[1] for p, nm in _pnames)
    sql["ts_channel_percentiles"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                   - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS n
          FROM samples
        ),
        agg AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, {_pct_aggs}
          FROM ranked GROUP BY channel
        )
        SELECT channel, n, {_pct_posts} FROM agg
        """,
        "samples",
    )

    _se_aggs = ", ".join(
        _pct_terms(p, nm)[0] for p, nm in ((0.25, "p25"), (0.75, "p75"))
    )
    _se_posts = ", ".join(
        _pct_terms(p, nm)[1] for p, nm in ((0.25, "p25"), (0.75, "p75"))
    )
    _se_last = SE_WINDOW - SE_M - 1  # last valid template start
    sql["ts_sample_entropy"] = with_views(
        f"""
        WITH rk0 AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                   - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS n
          FROM samples
        ),
        tol0 AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, {_se_aggs}
          FROM rk0 GROUP BY channel
        ),
        tol1 AS (SELECT channel, {_se_posts} FROM tol0),
        tol AS (
          SELECT channel,
                 CAST(round({SE_RFRAC!r} * (p75 - p25) * {SE_QUANT})
                      AS BIGINT) AS r_q
          FROM tol1
        ),
        rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        t AS (
          SELECT channel, rn // {SE_WINDOW} AS win, rn % {SE_WINDOW} AS pos,
                 xq,
                 LEAD(xq, 1) OVER (PARTITION BY channel, rn // {SE_WINDOW}
                     ORDER BY rn) AS x1,
                 LEAD(xq, 2) OVER (PARTITION BY channel, rn // {SE_WINDOW}
                     ORDER BY rn) AS x2,
                 COUNT(*) OVER (PARTITION BY channel, rn // {SE_WINDOW})
                   AS nw
          FROM rk
        ),
        tc AS (SELECT * FROM t WHERE nw = {SE_WINDOW}),
        pairs AS (
          SELECT a.channel, a.win,
                 GREATEST(abs(a.xq - b.xq), abs(a.x1 - b.x1)) AS c2,
                 GREATEST(abs(a.xq - b.xq), abs(a.x1 - b.x1),
                          abs(a.x2 - b.x2)) AS c3
          FROM tc a JOIN tc b
            ON a.channel = b.channel AND a.win = b.win AND b.pos > a.pos
          WHERE a.pos <= {_se_last} AND b.pos <= {_se_last}
        ),
        cnt AS (
          SELECT p.channel, CAST(p.win AS BIGINT) AS win,
                 CAST({SE_WINDOW} AS BIGINT) AS n, t2.r_q,
                 CAST(SUM(CASE WHEN p.c2 <= t2.r_q THEN 1 ELSE 0 END)
                      AS BIGINT) AS b_count,
                 CAST(SUM(CASE WHEN p.c3 <= t2.r_q THEN 1 ELSE 0 END)
                      AS BIGINT) AS a_count
          FROM pairs p JOIN tol t2 USING (channel)
          GROUP BY p.channel, p.win, t2.r_q
        )
        SELECT channel, win, n, r_q, b_count, a_count,
               CASE WHEN a_count > 0 AND b_count > 0 THEN
                 round(-ln(CAST(a_count AS DOUBLE)
                           / CAST(b_count AS DOUBLE)), 9) END AS sampen
        FROM cnt
        """,
        "samples",
    )

    # RQA: recurrent pairs under the same IQR tolerance, diagonal
    # lines via gaps-and-islands on exact positions; zero-recurrence
    # windows report rr = 0, det NULL (the left-join-back rule).
    _rqa_np = RQA_WINDOW * (RQA_WINDOW - 1) // 2
    sql["ts_rqa"] = with_views(
        f"""
        WITH rk0 AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                   - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS n
          FROM samples
        ),
        tol0 AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, {_se_aggs}
          FROM rk0 GROUP BY channel
        ),
        tol1 AS (SELECT channel, {_se_posts} FROM tol0),
        tol AS (
          SELECT channel,
                 CAST(round({SE_RFRAC!r} * (p75 - p25) * {SE_QUANT})
                      AS BIGINT) AS r_q
          FROM tol1
        ),
        rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        t AS (
          SELECT channel, rn // {RQA_WINDOW} AS win,
                 rn % {RQA_WINDOW} AS pos, xq,
                 COUNT(*) OVER (PARTITION BY channel, rn // {RQA_WINDOW})
                   AS nw
          FROM rk
        ),
        tc AS (SELECT * FROM t WHERE nw = {RQA_WINDOW}),
        rec AS (
          SELECT a.channel, a.win, a.pos AS pi, b.pos - a.pos AS d
          FROM tc a JOIN tc b
            ON a.channel = b.channel AND a.win = b.win AND b.pos > a.pos
          JOIN tol ON tol.channel = a.channel
          WHERE abs(a.xq - b.xq) <= tol.r_q
        ),
        runs AS (
          SELECT channel, win, d,
                 pi - ROW_NUMBER() OVER (PARTITION BY channel, win, d
                     ORDER BY pi) AS grp
          FROM rec
        ),
        rlen AS (
          SELECT channel, win, CAST(COUNT(*) AS BIGINT) AS len
          FROM runs GROUP BY channel, win, d, grp
        ),
        agg AS (
          SELECT channel, win,
                 CAST(SUM(len) AS BIGINT) AS n_rec,
                 CAST(COALESCE(SUM(CASE WHEN len >= 2 THEN len END), 0)
                      AS BIGINT) AS n_det
          FROM rlen GROUP BY channel, win
        ),
        wins AS (
          SELECT channel, win FROM tc GROUP BY channel, win
        )
        SELECT w.channel, CAST(w.win AS BIGINT) AS win,
               CAST({RQA_WINDOW} AS BIGINT) AS n, tol.r_q,
               CAST({_rqa_np} AS BIGINT) AS n_pairs,
               CAST(COALESCE(a.n_rec, 0) AS BIGINT) AS n_rec,
               CAST(COALESCE(a.n_det, 0) AS BIGINT) AS n_det,
               CAST(COALESCE(a.n_rec, 0) AS DOUBLE) / {_rqa_np} AS rr,
               CASE WHEN COALESCE(a.n_rec, 0) > 0
                    THEN CAST(a.n_det AS DOUBLE) / a.n_rec END AS det
        FROM wins w
        JOIN tol ON tol.channel = w.channel
        LEFT JOIN agg a ON a.channel = w.channel AND a.win = w.win
        """,
        "samples",
    )

    # Haar energy: ±1-signed block sums, square AFTER the block sum
    # (two-stage aggregation on both engines), totals joined back.
    _haar_lv = ", ".join(str(i) for i in range(1, HAAR_LEVELS + 1))
    sql["ts_haar_energy"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        wfull AS (
          SELECT channel, rn // {SE_WINDOW} AS win,
                 rn % {SE_WINDOW} AS pos, xq,
                 COUNT(*) OVER (PARTITION BY channel, rn // {SE_WINDOW})
                   AS nw
          FROM rk
        ),
        tc AS (SELECT * FROM wfull WHERE nw = {SE_WINDOW}),
        e AS (
          SELECT channel, win, UNNEST([{_haar_lv}]) AS level, pos, xq
          FROM tc
        ),
        sb AS (
          SELECT channel, win, level, pos // (1 << level) AS blk,
                 CASE WHEN (pos // (1 << (level - 1))) % 2 = 0
                      THEN xq ELSE -xq END AS sx
          FROM e
        ),
        blocks AS (
          SELECT channel, win, level, blk,
                 CAST(SUM(sx) AS BIGINT) AS d
          FROM sb GROUP BY channel, win, level, blk
        ),
        g AS (
          SELECT channel, CAST(win AS BIGINT) AS win,
                 CAST(level AS BIGINT) AS level,
                 CAST(COUNT(*) AS BIGINT) AS n_details,
                 CAST(SUM(d * d) AS BIGINT) AS energy_q
          FROM blocks GROUP BY channel, win, level
        ),
        tot AS (
          SELECT channel, win, CAST(SUM(energy_q) AS BIGINT) AS tot_q
          FROM g GROUP BY channel, win
        )
        SELECT g.channel, g.win, g.level, g.n_details, g.energy_q,
               CAST(g.energy_q AS DOUBLE)
                 / ({SE_QUANT}.0 * {SE_QUANT}.0) AS energy,
               CASE WHEN t.tot_q > 0 THEN
                 CAST(g.energy_q AS DOUBLE) / t.tot_q END AS rel_energy
        FROM g JOIN tot t ON g.channel = t.channel AND g.win = t.win
        """,
        "samples",
    )

    # Multiscale entropy: per-scale coarse-SUM chains over the shared
    # rk/tol CTEs, UNION ALL'd; tolerance = r_q1 * scale (sum-domain
    # equivalent of the fixed original-series tolerance).
    _mse_ctes = []
    _mse_branches = []
    for _s in MSE_SCALES:
        _mse_ctes.append(f"""
        coarse{_s} AS (
          SELECT channel, rn // {_s} AS ci,
                 CAST(SUM(xq) AS BIGINT) AS cq
          FROM rk GROUP BY channel, rn // {_s}
          HAVING COUNT(*) = {_s}
        ),
        t{_s} AS (
          SELECT channel, ci // {SE_WINDOW} AS win,
                 ci % {SE_WINDOW} AS pos, cq,
                 LEAD(cq, 1) OVER (PARTITION BY channel,
                     ci // {SE_WINDOW} ORDER BY ci) AS x1,
                 LEAD(cq, 2) OVER (PARTITION BY channel,
                     ci // {SE_WINDOW} ORDER BY ci) AS x2,
                 COUNT(*) OVER (PARTITION BY channel, ci // {SE_WINDOW})
                   AS nw
          FROM coarse{_s}
        ),
        tc{_s} AS (SELECT * FROM t{_s} WHERE nw = {SE_WINDOW})""")
        _mse_branches.append(f"""
        SELECT p.channel, CAST({_s} AS BIGINT) AS scale,
               CAST(p.win AS BIGINT) AS win,
               CAST({SE_WINDOW} AS BIGINT) AS n,
               CAST(t2.r_q1 * {_s} AS BIGINT) AS r_q,
               CAST(SUM(CASE WHEN p.c2 <= t2.r_q1 * {_s} THEN 1 ELSE 0
                   END) AS BIGINT) AS b_count,
               CAST(SUM(CASE WHEN p.c3 <= t2.r_q1 * {_s} THEN 1 ELSE 0
                   END) AS BIGINT) AS a_count
        FROM (
          SELECT a.channel, a.win,
                 GREATEST(abs(a.cq - b.cq), abs(a.x1 - b.x1)) AS c2,
                 GREATEST(abs(a.cq - b.cq), abs(a.x1 - b.x1),
                          abs(a.x2 - b.x2)) AS c3
          FROM tc{_s} a JOIN tc{_s} b
            ON a.channel = b.channel AND a.win = b.win AND b.pos > a.pos
          WHERE a.pos <= {_se_last} AND b.pos <= {_se_last}
        ) p JOIN tol t2 USING (channel)
        GROUP BY p.channel, p.win, t2.r_q1""")
    sql["ts_multiscale_entropy"] = with_views(
        f"""
        WITH rk0 AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                   - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS n
          FROM samples
        ),
        tol0 AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, {_se_aggs}
          FROM rk0 GROUP BY channel
        ),
        tol1 AS (SELECT channel, {_se_posts} FROM tol0),
        tol AS (
          SELECT channel,
                 CAST(round({SE_RFRAC!r} * (p75 - p25) * {SE_QUANT})
                      AS BIGINT) AS r_q1
          FROM tol1
        ),
        rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        {",".join(_mse_ctes)},
        u AS ({" UNION ALL ".join(_mse_branches)})
        SELECT channel, scale, win, n, r_q, b_count, a_count,
               CASE WHEN a_count > 0 AND b_count > 0 THEN
                 round(-ln(CAST(a_count AS DOUBLE)
                           / CAST(b_count AS DOUBLE)), 9) END AS sampen
        FROM u
        """,
        "samples",
    )

    _hj_v0 = (
        "((CAST(n AS DOUBLE) * CAST(ss0 AS DOUBLE) "
        "- CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)) "
        "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    )
    _hj_v1 = (
        "((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE) "
        "- CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
        "/ (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)))"
    )
    _hj_v2 = (
        "((CAST(n2 AS DOUBLE) * CAST(ss2 AS DOUBLE) "
        "- CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) "
        "/ (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)))"
    )
    from pennsieve_streaming_spark.operators.stats import (
        _higuchi_fd_coeffs as _hfc,
    )

    _hf_k = 5
    _hf_cs = _hfc(_hf_k)
    _hf_lagcols = ", ".join(
        f"LAG(CAST(round(value * {SE_QUANT}) AS BIGINT), {k}) OVER "
        f"(PARTITION BY channel ORDER BY ts, value) AS _p{k}"
        for k in range(1, _hf_k + 1)
    )
    _hf_arms = " UNION ALL ".join(
        f"SELECT channel, _rn, {k} AS k, abs(xq - _p{k}) AS adiff "
        f"FROM ranked WHERE _p{k} IS NOT NULL"
        for k in range(1, _hf_k + 1)
    )
    _hf_piv = ", ".join(
        f"MAX(CASE WHEN k = {k} THEN _lsum END) AS _lq{k}"
        for k in range(1, _hf_k + 1)
    )
    _hf_l = {
        k: f"(CAST(_lq{k} AS DOUBLE) / ({k} * 1e6))"
        for k in range(1, _hf_k + 1)
    }
    _hf_pos = " AND ".join(f"_lq{k} > 0" for k in range(1, _hf_k + 1))
    _hf_fd = " + ".join(
        f"{_hf_cs[k - 1]!r} * ln({_hf_l[k]})" for k in range(1, _hf_k + 1)
    )
    sql["ts_higuchi_fd"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel,
                 CAST(ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS BIGINT) AS _rn,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 {_hf_lagcols}
          FROM samples
        ),
        pairs AS ({_hf_arms}),
        per_m AS (
          SELECT channel, k, _rn % k AS m,
                 CAST(SUM(adiff) AS BIGINT) AS s_abs,
                 CAST(COUNT(*) AS BIGINT) AS n_i
          FROM pairs GROUP BY channel, k, _rn % k
        ),
        n_tbl AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n
          FROM samples GROUP BY channel
        ),
        lmq AS (
          SELECT p.channel, p.k, t.n,
                 CAST(round(CAST(s_abs AS DOUBLE) * (n - 1)
                   / (n_i * k * k) * 1e6) AS BIGINT) AS _lmq
          FROM per_m p JOIN n_tbl t ON p.channel = t.channel
        ),
        per_k AS (
          SELECT channel, n, k, CAST(SUM(_lmq) AS BIGINT) AS _lsum
          FROM lmq GROUP BY channel, n, k
        ),
        g AS (
          SELECT channel, n, {_hf_piv}
          FROM per_k GROUP BY channel, n
        )
        SELECT channel, n,
               {", ".join(f"{_hf_l[k]} AS l{k}" for k in range(1, _hf_k + 1))},
               CASE WHEN {_hf_pos} THEN round({_hf_fd}, 9)
                    ELSE 0e0 END AS fd
        FROM g
        """,
        "samples",
    )

    sql["ts_allan_variance"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS _rn
          FROM samples
        ),
        nch AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS _n
          FROM ranked GROUP BY channel
        ),
        e AS (
          SELECT r.channel, r._rn, r.xq, t.tau
          FROM ranked r
          CROSS JOIN (SELECT UNNEST([1, 2, 4, 8]) AS tau) t
          JOIN nch n ON r.channel = n.channel
          WHERE r._rn < (n._n // t.tau) * t.tau
        ),
        blocks AS (
          SELECT channel, tau, _rn // tau AS blk,
                 CAST(SUM(xq) AS BIGINT) AS s
          FROM e GROUP BY channel, tau, _rn // tau
        ),
        d AS (
          SELECT channel, tau,
                 s - LAG(s) OVER (PARTITION BY channel, tau
                     ORDER BY blk) AS _ds
          FROM blocks
        ),
        g AS (
          SELECT channel, tau,
                 CAST(COUNT(*) AS BIGINT) AS n_deltas,
                 SUM(CAST(_ds AS HUGEINT) * _ds) AS _sq
          FROM d WHERE _ds IS NOT NULL GROUP BY channel, tau
        )
        SELECT channel, CAST(tau AS BIGINT) AS tau,
               CAST(n_deltas + 1 AS BIGINT) AS n_blocks,
               CAST(_sq AS DOUBLE) / (2e0 * n_deltas * tau * tau
                 * {SE_QUANT} * CAST({SE_QUANT} AS DOUBLE)) AS avar
        FROM g
        """,
        "samples",
    )

    sql["ts_hampel_despike"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS _rn
          FROM samples
        ),
        posd AS (
          SELECT channel, ts, value, xq,
                 CAST(_rn // 32 AS BIGINT) AS win,
                 CAST(_rn % 32 AS BIGINT) AS pos
          FROM ranked
        ),
        fullw AS (
          SELECT channel, win FROM posd GROUP BY channel, win
          HAVING COUNT(*) = 32
        ),
        rk AS (
          SELECT p.* FROM posd p
          JOIN fullw f ON p.channel = f.channel AND p.win = f.win
        ),
        med AS (
          SELECT channel, win, xq AS med_q FROM (
            SELECT channel, win, xq,
                   ROW_NUMBER() OVER (PARTITION BY channel, win
                       ORDER BY xq, pos) AS _ar
            FROM rk
          ) WHERE _ar = (32 + 1) // 2
        ),
        dev AS (
          SELECT r.channel, r.ts, r.value, r.win, r.pos,
                 abs(r.xq - m.med_q) AS adev, m.med_q
          FROM rk r JOIN med m ON r.channel = m.channel AND r.win = m.win
        ),
        mad AS (
          SELECT channel, win, adev AS mad_q FROM (
            SELECT channel, win, adev,
                   ROW_NUMBER() OVER (PARTITION BY channel, win
                       ORDER BY adev, pos) AS _ar
            FROM dev
          ) WHERE _ar = (32 + 1) // 2
        )
        SELECT d.channel, d.ts, d.value, d.win,
               d.adev > 3 * a.mad_q AS is_spike,
               CASE WHEN d.adev > 3 * a.mad_q
                    THEN CAST(d.med_q AS DOUBLE) / {SE_QUANT}
                    ELSE d.value END AS despiked
        FROM dev d JOIN mad a ON d.channel = a.channel AND d.win = a.win
        """,
        "samples",
    )

    _HD_L = HAAR_LEVELS
    sql["ts_wavelet_denoise"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS _rn
          FROM samples
        ),
        pos AS (
          SELECT channel, ts, value, xq,
                 CAST(_rn // {SE_WINDOW} AS BIGINT) AS win,
                 CAST(_rn % {SE_WINDOW} AS BIGINT) AS pos
          FROM ranked
        ),
        fullw AS (
          SELECT channel, win FROM pos GROUP BY channel, win
          HAVING COUNT(*) = {SE_WINDOW}
        ),
        rk AS (
          SELECT p.* FROM pos p
          JOIN fullw f ON p.channel = f.channel AND p.win = f.win
        ),
        lvs AS (SELECT * FROM (VALUES {", ".join(f"({i})" for i in range(1, 5))}) t(level)),
        e AS (
          SELECT channel, win, level,
                 pos // (1 << level) AS blk,
                 CASE WHEN (pos // (1 << (level - 1))) % 2 = 0
                      THEN xq ELSE -xq END AS sx
          FROM rk CROSS JOIN lvs
        ),
        details AS (
          SELECT channel, win, level, blk,
                 CAST(SUM(sx) AS BIGINT) AS d
          FROM e GROUP BY channel, win, level, blk
        ),
        d1 AS (
          SELECT channel, win, blk, abs(d) AS _ad
          FROM details WHERE level = 1
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS _n
          FROM d1 GROUP BY channel
        ),
        mad AS (
          SELECT channel, _ad AS mad_q FROM (
            SELECT d1.channel, d1._ad,
                   ROW_NUMBER() OVER (PARTITION BY d1.channel
                       ORDER BY d1._ad, d1.win, d1.blk) AS _ar, c._n
            FROM d1 JOIN cnt c ON d1.channel = c.channel
          ) WHERE _ar = (_n + 1) // 2
        ),
        kept AS (
          SELECT dd.channel, dd.win, dd.level, dd.blk,
                 CASE WHEN 2 * d * d > 9 * mad_q * mad_q * (1 << level)
                      THEN d ELSE CAST(0 AS BIGINT) END AS dk
          FROM details dd JOIN mad m ON dd.channel = m.channel
        ),
        approx AS (
          SELECT channel, win, pos // (1 << {_HD_L}) AS ablk,
                 CAST(SUM(xq) AS BIGINT) AS a
          FROM rk GROUP BY channel, win, pos // (1 << {_HD_L})
        ),
        contrib AS (
          SELECT r.channel, r.win, r.pos,
                 SUM(CAST(CASE WHEN (r.pos // (1 << (l.level - 1))) % 2 = 0
                          THEN k.dk ELSE -k.dk END AS DOUBLE)
                     / CAST((1 << l.level) AS DOUBLE)) AS _dsum
          FROM rk r CROSS JOIN lvs l
          JOIN kept k ON k.channel = r.channel AND k.win = r.win
                     AND k.level = l.level
                     AND k.blk = r.pos // (1 << l.level)
          GROUP BY r.channel, r.win, r.pos
        )
        SELECT r.channel, r.ts, r.value,
               (CAST(a.a AS DOUBLE) / CAST((1 << {_HD_L}) AS DOUBLE)
                + c._dsum) / CAST({SE_QUANT} AS DOUBLE) AS denoised
        FROM rk r
        JOIN contrib c ON c.channel = r.channel AND c.win = r.win
                      AND c.pos = r.pos
        JOIN approx a ON a.channel = r.channel AND a.win = r.win
                     AND a.ablk = r.pos // (1 << {_HD_L})
        """,
        "samples",
    )

    sql["ts_hjorth"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        t AS (
          SELECT channel, rn // {SE_WINDOW} AS win, rn % {SE_WINDOW} AS pos,
                 xq,
                 xq - LAG(xq) OVER (PARTITION BY channel, rn // {SE_WINDOW}
                     ORDER BY rn) AS d1
          FROM rk
        ),
        t2 AS (
          SELECT channel, win, pos, xq, d1,
                 d1 - LAG(d1) OVER (PARTITION BY channel, win
                     ORDER BY pos) AS d2
          FROM t
        ),
        g AS (
          SELECT channel, CAST(win AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS s0,
                 CAST(SUM(xq * xq) AS BIGINT) AS ss0,
                 CAST(COUNT(d1) AS BIGINT) AS n1,
                 CAST(COALESCE(SUM(d1), 0) AS BIGINT) AS s1,
                 CAST(COALESCE(SUM(d1 * d1), 0) AS BIGINT) AS ss1,
                 CAST(COUNT(d2) AS BIGINT) AS n2,
                 CAST(COALESCE(SUM(d2), 0) AS BIGINT) AS s2,
                 CAST(COALESCE(SUM(d2 * d2), 0) AS BIGINT) AS ss2
          FROM t2 GROUP BY channel, win
          HAVING COUNT(*) = {SE_WINDOW}
        )
        SELECT channel, win, n,
               CAST(round({_hj_v0} / ({SE_QUANT}.0 * {SE_QUANT}.0) * 1000)
                    AS BIGINT) AS activity_mq,
               CASE WHEN {_hj_v0} > 0 THEN
                 round(sqrt({_hj_v1} / {_hj_v0}), 9) END AS mobility,
               CASE WHEN {_hj_v0} > 0 AND {_hj_v1} > 0 THEN
                 round(sqrt({_hj_v2} / {_hj_v1})
                       / sqrt({_hj_v1} / {_hj_v0}), 9) END AS complexity
        FROM g
        """,
        "samples",
    )

    sql["ts_line_length"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n FROM rk
          GROUP BY channel
        ),
        medr AS (
          SELECT channel, xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY xq, ts, value) AS ar
          FROM rk
        ),
        med AS (
          SELECT m.channel, m.xq AS med_q
          FROM medr m JOIN cnt c ON m.channel = c.channel
          WHERE m.ar = (c.n + 1) // 2
        ),
        t AS (
          SELECT r.channel, r.rn // {SE_WINDOW} AS win, r.xq, m.med_q,
                 LAG(r.xq) OVER (PARTITION BY r.channel,
                     r.rn // {SE_WINDOW} ORDER BY r.rn) AS prev
          FROM rk r JOIN med m ON r.channel = m.channel
        ),
        g AS (
          SELECT channel, CAST(win AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(ABS(xq - prev)), 0) AS BIGINT) AS ll_q,
                 CAST(COALESCE(SUM(CASE WHEN (prev - med_q) * (xq - med_q)
                     < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS crossings
          FROM t GROUP BY channel, win
          HAVING COUNT(*) = {SE_WINDOW}
        )
        SELECT channel, win, n, ll_q,
               CAST(ll_q AS DOUBLE) / {SE_QUANT} AS line_length,
               crossings,
               CAST(crossings AS DOUBLE) / (n - 1) AS zcr
        FROM g
        """,
        "samples",
    )

    # Permutation entropy: the pattern CASE and the nano-nat entropy
    # fold are imported from the operator module VERBATIM (the
    # granger shared-expression discipline) — both engines classify
    # and fold with the identical text.
    from pennsieve_streaming_spark.operators.stats import (
        PE_NORM as _PE_NORM,
        PE_PATTERN_T as _PE_PAT,
    )

    _pe_cnt = ",\n                 ".join(
        f"CAST(COALESCE(SUM(CASE WHEN pat = {i} THEN 1 ELSE 0 END), 0)"
        f" AS BIGINT) AS c{i}"
        for i in range(6)
    )
    sql["ts_permutation_entropy"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        t AS (
          SELECT channel, rn // {SE_WINDOW} AS win, xq,
                 LEAD(xq, 1) OVER (PARTITION BY channel,
                     rn // {SE_WINDOW} ORDER BY rn) AS nb,
                 LEAD(xq, 2) OVER (PARTITION BY channel,
                     rn // {SE_WINDOW} ORDER BY rn) AS nc
          FROM rk
        ),
        p AS (
          SELECT channel, win,
                 {_PE_PAT.format(a="xq", b="nb", c="nc")} AS pat
          FROM t
        ),
        g AS (
          SELECT channel, CAST(win AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(pat) AS BIGINT) AS nt,
                 {_pe_cnt}
          FROM p GROUP BY channel, win
          HAVING COUNT(*) = {SE_WINDOW}
        )
        SELECT channel, win, n, nt, c0, c1, c2, c3, c4, c5,
               {_PE_NORM} AS pe_norm
        FROM g
        """,
        "samples",
    )

    # Higher moments: the mean and every fold term are imported from
    # hm_exprs verbatim; DuckDB transforms then list_reduces — the
    # identical left fold Spark's aggregate() runs.
    from pennsieve_streaming_spark.operators.stats import (
        hm_exprs as _hm_exprs,
    )

    _hm = _hm_exprs(SE_QUANT)
    _hm_fold = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(xs, x -> {term})), (a, b) -> a + b)"
    )
    sql["ts_higher_moments"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        g AS (
          SELECT channel, CAST(rn // {SE_WINDOW} AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS sx,
                 list(xq ORDER BY rn % {SE_WINDOW}) AS xs
          FROM rk GROUP BY channel, rn // {SE_WINDOW}
          HAVING COUNT(*) = {SE_WINDOW}
        ),
        m AS (
          SELECT channel, win, n,
                 {_hm["mean"]} AS mean,
                 {_hm_fold.format(term=_hm["t2"])} / n AS m2,
                 {_hm_fold.format(term=_hm["t3"])} / n AS _m3,
                 {_hm_fold.format(term=_hm["t4"])} / n AS _m4
          FROM g
        )
        SELECT channel, win, n, mean, m2,
               {_hm["skew"]} AS skewness,
               {_hm["kurt"]} AS kurtosis_excess
        FROM m
        """,
        "samples",
    )

    # Uneven-timestamp periodogram: identical integer phase-bin trig
    # literals (phase_tables) and the shared power finish; the median
    # centering mirrors ts_line_length's order statistic.
    from pennsieve_streaming_spark.dsp.spectral import (
        periodogram_power_expr as _up_power,
        phase_tables as _up_tables,
    )

    _up_cq, _up_sq = _up_tables(UP_K)
    _up_p = ", ".join(str(int(p)) for p in UP_PERIODS)
    sql["ts_uneven_periodogram"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n FROM rk
          GROUP BY channel
        ),
        medr AS (
          SELECT channel, xq, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY xq, ts, value) AS ar
          FROM rk
        ),
        med AS (
          SELECT m.channel, m.xq AS med_q
          FROM medr m JOIN cnt c ON m.channel = c.channel
          WHERE m.ar = (c.n + 1) // 2
        ),
        pp AS (SELECT UNNEST([{_up_p}]) AS period_us),
        ctab AS (SELECT [{", ".join(str(v) for v in _up_cq)}] AS cq,
                        [{", ".join(str(v) for v in _up_sq)}] AS sq),
        t AS (
          SELECT r.channel, p.period_us, (r.xq - m.med_q) AS xc,
                 CAST((r.ts % p.period_us) * {UP_K} // p.period_us
                      AS INTEGER) AS idx
          FROM rk r JOIN med m ON r.channel = m.channel
          CROSS JOIN pp p
        ),
        g AS (
          SELECT channel, CAST(period_us AS BIGINT) AS period_us,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xc * cq[idx + 1]) AS BIGINT) AS sc,
                 CAST(SUM(xc * sq[idx + 1]) AS BIGINT) AS ss
          FROM t CROSS JOIN ctab
          GROUP BY channel, period_us
        )
        SELECT channel, period_us, n, sc, ss,
               {_up_power(SE_QUANT)} AS power
        FROM g
        """,
        "samples",
    )

    # Streaming periodogram drains to the identical table (associative
    # sums + shared finish + batch-median calibration centers).
    sql["stream_periodogram"] = sql["ts_uneven_periodogram"]


    # LZ76 complexity: the recursive CTE consumes exactly one phrase
    # per recursion step — p advances by the shortest non-reproducible
    # extension's length (list_max over candidate lengths whose
    # substring occurs in the prefix ending one char before the
    # phrase's end; self-overlap allowed), the kernel's parse
    # replayed verbatim. log2(ws) is a Python-evaluated literal.
    _lz_log2 = repr(__import__("math").log2(SE_WINDOW))
    sql["ts_lz_complexity"] = f"""
        WITH RECURSIVE samples AS ({TBL.DUCKDB_VIEWS['samples']}),
        rk AS (
          SELECT channel,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        wpos AS (
          SELECT channel, rn // {SE_WINDOW} AS win, rn % {SE_WINDOW} AS pos,
                 xq,
                 ROW_NUMBER() OVER (PARTITION BY channel,
                     rn // {SE_WINDOW} ORDER BY xq, rn % {SE_WINDOW})
                   AS ar
          FROM rk
        ),
        med AS (
          SELECT channel, win, xq AS med_q FROM wpos
          WHERE ar = ({SE_WINDOW} + 1) // 2
        ),
        bits AS (
          SELECT w.channel, CAST(w.win AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN w.xq > m.med_q THEN 1 ELSE 0 END)
                      AS BIGINT) AS ones,
                 string_agg(CASE WHEN w.xq > m.med_q THEN '1' ELSE '0'
                     END, '' ORDER BY w.pos) AS s
          FROM wpos w JOIN med m ON w.channel = m.channel
               AND w.win = m.win
          GROUP BY w.channel, w.win
          HAVING COUNT(*) = {SE_WINDOW}
        ),
        lz AS (
          SELECT channel, win, n, ones, s, 1 AS p, 0 AS c FROM bits
          UNION ALL
          SELECT channel, win, n, ones, s,
                 p + LEAST(
                   COALESCE(list_max(list_filter(
                     generate_series(1, CAST(n AS INTEGER) - p + 1),
                     L -> position(substr(s, p, L)
                          IN substr(s, 1, p + L - 2)) > 0)) + 1, 1),
                   CAST(n AS INTEGER) - p + 1) AS p,
                 c + 1 AS c
          FROM lz WHERE p <= n
        )
        SELECT channel, win, n, ones,
               CAST(c AS BIGINT) AS c_phrases,
               CAST(c AS DOUBLE) * {_lz_log2} / n AS lz_norm
        FROM lz WHERE p = n + 1
        """

    # Streaming LZ76 drains to the identical table (count-window state
    # carry + the same kernel + Spark-side quantization).
    sql["stream_lz"] = sql["ts_lz_complexity"]

    sql["ts_tkeo_energy"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        t AS (
          SELECT channel, rn // {SE_WINDOW} AS win, xq,
                 xq * xq - LAG(xq) OVER w * LEAD(xq) OVER w AS psi
          FROM rk
          WINDOW w AS (PARTITION BY channel, rn // {SE_WINDOW}
                       ORDER BY rn)
        ),
        g AS (
          SELECT channel, CAST(win AS BIGINT) AS win,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(psi) AS BIGINT) AS n_valid,
                 CAST(COALESCE(SUM(psi), 0) AS BIGINT) AS tkeo_sum_q
          FROM t GROUP BY channel, win
          HAVING COUNT(*) = {SE_WINDOW}
        )
        SELECT channel, win, n_valid, tkeo_sum_q,
               CAST(round(CAST(tkeo_sum_q AS DOUBLE)
                    / ({SE_QUANT}.0 * {SE_QUANT}.0) / n_valid * 1000)
                    AS BIGINT) AS tkeo_mq
        FROM g
        """,
        "samples",
    )

    sql["ts_burst_suppression"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 abs(CAST(round(value * {SE_QUANT}) AS BIGINT)) AS aq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM samples
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n FROM rk
          GROUP BY channel
        ),
        medr AS (
          SELECT channel, aq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY aq, ts, value) AS ar
          FROM rk
        ),
        med AS (
          SELECT m.channel, m.aq AS med_q
          FROM medr m JOIN cnt c ON m.channel = c.channel
          WHERE m.ar = (c.n + 1) // 2
        ),
        flg AS (
          SELECT r.channel, r.rn, (2 * r.aq < m.med_q) AS supp
          FROM rk r JOIN med m ON r.channel = m.channel
        ),
        grp AS (
          SELECT channel, rn, supp,
                 CASE WHEN supp THEN rn - ROW_NUMBER() OVER (
                     PARTITION BY channel, supp ORDER BY rn) END AS g
          FROM flg
        ),
        runs AS (
          SELECT channel, g, COUNT(*) AS run_len
          FROM grp WHERE supp GROUP BY channel, g
        ),
        mk AS (
          SELECT gr.channel, gr.rn,
                 CASE WHEN gr.supp AND r.run_len >= {BS_MIN_RUN}
                      THEN 1 ELSE 0 END AS in_run
          FROM grp gr LEFT JOIN runs r
            ON gr.channel = r.channel AND gr.g = r.g
        )
        SELECT channel, CAST(rn // {SE_WINDOW} AS BIGINT) AS win,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(in_run) AS BIGINT) AS suppressed_n,
               CAST(SUM(in_run) AS DOUBLE) / COUNT(*) AS bsr
        FROM mk GROUP BY channel, rn // {SE_WINDOW}
        """,
        "samples",
    )

    _ws_aggs = ", ".join(
        _pct_terms(p, nm)[0] for p, nm in ((0.05, "p05"), (0.95, "p95"))
    )
    _ws_posts = ", ".join(
        _pct_terms(p, nm)[1] for p, nm in ((0.05, "p05"), (0.95, "p95"))
    )
    sql["ev_kleinberg_bursts"] = f"""
        WITH RECURSIVE chan_events AS
          ({TBL.DUCKDB_VIEWS['chan_events']}),
        g0 AS (
          SELECT channel, ts,
                 LAG(ts) OVER (PARTITION BY channel ORDER BY ts) AS prev_ts
          FROM chan_events
        ),
        gaps AS (
          SELECT channel, prev_ts AS gap_start_ts, ts AS gap_end_ts,
                 ts - prev_ts AS x,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, prev_ts) - 1 AS i
          FROM g0 WHERE prev_ts IS NOT NULL
        ),
        pr AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(gap_end_ts) - MIN(gap_start_ts) AS BIGINT) AS span
          FROM gaps GROUP BY channel
          HAVING COUNT(*) >= 2
             AND MAX(gap_end_ts) - MIN(gap_start_ts) > 0
        ),
        pp AS (
          SELECT channel, n,
                 CAST(n AS DOUBLE) / CAST(span AS DOUBLE) AS lam0,
                 {KB_S!r} * (CAST(n AS DOUBLE) / CAST(span AS DOUBLE))
                   AS lam1,
                 CAST(round(ln(CAST(n AS DOUBLE) / CAST(span AS DOUBLE))
                      * 1000000000) AS BIGINT) AS lnq0,
                 CAST(round(ln({KB_S!r} * (CAST(n AS DOUBLE)
                      / CAST(span AS DOUBLE))) * 1000000000) AS BIGINT)
                   AS lnq1,
                 CAST(round({KB_GAMMA!r} * ln(CAST(n AS DOUBLE))
                      * 1000000000) AS BIGINT) AS trans_q
          FROM pr
        ),
        cg AS (
          SELECT g.channel, g.i, g.gap_start_ts, g.gap_end_ts,
                 CAST(round(p.lam0 * g.x * 1000000000) AS BIGINT) - p.lnq0
                   AS c0,
                 CAST(round(p.lam1 * g.x * 1000000000) AS BIGINT) - p.lnq1
                   AS c1,
                 p.trans_q, p.n
          FROM gaps g JOIN pp p USING (channel)
        ),
        fwd AS (
          SELECT channel, i, c0 AS f0, trans_q + c1 AS f1
          FROM cg WHERE i = 0
          UNION ALL
          SELECT c.channel, c.i,
                 LEAST(r.f0, r.f1) + c.c0 AS f0,
                 LEAST(r.f0 + c.trans_q, r.f1) + c.c1 AS f1
          FROM fwd r JOIN cg c
            ON c.channel = r.channel AND c.i = r.i + 1
        ),
        bwd AS (
          SELECT channel, n - 1 AS i, CAST(0 AS BIGINT) AS b0,
                 CAST(0 AS BIGINT) AS b1
          FROM pp
          UNION ALL
          SELECT r.channel, r.i - 1 AS i,
                 LEAST(c.c0 + r.b0, c.trans_q + c.c1 + r.b1) AS b0,
                 LEAST(c.c0 + r.b0, c.c1 + r.b1) AS b1
          FROM bwd r JOIN cg c
            ON c.channel = r.channel AND c.i = r.i
          WHERE r.i > 0
        ),
        st AS (
          SELECT c.channel, c.i, c.gap_start_ts, c.gap_end_ts
          FROM cg c
          JOIN fwd f ON f.channel = c.channel AND f.i = c.i
          JOIN bwd b ON b.channel = c.channel AND b.i = c.i
          WHERE f.f1 + b.b1 < f.f0 + b.b0
        ),
        isl AS (
          SELECT channel, i, gap_start_ts, gap_end_ts,
                 i - ROW_NUMBER() OVER (PARTITION BY channel ORDER BY i)
                   AS grp
          FROM st
        )
        SELECT channel, CAST(MIN(gap_start_ts) AS BIGINT) AS start_ts,
               CAST(MAX(gap_end_ts) AS BIGINT) AS end_ts,
               CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM isl GROUP BY channel, grp
        """

    _ks_f = "(1.0e0 - exp(-lam * CAST(x AS DOUBLE)))"
    sql["ev_interarrival_ks"] = f"""
        WITH chan_events AS ({TBL.DUCKDB_VIEWS['chan_events']}),
        g0 AS (
          SELECT channel, ts,
                 LAG(ts) OVER (PARTITION BY channel ORDER BY ts)
                   AS prev_ts
          FROM chan_events
        ),
        gaps AS (
          SELECT channel, prev_ts AS a, ts AS b, ts - prev_ts AS x
          FROM g0 WHERE prev_ts IS NOT NULL
        ),
        pr AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(b) - MIN(a) AS BIGINT) AS span
          FROM gaps GROUP BY channel
          HAVING COUNT(*) >= 2 AND MAX(b) - MIN(a) > 0
        ),
        pp AS (
          SELECT channel, n,
                 CAST(n AS DOUBLE) / CAST(span AS DOUBLE) AS lam
          FROM pr
        ),
        rk2 AS (
          SELECT g.channel, p.n, p.lam, g.x,
                 ROW_NUMBER() OVER (PARTITION BY g.channel
                     ORDER BY g.x, g.b, g.a) AS i
          FROM gaps g JOIN pp p USING (channel)
        ),
        d AS (
          SELECT channel, n, lam,
                 round(greatest(
                   CAST(i AS DOUBLE) / CAST(n AS DOUBLE) - {_ks_f},
                   {_ks_f} - CAST(i - 1 AS DOUBLE) / CAST(n AS DOUBLE)
                 ), 9) AS dt
          FROM rk2
        ),
        agg2 AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, MAX(lam) AS lam,
                 MAX(dt) AS ks_stat
          FROM d GROUP BY channel
        )
        SELECT channel, n, lam, ks_stat,
               ks_stat > 1.358e0 / sqrt(CAST(n AS DOUBLE)) AS rejected
        FROM agg2
        """

    sql["ev_dispersion"] = f"""
        WITH chan_events AS ({TBL.DUCKDB_VIEWS['chan_events']}),
        per AS (
          SELECT channel, ts // {BURST_BUCKET_US} AS bk,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM chan_events GROUP BY channel, ts // {BURST_BUCKET_US}
        ),
        g AS (
          SELECT channel,
                 CAST(MAX(bk) - MIN(bk) + 1 AS BIGINT) AS n_buckets,
                 CAST(SUM(n) AS BIGINT) AS total,
                 CAST(SUM(n * n) AS BIGINT) AS sum_sq
          FROM per GROUP BY channel
        )
        SELECT channel, n_buckets, total, sum_sq,
               round((CAST(n_buckets AS DOUBLE) * CAST(sum_sq AS DOUBLE)
                 - CAST(total AS DOUBLE) * CAST(total AS DOUBLE))
                 / (CAST(n_buckets AS DOUBLE) * CAST(total AS DOUBLE)), 9)
                 AS dispersion
        FROM g
        """

    _bl = "CAST(total AS DOUBLE) / CAST(n_buckets AS DOUBLE)"
    _bz = f"(CAST(n AS DOUBLE) - {_bl}) / sqrt({_bl})"
    sql["ev_rate_bursts"] = with_views(
        f"""
        WITH per_bucket AS (
          SELECT channel, (ts // {BURST_BUCKET_US}) * {BURST_BUCKET_US} AS bucket_ts,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM chan_events GROUP BY channel, (ts // {BURST_BUCKET_US}) * {BURST_BUCKET_US}
        ),
        base AS (
          SELECT channel, CAST(SUM(n) AS BIGINT) AS total,
                 CAST((MAX(bucket_ts) - MIN(bucket_ts)) / {BURST_BUCKET_US} + 1 AS BIGINT) AS n_buckets
          FROM per_bucket GROUP BY channel
        )
        SELECT p.channel, p.bucket_ts, p.n, {_bz} AS z
        FROM per_bucket p JOIN base USING (channel)
        WHERE round({_bz}, 9) > {BURST_Z!r}
        """,
        "chan_events",
    )

    sql["ev_key_skew"] = """
        WITH counts AS (
          SELECT CAST(user_id AS VARCHAR) AS key,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY CAST(user_id AS VARCHAR)
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
        SELECT key, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
               CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
        FROM counts CROSS JOIN tot
        ORDER BY n DESC, key LIMIT 10
        """

    sql["ts_event_xcorr"] = with_views(
        f"""
        WITH ev AS (SELECT channel, ts FROM chan_events),
        pairs AS (
          SELECT a.channel AS ch_a, b.channel AS ch_b, b.ts - a.ts AS dt
          FROM ev a JOIN ev b
            ON a.channel < b.channel
           AND b.ts - a.ts >= -{XC_LAG_US} AND b.ts - a.ts < {XC_LAG_US}
        )
        SELECT ch_a, ch_b, (dt + {XC_LAG_US}) // {XC_BIN_US} AS lag_bin,
               ((dt + {XC_LAG_US}) // {XC_BIN_US}) * {XC_BIN_US}
                 - {XC_LAG_US} AS lag_lo_us,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs
        GROUP BY ch_a, ch_b, (dt + {XC_LAG_US}) // {XC_BIN_US}
        """,
        "chan_events",
    )

    _DU = 86_400 * 1_000_000
    sql["ev_stickiness"] = f"""
        WITH ud AS (
          SELECT DISTINCT (epoch_us(ts) // {_DU}) * {_DU} AS day, user_id
          FROM events
        ),
        dau AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
        ),
        supported AS (
          SELECT DISTINCT
                 UNNEST(generate_series(day, day + 29 * {_DU}, {_DU})) AS day,
                 user_id
          FROM ud
        ),
        mau AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS mau
          FROM supported GROUP BY day
        )
        SELECT d.day, d.dau, m.mau,
               CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness
        FROM dau d JOIN mau m ON d.day = m.day
        """

    sql["ts_flatline_runs"] = with_views(
        """
        WITH flagged AS (
          SELECT channel, ts, value,
                 CASE WHEN LAG(value) OVER w IS NULL
                        OR LAG(value) OVER w != value
                      THEN 1 ELSE 0 END AS new_run
          FROM chan_events
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value)
        ),
        keyed AS (
          SELECT channel, ts, value,
                 SUM(new_run) OVER (PARTITION BY channel
                     ORDER BY ts, value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
          FROM flagged
        )
        SELECT channel, MIN(value) AS value, MIN(ts) AS run_start,
               MAX(ts) AS run_end, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM keyed GROUP BY channel, run
        HAVING COUNT(*) >= 2
        """,
        "chan_events",
    )

    sql["ts_event_autocorr"] = with_views(
        f"""
        WITH ev AS (SELECT channel, ts FROM chan_events),
        pairs AS (
          SELECT a.channel, b.ts - a.ts AS dt
          FROM ev a JOIN ev b
            ON a.channel = b.channel
           AND b.ts - a.ts > 0 AND b.ts - a.ts <= {XC_LAG_US}
        )
        SELECT channel, (dt - 1) // {XC_BIN_US} AS lag_bin,
               ((dt - 1) // {XC_BIN_US}) * {XC_BIN_US} AS lag_lo_us,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs GROUP BY channel, (dt - 1) // {XC_BIN_US}
        """,
        "chan_events",
    )

    sql["ts_winsorize"] = with_views(
        f"""
        WITH ranked AS (
          SELECT channel, value,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY value, ts)
                   - 1 AS rn,
                 COUNT(*) OVER (PARTITION BY channel) AS n
          FROM samples
        ),
        agg AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n, {_ws_aggs}
          FROM ranked GROUP BY channel
        ),
        cuts AS (SELECT channel, {_ws_posts} FROM agg)
        SELECT s.channel, s.ts, s.value,
               LEAST(GREATEST(s.value, c.p05), c.p95) AS clamped,
               s.value != LEAST(GREATEST(s.value, c.p05), c.p95) AS was_clipped
        FROM samples s JOIN cuts c ON s.channel = c.channel
        """,
        "samples",
    )

    _DAY = GRID_INTERVAL_US
    _corr_r = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
        "* sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    _corr_pos = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0 AND "
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0"
    )
    sql["ts_channel_correlation"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        pr AS (
          SELECT a.channel AS ch_a, b2.channel AS ch_b, a.xq AS xa,
                 b2.xq AS xb
          FROM vals a JOIN vals b2
            ON a.ts = b2.ts AND a.channel < b2.channel
        ),
        agg AS (
          SELECT ch_a, ch_b, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xa) AS BIGINT) AS sx,
                 CAST(SUM(xb) AS BIGINT) AS sy,
                 CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                 CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                 CAST(SUM(xb * xb) AS BIGINT) AS syy
          FROM pr GROUP BY ch_a, ch_b
        )
        SELECT ch_a, ch_b, n,
               CASE WHEN {_corr_pos} THEN round({_corr_r}, 9)
                    ELSE CAST(0 AS DOUBLE) END AS r
        FROM agg
        """,
        "samples",
        "channels",
    )

    sql["ts_detect_peaks"] = with_views(
        f"""
        WITH x AS (
          SELECT channel, ts, value,
                 LAG(value) OVER w AS prev, LEAD(value) OVER w AS nxt
          FROM samples
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value)
        )
        SELECT channel, ts, value,
               value - GREATEST(prev, nxt) AS rise
        FROM x
        WHERE prev IS NOT NULL AND nxt IS NOT NULL
          AND value > prev AND value >= nxt
          AND value > {_dblit(PEAK_HEIGHT)}
          AND value - GREATEST(prev, nxt) >= {_dblit(PEAK_PROM)}
        """,
        "samples",
    )

    # Randomness panel: exact integer counts, the two z finishes
    # imported verbatim.
    from pennsieve_streaming_spark.operators.stats import (
        RUNS_Z as _RUNS_Z,
        TP_Z as _TP_Z,
    )

    sql["ts_randomness_tests"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel, ts, value,
                 CAST(round(value * {SE_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n FROM rk
          GROUP BY channel
        ),
        medr AS (
          SELECT channel, xq,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY xq, ts, value) AS ar
          FROM rk
        ),
        med AS (
          SELECT m.channel, m.xq AS med_q
          FROM medr m JOIN cnt c ON m.channel = c.channel
          WHERE m.ar = (c.n + 1) // 2
        ),
        x AS (
          SELECT r.channel, r.xq, m.med_q,
                 LAG(r.xq) OVER w AS prev, LEAD(r.xq) OVER w AS nxt,
                 (r.xq > m.med_q) AS above,
                 LAG(r.xq > m.med_q) OVER w AS pabove
          FROM rk r JOIN med m ON r.channel = m.channel
          WINDOW w AS (PARTITION BY r.channel ORDER BY r.ts, r.value)
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
                     AND ((prev < xq AND xq > nxt)
                          OR (prev > xq AND xq < nxt))
                     THEN 1 ELSE 0 END) AS BIGINT) AS turning_points,
                 CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_above,
                 CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_below,
                 CAST(1 + SUM(CASE WHEN pabove IS NOT NULL
                     AND above <> pabove THEN 1 ELSE 0 END) AS BIGINT)
                   AS runs
          FROM x GROUP BY channel
        )
        SELECT channel, n, turning_points,
               {_TP_Z} AS tp_z,
               n_above, n_below, runs,
               {_RUNS_Z} AS runs_z
        FROM g
        """,
        "samples",
    )

    # CA-CFAR: exact frame sums over the same (ts, value) sort; the
    # integer cross-multiplied predicate needs no shared float text.
    sql["ts_cfar_peaks"] = with_views(
        f"""
        WITH x AS (
          SELECT channel, ts, value,
                 abs(CAST(round(value * {SE_QUANT}) AS BIGINT)) AS aq
          FROM samples
        ),
        fr AS (
          SELECT channel, ts, value, aq,
                 COALESCE(SUM(aq) OVER (PARTITION BY channel
                   ORDER BY ts, value ROWS BETWEEN {CFAR_GUARD + CFAR_TRAIN}
                   PRECEDING AND {CFAR_GUARD + 1} PRECEDING), 0) AS s_lo,
                 COUNT(*) OVER (PARTITION BY channel
                   ORDER BY ts, value ROWS BETWEEN {CFAR_GUARD + CFAR_TRAIN}
                   PRECEDING AND {CFAR_GUARD + 1} PRECEDING) AS n_lo,
                 COALESCE(SUM(aq) OVER (PARTITION BY channel
                   ORDER BY ts, value ROWS BETWEEN {CFAR_GUARD + 1}
                   FOLLOWING AND {CFAR_GUARD + CFAR_TRAIN} FOLLOWING), 0)
                   AS s_hi,
                 COUNT(*) OVER (PARTITION BY channel
                   ORDER BY ts, value ROWS BETWEEN {CFAR_GUARD + 1}
                   FOLLOWING AND {CFAR_GUARD + CFAR_TRAIN} FOLLOWING)
                   AS n_hi
          FROM x
        )
        SELECT channel, ts, value, aq,
               CAST(s_lo + s_hi AS BIGINT) AS train_sum,
               CASE WHEN s_lo + s_hi > 0 THEN
                 CAST(aq * {2 * CFAR_TRAIN} AS DOUBLE) / (s_lo + s_hi)
               END AS score
        FROM fr
        WHERE n_lo = {CFAR_TRAIN} AND n_hi = {CFAR_TRAIN}
          AND aq * {2 * CFAR_TRAIN} * {CFAR_DEN}
              > {CFAR_NUM} * (s_lo + s_hi)
        """,
        "samples",
    )

    # ISI panel: composes the gated peak SQL; gaps floor to seconds,
    # the CV/burstiness finishes import from the operator verbatim.
    from pennsieve_streaming_spark.operators.stats import (
        ISI_BURSTINESS as _ISI_B,
        ISI_CV as _ISI_CV,
        ISI_MEAN as _ISI_M,
    )

    sql["ts_isi_cv"] = f"""
        WITH pk AS ({sql["ts_detect_peaks"]}),
        g AS (
          SELECT channel,
                 (ts - LAG(ts) OVER (PARTITION BY channel
                     ORDER BY ts, value)) // 1000000 AS g_s
          FROM pk
        ),
        agg AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_isi,
                 CAST(SUM(g_s) AS BIGINT) AS sum_s,
                 CAST(SUM(g_s * g_s) AS BIGINT) AS sum_s2,
                 CAST(MIN(g_s) AS BIGINT) AS min_s,
                 CAST(MAX(g_s) AS BIGINT) AS max_s
          FROM g WHERE g_s IS NOT NULL GROUP BY channel
        )
        SELECT channel, n_isi, sum_s, sum_s2, min_s, max_s,
               {_ISI_M} AS mean_s,
               {_ISI_CV} AS cv,
               {_ISI_B} AS burstiness
        FROM agg
        """

    from pennsieve_streaming_spark.operators.stats import (
        HRV_PNN50 as _HRV_P,
        HRV_RMSSD as _HRV_R,
    )

    sql["ts_hrv_metrics"] = f"""
        WITH pk AS ({sql["ts_detect_peaks"]}),
        g AS (
          SELECT channel,
                 (ts - LAG(ts) OVER w) // 1000000 AS g_s,
                 ts, value
          FROM pk
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value)
        ),
        d AS (
          SELECT channel,
                 g_s - LAG(g_s) OVER (PARTITION BY channel
                     ORDER BY ts, value) AS dd
          FROM g WHERE g_s IS NOT NULL
        ),
        agg AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_diffs,
                 CAST(SUM(dd * dd) AS BIGINT) AS sum_d2,
                 CAST(SUM(CASE WHEN abs(dd) > {HRV_NN_S} THEN 1 ELSE 0
                     END) AS BIGINT) AS nn50
          FROM d WHERE dd IS NOT NULL GROUP BY channel
        )
        SELECT channel, n_diffs, sum_d2, nn50,
               {_HRV_R} AS rmssd_s,
               {_HRV_P} AS pnn
        FROM agg
        """

    _xcorr_lags = ", ".join(str(x) for x in XCORR_LAGS_US)
    sql["ts_cross_correlation"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        lagged AS (
          SELECT channel, UNNEST([{_xcorr_lags}]) AS lag_us,
                 ts AS ts_b, xq AS xb
          FROM vals
        ),
        pr AS (
          SELECT a.channel AS ch_a, l.channel AS ch_b,
                 CAST(l.lag_us AS BIGINT) AS lag_us, a.xq AS xa, l.xb
          FROM vals a JOIN lagged l
            ON a.ts = l.ts_b - l.lag_us AND a.channel < l.channel
        ),
        agg AS (
          SELECT ch_a, ch_b, lag_us, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xa) AS BIGINT) AS sx,
                 CAST(SUM(xb) AS BIGINT) AS sy,
                 CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                 CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                 CAST(SUM(xb * xb) AS BIGINT) AS syy
          FROM pr GROUP BY ch_a, ch_b, lag_us
        )
        SELECT ch_a, ch_b, lag_us, n,
               CASE WHEN {_corr_pos} THEN round({_corr_r}, 9)
                    ELSE CAST(0 AS DOUBLE) END AS r
        FROM agg
        """,
        "samples",
        "channels",
    )

    # Granger screen: same LOCF-day-grid CTE, lag-1 self-joins, and
    # the IMPORTED G_* expression strings (guaranteed text identity
    # with the Spark side)
    from pennsieve_streaming_spark.operators.stats import (
        G_BETA_AR as _G_BAR,
        G_BETA_X as _G_BX,
        G_PARTIAL_R as _G_PR,
    )

    sql["ts_theil_sen"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts AS t,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        prs AS (
          SELECT a.channel, a.t AS ti, bb.t AS tj,
                 CAST(bb.xq - a.xq AS DOUBLE)
                   / (CAST(bb.t - a.t AS DOUBLE) / {_DAY})
                   / {CORR_QUANT} AS slope
          FROM vals a JOIN vals bb
            ON a.channel = bb.channel AND a.t < bb.t
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM prs GROUP BY channel
        ),
        npts AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM vals GROUP BY channel
        ),
        med AS (
          SELECT p.channel, c.n_pairs, p.slope AS slope_per_day FROM (
            SELECT channel, slope, ti, tj,
                   ROW_NUMBER() OVER (PARTITION BY channel
                       ORDER BY slope, ti, tj) AS _ar
            FROM prs
          ) p JOIN cnt c ON p.channel = c.channel
          WHERE p._ar = (c.n_pairs + 1) // 2
        )
        SELECT m.channel, n.n_points, m.n_pairs, m.slope_per_day
        FROM med m JOIN npts n ON m.channel = n.channel
        """,
        "samples",
        "channels",
    )

    sql["ts_entropy_rate"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        ext AS (
          SELECT channel, MIN(xq) AS mn, MAX(xq) AS mx
          FROM vals GROUP BY channel
        ),
        binned AS (
          SELECT v.channel, v.ts,
                 CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                      ELSE ((xq - mn) * 8) // (mx - mn + 1) END AS bin
          FROM vals v JOIN ext e ON v.channel = e.channel
        ),
        prs AS (
          SELECT channel,
                 LAG(bin) OVER (PARTITION BY channel ORDER BY ts) AS bi,
                 bin AS bj
          FROM binned
        ),
        cell AS (
          SELECT channel, bi, bj, CAST(COUNT(*) AS BIGINT) AS n_ij
          FROM prs WHERE bi IS NOT NULL GROUP BY channel, bi, bj
        ),
        ri AS (
          SELECT channel, bi, CAST(SUM(n_ij) AS BIGINT) AS r_i
          FROM cell GROUP BY channel, bi
        ),
        nn AS (
          SELECT channel, CAST(SUM(n_ij) AS BIGINT) AS n
          FROM cell GROUP BY channel
        ),
        wts AS (
          SELECT c.channel, nn.n,
                 CAST(c.n_ij AS HUGEINT) * (
                   CAST(round(ln(CAST(c.n_ij AS DOUBLE)) * 1000000000) AS BIGINT) - CAST(round(ln(CAST(ri.r_i AS DOUBLE)) * 1000000000) AS BIGINT)
                 ) AS w
          FROM cell c
          JOIN ri ON c.channel = ri.channel AND c.bi = ri.bi
          JOIN nn ON c.channel = nn.channel
        )
        SELECT channel, CAST(MAX(n) AS BIGINT) AS n,
               -(CAST(SUM(w) AS DOUBLE) / 1000000000) / MAX(n)
                 AS entropy_rate,
               (-(CAST(SUM(w) AS DOUBLE) / 1000000000) / MAX(n))
                 / 2.07944154167983575e+00 AS normalized
        FROM wts GROUP BY channel
        """,
        "samples",
        "channels",
    )

    sql["ts_mutual_info"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        ext AS (
          SELECT channel, MIN(xq) AS mn, MAX(xq) AS mx
          FROM vals GROUP BY channel
        ),
        binned AS (
          SELECT v.channel, v.ts,
                 CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                      ELSE ((xq - mn) * 8) // (mx - mn + 1) END AS bin
          FROM vals v JOIN ext e ON v.channel = e.channel
        ),
        joint AS (
          SELECT l.channel AS ch_x, r.channel AS ch_y,
                 l.bin AS bx, r.bin AS byy,
                 CAST(COUNT(*) AS BIGINT) AS n_ij
          FROM binned l JOIN binned r
            ON l.ts = r.ts AND l.channel < r.channel
          GROUP BY l.channel, r.channel, l.bin, r.bin
        ),
        rx AS (
          SELECT ch_x, ch_y, bx, CAST(SUM(n_ij) AS BIGINT) AS r_i
          FROM joint GROUP BY ch_x, ch_y, bx
        ),
        cy AS (
          SELECT ch_x, ch_y, byy, CAST(SUM(n_ij) AS BIGINT) AS c_j
          FROM joint GROUP BY ch_x, ch_y, byy
        ),
        nn AS (
          SELECT ch_x, ch_y, CAST(SUM(n_ij) AS BIGINT) AS n
          FROM joint GROUP BY ch_x, ch_y
        ),
        wts AS (
          SELECT j.ch_x, j.ch_y, nn.n,
                 CAST(j.n_ij AS HUGEINT) * (
                   CAST(round(ln(CAST(j.n_ij AS DOUBLE)) * 1000000000) AS BIGINT) + CAST(round(ln(CAST(nn.n AS DOUBLE)) * 1000000000) AS BIGINT)
                   - CAST(round(ln(CAST(rx.r_i AS DOUBLE)) * 1000000000) AS BIGINT) - CAST(round(ln(CAST(cy.c_j AS DOUBLE)) * 1000000000) AS BIGINT)
                 ) AS w
          FROM joint j
          JOIN rx ON j.ch_x = rx.ch_x AND j.ch_y = rx.ch_y
                 AND j.bx = rx.bx
          JOIN cy ON j.ch_x = cy.ch_x AND j.ch_y = cy.ch_y
                 AND j.byy = cy.byy
          JOIN nn ON j.ch_x = nn.ch_x AND j.ch_y = nn.ch_y
        )
        SELECT ch_x, ch_y, CAST(MAX(n) AS BIGINT) AS n,
               (CAST(SUM(w) AS DOUBLE) / 1000000000) / MAX(n) AS mi
        FROM wts GROUP BY ch_x, ch_y
        """,
        "samples",
        "channels",
    )

    sql["ts_granger_screen"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        yl AS (
          SELECT c.channel AS ch_dst, c.ts, c.xq AS yq, p.xq AS y1q
          FROM vals c JOIN vals p
            ON p.channel = c.channel AND p.ts + {_DAY} = c.ts
        ),
        rws AS (
          SELECT x.channel AS ch_src, y.ch_dst, y.yq, y.y1q, x.xq AS x1q
          FROM yl y JOIN vals x
            ON x.ts + {_DAY} = y.ts AND x.channel <> y.ch_dst
        ),
        agg AS (
          SELECT ch_src, ch_dst, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yq) AS BIGINT) AS sy,
                 CAST(SUM(y1q) AS BIGINT) AS sy1,
                 CAST(SUM(x1q) AS BIGINT) AS sx1,
                 CAST(SUM(yq * yq) AS BIGINT) AS syy,
                 CAST(SUM(y1q * y1q) AS BIGINT) AS sy1y1,
                 CAST(SUM(x1q * x1q) AS BIGINT) AS sx1x1,
                 CAST(SUM(yq * y1q) AS BIGINT) AS syy1,
                 CAST(SUM(yq * x1q) AS BIGINT) AS syx1,
                 CAST(SUM(y1q * x1q) AS BIGINT) AS sy1x1
          FROM rws GROUP BY ch_src, ch_dst
        )
        SELECT ch_src, ch_dst, n,
               {_G_BAR} AS beta_ar,
               {_G_BX} AS beta_x,
               {_G_PR} AS partial_r
        FROM agg
        """,
        "samples",
        "channels",
    )

    from pennsieve_streaming_spark.operators.stats import ar2_exprs

    # Dickey-Fuller: the same day-grid LOCF replay, one lag, three
    # exact moments, the shared rho/t finishes.
    from pennsieve_streaming_spark.operators.stats import (
        DF_CRIT as _DF_CRIT,
        DF_RHO as _DF_RHO,
        DF_TSTAT as _DF_T,
    )

    sql["ts_adf_test"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        lagged AS (
          SELECT channel,
                 LAG(xq) OVER (PARTITION BY channel ORDER BY ts)
                   AS prev,
                 xq
          FROM vals
        ),
        d AS (
          SELECT channel, prev, xq - prev AS dx FROM lagged
          WHERE prev IS NOT NULL
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(prev * prev) AS BIGINT) AS sxx,
                 CAST(SUM(prev * dx) AS BIGINT) AS sxd,
                 CAST(SUM(dx * dx) AS BIGINT) AS sdd
          FROM d GROUP BY channel
        )
        SELECT channel, n, sxx, sxd, sdd,
               {_DF_RHO} AS rho,
               {_DF_T} AS t_stat,
               {_DF_T} < {_DF_CRIT} AS stationary
        FROM g
        """,
        "samples",
        "channels",
    )

    _a2 = ar2_exprs(CORR_QUANT)
    sql["ts_ar2_model"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS yq
          FROM f WHERE is_grid = 1
        ),
        lagged AS (
          SELECT channel, ts, yq,
                 LAG(yq, 1) OVER (PARTITION BY channel ORDER BY ts) AS y1,
                 LAG(yq, 2) OVER (PARTITION BY channel ORDER BY ts) AS y2
          FROM vals
        ),
        agg AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yq) AS BIGINT) AS sy,
                 CAST(SUM(yq * yq) AS BIGINT) AS s0,
                 CAST(COUNT(y1) AS BIGINT) AS n1,
                 CAST(COALESCE(SUM(yq * y1), 0) AS BIGINT) AS s1,
                 CAST(COALESCE(SUM(CASE WHEN y1 IS NOT NULL THEN yq END),
                      0) AS BIGINT) AS sb1,
                 CAST(COALESCE(SUM(y1), 0) AS BIGINT) AS sa1,
                 CAST(COUNT(y2) AS BIGINT) AS n2,
                 CAST(COALESCE(SUM(yq * y2), 0) AS BIGINT) AS s2,
                 CAST(COALESCE(SUM(CASE WHEN y2 IS NOT NULL THEN yq END),
                      0) AS BIGINT) AS sb2,
                 CAST(COALESCE(SUM(y2), 0) AS BIGINT) AS sa2
          FROM lagged GROUP BY channel
        )
        SELECT channel, n,
               {_a2['phi1']} AS phi1,
               {_a2['phi2']} AS phi2,
               {_a2['sigma2_q']} AS sigma2_q
        FROM agg
        """,
        "samples",
        "channels",
    )

    _sd_trend = f"round(CAST(st AS DOUBLE) / (7 * {CORR_QUANT}), 9)"
    _sd_seasonal = (
        f"round(CAST(sdq AS DOUBLE) / (CAST(c AS DOUBLE) * 7 "
        f"* {CORR_QUANT}), 9)"
    )
    sql["ts_seasonal_decompose"] = with_views(
        f"""
        WITH b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts, fill AS value,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS yq
          FROM f WHERE is_grid = 1
        ),
        d AS (
          SELECT channel, ts, value, yq,
                 CAST(SUM(yq) OVER wm AS BIGINT) AS st,
                 CAST(COUNT(yq) OVER wm AS BIGINT) AS nw,
                 CAST((ts // {_DAY}) % 7 AS BIGINT) AS phase
          FROM vals
          WINDOW wm AS (PARTITION BY channel ORDER BY ts
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        dd AS (
          SELECT *, CAST(7 * yq - st AS BIGINT) AS dq
          FROM d WHERE nw = 7
        ),
        seas AS (
          SELECT channel, phase, CAST(SUM(dq) AS BIGINT) AS sdq,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM dd GROUP BY channel, phase
        )
        SELECT dd.channel, dd.ts, dd.phase,
               {_sd_trend} AS trend,
               {_sd_seasonal} AS seasonal,
               round(dd.value - {_sd_trend} - {_sd_seasonal}, 9) AS resid
        FROM dd JOIN seas ON dd.channel = seas.channel
                         AND dd.phase = seas.phase
        """,
        "samples",
        "channels",
    )

    sql["doc_token_entropy"] = f"""
        WITH toks AS (
          SELECT doc_id, lower(t) AS term
          FROM (SELECT doc_id,
                       UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t
                FROM documents)
          WHERE length(lower(t)) > 0
        ),
        c AS (
          SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
          FROM toks GROUP BY doc_id, term
        ),
        n AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS distinct_tokens
          FROM c GROUP BY doc_id
        ),
        hq AS (
          SELECT c.doc_id,
                 SUM(c.c * CAST(round(ln(CAST(c.c AS DOUBLE) / n.n_tokens)
                                      * 1000000000) AS BIGINT)) AS hq
          FROM c JOIN n ON c.doc_id = n.doc_id GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(n.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n.distinct_tokens, 0) AS BIGINT) AS distinct_tokens,
               COALESCE(-(CAST(hq.hq AS DOUBLE) / 1000000000) / n.n_tokens,
                        CAST(0 AS DOUBLE)) AS entropy
        FROM documents d
        LEFT JOIN n ON d.doc_id = n.doc_id
        LEFT JOIN hq ON d.doc_id = hq.doc_id
        """

    _KMV_TWO60 = 1 << 60
    sql["doc_kmv_by_source"] = f"""
        WITH doc_toks3g AS (
          SELECT source, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        sstrg AS (
          SELECT source, UNNEST(
            CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(generate_series(1, len(toks) - 2),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END
          ) AS s
          FROM doc_toks3g
        ),
        h AS (
          SELECT DISTINCT source, {md5_hash64_duck("s")} AS h
          FROM sstrg WHERE s IS NOT NULL
        ),
        ranked AS (
          SELECT source, h,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
          FROM h
        ),
        mins AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_seen,
                 MAX(h) AS kth
          FROM ranked WHERE rn <= 64 GROUP BY source
        )
        SELECT source AS grp, CAST(64 AS BIGINT) AS k, n_seen,
               CASE WHEN n_seen < 64 THEN CAST(-1 AS BIGINT)
                    ELSE CAST(kth AS BIGINT) END AS kth_min,
               CASE WHEN n_seen = 0 THEN CAST(0 AS DOUBLE)
                    WHEN n_seen < 64 THEN CAST(n_seen AS DOUBLE)
                    ELSE round(CAST(63 AS DOUBLE) * {_KMV_TWO60} / kth, 9)
               END AS estimate
        FROM mins
        """

    sql["doc_top_quality_per_lang"] = f"""
        WITH q AS ({sql["doc_quality_score"]}),
        j AS (
          SELECT q.doc_id, d.lang, q.quality
          FROM q JOIN documents d ON q.doc_id = d.doc_id
        ),
        r AS (
          SELECT doc_id, lang, quality,
                 CAST(ROW_NUMBER() OVER (PARTITION BY lang
                      ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
          FROM j
        )
        SELECT doc_id, lang, quality, rank FROM r WHERE rank <= {TOPQ_K}
        """

    # --- round-4b streaming minmax replay ----------------------------
    _smm_chs = ", ".join(f"'{c}'" for c in SMM_CHANNELS)
    sql["stream_minmax_downsample"] = with_views(
        f"""
        WITH mx AS (
          SELECT (MAX(ts) // 1000) * 1000 AS wm FROM samples
          WHERE channel IN ({_smm_chs})
        ),
        agg AS (
          SELECT channel, (ts // {WEEK_US}) * {WEEK_US} AS win_start,
                 MIN(value) AS min_val, MAX(value) AS max_val,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM samples WHERE channel IN ({_smm_chs})
          GROUP BY channel, (ts // {WEEK_US}) * {WEEK_US}
        )
        SELECT a.channel, a.win_start, a.min_val, a.max_val, a.n
        FROM agg a CROSS JOIN mx
        WHERE a.win_start + {WEEK_US} <= mx.wm
        """,
        "samples",
    )

    # --- round-4b CMS / quantization oracles -------------------------
    _H = md5_hash64_duck("tok")
    _cms_buckets = [
        f"((({a} * ({_H}) + {b}) % {P_MINHASH}) % {CMS_WIDTH})"
        for a, b in minhash_perm_constants(CMS_DEPTH)
    ]
    _cms_cnt = " UNION ALL ".join(
        f"SELECT {j} AS rw, {b} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM toks GROUP BY {b}"
        for j, b in enumerate(_cms_buckets)
    )
    _cms_keyed = " UNION ALL ".join(
        f"SELECT tok AS item, {j} AS rw, {b} AS bucket FROM items"
        for j, b in enumerate(_cms_buckets)
    )
    sql["doc_heavy_hitters"] = f"""
        WITH toks AS (
          SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ),
        cnt AS ({_cms_cnt}),
        items AS (
          SELECT DISTINCT tok FROM toks
          WHERE tok IS NOT NULL AND length(tok) > 0
        ),
        keyed AS ({_cms_keyed})
        SELECT item, CAST(MIN(cnt) AS BIGINT) AS est
        FROM keyed k JOIN cnt c ON k.rw = c.rw AND k.bucket = c.bucket
        GROUP BY item
        HAVING MIN(cnt) >= {HH_THRESHOLD}
        """

    # streaming CMS == batch CMS (associative integer counters,
    # bounded d×w state) — same oracle
    sql["stream_heavy_hitters"] = sql["doc_heavy_hitters"]

    sql["emb_int8_quant"] = """
        WITH s AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                     v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings
        ),
        c AS (
          SELECT vec_id, embedding, scale,
                 CASE WHEN scale = 0
                      THEN list_transform(embedding, v -> 0)
                      ELSE list_transform(embedding,
                           v -> CAST(round(CAST(v AS DOUBLE) / scale) AS INT))
                 END AS codes_arr
          FROM s
        )
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS n_dims,
               scale,
               array_to_string(list_transform(codes_arr,
                   c -> CAST(c AS VARCHAR)), ',') AS codes,
               CAST(list_min(codes_arr) AS BIGINT) AS q_min,
               CAST(list_max(codes_arr) AS BIGINT) AS q_max,
               CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
                    ELSE round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(embedding, v ->
                           (CAST(v AS DOUBLE)
                            - CAST(round(CAST(v AS DOUBLE) / scale) AS INT) * scale)
                           * (CAST(v AS DOUBLE)
                              - CAST(round(CAST(v AS DOUBLE) / scale) AS INT) * scale))),
                         (a, b) -> a + b), 9)
               END AS recon_err
        FROM c
        """

    # --- round-4b alignment / distribution oracles -------------------
    _grid_chs = ", ".join(f"'{c}'" for c in GRID_CHANNELS)
    _grid_cte = f"""
        grid AS (
          SELECT channel,
                 UNNEST(generate_series(start_ts, end_ts, {GRID_INTERVAL_US})) AS ts
          FROM channels WHERE channel IN ({_grid_chs})
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          WHERE channel IN ({_grid_chs})
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE) AS value, 1 AS is_grid FROM grid
        )
        """

    sql["ts_locf_resample"] = with_views(
        f"""
        WITH {_grid_cte},
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill,
                 last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
                   OVER w AS src
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT channel, ts, fill AS value, src AS src_ts, ts - src AS stale_us
        FROM f WHERE is_grid = 1
        """,
        "samples",
        "channels",
    )

    sql["ts_interp_resample"] = with_views(
        f"""
        WITH {_grid_cte},
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER wp AS prev_v,
                 last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
                   OVER wp AS prev_ts,
                 first_value(value IGNORE NULLS) OVER wn AS next_v,
                 first_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
                   OVER wn AS next_ts
          FROM u
          WINDOW wp AS (PARTITION BY channel ORDER BY ts, is_grid, value
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY channel ORDER BY ts, is_grid, value
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT channel, ts,
               CASE WHEN prev_ts = ts THEN prev_v
                    WHEN prev_ts IS NOT NULL AND next_ts IS NOT NULL
                    THEN prev_v + (next_v - prev_v) *
                         (CAST(ts - prev_ts AS DOUBLE)
                          / CAST(next_ts - prev_ts AS DOUBLE))
                    ELSE CAST(NULL AS DOUBLE) END AS value,
               prev_ts, COALESCE(next_ts, -1) AS next_ts
        FROM f WHERE is_grid = 1 AND (prev_ts = ts
              OR (prev_ts IS NOT NULL AND next_ts IS NOT NULL))
        """,
        "samples",
        "channels",
    )

    sql["ts_span_point_join"] = with_views(
        f"""
        WITH spans AS (
          SELECT channel, MIN(lo) AS span_lo, MAX(hi) AS span_hi
          FROM (
            SELECT channel, lo, hi,
                   SUM(new_span) OVER (PARTITION BY channel ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
            FROM (
              SELECT channel, ts AS lo, ts AS hi,
                     CASE WHEN LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts) IS NULL
                            OR ts - LAG(ts) OVER (PARTITION BY channel ORDER BY ts, ts)
                               >= {GAP_THRESHOLD_US}
                          THEN 1 ELSE 0 END AS new_span
              FROM chan_events WHERE channel = 'click'
            )
          ) GROUP BY channel, span_id
        ),
        pts AS (
          SELECT ts AS pt_ts, CAST(round(value * 1000000) AS BIGINT) AS q
          FROM chan_events WHERE channel = 'error'
        ),
        hits AS (
          SELECT s.channel, s.span_lo, s.span_hi,
                 CAST(COUNT(*) AS BIGINT) AS n_points,
                 MIN(pt_ts) AS first_pt_ts,
                 MAX(pt_ts) AS last_pt_ts,
                 CAST(SUM(q) AS BIGINT) AS sum_value_q
          FROM spans s JOIN pts p
            ON p.pt_ts >= s.span_lo AND p.pt_ts <= s.span_hi
          GROUP BY s.channel, s.span_lo, s.span_hi
        )
        SELECT s.channel AS span_channel, s.span_lo, s.span_hi,
               CAST(COALESCE(h.n_points, 0) AS BIGINT) AS n_points,
               COALESCE(h.first_pt_ts, -1) AS first_pt_ts,
               COALESCE(h.last_pt_ts, -1) AS last_pt_ts,
               CAST(COALESCE(h.sum_value_q, 0) AS BIGINT) AS sum_value_q
        FROM spans s LEFT JOIN hits h
          ON s.channel = h.channel AND s.span_lo = h.span_lo
             AND s.span_hi = h.span_hi
        """,
        "chan_events",
    )

    _hist_width = (HIST_HI - HIST_LO) / HIST_BINS
    sql["ts_value_histogram"] = with_views(
        f"""
        SELECT channel, CAST(bin AS BIGINT) AS bin,
               CAST({HIST_LO} AS DOUBLE)
                 + CAST(bin AS BIGINT) * CAST({_hist_width} AS DOUBLE) AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT channel,
                     floor((value - {HIST_LO}) / {_hist_width}) AS bin
              FROM samples)
        WHERE bin >= 0 AND bin < {HIST_BINS}
        GROUP BY channel, bin
        """,
        "samples",
    )
    # streaming histogram: associative counts + shared builder ⇒ the
    # batch oracle gates the drained stream too
    sql["stream_histogram"] = sql["ts_value_histogram"]

    sql["ts_zscore_outliers"] = with_views(
        f"""
        WITH st AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sq,
                 CAST(SUM(CAST(round(value * value * 1000000) AS BIGINT)) AS BIGINT) AS sq2
          FROM chan_events GROUP BY channel
        ),
        j AS (
          SELECT e.channel, e.ts, e.value,
                 CAST(sq AS DOUBLE) / 1000000 / n AS mean_
                 , greatest(CAST(sq2 AS DOUBLE) / 1000000 / n
                            - (CAST(sq AS DOUBLE) / 1000000 / n)
                              * (CAST(sq AS DOUBLE) / 1000000 / n),
                            CAST(0 AS DOUBLE)) AS var_
          FROM chan_events e JOIN st ON e.channel = st.channel
        )
        SELECT channel, ts, value, (value - mean_) / sqrt(var_) AS z
        FROM j
        WHERE var_ > 0
          AND abs(round((value - mean_) / sqrt(var_), 9)) > {ZSCORE_THRESHOLD}
        """,
        "chan_events",
    )

    sql["ts_threshold_crossings"] = with_views(
        f"""
        SELECT channel, CAST(SUM(x) AS BIGINT) AS n_crossings,
               COALESCE(MIN(CASE WHEN x = 1 THEN ts END), -1) AS first_crossing_ts,
               COALESCE(MAX(CASE WHEN x = 1 THEN ts END), -1) AS last_crossing_ts
        FROM (
          SELECT channel, ts,
                 CASE WHEN LAG(value) OVER (PARTITION BY channel ORDER BY ts, value)
                           IS NOT NULL
                       AND LAG(value) OVER (PARTITION BY channel ORDER BY ts, value)
                           < {CROSS_THRESHOLD}
                       AND value >= {CROSS_THRESHOLD}
                      THEN 1 ELSE 0 END AS x
          FROM samples
        ) GROUP BY channel
        """,
        "samples",
    )

    # --- round-4c text-format round trips (identity oracles) ---------
    sql["doc_jsonl_roundtrip"] = (
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    )
    sql["doc_csv_roundtrip"] = sql["doc_jsonl_roundtrip"]
    sql["doc_orc_roundtrip"] = sql["doc_jsonl_roundtrip"]

    # --- round-4c decimate / jaccard-est / autocorrelation -----------
    sql["ts_decimate"] = f"""
        SELECT channel, ts, value FROM (
          SELECT channel, ts, value,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn
          FROM ({_butterworth_oracle_sql()})
        ) WHERE rn % {DECIMATE_FACTOR} = 0
        """

    sql["doc_minhash_jaccard_est"] = f"""
        WITH {MINHASH_PRE}, {BANDS}, {CAND_CAPPED},
        ag AS (
          SELECT c.doc_a, c.doc_b,
                 CAST(SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_agree,
                 CAST(COUNT(*) AS BIGINT) AS n_hashes
          FROM cand c
          JOIN mh ma ON ma.doc_id = c.doc_a
          JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j
          GROUP BY c.doc_a, c.doc_b
        )
        SELECT doc_a, doc_b, n_agree, n_hashes,
               n_agree / CAST(n_hashes AS DOUBLE) AS jaccard_est
        FROM ag
        """

    def _acf_core(lags) -> str:
        """Shared CTE chain (grid -> LOCF -> lagged pairs -> moment
        agg) of the ACF family; ts_ljungbox composes the same body
        with its own lag set."""
        lag_arr = ", ".join(str(int(x)) for x in lags)
        return f"""
        WITH {_grid_cte},
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        lagged AS (
          SELECT channel, UNNEST([{lag_arr}]) AS lag_us, ts AS ts_b, xq AS xb
          FROM vals
        ),
        pr AS (
          SELECT a.channel, l.lag_us, a.xq AS xa, l.xb
          FROM vals a JOIN lagged l
            ON a.channel = l.channel AND a.ts = l.ts_b - l.lag_us
        ),
        agg AS (
          SELECT channel, CAST(lag_us AS BIGINT) AS lag_us,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xa) AS BIGINT) AS sx,
                 CAST(SUM(xb) AS BIGINT) AS sy,
                 CAST(SUM(xa * xb) AS BIGINT) AS sxy,
                 CAST(SUM(xa * xa) AS BIGINT) AS sxx,
                 CAST(SUM(xb * xb) AS BIGINT) AS syy
          FROM pr GROUP BY channel, lag_us
        ),
        acf AS (
          SELECT channel, lag_us, n,
                 CASE WHEN {_corr_pos} THEN round({_corr_r}, 9)
                      ELSE CAST(0 AS DOUBLE) END AS r
          FROM agg
        )
        """

    sql["ts_autocorrelation"] = with_views(
        f"""
        {_acf_core(ACF_LAGS_US)}
        SELECT channel, lag_us, n, r FROM acf
        """,
        "samples",
        "channels",
    )

    # ACF half-life: composes the shared _acf_core body at lags
    # 1..10 days; channels never crossing 0.5 report sentinel 0.
    sql["ts_acf_halflife"] = with_views(
        f"""
        {_acf_core(ACF_HL_LAGS)},
        crossed AS (
          SELECT channel, CAST(MIN(lag_us) AS BIGINT) AS hl
          FROM acf WHERE r < 0.5 GROUP BY channel
        ),
        chans AS (SELECT DISTINCT channel FROM acf)
        SELECT c.channel,
               CAST(COALESCE(x.hl, 0) AS BIGINT) AS halflife_lag_us
        FROM chans c LEFT JOIN crossed x ON c.channel = x.channel
        """,
        "samples",
        "channels",
    )

    from pennsieve_streaming_spark.operators.stats import (
        LB_CRIT_5 as _LB_CRIT,
        lb_q_expr as _lb_q,
    )

    _lb_piv = ",\n                 ".join(
        f"MAX(CASE WHEN lag_us = {int(lag)} THEN r END) AS r{k},\n"
        f"                 MAX(CASE WHEN lag_us = {int(lag)} THEN n END)"
        f" AS n{k}"
        for k, lag in enumerate(LB_LAGS_US, start=1)
    )
    sql["ts_ljungbox"] = with_views(
        f"""
        {_acf_core(LB_LAGS_US)},
        piv AS (
          SELECT channel,
                 {_lb_piv}
          FROM acf GROUP BY channel
        ),
        tt AS (SELECT *, CAST(n1 + 1 AS BIGINT) AS n_total FROM piv)
        SELECT channel, n_total, r1, r2, r3, r4, r5,
               {_lb_q(5)} AS q_stat,
               {_lb_q(5)} > {_LB_CRIT} AS nonwhite
        FROM tt
        """,
        "samples",
        "channels",
    )

    sql["doc_collocations"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        trans AS (
          SELECT toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
                   AS bg
          FROM (
            SELECT doc_id, toks,
                   UNNEST(generate_series(1, GREATEST(len(toks) - 1, 0)))
                     AS i
            FROM doc_toks
          )
        ),
        bgc AS (
          SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab
          FROM trans GROUP BY bg
        ),
        uni AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT UNNEST(toks) AS t FROM doc_toks) GROUP BY t
        ),
        tot AS (
          SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n1,
                 (SELECT CAST(SUM(c_ab) AS BIGINT) FROM bgc) AS n2
        )
        SELECT bg AS bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
               round(ln((CAST(c_ab AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * CAST(n1 AS DOUBLE)) / (CAST(n2 AS DOUBLE)
                 * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 9)
                 AS pmi
        FROM bgc
        JOIN uni ua ON split_part(bg, ' ', 1) = ua.t
        JOIN uni ub ON split_part(bg, ' ', 2) = ub.t
        CROSS JOIN tot
        WHERE c_ab >= {CL_MIN_COUNT}
          AND round(ln((CAST(c_ab AS DOUBLE) * CAST(n1 AS DOUBLE)
                * CAST(n1 AS DOUBLE)) / (CAST(n2 AS DOUBLE)
                * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))), 9)
              > {CL_MIN_PMI!r}
        """

    sql["doc_bigram_lm"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        trans AS (
          SELECT doc_id, toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS bg, i AS pos
          FROM (
            SELECT doc_id, toks,
                   UNNEST(generate_series(1, GREATEST(len(toks) - 1, 0))) AS i
            FROM doc_toks
          )
        ),
        bgc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_bg FROM trans GROUP BY bg),
        pc AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c_prev
          FROM (SELECT UNNEST(toks) AS t FROM doc_toks) GROUP BY t
        ),
        v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM pc),
        probs AS (
          SELECT bg,
                 round(ln((c_bg + CAST(0.5 AS DOUBLE))
                          / (c_prev + CAST(0.5 AS DOUBLE) * vocab)), 9) AS logp
          FROM bgc JOIN pc ON split_part(bg, ' ', 1) = pc.t CROSS JOIN v
        ),
        folded AS (
          SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(p.logp ORDER BY t.pos)), (a, b) -> a + b)
                 / COUNT(*) AS avg_logprob
          FROM trans t JOIN probs p ON t.bg = p.bg
          GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(f.n_transitions, 0) AS BIGINT) AS n_transitions,
               COALESCE(f.avg_logprob, CAST(0 AS DOUBLE)) AS avg_logprob
        FROM documents d LEFT JOIN folded f ON d.doc_id = f.doc_id
        """

    # Vocabulary build + token-id encoding: rank by (count DESC, term
    # ASC); unknown terms encode as 0; id sequence re-joined in doc
    # order. Integers and strings only.
    _VOCAB = f"""
        vbase AS (SELECT doc_id, {TOKS} AS toks FROM documents
                  WHERE length(trim(text)) > 0),
        vtok AS (SELECT doc_id, lower(UNNEST(toks)) AS term FROM vbase),
        vcounts AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS count
          FROM vtok GROUP BY term
        ),
        vocab AS (
          SELECT term,
                 CAST(ROW_NUMBER() OVER (ORDER BY count DESC, term) AS BIGINT) AS token_id,
                 count
          FROM vcounts
        )
        """

    # --- BPE tokenizer training: k-stage unrolled replay --------------
    # Each stage: overlapping pair counts over the previous token
    # state, deterministic best pair (n DESC, l, r), greedy merge via
    # the run-parity rule (a match position merges iff its offset
    # within its contiguous island of matches is even — only l==r can
    # produce contiguous matches), then dense re-numbering. Empty best
    # (corpus out of pairs) leaves the state unchanged and contributes
    # no output row, matching the Spark loop's early break.
    _bpe_stages = [
        f"""
        bpe_words AS MATERIALIZED (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
            SELECT lower(t) AS word
            FROM (SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t
                  FROM documents)
            WHERE length(lower(t)) > 0
          ) GROUP BY word HAVING COUNT(*) >= {BPE_MIN_COUNT}
        ),
        bs0 AS MATERIALIZED (
          SELECT word, cnt, CAST(i - 1 AS BIGINT) AS pos,
                 substr(word, CAST(i AS INTEGER), 1) AS tok
          FROM bpe_words, UNNEST(generate_series(1, length(word))) AS t(i)
        )"""
    ]
    for _bi in range(1, BPE_K + 1):
        _bp = f"bs{_bi - 1}"
        _bpe_stages.append(f"""
        bpr{_bi} AS MATERIALIZED (
          SELECT a.tok AS l, b.tok AS r, CAST(SUM(a.cnt) AS BIGINT) AS n
          FROM {_bp} a JOIN {_bp} b
            ON a.word = b.word AND b.pos = a.pos + 1
          GROUP BY 1, 2
        ),
        bb{_bi} AS MATERIALIZED (SELECT l, r, n FROM bpr{_bi} ORDER BY n DESC, l, r LIMIT 1),
        bm{_bi} AS MATERIALIZED (
          SELECT a.word, a.pos
          FROM {_bp} a JOIN {_bp} nb
            ON a.word = nb.word AND nb.pos = a.pos + 1
          JOIN bb{_bi} ON a.tok = bb{_bi}.l AND nb.tok = bb{_bi}.r
        ),
        bg{_bi} AS MATERIALIZED (
          SELECT word, pos FROM (
            SELECT word, pos,
                   pos - MIN(pos) OVER (PARTITION BY word, island) AS off
            FROM (SELECT word, pos,
                         pos - ROW_NUMBER() OVER (PARTITION BY word
                                                  ORDER BY pos) AS island
                  FROM bm{_bi})
          ) WHERE off % 2 = 0
        ),
        bs{_bi} AS MATERIALIZED (
          SELECT word, cnt,
                 CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) - 1
                      AS BIGINT) AS pos,
                 tok
          FROM (
            SELECT s.word, s.cnt, s.pos,
                   CASE WHEN g.pos IS NOT NULL THEN s.tok || nx.tok
                        ELSE s.tok END AS tok
            FROM {_bp} s
            LEFT JOIN bg{_bi} g ON s.word = g.word AND s.pos = g.pos
            LEFT JOIN {_bp} nx ON s.word = nx.word AND nx.pos = s.pos + 1
            WHERE NOT EXISTS (SELECT 1 FROM bg{_bi} g2
                              WHERE g2.word = s.word AND g2.pos = s.pos - 1)
          )
        )""")
    _bpe_out = " UNION ALL ".join(
        f"SELECT CAST({_bi} AS BIGINT) AS it, l AS left_tok, r AS right_tok, "
        f"n AS pair_count FROM bb{_bi}"
        for _bi in range(1, BPE_K + 1)
    )
    sql["doc_bpe_merges"] = (
        "WITH " + ",".join(_bpe_stages) + "\n" + _bpe_out
    )
    # the tokenizer table = the replay's final state, verbatim
    sql["doc_bpe_word_tokens"] = (
        "WITH " + ",".join(_bpe_stages)
        + f"\nSELECT word, cnt, pos, tok FROM bs{BPE_K}"
    )
    # full corpus encode from that state: in-vocab words take their
    # trained segmentation, OOV words fall back to characters, ids
    # rank the token inventory (freq DESC, tok), unknown chars -> 0
    sql["doc_bpe_token_ids"] = (
        "WITH " + ",".join(_bpe_stages) + f""",
        binv AS (
          SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok)
                           AS BIGINT) AS token_id
          FROM (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS freq
                FROM bs{BPE_K} GROUP BY tok)
        ),
        bdw AS (
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS widx, lower(toks[i]) AS word
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents),
               UNNEST(generate_series(1, len(toks))) AS t(i)
          WHERE length(lower(toks[i])) > 0
        ),
        binvoc AS (
          SELECT d.doc_id, d.widx, s.pos, s.tok
          FROM bdw d JOIN bs{BPE_K} s ON s.word = d.word
        ),
        boov AS (
          SELECT d.doc_id, d.widx, CAST(i - 1 AS BIGINT) AS pos,
                 substr(d.word, CAST(i AS INTEGER), 1) AS tok
          FROM bdw d, UNNEST(generate_series(1, length(d.word))) AS t(i)
          WHERE NOT EXISTS (SELECT 1 FROM bs{BPE_K} s WHERE s.word = d.word)
        ),
        ballt AS (SELECT * FROM binvoc UNION ALL SELECT * FROM boov),
        benc AS (
          SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_subtokens,
                 string_agg(CAST(COALESCE(v.token_id, 0) AS VARCHAR), ','
                            ORDER BY a.widx, a.pos) AS token_ids
          FROM ballt a LEFT JOIN binv v ON a.tok = v.tok
          GROUP BY a.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(e.n_subtokens, 0) AS BIGINT) AS n_subtokens,
               COALESCE(e.token_ids, '') AS token_ids
        FROM documents d LEFT JOIN benc e ON d.doc_id = e.doc_id
        """
    )

    sql["doc_bpe_fertility"] = f"""
        WITH enc AS (SELECT * FROM ({sql["doc_bpe_token_ids"]})),
        w AS (
          SELECT doc_id, lang,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                      AS BIGINT) AS n_words
          FROM documents
        )
        SELECT w.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w.n_words) AS BIGINT) AS n_words,
               CAST(SUM(e.n_subtokens) AS BIGINT) AS n_subtokens,
               CAST(SUM(e.n_subtokens) AS DOUBLE) / SUM(w.n_words)
                 AS fertility
        FROM w JOIN enc e USING (doc_id)
        WHERE e.n_subtokens > 0
        GROUP BY w.lang
        """

    sql["doc_vocab"] = f"""
        WITH {_VOCAB}
        SELECT term, token_id, count FROM vocab
        """

    sql["doc_token_ids"] = f"""
        WITH {_VOCAB},
        ptok AS (
          SELECT doc_id, lower(UNNEST(toks)) AS term,
                 UNNEST(generate_series(1, len(toks))) AS pos
          FROM vbase
        ),
        enc AS (
          SELECT p.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 string_agg(CAST(COALESCE(v.token_id, 0) AS VARCHAR), ','
                            ORDER BY p.pos) AS token_ids
          FROM ptok p LEFT JOIN vocab v ON p.term = v.term
          GROUP BY p.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(e.n_tokens, 0) AS BIGINT) AS n_tokens,
               COALESCE(e.token_ids, '') AS token_ids
        FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
        """

    sql["doc_substring_scrub"] = f"""
        WITH doc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        pos AS (
          SELECT doc_id, toks,
                 UNNEST(generate_series(1, GREATEST(len(toks) - 7, 0))) AS pos
          FROM doc_toks
          WHERE length(trim(array_to_string(toks, ' '))) > 0
        ),
        grams AS (SELECT doc_id, pos, {_GH} AS gh FROM pos),
        owners AS (
          SELECT gh, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS nd
          FROM grams GROUP BY gh
        ),
        dup AS (SELECT gh, owner FROM owners WHERE nd >= 2),
        droppos AS (
          SELECT DISTINCT doc_id, tokpos FROM (
            SELECT g.doc_id, UNNEST(generate_series(g.pos, g.pos + 7)) AS tokpos
            FROM grams g JOIN dup d USING (gh) WHERE g.doc_id != d.owner
          )
        ),
        tokens AS (
          SELECT doc_id, UNNEST(toks) AS token,
                 UNNEST(generate_series(1, len(toks))) AS tokpos
          FROM doc_toks
          WHERE length(trim(array_to_string(toks, ' '))) > 0
        ),
        kept AS (
          SELECT t.doc_id, t.token, t.tokpos
          FROM tokens t LEFT JOIN droppos dp
            ON t.doc_id = dp.doc_id AND t.tokpos = dp.tokpos
          WHERE dp.doc_id IS NULL
        ),
        rebuilt AS (
          SELECT doc_id, string_agg(token, ' ' ORDER BY tokpos) AS clean_text,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM kept GROUP BY doc_id
        ),
        nt AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(len({TOKS}) AS BIGINT) END AS n_tokens
          FROM documents
        )
        SELECT nt.doc_id, COALESCE(r.clean_text, '') AS clean_text,
               nt.n_tokens,
               CAST(nt.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
        FROM nt LEFT JOIN rebuilt r USING (doc_id)
        """

    # BM25 + inverted index share the tf/dl/df aggregation skeleton.
    _BM25_TF = f"""
        base AS (SELECT doc_id, {TOKS} AS toks FROM documents
                 WHERE length(trim(text)) > 0),
        tok AS (SELECT doc_id, lower(UNNEST(toks)) AS term FROM base),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2)
        """

    _q_vals = ", ".join(
        f"({qid}, '{t}')"
        for qid, qtext in BM25_QUERIES
        for t in dict.fromkeys(qtext.lower().split())
    )
    sql["doc_bm25"] = f"""
        WITH {_BM25_TF},
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        stats AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
                 (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_dl
        ),
        q(query_id, term) AS (VALUES {_q_vals}),
        matched AS (
          SELECT q.query_id, tf.doc_id, tf.term,
                 round(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 9)
                 * (tf * (CAST(1.2 AS DOUBLE) + 1) /
                    (tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * dl
                       / (CAST(total_dl AS DOUBLE) / n_docs)))), 9) AS part
          FROM tf JOIN q USING (term) JOIN dl USING (doc_id)
          JOIN dfq USING (term) CROSS JOIN stats
        ),
        scored AS (
          SELECT query_id, doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(part ORDER BY term)), (a, x) -> a + x) AS score
          FROM matched GROUP BY 1, 2
        )
        SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= 10
        """

    # Passage BM25: the gated chunk SQL becomes the corpus; same
    # quantized-partial / term-ordered-fold body with passage ids.
    sql["doc_passage_bm25"] = f"""
        WITH ch AS ({sql["doc_chunk_passages"]}),
        pdocs AS (
          SELECT doc_id * 1000 + chunk_id AS doc_id,
                 chunk_text AS text
          FROM ch
        ),
        base AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+')
                   AS toks
                 FROM pdocs WHERE length(trim(text)) > 0),
        tok AS (SELECT doc_id, lower(UNNEST(toks)) AS term FROM base),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok
               GROUP BY 1),
        dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
                GROUP BY 1),
        stats AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pdocs) AS n_docs,
                 (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS total_dl
        ),
        q(query_id, term) AS (VALUES {_q_vals}),
        matched AS (
          SELECT q.query_id, tf.doc_id, tf.term,
                 round(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)), 9)
                 * (tf * (CAST(1.2 AS DOUBLE) + 1) /
                    (tf + CAST(1.2 AS DOUBLE) * (1 - CAST(0.75 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * dl
                       / (CAST(total_dl AS DOUBLE) / n_docs)))), 9) AS part
          FROM tf JOIN q USING (term) JOIN dl USING (doc_id)
          JOIN dfq USING (term) CROSS JOIN stats
        ),
        scored AS (
          SELECT query_id, doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(part ORDER BY term)), (a, x) -> a + x) AS score
          FROM matched GROUP BY 1, 2
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               doc_id AS passage_id,
               CAST(doc_id // 1000 AS BIGINT) AS src_doc_id,
               CAST(doc_id % 1000 AS BIGINT) AS chunk_id,
               score, rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rank
          FROM scored
        ) WHERE rank <= 10
        """

    sql["doc_inverted_index"] = f"""
        WITH {_BM25_TF}
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM tf GROUP BY term
        """

    # Connected-components cluster dedup: the same LSH pipeline cut at
    # jaccard >= 0.5 becomes an undirected edge list; the recursive CTE
    # computes the transitive closure, so each node's component is the
    # minimum doc_id it can reach (identical to the large-star/
    # small-star fixpoint). Closure is O(|component|^2) rows — fine for
    # an oracle, which is why the engine side uses star-contraction.
    _PAIRS_PRE = f"""
        WITH RECURSIVE {MINHASH_PRE}, {BANDS},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        {JACCARD_TAIL},
        pairs AS (
          SELECT i.doc_a, i.doc_b
          FROM ints i
          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
          WHERE i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5
        )
        """

    sql["doc_graph_triangles"] = f"""
        {_PAIRS_PRE},
        e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
        deg AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
          GROUP BY v
        ),
        o AS (
          SELECT CASE WHEN da.degree < db.degree
                       OR (da.degree = db.degree AND a < b)
                      THEN a ELSE b END AS src,
                 CASE WHEN da.degree < db.degree
                       OR (da.degree = db.degree AND a < b)
                      THEN b ELSE a END AS dst
          FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
        ),
        w AS (
          SELECT o1.src AS s, o1.dst AS d1, o2.dst AS d2
          FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst < o2.dst
        ),
        tri AS (
          SELECT s, d1, d2 FROM w JOIN e ON e.a = w.d1 AND e.b = w.d2
        ),
        corners AS (
          SELECT s AS v FROM tri
          UNION ALL SELECT d1 AS v FROM tri
          UNION ALL SELECT d2 AS v FROM tri
        ),
        pv AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM corners GROUP BY v
        )
        SELECT deg.v AS doc_id, degree,
               CAST(COALESCE(pv.n_triangles, 0) AS BIGINT) AS n_triangles,
               CASE WHEN degree > 1 THEN 2e0 * COALESCE(pv.n_triangles, 0)
                    / (degree * (degree - 1)) ELSE 0e0 END AS clustering
        FROM deg LEFT JOIN pv ON pv.v = deg.v
        """

    _CLUSTER_PRE = f"""
        {_PAIRS_PRE},
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r
          JOIN edges e ON r.dst = e.src
          WHERE e.dst <> r.src
        ),
        comp AS (
          SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
          FROM reach GROUP BY src
        ),
        full_comp AS (
          SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
        )
        """

    sql["doc_dup_clusters"] = f"""
        {_CLUSTER_PRE}
        SELECT doc_id, component FROM full_comp
        """

    # Label propagation: unrolled synchronous rounds over the same
    # verified-pair edge list (count DESC, label ASC argmax; isolated
    # nodes carry their label via the LEFT JOIN coalesce).
    _lp_rounds = []
    for _r in range(1, 4):
        _p = _r - 1
        _lp_rounds.append(f"""
        r{_r}c AS (
          SELECT e.src AS u, l.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM edges e JOIN l{_p} l ON l.id = e.dst
          GROUP BY e.src, l.label
        ),
        r{_r}b AS (
          SELECT u, label FROM (
            SELECT u, label, ROW_NUMBER() OVER (PARTITION BY u
                ORDER BY c DESC, label) AS rn
            FROM r{_r}c
          ) WHERE rn = 1
        ),
        l{_r} AS (
          SELECT l.id, COALESCE(b.label, l.label) AS label
          FROM l{_p} l LEFT JOIN r{_r}b b ON b.u = l.id
        )""")
    sql["doc_lp_communities"] = f"""
        {_CLUSTER_PRE},
        l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
        {",".join(_lp_rounds)}
        SELECT id AS doc_id, CAST(label AS BIGINT) AS community FROM l3
        """

    sql["doc_cluster_dedup"] = f"""
        {_CLUSTER_PRE},
        csize AS (
          SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_n
          FROM full_comp GROUP BY component
        )
        SELECT d.doc_id, d.source, d.lang, s.cluster_n
        FROM documents d
        JOIN full_comp f ON d.doc_id = f.doc_id AND d.doc_id = f.component
        JOIN csize s ON f.component = s.component
        """

    # PageRank over the verified near-dup graph: integer-mass replay.
    # Ranks are BIGINT 1e9-scaled, edge shares are floor divisions
    # (`//` == Spark `div`), receive sums are exact BIGINT adds; the
    # only float math is the per-row scalar damping expression written
    # identically on both engines (exponent-notation literals — bare
    # decimals parse DECIMAL in DuckDB and silently diverge).
    _pr_iters = []
    for _k in range(1, 4):
        _p = _k - 1
        _pr_iters.append(
            f"""
        recv{_k} AS (
          SELECT e.dst AS doc_id, SUM(r.rank_i // g.outdeg) AS recv_i
          FROM r{_p} r JOIN edges e ON r.doc_id = e.src
          JOIN pr_deg g ON g.src = e.src
          GROUP BY e.dst
        ),
        dang{_k} AS (
          SELECT COALESCE(SUM(r.rank_i), 0) AS dm_i
          FROM r{_p} r LEFT JOIN pr_deg g ON g.src = r.doc_id
          WHERE g.src IS NULL
        ),
        r{_k} AS (
          SELECT d.doc_id,
                 CAST(round((1e0 - 8.5e-1) * 1e9 / CAST(nn.n AS DOUBLE)
                      + 8.5e-1 * (CAST(a.dm_i AS DOUBLE) / CAST(nn.n AS DOUBLE)
                                  + CAST(COALESCE(v.recv_i, 0) AS DOUBLE))) AS BIGINT) AS rank_i
          FROM documents d CROSS JOIN nn CROSS JOIN dang{_k} a
          LEFT JOIN recv{_k} v ON v.doc_id = d.doc_id
        )"""
        )
    sql["doc_pagerank"] = f"""
        {_CLUSTER_PRE},
        pr_deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
          FROM edges GROUP BY src
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        r0 AS (
          SELECT d.doc_id,
                 CAST(round(1e9 / CAST(nn.n AS DOUBLE)) AS BIGINT) AS rank_i
          FROM documents d CROSS JOIN nn
        ),
        {",".join(_pr_iters)}
        SELECT doc_id, CAST(rank_i AS DOUBLE) / 1e9 AS pr FROM r3
        """

    sql["emb_kmeans"] = _kmeans_oracle_sql(2)

    # DSIR importance weights: two add-k unigram LMs over the shared
    # raw vocab, per-doc sequential fold of the delta-logp map
    sql["doc_importance_weights"] = f"""
        WITH doc_toks AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
        tok AS (SELECT lang, UNNEST(toks) AS t FROM doc_toks),
        counts AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c_raw,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
          FROM tok GROUP BY t
        ),
        tot AS (
          SELECT CAST(SUM(c_raw) AS BIGINT) AS total_raw,
                 CAST(SUM(c_tgt) AS BIGINT) AS total_tgt,
                 CAST(COUNT(*) AS BIGINT) AS vocab
          FROM counts
        ),
        deltas AS (
          SELECT t,
                 round(ln((c_tgt + CAST(0.5 AS DOUBLE)) / (total_tgt + CAST(0.5 AS DOUBLE) * vocab))
                 - ln((c_raw + CAST(0.5 AS DOUBLE)) / (total_raw + CAST(0.5 AS DOUBLE) * vocab)), 9) AS delta
          FROM counts CROSS JOIN tot
        ),
        u AS (
          SELECT doc_id, UNNEST(toks) AS t,
                 UNNEST(generate_series(1, len(toks))) AS pos
          FROM doc_toks
        ),
        folded AS (
          SELECT u.doc_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(d.delta ORDER BY u.pos)), (a, b) -> a + b) AS log_ratio,
                 CAST(COUNT(*) AS BIGINT) AS n_tokens
          FROM u JOIN deltas d ON u.t = d.t
          GROUP BY u.doc_id
        )
        SELECT f.doc_id, dt.lang = 'en' AS in_target, f.n_tokens, f.log_ratio
        FROM folded f JOIN doc_toks dt ON f.doc_id = dt.doc_id
        """

    # SemDeDup: same literal-centroid assignment as the IVF oracle,
    # then min-id-wins within-cluster cosine dedup
    _sd_rows, _sd_d2 = _ivf_cent_fragments()
    sql["emb_semdedup"] = f"""
        WITH cents AS (SELECT * FROM (VALUES {_sd_rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {_sd_d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        assigned AS (
          SELECT vec_id AS id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        dropped AS (
          SELECT DISTINCT b.id FROM assigned a
          JOIN assigned b ON a.list_id = b.list_id AND a.id < b.id
          JOIN emb ea ON ea.vec_id = a.id
          JOIN emb eb ON eb.vec_id = b.id
          WHERE list_dot_product(ea.v, eb.v)
                / (sqrt(list_dot_product(ea.v, ea.v))
                   * sqrt(list_dot_product(eb.v, eb.v))) > {EMB_NEAR_DUP_COS}
        )
        SELECT id, CAST(list_id AS BIGINT) AS list_id FROM assigned
        WHERE id NOT IN (SELECT id FROM dropped)
        """

    sql["doc_tfidf_top_terms"] = f"""
        WITH docs AS (
          SELECT doc_id, {TOKS} AS toks FROM documents
          WHERE length(trim(text)) > 0
        ),
        tf AS (
          SELECT doc_id, lower(term) AS term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
          GROUP BY 1, 2
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT t.doc_id, t.term, t.tf, d.df,
                 t.tf * round(ln(CAST(n.n_docs AS DOUBLE) / d.df), 9) AS score
          FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, score, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term) AS rank
          FROM scored
        ) WHERE rank <= 3
        """

    # streaming fold replay (q_stream_neardup): one availableNow batch
    # => drop rule is min-doc_id-wins per colliding LSH band bucket
    sql["stream_neardup_dedup"] = f"""
        WITH {MINHASH_PRE}, {BANDS},
        firsts AS (
          SELECT band, band_key, MIN(doc_id) AS keep_id
          FROM bands GROUP BY band, band_key
        ),
        dropped AS (
          SELECT DISTINCT b.doc_id FROM bands b
          JOIN firsts f ON b.band = f.band AND b.band_key = f.band_key
          WHERE b.doc_id != f.keep_id
        )
        SELECT d.doc_id, d.lang, d.source FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
        """

    # all-pairs mode carries the hot-shingle document-frequency cap
    # (pair join sees only shingles with df <= JACCARD_MAX_DF; set
    # sizes still count everything — mirror of jaccard_pairs)
    sql["doc_ngram_jaccard"] = f"""
        WITH {DOC_PRE},
        ok_sh AS (
          SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ints AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a
          JOIN ok_sh o ON a.sh = o.sh
          JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b, sa.n AS n_a, sb.n AS n_b, i.inter,
               i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) AS jaccard
        FROM ints i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.2e0
        """

    # similarity-decile histogram over the df-capped exact pairs (the
    # ngram_jaccard SQL minus its >= tau gate)
    sql["doc_jaccard_histogram"] = f"""
        WITH {DOC_PRE},
        ok_sh AS (
          SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ints AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a
          JOIN ok_sh o ON a.sh = o.sh
          JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        j AS (
          SELECT least(CAST(floor(
                   (i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE)) * 10
                 ) AS BIGINT), 9) AS decile
          FROM ints i
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
        )
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(decile AS DOUBLE) / 10 AS j_lo
        FROM j GROUP BY decile
        """

    # LSH index-quality eval: composes the two gated SQLs verbatim
    sql["doc_lsh_eval"] = f"""
        WITH pred AS (SELECT * FROM ({sql["doc_minhash_lsh_pairs"]})),
        truth AS (SELECT * FROM ({sql["doc_ngram_jaccard"]})),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
                 CAST(SUM(CASE WHEN jaccard >= 2e-1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_pred
          FROM pred
        ),
        b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
          FROM (SELECT doc_a, doc_b FROM pred WHERE jaccard >= 2e-1) p
          JOIN (SELECT doc_a, doc_b FROM truth) t USING (doc_a, doc_b)
        )
        SELECT a.n_candidates, a.n_pred, b.n_truth, c.n_hit,
               CASE WHEN a.n_candidates > 0 THEN
                 CAST(a.n_pred AS DOUBLE) / a.n_candidates END
                 AS cand_precision,
               CASE WHEN b.n_truth > 0 THEN
                 CAST(c.n_hit AS DOUBLE) / b.n_truth END AS recall
        FROM a, b, c
        """

    sql["doc_dedup_filter"] = f"""
        WITH {MINHASH_PRE}, {BANDS},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        {JACCARD_TAIL},
        dropped AS (
          SELECT DISTINCT i.doc_b AS doc_id
          FROM ints i
          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
          WHERE i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5e0
        )
        SELECT doc_id, source, lang FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
        """

    sql["doc_pipeline"] = f"""
        WITH {MINHASH_PRE}, {BANDS},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        {JACCARD_TAIL},
        dropped AS (
          SELECT DISTINCT i.doc_b AS doc_id
          FROM ints i
          JOIN cand c ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
          WHERE i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE) >= 0.5e0
        ),
        qual AS ({sql['doc_quality_score']}),
        lng AS ({sql['doc_lang_id']})
        SELECT d.doc_id, d.source, lng.predicted_lang, qual.quality
        FROM documents d
        JOIN qual ON qual.doc_id = d.doc_id
        JOIN lng ON lng.doc_id = d.doc_id
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
          AND qual.quality >= {DOC_QUALITY_TAU}e0
          AND lng.predicted_lang = 'en'
        """

    sql["doc_simhash"] = f"WITH {DOC_PRE}, {SIMHASH_CTE} SELECT doc_id, simhash FROM fp"

    # Banded SimHash blocking — replays simhash_near_pairs' pigeonhole
    # bands (max_hamming+1 bands => any pair within hamming 4 collides
    # in at least one band) and its hot-bucket star cap.
    from pennsieve_streaming_spark.llm.dedup import simhash_bands as _sb_layout

    def _band_selects(table, id_col, hash_col, bits, n_bands):
        """Shared band-key extraction SQL (one UNION ALL arm per band)
        — the single source of truth for BOTH banded-hash oracles
        (text SimHash at 32 bits, image dHash at 64), so a layout
        change can never update one and miss the other. Arithmetic
        shift + mask extracts fields correctly on signed hashes in
        both engines (probed)."""
        return "\n          UNION ALL ".join(
            f"SELECT {id_col}, {hash_col}, CAST({i} AS BIGINT) AS band, "
            f"({hash_col} >> {lo}) & {(1 << wd) - 1} AS band_key "
            f"FROM {table}"
            for i, lo, wd in _sb_layout(bits, n_bands)
        )

    _sb_selects = _band_selects("fp", "doc_id", "simhash", 32, 5)
    sql["doc_simhash_near_pairs"] = f"""
        WITH {DOC_PRE}, {SIMHASH_CTE},
        skeys AS (
          {_sb_selects}
        ),
        sstats AS (
          SELECT band, band_key, COUNT(*) AS bn, MIN(doc_id) AS anchor,
                 arg_min(simhash, doc_id) AS anchor_sh,
                 MAX(doc_id) AS anchor2,
                 arg_max(simhash, doc_id) AS anchor2_sh
          FROM skeys GROUP BY band, band_key
        ),
        skeyed AS (
          SELECT k.doc_id, k.simhash, k.band, k.band_key,
                 s.bn, s.anchor, s.anchor_sh, s.anchor2, s.anchor2_sh
          FROM skeys k JOIN sstats s USING (band, band_key)
        )
        SELECT DISTINCT doc_a, doc_b, hamming FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM skeyed a JOIN skeyed b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.doc_id < b.doc_id
          WHERE a.bn <= {LSH_MAX_BUCKET}
          UNION ALL
          SELECT anchor AS doc_a, doc_id AS doc_b,
                 CAST(bit_count(xor(simhash, anchor_sh)) AS BIGINT) AS hamming
          FROM skeyed WHERE bn > {LSH_MAX_BUCKET} AND doc_id > anchor
          UNION ALL
          SELECT doc_id AS doc_a, anchor2 AS doc_b,
                 CAST(bit_count(xor(simhash, anchor2_sh)) AS BIGINT) AS hamming
          FROM skeyed WHERE bn > {LSH_MAX_BUCKET} AND doc_id < anchor2
        ) WHERE hamming <= 4
        """

    sql["ts_spike_waveforms"] = """
        SELECT spike_ts, bucket, MIN(v) AS min_val, MAX(v) AS max_val
        FROM (
          SELECT vec_id AS spike_ts,
                 CAST(unnest(embedding) AS DOUBLE) AS v,
                 CAST(FLOOR((((generate_subscripts(embedding, 1) - 1) * 2 + 1) * 8 - 1)
                      / (len(embedding) * 2)) AS BIGINT) AS bucket
          FROM embeddings
        ) GROUP BY spike_ts, bucket
        """

    sql["emb_cosine_topk"] = """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= 5
        """

    from pennsieve_streaming_spark.llm.similarity import (
        bq_word_expr as _bqw,
    )

    _bq_qw = ", ".join(
        f"{_bqw('qv', w, accessor='list_extract')} AS _qw{w}"
        for w in range(2)
    )
    _bq_vw = ", ".join(
        f"{_bqw('v', w, accessor='list_extract')} AS _vw{w}"
        for w in range(2)
    )
    _bq_ham = " + ".join(
        f"bit_count(xor(_qw{w}, _vw{w}))" for w in range(2)
    )
    sql["emb_bq_topk"] = f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv, {_bq_qw}
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id,
                     CAST(embedding AS DOUBLE[]) AS v, {_bq_vw}
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id, qv, v,
                 CAST({_bq_ham} AS BIGINT) AS hamming
          FROM q JOIN c ON query_id != neighbor_id
        ),
        kept AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY hamming, neighbor_id) AS _hr
            FROM scored
          ) WHERE _hr <= 20
        ),
        rer AS (
          SELECT query_id, neighbor_id, hamming,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))) AS cosine
          FROM kept
        )
        SELECT query_id, neighbor_id, hamming, cosine, rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM rer
        ) WHERE rank <= 5
        """

    sql["emb_mips_topk"] = """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v) AS dot
          FROM q JOIN c ON query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, dot FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= 5
        """

    # RRF: composes the two gated rankers at depth 10; contributions
    # fold in ranker order with the DOUBLE-cast reciprocal.
    _rrf_cos10 = sql["emb_cosine_topk"].replace(
        "WHERE rank <= 5", "WHERE rank <= 10"
    )
    _rrf_mips10 = sql["emb_mips_topk"].replace(
        "WHERE rank <= 5", "WHERE rank <= 10"
    )
    sql["emb_rrf_fusion"] = f"""
        WITH r0 AS (SELECT query_id, neighbor_id, rank
                    FROM ({_rrf_cos10})),
        r1 AS (SELECT query_id, neighbor_id, rank
               FROM ({_rrf_mips10})),
        tagged AS (
          SELECT query_id, neighbor_id, 0 AS rnk_src, rank AS r FROM r0
          UNION ALL
          SELECT query_id, neighbor_id, 1 AS rnk_src, rank AS r FROM r1
        ),
        fused AS (
          SELECT query_id, neighbor_id,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(CAST(1 AS DOUBLE) / (60 + r) ORDER BY rnk_src)),
                   (a, b) -> a + b) AS rrf_score
          FROM tagged GROUP BY query_id, neighbor_id
        )
        SELECT query_id, neighbor_id, rrf_score, rank FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY rrf_score DESC, neighbor_id) AS BIGINT)
                 AS rank
          FROM fused
        ) WHERE rank <= 5
        """

    # Centroid drift: raw integer centroid sums folded in dim order.
    from pennsieve_streaming_spark.llm.similarity import (
        CENTROID_QUANT as _CD_Q,
    )

    _cd_dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(generate_series(1, len(cq)), "
        "i -> CAST(cq[i] AS DOUBLE) * CAST(gq_arr[i] AS DOUBLE))), "
        "(a, b) -> a + b)"
    )
    _cd_nc = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(cq, x -> CAST(x AS DOUBLE) "
        "* CAST(x AS DOUBLE))), (a, b) -> a + b)"
    )
    _cd_ng = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(gq_arr, x -> CAST(x AS DOUBLE) "
        "* CAST(x AS DOUBLE))), (a, b) -> a + b)"
    )
    sql["emb_centroid_drift"] = f"""
        WITH e AS (
          SELECT label,
                 UNNEST(CAST(embedding AS DOUBLE[])) AS v,
                 UNNEST(generate_series(1, len(embedding))) AS dim
          FROM embeddings
        ),
        qz AS (
          SELECT label, dim,
                 CAST(round(v * {_CD_Q}) AS BIGINT) AS vq
          FROM e
        ),
        per AS (
          SELECT label, dim, CAST(SUM(vq) AS BIGINT) AS sq,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM qz GROUP BY label, dim
        ),
        lab AS (
          SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
                 list(sq ORDER BY dim) AS cq
          FROM per GROUP BY label
        ),
        gl AS (
          SELECT dim, CAST(SUM(sq) AS BIGINT) AS gq
          FROM per GROUP BY dim
        ),
        garr AS (SELECT list(gq ORDER BY dim) AS gq_arr FROM gl)
        SELECT CAST(l.label AS BIGINT) AS label, l.n_vecs,
               CASE WHEN {_cd_nc} > 0 AND {_cd_ng} > 0 THEN
                 {_cd_dot} / (sqrt({_cd_nc}) * sqrt({_cd_ng})) END
                 AS cos_to_global
        FROM lab l CROSS JOIN garr
        """

    # MMR: the k greedy steps unrolled; the score literals (lambda,
    # 1-lambda) are the SAME Python-evaluated reprs the operator
    # injects — (1.0 - 0.7) diverges between DECIMAL and double math.
    _mmr_lam = repr(float(MMR_LAM))
    _mmr_om = repr(1.0 - float(MMR_LAM))
    _mmr_pair_cos = (
        "list_dot_product(cd.v, cs.v) / (sqrt(list_dot_product(cd.v, cd.v))"
        " * sqrt(list_dot_product(cs.v, cs.v)))"
    )
    _mmr_parts = [f"""
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON query_id != neighbor_id
        ),
        sel1 AS (
          SELECT query_id, CAST(1 AS BIGINT) AS rank, neighbor_id, cosine,
                 {_mmr_lam} * cosine AS mmr_score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY {_mmr_lam} * cosine DESC, neighbor_id) AS rn
                FROM scored)
          WHERE rn = 1
        )"""]
    for _r in range(2, MMR_K + 1):
        _prev = " UNION ALL ".join(
            f"SELECT * FROM sel{_j}" for _j in range(1, _r)
        )
        _mmr_parts.append(f"""
        all{_r} AS ({_prev}),
        pen{_r} AS (
          SELECT s.query_id, s.neighbor_id, s.cosine,
                 MAX({_mmr_pair_cos}) AS maxsim
          FROM scored s
          JOIN c cd ON cd.neighbor_id = s.neighbor_id
          JOIN all{_r} a ON a.query_id = s.query_id
          JOIN c cs ON cs.neighbor_id = a.neighbor_id
          WHERE NOT EXISTS (SELECT 1 FROM all{_r} x
              WHERE x.query_id = s.query_id
                AND x.neighbor_id = s.neighbor_id)
          GROUP BY s.query_id, s.neighbor_id, s.cosine
        ),
        sel{_r} AS (
          SELECT query_id, CAST({_r} AS BIGINT) AS rank, neighbor_id,
                 cosine,
                 {_mmr_lam} * cosine - {_mmr_om} * maxsim AS mmr_score
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY {_mmr_lam} * cosine - {_mmr_om} * maxsim
                        DESC, neighbor_id) AS rn
                FROM pen{_r})
          WHERE rn = 1
        )""")
    _mmr_final = " UNION ALL ".join(
        f"SELECT * FROM sel{_j}" for _j in range(1, MMR_K + 1)
    )
    sql["emb_mmr_topk"] = (
        "WITH " + ",".join(_mmr_parts) + f" {_mmr_final}"
    )

    sql["emb_ann_filtered"] = """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE label = 0),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= 5
        """

    sql["emb_ann_two_stage"] = """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        coarse AS (
          SELECT query_id, neighbor_id, qv, v,
                 list_dot_product(qv[1:32], v[1:32])
                   / (sqrt(list_dot_product(qv[1:32], qv[1:32]))
                      * sqrt(list_dot_product(v[1:32], v[1:32]))) AS coarse
          FROM q JOIN c ON query_id != neighbor_id
        ),
        cand AS (
          SELECT query_id, neighbor_id, qv, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY coarse DESC, neighbor_id) AS crank
            FROM coarse
          ) WHERE crank <= 40
        ),
        rescored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM cand
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM rescored
        ) WHERE rank <= 5
        """

    sql["mm_media_features"] = """
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS digest
        FROM documents
        """

    from pennsieve_streaming_spark.llm.imagehash import (
        GRID_H as _IH_H,
        GRID_W as _IH_W,
        SYN_A as _IH_A,
        SYN_B as _IH_B,
        SYN_C as _IH_C,
        SYN_MOD as _IH_M,
    )

    # dHash over the synthetic luminance field: integer block sums and
    # shifts only, so DuckDB replays the numpy kernel bit-for-bit. The
    # HUGEINT sum wraps to the signed-int64 bit pattern at the end
    # (bit 63 is the sign bit on the Spark side).
    _dhash_cte = f"""
        px AS (
          SELECT doc_id, i, j,
                 (doc_id * {_IH_A} + i * {_IH_B} + j * {_IH_C}) % {_IH_M} AS v
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        cells AS (
          SELECT doc_id, i // 2 AS r, j // 2 AS c, SUM(v) AS s
          FROM px GROUP BY 1, 2, 3
        ),
        dh AS (
          SELECT a.doc_id AS media_id,
                 CAST(CASE WHEN hu >= (CAST(1 AS HUGEINT) << 63)
                           THEN hu - (CAST(1 AS HUGEINT) << 64) ELSE hu END
                      AS BIGINT) AS dhash
          FROM (
            SELECT a.doc_id,
                   SUM(CASE WHEN a.s > b.s
                            THEN CAST(1 AS HUGEINT) << (a.r * 8 + a.c)
                            ELSE CAST(0 AS HUGEINT) END) AS hu
            FROM cells a JOIN cells b
              ON a.doc_id = b.doc_id AND a.r = b.r AND b.c = a.c + 1
            GROUP BY a.doc_id
          ) a(doc_id, hu)
        )
    """
    sql["mm_image_dhash"] = f"""
        WITH {_dhash_cte}
        SELECT media_id, dhash FROM dh
        """

    sql["mm_gif_roundtrip"] = f"""
        WITH px AS (
          SELECT doc_id,
                 (doc_id * {_IH_A} + i * {_IH_B} + j * {_IH_C}) % {_IH_M}
                   AS v
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        )
        SELECT doc_id AS media_id,
               CAST({_IH_W} AS BIGINT) AS width,
               CAST({_IH_H} AS BIGINT) AS height,
               CAST(1 AS BIGINT) AS n_frames,
               CAST(SUM(v) AS BIGINT) AS sum_gq,
               CAST(SUM(v * v) AS BIGINT) AS sum_gq2
        FROM px GROUP BY doc_id
        """

    # Scene cuts: the clip construction plants exactly one cut per
    # doc at 4 + doc_id % 5 over SC_FRAMES frames; the Spark side must
    # re-derive it through the full encode→decode→detect pipeline.
    from pennsieve_streaming_spark.llm.video import SC_FRAMES as _SC_F

    sql["mm_video_scene_cuts"] = f"""
        SELECT doc_id AS media_id,
               CAST({_SC_F} AS BIGINT) AS n_frames,
               CAST(4 + doc_id % 5 AS BIGINT) AS cut_idx
        FROM documents
        """

    # SSIM: the degradation and the SSIM finish are both imported from
    # the operator module verbatim; the sums replay the closed form.
    from pennsieve_streaming_spark.llm.imagehash import (
        SSIM_DEGRADE as _SSIM_DEG,
        SSIM_EXPR as _SSIM_EXPR,
    )

    sql["mm_image_ssim"] = f"""
        WITH px AS (
          SELECT doc_id,
                 (doc_id * {_IH_A} + i * {_IH_B} + j * {_IH_C}) % {_IH_M}
                   AS x
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        deg AS (SELECT doc_id, x, {_SSIM_DEG} AS y FROM px),
        g AS (
          SELECT doc_id AS media_id,
                 CAST(COUNT(*) AS BIGINT) AS n_px,
                 CAST(SUM(x) AS BIGINT) AS sum_x,
                 CAST(SUM(y) AS BIGINT) AS sum_y,
                 CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                 CAST(SUM(y * y) AS BIGINT) AS sum_yy,
                 CAST(SUM(x * y) AS BIGINT) AS sum_xy
          FROM deg GROUP BY doc_id
        )
        SELECT media_id, n_px, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
               {_SSIM_EXPR} AS ssim
        FROM g
        """

    _ihg = f"(doc_id * {_IH_A} + {{i}} * {_IH_B} + {{j}} * {_IH_C}) % {_IH_M}"
    _ih_lap = (
        f"4 * ({_ihg.format(i='i', j='j')}) "
        f"- ({_ihg.format(i='(i - 1)', j='j')}) "
        f"- ({_ihg.format(i='(i + 1)', j='j')}) "
        f"- ({_ihg.format(i='i', j='(j - 1)')}) "
        f"- ({_ihg.format(i='i', j='(j + 1)')})"
    )
    from pennsieve_streaming_spark.llm.imagehash import (
        SOBEL_T2 as _SOB_T2,
    )

    def _ihv(i, j):
        return "(" + _ihg.format(i=i, j=j) + ")"

    _ih_gx = (
        f"(({_ihv('(i - 1)', '(j + 1)')} + 2 * {_ihv('i', '(j + 1)')} "
        f"+ {_ihv('(i + 1)', '(j + 1)')}) "
        f"- ({_ihv('(i - 1)', '(j - 1)')} + 2 * {_ihv('i', '(j - 1)')} "
        f"+ {_ihv('(i + 1)', '(j - 1)')}))"
    )
    _ih_gy = (
        f"(({_ihv('(i + 1)', '(j - 1)')} + 2 * {_ihv('(i + 1)', 'j')} "
        f"+ {_ihv('(i + 1)', '(j + 1)')}) "
        f"- ({_ihv('(i - 1)', '(j - 1)')} + 2 * {_ihv('(i - 1)', 'j')} "
        f"+ {_ihv('(i - 1)', '(j + 1)')}))"
    )
    sql["mm_image_edges"] = f"""
        WITH e2t AS (
          SELECT doc_id,
                 {_ih_gx} * {_ih_gx} + {_ih_gy} * {_ih_gy} AS e2
          FROM documents,
               UNNEST(generate_series(1, {_IH_H - 2})) AS ti(i),
               UNNEST(generate_series(1, {_IH_W - 2})) AS tj(j)
        ),
        g AS (
          SELECT doc_id AS media_id,
                 CAST(COUNT(*) AS BIGINT) AS n_interior,
                 CAST(SUM(CASE WHEN e2 > {_SOB_T2} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_edges,
                 CAST(SUM(e2) AS BIGINT) AS se2,
                 CAST(MAX(e2) AS BIGINT) AS max_e2
          FROM e2t GROUP BY doc_id
        )
        SELECT media_id, n_interior, n_edges,
               round(CAST(n_edges AS DOUBLE) / n_interior, 9)
                 AS edge_density,
               round(CAST(se2 AS DOUBLE) / n_interior, 9)
                 AS mean_grad_energy,
               max_e2
        FROM g
        """

    sql["mm_image_quality"] = f"""
        WITH px AS (
          SELECT doc_id, i, j, {_ihg.format(i='i', j='j')} AS v
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        gstats AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_px,
                 CAST(SUM(v) AS BIGINT) AS sg,
                 CAST(SUM(v * v) AS BIGINT) AS sg2,
                 CAST(MAX(v) - MIN(v) AS BIGINT) AS grange
          FROM px GROUP BY doc_id
        ),
        lap AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lap,
                 CAST(SUM(l) AS BIGINT) AS sl,
                 CAST(SUM(l * l) AS BIGINT) AS sl2
          FROM (
            SELECT doc_id, {_ih_lap} AS l
            FROM documents,
                 UNNEST(generate_series(1, {_IH_H - 2})) AS ti(i),
                 UNNEST(generate_series(1, {_IH_W - 2})) AS tj(j)
          ) GROUP BY doc_id
        )
        SELECT g.doc_id AS media_id, g.n_px, g.grange,
               round((CAST(g.n_px AS DOUBLE) * CAST(g.sg2 AS DOUBLE)
                 - CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE))
                 / (CAST(g.n_px AS DOUBLE) * CAST(g.n_px AS DOUBLE)), 9)
                 AS contrast_var,
               round((CAST(p.n_lap AS DOUBLE) * CAST(p.sl2 AS DOUBLE)
                 - CAST(p.sl AS DOUBLE) * CAST(p.sl AS DOUBLE))
                 / (CAST(p.n_lap AS DOUBLE) * CAST(p.n_lap AS DOUBLE)), 9)
                 AS lap_var
        FROM gstats g JOIN lap p ON g.doc_id = p.doc_id
        """

    # pHash: integer DCT bilinear forms against the Python-quantized
    # basis literals, lower-median threshold — the numpy kernel
    # replayed relationally (coef value order is engine-independent,
    # so the ROW_NUMBER median tie-break never affects the VALUE)
    from pennsieve_streaming_spark.llm.imagehash import (
        _BI as _PH_BI,
        _BJ as _PH_BJ,
    )

    _ph_bi = (
        "[" + ", ".join(str(int(x)) for x in _PH_BI.reshape(-1))
        + "]::BIGINT[]"
    )
    _ph_bj = (
        "[" + ", ".join(str(int(x)) for x in _PH_BJ.reshape(-1))
        + "]::BIGINT[]"
    )
    sql["mm_image_phash"] = f"""
        WITH px2 AS (
          SELECT doc_id, i, j,
                 (doc_id * {_IH_A} + i * {_IH_B} + j * {_IH_C}) % {_IH_M}
                   AS pv
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        tabs AS (SELECT {_ph_bi} AS bi, {_ph_bj} AS bj),
        coef AS (
          SELECT doc_id, u, v,
                 CAST(SUM(pv * t.bi[u * {_IH_H} + i + 1]
                             * t.bj[v * {_IH_W} + j + 1]) AS BIGINT)
                   AS coef
          FROM px2 CROSS JOIN tabs t,
               UNNEST(generate_series(0, 7)) AS tu(u),
               UNNEST(generate_series(0, 7)) AS tv(v)
          GROUP BY doc_id, u, v
        ),
        med AS (
          SELECT doc_id, coef AS med FROM (
            SELECT doc_id, coef,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY coef) AS rn
            FROM coef) WHERE rn = 32
        )
        SELECT hx.doc_id AS media_id,
               CAST(CASE WHEN hu >= (CAST(1 AS HUGEINT) << 63)
                         THEN hu - (CAST(1 AS HUGEINT) << 64) ELSE hu END
                    AS BIGINT) AS phash
        FROM (
          SELECT c.doc_id,
                 SUM(CASE WHEN c.coef > m.med
                          THEN CAST(1 AS HUGEINT) << (c.u * 8 + c.v)
                          ELSE CAST(0 AS HUGEINT) END) AS hu
          FROM coef c JOIN med m USING (doc_id)
          GROUP BY c.doc_id
        ) hx(doc_id, hu)
        """

    # capped two-star replay, same structure as doc_simhash_near_pairs
    # — the synthetic field's mod-256 identical-hash groups are exactly
    # the hot buckets the cap exists for at corpus scale
    sql["mm_dhash_near_pairs"] = f"""
        WITH {_dhash_cte},
        keys AS ({_band_selects("dh", "media_id", "dhash", 64, 5)}),
        kstats AS (
          SELECT band, band_key, COUNT(*) AS bn, MIN(media_id) AS anchor,
                 arg_min(dhash, media_id) AS anchor_sh,
                 MAX(media_id) AS anchor2,
                 arg_max(dhash, media_id) AS anchor2_sh
          FROM keys GROUP BY band, band_key
        ),
        kk AS (
          SELECT k.media_id, k.dhash, k.band, k.band_key,
                 s.bn, s.anchor, s.anchor_sh, s.anchor2, s.anchor2_sh
          FROM keys k JOIN kstats s USING (band, band_key)
        )
        SELECT DISTINCT media_a, media_b, hamming FROM (
          SELECT a.media_id AS media_a, b.media_id AS media_b,
                 CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
          FROM kk a JOIN kk b
            ON a.band = b.band AND a.band_key = b.band_key
               AND a.media_id < b.media_id
          WHERE a.bn <= {LSH_MAX_BUCKET}
          UNION ALL
          SELECT anchor AS media_a, media_id AS media_b,
                 CAST(bit_count(xor(dhash, anchor_sh)) AS BIGINT) AS hamming
          FROM kk WHERE bn > {LSH_MAX_BUCKET} AND media_id > anchor
          UNION ALL
          SELECT media_id AS media_a, anchor2 AS media_b,
                 CAST(bit_count(xor(dhash, anchor2_sh)) AS BIGINT) AS hamming
          FROM kk WHERE bn > {LSH_MAX_BUCKET} AND media_id < anchor2
        ) WHERE hamming <= 4
        """

    sql["mm_frame_sample"] = """
        SELECT media_id, CAST(UNNEST(generate_series(0, greatest(nf - 1, 0), 5)) AS BIGINT) AS frame_idx
        FROM (
          SELECT doc_id AS media_id, CAST(n_chars % 30 AS INTEGER) AS nf
          FROM documents WHERE doc_id % 3 = 2
        )
        """

    # --- S7 segment wire shape, exploded ------------------------------------
    sql["ts_build_segments"] = with_views(
        f"""
        WITH mm AS ({_downsample_time}),
        rr AS (
          SELECT channel, min_val, max_val,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY bucket) - 1 AS r,
                 MIN(bucket) OVER (PARTITION BY channel) AS b0,
                 COUNT(*) OVER (PARTITION BY channel) AS np
          FROM mm
        ),
        meta AS (
          SELECT channel AS channel_name, channel AS source,
                 {T1992} + b0 * {WEEK_US} AS start_ts,
                 {T1992} AS page_start, {T1999} AS page_end,
                 CAST({WEEK_US} AS DOUBLE) AS sample_period,
                 CAST({WEEK_US} AS DOUBLE) AS requested_sample_period,
                 TRUE AS is_min_max, 'V' AS unit,
                 CAST(1000 AS BIGINT) AS unit_m,
                 'Continuous' AS segment_type, np AS nr_points,
                 r, min_val, max_val
          FROM rr
        )
        SELECT channel_name, source, start_ts, page_start, page_end,
               sample_period, requested_sample_period, is_min_max, unit,
               unit_m, segment_type, nr_points, r * 2 AS pos, min_val AS v
        FROM meta
        UNION ALL
        SELECT channel_name, source, start_ts, page_start, page_end,
               sample_period, requested_sample_period, is_min_max, unit,
               unit_m, segment_type, nr_points, r * 2 + 1 AS pos, max_val AS v
        FROM meta
        """,
        "samples",
    )

    # --- A5 data-driven event summary (recursive chunk-start walk) ----------
    # PredicateStreamChunker semantics: chunk k starts at the first
    # unassigned event; the next chunk starts at the first event with
    # ts >= chunk_start + pixel. Chunk starts are recursively defined,
    # so the oracle walks them with a recursive CTE (depth = #chunks,
    # not #events) and assigns buckets by counting starts <= ts.
    sql["ts_event_summary_datadriven"] = f"""
        WITH RECURSIVE chan_events AS ({TBL.DUCKDB_VIEWS['chan_events']}),
        ev AS (
          SELECT channel, ts,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts, value) - 1 AS idx
          FROM chan_events WHERE ts >= {EV_START} AND ts <= {EV_END}
        ),
        starts AS (
          SELECT channel, MIN(ts) AS cs FROM ev GROUP BY channel
          UNION ALL
          SELECT s.channel,
                 (SELECT MIN(e.ts) FROM ev e
                  WHERE e.channel = s.channel AND e.ts >= s.cs + {PIXEL_EV_US})
          FROM starts s
          WHERE (SELECT MIN(e.ts) FROM ev e
                 WHERE e.channel = s.channel AND e.ts >= s.cs + {PIXEL_EV_US}) IS NOT NULL
        ),
        bucketed AS (
          SELECT e.channel, e.ts, e.idx,
                 (SELECT COUNT(*) FROM starts st
                  WHERE st.channel = e.channel AND st.cs <= e.ts) - 1 AS bucket
          FROM ev e
        )
        SELECT channel, bucket, MIN(ts) AS min_time, MAX(ts) AS max_time,
               MIN(idx) AS min_index, MAX(idx) AS max_index, COUNT(*) AS count,
               MIN(ts) + CAST(FLOOR((MAX(ts) - MIN(ts)) / 2) AS BIGINT) AS avg_time
        FROM bucketed GROUP BY channel, bucket
        """

    # --- G1-G3 Butterworth golden window (recursive-CTE recurrence) ---------
    sql["ts_butterworth_filter"] = _butterworth_oracle_sql()
    # the lane-vectorized bulk operator must be bit-identical
    sql["ts_butterworth_filter_bulk"] = sql["ts_butterworth_filter"]

    # --- regular-rate count-downsample fast path ----------------------------
    sql["ts_minmax_downsample_count_regular"] = with_views(
        f"""
        SELECT channel, bucket, MIN(value) AS min_val, MAX(value) AS max_val,
               COUNT(*) AS n_samples
        FROM (
          SELECT channel, value,
                 CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts, value) - 1)
                      / {CHUNK_SIZE}) AS BIGINT) AS bucket
          FROM samples_aligned WHERE channel = 'lead'
        ) GROUP BY channel, bucket
        HAVING COUNT(*) = {CHUNK_SIZE}
        """,
        "samples_aligned",
    )

    # --- S2 unit_ranges catalog lookup --------------------------------------
    sql["ts_unit_range_lookup"] = with_views(
        f"""
        SELECT id, channel, count, lo, hi, tsindex, tsblob FROM (
          SELECT CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo, span_hi) - 1 AS BIGINT) AS id,
                 channel, n_segments AS count,
                 span_lo AS lo, span_hi AS hi,
                 channel || '_' || CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo, span_hi) - 1 AS VARCHAR) || '.tsindex' AS tsindex,
                 channel || '_' || CAST(ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo, span_hi) - 1 AS VARCHAR) || '.tsblob' AS tsblob
          FROM ({_gap_spans})
        )
        WHERE channel = 'purchase'
          AND lo <= {EV_START + 20 * 86_400 * US} AND hi >= {EV_START + 5 * 86_400 * US}
        """,
        "chan_events",
    )

    # --- IVF ANN (fixed literal centroids) ----------------------------------
    sql["emb_sq8_distortion"] = """
        WITH comp AS (
          SELECT UNNEST(generate_series(0,
                   len(CAST(embedding AS DOUBLE[])) - 1)) AS dim_j,
                 UNNEST(CAST(embedding AS DOUBLE[])) AS x
          FROM embeddings
        ),
        ext AS (
          SELECT dim_j, MIN(x) AS mn, MAX(x) AS mx
          FROM comp GROUP BY dim_j
        ),
        err AS (
          SELECT c.dim_j, e.mn, e.mx,
                 CAST(round((CASE WHEN mx = mn THEN mn ELSE mn + round((x - mn) * 255e0 / (mx - mn)) * (mx - mn) / 255e0 END - x) * (CASE WHEN mx = mn THEN mn ELSE mn + round((x - mn) * 255e0 / (mx - mn)) * (mx - mn) / 255e0 END - x) * 1000000000)
                   AS BIGINT) AS _eq
          FROM comp c JOIN ext e ON c.dim_j = e.dim_j
        )
        SELECT dim_j, CAST(COUNT(*) AS BIGINT) AS n, mn, mx,
               CAST(SUM(_eq) AS DOUBLE) / COUNT(*) / 1000000000 AS mse
        FROM err GROUP BY dim_j, mn, mx
        """

    sql["emb_isotropy"] = """
        WITH base AS (
          SELECT list_transform(
                   CAST(embedding AS DOUBLE[]),
                   x -> CAST(round(x / sqrt(list_dot_product(
                        CAST(embedding AS DOUBLE[]),
                        CAST(embedding AS DOUBLE[]))) * 1000000)
                        AS BIGINT)) AS u
          FROM embeddings
          WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[])) > 0
        ),
        comp AS (
          SELECT UNNEST(u) AS c,
                 UNNEST(generate_series(1, len(u))) AS j
          FROM base
        ),
        dims AS (
          SELECT j, CAST(SUM(c) AS BIGINT) AS s FROM comp GROUP BY j
        ),
        tot AS (
          SELECT SUM(CAST(s AS HUGEINT) * s) AS _ss FROM dims
        ),
        rows_ AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
                 SUM(list_reduce(list_prepend(CAST(0 AS HUGEINT),
                     list_transform(u, x -> CAST(x AS HUGEINT) * x)),
                     (a, x) -> a + x)) AS _rn2
          FROM base
        )
        SELECT n_vectors, CAST(64 AS BIGINT) AS dim,
               CASE WHEN n_vectors > 1 THEN
                 (CAST(_ss AS DOUBLE) - CAST(_rn2 AS DOUBLE))
                 / (CAST(n_vectors AS DOUBLE) * (n_vectors - 1)
                    * 1000000 * CAST(1000000 AS DOUBLE)) END
                 AS mean_cosine
        FROM rows_ CROSS JOIN tot
        """

    sql["emb_ann_ivf"] = _ivf_oracle_sql()

    # --- PQ ADC ANN ---------------------------------------------------------
    sql["emb_ann_pq"] = _pq_oracle_sql()
    sql["emb_pq_distortion"] = _pq_distortion_oracle_sql()

    # --- IVF-PQ composition -------------------------------------------------
    sql["emb_ann_ivf_pq"] = _ivf_pq_oracle_sql()

    # --- embedding-cosine near-dup pairs (banded LSH) ------------------------
    sql["emb_near_dup_pairs"] = f"""
        WITH planes AS (
          SELECT p, list_transform(generate_series(0, {ANN_DIM - 1}),
                 j -> fmod((p * {ANN_DIM} + j) * 0.6180339887498949e0, 1.0e0) - 0.5e0) AS h
          FROM (SELECT UNNEST(generate_series(0, {EMB_LSH_TABLES * EMB_LSH_BITS - 1})) AS p)
        ),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        keys AS (
          SELECT e.vec_id, p.p // {EMB_LSH_BITS} AS tbl,
                 CAST(SUM(CASE WHEN list_dot_product(e.v, p.h) > 0
                          THEN (CAST(1 AS BIGINT) << (p.p % {EMB_LSH_BITS}))
                          ELSE 0 END) AS BIGINT) AS k
          FROM emb e CROSS JOIN planes p GROUP BY e.vec_id, p.p // {EMB_LSH_BITS}
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM keys a
          JOIN keys b ON a.tbl = b.tbl AND a.k = b.k AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cosine FROM (
          SELECT c.id_a, c.id_b,
                 list_dot_product(ea.v, eb.v)
                   / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) AS cosine
          FROM cand c
          JOIN emb ea ON ea.vec_id = c.id_a
          JOIN emb eb ON eb.vec_id = c.id_b
        ) WHERE cosine >= {EMB_NEAR_DUP_COS}e0
        """

    # --- random-hyperplane ANN ----------------------------------------------
    sql["emb_ann_lsh"] = f"""
        WITH planes AS (
          SELECT p, list_transform(generate_series(0, {ANN_DIM - 1}),
                 j -> fmod((p * {ANN_DIM} + j) * 0.6180339887498949e0, 1.0e0) - 0.5e0) AS h
          FROM (SELECT UNNEST(generate_series(0, {ANN_PLANES - 1})) AS p)
        ),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bkt AS (
          SELECT e.vec_id,
                 CAST(SUM(CASE WHEN list_dot_product(e.v, p.h) > 0
                          THEN (CAST(1 AS BIGINT) << p.p) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb e CROSS JOIN planes p GROUP BY e.vec_id
        ),
        c AS (SELECT e.vec_id AS neighbor_id, e.v, b.bucket
              FROM emb e JOIN bkt b ON e.vec_id = b.vec_id),
        q AS (SELECT e.vec_id AS query_id, e.v AS qv, b.bucket
              FROM emb e JOIN bkt b ON e.vec_id = b.vec_id WHERE e.vec_id < 20),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON q.bucket = c.bucket AND query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {ANN_K}
        """

    # Loud lookup (ADVICE r7): assert the substrings exist before text
    # surgery — a silent no-op replace() would quietly revert the kNN
    # graph oracle to the 20-query/k=5 LSH shape.
    assert "WHERE e.vec_id < 20" in sql["emb_ann_lsh"]
    assert f"WHERE rank <= {ANN_K}" in sql["emb_ann_lsh"]
    sql["emb_knn_graph"] = sql["emb_ann_lsh"].replace(
        "WHERE e.vec_id < 20", ""
    ).replace(f"WHERE rank <= {ANN_K}", "WHERE rank <= 3")

    # --- ANN recall@k eval: LSH index vs exact top-k ground truth -----------
    # Composes the two already-gated oracle queries verbatim as derived
    # tables — the metric has no arithmetic of its own beyond one exact
    # integer count and one float division.
    sql["emb_ann_recall"] = f"""
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / {ANN_K} AS recall
        FROM ({sql["emb_cosine_topk"]}) e
        LEFT JOIN (SELECT DISTINCT query_id, neighbor_id
                   FROM ({sql["emb_ann_lsh"]})) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
        """

    sql["emb_bq_recall"] = f"""
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / {ANN_K} AS recall
        FROM ({sql["emb_cosine_topk"]}) e
        LEFT JOIN (SELECT DISTINCT query_id, neighbor_id
                   FROM ({sql["emb_bq_topk"]}) ) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
        """

    sql["emb_ann_recall_ivf"] = f"""
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / {ANN_K} AS recall
        FROM ({sql["emb_cosine_topk"]}) e
        LEFT JOIN (SELECT DISTINCT query_id, neighbor_id
                   FROM ({sql["emb_ann_ivf"]})) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
        """

    _trunc_topk = f"""
        WITH q AS (SELECT vec_id AS query_id,
                          (CAST(embedding AS DOUBLE[]))[1:{TRUNC_DIM}] AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id,
                     (CAST(embedding AS DOUBLE[]))[1:{TRUNC_DIM}] AS v
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON query_id != neighbor_id
        )
        SELECT query_id, neighbor_id FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= 5
        """
    sql["emb_truncation_recall"] = f"""
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / 5 AS recall
        FROM ({sql["emb_cosine_topk"]}) e
        LEFT JOIN ({_trunc_topk}) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
        """

    # --- cluster-balanced deterministic sampling -----------------------------
    from pennsieve_streaming_spark.llm.curation import (
        SAMPLE_MOD as _SAMPLE_MOD,
        SAMPLE_MULT as _SAMPLE_MULT,
    )

    _cs_rows, _cs_d2 = _ivf_cent_fragments()
    sql["emb_cluster_sample"] = f"""
        WITH cents AS (SELECT * FROM (VALUES {_cs_rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {_cs_d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        assigned AS (
          SELECT vec_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        keyed AS (
          SELECT vec_id, list_id,
                 ((((vec_id + 0) % {_SAMPLE_MOD}) * {_SAMPLE_MULT}) % {_SAMPLE_MOD}) AS u
          FROM assigned
        )
        SELECT vec_id, CAST(list_id AS BIGINT) AS list_id, pick FROM (
          SELECT vec_id, list_id,
                 CAST(ROW_NUMBER() OVER (PARTITION BY list_id ORDER BY u, vec_id) AS BIGINT) AS pick
          FROM keyed
        ) WHERE pick <= {EMB_SAMPLE_CAP}
        """

    # --- golden-model inertia (elbow/drift metric) ---------------------------
    _sil_rows, _sil_d2 = _ivf_cent_fragments()
    _sil_dB = "sqrt(greatest(dB, 0.0e0))"
    _sil_dA = "sqrt(greatest(dA, 0.0e0))"
    sql["emb_silhouette"] = f"""
        WITH cents AS (SELECT * FROM (VALUES {_sil_rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {_sil_d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        two AS (
          SELECT vec_id, list_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY d2, list_id) AS rn
          FROM dists
        ),
        asg AS (SELECT vec_id, list_id FROM two WHERE rn = 1),
        dd AS (
          SELECT vec_id,
                 MAX(CASE WHEN rn = 1 THEN d2 END) AS dA,
                 MAX(CASE WHEN rn = 2 THEN d2 END) AS dB
          FROM two WHERE rn <= 2 GROUP BY vec_id
        ),
        per AS (
          SELECT a.list_id,
                 CASE WHEN {_sil_dB} > 0.0e0 THEN
                   CAST(round(({_sil_dB} - {_sil_dA}) / {_sil_dB}
                        * 1000000000) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS sq
          FROM asg a JOIN dd USING (vec_id)
        )
        SELECT CAST(list_id AS BIGINT) AS list_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(sq) AS BIGINT) AS sum_sq,
               round(CAST(SUM(sq) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1000000000), 9)
                 AS mean_sil
        FROM per GROUP BY list_id
        """

    sql["emb_kmeans_inertia"] = f"""
        WITH cents AS (SELECT * FROM (VALUES {_cs_rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {_cs_d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        assigned AS (
          SELECT vec_id, list_id, d2 FROM (
            SELECT vec_id, list_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        dq AS (
          SELECT list_id,
                 CAST(round(d2 * 1000000000) AS BIGINT) AS d2q
          FROM assigned
        )
        SELECT CAST(list_id AS BIGINT) AS list_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d2q) AS BIGINT) AS inertia_q,
               CAST(SUM(d2q) AS DOUBLE) / 1000000000 AS inertia
        FROM dq GROUP BY list_id
        """

    # --- multi-probe variant: query probes 1-bit-away buckets too -----------
    sql["emb_ann_lsh_multiprobe"] = f"""
        WITH planes AS (
          SELECT p, list_transform(generate_series(0, {ANN_DIM - 1}),
                 j -> fmod((p * {ANN_DIM} + j) * 0.6180339887498949e0, 1.0e0) - 0.5e0) AS h
          FROM (SELECT UNNEST(generate_series(0, {ANN_PLANES - 1})) AS p)
        ),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bkt AS (
          SELECT e.vec_id,
                 CAST(SUM(CASE WHEN list_dot_product(e.v, p.h) > 0
                          THEN (CAST(1 AS BIGINT) << p.p) ELSE 0 END) AS BIGINT) AS bucket
          FROM emb e CROSS JOIN planes p GROUP BY e.vec_id
        ),
        c AS (SELECT e.vec_id AS neighbor_id, e.v, b.bucket
              FROM emb e JOIN bkt b ON e.vec_id = b.vec_id),
        q AS (
          SELECT query_id, qv,
                 UNNEST(list_distinct(list_prepend(bucket,
                   list_transform(generate_series(0, {ANN_PLANES - 1}),
                     p -> xor(bucket, CAST(1 AS BIGINT) << p))))) AS bucket
          FROM (SELECT e.vec_id AS query_id, e.v AS qv, b.bucket
                FROM emb e JOIN bkt b ON e.vec_id = b.vec_id
                WHERE e.vec_id < 20)
        ),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON q.bucket = c.bucket AND query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {ANN_K}
        """

    # --- round-5b oracles --------------------------------------------------

    sql["emb_ann_recall_multiprobe"] = f"""
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / {ANN_K} AS recall
        FROM ({sql["emb_cosine_topk"]}) e
        LEFT JOIN (SELECT DISTINCT query_id, neighbor_id
                   FROM ({sql["emb_ann_lsh_multiprobe"]})) a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
        """

    sql["ev_top_paths"] = """
        WITH ev AS (
          SELECT epoch_us(ts) AS ts, event_id, user_id, event_type
          FROM events WHERE event_type IS NOT NULL
        ),
        led AS (
          SELECT event_type AS t0,
                 LEAD(event_type, 1) OVER w AS t1,
                 LEAD(event_type, 2) OVER w AS t2
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t0 || '>' || t1 || '>' || t2 AS path,
               CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM led WHERE t2 IS NOT NULL
        GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 20
        """

    from pennsieve_streaming_spark.llm.curation import (
        SAMPLE_MOD as _WS_MOD,
        SAMPLE_MULT as _WS_MULT,
    )

    _ws_u = (
        f"((((doc_id % {_WS_MOD}) * {_WS_MULT} + 0) % {_WS_MOD}) + 1) "
        f"/ CAST({_WS_MOD} AS DOUBLE)"
    )
    sql["doc_weighted_sample"] = f"""
        SELECT doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
               round(ln({_ws_u}) / CAST(GREATEST(n_chars, 1) AS DOUBLE), 9)
                 AS skey
        FROM documents
        ORDER BY skey DESC, doc_id LIMIT {WSAMPLE_N}
        """

    _ltob_area = (
        "CAST(round(abs(CAST(x0 - ts2 AS DOUBLE) * (value - y0) "
        "- CAST(x0 - ts AS DOUBLE) * (y2 - y0))) AS BIGINT)"
    )
    sql["ts_ltob_downsample"] = with_views(
        f"""
        SELECT channel, bucket, ts, value, area_q FROM (
          SELECT channel, bucket, ts, value, area_q,
                 ROW_NUMBER() OVER (PARTITION BY channel, bucket
                     ORDER BY area_q DESC, ts, value) AS pk
          FROM (
            SELECT channel, CAST(rn // {LTOB_BUCKET} AS BIGINT) AS bucket,
                   ts, value,
                   CASE WHEN x0 IS NULL OR ts2 IS NULL THEN CAST(-1 AS BIGINT)
                        ELSE {_ltob_area} END AS area_q
            FROM (
              SELECT channel, ts, value,
                     ROW_NUMBER() OVER w - 1 AS rn,
                     LAG(ts) OVER w AS x0, LAG(value) OVER w AS y0,
                     LEAD(ts) OVER w AS ts2, LEAD(value) OVER w AS y2
              FROM samples WHERE channel = 'ch3'
              WINDOW w AS (PARTITION BY channel ORDER BY ts, value)
            )
          )
        ) WHERE pk = 1
        """,
        "samples",
    )

    from pennsieve_streaming_spark.operators.sax import (
        QUANT as _SAX_Q,
        sax_symbol_case,
        seg_z_expr,
        window_stats_exprs,
    )

    _sax_mean, _sax_std = window_stats_exprs(SAX_WINDOW)
    _sax_seg_len = SAX_WINDOW // SAX_SEGMENTS
    _sax_sym = sax_symbol_case(seg_z_expr(_sax_seg_len))
    sql["ts_sax_words"] = with_views(
        f"""
        WITH r AS (
          SELECT channel,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS rn,
                 CAST(round(value * {_SAX_Q}) AS BIGINT) AS vq
          FROM samples
        ),
        g AS (
          SELECT channel, CAST(rn // {SAX_WINDOW} AS BIGINT) AS win,
                 CAST((rn % {SAX_WINDOW}) // {_sax_seg_len} AS BIGINT) AS seg,
                 vq
          FROM r
        ),
        segs AS (
          SELECT channel, win, seg, CAST(SUM(vq) AS BIGINT) AS ssum,
                 CAST(SUM(vq * vq) AS BIGINT) AS ssq, COUNT(*) AS scnt
          FROM g GROUP BY 1, 2, 3
        ),
        wins AS (
          SELECT channel, win, {_sax_mean} AS mean, {_sax_std} AS std
          FROM (
            SELECT channel, win, CAST(SUM(ssum) AS BIGINT) AS sx,
                   CAST(SUM(ssq) AS BIGINT) AS sxx, SUM(scnt) AS n
            FROM segs GROUP BY 1, 2
          ) WHERE n = {SAX_WINDOW}
        ),
        sy AS (
          SELECT s.channel, s.win, s.seg, w.mean, w.std, {_sax_sym} AS sym
          FROM segs s JOIN wins w
            ON s.channel = w.channel AND s.win = w.win
        )
        SELECT channel, win, MIN(mean) AS mean, MIN(std) AS std,
               string_agg(sym, '' ORDER BY seg) AS sax_word
        FROM sy GROUP BY channel, win
        """,
        "samples",
    )

    sql["ts_sax_motifs"] = f"""
        WITH c AS (
          SELECT channel, sax_word, CAST(COUNT(*) AS BIGINT) AS motif_count
          FROM ({sql["ts_sax_words"]}) GROUP BY channel, sax_word
        ),
        t AS (
          SELECT channel, CAST(SUM(motif_count) AS BIGINT) AS n_windows
          FROM c GROUP BY channel
        ),
        r AS (
          SELECT c.channel, c.sax_word, t.n_windows, c.motif_count,
                 ROW_NUMBER() OVER (PARTITION BY c.channel
                     ORDER BY c.motif_count DESC, c.sax_word) AS rank
          FROM c JOIN t USING (channel)
        )
        SELECT channel, sax_word, n_windows, motif_count,
               CAST(motif_count AS DOUBLE) / n_windows AS share,
               CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 3
        """

    sql["ts_sax_discords"] = f"""
        WITH w AS ({sql["ts_sax_words"]}),
        c AS (
          SELECT channel, sax_word, CAST(COUNT(*) AS BIGINT) AS word_count
          FROM w GROUP BY channel, sax_word
        ),
        r AS (
          SELECT channel, sax_word, word_count,
                 CAST(ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY word_count ASC, sax_word) AS BIGINT) AS rank
          FROM c
        )
        SELECT w.channel, w.win, w.sax_word, r.word_count, r.rank
        FROM w JOIN r ON w.channel = r.channel AND w.sax_word = r.sax_word
        WHERE r.rank <= 3
        """

    sql["ts_welch_psd"] = f"""
        SELECT channel, freq_hz, n_windows, sum_power_q,
               CAST(sum_power_q AS DOUBLE) / CAST(n_windows AS DOUBLE)
                 AS avg_power
        FROM (
          SELECT channel, freq_hz, CAST(COUNT(*) AS BIGINT) AS n_windows,
                 CAST(SUM(CAST(round(power) AS BIGINT)) AS BIGINT)
                   AS sum_power_q
          FROM ({sql["ts_band_power"]}) GROUP BY channel, freq_hz
        )
        """

    _asof_span = T1999 - T1992
    sql["ts_asof_join"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, MAX(value) AS value
          FROM samples GROUP BY channel, ts
        ),
        p AS (
          SELECT event_id,
                 'ch' || CAST(length(event_type) % 8 AS VARCHAR) AS channel,
                 epoch_us(ts) % {_asof_span} + {T1992} AS ts
          FROM events
        )
        SELECT p.event_id, p.channel, p.ts AS probe_ts,
               COALESCE(s.value, CAST(0 AS DOUBLE)) AS value,
               CAST(COALESCE(s.ts, -1) AS BIGINT) AS src_ts,
               CAST(COALESCE(p.ts - s.ts, -1) AS BIGINT) AS stale_us,
               s.ts IS NOT NULL AS matched
        FROM p ASOF LEFT JOIN s
          ON p.channel = s.channel AND s.ts <= p.ts
        """,
        "samples",
    )
    # blocked-halo and streaming execution must be bit-identical to the
    # global batch pass — all three share one oracle
    sql["ts_asof_join_blocked"] = sql["ts_asof_join"]
    sql["stream_asof_join"] = sql["ts_asof_join"]

    sql["ts_event_triggered_avg"] = with_views(
        f"""
        WITH trig AS (
          SELECT 'ch' || CAST(length(event_type) % 8 AS VARCHAR)
                   AS channel,
                 epoch_us(ts) % {_asof_span} + {T1992} AS ev_ts
          FROM events
        ),
        smp AS (
          SELECT channel, ts,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq,
                 ts // {ETA_L_US} AS bk
          FROM samples
        ),
        tx AS (
          SELECT channel, ev_ts,
                 UNNEST([ev_ts // {ETA_L_US} - 1, ev_ts // {ETA_L_US},
                         ev_ts // {ETA_L_US} + 1]) AS bk
          FROM trig
        ),
        j AS (
          SELECT t.channel, s.ts - t.ev_ts AS dt, s.xq
          FROM tx t JOIN smp s ON s.channel = t.channel AND s.bk = t.bk
          WHERE s.ts - t.ev_ts >= -{ETA_L_US}
            AND s.ts - t.ev_ts < {ETA_L_US}
        )
        SELECT channel, CAST((dt + {ETA_L_US}) // {ETA_BIN_US} AS BIGINT)
                 AS off_bin,
               CAST(((dt + {ETA_L_US}) // {ETA_BIN_US}) * {ETA_BIN_US}
                 - {ETA_L_US} AS BIGINT) AS off_lo_us,
               CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(xq) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * {CORR_QUANT}), 9)
                 AS mean_value
        FROM j GROUP BY channel, (dt + {ETA_L_US}) // {ETA_BIN_US}
        """,
        "samples",
    )

    sql["doc_novelty"] = f"""
        WITH {DOC_PRE},
        fst AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
        per AS (
          SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(CASE WHEN f.first_doc = s.doc_id
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
          FROM sh s JOIN fst f USING (sh) GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
               CASE WHEN p.n_shingles IS NULL OR p.n_shingles = 0
                    THEN CAST(NULL AS DOUBLE)
                    ELSE round(CAST(p.n_novel AS DOUBLE)
                               / CAST(p.n_shingles AS DOUBLE), 9) END
                 AS novelty
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """

    sql["doc_ngram_containment"] = f"""
        WITH {DOC_PRE},
        ok_sh AS (
          SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ints AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a
          JOIN ok_sh o ON a.sh = o.sh
          JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b, CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b, CAST(i.inter AS BIGINT) AS inter,
               i.inter / CAST(sa.n AS DOUBLE) AS cont_a,
               i.inter / CAST(sb.n AS DOUBLE) AS cont_b
        FROM ints i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
        WHERE GREATEST(i.inter / CAST(sa.n AS DOUBLE),
                       i.inter / CAST(sb.n AS DOUBLE)) >= {CONT_MIN}e0
        """

    sql["doc_contamination_fuzzy"] = f"""
        WITH {MINHASH_PRE}, {BANDS},
        corpus AS (
          SELECT doc_id FROM documents
          WHERE doc_id % {BENCH_MOD} != {BENCH_REM}
        ),
        cb AS (SELECT * FROM bands WHERE doc_id % {BENCH_MOD} != {BENCH_REM}),
        bb AS (
          SELECT doc_id AS bench_id, band, band_key FROM bands
          WHERE doc_id % {BENCH_MOD} = {BENCH_REM}
        ),
        cand AS (
          SELECT DISTINCT c.doc_id, b.bench_id
          FROM cb c JOIN bb b USING (band, band_key)
        ),
        ag AS (
          SELECT c.doc_id, c.bench_id,
                 SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
                   / CAST(16 AS DOUBLE) AS est
          FROM cand c
          JOIN mh ma ON ma.doc_id = c.doc_id
          JOIN mh mb ON mb.doc_id = c.bench_id AND mb.j = ma.j
          GROUP BY 1, 2
        ),
        hits AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_hits,
                 MAX(est) AS max_jaccard_est
          FROM ag GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n_bench_hits, 0) AS BIGINT) AS n_bench_hits,
               COALESCE(h.max_jaccard_est, CAST(0 AS DOUBLE))
                 AS max_jaccard_est,
               COALESCE(h.max_jaccard_est, CAST(0 AS DOUBLE)) >= {FUZZY_TAU}e0
                 AS contaminated
        FROM corpus d LEFT JOIN hits h USING (doc_id)
        """

    sql["doc_dedup_funnel"] = f"""
        WITH tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        ),
        ex AS (
          SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n
          FROM documents
        ),
        near AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n
          FROM ({sql["doc_cluster_dedup"]})
        ),
        sem AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n
          FROM ({sql["emb_semdedup"]})
        ),
        u AS (
          SELECT '0_total' AS stage, n FROM tot
          UNION ALL SELECT '1_exact', n FROM ex
          UNION ALL SELECT '2_near_dup', n FROM near
          UNION ALL SELECT '3_semantic', n FROM sem
        )
        SELECT stage, n AS docs_remaining,
               CAST(n AS DOUBLE) / (SELECT n FROM tot) AS share
        FROM u
        """


    # --- round-8 TS additions: matrix profile / VR / KPSS / Poincaré /
    # DFA on the shared LOCF day grid (exact-integer cores, 9-dp
    # quantized float finishes per the transcendental fence) ----------
    _g8 = f"""b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS yq
          FROM f WHERE is_grid = 1
        )"""

    sql["ts_matrix_profile"] = with_views(
        f"""
        WITH {_g8},
        rk AS (
          SELECT channel, yq,
                 ROW_NUMBER() OVER (PARTITION BY channel ORDER BY ts)
                   - 1 AS rn
          FROM vals
        ),
        wx AS (
          SELECT channel, rn // 7 AS win, rn % 7 AS pos, yq FROM rk
        ),
        nw AS (
          SELECT channel, win FROM wx
          GROUP BY channel, win HAVING COUNT(*) = 7
        ),
        fullw AS (
          SELECT w.channel, w.win, w.pos, w.yq
          FROM wx w JOIN nw ON w.channel = nw.channel AND w.win = nw.win
        ),
        d AS (
          SELECT a.channel, a.win AS wi, bb.win AS wj,
                 CAST(SUM((a.yq - bb.yq) * (a.yq - bb.yq)) AS BIGINT) AS d2
          FROM fullw a JOIN fullw bb
            ON a.channel = bb.channel AND a.pos = bb.pos
           AND a.win != bb.win
          GROUP BY a.channel, a.win, bb.win
        )
        SELECT channel, CAST(wi AS BIGINT) AS win,
               CAST(wj AS BIGINT) AS nn_win, d2 AS nn_dist2
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY channel, wi
                     ORDER BY d2, wj) AS r
          FROM d
        ) WHERE r = 1
        """,
        "samples",
        "channels",
    )

    def _vr_var(k):
        return (
            f"(CAST(ss{k} AS DOUBLE) / n{k} "
            f"- (CAST(s{k} AS DOUBLE) / n{k}) * (CAST(s{k} AS DOUBLE) / n{k}))"
        )

    _vr_aggs = []
    for _k in (1, 2, 4, 8):
        _vr_aggs.append(
            f"CAST(COUNT(_l{_k}) AS BIGINT) AS n{_k}, "
            f"CAST(SUM(xq - _l{_k}) AS BIGINT) AS s{_k}, "
            f"CAST(SUM((xq - _l{_k}) * (xq - _l{_k})) AS BIGINT) AS ss{_k}"
        )
    _vr_cols = ", ".join(
        f"CASE WHEN n1 > 0 AND n{_k} > 0 AND {_vr_var(1)} > 0e0 "
        f"THEN round({_vr_var(_k)} / ({_k} * {_vr_var(1)}), 9) "
        f"ELSE 0e0 END AS vr{_k}"
        for _k in (2, 4, 8)
    )
    sql["ts_variance_ratio"] = with_views(
        f"""
        WITH {_g8},
        lagd AS (
          SELECT channel, yq AS xq,
                 LAG(yq, 1) OVER w AS _l1, LAG(yq, 2) OVER w AS _l2,
                 LAG(yq, 4) OVER w AS _l4, LAG(yq, 8) OVER w AS _l8
          FROM vals
          WINDOW w AS (PARTITION BY channel ORDER BY ts)
        ),
        g AS (
          SELECT channel, {", ".join(_vr_aggs)}
          FROM lagd GROUP BY channel
        )
        SELECT channel, n1 AS n, {_vr_cols}
        FROM g
        """,
        "samples",
        "channels",
    )

    _kpss_stat = (
        "round(CAST(_ss2 AS DOUBLE) / (n * CAST(_ee2 AS DOUBLE)), 9)"
    )
    sql["ts_kpss"] = with_views(
        f"""
        WITH {_g8},
        tot AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yq) AS BIGINT) AS sy
          FROM vals GROUP BY channel
        ),
        e AS (
          SELECT v.channel, v.ts, t.n, t.n * v.yq - t.sy AS _e
          FROM vals v JOIN tot t ON v.channel = t.channel
        ),
        s AS (
          SELECT channel, n, _e,
                 CAST(SUM(_e) OVER (PARTITION BY channel ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS _s
          FROM e
        ),
        g AS (
          SELECT channel, CAST(MAX(n) AS BIGINT) AS n,
                 SUM(CAST(_s AS HUGEINT) * _s) AS _ss2,
                 SUM(CAST(_e AS HUGEINT) * _e) AS _ee2
          FROM s GROUP BY channel
        )
        SELECT channel, n,
               CASE WHEN _ee2 > 0 THEN {_kpss_stat} ELSE 0e0 END
                 AS kpss_stat,
               CASE WHEN _ee2 > 0 THEN {_kpss_stat} ELSE 0e0 END <= 0.463
                 AS stationary
        FROM g
        """,
        "samples",
        "channels",
    )

    _po_vd = (
        "(CAST(sdd AS DOUBLE) / n_pairs "
        "- (CAST(sd_ AS DOUBLE) / n_pairs) * (CAST(sd_ AS DOUBLE) / n_pairs))"
    )
    _po_vp = (
        "(CAST(spp AS DOUBLE) / n_pairs "
        "- (CAST(sp_ AS DOUBLE) / n_pairs) * (CAST(sp_ AS DOUBLE) / n_pairs))"
    )
    sql["ts_poincare"] = with_views(
        f"""
        WITH {_g8},
        lagd AS (
          SELECT channel, yq AS xq,
                 LAG(yq) OVER (PARTITION BY channel ORDER BY ts) AS _p
          FROM vals
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(xq - _p) AS BIGINT) AS sd_,
                 SUM(CAST(xq - _p AS HUGEINT) * (xq - _p)) AS sdd,
                 CAST(SUM(xq + _p) AS BIGINT) AS sp_,
                 SUM(CAST(xq + _p AS HUGEINT) * (xq + _p)) AS spp
          FROM lagd WHERE _p IS NOT NULL GROUP BY channel
        )
        SELECT channel, n_pairs,
               CASE WHEN {_po_vd} > 0e0 THEN
                 round(sqrt({_po_vd} / 2e0) / 100.0, 9) ELSE 0e0 END AS sd1,
               CASE WHEN {_po_vp} > 0e0 THEN
                 round(sqrt({_po_vp} / 2e0) / 100.0, 9) ELSE 0e0 END AS sd2,
               CASE WHEN {_po_vd} > 0e0 AND {_po_vp} > 0e0 THEN
                 round(sqrt({_po_vd}) / sqrt({_po_vp}), 9) ELSE 0e0 END
                 AS sd_ratio
        FROM g
        """,
        "samples",
        "channels",
    )

    from pennsieve_streaming_spark.operators.stats import (
        _dfa_slope_coeffs as _dfac,
    )

    _dfa_sizes = (4, 8, 16)
    _dfa_cs = _dfac(_dfa_sizes)
    _dfa_sse_arms = []
    for _s in _dfa_sizes:
        _sxbar = (_s + 1) / 2.0
        _sxx_c = _s * (_s * _s - 1) / 12.0
        _dfa_sse_arms.append(
            f"WHEN s = {_s} THEN greatest(0e0, CAST(syy AS DOUBLE) "
            f"- CAST(sy_ AS DOUBLE) * sy_ / {float(_s)!r} "
            f"- (CAST(sxy AS DOUBLE) - {_sxbar!r} * sy_) "
            f"* (CAST(sxy AS DOUBLE) - {_sxbar!r} * sy_) / {_sxx_c!r})"
        )
    _dfa_sse = f"CASE {' '.join(_dfa_sse_arms)} END"
    _dfa_f = {
        _s: (
            f"(sqrt(CAST(_S{_s} AS DOUBLE) / (_nb{_s} * {float(_s)!r})) "
            f"/ (CAST(n AS DOUBLE) * {float(CORR_QUANT)!r}))"
        )
        for _s in _dfa_sizes
    }
    _dfa_alpha = " + ".join(
        f"{_dfa_cs[_i]!r} * ln({_dfa_f[_s]})"
        for _i, _s in enumerate(_dfa_sizes)
    )
    _dfa_pos = " AND ".join(f"_S{_s} > 0" for _s in _dfa_sizes)
    _dfa_piv = ", ".join(
        f"MAX(CASE WHEN s = {_s} THEN ssum END) AS _S{_s}, "
        f"MAX(CASE WHEN s = {_s} THEN nb END) AS _nb{_s}"
        for _s in _dfa_sizes
    )
    sql["ts_dfa"] = with_views(
        f"""
        WITH {_g8},
        tot AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yq) AS BIGINT) AS sy
          FROM vals GROUP BY channel
        ),
        prof AS (
          SELECT v.channel, t.n,
                 CAST(SUM(t.n * v.yq - t.sy) OVER (PARTITION BY v.channel
                   ORDER BY v.ts ROWS BETWEEN UNBOUNDED PRECEDING AND
                   CURRENT ROW) AS BIGINT) AS _p,
                 ROW_NUMBER() OVER (PARTITION BY v.channel
                   ORDER BY v.ts) - 1 AS _i
          FROM vals v JOIN tot t ON v.channel = t.channel
        ),
        ex AS (
          SELECT channel, n, _p, sz.s, _i // sz.s AS box,
                 _i % sz.s + 1 AS k
          FROM prof CROSS JOIN (SELECT UNNEST([4, 8, 16]) AS s) sz
        ),
        boxes AS (
          SELECT channel, n, s, box, COUNT(*) AS _nb,
                 CAST(SUM(_p) AS BIGINT) AS sy_,
                 CAST(SUM(k * _p) AS BIGINT) AS sxy,
                 SUM(CAST(_p AS HUGEINT) * _p) AS syy
          FROM ex GROUP BY channel, n, s, box
        ),
        per_s AS (
          SELECT channel, n, s, CAST(COUNT(*) AS BIGINT) AS nb,
                 SUM(CAST(round({_dfa_sse}) AS HUGEINT)) AS ssum
          FROM boxes WHERE _nb = s GROUP BY channel, n, s
        ),
        piv AS (
          SELECT channel, n, {_dfa_piv}
          FROM per_s GROUP BY channel, n
        )
        SELECT channel, n,
               {", ".join(f"round({_dfa_f[_s]}, 9) AS f{_s}" for _s in _dfa_sizes)},
               CASE WHEN {_dfa_pos} THEN round({_dfa_alpha}, 9)
                    ELSE 0e0 END AS alpha
        FROM piv
        """,
        "samples",
        "channels",
    )


    # --- round-8 EV additions ---------------------------------------
    sql["ev_lorenz_deciles"] = """
        WITH per AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY user_id
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                 CAST(SUM(cnt) AS BIGINT) AS ne
          FROM per
        ),
        r AS (
          SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS _r
          FROM per
        ),
        dec AS (
          SELECT CAST(((_r - 1) * 10) // nu + 1 AS BIGINT) AS decile,
                 cnt, ne
          FROM r CROSS JOIN tot
        ),
        g AS (
          SELECT decile, CAST(MAX(ne) AS BIGINT) AS ne,
                 CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(cnt) AS BIGINT) AS n_events
          FROM dec GROUP BY decile
        )
        SELECT decile, n_users, n_events,
               round(CAST(n_events AS DOUBLE) / ne, 9) AS event_share,
               round(CAST(SUM(n_events) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / ne, 9) AS cum_share
        FROM g
        """

    _bst_var = (
        "(CAST(sgg AS DOUBLE) / n_gaps "
        "- (CAST(sg AS DOUBLE) / n_gaps) * (CAST(sg AS DOUBLE) / n_gaps))"
    )
    _bst_mu = "(CAST(sg AS DOUBLE) / n_gaps)"
    sql["ev_burstiness"] = f"""
        WITH ue AS (
          SELECT CAST(epoch_us(ts) AS BIGINT) AS ts, event_id, user_id,
                 event_type
          FROM events
        ),
        gaps AS (
          SELECT event_type,
                 (ts - LAG(ts) OVER (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) // 1000000 AS gs
          FROM ue
        ),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(gs) AS BIGINT) AS sg,
                 SUM(CAST(gs AS HUGEINT) * gs) AS sgg
          FROM gaps WHERE gs IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n_gaps,
               round({_bst_mu}, 9) AS mean_gap_s,
               CASE WHEN {_bst_var} > 0e0
                     AND sqrt({_bst_var}) + {_bst_mu} > 0e0
                    THEN round((sqrt({_bst_var}) - {_bst_mu})
                      / (sqrt({_bst_var}) + {_bst_mu}), 9)
                    ELSE 0e0 END AS burstiness
        FROM g
        """

    _LNQ9 = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000000) AS BIGINT)"
    _pmi_q = (
        f"({_LNQ9.format(x='n_both')} + {_LNQ9.format(x='nu')} "
        f"- {_LNQ9.format(x='n_a')} - {_LNQ9.format(x='n_b')})"
    )
    sql["ev_type_pmi"] = f"""
        WITH ut AS (
          SELECT DISTINCT user_id, event_type FROM events
        ),
        nt AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
          FROM ut GROUP BY event_type
        ),
        nu_t AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM ut
        ),
        co AS (
          SELECT a.event_type AS type_a, bb.event_type AS type_b,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM ut a JOIN ut bb
            ON a.user_id = bb.user_id AND a.event_type < bb.event_type
          GROUP BY a.event_type, bb.event_type
        )
        SELECT type_a, type_b, na.n_t AS n_a, nb.n_t AS n_b, n_both,
               CAST({_pmi_q} AS DOUBLE) / 1000000000 AS pmi
        FROM co
        JOIN nt na ON na.event_type = type_a
        JOIN nt nb ON nb.event_type = type_b
        CROSS JOIN nu_t
        """

    _DAY_US8 = 86_400 * US
    _dow_chi2 = (
        "((49e0 * CAST(_oo AS DOUBLE) - 7e0 * CAST(n_events AS DOUBLE) "
        "* n_events) / (7e0 * n_events))"
    )
    sql["ev_dow_chi2"] = f"""
        WITH d AS (
          SELECT event_type,
                 CAST(((CAST(epoch_us(ts) AS BIGINT) // {_DAY_US8}) + 4) % 7
                   AS BIGINT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS o
          FROM events GROUP BY event_type,
            ((CAST(epoch_us(ts) AS BIGINT) // {_DAY_US8}) + 4) % 7
        ),
        dense AS (
          SELECT t.event_type, g.dow, CAST(COALESCE(d.o, 0) AS BIGINT) AS o
          FROM (SELECT DISTINCT event_type FROM d) t
          CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS dow) g
          LEFT JOIN d ON d.event_type = t.event_type AND d.dow = g.dow
        ),
        agg AS (
          SELECT event_type, CAST(SUM(o) AS BIGINT) AS n_events,
                 SUM(CAST(o AS HUGEINT) * o) AS _oo
          FROM dense GROUP BY event_type
        )
        SELECT event_type, n_events,
               CASE WHEN n_events > 0 THEN round({_dow_chi2}, 9)
                    ELSE 0e0 END AS chi2,
               CASE WHEN n_events > 0 THEN round({_dow_chi2}, 9)
                    ELSE 0e0 END <= 12.592 AS uniform
        FROM agg
        """

    sql["ev_cohort_ltv"] = f"""
        WITH uw AS (
          SELECT user_id,
                 (CAST(epoch_us(ts) AS BIGINT) // {WEEK_US}) * {WEEK_US}
                   AS week
          FROM events
        ),
        firstw AS (
          SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM firstw GROUP BY cohort_week
        ),
        aged AS (
          SELECT f.cohort_week,
                 (u.week - f.cohort_week) // {WEEK_US} AS age_week,
                 CAST(COUNT(*) AS BIGINT) AS n_ev
          FROM uw u JOIN firstw f ON u.user_id = f.user_id
          WHERE (u.week - f.cohort_week) // {WEEK_US} <= 8
          GROUP BY f.cohort_week, (u.week - f.cohort_week) // {WEEK_US}
        ),
        dense AS (
          SELECT s.cohort_week, CAST(g.age_week AS BIGINT) AS age_week,
                 s.cohort_size, CAST(COALESCE(a.n_ev, 0) AS BIGINT) AS n_ev
          FROM sizes s
          CROSS JOIN (SELECT UNNEST(generate_series(0, 8)) AS age_week) g
          LEFT JOIN aged a ON a.cohort_week = s.cohort_week
            AND a.age_week = g.age_week
        )
        SELECT cohort_week, age_week, cohort_size,
               CAST(SUM(n_ev) OVER (PARTITION BY cohort_week
                 ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW) AS BIGINT) AS cum_events,
               round(CAST(SUM(n_ev) OVER (PARTITION BY cohort_week
                 ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING AND
                 CURRENT ROW) AS DOUBLE) / cohort_size, 9) AS ltv
        FROM dense
        """


    # --- round-8 DOC additions ---------------------------------------
    _LNQ8 = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000000000) AS BIGINT)"
    sql["doc_char_trigram_lm"] = f"""
        WITH tri AS (
          SELECT doc_id, UNNEST(
            CASE WHEN length(text) < 3 THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(generate_series(1, length(text) - 2),
                      i -> substring(text, i, 3)) END
          ) AS tri
          FROM documents
        ),
        trib AS (SELECT doc_id, tri, substring(tri, 1, 2) AS bi FROM tri),
        c3 AS (
          SELECT tri, CAST(COUNT(*) AS BIGINT) AS c3
          FROM trib GROUP BY tri
        ),
        c2 AS (
          SELECT bi, CAST(COUNT(*) AS BIGINT) AS c2
          FROM trib GROUP BY bi
        ),
        vt AS (
          SELECT CAST(COUNT(DISTINCT ch) AS BIGINT) AS v FROM (
            SELECT UNNEST(list_transform(generate_series(1, length(text)),
                   i -> substring(text, i, 1))) AS ch
            FROM documents
          )
        ),
        scored AS (
          SELECT t.doc_id,
                 CAST({_LNQ8.format(x="c3.c3 + 1")}
                   - {_LNQ8.format(x="c2.c2 + vt.v")} AS HUGEINT) AS _lpq
          FROM trib t
          JOIN c3 ON c3.tri = t.tri
          JOIN c2 ON c2.bi = t.bi
          CROSS JOIN vt
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
               CAST(SUM(_lpq) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * 1000000000) AS avg_logp
        FROM scored GROUP BY doc_id
        """

    _stop8 = ", ".join(f"'{w}'" for w in [
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
        "for", "on", "with", "as", "at", "by", "that", "this",
    ])
    sql["doc_stopword_profile"] = f"""
        WITH per AS (
          SELECT source,
                 CASE WHEN length(trim(text)) = 0 THEN 0e0
                      ELSE CAST(len(list_filter({TOKS},
                             t -> list_contains([{_stop8}], lower(t))))
                             AS DOUBLE) / len({TOKS})
                 END AS _ratio
          FROM documents
        )
        SELECT source,
               least(CAST(9 AS BIGINT),
                     CAST(floor(_ratio * 10) AS BIGINT)) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM per GROUP BY source, least(CAST(9 AS BIGINT),
                     CAST(floor(_ratio * 10) AS BIGINT))
        """

    _lq_joins = []
    for _pn, _pv in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        _h = f"(CAST(n_docs - 1 AS DOUBLE) * {_pv!r})"
        _lq_joins.append(
            f"round(lo_{_pn}.x + ({_h} - floor({_h})) "
            f"* (hi_{_pn}.x - lo_{_pn}.x), 9) AS {_pn}"
        )
    _lq_onlo = {
        _pn: f"lo_{_pn}.source = n.source AND lo_{_pn}._r = "
             f"CAST(floor(CAST(n_docs - 1 AS DOUBLE) * {_pv!r}) AS BIGINT) + 1"
        for _pn, _pv in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    }
    _lq_onhi = {
        _pn: f"hi_{_pn}.source = n.source AND hi_{_pn}._r = "
             f"CAST(ceil(CAST(n_docs - 1 AS DOUBLE) * {_pv!r}) AS BIGINT) + 1"
        for _pn, _pv in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    }
    sql["doc_length_quantiles"] = f"""
        WITH ranked AS (
          SELECT source, CAST(n_chars AS BIGINT) AS x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS _r
          FROM documents
        ),
        n AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM ranked GROUP BY source
        )
        SELECT n.source, n.n_docs, {", ".join(_lq_joins)}
        FROM n
        JOIN ranked lo_p50 ON {_lq_onlo["p50"]}
        JOIN ranked hi_p50 ON {_lq_onhi["p50"]}
        JOIN ranked lo_p90 ON {_lq_onlo["p90"]}
        JOIN ranked hi_p90 ON {_lq_onhi["p90"]}
        JOIN ranked lo_p99 ON {_lq_onlo["p99"]}
        JOIN ranked hi_p99 ON {_lq_onhi["p99"]}
        """

    sql["doc_ngram_entropy"] = f"""
        WITH dt AS (
          SELECT source, {TOKS} AS toks FROM documents
        ),
        bi AS (
          SELECT source, toks[i] AS x, toks[i + 1] AS y
          FROM (
            SELECT source, toks, UNNEST(
              CASE WHEN len(toks) < 2 THEN CAST([] AS BIGINT[])
                   ELSE generate_series(1, len(toks) - 1) END
            ) AS i
            FROM dt
          )
        ),
        cxy AS (
          SELECT source, x, y, CAST(COUNT(*) AS BIGINT) AS c_xy
          FROM bi GROUP BY source, x, y
        ),
        cx AS (
          SELECT source, x, CAST(SUM(c_xy) AS BIGINT) AS c_x
          FROM cxy GROUP BY source, x
        )
        SELECT c.source, CAST(SUM(c_xy) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(c_xy AS HUGEINT)
                 * ({_LNQ8.format(x="c_x")} - {_LNQ8.format(x="c_xy")}))
                 AS DOUBLE)
                 / (CAST(SUM(c_xy) AS DOUBLE) * 1000000000)
                 AS entropy_nats
        FROM cxy c JOIN cx ON cx.source = c.source AND cx.x = c.x
        GROUP BY c.source
        """

    sql["doc_minhash_calibration"] = f"""
        WITH {MINHASH_PRE}, {BANDS}, {CAND_CAPPED},
        {JACCARD_TAIL},
        ag AS (
          SELECT c.doc_a, c.doc_b,
                 SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE) AS est
          FROM cand c
          JOIN mh ma ON ma.doc_id = c.doc_a
          JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j
          GROUP BY c.doc_a, c.doc_b
        ),
        tj AS (
          SELECT c.doc_a, c.doc_b,
                 COALESCE(i.inter
                   / CAST(sa.n + sb.n - i.inter AS DOUBLE), 0e0) AS tru
          FROM cand c
          LEFT JOIN ints i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
          LEFT JOIN sizes sa ON c.doc_a = sa.doc_id
          LEFT JOIN sizes sb ON c.doc_b = sb.doc_id
        )
        SELECT least(CAST(9 AS BIGINT),
                 CAST(floor(abs(ag.est - tj.tru) * 10) AS BIGINT))
                 AS err_decile,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM ag JOIN tj ON ag.doc_a = tj.doc_a AND ag.doc_b = tj.doc_b
        GROUP BY least(CAST(9 AS BIGINT),
                 CAST(floor(abs(ag.est - tj.tru) * 10) AS BIGINT))
        """


    # --- round-8 EMB additions ---------------------------------------
    from pennsieve_streaming_spark.llm.similarity import (
        _jl_signs as _jls,
    )

    _jl_rows = ", ".join(
        f"({i + 1}, {j + 1}, {s})"
        for i, row in enumerate(_jls(16, ANN_DIM))
        for j, s in enumerate(row)
    )
    sql["emb_jl_distortion"] = f"""
        WITH emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < 20
        ),
        comp AS (
          SELECT vec_id, j,
                 CAST(round(v[j] * 1000000) AS BIGINT) AS xq
          FROM emb CROSS JOIN
            (SELECT UNNEST(generate_series(1, {ANN_DIM})) AS j)
        ),
        sgn AS (SELECT * FROM (VALUES {_jl_rows}) t(i, j, s)),
        proj AS (
          SELECT c.vec_id, g.i, CAST(SUM(g.s * c.xq) AS BIGINT) AS p
          FROM comp c JOIN sgn g ON g.j = c.j
          GROUP BY c.vec_id, g.i
        ),
        dp AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d2p
          FROM proj a JOIN proj b
            ON a.i = b.i AND a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id
        ),
        do_ AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(SUM((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT) AS d2o
          FROM comp a JOIN comp b
            ON a.j = b.j AND a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id
        )
        SELECT dp.vec_a, dp.vec_b, d2o AS d2_orig,
               CASE WHEN d2o > 0 THEN
                 round((CAST(d2p AS DOUBLE) / 16) / d2o, 9)
               ELSE 0e0 END AS ratio
        FROM dp JOIN do_ ON dp.vec_a = do_.vec_a AND dp.vec_b = do_.vec_b
        """

    _pqb_cb, _pqb_dists, _ = _pq_fragments()
    sql["emb_pq_balance"] = f"""
        WITH cbt AS (SELECT {_pqb_cb} AS cb),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        dl AS (
          SELECT vec_id, ss.s, {_pqb_dists} AS dls
          FROM emb CROSS JOIN cbt
          CROSS JOIN (SELECT UNNEST(generate_series(0, {PQ_M - 1})) AS s)
            ss
        ),
        a AS (
          SELECT vec_id, s,
                 CAST(list_position(dls, list_min(dls)) - 1 AS BIGINT)
                   AS c
          FROM dl
        ),
        cnt AS (
          SELECT s, c, CAST(COUNT(*) AS BIGINT) AS cnum
          FROM a GROUP BY s, c
        ),
        tot AS (
          SELECT s, CAST(SUM(cnum) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS used,
                 CAST(MAX(cnum) AS BIGINT) AS mx
          FROM cnt GROUP BY s
        )
        SELECT CAST(c.s AS BIGINT) AS subspace, MAX(t.n) AS n_vectors,
               MAX(t.used) AS n_codes_used,
               CAST(SUM(CAST(cnum AS HUGEINT)
                 * ({_LNQ8.format(x="t.n")} - {_LNQ8.format(x="cnum")}))
                 AS DOUBLE) / (CAST(MAX(t.n) AS DOUBLE) * 1000000000)
                 AS entropy_nats,
               CAST(MAX(t.mx) AS DOUBLE) / MAX(t.n) AS max_share
        FROM cnt c JOIN tot t ON t.s = c.s
        GROUP BY c.s
        """


    # --- round-8 MM additions ----------------------------------------
    from pennsieve_streaming_spark.llm.imagehash import (
        COLORFULNESS_EXPR as _CF_EXPR,
        SYN_B_OFF as _CF_BOFF,
        SYN_G_OFF as _CF_GOFF,
    )

    sql["mm_image_colorfulness"] = f"""
        WITH px AS (
          SELECT doc_id, {_ihg.format(i='i', j='j')} AS r,
                 ({_ihg.format(i='i', j='j')} + {_CF_GOFF}) % {_IH_M} AS g,
                 ({_ihg.format(i='i', j='j')} + {_CF_BOFF}) % {_IH_M} AS b
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        opp AS (
          SELECT doc_id, r - g AS rg, r + g - 2 * b AS yb2 FROM px
        ),
        g AS (
          SELECT doc_id AS media_id, CAST(COUNT(*) AS BIGINT) AS n_px,
                 CAST(SUM(rg) AS BIGINT) AS s_rg,
                 CAST(SUM(rg * rg) AS BIGINT) AS s_rg2,
                 CAST(SUM(yb2) AS BIGINT) AS s_yb,
                 CAST(SUM(yb2 * yb2) AS BIGINT) AS s_yb2q
          FROM opp GROUP BY doc_id
        )
        SELECT media_id, n_px, {_CF_EXPR} AS colorfulness
        FROM g
        """

    sql["mm_image_blockiness"] = f"""
        WITH d AS (
          SELECT doc_id,
                 abs(({_ihg.format(i='i', j='(j + 1)')})
                   - ({_ihg.format(i='i', j='j')})) AS ad,
                 (j + 1) % 8 = 0 AS is_b
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 2})) AS tj(j)
        ),
        g AS (
          SELECT doc_id AS media_id,
                 CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN is_b THEN ad ELSE 0 END) AS BIGINT)
                   AS s_b,
                 CAST(SUM(CASE WHEN is_b THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_nb,
                 CAST(SUM(CASE WHEN is_b THEN 0 ELSE ad END) AS BIGINT)
                   AS s_nb
          FROM d GROUP BY doc_id
        )
        SELECT media_id, n_b AS n_boundary, n_nb AS n_interior,
               CASE WHEN s_nb > 0 THEN
                 round((CAST(s_b AS DOUBLE) / n_b)
                   / (CAST(s_nb AS DOUBLE) / n_nb), 9)
               ELSE 0e0 END AS blockiness
        FROM g
        """

    sql["mm_audio_zcr"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        rk AS (
          SELECT channel,
                 CAST(ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY ts, value) - 1 AS BIGINT) AS rn,
                 CAST(round(value * 1) AS BIGINT) AS xq
          FROM samples_aligned WHERE channel = 'lead'
        ),
        wx AS (
          SELECT channel, rn // 64 AS win, rn % 64 AS pos, xq FROM rk
        ),
        per AS (
          SELECT channel, win, COUNT(*) AS _n,
                 CAST(SUM(xq) AS BIGINT) AS _s
          FROM wx GROUP BY channel, win
        ),
        d AS (
          SELECT w.channel, w.win, w.pos, 64 * w.xq - p._s AS _d
          FROM wx w JOIN per p ON w.channel = p.channel AND w.win = p.win
          WHERE p._n = 64
        ),
        lagd AS (
          SELECT channel, win, _d,
                 LAG(_d) OVER (PARTITION BY channel, win ORDER BY pos)
                   AS _dp
          FROM d
        )
        SELECT channel, CAST(win AS BIGINT) AS win,
               CAST(64 AS BIGINT) AS n,
               CAST(SUM(CASE WHEN _d * _dp < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_crossings,
               round(CAST(SUM(CASE WHEN _d * _dp < 0 THEN 1 ELSE 0 END)
                 AS DOUBLE) / 63, 9) AS zcr
        FROM lagd WHERE _dp IS NOT NULL
        GROUP BY channel, win
        """


    # stream==batch: the drained gap table equals the batch lag under
    # in-order arrival, and the finish aggregation is shared verbatim.
    sql["stream_burstiness"] = sql["ev_burstiness"]


    # --- round-8 wave-2 additions -------------------------------------
    sql["ts_binseg_changepoints"] = with_views(
        f"""
        WITH {_g8},
        cum AS (
          SELECT channel, ts,
                 CAST(ROW_NUMBER() OVER w AS BIGINT) AS i,
                 CAST(SUM(yq) OVER (PARTITION BY channel ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS s_i,
                 CAST(COUNT(*) OVER (PARTITION BY channel) AS BIGINT) AS n,
                 CAST(SUM(yq) OVER (PARTITION BY channel) AS BIGINT) AS s_n
          FROM vals
          WINDOW w AS (PARTITION BY channel ORDER BY ts)
        ),
        p0 AS (
          SELECT * FROM (
            SELECT channel, ts, i, n, s_i, s_n,
                   n * s_i - i * s_n AS dev,
                   ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY abs(n * s_i - i * s_n) DESC, i) AS rk
            FROM cum WHERE i >= 1 AND i < n
          ) WHERE rk = 1
        ),
        sk AS (
          SELECT c.channel, p0.i AS k0, c.s_i AS sk0
          FROM cum c JOIN p0 ON c.channel = p0.channel AND c.i = p0.i
        ),
        lvl0 AS (
          SELECT channel, CAST(0 AS BIGINT) AS level,
                 CAST(1 AS BIGINT) AS seg_start, n AS seg_end,
                 i AS split_i, ts, dev AS dev_scaled,
                 round((CAST(s_n - s_i AS DOUBLE) / CAST(n - i AS DOUBLE)
                   - CAST(s_i - CAST(0 AS BIGINT) AS DOUBLE)
                   / CAST(i - 1 + 1 AS DOUBLE)) / 100, 9) AS shift
          FROM p0
        ),
        seg AS (
          SELECT c.channel, c.ts, c.i, c.n, c.s_i, c.s_n, s.k0, s.sk0
          FROM cum c JOIN sk s ON c.channel = s.channel
        ),
        lft AS (
          SELECT * FROM (
            SELECT channel, ts, i, k0, sk0,
                   k0 * s_i - i * sk0 AS dev,
                   round((CAST(sk0 - s_i AS DOUBLE)
                     / CAST(k0 - i AS DOUBLE)
                     - CAST(s_i - CAST(0 AS BIGINT) AS DOUBLE)
                     / CAST(i - 1 + 1 AS DOUBLE)) / 100, 9) AS shift,
                   ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY abs(k0 * s_i - i * sk0) DESC, i) AS rk
            FROM seg WHERE k0 >= 4 AND i >= 1 AND i < k0
          ) WHERE rk = 1
        ),
        rgt AS (
          SELECT * FROM (
            SELECT channel, ts, i, n, s_n, k0, sk0,
                   (n - (k0 + 1) + 1) * (s_i - sk0)
                     - (i - (k0 + 1) + 1) * (s_n - sk0) AS dev,
                   round((CAST(s_n - s_i AS DOUBLE)
                     / CAST(n - i AS DOUBLE)
                     - CAST(s_i - sk0 AS DOUBLE)
                     / CAST(i - (k0 + 1) + 1 AS DOUBLE)) / 100, 9)
                     AS shift,
                   ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY abs((n - (k0 + 1) + 1) * (s_i - sk0)
                       - (i - (k0 + 1) + 1) * (s_n - sk0)) DESC, i) AS rk
            FROM seg WHERE n - k0 >= 4 AND i >= k0 + 1 AND i < n
          ) WHERE rk = 1
        )
        SELECT channel, level, seg_start, seg_end, split_i, ts,
               dev_scaled, shift FROM lvl0
        UNION ALL
        SELECT channel, CAST(1 AS BIGINT), CAST(1 AS BIGINT), k0, i, ts,
               dev, shift FROM lft
        UNION ALL
        SELECT channel, CAST(1 AS BIGINT), k0 + 1,
               (SELECT MAX(n) FROM cum c2 WHERE c2.channel = rgt.channel),
               i, ts, dev, shift FROM rgt
        """,
        "samples",
        "channels",
    )

    _p8_a22 = "((r2 - r1 * r1) / nullif(1e0 - r1 * r1, 0e0))"
    _p8_a21 = f"(r1 - {_p8_a22} * r1)"
    _p8_den3 = f"(1e0 - {_p8_a21} * r1 - {_p8_a22} * r2)"
    _p8_a33 = (
        f"((r3 - {_p8_a21} * r2 - {_p8_a22} * r1) "
        f"/ nullif({_p8_den3}, 0e0))"
    )
    sql["ts_pacf"] = with_views(
        f"""
        {_acf_core((GRID_INTERVAL_US, 2 * GRID_INTERVAL_US,
                    3 * GRID_INTERVAL_US))},
        piv AS (
          SELECT channel,
                 MAX(CASE WHEN lag_us = {GRID_INTERVAL_US} THEN r END)
                   AS r1,
                 MAX(CASE WHEN lag_us = {2 * GRID_INTERVAL_US} THEN r END)
                   AS r2,
                 MAX(CASE WHEN lag_us = {3 * GRID_INTERVAL_US} THEN r END)
                   AS r3
          FROM acf GROUP BY channel
        )
        SELECT channel, round(r1, 9) AS pacf1,
               CASE WHEN 1e0 - r1 * r1 != 0e0 THEN round({_p8_a22}, 9)
                    ELSE 0e0 END AS pacf2,
               CASE WHEN 1e0 - r1 * r1 != 0e0 AND {_p8_den3} != 0e0
                    THEN round({_p8_a33}, 9) ELSE 0e0 END AS pacf3
        FROM piv
        """,
        "samples",
        "channels",
    )

    sql["ev_growth_accounting"] = f"""
        WITH uw AS (
          SELECT DISTINCT user_id,
                 (CAST(epoch_us(ts) AS BIGINT) // {WEEK_US}) * {WEEK_US}
                   AS week
          FROM events
        ),
        firstw AS (
          SELECT user_id, MIN(week) AS _first FROM uw GROUP BY user_id
        ),
        nowt AS (SELECT user_id, week, 1 AS _now FROM uw),
        prevt AS (
          SELECT user_id, week + {WEEK_US} AS week, 1 AS _prev FROM uw
        ),
        st AS (
          SELECT COALESCE(n.user_id, p.user_id) AS user_id,
                 COALESCE(n.week, p.week) AS week,
                 COALESCE(n._now, 0) AS a, COALESCE(p._prev, 0) AS p
          FROM nowt n FULL OUTER JOIN prevt p
            ON n.user_id = p.user_id AND n.week = p.week
        ),
        stf AS (
          SELECT st.week, st.a, st.p, f._first
          FROM st JOIN firstw f ON st.user_id = f.user_id
        ),
        g AS (
          SELECT CAST(week AS BIGINT) AS week,
                 CAST(SUM(a) AS BIGINT) AS n_active,
                 CAST(SUM(CASE WHEN a = 1 AND week = _first THEN 1
                          ELSE 0 END) AS BIGINT) AS n_new,
                 CAST(SUM(CASE WHEN a = 1 AND p = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_retained,
                 CAST(SUM(CASE WHEN a = 1 AND p = 0 AND week > _first
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
                 CAST(SUM(CASE WHEN a = 0 AND p = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_churned
          FROM stf GROUP BY week
        )
        SELECT week, n_active, n_new, n_retained, n_resurrected,
               n_churned,
               CASE WHEN n_churned > 0 THEN
                 round(CAST(n_new + n_resurrected AS DOUBLE)
                   / n_churned, 9)
               ELSE 0e0 END AS quick_ratio
        FROM g
        """

    sql["doc_dedup_method_agreement"] = f"""
        WITH mh AS (
          SELECT doc_a, doc_b FROM ({sql["doc_minhash_lsh_pairs"]})
          WHERE jaccard >= 0.5
        ),
        sh2 AS (
          SELECT doc_a, doc_b FROM ({sql["doc_simhash_near_pairs"]})
        ),
        u AS (
          SELECT CASE WHEN mh.doc_a IS NOT NULL THEN 1 ELSE 0 END AS a,
                 CASE WHEN sh2.doc_a IS NOT NULL THEN 1 ELSE 0 END AS b
          FROM mh FULL OUTER JOIN sh2
            ON mh.doc_a = sh2.doc_a AND mh.doc_b = sh2.doc_b
        ),
        g AS (
          SELECT CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_both,
                 CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_only_minhash,
                 CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_only_simhash
          FROM u
        )
        SELECT n_both, n_only_minhash, n_only_simhash,
               CASE WHEN n_both + n_only_minhash + n_only_simhash > 0
                    THEN round(CAST(n_both AS DOUBLE)
                      / (n_both + n_only_minhash + n_only_simhash), 9)
                    ELSE 0e0 END AS pair_jaccard
        FROM g
        """

    _am_rows, _am_d2 = _ivf_cent_fragments()
    sql["emb_assign_margin"] = f"""
        WITH cents AS (SELECT * FROM (VALUES {_am_rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        d AS (
          SELECT e.vec_id, t.list_id, {_am_d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        rk AS (
          SELECT vec_id, list_id, d2,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY d2, list_id) AS rk
          FROM d
        ),
        piv AS (
          SELECT vec_id,
                 MAX(CASE WHEN rk = 1 THEN list_id END) AS list_id,
                 MAX(CASE WHEN rk = 1 THEN d2 END) AS d1,
                 MAX(CASE WHEN rk = 2 THEN d2 END) AS dd2
          FROM rk WHERE rk <= 2 GROUP BY vec_id
        ),
        mq AS (
          SELECT list_id,
                 CASE WHEN dd2 > 0e0 THEN
                   CAST(round((dd2 - d1) / dd2 * 1000000000) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS mq
          FROM piv
        )
        SELECT CAST(list_id AS BIGINT) AS list_id,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               round(CAST(SUM(mq) AS DOUBLE)
                 / (COUNT(*) * 1000000000.0), 9) AS mean_margin,
               CAST(MIN(mq) AS DOUBLE) / 1000000000.0 AS min_margin
        FROM mq GROUP BY list_id
        """


    # --- round-8 wave-3 additions -------------------------------------
    sql["ts_crest_factor"] = with_views(
        f"""
        WITH rk AS (
          SELECT channel,
                 CAST(ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY ts, value) - 1 AS BIGINT) AS rn,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        g AS (
          SELECT channel, rn // 64 AS win, COUNT(*) AS _n,
                 CAST(MAX(abs(xq)) AS BIGINT) AS peak_q,
                 CAST(SUM(xq * xq) AS BIGINT) AS _ss
          FROM rk GROUP BY channel, rn // 64
        )
        SELECT channel, CAST(win AS BIGINT) AS win,
               CAST(64 AS BIGINT) AS n, peak_q,
               CASE WHEN _ss > 0 THEN round(CAST(peak_q AS DOUBLE)
                 / sqrt(CAST(_ss AS DOUBLE) / 64), 9) ELSE 0e0 END
                 AS crest
        FROM g WHERE _n = 64
        """,
        "samples",
    )

    _sst_vr = (
        "(CAST(srr AS DOUBLE) / n "
        "- (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n))"
    )
    _sst_vd = (
        "(CAST(sdd AS DOUBLE) / n "
        "- (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n))"
    )
    sql["ts_seasonal_strength"] = f"""
        WITH sd0 AS ({sql["ts_seasonal_decompose"]}),
        base AS (
          SELECT channel,
                 CAST(round(resid * 1000000) AS BIGINT) AS rq,
                 CAST(round((seasonal + resid) * 1000000) AS BIGINT)
                   AS dq
          FROM sd0
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rq) AS BIGINT) AS sr,
                 SUM(CAST(rq AS HUGEINT) * rq) AS srr,
                 CAST(SUM(dq) AS BIGINT) AS sd,
                 SUM(CAST(dq AS HUGEINT) * dq) AS sdd
          FROM base GROUP BY channel
        )
        SELECT channel, n,
               CASE WHEN {_sst_vd} > 0e0 THEN
                 round(greatest(0e0, 1e0 - {_sst_vr} / {_sst_vd}), 9)
               ELSE 0e0 END AS seasonal_strength
        FROM g
        """

    _jsd_ln2q = "CAST(693147181 AS BIGINT)"
    _jsd_num = "(ca * nb + cb * na)"
    sql["doc_source_jsd"] = f"""
        WITH dt AS (SELECT source, {TOKS} AS toks FROM documents),
        st AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, UNNEST(toks) AS t FROM dt)
          GROUP BY source, t
        ),
        ns AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
          FROM st GROUP BY source
        ),
        pr AS (
          SELECT a.source AS source_a, b.source AS source_b, a.t,
                 a.c AS ca, na.n_s AS na, b.c AS cb, nb.n_s AS nb
          FROM st a
          JOIN st b ON a.t = b.t AND a.source < b.source
          JOIN ns na ON na.source = a.source
          JOIN ns nb ON nb.source = b.source
        ),
        shared AS (
          SELECT source_a, source_b,
                 CAST(COUNT(*) AS BIGINT) AS n_terms,
                 CAST(MAX(na) AS BIGINT) AS na,
                 CAST(MAX(nb) AS BIGINT) AS nb,
                 CAST(SUM(ca) AS BIGINT) AS sca,
                 CAST(SUM(cb) AS BIGINT) AS scb,
                 SUM(CAST(ca AS HUGEINT) * ({_jsd_ln2q}
                   + {_LNQ8.format(x="ca * nb")}
                   - {_LNQ8.format(x=_jsd_num)})) AS _kpa,
                 SUM(CAST(cb AS HUGEINT) * ({_jsd_ln2q}
                   + {_LNQ8.format(x="cb * na")}
                   - {_LNQ8.format(x=_jsd_num)})) AS _kpb
          FROM pr GROUP BY source_a, source_b
        )
        SELECT source_a, source_b, n_terms,
               round((CAST(_kpa AS DOUBLE) + (na - sca) * {_jsd_ln2q})
                 / (CAST(na AS DOUBLE) * 2000000000)
                 + (CAST(_kpb AS DOUBLE) + (nb - scb) * {_jsd_ln2q})
                 / (CAST(nb AS DOUBLE) * 2000000000), 9) AS jsd_nats
        FROM shared
        """

    sql["emb_hubness"] = f"""
        WITH tk AS ({sql["emb_cosine_topk"]}),
        per AS (
          SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM tk GROUP BY neighbor_id
        )
        SELECT n_hits, CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM per GROUP BY n_hits
        """

    sql["mm_audio_clipping"] = f"""
        WITH samples_aligned AS
          ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        rk AS (
          SELECT channel,
                 CAST(abs(CAST(round(value * 1) AS BIGINT)) >= 400000
                   AS INT) AS _clip,
                 CAST(ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY ts, value) AS BIGINT) AS _rn
          FROM samples_aligned WHERE channel = 'lead'
        ),
        tot AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(_clip) AS BIGINT) AS n_clipped
          FROM rk GROUP BY channel
        ),
        runs AS (
          SELECT channel, CAST(MAX(_run) AS BIGINT) AS max_run FROM (
            SELECT channel, _grp, CAST(COUNT(*) AS BIGINT) AS _run
            FROM (
              SELECT channel, _rn,
                     _rn - ROW_NUMBER() OVER (PARTITION BY channel
                       ORDER BY _rn) AS _grp
              FROM rk WHERE _clip = 1
            ) GROUP BY channel, _grp
          ) GROUP BY channel
        )
        SELECT t.channel, t.n, t.n_clipped,
               round(CAST(t.n_clipped AS DOUBLE) / t.n, 9) AS clip_frac,
               CAST(COALESCE(r.max_run, 0) AS BIGINT) AS max_run
        FROM tot t LEFT JOIN runs r ON t.channel = r.channel
        """


    # --- round-8 wave-4 additions -------------------------------------
    sql["ts_stationarity_panel"] = f"""
        WITH a8 AS (
          SELECT channel, stationary AS adf_stationary
          FROM ({sql["ts_adf_test"]})
        ),
        k8 AS (
          SELECT channel, stationary AS kpss_stationary
          FROM ({sql["ts_kpss"]})
        )
        SELECT a8.channel, adf_stationary, kpss_stationary,
               CASE WHEN adf_stationary AND kpss_stationary
                    THEN 'stationary'
                    WHEN NOT adf_stationary AND NOT kpss_stationary
                    THEN 'unit_root'
                    WHEN adf_stationary AND NOT kpss_stationary
                    THEN 'conflict' ELSE 'inconclusive' END AS verdict
        FROM a8 JOIN k8 ON a8.channel = k8.channel
        """

    _c4_wc = "len(regexp_split_to_array(trim({x}), '\\s+'))"
    sql["doc_c4_filters"] = f"""
        WITH base AS (
          SELECT doc_id, text, string_split(text, chr(10)) AS lines
          FROM documents
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(list_filter(lines, l ->
                 regexp_matches(trim(l), '[.!?"]$'))) AS BIGINT)
                 AS n_terminal_lines,
               CAST(len(list_filter(lines, l ->
                 length(trim(l)) > 0 AND {_c4_wc.format(x='l')} < 3))
                 AS BIGINT) AS n_short_lines,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE {_c4_wc.format(x='text')} END AS BIGINT)
                 AS n_words,
               lower(text) LIKE '%lorem ipsum%' AS has_lorem,
               contains(text, '{{') AS has_brace,
               NOT (lower(text) LIKE '%lorem ipsum%')
                 AND NOT contains(text, '{{')
                 AND (CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE {_c4_wc.format(x='text')} END) >= 5 AS keep,
               CASE WHEN len(lines) > 0 THEN
                 round(CAST(len(list_filter(lines, l ->
                   regexp_matches(trim(l), '[.!?"]$'))) AS DOUBLE)
                   / len(lines), 9)
               ELSE 0e0 END AS terminal_share
        FROM base
        """

    sql["mm_image_entropy"] = f"""
        WITH px AS (
          SELECT doc_id, {_ihg.format(i='i', j='j')} AS v
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        cnt AS (
          SELECT doc_id, v, CAST(COUNT(*) AS BIGINT) AS c
          FROM px GROUP BY doc_id, v
        ),
        tot AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_px,
                 CAST(COUNT(*) AS BIGINT) AS n_levels
          FROM cnt GROUP BY doc_id
        )
        SELECT t.doc_id AS media_id, t.n_px, t.n_levels,
               CAST(SUM(CAST(c AS HUGEINT)
                 * ({_LNQ8.format(x="t.n_px")} - {_LNQ8.format(x="c")}))
                 AS DOUBLE) / (CAST(t.n_px AS DOUBLE) * 1000000000)
                 AS entropy_nats
        FROM cnt JOIN tot t ON cnt.doc_id = t.doc_id
        GROUP BY t.doc_id, t.n_px, t.n_levels
        """

    # --- round-8 wave-5 additions -------------------------------------
    # The LOCF day-grid vals CTE (the theil_sen text) shared by the two
    # new grid-family oracles.
    _w5_grid = f"""
        b AS (
          SELECT MAX(start_ts) AS lo, MIN(end_ts) AS hi FROM channels
        ),
        gb AS (
          SELECT UNNEST(generate_series(
            ((lo + {_DAY} - 1) // {_DAY}) * {_DAY}, hi, {_DAY})) AS ts
          FROM b
        ),
        grid AS (
          SELECT c.channel, gb.ts
          FROM (SELECT DISTINCT channel FROM channels) c CROSS JOIN gb
        ),
        u AS (
          SELECT channel, ts, value, 0 AS is_grid FROM samples
          UNION ALL
          SELECT channel, ts, CAST(NULL AS DOUBLE), 1 FROM grid
        ),
        f AS (
          SELECT channel, ts, is_grid,
                 last_value(value IGNORE NULLS) OVER w AS fill
          FROM u
          WINDOW w AS (PARTITION BY channel ORDER BY ts, is_grid, value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
    """

    from pennsieve_streaming_spark.operators.stats import (
        EG_ALPHA as _EG_A,
        EG_BETA as _EG_B,
        EG_GAMMA as _EG_G,
        EG_RESID_Q as _EG_RQ,
        MK_TREND as _MK_T,
        MK_VAR_S as _MK_V,
        MK_Z as _MK_Z,
        benford_exprs as _benford_exprs,
    )

    sql["ts_mann_kendall"] = with_views(
        f"""
        WITH {_w5_grid},
        vals AS (
          SELECT channel, ts AS t,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        s AS (
          SELECT a.channel,
                 CAST(SUM(CASE WHEN bb.xq > a.xq THEN 1
                               WHEN bb.xq < a.xq THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM vals a JOIN vals bb
            ON a.channel = bb.channel AND a.t < bb.t
          GROUP BY a.channel
        ),
        ties AS (
          SELECT channel,
                 CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                   AS tie_term,
                 CAST(SUM(t) AS BIGINT) AS n_points
          FROM (
            SELECT channel, xq, CAST(COUNT(*) AS BIGINT) AS t
            FROM vals GROUP BY channel, xq
          ) GROUP BY channel
        )
        SELECT s.channel, n_points, s_stat,
               {_MK_V} AS var_s,
               {_MK_Z} AS z,
               {_MK_T} AS trend
        FROM s JOIN ties ON s.channel = ties.channel
        """,
        "samples",
        "channels",
    )

    _bchi2, _bmad = _benford_exprs()
    _bpiv = ", ".join(
        f"CAST(SUM(CASE WHEN digit = {i} THEN c ELSE 0 END) AS BIGINT)"
        f" AS c{i}"
        for i in range(1, 10)
    )
    sql["ts_benford"] = with_views(
        f"""
        WITH d AS (
          SELECT channel,
                 CAST(substring(CAST(abs(CAST(round(value * {CORR_QUANT})
                   AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM samples
        ),
        counts AS (
          SELECT channel, digit, CAST(COUNT(*) AS BIGINT) AS c
          FROM d WHERE digit > 0 GROUP BY channel, digit
        ),
        piv AS (
          SELECT channel, CAST(SUM(c) AS BIGINT) AS n, {_bpiv}
          FROM counts GROUP BY channel
        )
        SELECT channel, n,
               {", ".join(f"c{i}" for i in range(1, 10))},
               CASE WHEN n > 0 THEN round({_bchi2}, 9) ELSE 0e0 END
                 AS chi2,
               CASE WHEN n > 0 THEN round(({_bmad}) / 9e0, 9)
                 ELSE 0e0 END AS mad
        FROM piv
        """,
        "samples",
    )

    sql["ts_cointegration"] = with_views(
        f"""
        WITH {_w5_grid},
        vals AS (
          SELECT channel, ts AS t,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS vq
          FROM f WHERE is_grid = 1
        ),
        prs AS (
          SELECT a.channel AS ch_a, bb.channel AS ch_b, a.t,
                 a.vq AS xq, bb.vq AS yq
          FROM vals a JOIN vals bb
            ON a.t = bb.t AND a.channel < bb.channel
        ),
        mom AS (
          SELECT ch_a, ch_b, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS sx,
                 CAST(SUM(yq) AS BIGINT) AS sy,
                 SUM(CAST(xq AS DECIMAL(38,0)) * xq) AS sxx,
                 SUM(CAST(xq AS DECIMAL(38,0)) * yq) AS sxy
          FROM prs GROUP BY ch_a, ch_b
        ),
        coef0 AS (
          SELECT ch_a, ch_b, n, sx, sy,
                 coalesce({_EG_B}, 0e0) AS beta
          FROM mom
        ),
        coef AS (
          SELECT ch_a, ch_b, n, beta, {_EG_A} AS alpha FROM coef0
        ),
        resid AS (
          SELECT p.ch_a, p.ch_b, p.t, {_EG_RQ} AS eq
          FROM prs p JOIN coef c
            ON p.ch_a = c.ch_a AND p.ch_b = c.ch_b
        ),
        lagged AS (
          SELECT ch_a, ch_b,
                 LAG(eq) OVER (PARTITION BY ch_a, ch_b ORDER BY t)
                   AS ep,
                 eq
          FROM resid
        ),
        dfa AS (
          SELECT ch_a, ch_b,
                 SUM(CAST(ep AS DECIMAL(38,0)) * (eq - ep)) AS sed,
                 SUM(CAST(ep AS DECIMAL(38,0)) * ep) AS see
          FROM lagged WHERE ep IS NOT NULL GROUP BY ch_a, ch_b
        )
        SELECT c.ch_a, c.ch_b, c.n,
               round(c.beta, 9) AS beta,
               round({_EG_G}, 9) AS gamma,
               ({_EG_G}) < -0.05e0 AS cointegrated
        FROM coef c JOIN dfa
          ON c.ch_a = dfa.ch_a AND c.ch_b = dfa.ch_b
        """,
        "samples",
        "channels",
    )

    from pennsieve_streaming_spark.operators.analytics import (
        MW_Z as _MW_Z,
        SIMPSON_LAMBDA as _SIMP_L,
    )

    sql["ev_mann_whitney"] = f"""
        WITH ev AS (
          SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vq
          FROM events
        ),
        types AS (SELECT DISTINCT event_type FROM ev),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM types a JOIN types b ON a.event_type < b.event_type
        ),
        m AS (
          SELECT type_a, type_b, vq,
                 ev.event_type = type_a AS is_a
          FROM ev JOIN pairs
            ON ev.event_type = type_a OR ev.event_type = type_b
        ),
        ranked AS (
          SELECT type_a, type_b, vq, is_a,
                 RANK() OVER (PARTITION BY type_a, type_b
                              ORDER BY vq) AS _rmin,
                 COUNT(*) OVER (PARTITION BY type_a, type_b, vq) AS _t
          FROM m
        ),
        g AS (
          SELECT type_a, type_b,
                 CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_b,
                 CAST(SUM(CASE WHEN is_a THEN 2 * _rmin + (_t - 1)
                               ELSE 0 END) AS BIGINT) AS r1_2
          FROM ranked GROUP BY type_a, type_b
        ),
        tg AS (
          SELECT type_a, type_b,
                 CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)
                      AS DECIMAL(38,0)) AS tie3
          FROM (
            SELECT type_a, type_b, vq, CAST(COUNT(*) AS BIGINT) AS t
            FROM m GROUP BY type_a, type_b, vq
          ) GROUP BY type_a, type_b
        )
        SELECT g.type_a, g.type_b, n_a, n_b,
               CAST(r1_2 - n_a * (n_a + 1) AS BIGINT) AS u2,
               {_MW_Z} AS z,
               abs({_MW_Z}) > 1.959963985e0 AS significant
        FROM g JOIN tg
          ON g.type_a = tg.type_a AND g.type_b = tg.type_b
        """

    sql["ev_simpson_diversity"] = f"""
        WITH ut AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY user_id, event_type
        ),
        g AS (
          SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(c * (c - 1)) AS BIGINT) AS num,
                 CAST(MAX(c) AS BIGINT) AS top_c
          FROM ut GROUP BY user_id
        )
        SELECT user_id, n_events, n_types,
               {_SIMP_L} AS simpson,
               CASE WHEN n_events > 1 THEN
                 round(1e0 - ({_SIMP_L}), 9) ELSE 0e0 END
                 AS gini_simpson,
               round(CAST(top_c AS DOUBLE) / CAST(n_events AS DOUBLE), 9)
                 AS top_share
        FROM g
        """

    from pennsieve_streaming_spark.llm.curation import (
        GOPHER_MAX_MEAN_WL as _GP_MAXWL,
        GOPHER_MAX_WORDS as _GP_MAXW,
        GOPHER_MIN_MEAN_WL as _GP_MINWL,
        GOPHER_MIN_WORDS as _GP_MINW,
        GOPHER_STOPWORDS as _GP_STOPS,
    )

    _gp_stop_arr = ", ".join(f"'{s}'" for s in _GP_STOPS)
    _gp_rules = {
        "wc_ok": f"n_words >= {_GP_MINW} AND n_words <= {_GP_MAXW}",
        "mwl_ok": (
            f"n_words > 0 AND {_GP_MINWL} * n_words <= _wl "
            f"AND _wl <= {_GP_MAXWL} * n_words"
        ),
        "symbol_ok": "n_words > 0 AND 10 * n_symbols <= n_words",
        "bullet_ok": "10 * n_bullet_lines <= 9 * n_lines",
        "ellipsis_ok": "10 * n_ellipsis_lines <= 3 * n_lines",
        "alpha_ok": "n_words > 0 AND 5 * n_alpha_words >= 4 * n_words",
        "stop_ok": "n_stops_present >= 2",
    }
    _gp_keep = " AND ".join(f"({e})" for e in _gp_rules.values())
    _gp_rule_cols = ",\n               ".join(
        f"{e} AS {k}" for k, e in _gp_rules.items()
    )
    sql["doc_gopher_quality"] = f"""
        WITH base AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(text), '\\s+') AS toks,
                 string_split(text, chr(10)) AS lines,
                 length(trim(text)) = 0 AS is_empty,
                 text
          FROM documents
        ),
        d AS (
          SELECT doc_id,
                 CAST(CASE WHEN is_empty THEN 0 ELSE len(toks) END
                   AS BIGINT) AS n_words,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   list_reduce(list_prepend(0,
                     list_transform(toks, t -> length(t))),
                     (a, x) -> a + x) END AS BIGINT) AS _wl,
                 CAST(len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\\.\\.\\.'))
                   + len(regexp_extract_all(text, '…'))
                   AS BIGINT) AS n_symbols,
                 CAST(len(list_filter(lines, l -> trim(l) LIKE '-%'
                   OR trim(l) LIKE '*%' OR trim(l) LIKE '•%'))
                   AS BIGINT) AS n_bullet_lines,
                 CAST(len(list_filter(lines, l -> trim(l) LIKE '%...'
                   OR trim(l) LIKE '%…')) AS BIGINT)
                   AS n_ellipsis_lines,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_filter(toks, t ->
                     regexp_matches(t, '[A-Za-z]'))) END AS BIGINT)
                   AS n_alpha_words,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_filter([{_gp_stop_arr}], s ->
                     list_contains(list_transform(toks,
                       t -> lower(t)), s))) END AS BIGINT)
                   AS n_stops_present
          FROM base
        )
        SELECT doc_id, n_words, n_lines,
               CASE WHEN n_words > 0 THEN
                 round(CAST(_wl AS DOUBLE) / CAST(n_words AS DOUBLE), 9)
               ELSE 0e0 END AS mean_word_len,
               n_symbols, n_bullet_lines, n_ellipsis_lines,
               n_alpha_words, n_stops_present,
               {_gp_rule_cols},
               {_gp_keep} AS keep
        FROM d
        """

    sql["doc_lexical_diversity"] = """
        WITH base AS (
          SELECT doc_id,
                 list_transform(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> lower(t)) AS toks,
                 length(trim(text)) = 0 AS is_empty
          FROM documents
        ),
        d AS (
          SELECT doc_id,
                 CAST(CASE WHEN is_empty THEN 0 ELSE len(toks) END
                   AS BIGINT) AS n_tokens,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_distinct(toks)) END AS BIGINT) AS n_types
          FROM base
        )
        SELECT doc_id, n_tokens, n_types,
               CASE WHEN n_tokens > 0 THEN round(CAST(n_types AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 9) ELSE 0e0 END AS ttr,
               CASE WHEN n_tokens > 0 THEN round(CAST(n_types AS DOUBLE)
                 / sqrt(CAST(n_tokens AS DOUBLE)), 9) ELSE 0e0 END
                 AS rttr,
               CASE WHEN n_tokens > 1 THEN
                 round(ln(CAST(n_types AS DOUBLE))
                 / ln(CAST(n_tokens AS DOUBLE)), 9) ELSE 0e0 END
                 AS herdan_c,
               CASE WHEN n_tokens > 1 THEN
                 round((ln(CAST(n_tokens AS DOUBLE))
                 - ln(CAST(n_types AS DOUBLE)))
                 / (ln(CAST(n_tokens AS DOUBLE))
                 * ln(CAST(n_tokens AS DOUBLE))), 9) ELSE 0e0 END
                 AS maas_a2
        FROM d
        """

    from pennsieve_streaming_spark.llm.similarity import (
        ASSORT_R as _AS_R,
        TWONN_ID as _TW_ID,
        TWONN_LNQ as _TW_LNQ,
        TWONN_MU as _TW_MU,
        TWONN_VALID as _TW_V,
    )

    assert "WHERE rank <= 5" in sql["emb_cosine_topk"]
    _tw_top2 = sql["emb_cosine_topk"].replace(
        "WHERE rank <= 5", "WHERE rank <= 2"
    )
    sql["emb_intrinsic_dim"] = f"""
        WITH tk AS ({_tw_top2}),
        piv AS (
          SELECT query_id,
                 MAX(CASE WHEN rank = 1 THEN neighbor_id END) AS nn1_id,
                 MAX(CASE WHEN rank = 2 THEN neighbor_id END) AS nn2_id,
                 MAX(CASE WHEN rank = 1 THEN cosine END) AS cos1,
                 MAX(CASE WHEN rank = 2 THEN cosine END) AS cos2
          FROM tk GROUP BY query_id
        ),
        v AS (
          SELECT query_id AS vec_id, nn1_id, nn2_id,
                 {_TW_MU} AS mu,
                 {_TW_LNQ} AS _lnq,
                 {_TW_V} AS _isv
          FROM piv WHERE nn2_id IS NOT NULL
        ),
        tot AS (
          SELECT CAST(SUM(_isv) AS BIGINT) AS n_valid,
                 CAST(SUM(_lnq) AS BIGINT) AS sum_lnq
          FROM v
        )
        SELECT vec_id, nn1_id, nn2_id, mu, {_TW_ID} AS id_twonn
        FROM v CROSS JOIN tot
        """

    sql["emb_knn_assortativity"] = f"""
        WITH e AS (
          SELECT query_id AS src, neighbor_id AS dst
          FROM ({sql["emb_knn_graph"]})
        ),
        indeg AS (
          SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg
          FROM e GROUP BY dst
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM e
            UNION ALL SELECT dst AS node FROM e
          )
        ),
        deg AS (
          SELECT node, coalesce(indeg, CAST(0 AS BIGINT)) AS d
          FROM nodes LEFT JOIN indeg ON node = indeg.dst
        ),
        x AS (
          SELECT dx.d AS xd, dy.d AS yd
          FROM e JOIN deg dx ON e.src = dx.node
                 JOIN deg dy ON e.dst = dy.node
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                 CAST(SUM(xd) AS BIGINT) AS sx,
                 CAST(SUM(yd) AS BIGINT) AS sy,
                 SUM(CAST(xd AS DECIMAL(38,0)) * yd) AS sxy,
                 SUM(CAST(xd AS DECIMAL(38,0)) * xd) AS sxx,
                 SUM(CAST(yd AS DECIMAL(38,0)) * yd) AS syy
          FROM x
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)
        SELECT n_edges, n_nodes, {_AS_R} AS assortativity
        FROM g CROSS JOIN nn
        """

    from pennsieve_streaming_spark.llm.imagehash import (
        orientation_case_sql as _ocase,
    )

    def _ov(di: int, dj: int) -> str:
        return (
            f"((doc_id * {_IH_A} + (i + {di}) * {_IH_B} "
            f"+ (j + {dj}) * {_IH_C}) % {_IH_M})"
        )

    _ogx = (
        f"({_ov(-1, 1)} + 2 * {_ov(0, 1)} + {_ov(1, 1)}) "
        f"- ({_ov(-1, -1)} + 2 * {_ov(0, -1)} + {_ov(1, -1)})"
    )
    _ogy = (
        f"({_ov(1, -1)} + 2 * {_ov(1, 0)} + {_ov(1, 1)}) "
        f"- ({_ov(-1, -1)} + 2 * {_ov(-1, 0)} + {_ov(-1, 1)})"
    )
    _o_interior = (_IH_H - 2) * (_IH_W - 2)
    sql["mm_image_orientation"] = f"""
        WITH px AS (
          SELECT doc_id, {_ogx} AS gx, {_ogy} AS gy
          FROM documents,
               UNNEST(generate_series(1, {_IH_H - 2})) AS ti(i),
               UNNEST(generate_series(1, {_IH_W - 2})) AS tj(j)
        ),
        o AS (
          SELECT doc_id, {_ocase("gx", "gy")} AS octant FROM px
        )
        SELECT doc_id AS media_id, CAST(octant AS BIGINT) AS octant,
               CAST(COUNT(*) AS BIGINT) AS n_px,
               round(CAST(COUNT(*) AS DOUBLE) / {_o_interior}e0, 9)
                 AS share
        FROM o GROUP BY doc_id, octant
        """

    sql["mm_audio_dynamic_range"] = with_views(
        """
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * 1) AS BIGINT) AS xq
          FROM samples_aligned WHERE channel = 'lead'
        ),
        r AS (
          SELECT channel,
                 ROW_NUMBER() OVER (PARTITION BY channel
                     ORDER BY ts, value) - 1 AS _rn,
                 xq
          FROM s
        ),
        fr AS (
          SELECT channel, _rn // 64 AS win, COUNT(*) AS _n,
                 CAST(SUM(xq * xq) AS BIGINT) AS e
          FROM r GROUP BY channel, _rn // 64
        ),
        f2 AS (SELECT channel, win, e FROM fr WHERE _n = 64),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_frames
          FROM f2 GROUP BY channel
        ),
        pk AS (
          SELECT f2.channel, n_frames, e,
                 ROW_NUMBER() OVER (PARTITION BY f2.channel
                     ORDER BY e, win) AS _er
          FROM f2 JOIN cnt ON f2.channel = cnt.channel
        ),
        g AS (
          SELECT channel, n_frames,
                 CAST(MAX(CASE WHEN _er = (10 * n_frames + 99) // 100
                      THEN e END) AS BIGINT) AS e_p10,
                 CAST(MAX(CASE WHEN _er = (95 * n_frames + 99) // 100
                      THEN e END) AS BIGINT) AS e_p95
          FROM pk
          WHERE _er = (10 * n_frames + 99) // 100
             OR _er = (95 * n_frames + 99) // 100
          GROUP BY channel, n_frames
        )
        SELECT channel, n_frames, e_p10, e_p95,
               CASE WHEN e_p10 > 0 THEN
                 round(10e0 * log10(CAST(e_p95 AS DOUBLE)
                 / CAST(e_p10 AS DOUBLE)), 9) ELSE 0e0 END AS dr_db
        FROM g
        """,
        "samples_aligned",
    )

    sql["ts_records"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        m AS (
          SELECT channel, ts, xq,
                 MAX(xq) OVER w AS _pmax,
                 MIN(xq) OVER w AS _pmin
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)
        )
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN _pmax IS NOT NULL AND xq > _pmax
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_record_highs,
               CAST(SUM(CASE WHEN _pmin IS NOT NULL AND xq < _pmin
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_record_lows,
               CAST(COALESCE(MAX(CASE WHEN _pmax IS NOT NULL
                    AND xq > _pmax THEN ts END), -1) AS BIGINT)
                 AS last_high_ts,
               CAST(COALESCE(MAX(CASE WHEN _pmin IS NOT NULL
                    AND xq < _pmin THEN ts END), -1) AS BIGINT)
                 AS last_low_ts
        FROM m GROUP BY channel
        """,
        "samples",
    )

    from pennsieve_streaming_spark.llm.hashing import (
        md5_hash64_duck as _md5_duck,
    )
    from pennsieve_streaming_spark.streaming.kmv import (
        KMV_EST as _KMV_EST,
        KMV_K as _KMV_K,
    )

    sql["stream_kmv_distinct"] = f"""
        WITH h AS (
          SELECT DISTINCT {_md5_duck("CAST(user_id AS VARCHAR)")} AS h
          FROM events
        ),
        kk AS (
          SELECT rank, h FROM (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rank FROM h
          ) WHERE rank <= {_KMV_K}
        ),
        m AS (
          SELECT CAST(MAX(h) AS BIGINT) AS hk,
                 CAST(COUNT(*) AS BIGINT) AS n_kept
          FROM kk
        )
        SELECT CAST(rank AS BIGINT) AS rank, h, n_kept,
               {_KMV_EST} AS est_distinct
        FROM kk CROSS JOIN m
        """

    # --- round-8 wave-6 additions -------------------------------------
    _bb_w, _bb_k = 20, 2
    _bb_up = (
        f"({_bb_w} * xq - _s) > 0 AND ({_bb_w} * xq - _s) "
        f"* ({_bb_w} * xq - _s) > {_bb_k * _bb_k} "
        f"* ({_bb_w} * _ss - _s * _s)"
    )
    _bb_lo = (
        f"({_bb_w} * xq - _s) < 0 AND ({_bb_w} * xq - _s) "
        f"* ({_bb_w} * xq - _s) > {_bb_k * _bb_k} "
        f"* ({_bb_w} * _ss - _s * _s)"
    )
    sql["ts_bollinger_breaks"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        m AS (
          SELECT channel, ts, xq,
                 COUNT(*) OVER w AS _wn,
                 CAST(SUM(xq) OVER w AS BIGINT) AS _s,
                 CAST(SUM(xq * xq) OVER w AS BIGINT) AS _ss
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN {_bb_w} PRECEDING
                       AND 1 PRECEDING)
        ),
        t AS (SELECT * FROM m WHERE _wn = {_bb_w})
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_tested,
               CAST(SUM(CASE WHEN {_bb_up} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_upper,
               CAST(SUM(CASE WHEN {_bb_lo} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_lower,
               CAST(COALESCE(MAX(CASE WHEN {_bb_up} THEN ts END), -1)
                 AS BIGINT) AS last_upper_ts,
               CAST(COALESCE(MAX(CASE WHEN {_bb_lo} THEN ts END), -1)
                 AS BIGINT) AS last_lower_ts
        FROM t GROUP BY channel
        """,
        "samples",
    )

    from pennsieve_streaming_spark.operators.stats import (
        TURN_Z as _TP_Z,
    )

    sql["ts_turning_points"] = with_views(
        f"""
        WITH {_w5_grid},
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        m AS (
          SELECT channel, xq,
                 LAG(xq) OVER w AS _p,
                 LEAD(xq) OVER w AS _n
          FROM vals
          WINDOW w AS (PARTITION BY channel ORDER BY ts, xq)
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(SUM(CASE WHEN _p IS NOT NULL AND _n IS NOT NULL
                      AND ((xq > _p AND xq > _n)
                           OR (xq < _p AND xq < _n))
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_turns
          FROM m GROUP BY channel
        )
        SELECT channel, n_points, n_turns,
               {_TP_Z} AS z,
               CASE WHEN abs({_TP_Z}) <= 1.959963985e0 THEN 'random'
                    WHEN ({_TP_Z}) < 0e0 THEN 'trending'
                    ELSE 'oscillating' END AS verdict
        FROM g
        """,
        "samples",
        "channels",
    )

    _cp_share = (
        "CASE WHEN n_words > 0 THEN round(CAST({c} AS DOUBLE) "
        "/ CAST(n_words AS DOUBLE), 9) ELSE 0e0 END"
    )
    sql["doc_case_profile"] = f"""
        WITH base AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(text), '\\s+') AS toks,
                 length(trim(text)) = 0 AS is_empty
          FROM documents
        ),
        d AS (
          SELECT doc_id,
                 CAST(CASE WHEN is_empty THEN 0 ELSE len(toks) END
                   AS BIGINT) AS n_words,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_filter(toks, t ->
                     regexp_matches(t, '^[A-Z]{{2,}}$'))) END
                   AS BIGINT) AS n_caps_words,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_filter(toks, t ->
                     regexp_matches(t, '^[A-Z][a-z]+$'))) END
                   AS BIGINT) AS n_title_words,
                 CAST(CASE WHEN is_empty THEN 0 ELSE
                   len(list_filter(toks, t ->
                     regexp_matches(t, '[0-9]'))) END
                   AS BIGINT) AS n_digit_words
          FROM base
        )
        SELECT doc_id, n_words, n_caps_words, n_title_words,
               n_digit_words,
               {_cp_share.format(c="n_caps_words")} AS caps_share,
               {_cp_share.format(c="n_title_words")} AS title_share,
               {_cp_share.format(c="n_digit_words")} AS digit_share
        FROM d
        """

    from pennsieve_streaming_spark.operators.analytics import (
        CUPED_DIFF_ADJ as _CU_DA,
        CUPED_DIFF_RAW as _CU_DR,
        CUPED_THETA as _CU_TH,
        CUPED_Z as _CU_Z,
    )

    sql["ev_ab_cuped"] = f"""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts, value
          FROM events
        ),
        b AS (SELECT (MIN(ts) + MAX(ts)) // 2 AS _mid FROM ev),
        pu AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN ts < _mid THEN 1 ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ts >= _mid
                      AND event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN b GROUP BY user_id
        ),
        pv AS (SELECT user_id % 2 AS variant, x, y FROM pu),
        vm AS (
          SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                 SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                 SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
          FROM pv GROUP BY variant
        ),
        pooled AS (
          SELECT {_CU_TH} AS theta FROM (
            SELECT CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(sx) AS BIGINT) AS sx,
                   CAST(SUM(sy) AS BIGINT) AS sy,
                   SUM(sxx) AS sxx, SUM(sxy) AS sxy
            FROM vm
          )
        ),
        piv AS (
          SELECT MAX(CASE WHEN variant = 0 THEN n END) AS na,
                 MAX(CASE WHEN variant = 0 THEN sx END) AS sxa,
                 MAX(CASE WHEN variant = 0 THEN sy END) AS sya,
                 MAX(CASE WHEN variant = 0 THEN sxx END) AS sxxa,
                 MAX(CASE WHEN variant = 0 THEN syy END) AS syya,
                 MAX(CASE WHEN variant = 0 THEN sxy END) AS sxya,
                 MAX(CASE WHEN variant = 1 THEN n END) AS nb,
                 MAX(CASE WHEN variant = 1 THEN sx END) AS sxb,
                 MAX(CASE WHEN variant = 1 THEN sy END) AS syb,
                 MAX(CASE WHEN variant = 1 THEN sxx END) AS sxxb,
                 MAX(CASE WHEN variant = 1 THEN syy END) AS syyb,
                 MAX(CASE WHEN variant = 1 THEN sxy END) AS sxyb
          FROM vm
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               round(theta, 9) AS theta,
               round({_CU_DR}, 9) AS diff_raw,
               round({_CU_DA}, 9) AS diff_adj,
               {_CU_Z} AS z_adj,
               abs({_CU_Z}) > 1.959963985e0 AS significant
        FROM piv CROSS JOIN pooled
        """

    sql["stream_records"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM chan_events
        ),
        m AS (
          SELECT channel, ts, xq,
                 MAX(xq) OVER w AS _pmax,
                 MIN(xq) OVER w AS _pmin
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)
        )
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN _pmax IS NOT NULL AND xq > _pmax
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_record_highs,
               CAST(SUM(CASE WHEN _pmin IS NOT NULL AND xq < _pmin
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_record_lows,
               CAST(COALESCE(MAX(CASE WHEN _pmax IS NOT NULL
                    AND xq > _pmax THEN ts END), -1) AS BIGINT)
                 AS last_high_ts,
               CAST(COALESCE(MAX(CASE WHEN _pmin IS NOT NULL
                    AND xq < _pmin THEN ts END), -1) AS BIGINT)
                 AS last_low_ts
        FROM m GROUP BY channel
        """,
        "chan_events",
    )

    # --- round-8 wave-7 additions -------------------------------------
    from pennsieve_streaming_spark.operators.stats import (
        KATZ_FD as _KATZ_FD,
    )

    sql["ts_katz_fd"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        m AS (
          SELECT channel, xq,
                 LAG(xq) OVER w AS _p,
                 FIRST_VALUE(xq) OVER w AS _x0
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(SUM(CASE WHEN _p IS NOT NULL
                      THEN abs(xq - _p) ELSE 0 END) AS BIGINT)
                   AS lpath,
                 CAST(MAX(abs(xq - _x0)) AS BIGINT) AS dmax,
                 CAST(COUNT(*) - 1 AS BIGINT) AS n_steps
          FROM m GROUP BY channel
        )
        SELECT channel, n_points, lpath, dmax, {_KATZ_FD} AS fd
        FROM g
        """,
        "samples",
    )

    sql["ts_drawdown"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        r AS (
          SELECT channel, ts, xq,
                 MAX(xq) OVER w AS _pmax,
                 MAX(xq) OVER w - xq AS dd
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(MAX(dd) AS BIGINT) AS max_dd_q
          FROM r GROUP BY channel
        ),
        trough AS (
          SELECT r.channel, CAST(MIN(r.ts) AS BIGINT) AS trough_ts
          FROM r JOIN g ON r.channel = g.channel
          WHERE r.dd = g.max_dd_q
          GROUP BY r.channel
        ),
        peak AS (
          SELECT r.channel,
                 CAST(MIN(r.xq) + MIN(r.dd) AS BIGINT) AS peak_q
          FROM r JOIN trough t
            ON r.channel = t.channel AND r.ts = t.trough_ts
          JOIN g ON r.channel = g.channel
          WHERE r.dd = g.max_dd_q
          GROUP BY r.channel
        )
        SELECT g.channel, g.n_points, g.max_dd_q, t.trough_ts,
               p.peak_q,
               CASE WHEN p.peak_q > 0 THEN
                 round(CAST(g.max_dd_q AS DOUBLE)
                 / CAST(p.peak_q AS DOUBLE), 9) ELSE 0e0 END AS dd_frac
        FROM g JOIN trough t ON g.channel = t.channel
               JOIN peak p ON g.channel = p.channel
        """,
        "samples",
    )

    from pennsieve_streaming_spark.llm.curation import (
        BLOOM_PROBES as _BL_K,
        bloom_pos_expr as _bl_pos,
    )

    _bl_union = " UNION ".join(
        f"SELECT {_bl_pos('sh', i)} AS p FROM bench"
        for i in range(_BL_K)
    )
    _bl_test = " AND ".join(
        f"({_bl_pos('d.sh', i)}) IN (SELECT p FROM bpos)"
        for i in range(_BL_K)
    )
    sql["doc_bloom_contamination"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, text, {TOKS} AS toks FROM documents
        ),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bench AS (
          SELECT DISTINCT sh FROM doc_sh
          WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        bpos AS (SELECT DISTINCT p FROM ({_bl_union})),
        dtest AS (
          SELECT d.doc_id,
                 CASE WHEN {_bl_test} THEN 1 ELSE 0 END AS hit,
                 CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END
                   AS exact_hit
          FROM doc_sh d LEFT JOIN bench b USING (sh)
        ),
        ov AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
                 CAST(SUM(exact_hit) AS BIGINT) AS n_exact
          FROM dtest GROUP BY doc_id
        )
        SELECT t.doc_id,
               COALESCE(ov.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
               COALESCE(ov.n_bloom_hits, CAST(0 AS BIGINT))
                 AS n_bloom_hits,
               COALESCE(ov.n_exact, CAST(0 AS BIGINT)) AS n_exact,
               COALESCE(ov.n_bloom_hits - ov.n_exact, CAST(0 AS BIGINT))
                 AS n_false_pos,
               CASE WHEN COALESCE(ov.n_shingles, 0) = 0 THEN 0e0
                    ELSE round(CAST(ov.n_bloom_hits AS DOUBLE)
                         / CAST(ov.n_shingles AS DOUBLE), 9)
               END AS bloom_ratio,
               (CASE WHEN COALESCE(ov.n_shingles, 0) = 0 THEN 0e0
                     ELSE round(CAST(ov.n_bloom_hits AS DOUBLE)
                          / CAST(ov.n_shingles AS DOUBLE), 9)
                END) > 0.5 AS bloom_contaminated,
               (CASE WHEN COALESCE(ov.n_shingles, 0) = 0 THEN 0e0
                     ELSE CAST(ov.n_exact AS DOUBLE)
                          / CAST(ov.n_shingles AS DOUBLE)
                END) > 0.5 AS exact_contaminated
        FROM documents t LEFT JOIN ov ON t.doc_id = ov.doc_id
        """

    sql["doc_contamination_screened"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, text, {TOKS} AS toks FROM documents
        ),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bench AS (
          SELECT DISTINCT sh FROM doc_sh
          WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        bpos AS (SELECT DISTINCT p FROM ({_bl_union})),
        dtest AS (
          SELECT d.doc_id,
                 CASE WHEN {_bl_test} THEN 1 ELSE 0 END AS hit,
                 CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END
                   AS exact_hit
          FROM doc_sh d LEFT JOIN bench b USING (sh)
        ),
        ov0 AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
                 CAST(SUM(exact_hit) AS BIGINT) AS n_exact
          FROM dtest GROUP BY doc_id
        ),
        ov AS (
          -- the ratio gate: audit only where bloom_ratio > threshold
          -- (bloom never under-counts, so <= threshold proves clean)
          SELECT doc_id, n_shingles, n_bloom_hits,
                 CASE WHEN CAST(n_bloom_hits AS DOUBLE) <=
                      0.5 * CAST(n_shingles AS DOUBLE)
                      THEN CAST(0 AS BIGINT) ELSE n_exact END
                   AS n_overlap
          FROM ov0
        )
        SELECT t.doc_id,
               COALESCE(ov.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
               COALESCE(ov.n_bloom_hits, CAST(0 AS BIGINT))
                 AS n_bloom_hits,
               COALESCE(ov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
               CASE WHEN COALESCE(ov.n_shingles, 0) = 0
                    THEN CAST(0 AS DOUBLE)
                    ELSE ov.n_overlap / CAST(ov.n_shingles AS DOUBLE)
               END AS overlap_ratio,
               (CASE WHEN COALESCE(ov.n_shingles, 0) = 0
                     THEN CAST(0 AS DOUBLE)
                     ELSE ov.n_overlap / CAST(ov.n_shingles AS DOUBLE)
                END) > 0.5 AS contaminated
        FROM documents t LEFT JOIN ov ON t.doc_id = ov.doc_id
        """

    _bf_chi2, _bf_mad = _benford_exprs()
    _bf_piv = ", ".join(
        f"CAST(SUM(CASE WHEN digit = {i} THEN c ELSE 0 END) AS BIGINT)"
        f" AS c{i}"
        for i in range(1, 10)
    )
    sql["stream_benford"] = with_views(
        f"""
        WITH d AS (
          SELECT channel,
                 CAST(substring(CAST(abs(CAST(round(value * {CORR_QUANT})
                   AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM chan_events
        ),
        counts AS (
          SELECT channel, digit, CAST(COUNT(*) AS BIGINT) AS c
          FROM d WHERE digit > 0 GROUP BY channel, digit
        ),
        piv AS (
          SELECT channel, CAST(SUM(c) AS BIGINT) AS n, {_bf_piv}
          FROM counts GROUP BY channel
        )
        SELECT channel, n,
               {", ".join(f"c{i}" for i in range(1, 10))},
               CASE WHEN n > 0 THEN round({_bf_chi2}, 9) ELSE 0e0 END
                 AS chi2,
               CASE WHEN n > 0 THEN round(({_bf_mad}) / 9e0, 9)
                 ELSE 0e0 END AS mad
        FROM piv
        """,
        "chan_events",
    )

    sql["stream_bollinger"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM chan_events
        ),
        m AS (
          SELECT channel, ts, xq,
                 COUNT(*) OVER w AS _wn,
                 CAST(SUM(xq) OVER w AS BIGINT) AS _s,
                 CAST(SUM(xq * xq) OVER w AS BIGINT) AS _ss
          FROM s
          WINDOW w AS (PARTITION BY channel ORDER BY ts, value
                       ROWS BETWEEN {_bb_w} PRECEDING
                       AND 1 PRECEDING)
        ),
        t AS (SELECT * FROM m WHERE _wn = {_bb_w})
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_tested,
               CAST(SUM(CASE WHEN {_bb_up} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_upper,
               CAST(SUM(CASE WHEN {_bb_lo} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_lower,
               CAST(COALESCE(MAX(CASE WHEN {_bb_up} THEN ts END), -1)
                 AS BIGINT) AS last_upper_ts,
               CAST(COALESCE(MAX(CASE WHEN {_bb_lo} THEN ts END), -1)
                 AS BIGINT) AS last_lower_ts
        FROM t GROUP BY channel
        """,
        "chan_events",
    )

    # --- round-8 wave-8 additions -------------------------------------
    _gs_cos = (
        "list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) "
        "* sqrt(list_dot_product(nv, nv)))"
    )
    _gs_hops = 3
    _gs_cte = [
        f"""
        h0 AS (
          SELECT q.query_id, q.qv, CAST(0 AS BIGINT) AS hop,
                 CAST(0 AS BIGINT) AS node_id, {_gs_cos} AS cosine
          FROM gq q JOIN gemb ON nid = 0
        )"""
    ]
    for _h in range(1, _gs_hops + 1):
        _gs_cte.append(f"""
        h{_h} AS (
          SELECT query_id, qv, hop, node_id, cosine FROM (
            SELECT p.query_id, p.qv, CAST({_h} AS BIGINT) AS hop,
                   CAST(e.neighbor_id AS BIGINT) AS node_id,
                   {_gs_cos} AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY p.query_id
                       ORDER BY {_gs_cos} DESC, e.neighbor_id) AS _r
            FROM h{_h - 1} p
            JOIN gedges e ON e.query_id = p.node_id
            JOIN gemb ON nid = e.neighbor_id
          ) WHERE _r = 1
        )""")
    _gs_union = " UNION ALL ".join(
        f"SELECT query_id, hop, node_id, cosine FROM h{h}"
        for h in range(_gs_hops + 1)
    )
    sql["emb_graph_search"] = f"""
        WITH gedges AS (
          SELECT query_id, neighbor_id FROM ({sql["emb_knn_graph"]})
        ),
        gq AS (
          SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 10
        ),
        gemb AS (
          SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS nv
          FROM embeddings
        ),
        {", ".join(_gs_cte)}
        {_gs_union}
        """

    from pennsieve_streaming_spark.llm.text import (
        ROUGE_F1 as _RG_F1,
        ROUGE_F2 as _RG_F2,
        ROUGE_P1 as _RG_P1,
        ROUGE_R1 as _RG_R1,
    )

    sql["doc_rouge_pairs"] = f"""
        WITH rpairs AS (
          SELECT doc_a, doc_b FROM ({sql["doc_minhash_lsh_pairs"]})
        ),
        rdoc_toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
        runi AS (
          SELECT DISTINCT doc_id, {PH_S} AS sh FROM (
            SELECT doc_id, UNNEST({_ngram_duck(1)}) AS s
            FROM rdoc_toks
          )
        ),
        rbi AS (
          SELECT DISTINCT doc_id, {PH_S} AS sh FROM (
            SELECT doc_id, UNNEST({_ngram_duck(2)}) AS s
            FROM rdoc_toks
          )
        ),
        rua AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM runi GROUP BY doc_id
        ),
        rba AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM rbi GROUP BY doc_id
        ),
        rov1 AS (
          SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS ov
          FROM rpairs p
          JOIN runi x ON x.doc_id = p.doc_a
          JOIN runi y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b
        ),
        rov2 AS (
          SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS ov
          FROM rpairs p
          JOIN rbi x ON x.doc_id = p.doc_a
          JOIN rbi y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b
        ),
        rbase AS (
          SELECT p.doc_a, p.doc_b,
                 ua.n AS n_uni_a, ub.n AS n_uni_b,
                 COALESCE(o1.ov, CAST(0 AS BIGINT)) AS uni_overlap,
                 ba.n AS n_bi_a, bb.n AS n_bi_b,
                 COALESCE(o2.ov, CAST(0 AS BIGINT)) AS bi_overlap
          FROM rpairs p
          JOIN rua ua ON ua.doc_id = p.doc_a
          JOIN rua ub ON ub.doc_id = p.doc_b
          JOIN rba ba ON ba.doc_id = p.doc_a
          JOIN rba bb ON bb.doc_id = p.doc_b
          LEFT JOIN rov1 o1
            ON o1.doc_a = p.doc_a AND o1.doc_b = p.doc_b
          LEFT JOIN rov2 o2
            ON o2.doc_a = p.doc_a AND o2.doc_b = p.doc_b
        )
        SELECT doc_a, doc_b, n_uni_a, n_uni_b, uni_overlap,
               round({_RG_P1}, 9) AS rouge1_p,
               round({_RG_R1}, 9) AS rouge1_r,
               {_RG_F1} AS rouge1_f1,
               bi_overlap,
               {_RG_F2} AS rouge2_f1
        FROM rbase
        """

    sql["mm_image_equalize"] = f"""
        WITH px AS (
          SELECT doc_id, {_ihg.format(i='i', j='j')} AS v
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        cnt AS (
          SELECT doc_id, v AS level, CAST(COUNT(*) AS BIGINT) AS c
          FROM px GROUP BY doc_id, v
        ),
        lev AS (
          SELECT doc_id, level, c,
                 SUM(c) OVER w AS cdf,
                 FIRST_VALUE(c) OVER w AS cdf_min
          FROM cnt
          WINDOW w AS (PARTITION BY doc_id ORDER BY level
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
        ),
        tot AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_px
          FROM cnt GROUP BY doc_id
        ),
        eq AS (
          SELECT l.doc_id, l.c, t.n_px,
                 CAST(CASE WHEN t.n_px > l.cdf_min THEN
                   ((l.cdf - l.cdf_min) * 255) // (t.n_px - l.cdf_min)
                 ELSE 0 END AS BIGINT) AS eqv
          FROM lev l JOIN tot t ON l.doc_id = t.doc_id
        )
        SELECT doc_id AS media_id,
               CAST(MAX(n_px) AS BIGINT) AS n_px,
               CAST(COUNT(*) AS BIGINT) AS n_levels_in,
               CAST(COUNT(DISTINCT eqv) AS BIGINT) AS n_levels_out,
               CAST(SUM(eqv * c) AS BIGINT) AS sum_eq,
               CAST(MIN(eqv) AS BIGINT) AS min_eq,
               CAST(MAX(eqv) AS BIGINT) AS max_eq
        FROM eq GROUP BY doc_id
        """

    # --- round-8 wave-9 additions -------------------------------------
    from pennsieve_streaming_spark.dsp.spectral import (
        spectral_shape_exprs as _spec_exprs,
    )

    _sp_cent, _sp_bw = _spec_exprs(PS_BINS)
    _sp_piv = ", ".join(
        f"MAX(CASE WHEN bin = {b} THEN power END) AS p{b}"
        for b in range(1, PS_BINS + 1)
    )
    sql["ts_spectral_shape"] = f"""
        WITH ps AS ({sql["ts_power_spectrum"]}),
        piv AS (
          SELECT channel, CAST(win AS BIGINT) AS win, {_sp_piv}
          FROM ps GROUP BY channel, win
        )
        SELECT channel, win,
               {_sp_cent} AS centroid_bin,
               {_sp_bw} AS bandwidth_bins
        FROM piv
        """

    sql["ts_variogram"] = with_views(
        f"""
        WITH {_w5_grid},
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        lagged AS (
          SELECT channel, UNNEST([1, 2, 4, 7, 14]) AS lag_days,
                 ts AS ts_b, xq AS xb
          FROM vals
        ),
        pr AS (
          SELECT a.channel,
                 CAST(l.lag_days AS BIGINT) AS lag_days,
                 l.xb - a.xq AS d
          FROM vals a JOIN lagged l
            ON a.channel = l.channel
           AND a.ts = l.ts_b - CAST(l.lag_days AS BIGINT)
               * {GRID_INTERVAL_US}
        )
        SELECT channel, lag_days,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(CAST(SUM(CAST(d AS DECIMAL(38,0)) * d) AS BIGINT)
                 AS DOUBLE) / CAST(2 * COUNT(*) AS DOUBLE)
                 AS semivariance
        FROM pr GROUP BY channel, lag_days
        """,
        "samples",
        "channels",
    )

    sql["doc_hapax_ratio"] = """
        WITH tok AS (
          SELECT source, UNNEST(
            CASE WHEN length(trim(text)) = 0 THEN []
                 ELSE list_transform(
                   regexp_split_to_array(trim(text), '\\s+'),
                   t -> lower(t)) END) AS t
          FROM documents
        ),
        tt AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY source, t
        ),
        g AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax
          FROM tt GROUP BY source
        )
        SELECT source, n_tokens, n_types, n_hapax,
               CASE WHEN n_types > 0 THEN round(CAST(n_hapax AS DOUBLE)
                 / CAST(n_types AS DOUBLE), 9) ELSE 0e0 END
                 AS hapax_type_share,
               CASE WHEN n_tokens > 0 THEN round(CAST(n_hapax AS DOUBLE)
                 / CAST(n_tokens AS DOUBLE), 9) ELSE 0e0 END
                 AS hapax_token_share
        FROM g
        """

    # the streaming Simpson state drains to the SAME aggregate the
    # batch operator computes — one oracle text, two engines' worth
    # of gating (the stream_burstiness pattern)
    sql["stream_simpson"] = sql["ev_simpson_diversity"]

    # --- round-8 wave-10 additions ------------------------------------
    _smaf, _smas = 20, 50
    _sma_sgn = (
        f"CASE WHEN {_smas} * _sf - {_smaf} * _ss > 0 THEN 1 "
        f"WHEN {_smas} * _sf - {_smaf} * _ss < 0 THEN -1 ELSE 0 END"
    )
    sql["ts_sma_cross"] = with_views(
        f"""
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples
        ),
        m AS (
          SELECT channel, ts, value,
                 COUNT(*) OVER ws AS _wn,
                 CAST(SUM(xq) OVER wf AS BIGINT) AS _sf,
                 CAST(SUM(xq) OVER ws AS BIGINT) AS _ss
          FROM s
          WINDOW wf AS (PARTITION BY channel ORDER BY ts, value
                        ROWS BETWEEN {_smaf - 1} PRECEDING
                        AND CURRENT ROW),
                 ws AS (PARTITION BY channel ORDER BY ts, value
                        ROWS BETWEEN {_smas - 1} PRECEDING
                        AND CURRENT ROW)
        ),
        d AS (
          SELECT channel, ts, value, {_sma_sgn} AS _sgn
          FROM m WHERE _wn = {_smas}
        ),
        mk AS (
          SELECT channel, ts, _sgn,
                 last_value(CASE WHEN _sgn <> 0 THEN _sgn END
                   IGNORE NULLS) OVER wl AS _prev
          FROM d
          WINDOW wl AS (PARTITION BY channel ORDER BY ts, value
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING)
        )
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_tested,
               CAST(SUM(CASE WHEN _sgn = 1 AND _prev = -1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_golden,
               CAST(SUM(CASE WHEN _sgn = -1 AND _prev = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_death,
               CAST(COALESCE(MAX(CASE WHEN _sgn = 1 AND _prev = -1
                    THEN ts END), -1) AS BIGINT) AS last_golden_ts,
               CAST(COALESCE(MAX(CASE WHEN _sgn = -1 AND _prev = 1
                    THEN ts END), -1) AS BIGINT) AS last_death_ts
        FROM mk GROUP BY channel
        """,
        "samples",
    )

    _mw = 50
    _mtoks = (
        "list_transform(regexp_split_to_array(trim(text), '\\s+'), "
        "t -> lower(t))"
    )
    sql["doc_mattr"] = f"""
        WITH base AS (
          SELECT doc_id, {_mtoks} AS toks,
                 length(trim(text)) = 0 AS is_empty
          FROM documents
        ),
        d AS (
          SELECT doc_id,
                 CAST(CASE WHEN is_empty THEN 0 ELSE len(toks) END
                   AS BIGINT) AS n_tokens,
                 CAST(CASE WHEN is_empty THEN 0
                      WHEN len(toks) < {_mw}
                      THEN len(list_distinct(toks))
                      ELSE list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(
                            generate_series(1, len(toks) - {_mw} + 1),
                            i -> CAST(len(list_distinct(
                              list_slice(toks, CAST(i AS INT),
                                CAST(i AS INT) + {_mw} - 1)))
                              AS BIGINT))),
                        (acc, x) -> acc + x) END AS BIGINT) AS _dsum,
                 CAST(CASE WHEN is_empty THEN 0
                      WHEN len(toks) < {_mw} THEN 1
                      ELSE len(toks) - {_mw} + 1 END AS BIGINT)
                   AS n_windows
          FROM base
        )
        SELECT doc_id, n_tokens, n_windows,
               CASE WHEN n_tokens = 0 THEN 0e0
                    WHEN n_tokens < {_mw} THEN
                      round(CAST(_dsum AS DOUBLE)
                        / CAST(n_tokens AS DOUBLE), 9)
                    ELSE round(CAST(_dsum AS DOUBLE)
                      / (CAST(n_windows AS DOUBLE) * {_mw}e0), 9)
               END AS mattr
        FROM d
        """

    _ct_lits = ["0.5e0", "0.7e0", "0.9e0"]
    _ct_counts = ", ".join(
        f"CAST(SUM(CASE WHEN cosine >= {t} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_ge_{i}"
        for i, t in enumerate(_ct_lits, 1)
    )
    _ct_shares = ", ".join(
        f"round(CAST(n_ge_{i} AS DOUBLE) / CAST(n_corpus AS DOUBLE), 9)"
        f" AS share_{i}"
        for i in range(1, len(_ct_lits) + 1)
    )
    sql["emb_cosine_thresholds"] = f"""
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
        c AS (SELECT vec_id AS neighbor_id,
                     CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_dot_product(qv, v)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(v, v))) AS cosine
          FROM q JOIN c ON query_id != neighbor_id
        ),
        g AS (
          SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_corpus,
                 {_ct_counts}
          FROM scored GROUP BY query_id
        )
        SELECT query_id, n_corpus, n_ge_1, n_ge_2, n_ge_3,
               {_ct_shares}
        FROM g
        """

    # --- round-8 wave-11 additions ------------------------------------
    # posterized (÷32) field: the raw linear field has no equal
    # neighbors, so runs only exist after quantization
    _rle_v = f"(({_ihg.format(i='i', j='j')}) // 32)"
    _rle_vl = f"(({_ihg.format(i='i', j='jm1')}) // 32)"
    _rle_vu = f"(({_ihg.format(i='im1', j='j')}) // 32)"
    sql["mm_image_rle"] = f"""
        WITH hruns AS (
          SELECT doc_id,
                 CAST({_IH_H} + SUM(CASE WHEN {_rle_v} <> {_rle_vl}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_h_runs
          FROM (
            SELECT doc_id, i, j, j - 1 AS jm1
            FROM documents,
                 UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
                 UNNEST(generate_series(1, {_IH_W - 1})) AS tj(j)
          ) GROUP BY doc_id
        ),
        vruns AS (
          SELECT doc_id,
                 CAST({_IH_W} + SUM(CASE WHEN {_rle_v} <> {_rle_vu}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_v_runs
          FROM (
            SELECT doc_id, i, i - 1 AS im1, j
            FROM documents,
                 UNNEST(generate_series(1, {_IH_H - 1})) AS ti(i),
                 UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
          ) GROUP BY doc_id
        )
        SELECT h.doc_id AS media_id,
               CAST({_IH_H * _IH_W} AS BIGINT) AS n_px,
               h.n_h_runs, v.n_v_runs,
               round(CAST(h.n_h_runs AS DOUBLE)
                 / {_IH_H * _IH_W}e0, 9) AS h_ratio,
               round(CAST(v.n_v_runs AS DOUBLE)
                 / {_IH_H * _IH_W}e0, 9) AS v_ratio
        FROM hruns h JOIN vruns v ON h.doc_id = v.doc_id
        """

    sql["doc_dup_source_mix"] = f"""
        WITH mpairs AS (
          SELECT doc_a, doc_b FROM ({sql["doc_minhash_lsh_pairs"]})
        ),
        sj AS (
          SELECT p.doc_a, p.doc_b, da.source AS _sa, db.source AS _sb
          FROM mpairs p
          JOIN documents da ON da.doc_id = p.doc_a
          JOIN documents db ON db.doc_id = p.doc_b
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(COALESCE(SUM(CASE WHEN _sa = _sb THEN 1
                      ELSE 0 END), 0) AS BIGINT) AS n_within,
                 CAST(COALESCE(SUM(CASE WHEN _sa = _sb THEN 0
                      ELSE 1 END), 0) AS BIGINT) AS n_cross
          FROM sj
        )
        SELECT n_pairs, n_within, n_cross,
               CASE WHEN n_pairs > 0 THEN round(CAST(n_within AS DOUBLE)
                 / CAST(n_pairs AS DOUBLE), 9) ELSE 0e0 END
                 AS within_share,
               CASE WHEN n_pairs > 0 THEN round(CAST(n_cross AS DOUBLE)
                 / CAST(n_pairs AS DOUBLE), 9) ELSE 0e0 END
                 AS cross_share
        FROM g
        """

    from pennsieve_streaming_spark.operators.analytics import (
        WEEKEND_Z as _WK_Z,
    )

    sql["ev_weekend_effect"] = f"""
        WITH ev AS (
          SELECT event_type, epoch_us(ts) AS ts FROM events
        ),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN ((ts // 86400000000) + 4) % 7
                      IN (6, 0) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_weekend
          FROM ev GROUP BY event_type
        )
        SELECT event_type, n, n_weekend,
               round(CAST(n_weekend AS DOUBLE) / CAST(n AS DOUBLE), 9)
                 AS weekend_share,
               {_WK_Z} AS z,
               CASE WHEN ({_WK_Z}) > 1.959963985e0
                    THEN 'weekend_heavy'
                    WHEN ({_WK_Z}) < -1.959963985e0
                    THEN 'weekday_heavy' ELSE 'calendar' END AS verdict
        FROM g
        """

    # --- round-10 wave-1 oracles ---------------------------------------

    _arch_r2 = (
        "(CASE WHEN (n_pairs * CAST(_sxx AS DOUBLE) "
        "- CAST(_sx1 AS DOUBLE) * _sx1) "
        "* (n_pairs * CAST(_syy AS DOUBLE) "
        "- CAST(_sy1 AS DOUBLE) * _sy1) > 0e0 THEN "
        "(n_pairs * CAST(_sxy AS DOUBLE) "
        "- CAST(_sx1 AS DOUBLE) * _sy1) "
        "* (n_pairs * CAST(_sxy AS DOUBLE) "
        "- CAST(_sx1 AS DOUBLE) * _sy1) "
        "/ ((n_pairs * CAST(_sxx AS DOUBLE) "
        "- CAST(_sx1 AS DOUBLE) * _sx1) "
        "* (n_pairs * CAST(_syy AS DOUBLE) "
        "- CAST(_sy1 AS DOUBLE) * _sy1)) ELSE 0e0 END)"
    )
    sql["ts_arch_lm"] = with_views(
        f"""
        WITH {_w5_grid},
        vals AS (
          SELECT channel, ts,
                 CAST(round(fill * {CORR_QUANT}) AS BIGINT) AS xq
          FROM f WHERE is_grid = 1
        ),
        tot AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS _n,
                 CAST(SUM(xq) AS BIGINT) AS _sy
          FROM vals GROUP BY channel
        ),
        e AS (
          SELECT v.channel, v.ts,
                 (v.xq - CAST(round(CAST(t._sy AS DOUBLE) / t._n)
                   AS BIGINT)) AS _e
          FROM vals v JOIN tot t USING (channel)
        ),
        sq AS (SELECT channel, ts, _e * _e AS _s FROM e),
        lagd AS (
          SELECT channel, _s,
                 LAG(_s) OVER (PARTITION BY channel ORDER BY ts) AS _sp
          FROM sq
        ),
        g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 SUM(CAST(_s AS HUGEINT)) AS _sy1,
                 SUM(CAST(_sp AS HUGEINT)) AS _sx1,
                 SUM(CAST(_s AS HUGEINT) * _sp) AS _sxy,
                 SUM(CAST(_sp AS HUGEINT) * _sp) AS _sxx,
                 SUM(CAST(_s AS HUGEINT) * _s) AS _syy
          FROM lagd WHERE _sp IS NOT NULL GROUP BY channel
        )
        SELECT channel, n_pairs,
               round(n_pairs * {_arch_r2}, 9) AS lm_stat,
               round(n_pairs * {_arch_r2}, 9) > 3.841e0 AS arch_present
        FROM g
        """,
        "samples",
        "channels",
    )

    _cpk_var = (
        "(CAST(_sxx AS DOUBLE) / n "
        "- (CAST(_sx AS DOUBLE) / n) * (CAST(_sx AS DOUBLE) / n))"
    )
    _cpk_mean = f"(CAST(_sx AS DOUBLE) / n / {float(CORR_QUANT)!r})"
    _cpk_sd = f"(sqrt({_cpk_var}) / {float(CORR_QUANT)!r})"
    sql["ts_process_capability"] = with_views(
        f"""
        WITH g AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(xq) AS BIGINT) AS _sx,
                 SUM(CAST(xq AS HUGEINT) * xq) AS _sxx
          FROM (
            SELECT channel,
                   CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
            FROM samples
          ) GROUP BY channel
        )
        SELECT channel, n,
               round({_cpk_mean}, 9) AS mean_v,
               CASE WHEN {_cpk_var} > 0e0 THEN round({_cpk_sd}, 9)
                    ELSE 0e0 END AS sd_v,
               CASE WHEN {_cpk_var} > 0e0 THEN
                 round(({CPK_USL!r} - {CPK_LSL!r}) / (6e0 * {_cpk_sd}), 9)
                 ELSE 0e0 END AS cp,
               CASE WHEN {_cpk_var} > 0e0 THEN
                 round(least({CPK_USL!r} - {_cpk_mean},
                             {_cpk_mean} - {CPK_LSL!r})
                       / (3e0 * {_cpk_sd}), 9) ELSE 0e0 END AS cpk,
               CASE WHEN {_cpk_var} > 0e0 THEN
                 round(least({CPK_USL!r} - {_cpk_mean},
                             {_cpk_mean} - {CPK_LSL!r})
                       / (3e0 * {_cpk_sd}), 9) >= 1.33e0
                 ELSE false END AS capable
        FROM g
        """,
        "samples",
    )

    _ks_d = "(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b))"
    sql["ts_ks_two_sample"] = with_views(
        f"""
        WITH per AS (
          SELECT xq,
                 CAST(SUM(CASE WHEN channel = '{GRID_CHANNELS[0]}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN channel = '{GRID_CHANNELS[1]}'
                      THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM (
            SELECT channel,
                   CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
            FROM samples
            WHERE channel IN ('{GRID_CHANNELS[0]}', '{GRID_CHANNELS[1]}')
          ) GROUP BY xq
        ),
        c AS (
          SELECT xq,
                 CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
                 CAST(SUM(cb) OVER w AS BIGINT) AS cum_b
          FROM per
          WINDOW w AS (ORDER BY xq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        tot AS (
          SELECT MAX(cum_a) AS n_a, MAX(cum_b) AS n_b FROM c
        ),
        d AS (
          SELECT CAST(MAX(t.n_a) AS BIGINT) AS n_a,
                 CAST(MAX(t.n_b) AS BIGINT) AS n_b,
                 CAST(MAX(abs(t.n_b * c.cum_a - t.n_a * c.cum_b))
                   AS BIGINT) AS d_num
          FROM c, tot t
        )
        SELECT '{GRID_CHANNELS[0]}' AS channel_a,
               '{GRID_CHANNELS[1]}' AS channel_b,
               n_a, n_b, d_num,
               round({_ks_d}, 9) AS d_stat,
               {_ks_d} > 1.358e0 * sqrt((n_a + CAST(n_b AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * n_b)) AS reject_5pct
        FROM d WHERE n_a IS NOT NULL
        """,
        "samples",
    )

    sql["ev_daily_anomalies"] = f"""
        WITH days AS (
          SELECT (epoch_us(ts) // {_DAYU}) * {_DAYU} AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY (epoch_us(ts) // {_DAYU}) * {_DAYU}
        ),
        r AS (
          SELECT day, n_events,
                 row_number() OVER (ORDER BY n_events, day) AS _r,
                 CAST(COUNT(*) OVER () AS BIGINT) AS _n
          FROM days
        ),
        med AS (SELECT n_events AS med FROM r WHERE _r = (_n + 1) // 2),
        wm AS (
          SELECT day, n_events, med, abs(n_events - med) AS _ad
          FROM days, med
        ),
        r2 AS (
          SELECT day, _ad,
                 row_number() OVER (ORDER BY _ad, day) AS _r,
                 CAST(COUNT(*) OVER () AS BIGINT) AS _n
          FROM wm
        ),
        mad AS (SELECT _ad AS mad FROM r2 WHERE _r = (_n + 1) // 2)
        SELECT day, n_events, med, mad,
               CASE WHEN mad > 0 THEN
                 round((n_events - med) / (1.4826e0 * mad), 9)
                 ELSE 0e0 END AS robust_z,
               (mad > 0 AND 10000 * abs(n_events - med) > 51891 * mad)
                 AS is_anomaly
        FROM wm, mad
        """

    # --- round-10 wave-2 oracles ---------------------------------------

    # shared audio framing: rank -> 64-sample frames, ragged tail drops
    _au_framed = f"""
        ranked AS (
          SELECT channel,
                 row_number() OVER (PARTITION BY channel
                   ORDER BY ts, value) - 1 AS _rn,
                 CAST(round(value * {CORR_QUANT}) AS BIGINT) AS xq
          FROM samples_aligned
        ),
        fr AS (
          SELECT channel, _rn // {PITCH_FRAME} AS win,
                 _rn % {PITCH_FRAME} AS pos, xq
          FROM ranked
        ),
        per AS (
          SELECT channel, win, CAST(COUNT(*) AS BIGINT) AS _n,
                 CAST(SUM(xq) AS BIGINT) AS _s
          FROM fr GROUP BY channel, win
        )
    """

    sql["mm_audio_pitch"] = with_views(
        f"""
        WITH {_au_framed},
        d AS (
          SELECT f.channel, f.win, f.pos,
                 {PITCH_FRAME} * f.xq - p._s AS _d
          FROM fr f JOIN per p
            ON f.channel = p.channel AND f.win = p.win
          WHERE p._n = {PITCH_FRAME}
        ),
        r0 AS (
          SELECT channel, win, SUM(CAST(_d AS HUGEINT) * _d) AS _r0
          FROM d GROUP BY channel, win
        ),
        r AS (
          SELECT a.channel, a.win, a.pos - b.pos AS lag,
                 SUM(CAST(a._d AS HUGEINT) * b._d) AS _r
          FROM d a JOIN d b
            ON a.channel = b.channel AND a.win = b.win
          WHERE a.pos - b.pos BETWEEN {PITCH_LO} AND {PITCH_HI}
          GROUP BY a.channel, a.win, a.pos - b.pos
        ),
        best AS (
          SELECT channel, win, lag, _r,
                 row_number() OVER (PARTITION BY channel, win
                   ORDER BY _r DESC, lag) AS _rk
          FROM r
        )
        SELECT b.channel, CAST(b.win AS BIGINT) AS win,
               CAST(b.lag AS BIGINT) AS best_lag,
               10 * b._r > 3 * r0._r0 AS voiced,
               round(CAST({AUDIO_RATE_HZ!r} AS DOUBLE) / b.lag, 9)
                 AS pitch_hz,
               CASE WHEN r0._r0 > 0 THEN
                 round(CAST(b._r AS DOUBLE) / CAST(r0._r0 AS DOUBLE), 9)
                 ELSE 0e0 END AS strength
        FROM best b JOIN r0
          ON b.channel = r0.channel AND b.win = r0.win
        WHERE b._rk = 1
        """,
        "samples_aligned",
    )

    sql["mm_audio_tempo"] = with_views(
        f"""
        WITH {_au_framed},
        en AS (
          SELECT f.channel, f.win,
                 CAST(SUM(f.xq * f.xq) AS BIGINT) AS _e
          FROM fr f JOIN per p
            ON f.channel = p.channel AND f.win = p.win
          WHERE p._n = {PITCH_FRAME}
          GROUP BY f.channel, f.win
        ),
        o AS (
          SELECT channel, win,
                 greatest(CAST(0 AS BIGINT),
                   _e - LAG(_e) OVER (PARTITION BY channel
                     ORDER BY win)) // 1024 AS _o
          FROM en
          QUALIFY LAG(_e) OVER (PARTITION BY channel ORDER BY win)
            IS NOT NULL
        ),
        r0 AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_frames,
                 SUM(CAST(_o AS HUGEINT) * _o) AS _r0
          FROM o GROUP BY channel
        ),
        r AS (
          SELECT a.channel, a.win - b.win AS lag,
                 SUM(CAST(a._o AS HUGEINT) * b._o) AS _r
          FROM o a JOIN o b ON a.channel = b.channel
          WHERE a.win - b.win BETWEEN {TEMPO_LO} AND {TEMPO_HI}
          GROUP BY a.channel, a.win - b.win
        ),
        best AS (
          SELECT channel, lag, _r,
                 row_number() OVER (PARTITION BY channel
                   ORDER BY _r DESC, lag) AS _rk
          FROM r
        )
        SELECT b.channel, r0.n_frames, CAST(b.lag AS BIGINT) AS best_lag,
               round(60e0 * {AUDIO_RATE_HZ!r}
                 / ({PITCH_FRAME} * b.lag), 9) AS tempo_bpm,
               CASE WHEN r0._r0 > 0 THEN
                 round(CAST(b._r AS DOUBLE) / CAST(r0._r0 AS DOUBLE), 9)
                 ELSE 0e0 END AS strength
        FROM best b JOIN r0 ON b.channel = r0.channel
        WHERE b._rk = 1
        """,
        "samples_aligned",
    )

    _snr_ma = "(CAST(_ea AS DOUBLE) / n_active)"
    _snr_mn = "(CAST(_en AS DOUBLE) / (n_frames - n_active))"
    sql["mm_audio_snr"] = with_views(
        f"""
        WITH {_au_framed},
        en AS (
          SELECT f.channel, f.win,
                 CAST(SUM(f.xq * f.xq) AS BIGINT) AS energy_q
          FROM fr f JOIN per p
            ON f.channel = p.channel AND f.win = p.win
          WHERE p._n = {PITCH_FRAME}
          GROUP BY f.channel, f.win
        ),
        cnt AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS _nf
          FROM en GROUP BY channel
        ),
        med AS (
          SELECT e.channel, e.energy_q AS med_q
          FROM (
            SELECT channel, energy_q,
                   row_number() OVER (PARTITION BY channel
                     ORDER BY energy_q, win) AS _ar
            FROM en
          ) e JOIN cnt ON e.channel = cnt.channel
          WHERE e._ar = (cnt._nf + 1) // 2
        ),
        g AS (
          SELECT en.channel,
                 CAST(COUNT(*) AS BIGINT) AS n_frames,
                 CAST(SUM(CASE WHEN energy_q > 2 * med_q
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
                 SUM(CASE WHEN energy_q > 2 * med_q
                     THEN CAST(energy_q AS HUGEINT)
                     ELSE CAST(0 AS HUGEINT) END) AS _ea,
                 SUM(CASE WHEN energy_q > 2 * med_q
                     THEN CAST(0 AS HUGEINT)
                     ELSE CAST(energy_q AS HUGEINT) END) AS _en
          FROM en JOIN med ON en.channel = med.channel
          GROUP BY en.channel
        )
        SELECT channel, n_frames, n_active,
               CASE WHEN n_active > 0 THEN round({_snr_ma}, 9)
                    ELSE 0e0 END AS mean_active_q,
               CASE WHEN n_frames - n_active > 0
                    THEN round({_snr_mn}, 9) ELSE 0e0 END AS mean_noise_q,
               CASE WHEN n_active > 0 AND n_frames - n_active > 0
                    AND _en > 0 THEN
                 round(10e0 * log10({_snr_ma} / {_snr_mn}), 9)
                 ELSE 0e0 END AS snr_db
        FROM g
        """,
        "samples_aligned",
    )

    _pal_px = _ihg.format(i="i", j="j")
    sql["mm_image_palette"] = f"""
        WITH px AS (
          SELECT doc_id,
                 ((({_pal_px}) // 64) * 16
                  + ((({_pal_px} + 85) % 256) // 64) * 4
                  + (({_pal_px} + 170) % 256) // 64) AS bin_id
          FROM documents,
               UNNEST(generate_series(0, {_IH_H - 1})) AS ti(i),
               UNNEST(generate_series(0, {_IH_W - 1})) AS tj(j)
        ),
        cnt AS (
          SELECT doc_id, bin_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM px GROUP BY doc_id, bin_id
        ),
        ranked AS (
          SELECT doc_id, bin_id, c,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY c DESC, bin_id) AS _rk
          FROM cnt
        )
        SELECT doc_id AS media_id, CAST(_rk AS BIGINT) AS rank,
               CAST(bin_id AS BIGINT) AS bin_id, c AS n_px_bin,
               CAST({_IH_H * _IH_W} AS BIGINT) AS n_px,
               round(CAST(c AS DOUBLE) / {_IH_H * _IH_W}, 9) AS share
        FROM ranked WHERE _rk <= 4
        """

    # --- round-10 wave-3 oracles ---------------------------------------

    _mmd_mean = "(CAST(_sh AS DOUBLE) / n_pairs / 1000000000)"
    _mmd_var = (
        "((CAST(_shh AS DOUBLE) / n_pairs "
        "- (CAST(_sh AS DOUBLE) / n_pairs) "
        "* (CAST(_sh AS DOUBLE) / n_pairs)) / 1e18)"
    )
    _mmd_z = f"({_mmd_mean} / sqrt({_mmd_var} / n_pairs))"
    _mmd_k = "((list_dot_product({a}, {b})) * (list_dot_product({a}, {b})))"
    sql["emb_mmd"] = f"""
        WITH base AS (
          SELECT vec_id AS _id, CAST(embedding AS DOUBLE[]) AS v,
                 CAST(label % 2 AS INT) AS grp
          FROM embeddings
        ),
        counts AS (
          SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_b
          FROM base
        ),
        ranked AS (
          SELECT grp,
                 CAST((row_number() OVER (PARTITION BY grp
                   ORDER BY _id) - 1) // 2 AS BIGINT) AS p,
                 CAST((row_number() OVER (PARTITION BY grp
                   ORDER BY _id) - 1) % 2 AS INT) AS pos,
                 v
          FROM base
        ),
        pa AS (
          SELECT x.p, x.v AS a0, y.v AS a1
          FROM (SELECT p, v FROM ranked WHERE grp = 0 AND pos = 0) x
          JOIN (SELECT p, v FROM ranked WHERE grp = 0 AND pos = 1) y
            ON x.p = y.p
        ),
        pb AS (
          SELECT x.p, x.v AS b0, y.v AS b1
          FROM (SELECT p, v FROM ranked WHERE grp = 1 AND pos = 0) x
          JOIN (SELECT p, v FROM ranked WHERE grp = 1 AND pos = 1) y
            ON x.p = y.p
        ),
        hq AS (
          SELECT CAST(round((
                   {_mmd_k.format(a="a0", b="a1")}
                   + {_mmd_k.format(a="b0", b="b1")}
                   - {_mmd_k.format(a="a0", b="b1")}
                   - {_mmd_k.format(a="a1", b="b0")}
                 ) * 1e9) AS BIGINT) AS hq
          FROM pa JOIN pb ON pa.p = pb.p
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 SUM(CAST(hq AS HUGEINT)) AS _sh,
                 SUM(CAST(hq AS HUGEINT) * hq) AS _shh
          FROM hq
        )
        SELECT n_a, n_b, n_pairs,
               round({_mmd_mean}, 9) AS mmd2_lin,
               CASE WHEN {_mmd_var} > 0e0 THEN round({_mmd_z}, 9)
                    ELSE 0e0 END AS z,
               CASE WHEN {_mmd_var} > 0e0 THEN
                 abs(round({_mmd_z}, 9)) > 1.96e0 ELSE false END
                 AS shifted
        FROM g, counts WHERE n_pairs > 0
        """

    _bal_key = " + ".join(
        f"(CASE WHEN list_dot_product(e.v, "
        f"list_extract(pl.hs, {b + 1})) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(8)
    )
    sql["emb_lsh_bucket_balance"] = f"""
        WITH pl AS (
          SELECT t,
                 list_transform(generate_series(0, 7), b ->
                   list_transform(generate_series(0, {ANN_DIM - 1}),
                     j -> fmod(((t * 8 + b) * {ANN_DIM} + j)
                       * 0.6180339887498949e0, 1.0e0) - 0.5e0)) AS hs
          FROM (SELECT UNNEST(generate_series(0, 3)) AS t)
        ),
        emb AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ),
        keyed AS (
          SELECT pl.t AS tbl, e.vec_id,
                 CAST({_bal_key} AS BIGINT) AS key
          FROM emb e CROSS JOIN pl
        ),
        per AS (
          SELECT tbl, key, CAST(COUNT(*) AS BIGINT) AS c
          FROM keyed GROUP BY tbl, key
        )
        SELECT CAST(tbl AS BIGINT) AS tbl,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(c) AS BIGINT) AS n_vecs,
               CAST(MAX(c) AS BIGINT) AS max_bucket,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq,
               round(CAST(SUM(c * c) AS DOUBLE) / SUM(c), 9)
                 AS expected_probe
        FROM per GROUP BY tbl
        """

    # --- round-10 wave-4 oracles ---------------------------------------

    sql["doc_contamination_by_source"] = f"""
        WITH doc_toks AS (
          SELECT doc_id, text, {TOKS} AS toks FROM documents
        ),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bench AS (
          SELECT DISTINCT sh FROM doc_sh
          WHERE doc_id % {CONTAM_BENCH_MOD} = 0
        ),
        bpos AS (SELECT DISTINCT p FROM ({_bl_union})),
        dtest AS (
          SELECT d.doc_id,
                 CASE WHEN {_bl_test} THEN 1 ELSE 0 END AS hit,
                 CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END
                   AS exact_hit
          FROM doc_sh d LEFT JOIN bench b USING (sh)
        ),
        ov0 AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(hit) AS BIGINT) AS n_bloom_hits,
                 CAST(SUM(exact_hit) AS BIGINT) AS n_exact
          FROM dtest GROUP BY doc_id
        ),
        ov AS (
          SELECT doc_id, n_shingles, n_bloom_hits,
                 CASE WHEN CAST(n_bloom_hits AS DOUBLE) <=
                      0.5 * CAST(n_shingles AS DOUBLE)
                      THEN CAST(0 AS BIGINT) ELSE n_exact END
                   AS n_overlap
          FROM ov0
        ),
        per AS (
          SELECT t.source,
                 COALESCE(ov.n_shingles, CAST(0 AS BIGINT))
                   AS n_shingles,
                 COALESCE(ov.n_bloom_hits, CAST(0 AS BIGINT))
                   AS n_bloom_hits,
                 COALESCE(ov.n_overlap, CAST(0 AS BIGINT)) AS n_overlap
          FROM documents t LEFT JOIN ov ON t.doc_id = ov.doc_id
        ),
        g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN CAST(n_bloom_hits AS DOUBLE) >
                      0.5 * CAST(n_shingles AS DOUBLE)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
                 CAST(SUM(CASE WHEN n_shingles = 0 THEN 0
                      WHEN (n_overlap / CAST(n_shingles AS DOUBLE))
                        > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
                 CAST(SUM(n_overlap) AS BIGINT) AS sum_overlap,
                 CAST(SUM(n_shingles) AS BIGINT) AS sum_shingles
          FROM per GROUP BY source
        )
        SELECT source, n_docs, n_flagged, n_contaminated, sum_overlap,
               sum_shingles,
               round(CAST(n_flagged AS DOUBLE) / n_docs, 9)
                 AS flagged_rate,
               round(CAST(n_contaminated AS DOUBLE) / n_docs, 9)
                 AS contamination_rate
        FROM g
        """

    sql["doc_pack_efficiency"] = f"""
        WITH enc AS (SELECT * FROM ({sql["doc_bpe_token_ids"]})),
        t AS (
          SELECT d.doc_id, d.source,
                 CAST(e.n_subtokens AS BIGINT) AS n_tokens
          FROM documents d JOIN enc e USING (doc_id)
        ),
        c AS (
          SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) - n_tokens AS tok_offset
          FROM t
        ),
        per AS (
          SELECT source, n_tokens,
                 CAST(tok_offset // {PACK_BUDGET} AS BIGINT)
                   AS start_seq,
                 CAST(CASE WHEN n_tokens = 0
                      THEN tok_offset // {PACK_BUDGET}
                      ELSE (tok_offset + n_tokens - 1)
                        // {PACK_BUDGET}
                      END AS BIGINT) AS end_seq
          FROM c
        ),
        g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(SUM(CASE WHEN end_seq > start_seq THEN 1
                      ELSE 0 END) AS BIGINT) AS n_split_docs
          FROM per GROUP BY source
        ),
        s AS (
          SELECT *,
                 CASE WHEN total_tokens = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST((total_tokens + {PACK_BUDGET - 1})
                        // {PACK_BUDGET} AS BIGINT) END AS n_seqs
          FROM g
        )
        SELECT source, n_docs, total_tokens, n_seqs, n_split_docs,
               CASE WHEN n_seqs > 0 THEN
                 round(CAST(total_tokens AS DOUBLE)
                   / (n_seqs * {PACK_BUDGET}), 9) ELSE 0e0 END
                 AS fill_ratio,
               CASE WHEN n_seqs > 0 THEN
                 round(CAST(n_docs AS DOUBLE) / n_seqs, 9)
                 ELSE 0e0 END AS docs_per_seq
        FROM s
        """

    from pennsieve_streaming_spark.llm.dedup import (
        pow2_chain as _p2c,
    )

    _lt_splits = [(16, 1), (8, 2), (4, 4), (2, 8), (1, 16)]
    _lt_aggs = []
    _lt_rows = []
    for _b, _r in _lt_splits:
        _jr = _p2c("jaccard", _r)
        _p = f"(1.0e0 - {_p2c(f'(1.0e0 - {_jr})', _b)})"
        _lt_aggs.append(
            f"CAST(SUM(CAST(round({_p} * 1000000000) AS BIGINT)) "
            f"AS BIGINT) AS _c_{_b}_{_r}"
        )
        _lt_aggs.append(
            f"CAST(SUM(CASE WHEN jaccard < 0.2 THEN "
            f"CAST(round({_p} * 1000000000) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS _fp_{_b}_{_r}"
        )
        _lt_aggs.append(
            f"CAST(SUM(CASE WHEN jaccard >= 0.2 THEN "
            f"CAST(round((1.0e0 - {_p}) * 1000000000) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS _fn_{_b}_{_r}"
        )
        _lt_rows.append(
            f"SELECT COALESCE(n_pairs, 0) AS n_pairs, "
            f"CAST({_b} AS BIGINT) AS n_bands, "
            f"CAST({_r} AS BIGINT) AS rows_per_band, "
            f"round(power(1.0e0 / {_b}, 1.0e0 / {_r}), 9) "
            f"AS s_curve_threshold, "
            f"COALESCE(_c_{_b}_{_r}, CAST(0 AS BIGINT)) AS exp_cand_nano, "
            f"COALESCE(_fp_{_b}_{_r}, CAST(0 AS BIGINT)) AS exp_fp_nano, "
            f"COALESCE(_fn_{_b}_{_r}, CAST(0 AS BIGINT)) AS exp_fn_nano "
            f"FROM g"
        )
    sql["doc_lsh_tuning"] = f"""
        WITH {DOC_PRE},
        ok_sh AS (
          SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        ints AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
          FROM sh a
          JOIN ok_sh o ON a.sh = o.sh
          JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE)
                   AS jaccard
          FROM ints i
          JOIN sizes sa ON i.doc_a = sa.doc_id
          JOIN sizes sb ON i.doc_b = sb.doc_id
        ),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 {", ".join(_lt_aggs)}
          FROM pairs
        )
        {" UNION ALL ".join(_lt_rows)}
        """

    sql["doc_corpus_build"] = f"""
        WITH keep AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        doc_toks AS (
          SELECT d.doc_id, d.lang, d.source, d.text, {TOKS} AS toks
          FROM documents d JOIN keep USING (doc_id)
        ),
        q AS (
          SELECT doc_id,
                 (CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                       ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                            / CAST(length(text) AS DOUBLE) END) * 0.5e0
                 + len(list_filter(toks, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len(toks) AS DOUBLE) * 0.3e0
                 + least(CAST(len(toks) AS BIGINT), 200)
                   / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
          FROM doc_toks
        ),
        rep AS (
          SELECT doc_id, {_dup_ratio_duck(3)} AS dup_3gram_ratio
          FROM doc_toks
        ),
        grams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM doc_toks
        ),
        doc_sh AS (SELECT DISTINCT doc_id, {PH_S} AS sh FROM grams),
        bgrams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s
          FROM (SELECT doc_id, text, {TOKS} AS toks FROM documents
                WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
        ),
        bench AS (SELECT DISTINCT {PH_S} AS sh FROM bgrams),
        ov AS (
          SELECT d.doc_id, COUNT(*) AS n_sh, COUNT(b.sh) AS n_ov
          FROM doc_sh d LEFT JOIN bench b USING (sh) GROUP BY d.doc_id
        ),
        contam AS (
          SELECT t.doc_id,
                 CASE WHEN COALESCE(ov.n_sh, 0) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE ov.n_ov / CAST(ov.n_sh AS DOUBLE)
                 END AS overlap_ratio
          FROM doc_toks t LEFT JOIN ov ON t.doc_id = ov.doc_id
        ),
        kept AS (
          SELECT d.doc_id, d.source
          FROM doc_toks d
          JOIN q USING (doc_id) JOIN rep USING (doc_id)
          JOIN contam USING (doc_id)
          WHERE {_u} < ({_rate})
            AND q.quality >= 0.3
            AND rep.dup_3gram_ratio <= 0.2
            AND contam.overlap_ratio <= 0.5
        ),
        surv AS (
          SELECT t.source, {N_TOKENS_DUCK} AS n_tokens
          FROM doc_toks t JOIN kept USING (doc_id)
        ),
        per_in AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_input
          FROM documents GROUP BY source
        ),
        per_dd AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact_unique
          FROM doc_toks GROUP BY source
        ),
        per_kept AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
                 CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
          FROM surv GROUP BY source
        ),
        j AS (
          SELECT i.source, i.n_input,
                 COALESCE(d.n_exact_unique, CAST(0 AS BIGINT))
                   AS n_exact_unique,
                 COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept,
                 COALESCE(k.kept_tokens, CAST(0 AS BIGINT))
                   AS kept_tokens
          FROM per_in i
          LEFT JOIN per_dd d ON i.source = d.source
          LEFT JOIN per_kept k ON i.source = k.source
        ),
        s AS (
          SELECT *,
                 CASE WHEN kept_tokens = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST((kept_tokens + {PACK_BUDGET - 1})
                        // {PACK_BUDGET} AS BIGINT) END AS n_seqs
          FROM j
        )
        SELECT source, n_input, n_exact_unique, n_kept, kept_tokens,
               n_seqs,
               CASE WHEN n_seqs > 0 THEN
                 round(CAST(kept_tokens AS DOUBLE)
                   / (n_seqs * {PACK_BUDGET}), 9) ELSE 0e0 END
                 AS fill_ratio
        FROM s
        """

    # stream flavor of the screened decontamination: stateless
    # projection => the batch oracle gates the stream verbatim
    sql["stream_contamination"] = sql["doc_contamination_screened"]

    # --- round-10 wave-5 oracles ---------------------------------------

    sql["doc_classifier_calibration"] = f"""
        WITH cls AS (SELECT * FROM ({sql["doc_quality_classifier"]})),
        b AS (
          SELECT least(CAST(floor(score * 10) AS BIGINT),
                       CAST(9 AS BIGINT)) AS decile,
                 CASE WHEN label THEN 1 ELSE 0 END AS _pos,
                 CAST(round(score * 1000000000) AS BIGINT) AS _sn
          FROM cls
        ),
        g AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(_pos) AS BIGINT) AS n_label_pos,
                 CAST(SUM(_sn) AS BIGINT) AS _sum_nano
          FROM b GROUP BY decile
        )
        SELECT decile, n_docs, n_label_pos,
               round(CAST(n_label_pos AS DOUBLE) / n_docs, 9)
                 AS label_rate,
               round(CAST(_sum_nano AS DOUBLE) / n_docs / 1e9, 9)
                 AS mean_score,
               round(CAST(_sum_nano AS DOUBLE) / n_docs / 1e9
                 - CAST(n_label_pos AS DOUBLE) / n_docs, 9) AS calib_gap
        FROM g
        """

    _sm_h = md5_hash64_duck("text")
    _sm_doch = md5_hash64_duck("CAST(doc_id AS VARCHAR)")
    sql["doc_shard_manifest"] = f"""
        WITH t AS (
          SELECT ((({_sm_doch}) % {SHARD_COUNT}) + {SHARD_COUNT})
                   % {SHARD_COUNT} AS shard,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len({TOKS}) END AS BIGINT) AS _nt,
                 CAST(length(text) AS BIGINT) AS _nc,
                 {_sm_h} AS _h
          FROM documents
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(_nt) AS BIGINT) AS n_tokens,
               CAST(SUM(_nc) AS BIGINT) AS n_chars,
               CAST(SUM(CAST(_h AS HUGEINT)) % 9223372036854775807
                 AS BIGINT) AS checksum
        FROM t GROUP BY shard
        """

    sql["doc_dedup_token_funnel"] = f"""
        WITH d AS (
          SELECT doc_id,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len({TOKS}) END AS BIGINT) AS _nt
          FROM documents
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(_nt) AS BIGINT) AS t
          FROM d
        ),
        keep AS (
          SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        ex AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(_nt) AS BIGINT) AS t
          FROM d JOIN keep USING (doc_id)
        ),
        near AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(d._nt) AS BIGINT) AS t
          FROM ({sql["doc_cluster_dedup"]}) c JOIN d ON c.doc_id = d.doc_id
        ),
        u AS (
          SELECT '0_total' AS stage, n, t FROM tot
          UNION ALL SELECT '1_exact', n, t FROM ex
          UNION ALL SELECT '2_near_dup', n, t FROM near
        )
        SELECT stage, n AS docs_remaining, t AS tokens_remaining,
               round(CAST(t AS DOUBLE) / (SELECT t FROM tot), 9)
                 AS token_share
        FROM u
        """

    # stream flavor of the shard manifest: stateless projection +
    # commutative finish => the batch oracle gates the stream verbatim
    sql["stream_shard_manifest"] = sql["doc_shard_manifest"]

    sql["doc_incremental_dedup"] = f"""
        WITH {DOC_PRE},
        new_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        new_sh AS (SELECT s.* FROM sh s JOIN new_ids USING (doc_id)),
        old_sh AS (
          SELECT s.* FROM sh s
          WHERE s.doc_id NOT IN (SELECT doc_id FROM new_ids)
        ),
        ok AS (
          SELECT sh FROM old_sh GROUP BY sh
          HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        old_kept AS (
          SELECT o.doc_id, o.sh FROM old_sh o JOIN ok USING (sh)
        ),
        sizes AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
          FROM new_sh GROUP BY doc_id
        ),
        ints AS (
          SELECT n.doc_id, o.doc_id AS _old,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM new_sh n JOIN old_kept o ON n.sh = o.sh
          GROUP BY n.doc_id, o.doc_id
        ),
        best AS (
          SELECT doc_id, _old AS best_match_id, inter
          FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY inter DESC, _old) AS _rk
            FROM ints
          ) WHERE _rk = 1
        )
        SELECT s.doc_id, s.n_shingles,
               CAST(COALESCE(b.best_match_id, -1) AS BIGINT)
                 AS best_match_id,
               CAST(COALESCE(b.inter, 0) AS BIGINT) AS inter,
               CASE WHEN s.n_shingles = 0 THEN CAST(0 AS DOUBLE)
                    ELSE COALESCE(b.inter, 0)
                         / CAST(s.n_shingles AS DOUBLE) END
                 AS containment,
               CASE WHEN s.n_shingles = 0 THEN false
                    ELSE (COALESCE(b.inter, 0)
                          / CAST(s.n_shingles AS DOUBLE)) >= 0.5 END
                 AS is_dup
        FROM sizes s LEFT JOIN best b ON s.doc_id = b.doc_id
        """

    # composed incremental-crawl build: delta exact dedup -> standing-
    # corpus containment screen -> full gate cascade -> pack -> shard
    # manifest delta; independent re-derivation of each stage (the
    # screen CTEs mirror doc_incremental_dedup, the gates mirror
    # doc_corpus_build, the manifest mirrors doc_shard_manifest)
    sql["doc_incremental_build"] = f"""
        WITH {DOC_PRE},
        dd_keep AS (
          SELECT MIN(doc_id) AS doc_id FROM documents
          WHERE source = 'src0' GROUP BY md5(text)
        ),
        new_sh AS (SELECT s.* FROM sh s JOIN dd_keep USING (doc_id)),
        old_sh AS (
          SELECT s.* FROM sh s
          JOIN (SELECT doc_id FROM documents WHERE source <> 'src0')
            USING (doc_id)
        ),
        ok AS (
          SELECT sh FROM old_sh GROUP BY sh
          HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        old_kept AS (
          SELECT o.doc_id, o.sh FROM old_sh o JOIN ok USING (sh)
        ),
        sizes AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
          FROM new_sh GROUP BY doc_id
        ),
        ints AS (
          SELECT n.doc_id, o.doc_id AS _old,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM new_sh n JOIN old_kept o ON n.sh = o.sh
          GROUP BY n.doc_id, o.doc_id
        ),
        best AS (
          SELECT doc_id, inter FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY inter DESC, _old) AS _rk
            FROM ints
          ) WHERE _rk = 1
        ),
        dups AS (
          SELECT s.doc_id
          FROM sizes s LEFT JOIN best b USING (doc_id)
          WHERE s.n_shingles > 0
            AND COALESCE(b.inter, 0)
                / CAST(s.n_shingles AS DOUBLE) >= 0.5
        ),
        fresh AS (
          SELECT doc_id FROM dd_keep
          WHERE doc_id NOT IN (SELECT doc_id FROM dups)
        ),
        ftoks AS (
          SELECT d.doc_id, d.lang, d.source, d.text, {TOKS} AS toks
          FROM documents d JOIN fresh USING (doc_id)
        ),
        q AS (
          SELECT doc_id,
                 (CASE WHEN length(text) = 0 THEN CAST(0 AS DOUBLE)
                       ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                            / CAST(length(text) AS DOUBLE) END) * 0.5e0
                 + len(list_filter(toks, t -> list_contains([{_stop_arr}], lower(t))))
                   / CAST(len(toks) AS DOUBLE) * 0.3e0
                 + least(CAST(len(toks) AS BIGINT), 200)
                   / CAST(200.0 AS DOUBLE) * 0.2e0 AS quality
          FROM ftoks
        ),
        rep AS (
          SELECT doc_id, {_dup_ratio_duck(3)} AS dup_3gram_ratio
          FROM ftoks
        ),
        fgrams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s FROM ftoks
        ),
        fsh AS (SELECT DISTINCT doc_id, {PH_S} AS gsh FROM fgrams),
        bgrams AS (
          SELECT doc_id, UNNEST({_ngram_duck(3)}) AS s
          FROM (SELECT doc_id, text, {TOKS} AS toks FROM documents
                WHERE doc_id % {CONTAM_BENCH_MOD} = 0)
        ),
        bset AS (SELECT DISTINCT {PH_S} AS gsh FROM bgrams),
        ov AS (
          SELECT d.doc_id, COUNT(*) AS n_sh, COUNT(b.gsh) AS n_ov
          FROM fsh d LEFT JOIN bset b USING (gsh) GROUP BY d.doc_id
        ),
        contam AS (
          SELECT t.doc_id,
                 CASE WHEN COALESCE(ov.n_sh, 0) = 0 THEN CAST(0 AS DOUBLE)
                      ELSE ov.n_ov / CAST(ov.n_sh AS DOUBLE)
                 END AS overlap_ratio
          FROM ftoks t LEFT JOIN ov ON t.doc_id = ov.doc_id
        ),
        kept AS (
          SELECT t.doc_id, t.source, t.text,
                 {N_TOKENS_DUCK} AS n_tokens
          FROM ftoks t
          JOIN q USING (doc_id) JOIN rep USING (doc_id)
          JOIN contam USING (doc_id)
          WHERE {_u} < ({_rate})
            AND q.quality >= 0.3
            AND rep.dup_3gram_ratio <= 0.2
            AND contam.overlap_ratio <= 0.5
        ),
        packd AS (
          SELECT doc_id, text, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) - n_tokens AS tok_offset
          FROM kept
        ),
        man AS (
          SELECT ((({_sm_doch}) % {SHARD_COUNT}) + {SHARD_COUNT})
                   % {SHARD_COUNT} AS shard,
                 n_tokens AS _nt,
                 CAST(length(text) AS BIGINT) AS _nc,
                 {_sm_h} AS _h,
                 CAST(tok_offset // {PACK_BUDGET} AS BIGINT)
                   AS start_seq,
                 CAST(CASE WHEN n_tokens = 0
                      THEN tok_offset // {PACK_BUDGET}
                      ELSE (tok_offset + n_tokens - 1) // {PACK_BUDGET}
                      END AS BIGINT) AS end_seq
          FROM packd
        ),
        per AS (
          SELECT CAST(shard AS BIGINT) AS shard,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(_nt) AS BIGINT) AS n_tokens,
                 CAST(SUM(_nc) AS BIGINT) AS n_chars,
                 CAST(SUM(CAST(_h AS HUGEINT)) % 9223372036854775807
                   AS BIGINT) AS checksum
          FROM man GROUP BY shard
        ),
        seqs AS (
          SELECT CAST(shard AS BIGINT) AS shard,
                 CAST(COUNT(DISTINCT _seq) AS BIGINT)
                   AS n_seqs_touched
          FROM (
            SELECT shard,
                   UNNEST(generate_series(start_seq, end_seq)) AS _seq
            FROM man
          ) GROUP BY shard
        )
        SELECT shard, n_docs, n_tokens, n_chars, n_seqs_touched,
               checksum
        FROM per JOIN seqs USING (shard)
        """

    # --- round-11: bloom crawl-screen family ---------------------------

    from pennsieve_streaming_spark.llm.dedup import (
        CRAWL_BLOOM_M as _CR_M,
    )

    _cr_union = " UNION ".join(
        f"SELECT {_bl_pos('sh', i, _CR_M)} AS p FROM st_sh"
        for i in range(_BL_K)
    )
    _cr_test = " AND ".join(
        f"({_bl_pos('d.sh', i, _CR_M)}) IN (SELECT p FROM cpos)"
        for i in range(_BL_K)
    )
    _CR_SCREEN = f"""
        new_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        st_sh AS (
          SELECT DISTINCT s.sh FROM sh s
          JOIN (SELECT doc_id FROM documents WHERE source <> 'src0')
            USING (doc_id)
        ),
        cpos AS (SELECT DISTINCT p FROM ({_cr_union})),
        dsh AS (SELECT s.doc_id, s.sh FROM sh s JOIN new_ids USING (doc_id)),
        scr0 AS (
          SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
                 CAST(SUM(CASE WHEN {_cr_test} THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_bloom_hits
          FROM dsh d GROUP BY d.doc_id
        ),
        scr AS (
          SELECT n.doc_id,
                 COALESCE(s.n_shingles, CAST(0 AS BIGINT)) AS n_shingles,
                 COALESCE(s.n_bloom_hits, CAST(0 AS BIGINT))
                   AS n_bloom_hits,
                 CASE WHEN COALESCE(s.n_shingles, 0) = 0
                      THEN CAST(0 AS DOUBLE)
                      ELSE s.n_bloom_hits / CAST(s.n_shingles AS DOUBLE)
                 END AS bloom_ratio,
                 CASE WHEN COALESCE(s.n_shingles, 0) = 0 THEN false
                      ELSE (s.n_bloom_hits
                            / CAST(s.n_shingles AS DOUBLE)) >= 0.5
                 END AS flagged
          FROM new_ids n LEFT JOIN scr0 s USING (doc_id)
        )"""

    sql["doc_crawl_screen"] = f"""
        WITH {DOC_PRE},
        {_CR_SCREEN}
        SELECT doc_id, n_shingles, n_bloom_hits, bloom_ratio, flagged
        FROM scr
        """

    # stream flavor: stateless projection => the batch oracle gates
    # the stream verbatim
    sql["stream_crawl_screen"] = sql["doc_crawl_screen"]

    # screened exact audit: the containment join runs only for the
    # bloom-flagged delta docs; unflagged rows report the provably-
    # clean sentinels (verdicts identical to doc_incremental_dedup)
    sql["doc_incremental_dedup_screened"] = f"""
        WITH {DOC_PRE},
        {_CR_SCREEN},
        fl_sh AS (
          SELECT s.doc_id, s.sh FROM sh s
          JOIN (SELECT doc_id FROM scr WHERE flagged) USING (doc_id)
        ),
        old_sh AS (
          SELECT s.* FROM sh s
          JOIN (SELECT doc_id FROM documents WHERE source <> 'src0')
            USING (doc_id)
        ),
        ok AS (
          SELECT sh FROM old_sh GROUP BY sh
          HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        old_kept AS (
          SELECT o.doc_id, o.sh FROM old_sh o JOIN ok USING (sh)
        ),
        ints AS (
          SELECT n.doc_id, o.doc_id AS _old,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM fl_sh n JOIN old_kept o ON n.sh = o.sh
          GROUP BY n.doc_id, o.doc_id
        ),
        best AS (
          SELECT doc_id, _old AS best_match_id, inter FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY inter DESC, _old) AS _rk
            FROM ints
          ) WHERE _rk = 1
        )
        SELECT s.doc_id, s.n_shingles, s.n_bloom_hits, s.bloom_ratio,
               CAST(CASE WHEN s.flagged
                    THEN COALESCE(b.best_match_id, -1) ELSE -1 END
                 AS BIGINT) AS best_match_id,
               CAST(CASE WHEN s.flagged THEN COALESCE(b.inter, 0)
                    ELSE 0 END AS BIGINT) AS inter,
               CASE WHEN s.flagged AND s.n_shingles > 0
                    THEN COALESCE(b.inter, 0)
                         / CAST(s.n_shingles AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS containment,
               CASE WHEN s.flagged AND s.n_shingles > 0
                    THEN (COALESCE(b.inter, 0)
                          / CAST(s.n_shingles AS DOUBLE)) >= 0.5
                    ELSE false END AS is_dup
        FROM scr s LEFT JOIN best b USING (doc_id)
        """

    # per-lang novel-content mass of the crawl delta (the crawl KPI):
    # exact incremental-dedup verdicts joined with token masses
    sql["doc_crawl_gain"] = f"""
        WITH {DOC_PRE},
        new_ids AS (SELECT doc_id FROM documents WHERE source = 'src0'),
        new_sh AS (SELECT s.* FROM sh s JOIN new_ids USING (doc_id)),
        old_sh AS (
          SELECT s.* FROM sh s
          WHERE s.doc_id NOT IN (SELECT doc_id FROM new_ids)
        ),
        ok AS (
          SELECT sh FROM old_sh GROUP BY sh
          HAVING COUNT(*) <= {JACCARD_MAX_DF}
        ),
        old_kept AS (
          SELECT o.doc_id, o.sh FROM old_sh o JOIN ok USING (sh)
        ),
        sizes AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
          FROM new_sh GROUP BY doc_id
        ),
        ints AS (
          SELECT n.doc_id, o.doc_id AS _old,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM new_sh n JOIN old_kept o ON n.sh = o.sh
          GROUP BY n.doc_id, o.doc_id
        ),
        best AS (
          SELECT doc_id, MAX(inter) AS inter FROM ints GROUP BY doc_id
        ),
        dups AS (
          SELECT s.doc_id
          FROM sizes s LEFT JOIN best b USING (doc_id)
          WHERE s.n_shingles > 0
            AND COALESCE(b.inter, 0)
                / CAST(s.n_shingles AS DOUBLE) >= 0.5
        ),
        delta AS (
          SELECT doc_id, lang,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len({TOKS}) END AS BIGINT) AS n_tokens,
                 doc_id IN (SELECT doc_id FROM dups) AS is_dup
          FROM (SELECT d.doc_id, d.lang, d.text
                FROM documents d JOIN new_ids USING (doc_id))
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dups,
               CAST(SUM(CASE WHEN is_dup THEN 0 ELSE n_tokens END)
                 AS BIGINT) AS novel_tokens,
               CAST(SUM(CASE WHEN is_dup THEN n_tokens ELSE 0 END)
                 AS BIGINT) AS dup_tokens,
               round(CASE WHEN SUM(n_tokens) = 0 THEN CAST(0 AS DOUBLE)
                     ELSE SUM(CASE WHEN is_dup THEN 0 ELSE n_tokens END)
                          / CAST(SUM(n_tokens) AS DOUBLE) END, 9)
                 AS novelty_rate
        FROM delta GROUP BY lang
        """

    # per-channel ingest-completeness panel (operators/gaps.py
    # coverage_panel): exact integer day indexes / expected counts,
    # two fixed rounded divisions
    sql["ts_coverage_panel"] = with_views(
        """
        WITH base AS (
          SELECT channel, ts, ts // 86400000000 AS _day FROM samples
        ),
        pc AS (
          SELECT channel, MIN(ts) AS s, MAX(ts) AS e,
                 CAST(COUNT(*) AS BIGINT) AS n_samples
          FROM base GROUP BY channel
        ),
        dd AS (SELECT DISTINCT channel, _day FROM base),
        dg AS (
          SELECT channel, _day,
                 LAG(_day) OVER (PARTITION BY channel ORDER BY _day)
                   AS _prev
          FROM dd
        ),
        da AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS active_days,
                 CAST(MAX(CASE WHEN _prev IS NULL THEN 0
                          ELSE _day - _prev - 1 END) AS BIGINT)
                   AS max_outage_days
          FROM dg GROUP BY channel
        )
        SELECT p.channel,
               CAST(p.s // 86400000000 AS BIGINT) AS start_day,
               CAST(p.e // 86400000000 AS BIGINT) AS end_day,
               CAST(p.e // 86400000000 - p.s // 86400000000 + 1
                 AS BIGINT) AS span_days,
               a.active_days,
               round(a.active_days
                 / CAST(p.e // 86400000000 - p.s // 86400000000 + 1
                        AS DOUBLE), 9) AS day_coverage,
               p.n_samples,
               CAST((p.e - p.s) // 100000 + 1 AS BIGINT)
                 AS expected_samples,
               round(p.n_samples
                 / CAST((p.e - p.s) // 100000 + 1 AS DOUBLE), 9)
                 AS fill_ratio,
               a.max_outage_days
        FROM pc p JOIN da a USING (channel)
        """,
        "samples",
    )

    # loudness range of the lead lane (dsp/spectral.py
    # loudness_range): exact frame energies, integer percentile_disc
    # ranks, one dB finish in round(,9)
    sql["mm_audio_dynamics"] = with_views(
        """
        WITH s AS (
          SELECT channel, ts, value,
                 CAST(round(value * 1) AS BIGINT) AS xq
          FROM samples_aligned WHERE channel = 'lead'
        ),
        r AS (
          SELECT channel,
                 row_number() OVER (PARTITION BY channel
                   ORDER BY ts, value) - 1 AS _rn,
                 xq
          FROM s
        ),
        f AS (
          SELECT channel, _rn // 64 AS win,
                 CAST(COUNT(*) AS BIGINT) AS _n,
                 CAST(SUM(xq * xq) AS BIGINT) AS e
          FROM r GROUP BY channel, _rn // 64
        ),
        fk AS (SELECT * FROM f WHERE _n = 64),
        rk AS (
          SELECT channel, e,
                 row_number() OVER (PARTITION BY channel
                   ORDER BY e, win) AS _rk
          FROM fk
        ),
        np AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_frames
          FROM fk GROUP BY channel
        ),
        g AS (
          SELECT r.channel, MAX(n.n_frames) AS n_frames,
                 CAST(MAX(CASE WHEN _rk =
                   (1 * n.n_frames + 9) // 10 THEN e END) AS BIGINT)
                   AS e_p10,
                 CAST(MAX(CASE WHEN _rk =
                   (19 * n.n_frames + 19) // 20 THEN e END) AS BIGINT)
                   AS e_p95
          FROM rk r JOIN np n USING (channel) GROUP BY r.channel
        )
        SELECT channel, n_frames, e_p10, e_p95,
               CASE WHEN e_p10 > 0 AND e_p95 > 0 THEN
                 round(10e0 * log10(CAST(e_p95 AS DOUBLE)
                   / CAST(e_p10 AS DOUBLE)), 9) ELSE 0e0 END
                 AS dyn_range_db
        FROM g
        """,
        "samples_aligned",
    )

    # --- round-11 wave 2 ------------------------------------------------

    # per-channel empirical rate from gap order statistics
    # (operators/gaps.py rate_estimate): integer percentile_disc
    # picks, one fixed rounded division, flag on the rounded value
    sql["ts_rate_estimate"] = with_views(
        """
        WITH g0 AS (
          SELECT channel, ts, value,
                 LAG(ts) OVER (PARTITION BY channel
                   ORDER BY ts, value) AS _prev
          FROM samples
        ),
        gaps AS (
          SELECT channel, CAST(ts - _prev AS BIGINT) AS gap, ts, value
          FROM g0 WHERE _prev IS NOT NULL
        ),
        rk AS (
          SELECT channel, gap,
                 ROW_NUMBER() OVER (PARTITION BY channel
                   ORDER BY gap, ts, value) AS _rk
          FROM gaps
        ),
        np AS (
          SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_gaps
          FROM gaps GROUP BY channel
        ),
        g AS (
          SELECT r.channel, MAX(n.n_gaps) AS n_gaps,
                 CAST(MAX(CASE WHEN _rk = (1 * n.n_gaps + 9) // 10
                          THEN gap END) AS BIGINT) AS p10_gap_us,
                 CAST(MAX(CASE WHEN _rk = (n.n_gaps + 1) // 2
                          THEN gap END) AS BIGINT) AS median_gap_us,
                 CAST(MAX(CASE WHEN _rk = (9 * n.n_gaps + 9) // 10
                          THEN gap END) AS BIGINT) AS p90_gap_us
          FROM rk r JOIN np n USING (channel) GROUP BY r.channel
        )
        SELECT channel, n_gaps, p10_gap_us, median_gap_us, p90_gap_us,
               CAST(p90_gap_us - p10_gap_us AS BIGINT) AS jitter_us,
               CASE WHEN median_gap_us > 0 THEN
                 round(1000000e0 / CAST(median_gap_us AS DOUBLE), 9)
                 ELSE 0e0 END AS est_rate_hz,
               abs((CASE WHEN median_gap_us > 0 THEN
                 round(1000000e0 / CAST(median_gap_us AS DOUBLE), 9)
                 ELSE 0e0 END) - 10.0e0) <= 0.05e0 * 10.0e0 AS rate_ok
        FROM g
        """,
        "samples",
    )

    # Matryoshka prefix-dim recall: the gated exact-top-k replay on
    # both sides, prefix slices via DuckDB 1-based inclusive ranges
    sql["emb_matryoshka_recall"] = f"""
        WITH gt AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM (
              SELECT q.query_id, c.neighbor_id,
                     list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.v, c.v))) AS cosine
              FROM (SELECT vec_id AS query_id,
                           (CAST(embedding AS DOUBLE[])) AS qv
                    FROM embeddings WHERE vec_id < 20) q
              JOIN (SELECT vec_id AS neighbor_id,
                           (CAST(embedding AS DOUBLE[])) AS v
                    FROM embeddings) c
                ON q.query_id != c.neighbor_id
            )
          ) WHERE rank <= 5
        ),
        pre32 AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM (
              SELECT q.query_id, c.neighbor_id,
                     list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.v, c.v))) AS cosine
              FROM (SELECT vec_id AS query_id,
                           (CAST(embedding AS DOUBLE[]))[1:32] AS qv
                    FROM embeddings WHERE vec_id < 20) q
              JOIN (SELECT vec_id AS neighbor_id,
                           (CAST(embedding AS DOUBLE[]))[1:32] AS v
                    FROM embeddings) c
                ON q.query_id != c.neighbor_id
            )
          ) WHERE rank <= 5
        ),
        pre16 AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM (
              SELECT q.query_id, c.neighbor_id,
                     list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.v, c.v))) AS cosine
              FROM (SELECT vec_id AS query_id,
                           (CAST(embedding AS DOUBLE[]))[1:16] AS qv
                    FROM embeddings WHERE vec_id < 20) q
              JOIN (SELECT vec_id AS neighbor_id,
                           (CAST(embedding AS DOUBLE[]))[1:16] AS v
                    FROM embeddings) c
                ON q.query_id != c.neighbor_id
            )
          ) WHERE rank <= 5
        )
        
          SELECT CAST(32 AS BIGINT) AS prefix_dim,
                 CAST(COUNT(*) AS BIGINT) AS n_queries,
                 round(SUM(n_hit) / CAST(COUNT(*) * 5 AS DOUBLE), 9)
                   AS mean_recall,
                 round(MIN(n_hit) / CAST(5 AS DOUBLE), 9)
                   AS min_recall
          FROM (
            SELECT g.query_id,
                   CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hit
            FROM gt g LEFT JOIN pre32 p
              ON g.query_id = p.query_id
             AND g.neighbor_id = p.neighbor_id
            GROUP BY g.query_id
          )
        UNION ALL
        
          SELECT CAST(16 AS BIGINT) AS prefix_dim,
                 CAST(COUNT(*) AS BIGINT) AS n_queries,
                 round(SUM(n_hit) / CAST(COUNT(*) * 5 AS DOUBLE), 9)
                   AS mean_recall,
                 round(MIN(n_hit) / CAST(5 AS DOUBLE), 9)
                   AS min_recall
          FROM (
            SELECT g.query_id,
                   CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hit
            FROM gt g LEFT JOIN pre16 p
              ON g.query_id = p.query_id
             AND g.neighbor_id = p.neighbor_id
            GROUP BY g.query_id
          )
        """

    return sql


def _dbl(v: float) -> str:
    """Render a double so DuckDB parses it as DOUBLE (bare decimal
    literals become exact DECIMALs, whose arithmetic diverges from
    IEEE doubles at the last ulp)."""
    s = repr(float(v))
    return s if ("e" in s or "E" in s) else s + "e0"


def _ivf_cent_fragments() -> tuple[str, str]:
    """Shared IVF oracle fragments: (VALUES rows for the literal
    centroid table, the |v|² - 2v·c + |c|² distance template) — one
    source of truth for emb_ann_ivf and the composed emb_ann_ivf_pq."""
    from pennsieve_streaming_spark.llm.similarity import golden_centroids

    cents = golden_centroids(IVF_LISTS, ANN_DIM)
    rows = ", ".join(
        f"({i}, [{', '.join(_dbl(x) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    d2 = (
        "list_dot_product({v}, {v}) - 2.0e0 * list_dot_product({v}, t.c) "
        "+ list_dot_product(t.c, t.c)"
    )
    return rows, d2


def _pq_fragments() -> tuple[str, str, str]:
    """Shared PQ oracle fragments: (codebook literal, per-code distance
    list expr over `v`, the same over `q`) — one source of truth for
    emb_ann_pq and the composed emb_ann_ivf_pq. Sequential list_reduce
    folds mirror Spark's aggregate() exactly."""
    from pennsieve_streaming_spark.llm.similarity import golden_codebooks

    subdim = ANN_DIM // PQ_M
    cbs = golden_codebooks(PQ_M, PQ_CODES, subdim)
    cb_lit = (
        "["
        + ", ".join(
            "[" + ", ".join(
                "[" + ", ".join(_dbl(x) for x in code) + "]" for code in sub
            ) + "]"
            for sub in cbs
        )
        + "]"
    )
    dist = (
        f"list_reduce(list_transform(generate_series(1, {subdim}), "
        f"j -> (v[s * {subdim} + j] - cb[s + 1][c + 1][j])"
        f" * (v[s * {subdim} + j] - cb[s + 1][c + 1][j])), (a, b) -> a + b)"
    )
    dists = f"list_transform(generate_series(0, {PQ_CODES - 1}), c -> {dist})"
    qdist = dist.replace("v[", "q[")
    return cb_lit, dists, qdist


def _kmeans_oracle_sql(n_iter: int = 2) -> str:
    """Replay kmeans_fit + kmeans_assign: golden init, then per
    iteration an argmin assignment and per-dim rounded means (round to
    9 decimals on BOTH engines kills reduction-order float noise, so
    the centroid matrices are bit-identical). Empty clusters keep the
    previous centroid via the left-join COALESCE."""
    rows, d2 = _ivf_cent_fragments()
    parts = [
        f"WITH cents0 AS (SELECT * FROM (VALUES {rows}) t(list_id, c)),",
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
    ]
    for i in range(n_iter):
        parts.append(f"""
        d{i} AS (
          SELECT e.vec_id, t.list_id, {d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents{i} t
        ),
        a{i} AS (
          SELECT vec_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM d{i}
          ) WHERE rn = 1
        ),
        m{i} AS (
          SELECT list_id, j, round(AVG(x), 9) AS m
          FROM (
            SELECT a{i}.list_id, unnest(e.v) AS x,
                   unnest(generate_series(1, {ANN_DIM})) AS j
            FROM a{i} JOIN emb e USING (vec_id)
          ) GROUP BY list_id, j
        ),
        cents{i + 1} AS (
          SELECT c.list_id, COALESCE(mm.c, c.c) AS c
          FROM cents{i} c LEFT JOIN (
            SELECT list_id, list(m ORDER BY j) AS c FROM m{i} GROUP BY list_id
          ) mm USING (list_id)
        ),""")
    parts.append(f"""
        dfin AS (
          SELECT e.vec_id, t.list_id, {d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents{n_iter} t
        )
        SELECT vec_id AS id, CAST(list_id AS BIGINT) AS list_id FROM (
          SELECT vec_id, list_id,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
          FROM dfin
        ) WHERE rn = 1
        """)
    return "\n".join(parts)


def _ivf_oracle_sql() -> str:
    """Replay the IVF pipeline: literal centroids, argmin list
    assignment via |v|² - 2v·c + |c|² (the same dot-product folds the
    Spark side uses), n_probe lists per query, exact cosine in-list."""
    rows, d2 = _ivf_cent_fragments()
    return f"""
        WITH cents AS (SELECT * FROM (VALUES {rows}) t(list_id, c)),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        assigned AS (
          SELECT vec_id AS neighbor_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        qlists AS (
          SELECT vec_id AS query_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists WHERE vec_id < 20
          ) WHERE rn <= {IVF_PROBE}
        ),
        scored AS (
          SELECT q.query_id, a.neighbor_id,
                 list_dot_product(qv.v, cv.v)
                   / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cosine
          FROM qlists q
          JOIN assigned a ON q.list_id = a.list_id AND q.query_id != a.neighbor_id
          JOIN emb qv ON qv.vec_id = q.query_id
          JOIN emb cv ON cv.vec_id = a.neighbor_id
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {ANN_K}
        """


def _pq_oracle_sql() -> str:
    """Replay PQ encode (per-subspace argmin over the literal codebook)
    and ADC scoring in DuckDB. Sequential list_reduce folds mirror
    Spark's aggregate() exactly (0 + t1 + ... == t1 + t2 + ...)."""
    cb_lit, dists, qdist = _pq_fragments()
    return f"""
        WITH cbt AS (SELECT {cb_lit} AS cb),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        enc AS (
          SELECT vec_id AS neighbor_id,
                 list_transform(generate_series(0, {PQ_M - 1}), s ->
                   list_indexof({dists}, list_min({dists})) - 1) AS codes
          FROM emb CROSS JOIN cbt
        ),
        qlut AS (
          SELECT vec_id AS query_id,
                 list_transform(generate_series(0, {PQ_M - 1}), s ->
                   list_transform(generate_series(0, {PQ_CODES - 1}), c -> {qdist})) AS lut
          FROM (SELECT vec_id, v AS q FROM emb WHERE vec_id < 20) CROSS JOIN cbt
        ),
        scored AS (
          SELECT query_id, neighbor_id,
                 list_reduce(list_transform(generate_series(1, {PQ_M}),
                   s -> lut[s][codes[s] + 1]), (a, b) -> a + b) AS adc_dist
          FROM enc CROSS JOIN qlut WHERE query_id != neighbor_id
        )
        SELECT query_id, neighbor_id, rank, adc_dist FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adc_dist, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {ANN_K}
        """


def _pq_distortion_oracle_sql() -> str:
    """Replay the per-subspace nearest-codeword squared error over the
    same _pq_fragments distance lists, 1e-9-quantized before the exact
    per-subspace sum (mirrors llm/similarity.pq_distortion)."""
    cb_lit, dists, _ = _pq_fragments()
    return f"""
        WITH cbt AS (SELECT {cb_lit} AS cb),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        per AS (
          SELECT ss.s AS subspace,
                 CAST(round(list_min({dists}) * 1000000000) AS BIGINT)
                   AS errq
          FROM emb CROSS JOIN cbt
          CROSS JOIN (SELECT UNNEST(generate_series(0, {PQ_M - 1})) AS s)
            ss
        )
        SELECT CAST(subspace AS BIGINT) AS subspace,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(errq) AS BIGINT) AS sum_errq,
               round(CAST(SUM(errq) AS DOUBLE)
                     / (CAST(COUNT(*) AS DOUBLE) * 1000000000), 9) AS mse
        FROM per GROUP BY subspace
        """


def _ivf_pq_oracle_sql() -> str:
    """Replay the composed IVF-PQ pipeline: golden-centroid coarse
    assignment (same d2 algebra as emb_ann_ivf), golden-codebook PQ
    encode + per-query LUT (same construction as emb_ann_pq), ADC
    scoring restricted to the n_probe probed lists. All SQL fragments
    come from the same builders as the stage oracles, so the
    composition cannot drift from the stages it mirrors."""
    rows, d2 = _ivf_cent_fragments()
    cb_lit, dists, qdist = _pq_fragments()
    return f"""
        WITH cents AS (SELECT * FROM (VALUES {rows}) t(list_id, c)),
        cbt AS (SELECT {cb_lit} AS cb),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        dists AS (
          SELECT e.vec_id, t.list_id, {d2.format(v='e.v')} AS d2
          FROM emb e CROSS JOIN cents t
        ),
        assigned AS (
          SELECT vec_id AS neighbor_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists
          ) WHERE rn = 1
        ),
        enc AS (
          SELECT vec_id AS neighbor_id,
                 list_transform(generate_series(0, {PQ_M - 1}), s ->
                   list_indexof({dists}, list_min({dists})) - 1) AS codes
          FROM emb CROSS JOIN cbt
        ),
        qlists AS (
          SELECT vec_id AS query_id, list_id FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rn
            FROM dists WHERE vec_id < 20
          ) WHERE rn <= {IVFPQ_PROBE}
        ),
        qlut AS (
          SELECT vec_id AS query_id,
                 list_transform(generate_series(0, {PQ_M - 1}), s ->
                   list_transform(generate_series(0, {PQ_CODES - 1}), c -> {qdist})) AS lut
          FROM (SELECT vec_id, v AS q FROM emb WHERE vec_id < 20) CROSS JOIN cbt
        ),
        scored AS (
          SELECT ql.query_id, a.neighbor_id,
                 list_reduce(list_transform(generate_series(1, {PQ_M}),
                   s -> lut[s][e.codes[s] + 1]), (a2, b2) -> a2 + b2) AS adc_dist
          FROM qlists ql
          JOIN assigned a ON ql.list_id = a.list_id AND ql.query_id != a.neighbor_id
          JOIN enc e ON e.neighbor_id = a.neighbor_id
          JOIN qlut u ON u.query_id = ql.query_id
        )
        SELECT query_id, neighbor_id, rank, adc_dist FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY adc_dist, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {ANN_K}
        """


def _butterworth_oracle_sql() -> str:
    """Replay apply_filter's exact recurrence in DuckDB: reflected
    prewarm (first pad samples reversed, output discarded) followed by
    the DF2T biquad cascade, one recursion step per sample. Bit-exact
    vs the engine (same IEEE ops in the same order)."""
    from pennsieve_streaming_spark.dsp.butterworth import (
        butter_sos,
        filter_transient_length,
    )

    sos = butter_sos(BW_ORDER, BW_FREQ, BW_RATE, BW_TYPE)
    assert sos.shape == (2, 6), "oracle encodes a 2-section cascade"
    pad = filter_transient_length(BW_ORDER, BW_FREQ, BW_RATE)
    (b10, b11, b12, _, a11, a12), (b20, b21, b22, _, a21, a22) = sos
    y1 = f"({_dbl(b10)}*s.x + r.z10)"
    y2 = f"({_dbl(b20)}*{y1} + r.z20)"
    return f"""
        WITH RECURSIVE samples_aligned AS ({TBL.DUCKDB_VIEWS['samples_aligned']}),
        inp AS (
          SELECT ts, value, ROW_NUMBER() OVER (ORDER BY ts) - 1 AS pos
          FROM samples_aligned WHERE channel = 'lead' AND ts <= {BW_TS_END}
        ),
        seq AS (
          SELECT CAST({pad} - 1 - pos AS BIGINT) AS i, value AS x
          FROM inp WHERE pos < {pad}
          UNION ALL
          SELECT CAST(pos + {pad} AS BIGINT) AS i, value AS x FROM inp
        ),
        rec AS (
          SELECT CAST(-1 AS BIGINT) AS i, 0e0 AS z10, 0e0 AS z11,
                 0e0 AS z20, 0e0 AS z21, 0e0 AS y
          UNION ALL
          SELECT s.i,
                 {_dbl(b11)}*s.x - {_dbl(a11)}*{y1} + r.z11,
                 {_dbl(b12)}*s.x - {_dbl(a12)}*{y1},
                 {_dbl(b21)}*{y1} - {_dbl(a21)}*{y2} + r.z21,
                 {_dbl(b22)}*{y1} - {_dbl(a22)}*{y2},
                 {y2}
          FROM rec r JOIN seq s ON s.i = r.i + 1
        )
        SELECT 'lead' AS channel, inp.ts AS ts, rec.y AS value
        FROM rec JOIN inp ON rec.i = inp.pos + {pad}
        """
