"""SQL surface: the engine's derived tables as Spark temp views.

A user who lives in SQL (BI tools, notebooks, `spark.sql`) should not
need the Python API to reach the engine's data model. ``register_views``
publishes the derived views (samples, channels, chan_events, aligned
leads) and the raw corpus tables under one optional prefix; after that
every operator input is addressable as a plain table and arbitrary
ANSI SQL composes with the engine's DataFrames (temp views and
DataFrames share the same Catalyst catalog, so mixing them costs
nothing).

Views are lazy — registration does not scan anything; Catalyst prunes
and pushes down through them exactly as it does through the DataFrame
API (same logical plans underneath).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from pennsieve_streaming_spark import tables as TBL

RAW_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register the engine's derived + raw tables as temp views.
    Returns the registered view names."""
    names: list[str] = []

    def add(name: str, df) -> None:
        df.createOrReplaceTempView(prefix + name)
        names.append(prefix + name)

    add("samples", TBL.samples_view(spark, sf_dir))
    add("channels", TBL.channels_view(spark, sf_dir))
    add("chan_events", TBL.chan_events_view(spark, sf_dir))
    add("samples_aligned", TBL.samples_aligned_view(spark, sf_dir))
    for t in RAW_TABLES:
        p = posixpath.join(sf_dir, f"{t}.parquet")
        # Attempt the read rather than os.path.exists: sf_dir may be a
        # remote URI (s3://, hdfs://) that Spark can read but the local
        # filesystem cannot see. PATH_NOT_FOUND surfaces as
        # AnalysisException; missing optional tables are skipped either
        # way.
        try:
            df = spark.read.parquet(p)
            df.schema  # force resolution so a missing path raises here
        except AnalysisException:
            continue
        add(t, df)
    return names


def register_operator_views(
    spark: SparkSession,
    sf_dir: str,
    prefix: str = "",
    ltob_bucket_samples: int = 16,
    sax_window_samples: int = 64,
    sax_segments: int = 8,
    welch_freqs_hz: tuple[float, ...] = (1.0, 2.0, 4.0),
    welch_rate_hz: float = 256.0,
    welch_window_samples: int = 64,
    asof_probe_events: bool = True,
) -> list[str]:
    """Register the derived-OPERATOR results as temp views, so a SQL
    user can query LTOB/SAX/Welch/as-of outputs without touching the
    Python API: ``SELECT * FROM ltob WHERE channel = 'ch3'``.

    Parameterized operators get one view at the given defaults; other
    parameterizations compose in Python and register the same way
    (views are lazy logical plans — registering costs nothing, and
    Catalyst prunes/pushes down through them exactly as through the
    DataFrame API; the plan test pins that for the window-free paths).

    Views: ``ltob`` (downsample_ltob), ``sax`` (sax_words),
    ``sax_motifs`` (sax_motifs), ``welch`` (welch_psd),
    ``trend_segments`` (4-week OLS trends), and — when
    ``asof_probe_events`` — ``asof_events`` (each channel-mapped
    event joined as-of against the sample feed).
    """
    from pennsieve_streaming_spark.dsp.spectral import welch_psd
    from pennsieve_streaming_spark.operators.align import asof_join
    from pennsieve_streaming_spark.operators.downsample import (
        downsample_ltob,
    )
    from pennsieve_streaming_spark.operators.sax import sax_motifs, sax_words
    from pennsieve_streaming_spark.operators.stats import trend_segments

    names: list[str] = []

    def add(name: str, df) -> None:
        df.createOrReplaceTempView(prefix + name)
        names.append(prefix + name)

    samples = TBL.samples_view(spark, sf_dir)
    add("ltob", downsample_ltob(samples, ltob_bucket_samples))
    add("sax", sax_words(samples, sax_window_samples, sax_segments))
    add(
        "sax_motifs",
        sax_motifs(samples, sax_window_samples, sax_segments),
    )
    add(
        "trend_segments",
        trend_segments(samples, 28 * 86_400_000_000, 86_400_000_000),
    )
    add(
        "welch",
        welch_psd(samples, welch_freqs_hz, welch_rate_hz, welch_window_samples),
    )
    if asof_probe_events:
        ev = TBL.chan_events_view(spark, sf_dir)
        probes = ev.select(
            "channel", F.col("ts"), F.col("ts").alias("event_ts")
        )
        uniq = samples.groupBy("channel", "ts").agg(
            F.max("value").alias("value")
        )
        add("asof_events", asof_join(uniq, probes, payload_cols=("event_ts",)))

    # round-6c operator views (same lazy-logical-plan contract)
    from pennsieve_streaming_spark.operators.bursts import kleinberg_bursts
    from pennsieve_streaming_spark.operators.dtw import (
        dtw_channel_distances,
    )
    from pennsieve_streaming_spark.operators.stats import (
        ar2_yule_walker,
        sample_entropy,
        seasonal_decompose,
    )

    add("sample_entropy", sample_entropy(samples))
    add("dtw_distances", dtw_channel_distances(samples))
    add("event_bursts", kleinberg_bursts(TBL.chan_events_view(spark, sf_dir)))
    grid = TBL.locf_day_grid(spark, sf_dir)
    add("ar2", ar2_yule_walker(grid))
    add("seasonal", seasonal_decompose(grid, 86_400 * 1_000_000))

    # round-6e operator views
    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram
    from pennsieve_streaming_spark.operators.stats import (
        higher_moments,
        lz_complexity,
        permutation_entropy,
    )

    add("perm_entropy", permutation_entropy(samples))
    add("lz_complexity", lz_complexity(samples))
    add("higher_moments", higher_moments(samples))
    add("periodogram", uneven_periodogram(samples))

    # round-7 operator views
    from pennsieve_streaming_spark.operators.analytics import (
        circadian_rhythm,
        new_vs_returning,
        survival_km,
    )
    from pennsieve_streaming_spark.operators.stats import (
        hampel_despike,
        haar_denoise,
        higuchi_fd,
        theil_sen_slope,
    )

    add("higuchi", higuchi_fd(samples))
    # pinned=False: view registration must stay a lazy logical plan
    # (an eager pin would run jobs at registration time)
    add("hampel", hampel_despike(samples, pinned=False))
    add("haar_denoised", haar_denoise(samples))
    add("theil_sen", theil_sen_slope(grid, 86_400 * 1_000_000))
    # the user-dimension views need the raw events table; a partial
    # sf_dir without it simply skips them
    try:
        raw = spark.read.parquet(posixpath.join(sf_dir, "events.parquet"))
        raw.schema
    except AnalysisException:
        raw = None
    if raw is not None:
        ev = raw.select(
            TBL.epoch_micros_col(raw, "ts").alias("ts"), "user_id"
        )
        add("survival", survival_km(ev))
        add("circadian", circadian_rhythm(ev))
        add("new_vs_returning", new_vs_returning(ev))

    # round-7 LLM-pipeline views (VERDICT r7 item 6): triangles over
    # the LSH-verified near-dup graph, binary-quantization top-k, CDC
    # chunk fingerprints, binned mutual information. Same lazy
    # logical-plan contract; a partial sf_dir without the documents /
    # embeddings tables simply skips the views that need them.
    from pennsieve_streaming_spark.llm.dedup import (
        cdc_chunks,
        jaccard_pairs,
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_wide,
        shingles,
    )
    from pennsieve_streaming_spark.llm.graph import triangle_counts
    from pennsieve_streaming_spark.llm.similarity import (
        binary_hamming_topk,
    )
    from pennsieve_streaming_spark.operators.stats import (
        mutual_information,
    )

    add("mutual_info", mutual_information(grid, 8, 100))
    try:
        docs = spark.read.parquet(
            posixpath.join(sf_dir, "documents.parquet")
        )
        docs.schema
    except AnalysisException:
        docs = None
    if docs is not None:
        sh = shingles(docs)
        pairs = jaccard_pairs(
            sh,
            candidates=lsh_candidate_pairs(
                lsh_band_keys(minhash_wide(sh)), max_bucket_size=50
            ),
        ).filter(F.col("jaccard") >= 0.5)
        add("dup_triangles", triangle_counts(pairs))
        add("cdc_chunks", cdc_chunks(docs))
    try:
        embs = spark.read.parquet(
            posixpath.join(sf_dir, "embeddings.parquet")
        )
        embs.schema
    except AnalysisException:
        embs = None
    if embs is not None:
        add(
            "bq_topk",
            binary_hamming_topk(
                embs,
                embs.filter(F.col("vec_id") < 20),
                k=5,
                refine_k=20,
                dim=64,
            ),
        )

    # round-8 wave-5/6 views: the trend-test pair on the day grid,
    # the Benford screen and Bollinger event detector on the raw
    # feed, the Gopher/lexical curation panels, the TwoNN dimension
    # estimate. Same lazy logical-plan contract.
    from pennsieve_streaming_spark.llm.curation import (
        gopher_quality_filters,
    )
    from pennsieve_streaming_spark.llm.similarity import (
        twonn_intrinsic_dim,
    )
    from pennsieve_streaming_spark.llm.text import lexical_diversity
    from pennsieve_streaming_spark.operators.stats import (
        benford_digits,
        bollinger_breaks,
        mann_kendall,
        turning_points,
    )

    add("mann_kendall", mann_kendall(grid, 100))
    add("turning_points", turning_points(grid, 100))
    add("benford", benford_digits(samples, 100))
    add("bollinger_breaks", bollinger_breaks(samples, 20, 2, 100))
    if docs is not None:
        add("gopher_quality", gopher_quality_filters(docs))
        add("lexical_diversity", lexical_diversity(docs))
    if embs is not None:
        add(
            "intrinsic_dim",
            twonn_intrinsic_dim(
                embs, embs.filter(F.col("vec_id") < 20)
            ),
        )
    return names
