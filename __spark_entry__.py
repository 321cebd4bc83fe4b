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
    return ev.withColumn("idx", F.row_number().over(w) - F.lit(1))


def q_epoch_rebase(spark, sf_dir):
    s = TBL.samples_view(spark, sf_dir)
    w = Window.partitionBy("channel")
    rebased = s.withColumn("rts", F.col("ts") - F.min("ts").over(w))
    return rebased.groupBy("channel").agg(
        F.max("rts").alias("max_rebased_ts"),
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


def q_cut_resample(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    arrays = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_extendedprice"))),
            lambda s: s["l_extendedprice"],
        ).alias("waveform")
    ).select(
        F.lit("w").alias("channel"), F.col("l_orderkey").alias("spike_ts"), "waveform"
    )
    return resample_arrays_minmax(arrays, CUT_CHUNKS).select(
        "spike_ts", "bucket", "min_val", "max_val"
    )


def q_realtime_resample(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    segs = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "l_extendedprice"))),
            lambda s: s["l_extendedprice"],
        ).alias("data")
    ).select(
        F.concat(F.lit("rt"), (F.col("l_orderkey") % 4).cast("string")).alias("channel"),
        (F.col("l_orderkey") * 1_000_000).alias("start_ts"),
        (F.lit(75_000.0) * (F.lit(1) + F.col("l_orderkey") % 3)).alias("sample_period"),
        "data",
    )
    return resample_ingest_segments(segs, RT_PIXEL_US)


def q_event_summary_datadriven(spark, sf_dir):
    ev = TBL.chan_events_view(spark, sf_dir)
    return event_summary_data_driven(
        ev, EV_START, EV_END, PIXEL_EV_US, order_cols=("ts", "value")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ts_window_query": q_window,
        "ts_window_limit0": q_window_limit0,
        "ts_minmax_downsample_time": q_downsample_time,
        "ts_minmax_downsample_count": q_downsample_count,
        "ts_fill_gaps": q_fill_gaps,
        "ts_gap_spans": q_gap_spans,
        "ts_sequence_numbering": q_sequence_numbering,
        "ts_montage": q_montage,
        "ts_event_summary": q_event_summary,
        "ts_event_summary_datadriven": q_event_summary_datadriven,
        "ts_event_index": q_event_index,
        "ts_epoch_rebase": q_epoch_rebase,
        "ts_channels_catalog": q_channels_catalog,
        "ts_resample_decision": q_resample_decision,
        "ts_cut_resample": q_cut_resample,
        "ts_realtime_resample": q_realtime_resample,
    }


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

    sql["ts_sequence_numbering"] = with_views(
        f"""
        SELECT channel, span_lo, span_hi, n_segments,
               ROW_NUMBER() OVER (PARTITION BY channel ORDER BY span_lo) - 1 AS sequence_id,
               COUNT(*) OVER (PARTITION BY channel) AS total_requests
        FROM ({_gap_spans})
        """,
        "chan_events",
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
                 CAST(FLOOR((end_ts - start_ts) / {RT_PIXEL_US} + 0.5e0) AS BIGINT) AS chunk_count
          FROM seg2
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

    return sql
