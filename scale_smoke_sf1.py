#!/usr/bin/env python
"""sf1-equivalent scale smoke: replicate the sf0.1 inputs 10x and run
the heaviest headline queries (LSH pairs, realtime resample, cosine
top-k) plus the round-6b heavy additions (source-KL over a 10x token
stream, RFM over 10x users through three two-phase ranks, the Granger
screen over a 10x-density LOCF grid), printing per-query seconds and
asserting the plan shapes stayed the intended ones (no cartesian,
broadcast query side, capped LSH buckets). Timings for operators with
eager localCheckpoint stages include construction.

The driver testdata tops out at sf0.1, so the 10x factor comes from
replicating rows with shifted keys — documents get a per-replica
token prefix (so the corpus is near-dup-rich rather than 10 exact
copies, which exercises both the banded join AND the hot-bucket cap),
embeddings keep their vectors under shifted vec_ids (the query side
stays replica 0, so top-k scans a 10x corpus), and lineitem orders
shift l_orderkey (10x channels x positions for the ingest resample).

Run: python scale_smoke_sf1.py   (~a few minutes on local[32])
Output: one JSON line {"queries": {...}, "factor": 10, "sf_base": 0.1}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pennsieve_streaming_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
ID_STRIDE = 10_000_000


def _replicate(df, id_cols, factor):
    """Union ``factor`` shifted copies via a 1-col range crossJoin
    (broadcast scalar grid — the narrow replication idiom, no driver
    loop)."""
    reps = df.sparkSession.range(factor).select(F.col("id").alias("_rep"))
    out = df.crossJoin(F.broadcast(reps))
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * ID_STRIDE)
    return out


def _force(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> None:
    spark = get_spark("pss-scale-smoke")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    results: dict[str, float] = {}
    plans: dict[str, str] = {}

    # --- doc_minhash_lsh_pairs at 10x ------------------------------------
    from pennsieve_streaming_spark.llm import (
        jaccard_pairs,
        lsh_band_keys,
        lsh_candidate_pairs,
        minhash_wide,
        shingles,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs10 = _replicate(docs, ["doc_id"], FACTOR).withColumn(
        "text", F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit(" "), "text")
    ).drop("_rep")
    sh = shingles(docs10).cache()
    cands = lsh_candidate_pairs(
        lsh_band_keys(minhash_wide(sh)), max_bucket_size=50
    ).cache()
    t0 = time.monotonic()
    n_cands = cands.count()
    verified = jaccard_pairs(sh, candidates=cands)
    results["doc_minhash_lsh_pairs"] = (time.monotonic() - t0) + _force(verified)
    plans["doc_minhash_lsh_pairs"] = _plan(verified)

    # --- doc_graph_triangles at 10x (r8: post-fix, VERDICT item 8) -------
    from pennsieve_streaming_spark.llm.graph import triangle_counts

    tri = triangle_counts(verified.filter(F.col("jaccard") >= 0.5))
    results["doc_graph_triangles"] = _force(tri)
    plans["doc_graph_triangles"] = _plan(tri)
    sh.unpersist()
    cands.unpersist()

    # --- ts_realtime_resample at 10x -------------------------------------
    from pyspark.sql import Window

    from pennsieve_streaming_spark.operators.realtime import (
        resample_ingest_positions,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li10 = _replicate(li, ["l_orderkey"], FACTOR).drop("_rep")
    wo = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_extendedprice"
    )
    wc = Window.partitionBy("l_orderkey")
    pos = li10.select(
        "l_orderkey",
        F.col("l_extendedprice").alias("v"),
        F.row_number().over(wo).alias("pos"),
        F.count(F.lit(1)).over(wc).alias("m"),
    ).select(
        F.concat(F.lit("rt"), (F.col("l_orderkey") % 4).cast("string")).alias(
            "channel"
        ),
        (F.col("l_orderkey") * 1_000_000).alias("start_ts"),
        (F.lit(75_000.0) * (F.lit(1) + F.col("l_orderkey") % 3)).alias(
            "sample_period"
        ),
        "pos",
        "m",
        "v",
    )
    rt = resample_ingest_positions(pos, 250_000)
    results["ts_realtime_resample"] = _force(rt)
    plans["ts_realtime_resample"] = _plan(rt)

    # --- emb_cosine_topk at 10x ------------------------------------------
    from pennsieve_streaming_spark.llm.similarity import cosine_topk

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    embs10 = _replicate(embs, ["vec_id"], FACTOR).drop("_rep")
    topk = cosine_topk(embs10, embs10.filter(F.col("vec_id") < 20), k=5)
    results["emb_cosine_topk"] = _force(topk)
    plans["emb_cosine_topk"] = _plan(topk)

    # --- doc_source_kl at 10x (token stream 10x, one pinned pass) ---------
    from pennsieve_streaming_spark.llm.curation import source_kl_divergence

    docs10b = _replicate(docs, ["doc_id"], FACTOR).withColumn(
        "text",
        F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit(" "), "text"),
    ).drop("_rep")
    t0 = time.monotonic()  # localCheckpoint materializes eagerly
    kl = source_kl_divergence(docs10b)
    results["doc_source_kl"] = (time.monotonic() - t0) + _force(kl)
    plans["doc_source_kl"] = _plan(kl)

    # --- ev_rfm at 10x users (three two-phase rank passes) ----------------
    from pennsieve_streaming_spark.operators.analytics import rfm_scores
    from pennsieve_streaming_spark import tables as TBL

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev10 = _replicate(ev, ["user_id", "event_id"], FACTOR).drop("_rep")
    t0 = time.monotonic()  # three eager global_rank checkpoints
    rfm = rfm_scores(
        ev10.select(
            TBL.epoch_micros_col(ev10, "ts").alias("ts"), "user_id", "value"
        )
    )
    results["ev_rfm"] = (time.monotonic() - t0) + _force(rfm)
    plans["ev_rfm"] = _plan(rfm)

    # --- ts_granger_screen at 10x sample density --------------------------
    from pennsieve_streaming_spark.operators.align import asof_locf
    from pennsieve_streaming_spark.operators.stats import granger_screen

    day = 86_400_000_000
    s10 = (
        TBL.samples_view(spark, SF_DIR)
        .crossJoin(F.broadcast(
            spark.range(FACTOR).select(F.col("id").alias("_rep"))
        ))
        .select("channel", (F.col("ts") + F.col("_rep")).alias("ts"), "value")
    )
    ch = TBL.channels_view(spark, SF_DIR)
    bounds = ch.agg(F.max("start_ts").alias("lo"), F.min("end_ts").alias("hi"))
    grid_ts = bounds.select(
        F.explode(
            F.expr(f"sequence(((lo + {day} - 1) div {day}) * {day}, hi, {day})")
        ).alias("ts")
    )
    grid = ch.select("channel").crossJoin(F.broadcast(grid_ts))
    t0 = time.monotonic()  # eager grid/LOCF checkpoint
    gr = granger_screen(asof_locf(s10, grid).select("channel", "ts", "value"), day, 100)
    results["ts_granger_screen"] = (time.monotonic() - t0) + _force(gr)
    plans["ts_granger_screen"] = _plan(gr)

    # --- doc_novelty at 10x (first-occurrence join over 10x shingles) -----
    from pennsieve_streaming_spark.llm.dedup import shingle_novelty

    nov = shingle_novelty(docs10)
    results["doc_novelty"] = _force(nov)
    plans["doc_novelty"] = _plan(nov)

    # --- ts_sample_entropy at 10x sample density --------------------------
    from pennsieve_streaming_spark.operators.stats import sample_entropy

    se = sample_entropy(s10, 128, 2, 0.2, 100)
    results["ts_sample_entropy"] = _force(se)
    plans["ts_sample_entropy"] = _plan(se)

    # --- ts_lz_complexity at 10x sample density ----------------------------
    from pennsieve_streaming_spark.operators.stats import lz_complexity

    lz = lz_complexity(s10, 128, 100)
    results["ts_lz_complexity"] = _force(lz)
    plans["ts_lz_complexity"] = _plan(lz)

    # --- mm_video_scene_cuts at 10x clips (codec-bound mapInPandas) -------
    from pennsieve_streaming_spark.llm.video import scene_cut_synthetic

    cuts = scene_cut_synthetic(docs10.select("doc_id"))
    results["mm_video_scene_cuts"] = _force(cuts)
    plans["mm_video_scene_cuts"] = _plan(cuts)

    # --- ts_uneven_periodogram at 10x sample density -----------------------
    from pennsieve_streaming_spark.dsp.spectral import uneven_periodogram

    pg = uneven_periodogram(s10)
    results["ts_uneven_periodogram"] = _force(pg)
    plans["ts_uneven_periodogram"] = _plan(pg)

    # --- doc_cdc_chunks at 10x --------------------------------------------
    from pennsieve_streaming_spark.llm.dedup import cdc_chunks

    cdc_docs = _replicate(docs, ["doc_id"], FACTOR).withColumn(
        "text",
        F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit(" "), "text"),
    ).drop("_rep")
    cdc = cdc_chunks(cdc_docs)
    results["doc_cdc_chunks"] = _force(cdc)
    plans["doc_cdc_chunks"] = _plan(cdc)

    # --- mm_video_scene_cuts at 10x (real MJPEG codec path, r8) ----------
    from pennsieve_streaming_spark.llm.video import scene_cut_synthetic

    sc_docs = _replicate(docs.select("doc_id"), ["doc_id"], FACTOR).drop(
        "_rep"
    )
    sc = scene_cut_synthetic(sc_docs)
    results["mm_video_scene_cuts"] = _force(sc)
    plans["mm_video_scene_cuts"] = _plan(sc)

    # --- emb_graph_search over a 10x corpus (waves 5-10, r8 cont.) --------
    from pennsieve_streaming_spark.llm.similarity import (
        greedy_graph_search,
        lsh_bucketed_ann,
    )

    embs10 = _replicate(embs, ["vec_id"], FACTOR).drop("_rep")
    gedges = lsh_bucketed_ann(embs10, embs10, k=3, broadcast_queries=False)
    gs = greedy_graph_search(
        gedges, embs10, embs10.filter(F.col("vec_id") < 10), hops=3,
        entry_id=0,
    )
    results["emb_graph_search"] = _force(gs)
    plans["emb_graph_search"] = _plan(gs)

    # --- doc_bloom_contamination over 10x docs ----------------------------
    from pennsieve_streaming_spark.llm.curation import bloom_contamination

    bl_docs = _replicate(docs, ["doc_id"], FACTOR).withColumn(
        "text",
        F.concat(F.lit("r"), F.col("_rep").cast("string"), F.lit(" "), "text"),
    ).drop("_rep")
    bl = bloom_contamination(
        bl_docs, bl_docs.filter(F.col("doc_id") % 29 == 0), k=3
    )
    results["doc_bloom_contamination"] = _force(bl)
    plans["doc_bloom_contamination"] = _plan(bl)

    # --- ts_bollinger_breaks at 10x sample density -------------------------
    from pennsieve_streaming_spark.operators.stats import bollinger_breaks

    bb = bollinger_breaks(s10, window=20, k=2, quant=100)
    results["ts_bollinger_breaks"] = _force(bb)
    plans["ts_bollinger_breaks"] = _plan(bb)

    # --- plan-shape guards (the 100x design evidence) ---------------------
    problems = []
    for name, plan in plans.items():
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct")
    if "_bn" not in plans["doc_minhash_lsh_pairs"]:
        problems.append("lsh: bucket-cap stats missing from plan")
    if "BroadcastExchange" not in plans["emb_cosine_topk"]:
        problems.append("topk: query side not broadcast")
    if "WindowGroupLimit" not in plans["emb_cosine_topk"]:
        problems.append("topk: partial top-k pushdown missing")
    # the periodogram must stay ONE aggregation pass over the scan:
    # a second hashpartitioning exchange on channel would mean the
    # trig sums split into multiple scans
    if plans["ts_uneven_periodogram"].count("Exchange hashpartitioning") > 3:
        problems.append("periodogram: more exchanges than the 1-pass shape")
    # CDC must stay the linear shape: one per-doc window pass (chars
    # never join against per-position text copies), then chunk/copy
    # partial aggs — more exchanges would mean a text-duplicating plan
    if plans["doc_cdc_chunks"].count("Exchange hashpartitioning") > 3:
        problems.append("cdc: more exchanges than the linear shape")
    if "CartesianProduct" in plans["doc_cdc_chunks"]:
        problems.append("cdc: cartesian")
    # triangles: degree-ordered orientation keeps the wedge join on the
    # capped verified-pair edge list — any cartesian or a missing edge
    # pin would replay the LSH pipeline per reference
    if "CartesianProduct" in plans["doc_graph_triangles"]:
        problems.append("triangles: cartesian")
    # scene cuts: a narrow mapInPandas over doc ids — the only join in
    # the plan may be the replication harness's broadcast of the
    # 10-row replica range; a shuffle join or cartesian means the
    # codec path started moving media rows
    if "SortMergeJoin" in plans["mm_video_scene_cuts"] or (
        "ShuffledHashJoin" in plans["mm_video_scene_cuts"]
    ):
        problems.append("scene_cuts: shuffle join in the codec path")
    # graph search: the entry hop must stay a 1-row broadcast (the
    # constant-folded join regression class) and every hop an
    # equi-join — the generic cartesian guard above covers the
    # failure that shipped-and-was-caught in this wave's golden
    # bloom: the corpus side must stay a narrow map — the bit tests
    # fold into codegen; ANY shuffle join means the bitset literal
    # regressed to a join
    if "SortMergeJoin" in plans["doc_bloom_contamination"] or (
        "ShuffledHashJoin" in plans["doc_bloom_contamination"]
    ):
        problems.append("bloom: shuffle join in the corpus map")
    # bollinger: one ordered window pass + rollup
    if plans["ts_bollinger_breaks"].count("Exchange hashpartitioning") > 2:
        problems.append("bollinger: more exchanges than the 1-pass shape")

    print(
        json.dumps(
            {
                "metric": "scale_smoke_10x_total",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": {k: round(v, 4) for k, v in results.items()},
                "factor": FACTOR,
                "sf_base": 0.1,
                "lsh_candidates": n_cands,
                "plan_problems": problems,
            }
        )
    )
    if problems:
        sys.exit(1)


if __name__ == "__main__":
    main()
