"""SQL surface (sqlapi.register_views): spark.sql over the registered
views must agree with the DataFrame API, and pruning must survive the
view hop."""

from __future__ import annotations

from pyspark.sql import functions as F

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.sqlapi import register_views

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_api(spark):
    names = register_views(spark, SF, prefix="t1_")
    assert "t1_samples" in names and "t1_documents" in names
    got = spark.sql(
        """
        SELECT s.channel, COUNT(*) AS n, MIN(s.value) AS lo
        FROM t1_samples s JOIN t1_channels c ON s.channel = c.channel
        GROUP BY s.channel ORDER BY s.channel
        """
    ).collect()
    df = TBL.samples_view(spark, SF)
    want = (
        df.join(TBL.channels_view(spark, SF), "channel")
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"))
        .orderBy("channel")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pruning_pushes_through_views(spark):
    register_views(spark, SF, prefix="t2_")
    q = spark.sql("SELECT doc_id FROM t2_documents WHERE doc_id < 5")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # column pruning: the scan must read only doc_id
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    # predicate pushdown reaches the parquet scan
    assert "LessThan(doc_id,5)" in plan or "doc_id" in plan.split("PushedFilters: [")[1].split("]")[0]


def test_operator_views_match_python_api(spark):
    from pennsieve_streaming_spark.operators.downsample import downsample_ltob
    from pennsieve_streaming_spark.operators.sax import sax_words
    from pennsieve_streaming_spark.sqlapi import register_operator_views

    names = register_operator_views(spark, SF, prefix="o1_")
    assert {"o1_ltob", "o1_sax", "o1_welch", "o1_asof_events"} <= set(names)

    got = spark.sql(
        "SELECT * FROM o1_ltob WHERE channel = 'ch3'"
    ).collect()
    want = (
        downsample_ltob(TBL.samples_view(spark, SF), 16)
        .filter(F.col("channel") == "ch3")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    got_sax = spark.sql(
        "SELECT channel, win, sax_word FROM o1_sax WHERE channel = 'ch1'"
    ).collect()
    want_sax = (
        sax_words(TBL.samples_view(spark, SF))
        .filter(F.col("channel") == "ch1")
        .select("channel", "win", "sax_word")
        .collect()
    )
    assert sorted(map(tuple, got_sax)) == sorted(map(tuple, want_sax))

    # welch + asof_events + the round-6b views resolve and return rows
    assert spark.sql("SELECT COUNT(*) AS n FROM o1_welch").collect()[0].n > 0
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM o1_asof_events").collect()[0].n
        > 0
    )
    assert {"o1_sax_motifs", "o1_trend_segments"} <= set(names)
    m = spark.sql(
        "SELECT channel, sax_word, rank FROM o1_sax_motifs WHERE rank = 1"
    ).collect()
    assert m and all(r.rank == 1 for r in m)
    t = spark.sql(
        "SELECT direction, COUNT(*) AS n FROM o1_trend_segments "
        "GROUP BY direction"
    ).collect()
    assert sum(r.n for r in t) > 0

    # round-6c views resolve and return sane rows
    assert {
        "o1_sample_entropy", "o1_dtw_distances", "o1_event_bursts",
        "o1_ar2", "o1_seasonal",
    } <= set(names)
    se = spark.sql(
        "SELECT COUNT(*) AS n FROM o1_sample_entropy WHERE n = 128"
    ).collect()
    assert se[0].n > 0
    d = spark.sql(
        "SELECT COUNT(*) AS n FROM o1_dtw_distances "
        "WHERE channel_a < channel_b"
    ).collect()
    assert d[0].n > 0
    a2 = spark.sql("SELECT COUNT(*) AS n FROM o1_ar2").collect()
    assert a2[0].n > 0


def test_operator_view_channel_filter_pushes_to_scan(spark):
    """A channel predicate over the ltob view must cross the view hop
    AND the window (channel is the partition key) down to the scan —
    the view layer may not cost a full-table read."""
    from pennsieve_streaming_spark.sqlapi import register_operator_views

    register_operator_views(spark, SF, prefix="o2_")
    q = spark.sql("SELECT * FROM o2_ltob WHERE channel = 'ch3'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # channel is a COMPUTED column in the samples view, so it can't
    # enter PushedFilters (parquet row-group skipping) — the property
    # that matters is that the predicate crossed the view hop and BOTH
    # window passes down to the scan node, so only ch3's rows ever
    # enter the windows. Two valid scan shapes: a FileScan with the
    # predicate in DataFilters, or (when another test in the shared
    # session has cached the samples view) an InMemoryTableScan with
    # the predicate in its pushed-filter list.
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln or "InMemoryTableScan" in ln
    ]
    assert any("ch3" in ln for ln in scan_lines), plan


def test_round6e_views_registered_and_queryable(spark):
    """The fifth-session operator views answer SQL with the expected
    schemas (lazy logical plans — this exercises registration + one
    small aggregate through each)."""
    import pennsieve_streaming_spark.sqlapi as sqlapi

    names = sqlapi.register_operator_views(
        spark, "/root/testdata/sf0.001", prefix="r6e_"
    )
    for v in ("r6e_perm_entropy", "r6e_lz_complexity",
              "r6e_higher_moments", "r6e_periodogram"):
        assert v in names
    pe = spark.sql(
        "SELECT count(*) AS n, min(pe_norm) AS lo FROM r6e_perm_entropy"
    ).collect()[0]
    assert pe.n > 0 and pe.lo >= 0.0
    lz = spark.sql(
        "SELECT max(c_phrases) AS c FROM r6e_lz_complexity"
    ).collect()[0]
    assert lz.c >= 2
    hm = spark.sql(
        "SELECT count(*) AS n FROM r6e_higher_moments WHERE m2 > 0"
    ).collect()[0]
    assert hm.n > 0
    pg = spark.sql(
        "SELECT count(*) AS n FROM r6e_periodogram WHERE power >= 0"
    ).collect()[0]
    assert pg.n > 0


def test_round7_views_registered_and_queryable(spark):
    """The round-7 operator views answer SQL with the expected
    schemas: fractal dimension, despiking, wavelet denoise, robust
    trend, survival, circadian, growth accounting."""
    import pennsieve_streaming_spark.sqlapi as sqlapi

    names = sqlapi.register_operator_views(
        spark, "/root/testdata/sf0.001", prefix="r7_"
    )
    for v in ("r7_higuchi", "r7_hampel", "r7_haar_denoised",
              "r7_theil_sen", "r7_survival", "r7_circadian",
              "r7_new_vs_returning"):
        assert v in names
    fd = spark.sql(
        "SELECT count(*) AS n, min(fd) AS lo FROM r7_higuchi"
    ).collect()[0]
    assert fd.n > 0 and (fd.lo is None or fd.lo > 0.0)
    hp = spark.sql(
        "SELECT count(*) AS n FROM r7_hampel WHERE NOT is_spike"
    ).collect()[0]
    assert hp.n > 0
    hd = spark.sql(
        "SELECT count(*) AS n FROM r7_haar_denoised "
        "WHERE abs(denoised - value) < 1e6"
    ).collect()[0]
    assert hd.n > 0
    ts_ = spark.sql(
        "SELECT count(*) AS n FROM r7_theil_sen WHERE n_pairs > 0"
    ).collect()[0]
    assert ts_.n > 0
    cr = spark.sql(
        "SELECT count(*) AS n FROM r7_circadian WHERE r BETWEEN 0 AND "
        "1.0000001"
    ).collect()[0]
    assert cr.n > 0
    nr = spark.sql(
        "SELECT sum(new_users) AS s FROM r7_new_vs_returning"
    ).collect()[0]
    assert nr.s > 0


def test_round8_llm_views_registered_and_queryable(spark):
    """The round-8 additions to the SQL surface (VERDICT r7 item 6):
    near-dup triangles, BQ top-k, CDC chunks, mutual information —
    registered lazily and answering SQL with the expected shapes."""
    import pennsieve_streaming_spark.sqlapi as sqlapi

    names = sqlapi.register_operator_views(
        spark, "/root/testdata/sf0.001", prefix="r8_"
    )
    for v in ("r8_mutual_info", "r8_dup_triangles", "r8_cdc_chunks",
              "r8_bq_topk"):
        assert v in names
    mi = spark.sql(
        "SELECT count(*) AS n FROM r8_mutual_info WHERE mi >= 0"
    ).collect()[0]
    assert mi.n > 0
    tr = spark.sql(
        "SELECT count(*) AS n FROM r8_dup_triangles "
        "WHERE clustering BETWEEN 0 AND 1.0000001"
    ).collect()[0]
    assert tr.n > 0
    cc = spark.sql(
        "SELECT count(*) AS n, max(n_copies) AS mx FROM r8_cdc_chunks"
    ).collect()[0]
    assert cc.n > 0 and cc.mx >= 1
    bq = spark.sql(
        "SELECT count(*) AS n FROM r8_bq_topk WHERE rank <= 5"
    ).collect()[0]
    assert bq.n > 0


def test_wave5_6_views_registered_and_queryable(spark):
    """The wave-5/6 additions to the SQL surface: trend tests,
    Benford, Bollinger, curation panels, TwoNN — registered lazily
    and answering SQL with the expected shapes."""
    import pennsieve_streaming_spark.sqlapi as sqlapi

    names = sqlapi.register_operator_views(
        spark, "/root/testdata/sf0.001", prefix="w5_"
    )
    for v in (
        "w5_mann_kendall",
        "w5_turning_points",
        "w5_benford",
        "w5_bollinger_breaks",
        "w5_gopher_quality",
        "w5_lexical_diversity",
        "w5_intrinsic_dim",
    ):
        assert v in names
    mk = spark.sql(
        "SELECT count(*) AS n FROM w5_mann_kendall "
        "WHERE trend IN ('increasing', 'decreasing', 'none')"
    ).collect()[0]
    assert mk.n > 0
    bf = spark.sql(
        "SELECT count(*) AS n FROM w5_benford "
        "WHERE c1+c2+c3+c4+c5+c6+c7+c8+c9 = n"
    ).collect()[0]
    assert bf.n > 0
    bb = spark.sql(
        "SELECT count(*) AS n FROM w5_bollinger_breaks "
        "WHERE n_upper >= 0 AND n_lower >= 0"
    ).collect()[0]
    assert bb.n > 0
    gq = spark.sql(
        "SELECT count(*) AS n FROM w5_gopher_quality WHERE keep"
    ).collect()[0]
    assert gq.n >= 0
    ld = spark.sql(
        "SELECT count(*) AS n FROM w5_lexical_diversity "
        "WHERE ttr BETWEEN 0 AND 1.0000001"
    ).collect()[0]
    assert ld.n > 0
    td = spark.sql(
        "SELECT count(DISTINCT id_twonn) AS n FROM w5_intrinsic_dim"
    ).collect()[0]
    assert td.n == 1
