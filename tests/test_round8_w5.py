"""Round-8 wave-5 operator goldens: hand-computable cases pinning the
semantics the oracles gate statistically."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _series(spark, vals, channel="a", quant=1):
    return spark.createDataFrame(
        [(channel, i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )


def test_mann_kendall_monotone_ramp(spark):
    from pennsieve_streaming_spark.operators.stats import mann_kendall

    n = 20
    out = mann_kendall(_series(spark, range(n)), quant=1).collect()[0]
    # strictly increasing: S = n(n-1)/2, no ties
    assert out.s_stat == n * (n - 1) // 2
    assert out.n_points == n
    var_s = n * (n - 1) * (2 * n + 5) / 18.0
    assert out.var_s == var_s
    assert out.z == round((out.s_stat - 1) / math.sqrt(var_s), 9)
    assert out.trend == "increasing"


def test_mann_kendall_constant_sentinel(spark):
    from pennsieve_streaming_spark.operators.stats import mann_kendall

    out = mann_kendall(_series(spark, [5] * 10), quant=1).collect()[0]
    # all tied: S = 0 and VarS = 0 -> sentinel z, trend 'none'
    assert out.s_stat == 0 and out.var_s == 0.0
    assert out.z == 0.0 and out.trend == "none"


def test_mann_kendall_decreasing(spark):
    from pennsieve_streaming_spark.operators.stats import mann_kendall

    out = mann_kendall(_series(spark, range(20, 0, -1)), quant=1).collect()[0]
    assert out.s_stat == -190 and out.trend == "decreasing"


def test_benford_digit_extraction_and_counts(spark):
    from pennsieve_streaming_spark.operators.stats import benford_digits

    # quant=1: digits of 123->1, 20->2, 3->3, 999->9, 0.4->0 (excluded
    # after rounding to 0), -250 -> 2 via abs
    df = _series(spark, [123, 20, 3, 999, 0.4, -250])
    out = benford_digits(df, quant=1).collect()[0]
    assert out.n == 5
    assert (out.c1, out.c2, out.c3, out.c9) == (1, 2, 1, 1)
    assert out.c4 == 0
    # chi2 against the Benford table is positive for this tiny sample
    assert out.chi2 > 0.0 and out.mad > 0.0


def test_benford_perfect_single_digit(spark):
    from pennsieve_streaming_spark.operators.stats import (
        benford_digits,
        benford_probs,
    )

    # all mass on digit 1: chi2 = n * sum((I[d=1]-p_d)^2/p_d)
    out = benford_digits(_series(spark, [10, 11, 12, 13]), quant=1).collect()[0]
    probs = benford_probs()
    exp = sum(
        (int(i == 0) * 4 - 4 * p) ** 2 / (4 * p) for i, p in enumerate(probs)
    )
    assert out.n == 4 and out.c1 == 4
    assert abs(out.chi2 - exp) < 1e-6


def test_engle_granger_perfect_cointegration(spark):
    from pennsieve_streaming_spark.operators.stats import engle_granger

    # y = 2x exactly: beta = 2, residuals all 0 -> gamma sentinel 0.0
    rows = [("a", i, float(v)) for i, v in enumerate([1, 3, 2, 5, 4, 6])]
    rows += [("b", i, 2.0 * v) for i, v in enumerate([1, 3, 2, 5, 4, 6])]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = engle_granger(df, quant=1).collect()[0]
    assert (out.ch_a, out.ch_b) == ("a", "b")
    assert out.beta == 2.0
    assert out.gamma == 0.0  # zero residual -> see = 0 -> sentinel
    assert not out.cointegrated


def test_engle_granger_mean_reverting_residual(spark):
    from pennsieve_streaming_spark.operators.stats import engle_granger

    # x constant trend, y = x + alternating residual: the residual
    # flips sign every step, so the DF coefficient is ~ -2
    x = list(range(1, 21))
    y = [v + (8 if i % 2 == 0 else -8) for i, v in enumerate(x)]
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    rows += [("b", i, float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "channel string, ts long, value double")
    out = engle_granger(df, quant=1).collect()[0]
    assert out.gamma < -1.5 and out.cointegrated


def test_mann_whitney_clean_separation(spark):
    from pennsieve_streaming_spark.operators.analytics import mann_whitney

    # a-values all below b-values: U_a = 0, z < 0 and significant
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8]]
    rows += [("b", float(v)) for v in [11, 12, 13, 14, 15, 16, 17, 18]]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = mann_whitney(ev).collect()[0]
    assert (out.type_a, out.type_b) == ("a", "b")
    assert out.u2 == 0  # no a-value beats any b-value
    assert out.z < -3.0 and out.significant


def test_mann_whitney_identical_distributions(spark):
    from pennsieve_streaming_spark.operators.analytics import mann_whitney

    rows = [("a", float(v)) for v in [1, 2, 3, 4]]
    rows += [("b", float(v)) for v in [1, 2, 3, 4]]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = mann_whitney(ev).collect()[0]
    # symmetric: 2U = n_a * n_b -> z = 0
    assert out.u2 == 16 and out.z == 0.0 and not out.significant


def test_mann_whitney_all_tied_sentinel(spark):
    from pennsieve_streaming_spark.operators.analytics import mann_whitney

    rows = [("a", 5.0)] * 3 + [("b", 5.0)] * 3
    ev = spark.createDataFrame(rows, "event_type string, value double")
    out = mann_whitney(ev).collect()[0]
    # every value tied: var_u = 0 -> sentinel z
    assert out.z == 0.0 and not out.significant


def test_simpson_diversity_golden(spark):
    from pennsieve_streaming_spark.operators.analytics import (
        simpson_diversity,
    )

    # user 1: counts (3, 1) over 4 events -> lambda = (6+0)/12 = 0.5
    # user 2: single event -> sentinel
    rows = [(1, "x")] * 3 + [(1, "y")] + [(2, "x")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r.user_id: r for r in simpson_diversity(ev).collect()}
    assert out[1].simpson == 0.5 and out[1].gini_simpson == 0.5
    assert out[1].top_share == 0.75 and out[1].n_types == 2
    assert out[2].simpson == 0.0 and out[2].gini_simpson == 0.0
    assert out[2].top_share == 1.0


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_quality_rules(spark):
    from pennsieve_streaming_spark.llm.curation import (
        gopher_quality_filters,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "away with great speed that nobody can have imagined before "
        "because it was truly the fastest fox of all time in this "
        "forest and everyone知 knew that fact very well indeed so "
        "they said"
    )
    # pad to >= 50 words
    good = good + " more words" * 10
    bullety = "- a\n- b\n- c"
    out = {
        r.doc_id: r
        for r in gopher_quality_filters(
            _docs_df(spark, [good, bullety, ""])
        ).collect()
    }
    g = out[0]
    assert g.wc_ok and g.alpha_ok and g.stop_ok
    assert g.n_stops_present >= 2
    b = out[1]
    assert b.n_bullet_lines == 3 and not b.bullet_ok
    assert not b.wc_ok
    e = out[2]
    assert e.n_words == 0 and not e.keep and e.mean_word_len == 0.0


def test_gopher_mean_word_length_band(spark):
    from pennsieve_streaming_spark.llm.curation import (
        gopher_quality_filters,
    )

    # mean word length 2 (< 3): "ab" x 60
    short = " ".join(["ab"] * 60)
    # mean word length 11 (> 10)
    long_ = " ".join(["abcdefghijk"] * 60)
    out = {
        r.doc_id: r
        for r in gopher_quality_filters(
            _docs_df(spark, [short, long_])
        ).collect()
    }
    assert not out[0].mwl_ok and out[0].mean_word_len == 2.0
    assert not out[1].mwl_ok and out[1].mean_word_len == 11.0


def test_lexical_diversity_golden(spark):
    import math

    from pennsieve_streaming_spark.llm.text import lexical_diversity

    out = {
        r.doc_id: r
        for r in lexical_diversity(
            _docs_df(spark, ["a b a b A", "x", ""])
        ).collect()
    }
    d = out[0]  # 5 tokens, 2 types (lowercased)
    assert d.n_tokens == 5 and d.n_types == 2
    assert d.ttr == 0.4
    assert d.rttr == round(2 / math.sqrt(5), 9)
    assert d.herdan_c == round(math.log(2) / math.log(5), 9)
    assert d.maas_a2 == round(
        (math.log(5) - math.log(2)) / (math.log(5) ** 2), 9
    )
    # single token: log sentinels
    assert out[1].herdan_c == 0.0 and out[1].maas_a2 == 0.0
    assert out[2].n_tokens == 0 and out[2].ttr == 0.0


def test_twonn_golden(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        twonn_intrinsic_dim,
    )

    # 2-D corpus engineered so probe 0's two nearest angular
    # distances are hand-computable
    import math

    vecs = [
        (0, [1.0, 0.0]),
        (1, [math.cos(0.1), math.sin(0.1)]),
        (2, [math.cos(0.3), math.sin(0.3)]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    out = {
        r.vec_id: r
        for r in twonn_intrinsic_dim(
            df, df.filter(F.col("vec_id") < 2)
        ).collect()
    }
    p0 = out[0]
    assert p0.nn1_id == 1 and p0.nn2_id == 2
    d1 = 1.0 - math.cos(0.1)
    d2 = 1.0 - math.cos(0.3)
    assert p0.mu == round(d2 / d1, 9)
    assert p0.id_twonn > 0.0
    # both probes carry the same corpus-level estimate
    assert out[0].id_twonn == out[1].id_twonn


def test_twonn_duplicate_sentinel(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        twonn_intrinsic_dim,
    )

    # probe 0 has an exact duplicate (d1 = 0) -> mu sentinel, excluded
    vecs = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    out = twonn_intrinsic_dim(df, df.filter(F.col("vec_id") == 0)).collect()
    assert len(out) == 1 and out[0].mu == 0.0 and out[0].id_twonn == 0.0


def test_knn_assortativity_golden(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        knn_degree_assortativity,
    )

    # star graph: 1,2,3 all point at 0 (and 0 points at 1).
    # in-degrees: 0 -> 3, 1 -> 1, 2,3 -> 0
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)],
        "query_id long, neighbor_id long",
    )
    out = knn_degree_assortativity(edges).collect()[0]
    assert out.n_edges == 4 and out.n_nodes == 4
    # hand Pearson over (x=indeg src, y=indeg dst):
    # pairs (1,3),(0,3),(0,3),(3,1)
    import math

    xs, ys = [1, 0, 0, 3], [3, 3, 3, 1]
    n = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    r = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert out.assortativity == round(r, 9)


def test_knn_assortativity_degenerate_sentinel(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        knn_degree_assortativity,
    )

    # 2-cycle: both in-degrees 1 -> zero variance -> 0.0 sentinel
    edges = spark.createDataFrame(
        [(0, 1), (1, 0)], "query_id long, neighbor_id long"
    )
    out = knn_degree_assortativity(edges).collect()[0]
    assert out.assortativity == 0.0


def test_edge_orientation_partition_of_interior(spark):
    from pennsieve_streaming_spark.llm.imagehash import (
        GRID_H,
        GRID_W,
        edge_orientation_stats,
        synthetic_gray,
    )

    s = edge_orientation_stats(synthetic_gray(3))
    assert sum(c for _, c in s) == (GRID_H - 2) * (GRID_W - 2)
    assert all(-1 <= o <= 7 for o, _ in s)


def test_edge_orientation_flat_and_vertical():
    import numpy as np

    from pennsieve_streaming_spark.llm.imagehash import (
        edge_orientation_stats,
    )

    flat = np.full((4, 4), 9)
    assert edge_orientation_stats(flat) == [(-1, 4)]
    # luminance increasing left->right: gx > 0, gy = 0 -> octant 0
    ramp = np.tile(np.arange(5), (5, 1)) * 10
    out = dict(edge_orientation_stats(ramp))
    assert out == {0: 9}


def test_dynamic_range_golden(spark):
    from pennsieve_streaming_spark.dsp.spectral import dynamic_range

    import math

    # 4 frames of 4: energies 4, 16, 64, 400 -> with F=4,
    # k10 = ceil(0.4) = 1 -> e_p10 = 4; k95 = ceil(3.8) = 4 -> 400
    vals = [1] * 4 + [2] * 4 + [4] * 4 + [10] * 4
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate(vals)],
        "channel string, ts long, value double",
    )
    out = dynamic_range(df, frame=4, quant=1).collect()[0]
    assert out.n_frames == 4
    assert out.e_p10 == 4 and out.e_p95 == 400
    assert out.dr_db == round(10 * math.log10(100.0), 9)


def test_dynamic_range_silent_sentinel(spark):
    from pennsieve_streaming_spark.dsp.spectral import dynamic_range

    df = spark.createDataFrame(
        [("a", i, 0.0) for i in range(8)],
        "channel string, ts long, value double",
    )
    out = dynamic_range(df, frame=4, quant=1).collect()[0]
    assert out.e_p10 == 0 and out.dr_db == 0.0


def test_record_counts_golden(spark):
    from pennsieve_streaming_spark.operators.stats import record_counts

    # 3, 1, 4, 1, 5: highs at 4 (ts2) and 5 (ts4); lows at 1 (ts1)
    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5])],
        "channel string, ts long, value double",
    )
    out = record_counts(df, quant=1).collect()[0]
    assert out.n_points == 5
    assert out.n_record_highs == 2 and out.last_high_ts == 4
    assert out.n_record_lows == 1 and out.last_low_ts == 1


def test_record_counts_constant_sentinels(spark):
    from pennsieve_streaming_spark.operators.stats import record_counts

    df = spark.createDataFrame(
        [("a", i, 7.0) for i in range(5)],
        "channel string, ts long, value double",
    )
    out = record_counts(df, quant=1).collect()[0]
    assert out.n_record_highs == 0 and out.n_record_lows == 0
    assert out.last_high_ts == -1 and out.last_low_ts == -1
