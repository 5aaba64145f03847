"""Similarity search: brute-force exactness on a hand-built corpus, and
IVF/LSH recall against the brute-force ground truth."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parcial_bigdata_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def embeddings(spark):
    """16 vectors in 4 tight clusters around the 4 axes of R^4."""
    rows = []
    vid = 0
    for axis, label in enumerate(["a", "b", "c", "d"]):
        for j in range(4):
            vec = [0.0] * 4
            vec[axis] = 1.0
            vec[(axis + 1) % 4] = 0.01 * j  # slight spread within cluster
            rows.append((vid, vec, label))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")


def test_brute_force_exact_golden(embeddings):
    out = sim.knn_brute_force(embeddings, query_ids=[0], k=3).collect()
    assert [r.rnk for r in out] == [1, 2, 3]
    # nearest neighbors of vec 0 (pure x-axis) are its cluster-mates 1,2,3
    assert {r.vec_id for r in out} == {1, 2, 3}
    assert out[0].sim > 0.999
    # ranking is by similarity desc with vec_id tie-break
    sims = [r.sim for r in out]
    assert sims == sorted(sims, reverse=True)


def test_brute_force_excludes_self(embeddings):
    out = sim.knn_brute_force(embeddings, query_ids=[0], k=15).collect()
    assert all(r.vec_id != 0 for r in out)


def test_ivf_matches_brute_force_within_probed_clusters(embeddings):
    """nprobe=1 on tight clusters: the query's own cluster holds the true
    top-3, so IVF@1 must equal brute force exactly."""
    bf = sim.knn_brute_force(embeddings, query_ids=[0, 4, 8], k=3).collect()
    ivf = sim.knn_ivf(embeddings, query_ids=[0, 4, 8], k=3, nprobe=1).collect()
    assert [(r.query_id, r.rnk, r.vec_id) for r in ivf] == [
        (r.query_id, r.rnk, r.vec_id) for r in bf
    ]


def test_lsh_recall_at_k(embeddings):
    """LSH buckets by random hyperplanes; near-identical vectors land in
    the same bucket, so recall@3 for cluster-mates should be high."""
    bf = sim.knn_brute_force(embeddings, query_ids=[0, 4, 8, 12], k=3).collect()
    lsh = sim.knn_lsh(embeddings, query_ids=[0, 4, 8, 12], k=3, n_planes=4).collect()
    truth = {(r.query_id, r.vec_id) for r in bf}
    got = {(r.query_id, r.vec_id) for r in lsh}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.75


def test_cosine_function_matches_math(spark):
    from parcial_bigdata_spark.functions.vector import cosine

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    got = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()[0].c
    dot = 1 * 4 + 2 * 5 + 3 * 6
    expected = dot / (math.sqrt(14) * math.sqrt(77))
    assert abs(got - expected) < 1e-12


def test_brute_force_broadcasts_queries(embeddings):
    """The query side must broadcast — no shuffle of the corpus."""
    plan = (
        sim.knn_brute_force(embeddings, query_ids=[0], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


@pytest.fixture(scope="module")
def interleaved_embeddings(spark):
    """Same 4 axis clusters, but vec_ids interleave across clusters
    (vid = axis + 4j), so the deterministic first-k init seeds one
    vector per cluster."""
    rows = []
    for axis in range(4):
        for j in range(4):
            vec = [0.0] * 4
            vec[axis] = 1.0
            vec[(axis + 1) % 4] = 0.01 * j
            rows.append((axis + 4 * j, vec, str(axis)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")


def test_kmeans_recovers_axis_clusters(interleaved_embeddings):
    """4 tight axis-aligned clusters, k=4, one seed per cluster: Lloyd
    must converge to one cluster per axis with high coherence."""
    cents = sim.train_spherical_kmeans(interleaved_embeddings, k=4, iters=2)
    asg = sim.assign_clusters(
        interleaved_embeddings.select("vec_id", "embedding"), cents
    ).collect()
    by_cluster = {}
    for r in asg:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    # each axis group {axis, axis+4, axis+8, axis+12} is one cluster
    assert sorted(map(tuple, (sorted(v) for v in by_cluster.values()))) == [
        (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15)
    ]
    assert all(r.sim > 0.99 for r in asg)


def test_kmeans_summary_counts_and_coherence(interleaved_embeddings):
    out = sim.kmeans_cluster_summary(interleaved_embeddings, k=4, iters=2).collect()
    assert [r.cluster for r in out] == sorted(r.cluster for r in out)
    assert [r.n_vecs for r in out] == [4, 4, 4, 4]
    assert all(r.avg_sim > 0.99 for r in out)


def test_kmeans_rejects_bad_params(embeddings):
    with pytest.raises(ValueError):
        sim.train_spherical_kmeans(embeddings, k=0)
    with pytest.raises(ValueError):
        sim.train_spherical_kmeans(embeddings, iters=0)


def test_ivf_runs_on_trained_assignment(interleaved_embeddings):
    """The trained quantizer plugs straight into knn_ivf as cluster_col —
    the end-to-end 'train index, then search it' path."""
    cents = sim.train_spherical_kmeans(interleaved_embeddings, k=4, iters=2)
    asg = sim.assign_clusters(
        interleaved_embeddings.select("vec_id", "embedding"), cents
    ).select("vec_id", "embedding", F.col("cluster").alias("ivf_cluster"))
    out = sim.knn_ivf(
        asg, query_ids=[0], k=3, nprobe=1, cluster_col="ivf_cluster"
    ).collect()
    # nprobe=1 on a perfect clustering: exactly the cluster-mates of vec 0
    assert {r.vec_id for r in out} == {4, 8, 12}


def test_scalar_quantization_stats_golden(spark):
    from parcial_bigdata_spark.operators.similarity import (
        scalar_quantization_stats,
    )

    vecs = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.5], 0),        # scale 1/255, exact endpoints
            (2, [2.0, 2.0, 2.0], 0),        # constant: lossless, scale 0
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.vec_id: r for r in scalar_quantization_stats(vecs).collect()}
    scale = 1.0 / 255
    # v=0.0 -> code 0 exact; v=1.0 -> code 255 exact; v=0.5 -> code 128
    exp_err = abs(0.5 - round(0.5 / scale + 0.5 - 0.5) * scale)
    import math

    exp_err = abs(0.5 - math.floor(0.5 / scale + 0.5) * scale)
    assert rows[1].n_dims == 3
    assert rows[1].scale == round(scale, 6)
    assert rows[1].max_err == round(exp_err, 6)
    assert rows[1].rmse == round(math.sqrt(exp_err**2 / 3), 6)
    assert (rows[2].scale, rows[2].rmse, rows[2].max_err) == (0.0, 0.0, 0.0)


def test_label_centroid_dispersion_golden(spark):
    from parcial_bigdata_spark.operators.similarity import (
        label_centroid_dispersion,
    )

    # label 0: two vectors symmetric about (0.5, 0.5): each at distance
    # sqrt(0.5); label 1: a single vector sits ON its centroid
    vecs = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [1.0, 1.0], 0),
            (3, [4.0, 4.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    import math

    rows = {r.label: r for r in label_centroid_dispersion(vecs).collect()}
    d = math.sqrt(0.5)
    assert rows[0].n_vecs == 2
    assert rows[0].avg_dist == round(d, 6) and rows[0].max_dist == round(d, 6)
    assert (rows[1].n_vecs, rows[1].avg_dist, rows[1].max_dist) == (1, 0.0, 0.0)


def test_dimension_stats_exact_moments(spark):
    from parcial_bigdata_spark.operators.similarity import dimension_stats

    emb = spark.createDataFrame(
        [(1, [1.0, 10.0], 0), (2, [2.0, 10.0], 0), (3, [3.0, 10.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r.dim: r for r in dimension_stats(emb).collect()}
    d1, d2 = out[1], out[2]
    # dim 1: mean 2, population var ((1+4+9)/3 - 4) = 2/3 -> 0.666667
    assert (d1.n_values, d1.mean_val, d1.min_val, d1.max_val) == (3, 2.0, 1.0, 3.0)
    assert d1.var_val == 0.666667
    # constant dimension: zero variance (the collapse diagnostic)
    assert (d2.mean_val, d2.var_val) == (10.0, 0.0)


def test_pair_cosine_histogram_identical_vectors(spark):
    from parcial_bigdata_spark.operators.similarity import (
        pair_cosine_histogram,
    )

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0], 0) for i in range(7)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = pair_cosine_histogram(emb).collect()
    # identical vectors: every pair lands in the top bucket at cos 1.0;
    # odd corpus -> the trailing vector is dropped (3 pairs of 7)
    assert [(r.bucket, r.n_pairs, r.min_cos, r.max_cos) for r in rows] == [
        (9, 3, 1.0, 1.0)
    ]


def test_pair_cosine_histogram_buckets_partition_pairs(spark, embeddings):
    from parcial_bigdata_spark.operators.similarity import (
        pair_cosine_histogram,
    )

    n = embeddings.count()
    rows = pair_cosine_histogram(embeddings).collect()
    assert sum(r.n_pairs for r in rows) == n // 2
    assert all(0 <= r.bucket <= 9 and r.min_cos <= r.max_cos for r in rows)
