"""Arrow-path kNN must produce exactly the ranks of the oracle-checked
built-in brute force."""

from __future__ import annotations

import pytest

from parcial_bigdata_spark.catalog import load_table
from parcial_bigdata_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embeddings(spark):
    import os

    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    return load_table(spark, SF_DIR, "embeddings")


def test_arrow_knn_matches_hof_knn(embeddings):
    qids = [0, 1, 2, 3, 4]
    hof = sim.knn_brute_force(embeddings, qids, k=10).collect()
    arrow = sim.knn_brute_force_arrow(embeddings, qids, k=10).collect()
    assert [(r.query_id, r.rnk, r.vec_id) for r in arrow] == [
        (r.query_id, r.rnk, r.vec_id) for r in hof
    ]
    # similarities agree to rounding
    for a, h in zip(arrow, hof):
        assert abs(a.sim - h.sim) < 2e-6


def test_arrow_knn_excludes_self(embeddings):
    out = sim.knn_brute_force_arrow(embeddings, [0], k=5).collect()
    assert all(r.vec_id != 0 for r in out)
    assert [r.rnk for r in out] == [1, 2, 3, 4, 5]


def test_arrow_knn_rounding_ties_match_ground_truth(spark):
    """Engineered rank-k tie (round-5 review): two candidates whose raw
    sims differ but ROUND equal at 6 decimals, with the lower vec_id on
    the raw-lower one — the ground truth ties on rounded sim and keeps
    the lower vec_id, so the Arrow batch prune must not cut by raw sim;
    plus a ...5-at-the-7th-decimal sim where np.round (half-even) and
    Spark F.round (HALF_UP) disagree on the value itself."""
    import math

    def vec(c):  # 2-D unit vector with cosine c against (1, 0)
        return [c, math.sqrt(1.0 - c * c)]

    rows = [
        (0, [1.0, 0.0]),          # query
        (1, vec(0.1234561)),       # rounds 0.123456, lower vec_id
        (2, vec(0.1234564)),       # rounds 0.123456, higher raw sim
        (3, vec(0.9)),             # clear top-1
        (4, vec(0.1234565)),       # HALF_UP 0.123457, half-even 0.123456
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(1)  # one Arrow batch: the prune must handle it alone
    truth = sim.knn_brute_force(emb, [0], k=3).collect()
    arrow = sim.knn_brute_force_arrow(emb, [0], k=3).collect()
    assert [(r.rnk, r.vec_id, r.sim) for r in arrow] == [
        (r.rnk, r.vec_id, r.sim) for r in truth
    ]
    # the tie at rank 3 resolves to the LOWER vec_id despite lower raw sim
    assert (truth[2].vec_id, truth[2].sim) == (1, 0.123456)
    # and the HALF_UP value surfaced at rank 2
    assert (truth[1].vec_id, truth[1].sim) == (4, 0.123457)
