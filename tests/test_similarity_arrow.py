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
