"""pagerank semantics: hand-computed ranks, dangling leak, duplicate
edge collapse, and input validation."""

import pytest

from parcial_bigdata_spark.operators.graph import pagerank


def _ranks(edges_df, **kw):
    return {r.node: r.rank for r in pagerank(edges_df, **kw).collect()}


def test_pagerank_hand_computed_one_round(spark):
    # A→B, A→C, B→A, C→A; one round from uniform 1/3:
    #   r(A) = 0.15/3 + 0.85·(1/3 + 1/3)      = 0.61667
    #   r(B) = r(C) = 0.15/3 + 0.85·(1/3 / 2) = 0.19167
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    r = _ranks(e, iterations=1)
    assert r["a"] == pytest.approx(0.05 + 0.85 * 2 / 3)
    assert r["b"] == pytest.approx(0.05 + 0.85 / 6)
    assert r["b"] == r["c"]


def test_pagerank_dangling_mass_leaks(spark):
    # B has no out-edges: its round-1 inflow is gone in round 2 —
    # total mass decays below 1 (documented simplified variant)
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    r = _ranks(e, iterations=2)
    assert r["a"] == pytest.approx(0.075)
    assert sum(r.values()) < 1.0


def test_pagerank_duplicate_and_null_edges(spark):
    # duplicate edges collapse to one; null endpoints drop entirely
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), (None, "a"), ("b", None)],
        "src string, dst string",
    )
    r = _ranks(e, iterations=3)
    # symmetric 2-cycle: both nodes hold 1/2 forever
    assert r["a"] == pytest.approx(0.5) and r["b"] == pytest.approx(0.5)
    assert set(r) == {"a", "b"}


def test_pagerank_validates_inputs(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="missing columns"):
        pagerank(e, src="nope")
