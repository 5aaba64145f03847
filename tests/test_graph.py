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


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

from parcial_bigdata_spark.operators.graph import (  # noqa: E402
    node_triangle_counts,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_triangle_stats_hand_computed(spark):
    # K4 minus one edge (a-b, a-c, a-d, b-c, b-d): 2 triangles
    # degrees: a=3 b=3 c=2 d=2 → wedges = 3+3+1+1 = 8; clustering = 6/8
    e = _edges(
        spark, [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    )
    row = triangle_stats(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        4, 5, 8, 2,
    )
    assert row.clustering == 3.0 * 2 / 8


def test_triangle_counts_per_node(spark):
    # triangles abc and abd share edge a-b: a,b in 2 each; c,d in 1
    e = _edges(
        spark, [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    )
    counts = {r.node: r.n_triangles for r in node_triangle_counts(e).collect()}
    assert counts == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_input_noise_ignored(spark):
    # duplicates, reversed direction, self-loops, and nulls change nothing
    e = _edges(
        spark,
        [
            ("a", "b"), ("b", "a"), ("a", "b"),
            ("b", "c"), ("c", "a"),
            ("a", "a"), (None, "b"), ("c", None),
        ],
    )
    row = triangle_stats(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


def test_triangle_free_graph(spark):
    # a path has wedges but no triangles; clustering is exactly 0
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    row = triangle_stats(e).collect()[0]
    assert row.n_triangles == 0 and row.clustering == 0.0
    assert node_triangle_counts(e).count() == 0


def test_triangle_validates_columns(spark):
    import pytest as _pt

    e = _edges(spark, [("a", "b")])
    with _pt.raises(ValueError, match="missing columns"):
        triangle_stats(e, src="nope")


def test_kcore_matches_python_peel(spark):
    """k-core fixpoint vs a Python reference peel on a graph with real
    peel depth: a 5-clique (3-core), a triangle hung off it (peels at
    k=3), and a chain (never in any 2+-core)."""
    edges = []
    # 5-clique over 0..4
    for i in range(5):
        for j in range(i + 1, 5):
            edges.append((i, j))
    # triangle 4-10-11 (10 and 11 have degree 2 -> peel at k=3; their
    # removal must NOT dislodge clique member 4)
    edges += [(4, 10), (4, 11), (10, 11)]
    # chain 20-21-22-23
    edges += [(20, 21), (21, 22), (22, 23)]
    df = spark.createDataFrame(edges, "src long, dst long")

    def ref_kcore(es, k):
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        changed = True
        while changed:
            changed = False
            for n in list(adj):
                if len(adj[n]) < k:
                    for m in adj.pop(n):
                        adj[m].discard(n)
                    changed = True
        return {n: len(ns) for n, ns in adj.items()}

    from parcial_bigdata_spark.operators.graph import kcore

    for k in (2, 3, 4):
        got = {r.node: r.internal_degree for r in kcore(df, k=k).collect()}
        assert got == ref_kcore(edges, k), f"k={k}"
    # k=5: empty core (the clique has internal degree 4)
    assert kcore(df, k=5).count() == 0


def test_kcore_refuses_truncation(spark):
    """A long chain peels one node per end per round at k=2? No — a
    chain has no 2-core at all, but peeling it takes length/2 rounds;
    with max_rounds too small the operator must RAISE, never return a
    truncated (non-fixpoint) set."""
    import pytest as _pytest

    chain = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(chain, "src long, dst long")
    from parcial_bigdata_spark.operators.graph import kcore

    with _pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_rounds=3)
    # with budget it converges to the empty 2-core
    assert kcore(df, k=2, max_rounds=20).count() == 0


def test_bfs_hop_histogram_path_plus_island(spark):
    from parcial_bigdata_spark.operators.graph import bfs_hop_histogram

    # path 1-2-3-4-5 from source min(node)=1, plus the unreachable
    # island {6,7}
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "src long, dst long"
    )
    out = {r.hop: r.n_nodes for r in bfs_hop_histogram(e).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1, -1: 2}


def test_bfs_hop_histogram_truncates_visibly_at_max_hops(spark):
    from parcial_bigdata_spark.operators.graph import bfs_hop_histogram

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "src long, dst long"
    )
    out = {r.hop: r.n_nodes for r in bfs_hop_histogram(e, max_hops=2).collect()}
    # nodes 4 and 5 lie past the budget and join the island in the
    # unreached row — truncation is visible, never silent
    assert out == {0: 1, 1: 1, 2: 1, -1: 4}


def test_bfs_hop_histogram_direction_and_duplicates_ignored(spark):
    from parcial_bigdata_spark.operators.graph import bfs_hop_histogram

    e = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 2), (3, 3)], "src long, dst long"
    )
    out = {r.hop: r.n_nodes for r in bfs_hop_histogram(e).collect()}
    assert out == {0: 1, 1: 1, 2: 1, -1: 0}


def test_degree_histogram_log2_buckets(spark):
    from parcial_bigdata_spark.operators.graph import degree_histogram

    # star: hub degree 5 (bucket 2), five leaves degree 1 (bucket 0);
    # duplicate + reversed edges collapse
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 0), (0, 1)],
        "src long, dst long",
    )
    out = {r.log2_bucket: r for r in degree_histogram(e).collect()}
    assert (out[0].n_nodes, out[0].min_degree, out[0].max_degree) == (5, 1, 1)
    assert (out[2].n_nodes, out[2].min_degree, out[2].max_degree) == (1, 5, 5)
    assert set(out) == {0, 2}


def test_local_clustering_hand_computed(spark):
    """Triangle {1,2,3} + pendant chain 3-4-5: c_1 = c_2 = 1.0
    (bucket 9 via the clamp), c_3 = 1/3 (bucket 3), c_4 = 0 (bucket 0
    — the zero-triangle deg>=2 node the left join must keep), node 5
    deg 1 excluded."""
    from parcial_bigdata_spark.operators.graph import (
        local_clustering_histogram,
    )

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {
        r.bucket: (r.n_nodes, r.triangle_corners)
        for r in local_clustering_histogram(e).collect()
    }
    assert out == {0: (1, 0), 3: (1, 1), 9: (2, 2)}


def test_local_clustering_exact_integer_buckets(spark):
    """The decile is pure integer arithmetic: a node with c exactly on
    a bucket edge (c = 0.5 -> 20*t div wedges = 10*... ) lands
    deterministically.  K4 minus one edge: nodes a, d have deg 2 and
    sit in one triangle (c = 1.0 -> bucket 9); b, c have deg 3, 1
    triangle each of the 3 possible wedges (c = 1/3 -> bucket 3)."""
    from parcial_bigdata_spark.operators.graph import (
        local_clustering_histogram,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    out = {
        r.bucket: (r.n_nodes, r.triangle_corners)
        for r in local_clustering_histogram(e).collect()
    }
    # a: deg2 triangle abc c=1; d: deg2 triangle bcd c=1; b,c: deg3 t=2
    # -> c = 4/6 = 2/3 -> 20*2 div 6 = 6
    assert out == {6: (2, 4), 9: (2, 2)}
