"""DuckDB oracle SQL (ANSI) — graph family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _WS_PAIRS_SQL,
    _pagerank_oracle_sql,
)

ORACLES: dict[str, str] = {
    "graph_kcore": """
        -- unrolled k-core peel (k=3, 8 rounds): the fixpoint is unique
        -- and peeling is monotone, so rounds past convergence are
        -- no-ops — the unroll depth only needs to be >= the true peel
        -- depth (the operator RAISES if it exceeds its own budget)
        WITH """ + _WS_PAIRS_SQL.replace(
        "ws AS (", "ws AS MATERIALIZED (", 1
    ).replace("pairs AS (", "pairs AS MATERIALIZED (", 1) + """,
        e0 AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM pairs
               UNION ALL SELECT doc_b, doc_a FROM pairs),
        """ + ",\n        ".join(
        # MATERIALIZED: every e_i is referenced twice (its m_i and the
        # next e), so default CTE inlining would expand 2^rounds scans
        # of the base table (observed: fd exhaustion at 8 rounds)
        f"""m{i} AS MATERIALIZED (SELECT s FROM e{i} GROUP BY s
                                  HAVING count(*) >= 3),
        e{i + 1} AS MATERIALIZED (SELECT e.s, e.t FROM e{i} e
                     JOIN m{i} a ON e.s = a.s
                     JOIN m{i} b ON e.t = b.s)"""
        for i in range(8)
    ) + """
        SELECT s AS node, count(*) AS internal_degree
        FROM e8 GROUP BY s HAVING count(*) >= 3 ORDER BY node
    """,
    "pagerank_suppliers": _pagerank_oracle_sql(4),
    "graph_triangle_stats": """
        -- global triangle census of the part co-purchase graph; the
        -- Spark side enumerates via degree-ordered orientation, the
        -- oracle via the id-ordered 3-way join — same triangle set
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (SELECT DISTINCT a.p AS u, b.p AS v
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        d AS (SELECT node, count(*) AS deg
              FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY node),
        tri AS (SELECT count(*) AS t FROM e e1
                JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        SELECT (SELECT count(*) FROM d) AS n_nodes,
               (SELECT count(*) FROM e) AS n_edges,
               (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM d)
                   AS n_wedges,
               (SELECT t FROM tri) AS n_triangles,
               3.0 * (SELECT t FROM tri)
                   / (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) FROM d)
                   AS clustering
    """,
    "graph_triangle_nodes": """
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (SELECT DISTINCT a.p AS u, b.p AS v
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        tri AS (SELECT e1.u AS a, e1.v AS x, e2.v AS y FROM e e1
                JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        SELECT node, count(*) AS n_triangles
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT x FROM tri
              UNION ALL SELECT y FROM tri)
        GROUP BY node
        ORDER BY n_triangles DESC, node
        LIMIT 10
    """,
    # per-node local clustering deciles over the co-purchase graph:
    # c_v = 2*T_v/(deg*(deg-1)) for deg >= 2 nodes, bucketed by PURE
    # INTEGER arithmetic (20*T div wedges, clamped to 9) — no IEEE
    # anywhere, so no cross-engine rounding surface; zero-triangle
    # deg>=2 nodes land in bucket 0 via the left join
    "graph_local_clustering": """
        WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e AS (SELECT DISTINCT a.p AS u, b.p AS v
              FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
        deg AS (SELECT node, count(*) AS deg FROM
                    (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                GROUP BY node),
        tri AS (SELECT e1.u AS a, e1.v AS x, e2.v AS y FROM e e1
                JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        tv AS (SELECT node, count(*) AS t
               FROM (SELECT a AS node FROM tri
                     UNION ALL SELECT x FROM tri
                     UNION ALL SELECT y FROM tri)
               GROUP BY node),
        per AS (SELECT d.node, d.deg, coalesce(tv.t, 0) AS t
                FROM deg d LEFT JOIN tv ON d.node = tv.node
                WHERE d.deg >= 2)
        SELECT CAST(least(20 * t // (deg * (deg - 1)), 9) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(t) AS BIGINT) AS triangle_corners
        FROM per GROUP BY 1 ORDER BY 1
    """,
}

# single-source BFS: the oracle's bounded recursive walk produces every
# (node, hop ≤ max) pair the layered expansion can reach; min(hop) per
# node is the BFS distance — identical to the frontier labeling
ORACLES["graph_bfs_distances"] = """
    WITH RECURSIVE
    op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
           FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    seed AS (SELECT min(u) AS s FROM e),
    walk(node, hop) AS (
        SELECT s, 0 FROM seed WHERE s IS NOT NULL
        UNION
        SELECT e.v, walk.hop + 1
        FROM walk JOIN e ON e.u = walk.node
        WHERE walk.hop < 6
    ),
    d AS (SELECT node, min(hop) AS hop FROM walk GROUP BY node),
    hops AS (SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
             FROM d GROUP BY hop),
    unreached AS (
        SELECT -1 AS hop,
               CAST((SELECT count(DISTINCT u) FROM e)
                    - (SELECT count(*) FROM d) AS BIGINT) AS n_nodes
    )
    SELECT hop, n_nodes FROM hops
    UNION ALL SELECT hop, n_nodes FROM unreached
    ORDER BY hop
"""

ORACLES["graph_degree_hist"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    d AS (SELECT node, count(*) AS degree
          FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
          GROUP BY node)
    SELECT CAST(length(bin(degree)) - 1 AS INT) AS log2_bucket,
           count(*) AS n_nodes,
           min(degree) AS min_degree, max(degree) AS max_degree
    FROM d GROUP BY 1 ORDER BY 1
"""


# symmetric-form exact-integer Pearson over both edge directions;
# one double division at the edge (no sqrt in the symmetric form)
ORACLES["graph_assortativity"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
    d AS (SELECT node, count(*) AS deg
          FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
          GROUP BY node),
    both_dir AS (
        SELECT u AS a, v AS b FROM e
        UNION ALL SELECT v, u FROM e
    ),
    sums AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(da.deg AS HUGEINT)) AS sx,
               sum(CAST(da.deg AS HUGEINT) * db.deg) AS sxy,
               sum(CAST(da.deg AS HUGEINT) * da.deg) AS sxx
        FROM both_dir
        JOIN d da ON da.node = both_dir.a
        JOIN d db ON db.node = both_dir.b
    )
    SELECT (SELECT count(*) FROM d) AS n_nodes,
           (SELECT count(*) FROM e) AS n_edges,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                THEN floor((CAST(n * sxy - sx * sx AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE))
                           * 1e6 + 0.5) / 1e6
           END AS assortativity
    FROM sums
"""


# R-round synchronous min-label propagation == min node id within R
# hops: the unrolled SQL twin is R closed-neighborhood min joins
ORACLES["graph_label_propagation"] = """
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    ed AS (
        SELECT a.p AS u, b.p AS v FROM op a JOIN op b
          ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2
    ), nbr AS (
        SELECT u AS a, v AS b FROM ed
        UNION ALL SELECT v, u FROM ed
        UNION ALL SELECT n, n FROM (
            SELECT u AS n FROM ed UNION SELECT v FROM ed)
    ), l1 AS (
        SELECT a AS node, min(b) AS lab FROM nbr GROUP BY a
    ), l2 AS (
        SELECT n.a AS node, min(l.lab) AS lab
        FROM nbr n JOIN l1 l ON l.node = n.b GROUP BY n.a
    ), l3 AS (
        SELECT n.a AS node, min(l.lab) AS lab
        FROM nbr n JOIN l2 l ON l.node = n.b GROUP BY n.a
    )
    SELECT lab AS community_id, count(*) AS n_members
    FROM l3 GROUP BY lab
    ORDER BY n_members DESC, community_id ASC LIMIT 20
"""

ORACLES["graph_common_neighbors"] = """
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), ed AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), sym AS (
        SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed
    ), deg AS (
        SELECT u, count(*) AS deg FROM sym GROUP BY u
    ), half AS (
        SELECT b.v AS z, b.u AS n FROM sym b
        WHERE b.v IN (SELECT u FROM deg WHERE deg <= 64)
    ), wedges AS (
        SELECT h1.n AS a, h2.n AS b, count(*) AS common
        FROM half h1 JOIN half h2 ON h1.z = h2.z AND h1.n < h2.n
        GROUP BY h1.n, h2.n
    ), cand AS (
        SELECT w.* FROM wedges w
        WHERE NOT EXISTS (SELECT 1 FROM ed
                          WHERE ed.u = w.a AND ed.v = w.b)
    )
    SELECT c.a AS u, c.b AS v, CAST(c.common AS BIGINT) AS common,
           CAST(da.deg AS BIGINT) AS deg_u, CAST(db.deg AS BIGINT) AS deg_v,
           floor(CAST(c.common AS DOUBLE)
                 / (da.deg + db.deg - c.common) * 1e6 + 0.5) / 1e6
               AS jaccard
    FROM cand c
    JOIN deg da ON da.u = c.a
    JOIN deg db ON db.u = c.b
    ORDER BY common DESC, jaccard DESC, u ASC, v ASC
    LIMIT 20
"""

# harmonic closeness: level-synchronous BFS unrolled to the declared
# 4-hop ball (DISTINCT per level — no path enumeration), harmonic sum
# in fixed ascending-hop order matching the Spark fold
ORACLES["graph_harmonic_closeness"] = """
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), ed AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), sym AS (
        SELECT u AS s, v AS t FROM ed UNION ALL SELECT v, u FROM ed
    ), seeds AS (
        SELECT s AS seed FROM (SELECT DISTINCT s FROM sym)
        ORDER BY s LIMIT 8
    ), h0 AS (
        SELECT seed, seed AS node FROM seeds
    ), h1 AS (
        SELECT DISTINCT h0.seed, sym.t AS node
        FROM h0 JOIN sym ON h0.node = sym.s
        WHERE sym.t NOT IN (SELECT node FROM h0 x WHERE x.seed = h0.seed)
    ), h2 AS (
        SELECT DISTINCT h1.seed, sym.t AS node
        FROM h1 JOIN sym ON h1.node = sym.s
        WHERE NOT EXISTS (SELECT 1 FROM h0 x
                          WHERE x.seed = h1.seed AND x.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h1 y
                          WHERE y.seed = h1.seed AND y.node = sym.t)
    ), h3 AS (
        SELECT DISTINCT h2.seed, sym.t AS node
        FROM h2 JOIN sym ON h2.node = sym.s
        WHERE NOT EXISTS (SELECT 1 FROM h0 x
                          WHERE x.seed = h2.seed AND x.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h1 y
                          WHERE y.seed = h2.seed AND y.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h2 z
                          WHERE z.seed = h2.seed AND z.node = sym.t)
    ), h4 AS (
        SELECT DISTINCT h3.seed, sym.t AS node
        FROM h3 JOIN sym ON h3.node = sym.s
        WHERE NOT EXISTS (SELECT 1 FROM h0 x
                          WHERE x.seed = h3.seed AND x.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h1 y
                          WHERE y.seed = h3.seed AND y.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h2 z
                          WHERE z.seed = h3.seed AND z.node = sym.t)
          AND NOT EXISTS (SELECT 1 FROM h3 w
                          WHERE w.seed = h3.seed AND w.node = sym.t)
    ), counts AS (
        SELECT seed,
               (SELECT count(*) FROM h1 WHERE h1.seed = seeds.seed) AS c1,
               (SELECT count(*) FROM h2 WHERE h2.seed = seeds.seed) AS c2,
               (SELECT count(*) FROM h3 WHERE h3.seed = seeds.seed) AS c3,
               (SELECT count(*) FROM h4 WHERE h4.seed = seeds.seed) AS c4
        FROM seeds
    )
    SELECT seed,
           CAST(c1 + c2 + c3 + c4 AS BIGINT) AS n_within_ball,
           floor((CAST(c1 AS DOUBLE) * (1.0 / 1.0)
                  + CAST(c2 AS DOUBLE) * (1.0 / 2.0)
                  + CAST(c3 AS DOUBLE) * (1.0 / 3.0)
                  + CAST(c4 AS DOUBLE) * (1.0 / 4.0)) * 1e6 + 0.5) / 1e6
               AS harmonic_closeness
    FROM counts ORDER BY seed
"""

# rich-club coefficients: top-k club by (degree DESC, node ASC), edge
# inside the club when both endpoint ranks <= k; k(k-1) is even so the
# /2 is exact
ORACLES["graph_rich_club"] = """
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), ed AS (
        SELECT DISTINCT a.p AS u, b.p AS v
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), sym AS (
        SELECT u, v FROM ed UNION ALL SELECT v, u FROM ed
    ), deg AS (
        SELECT u, count(*) AS deg FROM sym GROUP BY u
    ), top AS (
        SELECT u, row_number() OVER (ORDER BY deg DESC, u ASC) AS rk
        FROM deg ORDER BY deg DESC, u ASC LIMIT 100
    ), ranked AS (
        SELECT greatest(tu.rk, tv.rk) AS rmax
        FROM ed JOIN top tu ON ed.u = tu.u JOIN top tv ON ed.v = tv.u
    ), n AS (
        SELECT count(*) AS n_nodes FROM deg
    ), ks AS (
        SELECT unnest([25, 50, 100]) AS club_size
    )
    SELECT k.club_size,
           CAST(coalesce((SELECT count(*) FROM ranked
                          WHERE rmax <= k.club_size), 0) AS BIGINT)
               AS n_edges_within,
           CAST(least(k.club_size, n.n_nodes)
                * (least(k.club_size, n.n_nodes) - 1) / 2 AS BIGINT)
               AS n_possible,
           floor(CAST(coalesce((SELECT count(*) FROM ranked
                                WHERE rmax <= k.club_size), 0) AS DOUBLE)
                 / (least(k.club_size, n.n_nodes)
                    * (least(k.club_size, n.n_nodes) - 1) / 2)
                 * 1e6 + 0.5) / 1e6 AS coefficient
    FROM ks k, n ORDER BY club_size
"""
