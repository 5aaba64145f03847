"""DuckDB oracle SQL (ANSI) — setops family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "setop_status_bag_overlap": """
        WITH b1 AS (SELECT o_orderstatus FROM orders WHERE year(o_orderdate) = 1995),
             b2 AS (SELECT o_orderstatus FROM orders WHERE year(o_orderdate) = 1996),
             c AS (
                SELECT o_orderstatus, count(*) AS n_common
                FROM (SELECT * FROM b1 INTERSECT ALL SELECT * FROM b2)
                GROUP BY o_orderstatus
             ),
             s AS (
                SELECT o_orderstatus, count(*) AS n_surplus_y1
                FROM (SELECT * FROM b1 EXCEPT ALL SELECT * FROM b2)
                GROUP BY o_orderstatus
             )
        SELECT o_orderstatus,
               COALESCE(n_common, 0) AS n_common,
               COALESCE(n_surplus_y1, 0) AS n_surplus_y1
        FROM c FULL OUTER JOIN s USING (o_orderstatus)
        ORDER BY o_orderstatus
    """,
    "setop_repeat_customers": """
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY custkey
    """,
    "setop_churned_customers": """
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY custkey
    """,
    "setop_all_party_keys": """
        SELECT DISTINCT party_key, nationkey FROM (
            SELECT c_custkey AS party_key, c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_suppkey AS party_key, s_nationkey AS nationkey FROM supplier
        ) ORDER BY party_key, nationkey
    """,
}
