"""DuckDB oracle SQL (ANSI) — integrity family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _expectations_oracle,
)

ORACLES: dict[str, str] = {
    "integrity_fk_audit": """
        -- per-FK-edge orphan accounting; on a consistent TPC-H corpus
        -- every orphan count is zero and the totals pin the audit's
        -- reference arithmetic
        """
    + "\n        UNION ALL\n        ".join(
        f"""SELECT '{c}' AS child_table, '{fk}' AS fk_column,
               count(*) AS n_child_rows,
               CAST(sum(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_fk,
               CAST(sum(CASE WHEN {fk} IS NOT NULL AND {pk_ref} IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows,
               CAST(count(DISTINCT CASE WHEN {fk} IS NOT NULL
                                         AND {pk_ref} IS NULL
                                        THEN {fk} END)
                    AS BIGINT) AS n_orphan_keys
        FROM {c} LEFT JOIN {p} ON {c}.{fk} = {p}.{pk}"""
        for c, fk, p, pk in [
            ("customer", "c_nationkey", "nation", "n_nationkey"),
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem", "l_partkey", "part", "p_partkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            ("nation", "n_regionkey", "region", "r_regionkey"),
            ("orders", "o_custkey", "customer", "c_custkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ]
        for pk_ref in [f"{p}.{pk}"]
    )
    + """
        ORDER BY child_table, fk_column
    """,
    "profile_orders_table": """
        SELECT 'o_orderkey' AS col_name, count(*) - count(o_orderkey) AS n_nulls,
               count(DISTINCT o_orderkey) AS n_distinct FROM orders
        UNION ALL
        SELECT 'o_custkey', count(*) - count(o_custkey),
               count(DISTINCT o_custkey) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice) FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*) - count(o_orderdate),
               count(DISTINCT o_orderdate) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority) FROM orders
        ORDER BY col_name
    """,
    "skew_lineitem_suppkey": """
        WITH c AS (
            SELECT l_suppkey AS key_value, count(*) AS n_rows
            FROM lineitem GROUP BY 1
        ), t AS (
            SELECT sum(n_rows) AS total_rows, count(*) AS n_keys FROM c
        )
        SELECT key_value, n_rows,
               round(CAST(n_rows AS DOUBLE) / total_rows, 6) AS share,
               round(CAST(n_rows AS DOUBLE) / (CAST(total_rows AS DOUBLE) / n_keys), 4)
                   AS skew_ratio
        FROM c, t
        ORDER BY n_rows DESC, key_value ASC LIMIT 10
    """,
}

ORACLES["integrity_expectations"] = _expectations_oracle()

# FD audit: one grouped distinct-count per declared dependency; the two
# single-column dependencies are EXPECTED to fail — branching quantified
ORACLES["integrity_functional_deps"] = """
    SELECT * FROM (
        SELECT 'order_to_returnflag' AS dep_id,
               'l_orderkey' AS determinant,
               'l_returnflag' AS dependent,
               count(*) AS n_keys,
               CAST(sum(CASE WHEN b > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating_keys,
               max(b) AS max_branching,
               CAST(max(b) = 1 AS INT) AS holds
        FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS b
              FROM lineitem GROUP BY 1)
        UNION ALL
        SELECT 'part_to_supplier', 'l_partkey', 'l_suppkey',
               count(*),
               CAST(sum(CASE WHEN b > 1 THEN 1 ELSE 0 END) AS BIGINT),
               max(b), CAST(max(b) = 1 AS INT)
        FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS b
              FROM lineitem GROUP BY 1)
        UNION ALL
        SELECT 'pk_order_line',
               'l_orderkey + l_linenumber',
               'l_partkey + l_suppkey + l_quantity',
               count(*),
               CAST(sum(CASE WHEN b > 1 THEN 1 ELSE 0 END) AS BIGINT),
               max(b), CAST(max(b) = 1 AS INT)
        FROM (SELECT l_orderkey, l_linenumber,
                     count(DISTINCT (l_partkey, l_suppkey, l_quantity)) AS b
              FROM lineitem GROUP BY 1, 2)
    ) ORDER BY dep_id
"""


# Benford expected shares: the SAME Python literals the Spark plan
# injects via F.lit (engine log10 is only 1-ulp accurate and must not
# appear in the comparison path)
from parcial_bigdata_spark.operators.profiling import BENFORD_SHARES

_BENFORD_ROWS = "\n        UNION ALL ".join(
    f"SELECT {d} AS first_digit, {p!r} AS expected_share"
    for d, p in sorted(BENFORD_SHARES.items())
)

# first digit from the STRING of the floored integer part (never
# floor(log10): 1-ulp wobble misbuckets exact powers of ten)
ORACLES["integrity_benford_audit"] = f"""
    WITH amounts AS (
        SELECT o_totalprice AS amt FROM orders WHERE o_totalprice >= 1
    ), counts AS (
        SELECT CAST(substr(CAST(CAST(floor(amt) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS first_digit,
               count(*) AS n_amounts
        FROM amounts GROUP BY 1
    ), total AS (SELECT count(*) AS n FROM amounts),
    digits AS (
        {_BENFORD_ROWS}
    )
    SELECT d.first_digit,
           coalesce(c.n_amounts, 0) AS n_amounts,
           floor((CAST(coalesce(c.n_amounts, 0) AS DOUBLE)
                  / CAST(t.n AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS observed_share,
           d.expected_share,
           floor(((CAST(coalesce(c.n_amounts, 0) AS DOUBLE)
                   - CAST(t.n AS DOUBLE) * d.expected_share)
                  * (CAST(coalesce(c.n_amounts, 0) AS DOUBLE)
                     - CAST(t.n AS DOUBLE) * d.expected_share)
                  / (CAST(t.n AS DOUBLE) * d.expected_share))
                 * 1e6 + 0.5) / 1e6 AS chisq_term
    FROM digits d
    LEFT JOIN counts c USING (first_digit)
    CROSS JOIN total t
    ORDER BY d.first_digit
"""
