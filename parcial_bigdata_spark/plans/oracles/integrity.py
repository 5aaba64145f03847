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


# two-period column-stats drift: one-pass period aggregates, exact
# DECIMAL(18,2) price metrics, deterministic (count, value)-argmax mode
ORACLES["integrity_schema_drift"] = """
    WITH base AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-05-01'
                    THEN 'baseline' ELSE 'current' END AS period,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               o_orderstatus AS status, o_orderpriority AS priority
        FROM orders
    ), num AS (
        SELECT period, count(*) AS n,
               count(price) AS n_price, sum(price) AS sum_price,
               min(price) AS min_price, max(price) AS max_price,
               count(status) AS n_status,
               count(DISTINCT status) AS d_status,
               count(priority) AS n_priority,
               count(DISTINCT priority) AS d_priority
        FROM base GROUP BY period
    ), status_mode AS (
        SELECT period, 'status_mode_share' AS metric,
               floor((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5)
                   / 1e6 AS value
        FROM (
            SELECT period, c,
                   sum(c) OVER (PARTITION BY period) AS tot,
                   row_number() OVER (PARTITION BY period
                                      ORDER BY c DESC, status DESC) AS rn
            FROM (SELECT period, status, count(*) AS c
                  FROM base WHERE status IS NOT NULL GROUP BY 1, 2)
        ) WHERE rn = 1
    ), priority_mode AS (
        SELECT period, 'priority_mode_share' AS metric,
               floor((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e6 + 0.5)
                   / 1e6 AS value
        FROM (
            SELECT period, c,
                   sum(c) OVER (PARTITION BY period) AS tot,
                   row_number() OVER (PARTITION BY period
                                      ORDER BY c DESC, priority DESC) AS rn
            FROM (SELECT period, priority, count(*) AS c
                  FROM base WHERE priority IS NOT NULL GROUP BY 1, 2)
        ) WHERE rn = 1
    ), metrics AS (
        SELECT period, 'price_null_rate' AS metric,
               floor(((n - n_price) * 1.0 / n) * 1e6 + 0.5) / 1e6 AS value
        FROM num
        UNION ALL
        SELECT period, 'price_mean',
               floor((CAST(sum_price AS DOUBLE) / n_price) * 1e6 + 0.5)
                   / 1e6
        FROM num
        UNION ALL
        SELECT period, 'price_min', CAST(min_price AS DOUBLE) FROM num
        UNION ALL
        SELECT period, 'price_max', CAST(max_price AS DOUBLE) FROM num
        UNION ALL
        SELECT period, 'status_null_rate',
               floor(((n - n_status) * 1.0 / n) * 1e6 + 0.5) / 1e6
        FROM num
        UNION ALL
        SELECT period, 'status_distinct', CAST(d_status AS DOUBLE) FROM num
        UNION ALL
        SELECT period, 'priority_null_rate',
               floor(((n - n_priority) * 1.0 / n) * 1e6 + 0.5) / 1e6
        FROM num
        UNION ALL
        SELECT period, 'priority_distinct', CAST(d_priority AS DOUBLE)
        FROM num
        UNION ALL SELECT * FROM status_mode
        UNION ALL SELECT * FROM priority_mode
    ), wide AS (
        SELECT metric,
               max(CASE WHEN period = 'baseline' THEN value END)
                   AS baseline,
               max(CASE WHEN period = 'current' THEN value END) AS current
        FROM metrics GROUP BY metric
    )
    SELECT metric, baseline, current,
           floor((current - baseline) * 1e6 + 0.5) / 1e6 AS change
    FROM wide ORDER BY metric
"""
