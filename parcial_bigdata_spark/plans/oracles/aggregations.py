"""DuckDB oracle SQL (ANSI) — aggregations family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "distinct_customers_per_status": """
        SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "rollup_order_totals": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price,
               count(*) AS n_orders
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "cube_lineitem_counts": """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "top_orders_by_price": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "stats_price_by_status": """
        SELECT o_orderstatus, count(*) AS n_orders,
               round(avg(o_totalprice), 2) AS avg_price,
               round(stddev_samp(o_totalprice), 2) AS sd_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               CAST(round(CAST(quantile_cont(o_totalprice, 0.5)
                               AS DECIMAL(18,3)), 2) AS DOUBLE) AS median_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pivot_priority_counts": """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
               count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
               count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
               count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "grouping_sets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "unpivot_status_metrics": """
        WITH a AS (
            SELECT o_orderstatus,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS sum_price,
                   CAST(round(CAST(avg(o_totalprice) AS DECIMAL(18,4)), 2)
                        AS DOUBLE) AS avg_price,
                   CAST(count(*) AS DOUBLE) AS n_orders
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, 'sum_price' AS metric, sum_price AS value FROM a
        UNION ALL
        SELECT o_orderstatus, 'avg_price', avg_price FROM a
        UNION ALL
        SELECT o_orderstatus, 'n_orders', n_orders FROM a
        ORDER BY o_orderstatus, metric
    """,
    "percentile_value_by_type": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50_value,
               round(quantile_cont(value, 0.9), 4) AS p90_value,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "correlation_stats": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
               round(stddev_samp(l_extendedprice), 2) AS stddev_price,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "price_histogram": """
        SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
               CAST(floor(o_totalprice / 25000.0) AS BIGINT) * 25000.0 AS bucket_low,
               count(*) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    "equidepth_price_histogram": """
        -- Same cutpoints (exact interpolated percentiles — Spark
        -- percentile() and DuckDB quantile_cont agree bit-for-bit on
        -- doubles, the percentile_value_by_type precedent), same
        -- strictly-greater bucket fold.
        WITH cuts AS (
            SELECT ["""
    + ", ".join(
        f"quantile_cont(CAST(o_totalprice AS DOUBLE), {i / 10})"
        for i in range(1, 10)
    )
    + """] AS cs
            FROM orders
        ), b AS (
            SELECT o_totalprice,
                   ("""
    + " + ".join(
        f"CASE WHEN CAST(o_totalprice AS DOUBLE) > cs[{i}] THEN 1 ELSE 0 END"
        for i in range(1, 10)
    )
    + """) AS bucket
            FROM orders, cuts
        )
        SELECT bucket, count(*) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM b GROUP BY bucket ORDER BY bucket
    """,
    "stats_price_boxplot": """
        WITH pct AS (
            SELECT o_orderstatus,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS q1,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS med,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS q3
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o.o_orderstatus, count(*) AS n_orders,
               round(min(q1), 4) AS q1, round(min(med), 4) AS median,
               round(min(q3), 4) AS q3, round(min(q3 - q1), 4) AS iqr,
               CAST(sum(CASE WHEN CAST(o_totalprice AS DOUBLE)
                                  < q1 - 1.5 * (q3 - q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
               CAST(sum(CASE WHEN CAST(o_totalprice AS DOUBLE)
                                  > q3 + 1.5 * (q3 - q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
        FROM orders o JOIN pct USING (o_orderstatus)
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
    """,
    # rank-trimmed robust means: integer rank bounds make row selection
    # bit-deterministic (value-percentile cutpoints can wobble one ulp
    # and flip a boundary row); sums exact decimal, double at the edge
    "stats_price_trimmed_means": """
        WITH r AS (
            SELECT o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   row_number() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice, o_orderkey) AS rk,
                   count(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        ), t AS (
            SELECT o_orderstatus, v, rk, n,
                   CAST(floor(n * 5 / 100) AS BIGINT) AS k
            FROM r
        ), g AS (
            SELECT o_orderstatus,
                   max(n) AS n_orders,
                   max(k) AS n_trimmed_each_side,
                   sum(CASE WHEN rk > k AND rk <= n - k THEN v END) AS s_in,
                   max(CASE WHEN rk = k + 1 THEN v END) AS lo,
                   max(CASE WHEN rk = n - k THEN v END) AS hi
            FROM t GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, n_orders, n_trimmed_each_side,
               round(CAST(s_in / (n_orders - 2 * n_trimmed_each_side)
                          AS DOUBLE), 4) AS trimmed_mean,
               round(CAST((s_in + n_trimmed_each_side * lo
                           + n_trimmed_each_side * hi) / n_orders
                          AS DOUBLE), 4) AS winsorized_mean,
               CAST(lo AS DOUBLE) AS lo_clamp,
               CAST(hi AS DOUBLE) AS hi_clamp
        FROM g ORDER BY o_orderstatus
    """,
}

ORACLES["approx_distinct_parts"] = """
    SELECT count(DISTINCT l_partkey) AS n_exact_parts,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           1 AS approx_distinct_ok, 1 AS p50_ok, 1 AS p95_ok, 1 AS p99_ok
    FROM lineitem
"""

ORACLES["approx_percentile_value_by_type"] = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50_value,
           round(quantile_cont(value, 0.9), 4) AS p90_value,
           count(*) AS n_events,
           1 AS p50_ok, 1 AS p90_ok
    FROM events GROUP BY event_type ORDER BY event_type
"""

ORACLES["parts_price_elasticity"] = """
    WITH m AS (
        SELECT p_brand, count(*) AS n,
               sum(ln(p_retailprice)) AS sx,
               sum(ln(l_quantity)) AS sy,
               sum(ln(p_retailprice) * ln(l_quantity)) AS sxy,
               sum(ln(p_retailprice) * ln(p_retailprice)) AS sxx,
               sum(ln(l_quantity) * ln(l_quantity)) AS syy
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 4)
               AS elasticity,
           round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n,
                 4) AS intercept,
           round((sxy - sx * sy / n) * (sxy - sx * sy / n)
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 4) AS r2
    FROM m ORDER BY p_brand
"""
