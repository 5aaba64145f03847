"""DuckDB oracle SQL (ANSI) — tpch family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
               round(avg(l_quantity), 2) AS avg_qty,
               round(avg(l_extendedprice), 2) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q6_revenue_forecast": """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q14_promo_share": """
        SELECT round(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
    "q18_large_orders": """
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               round(total_qty, 2) AS total_qty
        FROM orders
        JOIN (
            SELECT l_orderkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    "q19_brand_bands": """
        SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q15_top_suppliers": """
        WITH per_supp AS (
            SELECT l_suppkey,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM per_supp)
        ORDER BY s_suppkey
    """,
    "q22_wealthy_inactive": """
        SELECT c_nationkey, count(*) AS n_customers,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "q7_nation_volume": """
        SELECT supp_nation, cust_nation, l_year,
               CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM (
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            WHERE sn.n_name IN ('NATION_3', 'NATION_8')
              AND cn.n_name IN ('NATION_3', 'NATION_8')
              AND sn.n_name <> cn.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                     / sum(volume), 6) AS mkt_share
        FROM (
            SELECT year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year ORDER BY o_year
    """,
    "q2_min_cost_supplier": """
        WITH psupp AS (
            SELECT l_partkey, l_suppkey,
                   CAST(round(CAST(sum(l_extendedprice) / sum(l_quantity)
                                   AS DECIMAL(18,6)), 4) AS DOUBLE) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ), rsupp AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), priced AS (
            SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost,
                   min(unit_cost) OVER (PARTITION BY p_partkey) AS min_cost
            FROM psupp
            JOIN part ON l_partkey = p_partkey
            JOIN rsupp ON l_suppkey = s_suppkey
            WHERE p_size = 5 AND p_type LIKE '%PROMO%'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
        FROM priced WHERE unit_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q12_priority_lines": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "q20_dominant_suppliers": """
        WITH lf AS (
            SELECT l_partkey, l_suppkey, l_quantity
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
        ), ps AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lf GROUP BY 1, 2
        ), dom AS (
            SELECT DISTINCT l_suppkey FROM (
                SELECT l_suppkey, qty,
                       sum(qty) OVER (PARTITION BY l_partkey) AS part_total
                FROM ps
            ) WHERE qty > 0.5 * part_total
        )
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
        ORDER BY s_name
    """,
    "q9_profit_by_nation": """
        SELECT nation, o_year,
               CAST(round(sum(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS sum_profit
        FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS amount
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_name LIKE '%red%'
        )
        GROUP BY nation, o_year
        ORDER BY nation ASC, o_year DESC
    """,
    "q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q11_important_parts": """
        WITH per_part AS (
            SELECT l_partkey,
                   sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,4))) AS pv_dec
            FROM lineitem GROUP BY l_partkey
        ), t AS (
            SELECT CAST(sum(pv_dec) AS DOUBLE) / count(*) * 1.2 AS threshold
            FROM per_part
        )
        SELECT l_partkey, CAST(round(pv_dec, 2) AS DOUBLE) AS part_value
        FROM per_part, t
        WHERE CAST(pv_dec AS DOUBLE) > threshold
        ORDER BY part_value DESC, l_partkey ASC
    """,
    "q16_supplier_variety": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
    """,
    "q17_small_qty_revenue": """
        SELECT CAST(round(CAST(sum(l_extendedprice) / 7.0 AS DECIMAL(18,4)), 2)
                    AS DOUBLE) AS avg_yearly
        FROM lineitem l
        JOIN part ON l.l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity)
            FROM lineitem l2
            JOIN part p2 ON l2.l_partkey = p2.p_partkey
            WHERE p2.p_brand = 'Brand#23' AND l2.l_partkey = l.l_partkey
          )
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 20
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
    "q5_region_revenue": """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE s_nationkey = c_nationkey
        GROUP BY n_name ORDER BY revenue DESC, n_name ASC
    """,
}
