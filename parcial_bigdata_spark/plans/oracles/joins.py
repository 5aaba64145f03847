"""DuckDB oracle SQL (ANSI) — joins family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _ASOF_TOLERANCE_S,
)

ORACLES: dict[str, str] = {
    "range_value_bands": """
        SELECT COALESCE(band, 'unbanded') AS band,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events
        LEFT JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
                          (150.0, 1000.0, 'high')) AS bands(lo, hi, band)
          ON value >= lo AND value < hi
        GROUP BY 1 ORDER BY 1
    """,
    "subquery_big_spenders": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 50000
          )
        ORDER BY c_custkey
    """,
    "join_revenue_by_brand": """
        SELECT p_brand,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "semi_join_big_orders": """
        SELECT o_orderstatus, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 45
        )
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "anti_join_idle_customers": """
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "asof_purchase_signup": """
        SELECT p.event_id, p.user_id, p.ts, p.value, s.signup_ts
        FROM (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ) p
        ASOF LEFT JOIN (
            SELECT user_id, ts, ts AS signup_ts FROM events
            WHERE event_type = 'signup'
        ) s ON p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.event_id
    """,
    # DuckDB has no ASOF tolerance; the gate is applied on top of the
    # native ASOF match — identical to merge_asof because the asof match
    # IS the closest candidate, so failing the window means no match.
    "asof_purchase_signup_tolerance": f"""
        SELECT event_id, user_id, ts, value,
               CASE WHEN epoch_us(ts) - epoch_us(signup_ts)
                         <= {_ASOF_TOLERANCE_S} * 1000000::BIGINT
                    THEN signup_ts END AS signup_ts
        FROM (
            SELECT p.event_id, p.user_id, p.ts, p.value, s.signup_ts
            FROM (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ) p
            ASOF LEFT JOIN (
                SELECT user_id, ts, ts AS signup_ts FROM events
                WHERE event_type = 'signup'
            ) s ON p.user_id = s.user_id AND p.ts >= s.ts
        ) ORDER BY event_id
    """,
    # the blocked fuzzy join is lossless, so the oracle is the naive
    # levenshtein join over the same deterministic corruption
    "fuzzy_match_part_names": """
        WITH dirty AS (
            SELECT p_partkey AS dirty_id,
                   substr(p_name, 1, 2) || substr(p_name, 4) AS dirty_name
            FROM part WHERE p_partkey % 3 = 0
        ),
        clean AS (SELECT DISTINCT p_name AS clean_name FROM part)
        SELECT dirty_id, dirty_name, clean_name,
               levenshtein(dirty_name, clean_name) AS edit_dist
        FROM dirty JOIN clean
          ON abs(length(dirty_name) - length(clean_name)) <= 2
         AND levenshtein(dirty_name, clean_name) <= 2
        ORDER BY dirty_id, clean_name
    """,
}
