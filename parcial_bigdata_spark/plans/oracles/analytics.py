"""DuckDB oracle SQL (ANSI) — analytics family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "revenue_share_by_priority": """
        WITH per AS (
            SELECT o_orderpriority,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS revenue
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, revenue,
               round(revenue / sum(revenue) OVER (), 6) AS share
        FROM per ORDER BY o_orderpriority
    """,
    "events_time_weighted_avg": """
        -- left-constant TWAP: exact DECIMAL(18,2)·micros numerator,
        -- doubles only at the final division (money_sum pattern)
        WITH s AS (
            SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
                   epoch_us(lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   )) - epoch_us(ts) AS dt
            FROM events
        )
        SELECT user_id, count(*) AS n_intervals,
               CAST(sum(dt) AS BIGINT) AS span_us,
               floor(CAST(sum(v * dt) AS DOUBLE)
                     / CAST(sum(dt) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS twap
        FROM s WHERE dt IS NOT NULL
        GROUP BY user_id HAVING sum(dt) > 0
        ORDER BY user_id
    """,
    # rank-based quintiles (custkey tiebreak) are exactly reproducible
    # cross-engine where value-percentile cutpoints tie-break
    # ambiguously; the oracle's plain windows ARE the semantics the
    # distributed rank must reproduce
    "customers_rfm_segments": """
        WITH m AS (
            SELECT o_custkey,
                   max(o_orderdate) AS last_order_date,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                              AS DOUBLE), 2) AS total_spend
            FROM orders GROUP BY o_custkey
        ), r AS (
            SELECT *,
                   row_number() OVER (ORDER BY last_order_date, o_custkey)
                       AS rr,
                   row_number() OVER (ORDER BY n_orders, o_custkey) AS fr,
                   row_number() OVER (ORDER BY total_spend, o_custkey) AS mr,
                   count(*) OVER () AS nc
            FROM m
        )
        SELECT o_custkey, last_order_date, n_orders, total_spend,
               CAST(1 + (5 * (rr - 1)) // nc AS INT) AS r_score,
               CAST(1 + (5 * (fr - 1)) // nc AS INT) AS f_score,
               CAST(1 + (5 * (mr - 1)) // nc AS INT) AS m_score,
               CAST(1 + (5 * (rr - 1)) // nc AS VARCHAR)
                   || CAST(1 + (5 * (fr - 1)) // nc AS VARCHAR)
                   || CAST(1 + (5 * (mr - 1)) // nc AS VARCHAR)
                   AS rfm_segment
        FROM r ORDER BY o_custkey
    """,
    "events_quantile_normalize": """
        WITH r AS (
            SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS rk,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events
        )
        SELECT event_id, event_type, value,
               round(CASE WHEN n > 1
                          THEN CAST(rk - 1 AS DOUBLE) / (n - 1)
                          ELSE 0.0 END, 6) AS qnorm
        FROM r ORDER BY event_id
    """,
    "events_funnel_steps": """
        WITH s0 AS (
            SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), s1 AS (
            SELECT events.user_id, min(events.ts) AS t
            FROM events JOIN s0 ON events.user_id = s0.user_id
            WHERE events.event_type = 'click' AND events.ts > s0.t
            GROUP BY events.user_id
        ), s2 AS (
            SELECT events.user_id, min(events.ts) AS t
            FROM events JOIN s1 ON events.user_id = s1.user_id
            WHERE events.event_type = 'purchase' AND events.ts > s1.t
            GROUP BY events.user_id
        )
        SELECT 0 AS step_idx, 'view' AS step, count(*) AS n_users FROM s0
        UNION ALL SELECT 1, 'click', count(*) FROM s1
        UNION ALL SELECT 2, 'purchase', count(*) FROM s2
        ORDER BY step_idx
    """,
    "events_retention_cohorts": """
        WITH cohort AS (
            SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), activity AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
               count(*) AS n_users
        FROM activity a JOIN cohort c USING (user_id)
        WHERE week >= cohort_week
        GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset
    """,
    "orders_monthly_yoy": """
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, n_orders, revenue,
               round(revenue - lag(revenue, 1) OVER (ORDER BY month), 2)
                   AS mom_delta,
               round(revenue - lag(revenue, 12) OVER (ORDER BY month), 2)
                   AS yoy_delta
        FROM monthly ORDER BY month
    """,
    "supplier_return_report": """
        SELECT l_suppkey, count(*) AS n_lines,
               CAST(sum(CASE WHEN l_returnflag = 'R'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
               floor(CAST(sum(CASE WHEN l_returnflag = 'R'
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1e6 + 0.5) / 1e6 AS return_share,
               CAST(round(sum(CAST(CASE WHEN l_returnflag = 'R'
                                        THEN l_extendedprice ELSE 0 END
                                   AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS returned_value
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
    """,
    "events_daily_users": """
        WITH actives AS (
            SELECT day, count(*) AS n_active FROM (
                SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                FROM events
            ) GROUP BY day
        ), news AS (
            SELECT day, count(*) AS n_new FROM (
                SELECT user_id, min(date_trunc('day', ts)) AS day
                FROM events GROUP BY user_id
            ) GROUP BY day
        )
        SELECT a.day, n_active,
               coalesce(n_new, 0) AS n_new,
               CAST(sum(coalesce(n_new, 0)) OVER (
                   ORDER BY a.day ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS cum_users
        FROM actives a LEFT JOIN news USING (day)
        ORDER BY a.day
    """,
    "events_value_outliers": """
        -- the same division/sqrt-cleared exact predicate:
        -- (n·v − S)²·(n−1) > 9·n·(n·Q − S²) over exact decimals
        WITH m AS (
            SELECT user_id, count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,2))) AS s,
                   sum(CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2))) AS q
            FROM events GROUP BY user_id
        )
        SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN
                   (CAST(n AS DECIMAL(38,0)) * CAST(value AS DECIMAL(18,2))
                    - CAST(s AS DECIMAL(38,2)))
                   * (CAST(n AS DECIMAL(38,0)) * CAST(value AS DECIMAL(18,2))
                      - CAST(s AS DECIMAL(38,2)))
                   * (CAST(n AS DECIMAL(38,0)) - 1)
                   > 9 * CAST(n AS DECIMAL(38,0))
                       * (CAST(n AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,4))
                          - CAST(s AS DECIMAL(38,2)) * CAST(s AS DECIMAL(38,2)))
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events JOIN m USING (user_id)
        WHERE n >= 3
        GROUP BY user_id ORDER BY user_id
    """,
    "revenue_gini_by_nation": """
        WITH spend AS (
            SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders GROUP BY o_custkey
        ), keyed AS (
            SELECT n_name AS nation, x, s.o_custkey
            FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
                         JOIN nation n ON c.c_nationkey = n.n_nationkey
        ), ranked AS (
            SELECT nation, x,
                   row_number() OVER (
                       PARTITION BY nation ORDER BY x, o_custkey
                   ) AS i
            FROM keyed
        )
        SELECT nation, count(*) AS n_customers,
               round(CAST(sum(x) AS DOUBLE), 2) AS total_revenue,
               floor(CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
                     / CAST(count(*) * sum(x) AS DOUBLE)
                     * 1e6 + 0.5) / 1e6 AS gini
        FROM ranked GROUP BY nation ORDER BY nation
    """,
    "parts_copurchase_rules": """
        WITH baskets AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk
            FROM lineitem
        ), pc AS (
            SELECT pk, count(*) AS n_baskets FROM baskets GROUP BY pk
        ), tot AS (
            SELECT count(DISTINCT okey) AS n_orders FROM baskets
        ), pairs AS (
            SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_together
            FROM baskets a JOIN baskets b
              ON a.okey = b.okey AND a.pk < b.pk
            GROUP BY part_a, part_b HAVING count(*) >= 2
        )
        SELECT part_a, part_b, n_together,
               ca.n_baskets AS n_a, cb.n_baskets AS n_b,
               floor(CAST(n_together AS DOUBLE) / ca.n_baskets
                     * 1e6 + 0.5) / 1e6 AS confidence_a_to_b,
               floor(CAST(n_together AS DOUBLE) * tot.n_orders
                     / (CAST(ca.n_baskets AS DOUBLE) * cb.n_baskets)
                     * 1e6 + 0.5) / 1e6 AS lift
        FROM pairs JOIN pc ca ON pairs.part_a = ca.pk
                   JOIN pc cb ON pairs.part_b = cb.pk, tot
        ORDER BY n_together DESC, part_a, part_b LIMIT 50
    """,
    "events_cohort_revenue": """
        WITH cohort AS (
            SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), purchases AS (
            SELECT user_id, date_trunc('week', ts) AS week,
                   CAST(value AS DECIMAL(18,2)) AS v
            FROM events WHERE event_type = 'purchase'
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week, week) // 7 AS INT)
                   AS week_offset,
               count(DISTINCT user_id) AS n_buyers,
               count(*) AS n_purchases,
               CAST(sum(v) AS DOUBLE) AS revenue
        FROM purchases p JOIN cohort c USING (user_id)
        WHERE week >= cohort_week
        GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset
    """,
    "orders_repeat_intervals": """
        WITH gaps AS (
            SELECT o_custkey,
                   date_diff('day',
                       lag(o_orderdate) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
            FROM orders
        )
        SELECT o_custkey, count(*) AS n_gaps,
               CAST(min(gap_days) AS INT) AS min_gap_days,
               floor(avg(gap_days) * 1e4 + 0.5) / 1e4 AS avg_gap_days,
               CAST(max(gap_days) AS INT) AS max_gap_days
        FROM gaps WHERE gap_days IS NOT NULL
        GROUP BY o_custkey ORDER BY o_custkey
    """,
    # U-shaped attribution: CASE weight literals are decimals in DuckDB
    # but convert to the identical nearest doubles; round(4) at the
    # edge on both sides
    "events_multi_touch_attribution": """
        WITH ev AS (SELECT * FROM events),
        p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                     value AS purchase_value
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS click_user, event_id AS click_id,
                     ts AS click_ts
              FROM ev WHERE event_type = 'click'),
        pr AS (
            SELECT p.user_id, purchase_id, purchase_value, click_id,
                   row_number() OVER (PARTITION BY purchase_id
                                      ORDER BY click_ts, click_id)
                       AS touch_rank,
                   count(*) OVER (PARTITION BY purchase_id) AS n_touches
            FROM p JOIN c ON p.user_id = c.click_user
             AND c.click_ts BETWEEN p.purchase_ts - INTERVAL 1 DAY
                                AND p.purchase_ts
        )
        SELECT user_id, purchase_id, click_id, touch_rank, n_touches,
               floor(purchase_value * CASE
                   WHEN n_touches = 1 THEN 1.0
                   WHEN n_touches = 2 THEN 0.5
                   WHEN touch_rank = 1 OR touch_rank = n_touches THEN 0.4
                   ELSE 0.2 / (n_touches - 2) END * 1e4 + 0.5) / 1e4
                   AS credit
        FROM pr ORDER BY purchase_id, touch_rank
    """,
    "events_transition_matrix": """
        WITH pairs AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ), counted AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM pairs WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_transitions,
               floor(CAST(n_transitions AS DOUBLE)
                     / sum(n_transitions) OVER (PARTITION BY from_type)
                     * 1e6 + 0.5) / 1e6 AS probability
        FROM counted ORDER BY from_type, to_type
    """,
    "events_time_decay_attribution": """
        -- decay weight 2^(-age_days) is an exact power of two, so the
        -- per-purchase weight sum is order-insensitive and the credit
        -- quotient bit-identical across engines
        WITH ev AS (SELECT * FROM events),
        p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
                     value AS purchase_value
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS click_user, event_id AS click_id,
                     ts AS click_ts
              FROM ev WHERE event_type = 'click'),
        pr AS (
            SELECT p.user_id, purchase_id, purchase_value, click_id,
                   pow(2.0, -CAST((epoch_us(p.purchase_ts)
                                   - epoch_us(c.click_ts))
                                  // 86400000000 AS DOUBLE)) AS h
            FROM p JOIN c ON p.user_id = c.click_user
             AND c.click_ts BETWEEN p.purchase_ts - INTERVAL 7 DAY
                                AND p.purchase_ts
        )
        SELECT user_id, purchase_id, click_id, h AS decay_weight,
               floor(purchase_value * h
                     / sum(h) OVER (PARTITION BY purchase_id)
                     * 1e4 + 0.5) / 1e4 AS credit
        FROM pr ORDER BY purchase_id, click_id
    """,
}

# rolling 7-day distinct users: the oracle mirrors the contribution-
# explode inversion (each (day, user) pair covers the 7 target days)
# rather than a per-day correlated rescan — same counts, same clipping
ORACLES["events_sliding_distinct_users"] = """
    WITH pairs AS (
        SELECT DISTINCT event_type, date_trunc('day', ts) AS day, user_id
        FROM events
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM pairs),
    -- MATERIALIZED: duckdb 1.0's binder hits an internal error when a
    -- downstream CTE filters on an unnest-projected alias inline
    contrib AS MATERIALIZED (
        SELECT p.event_type,
               unnest(generate_series(
                   p.day, p.day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS day,
               p.user_id, b.hi
        FROM pairs p, b
    ),
    counts AS (
        SELECT event_type, day, count(DISTINCT user_id) AS active_users_w
        FROM contrib WHERE day <= hi GROUP BY 1, 2
    ),
    grid AS MATERIALIZED (
        SELECT t.event_type, d.day
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM b) d
    )
    SELECT g.event_type, g.day,
           coalesce(c.active_users_w, 0) AS active_users_w
    FROM grid g LEFT JOIN counts c
        ON g.event_type = c.event_type AND g.day = c.day
    ORDER BY g.event_type, g.day
"""

# rank-selected median + MAD: both medians are the value at
# row_number floor((n+1)/2) under the (value, event_id) total order —
# the lower-middle ELEMENT, so the k·MAD cut is bit-exact cross-engine
ORACLES["events_mad_outliers"] = """
    WITH v AS (
        SELECT event_id, event_type, CAST(value AS DOUBLE) AS v FROM events
    ),
    c AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
    r AS (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v, event_id) AS rk
        FROM v
    ),
    med AS (
        SELECT r.event_type, r.v AS med
        FROM r JOIN c USING (event_type) WHERE r.rk = (c.n + 1) // 2
    ),
    d AS (
        SELECT v.event_id, v.event_type, abs(v.v - m.med) AS dev, m.med
        FROM v JOIN med m USING (event_type)
    ),
    r2 AS (
        SELECT event_type, dev,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY dev, event_id) AS rk
        FROM d
    ),
    mad AS (
        SELECT r2.event_type, r2.dev AS mad
        FROM r2 JOIN c USING (event_type) WHERE r2.rk = (c.n + 1) // 2
    )
    SELECT d.event_type, count(*) AS n_events,
           max(d.med) AS median_value, max(mad.mad) AS mad,
           CAST(sum(CASE WHEN d.dev > 3.0 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
"""

# OHLC bars: struct argmin/argmax over the (ts, event_id) total order
# pins the open/close payloads exactly; volume sums on the cents grid
ORACLES["events_hourly_ohlc"] = """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           count(*) AS n_events,
           CAST((min(struct_pack(ts := ts, eid := event_id,
                                 v := value))).v AS DOUBLE) AS open,
           CAST((max(struct_pack(ts := ts, eid := event_id,
                                 v := value))).v AS DOUBLE) AS close,
           max(value) AS high, min(value) AS low,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    ORDER BY event_type, hour
"""

ORACLES["events_interarrival_hist"] = """
    WITH g AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(length(bin(gap_s + 1)) - 1 AS INT) AS log2_bucket,
           count(*) AS n_gaps,
           min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["nation_supplier_hhi"] = """
    WITH per AS (
        SELECT s_nationkey,
               CAST(sum(CAST(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4)) * 10000 AS BIGINT))
                    AS HUGEINT) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_suppkey, s_nationkey
    )
    SELECT n_name, count(*) AS n_suppliers,
           CAST(sum(rev * rev) AS DOUBLE)
               / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE))
               AS hhi
    FROM per JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
"""

# behavioral entropy: H = ln(n) - (sum c*ln c)/n folded SEQUENTIALLY
# over the type-sorted count list — the same fixed evaluation order as
# the Spark aggregate()
ORACLES["events_user_entropy"] = """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    u AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
               count(*) AS n_types,
               list(CAST(c AS DOUBLE) ORDER BY event_type) AS cs
        FROM c GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           round(ln(CAST(n_events AS DOUBLE))
                 - list_sum(list_transform(cs, x -> x * ln(x)))
                   / CAST(n_events AS DOUBLE), 4) AS entropy
    FROM u ORDER BY user_id
"""

# ABC/Pareto: revenue on the integer 1e-4 grid end-to-end; the 80/95
# class cut-offs are exact integer cross-multiplications, never shares
ORACLES["parts_abc_classes"] = """
    WITH pr AS (
        SELECT l_partkey,
               sum(CAST(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS units
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, units,
               sum(units) OVER (ORDER BY units DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum,
               sum(units) OVER () AS tot
        FROM pr
    )
    SELECT abc_class, count(*) AS n_parts,
           CAST(sum(units) AS DOUBLE) / 10000.0 AS class_revenue
    FROM (
        SELECT units,
               CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                    WHEN cum * 20 <= tot * 19 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    GROUP BY abc_class ORDER BY abc_class
"""

# gaps-and-islands: day_index - row_number is constant exactly along a
# run of consecutive days — the island key needs no self-join
ORACLES["events_activity_streaks"] = """
    WITH pairs AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '2024-01-01',
                        date_trunc('day', ts)) AS d
        FROM events
    ),
    islands AS (
        SELECT user_id, d,
               d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                   AS anchor
        FROM pairs
    ),
    streaks AS (
        SELECT user_id, anchor, count(*) AS len
        FROM islands GROUP BY user_id, anchor
    )
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks, max(len) AS longest_streak
    FROM streaks GROUP BY user_id ORDER BY user_id
"""


def _autocorr_pairs_sql(lag: int) -> str:
    """One lag's (x, y) pair block over the dense hourly series."""
    return f"""
        SELECT a.event_type, {lag} AS lag_hours, a.c AS x, b.c AS y
        FROM series a JOIN series b
          ON b.event_type = a.event_type
         AND b.h = a.h + INTERVAL {lag} HOUR"""


# dense-grid exact-integer Pearson; r is one IEEE sequence over HUGEINT
# sums (sqrt is correctly rounded, so the doubles match Spark's)
ORACLES["events_hourly_autocorr"] = f"""
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(h) AS lo, max(h) AS hi
        FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), series AS (
        SELECT g.event_type, g.h, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.h = g.h
    ), pairs AS ({_autocorr_pairs_sql(1)}
        UNION ALL{_autocorr_pairs_sql(24)}
    ), sums AS (
        SELECT event_type, lag_hours,
               CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(x AS HUGEINT)) AS sx,
               sum(CAST(y AS HUGEINT)) AS sy,
               sum(CAST(x AS HUGEINT) * y) AS sxy,
               sum(CAST(x AS HUGEINT) * x) AS sxx,
               sum(CAST(y AS HUGEINT) * y) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, lag_hours, CAST(n AS BIGINT) AS n_pairs,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN floor((CAST(n * sxy - sx * sy AS DOUBLE)
                            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                   * CAST(n * syy - sy * sy AS DOUBLE)))
                           * 1e6 + 0.5) / 1e6
           END AS autocorr
    FROM sums ORDER BY event_type, lag_hours
"""


# event-differencing backlog: +placed/−completed integer deltas, one
# cumulative sum over the |dates|-row daily frame
ORACLES["orders_backlog_timeseries"] = """
    WITH placed AS (
        SELECT date_trunc('day', o_orderdate) AS day, count(*) AS placed
        FROM orders GROUP BY 1
    ),
    completed AS (
        SELECT date_trunc('day', done) AS day, count(*) AS completed
        FROM (SELECT l_orderkey, max(l_shipdate) AS done
              FROM lineitem GROUP BY 1)
        GROUP BY 1
    ),
    daily AS (
        SELECT coalesce(p.day, c.day) AS day,
               coalesce(placed, 0) AS placed,
               coalesce(completed, 0) AS completed
        FROM placed p FULL JOIN completed c ON p.day = c.day
    )
    SELECT day, placed, completed,
           CAST(sum(placed - completed) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS open_backlog
    FROM daily ORDER BY day
"""

# bounded-domain exact percentiles: (priority, days) counts, integer
# cross-multiplied CDF selection cum*100 >= p*n
ORACLES["orders_fulfillment_percentiles"] = """
    WITH lat AS (
        SELECT o_orderpriority,
               datediff('day', CAST(o_orderdate AS DATE),
                        CAST(done AS DATE)) AS days
        FROM orders
        JOIN (SELECT l_orderkey, max(l_shipdate) AS done
              FROM lineitem GROUP BY 1) d
          ON d.l_orderkey = o_orderkey
    ),
    cdf AS (
        SELECT o_orderpriority, days,
               sum(c) OVER (PARTITION BY o_orderpriority ORDER BY days
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               sum(c) OVER (PARTITION BY o_orderpriority) AS n
        FROM (SELECT o_orderpriority, days, count(*) AS c
              FROM lat GROUP BY 1, 2)
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           min(CASE WHEN cum * 100 >= 50 * n THEN days END) AS p50_days,
           min(CASE WHEN cum * 100 >= 90 * n THEN days END) AS p90_days,
           min(CASE WHEN cum * 100 >= 99 * n THEN days END) AS p99_days
    FROM cdf GROUP BY 1 ORDER BY 1
"""


# binary-segmentation change point: exact HUGEINT cumsums on the dense
# day grid; score = gap^2/(L*R*n) as one fixed IEEE sequence; argmax
# ties break on the earlier day
ORACLES["events_change_point"] = """
    WITH counts AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(d) AS lo, max(d) AS hi
        FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds
    ), series AS (
        SELECT g.event_type, g.d, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c
          ON c.event_type = g.event_type AND c.d = g.d
    ), cum AS (
        SELECT event_type, d,
               sum(CAST(c AS HUGEINT)) OVER (
                   PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sl,
               CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY d) AS HUGEINT) AS l,
               sum(CAST(c AS HUGEINT)) OVER (
                   PARTITION BY event_type) AS s,
               CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT)
                   AS n
        FROM series
    ), scored AS (
        SELECT event_type, d, l, n, sl, s,
               CAST(sl * (n - l) - (s - sl) * l AS DOUBLE)
                   * CAST(sl * (n - l) - (s - sl) * l AS DOUBLE)
                   / (CAST(l * (n - l) AS DOUBLE) * CAST(n AS DOUBLE))
                   AS score
        FROM cum WHERE l < n
    ), best AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY score DESC, d ASC) AS rk
        FROM scored
    )
    SELECT event_type, d AS split_after_day,
           CAST(l AS BIGINT) AS n_days_before,
           CAST(n - l AS BIGINT) AS n_days_after,
           floor((CAST(sl AS DOUBLE) / CAST(l AS DOUBLE)) * 1e6 + 0.5)
               / 1e6 AS mean_before,
           floor((CAST(s - sl AS DOUBLE) / CAST(n - l AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS mean_after,
           floor(score * 1e6 + 0.5) / 1e6 AS score
    FROM best WHERE rk = 1 ORDER BY event_type
"""


def _pareto_block_sql(q: int) -> str:
    return f"""
        SELECT {q} AS top_pct, count(*) AS n_customers,
               floor((CAST(sum(units) AS DOUBLE)
                      / CAST((SELECT tot FROM t) AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS revenue_share
        FROM r
        WHERE rk > (SELECT n FROM t)
                   - (((SELECT n FROM t) * {q} + 99) // 100)"""


# concentration curve: integer-grid revenue, ascending rank with
# custkey tiebreak, integer ceil cutoffs, one division per point
ORACLES["customers_pareto_share"] = f"""
    WITH pc AS (
        SELECT o_custkey,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                        AS BIGINT)) AS units
        FROM orders GROUP BY 1
    ),
    t AS (SELECT count(*) AS n, sum(units) AS tot FROM pc),
    r AS (
        SELECT o_custkey, units,
               row_number() OVER (ORDER BY units, o_custkey) AS rk
        FROM pc
    )
    SELECT * FROM ({_pareto_block_sql(1)}
    UNION ALL {_pareto_block_sql(5)}
    UNION ALL {_pareto_block_sql(10)}
    UNION ALL {_pareto_block_sql(25)})
    ORDER BY top_pct
"""


# deterministic multiplicative-hash split (pure int64 arithmetic both
# engines can compute); z is one IEEE sequence over integer counts
ORACLES["events_ab_proportion_test"] = """
    WITH users AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ), tagged AS (
        SELECT CASE WHEN ((user_id % 1048573) * 2654435761) % 4294967296
                         < 2147483648
                    THEN 'A' ELSE 'B' END AS variant,
               converted
        FROM users
    ), per AS (
        SELECT variant, count(*) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM tagged GROUP BY variant
    ), j AS (
        SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
        FROM (SELECT * FROM per WHERE variant = 'A') a
        CROSS JOIN (SELECT * FROM per WHERE variant = 'B') b
    )
    SELECT n_a, conv_a, n_b, conv_b,
           floor((CAST(conv_a AS DOUBLE) / n_a) * 1e6 + 0.5) / 1e6
               AS rate_a,
           floor((CAST(conv_b AS DOUBLE) / n_b) * 1e6 + 0.5) / 1e6
               AS rate_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
                THEN floor(((CAST(conv_a AS DOUBLE) / n_a
                             - CAST(conv_b AS DOUBLE) / n_b)
                  / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                         * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))) * 1e6 + 0.5) / 1e6
           END AS z_score,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
                THEN abs((CAST(conv_a AS DOUBLE) / n_a
                          - CAST(conv_b AS DOUBLE) / n_b)
               / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b))) > 1.959964
           END AS significant_95
    FROM j
"""

# lag-168 seasonal-naive backtest: integer forecasts => integer error
# sums over the dense final-week grid, one IEEE division per metric
ORACLES["events_seasonal_forecast"] = """
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY 1, 2
    ), t0 AS (
        SELECT date_trunc('day', max(h)) - INTERVAL 6 DAY AS t0 FROM counts
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(t0, t0 + INTERVAL 167 HOUR,
                                      INTERVAL 1 HOUR)) AS h
        FROM (SELECT DISTINCT event_type FROM counts) CROSS JOIN t0
    ), scored AS (
        SELECT g.event_type,
               coalesce(a.c, 0) AS a, coalesce(f.c, 0) AS f
        FROM grid g
        LEFT JOIN counts a
          ON a.event_type = g.event_type AND a.h = g.h
        LEFT JOIN counts f
          ON f.event_type = g.event_type
         AND f.h = g.h - INTERVAL 168 HOUR
    ), sums AS (
        SELECT event_type, count(*) AS n_hours,
               CAST(sum(a) AS BIGINT) AS total_actual,
               CAST(sum(f) AS BIGINT) AS total_forecast,
               CAST(sum(abs(a - f)) AS BIGINT) AS sae,
               CAST(sum((a - f) * (a - f)) AS BIGINT) AS sse,
               CAST(sum(a - f) AS BIGINT) AS se
        FROM scored GROUP BY 1
    )
    SELECT event_type, n_hours, total_actual, total_forecast,
           floor((CAST(sae AS DOUBLE) / n_hours) * 1e6 + 0.5) / 1e6 AS mae,
           floor(sqrt(CAST(sse AS DOUBLE) / n_hours) * 1e6 + 0.5) / 1e6
               AS rmse,
           floor((CAST(se AS DOUBLE) / n_hours) * 1e6 + 0.5) / 1e6 AS bias
    FROM sums ORDER BY event_type
"""


# top-k session journeys: identical (ts, event_id) total order, 30-min
# gap sessionization, first-5 prefix, count-desc/path-asc top 20
ORACLES["events_top_paths"] = """
    WITH flg AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT *, sum(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
        FROM flg
    ), ranked AS (
        SELECT user_id, sid, event_type,
               row_number() OVER (PARTITION BY user_id, sid
                                  ORDER BY ts, event_id) AS pos
        FROM sess
    ), paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY pos) AS path
        FROM ranked WHERE pos <= 5 GROUP BY user_id, sid
    )
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 20
"""

# Theil-Sen: pairwise slopes of exact DECIMAL daily totals on integer
# day indexes; median = avg of the two middle order statistics
ORACLES["events_theil_sen_trend"] = """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS i,
               sum(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY 1, 2
    ), slopes AS (
        SELECT a.event_type,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.i - a.i AS DOUBLE)
                   AS slope
        FROM daily a JOIN daily b
          ON b.event_type = a.event_type AND b.i > a.i
    ), ranked AS (
        SELECT event_type, slope,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM slopes
    ), mid AS (
        SELECT event_type, n, slope FROM ranked
        WHERE rk = CAST(floor((n + 1) / 2.0) AS BIGINT)
           OR rk = CAST(ceil((n + 1) / 2.0) AS BIGINT)
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_pairs,
           floor(((min(slope) + max(slope)) / 2.0) * 1e6 + 0.5) / 1e6
               AS ts_slope
    FROM mid GROUP BY event_type ORDER BY event_type
"""

# Kaplan-Meier life table: exact integer bin counts, ordered
# cumulative exp(sum(ln f)) survival with explicit extinction
ORACLES["orders_kaplan_meier"] = """
    WITH spans AS (
        SELECT CASE WHEN nd IS NOT NULL
                    THEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(nd AS DATE))
                    ELSE datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(hz AS DATE))
               END AS days,
               nd IS NOT NULL AS observed
        FROM (
            SELECT o_custkey, o_orderdate,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate,
                                                    o_orderkey) AS nd
            FROM orders
        ) CROSS JOIN (SELECT max(o_orderdate) AS hz FROM orders)
    ), bins AS (
        SELECT CAST(floor(days / 30) * 30 AS BIGINT) AS bin_start_days,
               CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events,
               CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_censored
        FROM spans GROUP BY 1
    ), risk AS (
        SELECT bin_start_days, n_events, n_censored,
               CAST((SELECT sum(n_events + n_censored) FROM bins)
                    - coalesce(sum(n_events + n_censored) OVER (
                          ORDER BY bin_start_days
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        FROM bins
    ), factored AS (
        SELECT *,
               1.0 - CAST(n_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
                   AS f
        FROM risk WHERE n_at_risk > 0
    ), surv AS (
        SELECT bin_start_days, n_at_risk, n_events, n_censored,
               CASE WHEN max(CASE WHEN f <= 0 THEN 1 ELSE 0 END) OVER (
                        ORDER BY bin_start_days
                        ROWS UNBOUNDED PRECEDING) = 1
                    THEN 0.0
                    ELSE exp(sum(ln(CASE WHEN f > 0 THEN f END))
                             OVER (ORDER BY bin_start_days
                                              ROWS UNBOUNDED PRECEDING))
               END AS s
        FROM factored
    )
    SELECT bin_start_days, n_at_risk, n_events, n_censored,
           floor(s * 1e6 + 0.5) / 1e6 AS survival
    FROM surv ORDER BY bin_start_days
"""

ORACLES["stats_welch_ttest"] = """
    WITH per AS (
        SELECT o_orderstatus,
               count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
               sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                        * CAST(o_totalprice AS DECIMAL(18,2))
                        AS DECIMAL(38,4))) AS q
        FROM orders WHERE o_orderstatus IN ('F', 'O')
        GROUP BY o_orderstatus
    ), j AS (
        SELECT a.n AS n_a, CAST(a.s AS DOUBLE) AS s_a,
               CAST(a.q AS DOUBLE) AS q_a,
               b.n AS n_b, CAST(b.s AS DOUBLE) AS s_b,
               CAST(b.q AS DOUBLE) AS q_b
        FROM (SELECT * FROM per WHERE o_orderstatus = 'F') a,
             (SELECT * FROM per WHERE o_orderstatus = 'O') b
    ), stats AS (
        SELECT n_a, n_b,
               s_a / n_a AS mean_a, s_b / n_b AS mean_b,
               (q_a - s_a * (s_a / n_a)) / (n_a - 1.0) AS var_a,
               (q_b - s_b * (s_b / n_b)) / (n_b - 1.0) AS var_b
        FROM j
    ), t AS (
        SELECT *,
               var_a / n_a AS sa, var_b / n_b AS sb,
               (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS tt
        FROM stats
    )
    SELECT n_a, n_b,
           floor(mean_a * 1e6 + 0.5) / 1e6 AS mean_a,
           floor(mean_b * 1e6 + 0.5) / 1e6 AS mean_b,
           -- 2 dp: at ~1e10 magnitude one double ulp exceeds a 1e-6
           -- grid (the decimal->double cast differs by 1 ulp between
           -- engines); see the Spark twin
           floor(var_a * 1e2 + 0.5) / 1e2 AS var_a,
           floor(var_b * 1e2 + 0.5) / 1e2 AS var_b,
           floor(tt * 1e6 + 0.5) / 1e6 AS t_stat,
           floor((sa + sb) * (sa + sb)
                 / (sa * sa / (n_a - 1.0) + sb * sb / (n_b - 1.0))
                 * 1e6 + 0.5) / 1e6 AS welch_dof,
           abs(tt) > 1.959964 AS significant_95
    FROM t
"""

ORACLES["events_poisson_rate_test"] = """
    WITH per AS (
        SELECT event_type,
               sum(CASE WHEN day(ts) < 16 THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END) AS c2
        FROM events WHERE day(ts) < 31
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
           CASE WHEN c2 > 0 THEN floor(CAST(c1 AS DOUBLE) / c2 * 1e6 + 0.5)
                / 1e6 END AS rate_ratio,
           CASE WHEN c1 + c2 > 0
                THEN floor((CAST(c1 AS DOUBLE) - c2)
                           / sqrt(CAST(c1 AS DOUBLE) + c2) * 1e6 + 0.5) / 1e6
           END AS z_score,
           CASE WHEN c1 + c2 > 0
                THEN abs((CAST(c1 AS DOUBLE) - c2)
                         / sqrt(CAST(c1 AS DOUBLE) + c2)) > 1.959964
           END AS significant_95
    FROM per ORDER BY event_type
"""

# Page's one-sided CUSUM: the recursion is replayed with a recursive
# CTE carrying full-precision state; output rounds via the floor form.
# Baseline mu/sigma use the IDENTICAL IEEE sequence as the Spark
# twin's pandas scan: mu = S/n, var = (Q - S*(S/n))/(n-1).
ORACLES["events_cusum_alarm"] = """
    WITH RECURSIVE counts AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(d) AS lo, max(d) AS hi FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds
    ), series AS (
        SELECT g.event_type, g.d, coalesce(c.c, 0) AS c,
               row_number() OVER (PARTITION BY g.event_type
                                  ORDER BY g.d) AS rn
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.d = c.d
    ), base AS (
        SELECT event_type, count(*) AS n,
               sum(c) AS s_sum, sum(c * c) AS q_sum
        FROM series WHERE rn <= 14 GROUP BY event_type
    ), params AS (
        SELECT event_type,
               CAST(s_sum AS DOUBLE) / n AS mu,
               CASE WHEN n >= 2
                    THEN (CAST(q_sum AS DOUBLE)
                          - s_sum * (CAST(s_sum AS DOUBLE) / n)) / (n - 1)
                    ELSE 0.0 END AS var
        FROM base
    ), ok AS (
        SELECT event_type, mu, sqrt(var) AS sigma FROM params WHERE var > 0
    ), scan AS (
        SELECT s.event_type, s.d, s.c, s.rn,
               greatest(0.0, (CAST(s.c AS DOUBLE) - o.mu) / o.sigma - 0.5)
                   AS state
        FROM series s JOIN ok o ON s.event_type = o.event_type
        WHERE s.rn = 1
        UNION ALL
        SELECT s.event_type, s.d, s.c, s.rn,
               greatest(0.0, p.state
                             + (CAST(s.c AS DOUBLE) - o.mu) / o.sigma - 0.5)
        FROM scan p
        JOIN series s ON s.event_type = p.event_type AND s.rn = p.rn + 1
        JOIN ok o ON s.event_type = o.event_type
    )
    SELECT event_type, d, CAST(c AS BIGINT) AS c,
           floor(state * 1e6 + 0.5) / 1e6 AS cusum,
           state > 4.0 AS alarm
    FROM scan
    UNION ALL
    SELECT s.event_type, s.d, CAST(s.c AS BIGINT) AS c,
           NULL AS cusum, NULL AS alarm
    FROM series s JOIN params p ON s.event_type = p.event_type
    WHERE p.var <= 0
    ORDER BY event_type, d
"""

# Holt's linear smoothing: recursive CTE carries (level, trend) in full
# precision through the IDENTICAL dyadic-coefficient IEEE sequence as
# the Spark twin's pandas scan; floor-form rounding at the edge only.
ORACLES["events_holt_forecast"] = """
    WITH RECURSIVE counts AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(d) AS lo, max(d) AS hi FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds
    ), series AS (
        SELECT g.event_type, coalesce(c.c, 0) AS c,
               row_number() OVER (PARTITION BY g.event_type
                                  ORDER BY g.d) AS rn
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.d = c.d
    ), scan AS (
        SELECT s1.event_type, CAST(2 AS BIGINT) AS rn,
               CAST(s1.c AS DOUBLE) AS level,
               CAST(s2.c - s1.c AS DOUBLE) AS trend
        FROM series s1 JOIN series s2
          ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
        UNION ALL
        SELECT s.event_type, s.rn,
               0.5 * CAST(s.c AS DOUBLE) + 0.5 * (p.level + p.trend),
               0.25 * ((0.5 * CAST(s.c AS DOUBLE)
                        + 0.5 * (p.level + p.trend)) - p.level)
                   + 0.75 * p.trend
        FROM scan p JOIN series s
          ON s.event_type = p.event_type AND s.rn = p.rn + 1
    ), finals AS (
        SELECT sc.event_type, sc.level, sc.trend
        FROM scan sc
        JOIN (SELECT event_type, max(rn) AS mx FROM series
              GROUP BY event_type) m
          ON sc.event_type = m.event_type AND sc.rn = m.mx
    )
    SELECT event_type, CAST(h AS INTEGER) AS horizon_days,
           floor(level * 1e6 + 0.5) / 1e6 AS level,
           floor(trend * 1e6 + 0.5) / 1e6 AS trend,
           floor((level + h * trend) * 1e6 + 0.5) / 1e6 AS forecast
    FROM finals, unnest(generate_series(1, 7)) AS t(h)
    ORDER BY event_type, horizon_days
"""

# Spark dayofweek is 1=Sunday..7=Saturday; DuckDB's is 0-based — +1.
ORACLES["events_weekday_seasonality"] = """
    WITH counts AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(d) AS lo, max(d) AS hi FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds
    ), series AS (
        SELECT g.event_type, g.d, coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.d = c.d
    ), per_dow AS (
        SELECT event_type, dayofweek(d) + 1 AS dow,
               count(*) AS n_days, sum(c) AS n_events
        FROM series GROUP BY 1, 2
    ), tot AS (
        SELECT *, sum(n_events) OVER (PARTITION BY event_type) AS te,
                  sum(n_days) OVER (PARTITION BY event_type) AS td
        FROM per_dow
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(n_events AS BIGINT) AS n_events,
           floor(CAST(n_events AS DOUBLE) / n_days * 1e6 + 0.5) / 1e6
               AS mean_daily,
           floor((CAST(n_events AS DOUBLE) / n_days)
                 / (CAST(te AS DOUBLE) / td) * 1e6 + 0.5) / 1e6
               AS seasonal_index
    FROM tot ORDER BY event_type, dow
"""

# Poisson bootstrap: identical integer hash -> weight mapping, exact
# decimal sums per resample, nearest-rank pick from the sorted
# 32-element mean list (positions 2 and 31, 1-based).
ORACLES["events_bootstrap_ci"] = """
    WITH vals AS (
        SELECT event_id, CAST(value AS DECIMAL(18,2)) AS v
        FROM events WHERE event_type = 'purchase'
    ), per AS (
        -- identical murmur-style avalanche as the Spark twin: the raw
        -- Knuth lattice left all resample weights in lockstep
        SELECT b, sum(w) AS wsum, sum(w * v) AS vsum
        FROM (SELECT b, v,
                     CASE WHEN h < 1580030168 THEN 0
                          WHEN h < 3160060337 THEN 1
                          WHEN h < 3950075421 THEN 2
                          WHEN h < 4213413783 THEN 3
                          WHEN h < 4279248373 THEN 4
                          WHEN h < 4292415291 THEN 5
                          WHEN h < 4294609777 THEN 6
                          WHEN h < 4294923276 THEN 7
                          ELSE 8 END AS w
              FROM (SELECT event_id, v, b,
                           xor(h1, h1 >> 15) AS h
                    FROM (SELECT event_id, v, b,
                                 (xor(h0, h0 >> 16) * 49979687)
                                     % 4294967296 AS h1
                          FROM (SELECT event_id, v, b,
                                       ((event_id % 1048573) * 2654435761
                                        + b * 40503 + 7) % 4294967296 AS h0
                                FROM vals,
                                     unnest(generate_series(0, 31))
                                         AS t(b)))))
        GROUP BY b
    ), means AS (
        SELECT list_sort(list(CAST(vsum AS DOUBLE) / CAST(wsum AS DOUBLE)))
            AS ms
        FROM per
    ), base AS (
        SELECT count(*) AS n_events, sum(v) AS tot FROM vals
    )
    SELECT n_events, 32 AS n_resamples,
           floor(CAST(tot AS DOUBLE) / n_events * 1e6 + 0.5) / 1e6
               AS mean_value,
           floor(ms[2] * 1e6 + 0.5) / 1e6 AS ci_lo,
           floor(ms[31] * 1e6 + 0.5) / 1e6 AS ci_hi
    FROM base, means
"""

ORACLES["events_conversion_latency"] = """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY user_id
    ), conv AS (
        SELECT (epoch_us(fp) - epoch_us(fv)) // 3600000000 AS hours
        FROM per_user
        WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
    ), counts AS (
        SELECT hours, count(*) AS c FROM conv GROUP BY hours
    ), cdf AS (
        SELECT hours, sum(c) OVER (ORDER BY hours) AS cum,
               (SELECT sum(c) FROM counts) AS n
        FROM counts
    ), viewers AS (
        SELECT count(*) AS n_viewers FROM per_user WHERE fv IS NOT NULL
    ), base AS (
        SELECT CAST(count(*) AS BIGINT) AS n_converted FROM conv
    )
    SELECT b.n_converted,
           CAST(v.n_viewers AS BIGINT) AS n_viewers,
           floor(CAST(b.n_converted AS DOUBLE) / v.n_viewers * 1e6 + 0.5)
               / 1e6 AS conversion_rate,
           (SELECT CAST(min(hours) AS BIGINT) FROM cdf
            WHERE cum * 100 >= 50 * n) AS p50_hours,
           (SELECT CAST(min(hours) AS BIGINT) FROM cdf
            WHERE cum * 100 >= 90 * n) AS p90_hours,
           (SELECT CAST(min(hours) AS BIGINT) FROM cdf
            WHERE cum * 100 >= 99 * n) AS p99_hours
    FROM base b, viewers v
"""

# Schuster periodogram ordinates at fixed candidate periods; 2*pi is
# the identical literal on both engines, sums round at the edge (4 dp)
ORACLES["events_periodogram"] = """
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT event_type, min(h) AS lo, max(h) AS hi FROM counts GROUP BY 1
    ), grid AS (
        SELECT event_type, lo,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), series AS (
        SELECT g.event_type,
               (epoch_us(g.h) - epoch_us(g.lo)) // 3600000000 AS t,
               coalesce(c.c, 0) AS c
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.h = c.h
    ), stats AS (
        SELECT event_type, count(*) AS n, sum(c) AS s
        FROM series GROUP BY 1
    ), centered AS (
        SELECT se.event_type, se.t, st.n,
               CAST(se.c AS DOUBLE) - CAST(st.s AS DOUBLE) / st.n AS d
        FROM series se JOIN stats st ON se.event_type = st.event_type
    ), expanded AS (
        SELECT c.*, p.period_hours
        FROM centered c,
             (SELECT unnest([24, 168, 12]) AS period_hours) p
    ), per AS (
        SELECT event_type, period_hours, max(n) AS n,
               sum(d * cos(6.283185307179586 * CAST(t AS DOUBLE)
                           / period_hours)) AS a,
               sum(d * sin(6.283185307179586 * CAST(t AS DOUBLE)
                           / period_hours)) AS b,
               sum(d * d) AS ss
        FROM expanded GROUP BY 1, 2
    )
    SELECT event_type, CAST(period_hours AS INTEGER) AS period_hours,
           CAST(n AS BIGINT) AS n_hours,
           round(2.0 * sqrt(a * a + b * b) / n, 4) AS amplitude,
           CASE WHEN ss > 0
                THEN round(2.0 * (a * a + b * b) / (n * ss), 4)
           END AS variance_share
    FROM per ORDER BY event_type, period_hours
"""

# Nelson-Aalen: the SAME life table as orders_kaplan_meier; the hazard
# is an ordered cumulative sum of IEEE divisions (sequential both
# engines), Fleming-Harrington survival = exp(-H)
ORACLES["orders_nelson_aalen"] = """
    WITH spans AS (
        SELECT CASE WHEN nd IS NOT NULL
                    THEN datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(nd AS DATE))
                    ELSE datediff('day', CAST(o_orderdate AS DATE),
                                  CAST(hz AS DATE))
               END AS days,
               nd IS NOT NULL AS observed
        FROM (
            SELECT o_custkey, o_orderdate,
                   lead(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate,
                                                    o_orderkey) AS nd
            FROM orders
        ) CROSS JOIN (SELECT max(o_orderdate) AS hz FROM orders)
    ), bins AS (
        SELECT CAST(floor(days / 30) * 30 AS BIGINT) AS bin_start_days,
               CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events,
               CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_censored
        FROM spans GROUP BY 1
    ), risk AS (
        SELECT bin_start_days, n_events, n_censored,
               CAST((SELECT sum(n_events + n_censored) FROM bins)
                    - coalesce(sum(n_events + n_censored) OVER (
                          ORDER BY bin_start_days
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        FROM bins
    ), hz AS (
        SELECT bin_start_days, n_at_risk, n_events, n_censored,
               sum(CAST(n_events AS DOUBLE) / n_at_risk) OVER (
                   ORDER BY bin_start_days ROWS UNBOUNDED PRECEDING
               ) AS h
        FROM risk WHERE n_at_risk > 0
    )
    SELECT bin_start_days, n_at_risk, n_events, n_censored,
           floor(h * 1e6 + 0.5) / 1e6 AS cum_hazard,
           floor(exp(-h) * 1e6 + 0.5) / 1e6 AS fh_survival
    FROM hz ORDER BY bin_start_days
"""

# Mann-Whitney U between return flags on the bounded quantity grid:
# integer double-ranks (2·cum_before + c + 1), exact rank/tie sums,
# the identical IEEE z sequence as the operator
ORACLES["stats_mann_whitney"] = """
    WITH counts AS (
        SELECT CAST(l_quantity AS DECIMAL(12,2)) AS v,
               sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cb
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL
        GROUP BY 1
    ), ranked AS (
        SELECT ca, cb, c,
               2 * coalesce(sum(c) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + c + 1 AS dr
        FROM (SELECT v, ca, cb, ca + cb AS c FROM counts)
    ), agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
               CAST(sum(cb) AS BIGINT) AS n_b,
               sum(CAST(ca AS HUGEINT) * dr) AS r2a,
               sum(CAST(c AS HUGEINT) * c * c - c) AS ties
        FROM ranked
    ), f AS (
        SELECT n_a, n_b, ties,
               CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
               CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
               (CAST(r2a AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1))
                   / 2.0 AS u_a
        FROM agg
    ), g AS (
        SELECT n_a, n_b, ties, u_a, na, nb,
               CASE WHEN n_a > 0 AND n_b > 0 THEN
                   (na * nb / 12.0)
                       * ((n + 1) - CAST(ties AS DOUBLE)
                              / (n * (n - 1))) END AS sigma2
        FROM f
    ), h AS (
        SELECT n_a, n_b, ties, u_a,
               CASE WHEN sigma2 > 0 THEN
                   (u_a - na * nb / 2.0) / sqrt(sigma2) END AS z
        FROM g
    )
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
               floor(u_a * 1e2 + 0.5) / 1e2 END AS u_stat,
           CAST(ties AS BIGINT) AS tie_term,
           floor(z * 1e6 + 0.5) / 1e6 AS z_score,
           abs(z) > 1.959964 AS significant_95
    FROM h
"""

# Mann-Kendall monotone trend on the daily event-count series: exact
# integer S over the date-ordered pairwise sign census, HUGEINT tie
# term, one IEEE continuity-corrected z sequence at 6 dp
ORACLES["events_mann_kendall_trend"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS y
        FROM events WHERE ts IS NOT NULL GROUP BY 1
    ), s AS (
        SELECT coalesce(sum(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END), 0)
                   AS s_stat
        FROM daily a JOIN daily b ON a.d < b.d
    ), ties AS (
        SELECT count(*) AS n_distinct, sum(t) AS n_days,
               coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                        0) AS tie
        FROM (SELECT y, count(*) AS t FROM daily GROUP BY y)
    ), f AS (
        SELECT n_days, s_stat, tie,
               (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
                * (2 * CAST(n_days AS DOUBLE) + 5)
                - CAST(tie AS DOUBLE)) / 18.0 AS var
        FROM ties, s
    ), g AS (
        SELECT n_days, s_stat, tie,
               CASE WHEN n_days > 1 AND var > 0 THEN
                   CASE WHEN s_stat > 0
                        THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var)
                        WHEN s_stat < 0
                        THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var)
                        ELSE 0.0 END END AS z
        FROM f
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(s_stat AS BIGINT) AS s_stat,
           CAST(tie AS BIGINT) AS tie_term,
           floor(z * 1e6 + 0.5) / 1e6 AS z_score,
           abs(z) > 1.959964 AS significant_95
    FROM g
"""

# Seasonal Mann-Kendall (weekday seasons): within-season pairwise sign
# census, exact integer S and 18*Var sums (HUGEINT), one IEEE z at 6 dp;
# weekday via epoch-days mod 7 (portable — Spark/DuckDB dayofweek anchor
# differently).  The modulus is the double-mod non-negative form: Spark
# pmod() is always in [0,6] but DuckDB '%' is sign-preserving, so a bare
# '% 7' would put pre-1970 dates in negative wd buckets and split the
# seasons differently from the engine (round-15 advice, medium).
ORACLES["events_seasonal_mann_kendall"] = """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, count(*) AS y,
               ((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7)
                + 7) % 7 AS wd
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 3
    ), s AS (
        SELECT coalesce(sum(CASE WHEN b.y > a.y THEN 1
                                 WHEN b.y < a.y THEN -1 ELSE 0 END), 0)
                   AS s_stat
        FROM daily a JOIN daily b ON a.wd = b.wd AND a.d < b.d
    ), per AS (
        SELECT wd, sum(t) AS n_w,
               coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
                        0) AS tie_w
        FROM (SELECT wd, y, count(*) AS t FROM daily GROUP BY wd, y)
        GROUP BY wd
    ), tot AS (
        SELECT count(*) AS n_seasons, sum(n_w) AS n_days,
               sum(tie_w) AS tie,
               sum(CAST(n_w AS HUGEINT) * (n_w - 1) * (2 * n_w + 5)
                   - tie_w) AS var18
        FROM per
    ), f AS (
        SELECT n_seasons, n_days, tie, s_stat,
               CAST(var18 AS DOUBLE) / 18.0 AS var
        FROM tot, s
    ), g AS (
        SELECT n_seasons, n_days, tie, s_stat,
               CASE WHEN n_days > 1 AND var > 0 THEN
                   CASE WHEN s_stat > 0
                        THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var)
                        WHEN s_stat < 0
                        THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var)
                        ELSE 0.0 END END AS z
        FROM f
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CAST(n_seasons AS INT) AS n_seasons,
           CAST(s_stat AS BIGINT) AS s_stat,
           CAST(tie AS BIGINT) AS tie_term,
           floor(z * 1e6 + 0.5) / 1e6 AS z_score,
           abs(z) > 1.959964 AS significant_95
    FROM g
"""

# McNemar's paired test on per-user conversion across the corpus' two
# time halves (Edwards continuity correction, 1 df).  The half
# boundary is the integer-microsecond midpoint tested as
# 2*us <= min+max — NO division, so no floor-vs-truncate divergence
# between engines (the seasonal-MK weekday advice bug class).
ORACLES["stats_mcnemar_paired"] = """
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), bounds AS (
        SELECT min(us) + max(us) AS mm FROM ev
    ), pu AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'purchase' AND 2 * us <= mm
                        THEN 1 ELSE 0 END) AS p1,
               max(CASE WHEN event_type = 'purchase' AND 2 * us > mm
                        THEN 1 ELSE 0 END) AS p2
        FROM ev, bounds GROUP BY user_id
    ), agg AS (
        SELECT count(*) AS n_users,
               coalesce(sum(p1 * (1 - p2)), 0) AS b,
               coalesce(sum((1 - p1) * p2), 0) AS c
        FROM pu
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(b AS BIGINT) AS h1_only,
           CAST(c AS BIGINT) AS h2_only,
           CASE WHEN b + c > 0 THEN
               floor(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                     / (b + c) * 1e6 + 0.5) / 1e6
           END AS chi2_cc,
           CASE WHEN b + c > 0 THEN
               CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                   / (b + c) > 3.841459
           END AS significant_95
    FROM agg
"""

# Friedman repeated-measures rank test: users as blocks, event types
# as treatments, per-user type counts as observations; only COMPLETE
# blocks enter.  Integer double-ranks within each block (the
# Mann-Whitney/Kruskal grid applied per user), HUGEINT sums, ONE IEEE
# multiply-divide at the end; significance against the fixed
# chi-square 0.95 quantile for df = k-1 <= 6.
ORACLES["stats_friedman_blocks"] = """
    WITH base AS (
        SELECT user_id, event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ), counts AS (
        SELECT user_id, event_type, count(*) AS y
        FROM base GROUP BY 1, 2
    ), kk AS (
        SELECT count(DISTINCT event_type) AS k FROM base
    ), complete AS (
        SELECT user_id FROM counts GROUP BY user_id
        HAVING count(*) = (SELECT k FROM kk)
    ), blocks AS (
        SELECT c.user_id, c.event_type, c.y
        FROM counts c JOIN complete USING (user_id)
    ), dr AS (
        SELECT user_id, event_type,
               2 * (rank() OVER (PARTITION BY user_id ORDER BY y) - 1)
               + count(*) OVER (PARTITION BY user_id, y) + 1 AS dr
        FROM blocks
    ), pt AS (
        SELECT event_type, sum(CAST(dr AS HUGEINT)) AS r2_t
        FROM dr GROUP BY 1
    ), agg AS (
        SELECT (SELECT count(*) FROM complete) AS n,
               (SELECT k FROM kk) AS k,
               coalesce((SELECT sum(r2_t * r2_t) FROM pt), 0) AS sr2,
               coalesce((SELECT sum(CAST(dr AS HUGEINT) * dr) FROM dr),
                        0) AS a4
    ), f AS (
        SELECT n, k,
               sr2 - CAST(n AS HUGEINT) * n * k * (k + 1) * (k + 1)
                   AS num,
               a4 - CAST(n AS HUGEINT) * k * (k + 1) * (k + 1) AS den
        FROM agg
    ), g AS (
        SELECT n, k,
               CASE WHEN n > 0 AND k > 1 AND den > 0 THEN
                   CAST(k - 1 AS DOUBLE) * CAST(num AS DOUBLE)
                       / CAST(den AS DOUBLE)
               END AS stat
        FROM f
    )
    SELECT CAST(n AS BIGINT) AS n_blocks,
           CAST(k AS INT) AS k_treatments,
           CAST(k - 1 AS INT) AS df,
           floor(stat * 1e6 + 0.5) / 1e6 AS chi2_f,
           CASE WHEN stat IS NOT NULL AND k - 1 <= 6 THEN
               stat > CASE k - 1 WHEN 1 THEN 3.841459
                                 WHEN 2 THEN 5.991465
                                 WHEN 3 THEN 7.814728
                                 WHEN 4 THEN 9.487729
                                 WHEN 5 THEN 11.070498
                                 WHEN 6 THEN 12.591587 END
           END AS significant_95
    FROM g
"""

# Kruskal-Wallis k-group rank omnibus across event types: pooled
# bounded-domain integer double-ranks, HUGEINT rank/tie sums, one
# IEEE H sequence at the 4 dp k-term-double-sum margin
ORACLES["stats_kruskal_wallis"] = """
    WITH vals AS (
        SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v FROM events
        WHERE value IS NOT NULL
    ), counts AS (
        SELECT event_type, v, count(*) AS c FROM vals GROUP BY 1, 2
    ), pooled AS (
        SELECT v, sum(c) AS ct FROM counts GROUP BY v
    ), dr AS (
        SELECT v, ct,
               2 * coalesce(sum(ct) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) + ct + 1 AS dr
        FROM pooled
    ), grp AS (
        SELECT c.event_type,
               sum(c.c) AS n_j,
               sum(CAST(c.c AS HUGEINT) * d.dr) AS r2_j
        FROM counts c JOIN dr d USING (v) GROUP BY 1
    ), ties AS (
        SELECT sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS tie FROM dr
    ), tot AS (
        SELECT count(*) AS k_groups, sum(n_j) AS n_total,
               sum(CAST(r2_j AS DOUBLE) * CAST(r2_j AS DOUBLE)
                   / (4.0 * CAST(n_j AS DOUBLE))) AS s
        FROM grp
    ), f AS (
        SELECT k_groups, n_total, s, tie,
               CAST(n_total AS DOUBLE) AS n,
               1.0 - CAST(tie AS DOUBLE)
                   / (CAST(n_total AS DOUBLE) * n_total * n_total
                      - n_total) AS corr
        FROM tot, ties
    )
    SELECT CAST(n_total AS BIGINT) AS n_total,
           CAST(k_groups AS INT) AS k_groups,
           CAST(k_groups - 1 AS INT) AS df,
           CAST(tie AS BIGINT) AS tie_term,
           CASE WHEN k_groups > 1 AND n_total > 1 AND corr > 0 THEN
               floor((12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0))
                     / corr * 1e4 + 0.5) / 1e4 END AS h_stat
    FROM f
"""

# Brown-Forsythe W across event types: exact cent-grid lower medians
# from the counting CTE, exact decimal deviation moments, the Konig
# numerator form, W rounded at the 4 dp k-term-double-sum margin
ORACLES["stats_levene_value"] = """
    WITH vals AS (
        SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v FROM events
        WHERE value IS NOT NULL
    ), counts AS (
        SELECT event_type, v, count(*) AS c FROM vals GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, v,
               sum(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS n_g
        FROM counts
    ), med AS (
        SELECT event_type, min(v) AS med FROM cum
        WHERE 2 * cum >= n_g GROUP BY 1
    ), z AS (
        SELECT vals.event_type, abs(vals.v - med.med) AS z
        FROM vals JOIN med USING (event_type)
    ), per AS (
        SELECT event_type, count(*) AS n, sum(z) AS sz,
               sum(CAST(z * z AS DECIMAL(38,4))) AS sq
        FROM z GROUP BY 1
    ), terms AS (
        SELECT n, sz, CAST(n AS DOUBLE) AS ng,
               CAST(sz AS DOUBLE) / CAST(n AS DOUBLE) AS zbar_g,
               CAST(sq AS DOUBLE) - CAST(sz AS DOUBLE)
                   * (CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)) AS den_g
        FROM per
    ), tot AS (
        SELECT count(*) AS k, sum(n) AS n_total, sum(sz) AS sz_all,
               sum(ng * zbar_g * zbar_g) AS num_raw, sum(den_g) AS den
        FROM terms
    ), f AS (
        SELECT k, n_total, num_raw, den,
               CAST(n_total AS DOUBLE) AS nn, CAST(k AS DOUBLE) AS kk,
               CAST(sz_all AS DOUBLE) / CAST(n_total AS DOUBLE) AS zbar
        FROM tot
    )
    SELECT CAST(k AS INT) AS k_groups,
           CAST(n_total AS BIGINT) AS n_total,
           floor(zbar * 1e6 + 0.5) / 1e6 AS mean_abs_dev,
           CASE WHEN k > 1 AND den > 0 THEN
               floor(((nn - kk) / (kk - 1))
                     * (num_raw - nn * zbar * zbar) / den * 1e4 + 0.5)
                   / 1e4 END AS w_stat,
           CAST(k - 1 AS INT) AS df1,
           CAST(n_total - k AS BIGINT) AS df2
    FROM f
"""

# classical OLS daily-revenue trend: six exact decimal/int64 moments,
# normal-equation slope/intercept/R2 in the identical IEEE sequence
ORACLES["orders_ols_trend"] = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), org AS (SELECT min(d) AS d0 FROM daily),
    m AS (
        SELECT date_diff('day', org.d0, daily.d) AS t, y FROM daily, org
    ), s AS (
        SELECT count(*) AS n_days, sum(t) AS st,
               sum(CAST(t AS BIGINT) * t) AS stt, sum(y) AS sy,
               sum(CAST(t AS DECIMAL(20,0)) * y) AS sty,
               sum(CAST(y * y AS DECIMAL(38,4))) AS syy
        FROM m
    ), f AS (
        SELECT n_days,
               CAST(n_days AS DOUBLE) AS n, CAST(st AS DOUBLE) AS std,
               CAST(stt AS DOUBLE) AS sttd, CAST(sy AS DOUBLE) AS syd,
               CAST(sty AS DOUBLE) AS styd, CAST(syy AS DOUBLE) AS syyd
        FROM s
    ), g AS (
        SELECT n_days, n, std, syd,
               n * sttd - std * std AS sxx,
               n * styd - std * syd AS sxy,
               n * syyd - syd * syd AS syy_c
        FROM f
    )
    SELECT CAST(n_days AS BIGINT) AS n_days,
           CASE WHEN sxx > 0 THEN
               floor(sxy / sxx * 1e6 + 0.5) / 1e6 END AS slope_per_day,
           CASE WHEN sxx > 0 THEN
               floor((syd - (sxy / sxx) * std) / n * 1e2 + 0.5) / 1e2
               END AS intercept,
           CASE WHEN sxx > 0 AND syy_c > 0 THEN
               floor(sxy * sxy / (sxx * syy_c) * 1e6 + 0.5) / 1e6
               END AS r_squared
    FROM g
"""

# chi-square independence status x priority: exact integer contingency
# counts, expected = rn * (cn / nn) in the identical IEEE order, chi2
# rounded at the 4 dp <=|cells|-term-double-sum margin
ORACLES["stats_chi2_independence"] = """
    WITH cells AS (
        SELECT o_orderstatus AS r, o_orderpriority AS c,
               count(*) AS n
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        GROUP BY 1, 2
    ), row_m AS (SELECT r, sum(n) AS rn FROM cells GROUP BY 1),
    col_m AS (SELECT c, sum(n) AS cn FROM cells GROUP BY 1),
    tot AS (SELECT sum(n) AS nn, count(*) AS n_cells FROM cells),
    dims AS (
        SELECT (SELECT count(*) FROM row_m) AS n_rows,
               (SELECT count(*) FROM col_m) AS n_cols
    ), terms AS (
        SELECT sum(
            (CAST(cells.n AS DOUBLE)
             - CAST(rn AS DOUBLE) * (CAST(cn AS DOUBLE)
                                     / CAST(nn AS DOUBLE)))
            * (CAST(cells.n AS DOUBLE)
               - CAST(rn AS DOUBLE) * (CAST(cn AS DOUBLE)
                                       / CAST(nn AS DOUBLE)))
            / (CAST(rn AS DOUBLE) * (CAST(cn AS DOUBLE)
                                     / CAST(nn AS DOUBLE)))
        ) AS chi2_raw
        FROM cells JOIN row_m USING (r) JOIN col_m USING (c), tot
    )
    SELECT CAST(nn AS BIGINT) AS n_total,
           CAST(n_rows AS INT) AS n_row_cats,
           CAST(n_cols AS INT) AS n_col_cats,
           CAST((n_rows - 1) * (n_cols - 1) AS INT) AS dof,
           floor(chi2_raw * 1e4 + 0.5) / 1e4 AS chi2,
           CASE WHEN (n_rows - 1) * (n_cols - 1) > 0 THEN
               floor(sqrt(chi2_raw
                          / (CAST(nn AS DOUBLE)
                             * CAST(least(n_rows - 1, n_cols - 1)
                                    AS DOUBLE))) * 1e6 + 0.5) / 1e6
               END AS cramers_v
    FROM terms, tot, dims
"""

# Kendall tau-b on the bounded quantity/discount grid: cell-frame
# self-join pair counts as exact HUGEINT/decimal sums, per-axis tie
# terms, one IEEE tau sequence
ORACLES["stats_kendall_tau"] = """
    WITH cells AS (
        SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
               CAST(l_discount AS DECIMAL(12,2)) AS y,
               count(*) AS n
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        GROUP BY 1, 2
    ), cd AS (
        SELECT sum(CASE WHEN b.y > a.y
                        THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
                   AS c_pairs,
               sum(CASE WHEN b.y < a.y
                        THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END)
                   AS d_pairs
        FROM cells a JOIN cells b ON b.x > a.x
    ), tx AS (
        -- t·(t−1) is always even, so // is exact and keeps the sum
        -- HUGEINT; / would coerce to DOUBLE and break exactness past
        -- 2^53 (round-13 ADVICE)
        SELECT sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS t1
        FROM (SELECT sum(n) AS t FROM cells GROUP BY x)
    ), ty AS (
        SELECT sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS t2
        FROM (SELECT sum(n) AS t FROM cells GROUP BY y)
    ), tot AS (SELECT sum(n) AS nn FROM cells),
    f AS (
        SELECT nn, c_pairs, d_pairs, t1, t2,
               CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2.0 AS n0
        FROM cd, tx, ty, tot
    )
    SELECT CAST(nn AS BIGINT) AS n_rows,
           CAST(c_pairs AS DOUBLE) AS concordant,
           CAST(d_pairs AS DOUBLE) AS discordant,
           CASE WHEN n0 > CAST(t1 AS DOUBLE) AND n0 > CAST(t2 AS DOUBLE)
                THEN floor((CAST(c_pairs AS DOUBLE)
                            - CAST(d_pairs AS DOUBLE))
                           / sqrt((n0 - CAST(t1 AS DOUBLE))
                                  * (n0 - CAST(t2 AS DOUBLE)))
                           * 1e6 + 0.5) / 1e6
                END AS tau_b
    FROM f
"""

# Wald-Wolfowitz runs test on daily revenue: exact decimal daily sums,
# lower-median counting, one lag over the day-ordered frame, integer
# n1/n2/R into one IEEE z sequence
ORACLES["orders_runs_test"] = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
    ), cum AS (
        SELECT y,
               count(*) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                   AS cum,
               count(*) OVER () AS n
        FROM daily
    ), med AS (
        SELECT min(y) AS med FROM cum WHERE 2 * cum >= n
    ), signed AS (
        SELECT d, daily.y > med.med AS above
        FROM daily, med WHERE daily.y != med.med
    ), runs AS (
        SELECT above,
               CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
                         OR lag(above) OVER (ORDER BY d) != above
                    THEN 1 ELSE 0 END AS new_run
        FROM signed
    ), agg AS (
        SELECT sum(CASE WHEN above THEN 1 ELSE 0 END) AS n_above,
               sum(CASE WHEN above THEN 0 ELSE 1 END) AS n_below,
               sum(new_run) AS n_runs
        FROM runs
    ), f AS (
        SELECT n_above, n_below, n_runs,
               CAST(n_above AS DOUBLE) AS n1, CAST(n_below AS DOUBLE) AS n2
        FROM agg
    ), g AS (
        SELECT n_above, n_below, n_runs,
               CASE WHEN n_above > 0 AND n_below > 0
                         AND 2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
                             / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)) > 0
                    THEN (CAST(n_runs AS DOUBLE)
                          - (2 * n1 * n2 / (n1 + n2) + 1))
                         / sqrt(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
                                / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))
                    END AS z
        FROM f
    )
    SELECT CAST(n_above AS BIGINT) AS n_above,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(n_runs AS BIGINT) AS n_runs,
           floor(z * 1e6 + 0.5) / 1e6 AS z_score,
           abs(z) > 1.959964 AS significant_95
    FROM g
"""

# Spearman rho on the bounded quantity/discount grid: double-rank
# margin frames (2*cum_before + c + 1, always integer), exact HUGEINT
# weighted moments, the correlation combined in doubles AFTER each
# exact moment casts (the identical IEEE sequence the Spark side runs)
ORACLES["stats_spearman_rho"] = """
    WITH cells AS (
        SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
               CAST(l_discount AS DECIMAL(12,2)) AS y,
               count(*) AS n
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        GROUP BY 1, 2
    ), xm AS (
        SELECT x, 2 * COALESCE(sum(cx) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + cx + 1 AS drx
        FROM (SELECT x, sum(n) AS cx FROM cells GROUP BY x)
    ), ym AS (
        SELECT y, 2 * COALESCE(sum(cy) OVER (ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + cy + 1 AS dry
        FROM (SELECT y, sum(n) AS cy FROM cells GROUP BY y)
    ), f AS (
        SELECT sum(n) AS nn,
               count(DISTINCT c.x) AS n_x_levels,
               count(DISTINCT c.y) AS n_y_levels,
               sum(CAST(n AS HUGEINT) * drx) AS sx,
               sum(CAST(n AS HUGEINT) * dry) AS sy,
               sum(CAST(n AS HUGEINT) * drx * drx) AS sxx,
               sum(CAST(n AS HUGEINT) * dry * dry) AS syy,
               sum(CAST(n AS HUGEINT) * drx * dry) AS sxy
        FROM cells c JOIN xm USING (x) JOIN ym USING (y)
    ), g AS (
        SELECT nn, n_x_levels, n_y_levels,
               CAST(nn AS DOUBLE) AS nnd, CAST(sx AS DOUBLE) AS sxd,
               CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
               CAST(syy AS DOUBLE) AS syyd, CAST(sxy AS DOUBLE) AS sxyd
        FROM f
    )
    SELECT CAST(nn AS BIGINT) AS n_rows,
           CAST(n_x_levels AS INT) AS n_x_levels,
           CAST(n_y_levels AS INT) AS n_y_levels,
           CASE WHEN nnd * sxxd - sxd * sxd > 0
                 AND nnd * syyd - syd * syd > 0
                THEN floor((nnd * sxyd - sxd * syd)
                           / sqrt((nnd * sxxd - sxd * sxd)
                                  * (nnd * syyd - syd * syd))
                           * 1e6 + 0.5) / 1e6
                END AS rho
    FROM g
"""

# one-way ANOVA on event value by type: exact decimal per-group
# moments, Koenig terms per group in a fixed IEEE sequence, the k-row
# reduce rounded at the 4 dp k-term-double-sum margin
ORACLES["stats_anova_oneway"] = """
    WITH per AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(value AS DECIMAL(12,2))) AS sv,
               sum(CAST(CAST(value AS DECIMAL(12,2))
                        * CAST(value AS DECIMAL(12,2))
                        AS DECIMAL(38,4))) AS sq
        FROM events
        WHERE value IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1
    ), terms AS (
        SELECT n, sv,
               CAST(sv AS DOUBLE)
                   * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) AS nmean2_g,
               CAST(sq AS DOUBLE)
                   - CAST(sv AS DOUBLE)
                     * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) AS ssw_g
        FROM per
    ), tot AS (
        SELECT count(*) AS k, sum(n) AS n_total, sum(sv) AS sv_all,
               sum(nmean2_g) AS nm2, sum(ssw_g) AS ssw
        FROM terms
    ), g AS (
        SELECT k, n_total, ssw,
               nm2 - CAST(sv_all AS DOUBLE)
                     * (CAST(sv_all AS DOUBLE)
                        / CAST(n_total AS DOUBLE)) AS ssb,
               CAST(n_total AS DOUBLE) AS nn, CAST(k AS DOUBLE) AS kk
        FROM tot
    )
    SELECT CAST(k AS INT) AS k_groups,
           CAST(n_total AS BIGINT) AS n_total,
           CAST(k - 1 AS INT) AS df1,
           CAST(n_total - k AS BIGINT) AS df2,
           floor(ssb * 1e4 + 0.5) / 1e4 AS ss_between,
           floor(ssw * 1e4 + 0.5) / 1e4 AS ss_within,
           CASE WHEN k > 1 AND n_total > k AND ssw > 0
                THEN floor((ssb / (kk - 1)) / (ssw / (nn - kk))
                           * 1e4 + 0.5) / 1e4
                END AS f_stat
    FROM g
"""

# first-order Markov transition census: the certified (ts, event_id)
# user-sequence ordering, integer counts, double/double probabilities
ORACLES["events_markov_transitions"] = """
    WITH steps AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND user_id IS NOT NULL
    ), counts AS (
        SELECT prev_type, next_type, count(*) AS n_trans
        FROM steps WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_trans,
           floor(CAST(n_trans AS DOUBLE)
                 / CAST(sum(n_trans) OVER (PARTITION BY prev_type)
                        AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS p_next
    FROM counts
    ORDER BY prev_type, next_type
"""

# lagged click->purchase cross-correlation on the zero-filled hour
# spine: exact HUGEINT moments per lag, correlation combined in doubles
# after the per-moment casts (the Spark side's IEEE sequence)
ORACLES["events_lag_xcorr"] = """
    WITH hourly AS (
        SELECT CAST(floor(epoch(date_trunc('hour', ts)) / 3600)
                    AS BIGINT) AS hid,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS cb
        FROM events
        WHERE ts IS NOT NULL AND event_type IN ('click', 'purchase')
        GROUP BY 1
    ), bounds AS (SELECT min(hid) AS h0, max(hid) AS h1 FROM hourly),
    spine AS (
        SELECT unnest(generate_series(h0, h1)) AS hid FROM bounds
    ), filled AS (
        SELECT s.hid, coalesce(h.ca, 0) AS ca, coalesce(h.cb, 0) AS cb
        FROM spine s LEFT JOIN hourly h ON h.hid = s.hid
    ), paired AS (
        SELECT l.lag, a.ca, b.cb
        FROM (SELECT unnest(generate_series(0, 6)) AS lag) l
        JOIN filled a ON TRUE
        JOIN filled b ON b.hid = a.hid + l.lag
    ), sums AS (
        SELECT lag, count(*) AS n_hours,
               sum(CAST(ca AS HUGEINT)) AS sa,
               sum(CAST(cb AS HUGEINT)) AS sb,
               sum(CAST(ca AS HUGEINT) * ca) AS saa,
               sum(CAST(cb AS HUGEINT) * cb) AS sbb,
               sum(CAST(ca AS HUGEINT) * cb) AS sab
        FROM paired GROUP BY 1
    ), g AS (
        SELECT lag, n_hours, sa, sb,
               CAST(n_hours AS DOUBLE) AS nn, CAST(sa AS DOUBLE) AS sad,
               CAST(sb AS DOUBLE) AS sbd, CAST(saa AS DOUBLE) AS saad,
               CAST(sbb AS DOUBLE) AS sbbd, CAST(sab AS DOUBLE) AS sabd
        FROM sums
    )
    SELECT CAST(lag AS INT) AS lag_hours,
           CAST(n_hours AS BIGINT) AS n_hours,
           CAST(sa AS BIGINT) AS n_a_events,
           CAST(sb AS BIGINT) AS n_b_events,
           CASE WHEN nn * saad - sad * sad > 0
                 AND nn * sbbd - sbd * sbd > 0
                THEN floor((nn * sabd - sad * sbd)
                           / sqrt((nn * saad - sad * sad)
                                  * (nn * sbbd - sbd * sbd))
                           * 1e6 + 0.5) / 1e6
                END AS xcorr
    FROM g ORDER BY lag_hours
"""
