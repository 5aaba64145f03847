"""DuckDB oracle SQL (ANSI) — windows family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _ewma_oracle_sql,
)

ORACLES: dict[str, str] = {
    "window_rank_bands": """
        SELECT o_orderstatus, o_orderkey, o_totalprice, price_quartile,
               pct_rank, cume
        FROM (
            SELECT o_orderstatus, o_orderkey, o_totalprice,
                   ntile(4) OVER w AS price_quartile,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cume,
                   row_number() OVER w AS rn
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        )
        WHERE rn <= 3
        ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
    """,
    "gapfill_daily_series": """
        WITH obs AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   round(max(value), 2) AS max_value
            FROM events
            WHERE event_type = 'purchase' AND value > 120 AND user_id < 40
            GROUP BY 1, 2
        ), span AS (
            SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
            FROM events
        ), days AS (
            SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM span
        ), grid AS (
            SELECT u.user_id, d.day
            FROM (SELECT DISTINCT user_id FROM obs) u CROSS JOIN days d
        )
        SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
               last_value(o.max_value IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value,
               o.max_value IS NOT NULL AS observed
        FROM grid g
        LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
        ORDER BY g.user_id, g.day
    """,
    "agg_user_value_trend": """
        SELECT user_id, count(*) AS n_events,
               round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
                   AS slope_per_day
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "agg_user_value_trend_pandas": """
        SELECT user_id, count(*) AS n_events,
               round(regr_slope(value, epoch_us(ts) / 86400000000.0), 4)
                   AS slope_per_day
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "window_daily_delta": """
        WITH daily AS (
            SELECT date_trunc('day', ts) AS d, round(avg(value), 4) AS avg_value
            FROM events GROUP BY 1
        )
        SELECT d, avg_value,
               round(avg_value - lag(avg_value) OVER (ORDER BY d ASC), 4) AS delta
        FROM daily ORDER BY d
    """,
    "window_value_delta": """
        SELECT event_id, user_id, ts,
               round(value - lag(value) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
        FROM events ORDER BY event_id
    """,
    "window_topk_per_user": """
        SELECT user_id, rnk, event_id, value FROM (
            SELECT user_id, event_id, value,
                   row_number() OVER
                       (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
            FROM events
        ) WHERE rnk <= 3 ORDER BY user_id, rnk
    """,
    "window_running_total": """
        SELECT event_id, user_id, ts,
               round(sum(value) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_value
        FROM events ORDER BY event_id
    """,
    "sessionize_events": """
        WITH g AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ), s AS (
            SELECT *, CAST(sum(new_sess) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS session_seq
            FROM g
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               round(sum(value), 2) AS session_value
        FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq
    """,
    "hourly_rollup": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "session_overlap_pairs": """
        WITH g AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ), s AS (
            SELECT *, sum(new_sess) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_seq
            FROM g
        ), sess AS (
            SELECT user_id, session_seq,
                   epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
            FROM s GROUP BY user_id, session_seq
        ), pairs AS (
            SELECT a.user_id AS user_a, b.user_id AS user_b,
                   least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS ov_us
            FROM sess a JOIN sess b
              ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us
        )
        SELECT user_a, user_b, count(*) AS n_overlaps,
               CAST(sum(ov_us) AS BIGINT) AS total_overlap_us
        FROM pairs GROUP BY user_a, user_b ORDER BY user_a, user_b
    """,
    "window_time_range_avg": """
        SELECT event_id, user_id, ts, round(value, 2) AS value,
               round(avg(value) OVER w, 4) AS trailing_avg,
               count(*) OVER w AS trailing_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
    """,
    "agg_user_bookends": """
        -- struct argmin/argmax on the (ts, event_id) total order; both
        -- engines compare the struct lexicographically, so the bookend
        -- payloads are pinned exactly
        SELECT user_id, count(*) AS n_events,
               (min(struct_pack(ts := ts, eid := event_id,
                                et := event_type, val := value))).et
                   AS first_type,
               CAST((min(struct_pack(ts := ts, eid := event_id,
                                     et := event_type, val := value))).val
                    AS DOUBLE) AS first_value,
               (max(struct_pack(ts := ts, eid := event_id,
                                et := event_type, val := value))).et
                   AS last_type,
               CAST((max(struct_pack(ts := ts, eid := event_id,
                                     et := event_type, val := value))).val
                    AS DOUBLE) AS last_value,
               epoch_us((max(struct_pack(ts := ts, eid := event_id,
                                         et := event_type, val := value))).ts)
               - epoch_us((min(struct_pack(ts := ts, eid := event_id,
                                           et := event_type, val := value))).ts)
                   AS span_us
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "window_user_drawdown": """
        WITH per AS (
            SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
                   max(CAST(value AS DECIMAL(18,2))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS peak
            FROM events
        )
        SELECT user_id, count(*) AS n_events,
               CAST(max(peak) AS DOUBLE) AS peak_value,
               CAST(max(peak - v) AS DOUBLE) AS max_drawdown
        FROM per GROUP BY user_id ORDER BY user_id
    """,
    "window_sliding_counts": """
        WITH ex AS (
            SELECT event_type, value,
                   unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL '30 minutes']) AS window_start
            FROM events
        )
        SELECT window_start, event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM ex GROUP BY window_start, event_type
        ORDER BY window_start, event_type
    """,
    "window_ewma_smooth": _ewma_oracle_sql(0.3, 8),
}

# exact trailing-7-row median: odd full frames make median() hit the
# middle element exactly (h = (n-1)/2 integral — no interpolation)
ORACLES["window_rolling_median"] = """
    WITH r AS (
        SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               median(CAST(value AS DOUBLE)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ) AS rolling_median
        FROM events
    )
    SELECT user_id, event_id, ts, value, rolling_median
    FROM r WHERE rn >= 7
    ORDER BY user_id, ts, event_id
"""
