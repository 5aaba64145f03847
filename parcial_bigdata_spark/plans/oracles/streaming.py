"""DuckDB oracle SQL (ANSI) — streaming family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

ORACLES: dict[str, str] = {
    "streaming_sessionize": """
        WITH g AS (
            SELECT user_id, event_id, ts, value,
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
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS session_value
        FROM s GROUP BY user_id, session_seq
        ORDER BY user_id, session_start
    """,
    # the streaming twin must converge to the exact batch answer on a
    # bounded replay — same oracle as hourly_rollup by construction
    "streaming_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "streaming_tier_rollup": """
        -- batch twin of the stream-static enrichment: the static tier
        -- dimension is a pure function of user_id, so the broadcast
        -- join folds into a projection here
        SELECT date_trunc('hour', ts) AS window_start,
               CAST(user_id % 3 AS INT) AS tier,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # row-level streaming dedup over a 3x-duplicated replay collapses
    # to the plain batch census of the original table
    "streaming_dedup_census": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # the stream-stream interval join emits every match on a bounded
    # replay — the oracle is the plain batch interval join.  The self
    # join goes through a CTE so the module-level "FROM events"
    # microsecond-cast rewrite applies exactly once (a bare aliased
    # self-join would collide with the rewrite's own table alias).
    "streaming_click_attribution": """
        WITH ev AS (SELECT * FROM events)
        SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value,
               c.event_id AS click_id, c.ts AS click_ts
        FROM ev p JOIN ev c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts BETWEEN p.ts - INTERVAL 1 DAY AND p.ts
        ORDER BY purchase_id, click_id
    """,
    # the streaming CDC MERGE converges to the batch full-outer merge:
    # update row wins on key match, inserted otherwise, base kept
    # elsewhere — update files partition keys disjointly, so batch
    # grouping cannot change the fixpoint
    "streaming_cdc_apply": """
        WITH base AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 4 <> 0
        ), upd AS (
            SELECT o_orderkey, 'U' AS o_orderstatus,
                   round(CAST(o_totalprice AS DOUBLE) * 2, 2) AS o_totalprice
            FROM orders WHERE o_orderkey % 3 = 0
        )
        SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN u.o_orderkey IS NOT NULL
                    THEN u.o_orderstatus ELSE b.o_orderstatus
               END AS o_orderstatus,
               CASE WHEN u.o_orderkey IS NOT NULL
                    THEN u.o_totalprice ELSE b.o_totalprice
               END AS o_totalprice
        FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        ORDER BY o_orderkey
    """,
}

# stateful streaming prefix z-score: the oracle is the batch window
# formulation — strictly-earlier moments per (ts, event_id) order,
# same exact-integer predicate (HUGEINT here, python ints in the state
# transition), so the stateful emission hash-matches on bounded replay
ORACLES["streaming_running_zscore"] = """
    WITH v AS (
        SELECT user_id, event_id, ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM events
    ),
    p AS (
        SELECT user_id, event_id, v,
               count(*) OVER w AS n,
               CAST(coalesce(sum(v) OVER w, 0) AS BIGINT) AS s,
               CAST(coalesce(sum(v * v) OVER w, 0) AS BIGINT) AS q
        FROM v
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, CAST(n AS BIGINT) AS n_prior,
           CAST(n >= 3 AS INT) AS scored,
           CAST(CASE WHEN n >= 3 AND
                (CAST(n AS HUGEINT) * v - s) * (CAST(n AS HUGEINT) * v - s)
                    * (n - 1)
                > 9 * CAST(n AS HUGEINT)
                    * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM p ORDER BY user_id, event_id
"""


# append-mode flush audit, recomputed from first principles: final
# watermark = ms-floored max(ts) − 1 hour (Spark tracks event-time
# watermarks in milliseconds; AvailableNow ends with an empty flush
# batch carrying it), append emits exactly the hourly windows with
# end <= watermark (boundary verified empirically), so n_not_emitted
# is the unflushed tail
ORACLES["streaming_late_data_audit"] = """
    WITH b AS (
        SELECT epoch_us(max(ts)) AS hi FROM events
    ),
    wm AS (
        SELECT make_timestamp((hi // 1000) * 1000) - INTERVAL 1 HOUR AS w
        FROM b
    ),
    emitted AS (
        SELECT event_type, date_trunc('hour', ts) AS ws, count(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    per_type AS (
        SELECT event_type, count(*) AS n_windows_emitted,
               CAST(sum(n) AS BIGINT) AS n_events_emitted
        FROM emitted, wm
        WHERE ws + INTERVAL 1 HOUR <= w
        GROUP BY 1
    ),
    totals AS (
        SELECT event_type, count(*) AS n_total_events
        FROM events GROUP BY 1
    )
    SELECT t.event_type,
           coalesce(n_windows_emitted, 0) AS n_windows_emitted,
           coalesce(n_events_emitted, 0) AS n_events_emitted,
           n_total_events,
           n_total_events - coalesce(n_events_emitted, 0) AS n_not_emitted
    FROM totals t LEFT JOIN per_type p ON p.event_type = t.event_type
    ORDER BY t.event_type
"""


# streaming 6-hour windowed top-k: the bounded AvailableNow replay's
# complete-mode count table equals the batch group-by (time_bucket's
# 2000-01-01 origin and Spark's epoch window origin are both 6-hour
# epoch multiples), then the identical rank
ORACLES["streaming_topk_per_window"] = """
    WITH counts AS (
        SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
               event_type, count(*) AS n_events
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type ASC) AS INT) AS rk
        FROM counts
    )
    SELECT window_start, event_type, n_events, rk
    FROM ranked WHERE rk <= 3
    ORDER BY window_start, rk
"""


# stream-stream LEFT OUTER interval join census: matched pairs are the
# batch interval join; the null-click rows are exactly the unmatched
# purchases the final no-data batch EVICTS — purchase_ts strictly below
# the global watermark, which is the MIN over both sides' (ms-floored
# max event time - delay), per the late_data_audit contract.
ORACLES["streaming_outer_join_expiry"] = """
    WITH clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ), wm AS (
        SELECT least(
            make_timestamp(((SELECT epoch_us(max(click_ts)) FROM clicks)
                            // 1000) * 1000),
            make_timestamp(((SELECT epoch_us(max(purchase_ts))
                             FROM purchases) // 1000) * 1000)
        ) - INTERVAL 1 HOUR AS w
    ), matched AS (
        SELECT p.purchase_id, p.purchase_ts, c.click_id
        FROM purchases p JOIN clicks c
          ON p.user_id = c.user_id
         AND c.click_ts BETWEEN p.purchase_ts - INTERVAL 1 HOUR
                            AND p.purchase_ts
    ), expired_unmatched AS (
        SELECT p.purchase_id, p.purchase_ts
        FROM purchases p, wm
        WHERE p.purchase_ts < wm.w
          AND NOT EXISTS (SELECT 1 FROM matched m
                          WHERE m.purchase_id = p.purchase_id)
    ), rows_out AS (
        SELECT purchase_ts, 1 AS matched FROM matched
        UNION ALL
        SELECT purchase_ts, 0 AS matched FROM expired_unmatched
    )
    SELECT date_trunc('day', purchase_ts) AS purchase_day,
           CAST(sum(matched) AS BIGINT) AS n_matched_pairs,
           CAST(sum(1 - matched) AS BIGINT) AS n_expired_unmatched
    FROM rows_out GROUP BY 1 ORDER BY 1
"""

# stream-stream LEFT-join retained-tail audit: batch join ground truth
# + the pinned watermark arithmetic (ms-floored min over both sides of
# max event time - delay); streamed and batch matched counts must agree
# and emitted nulls + retained tail must equal batch unmatched, per day
ORACLES["streaming_join_tail_audit"] = """
    WITH clicks AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ), wm AS (
        SELECT least(
            make_timestamp(((SELECT epoch_us(max(click_ts)) FROM clicks)
                            // 1000) * 1000),
            make_timestamp(((SELECT epoch_us(max(purchase_ts))
                             FROM purchases) // 1000) * 1000)
        ) - INTERVAL 1 HOUR AS w
    ), matched AS (
        SELECT p.purchase_id, p.purchase_ts, c.click_id
        FROM purchases p JOIN clicks c
          ON p.user_id = c.user_id
         AND c.click_ts BETWEEN p.purchase_ts - INTERVAL 1 HOUR
                            AND p.purchase_ts
    ), unmatched AS (
        SELECT p.purchase_id, p.purchase_ts
        FROM purchases p
        WHERE NOT EXISTS (SELECT 1 FROM matched m
                          WHERE m.purchase_id = p.purchase_id)
    ), rows_out AS (
        SELECT date_trunc('day', purchase_ts) AS purchase_day,
               1 AS matched, 0 AS expired, 0 AS retained
        FROM matched
        UNION ALL
        SELECT date_trunc('day', u.purchase_ts),
               0,
               CASE WHEN u.purchase_ts < wm.w THEN 1 ELSE 0 END,
               CASE WHEN u.purchase_ts < wm.w THEN 0 ELSE 1 END
        FROM unmatched u, wm
    )
    SELECT purchase_day,
           CAST(sum(matched) AS BIGINT) AS n_matched_stream,
           CAST(sum(matched) AS BIGINT) AS n_matched_batch,
           CAST(sum(expired) AS BIGINT) AS n_expired_unmatched,
           CAST(sum(retained) AS BIGINT) AS n_tail_retained
    FROM rows_out GROUP BY 1 ORDER BY 1
"""
