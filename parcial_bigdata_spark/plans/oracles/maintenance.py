"""DuckDB oracle SQL (ANSI) — maintenance family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _zorder_census_oracle_sql,
)

ORACLES: dict[str, str] = {
    # incremental maintenance must equal the from-scratch recompute of
    # the post-change table: pre-1997 minus every-50th-key, plus 1997+
    "incremental_agg_orders": """
        SELECT o_orderstatus, count(*) AS n_rows,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= DATE '1997-01-01' OR o_orderkey % 50 <> 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "snapshot_diff_orders": """
        WITH old_snap AS (
            SELECT * FROM orders WHERE o_orderkey % 13 <> 0
        ), new_snap AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 20 <> 0
        ), j AS (
            SELECT CASE
                WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
                  OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                  OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                  OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
                  OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
                THEN 'changed'
                ELSE 'unchanged' END AS change_type
            FROM old_snap o FULL OUTER JOIN new_snap n
              ON o.o_orderkey = n.o_orderkey
        )
        SELECT change_type, count(*) AS n_rows
        FROM j GROUP BY change_type ORDER BY change_type
    """,
    "merge_upsert_orders": """
        WITH base AS (
            SELECT * FROM orders WHERE o_orderkey % 4 <> 0
        ), upd AS (
            SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
                   o_totalprice + 100.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 2 = 0
        ), merged AS (
            SELECT CASE
                       WHEN b.o_orderkey IS NULL THEN 'inserted'
                       WHEN u.o_orderkey IS NULL THEN 'kept'
                       ELSE 'updated' END AS action,
                   CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
                        ELSE b.o_orderstatus END AS o_orderstatus,
                   CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                        ELSE b.o_totalprice END AS o_totalprice,
                   (b.o_orderkey IS NOT NULL AND u.o_orderkey IS NOT NULL
                    AND u.o_totalprice > 400000.0) AS del
            FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        )
        SELECT action AS "__merge_action", o_orderstatus,
               count(*) AS n_rows,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                    AS DOUBLE) AS sum_price
        FROM merged WHERE NOT del
        GROUP BY action, o_orderstatus ORDER BY action, o_orderstatus
    """,
    "scd2_customer_history": """
        WITH ev AS (
            SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
                   o_orderstatus, o_orderpriority
            FROM orders WHERE o_custkey % 10 = 0
        ), flagged AS (
            SELECT *,
                   (lag(1) OVER w IS NULL) AS is_first,
                   (o_orderstatus IS NOT DISTINCT FROM lag(o_orderstatus) OVER w
                    AND o_orderpriority IS NOT DISTINCT FROM
                        lag(o_orderpriority) OVER w) AS unchanged
            FROM ev
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY ts, o_orderstatus, o_orderpriority)
        ), changes AS (
            SELECT o_custkey, ts, o_orderstatus, o_orderpriority
            FROM flagged WHERE is_first OR NOT unchanged
        )
        SELECT o_custkey, o_orderstatus, o_orderpriority,
               ts AS valid_from,
               lead(ts) OVER w2 AS valid_to,
               row_number() OVER w2 AS version,
               (lead(ts) OVER w2 IS NULL) AS is_current
        FROM changes
        WINDOW w2 AS (PARTITION BY o_custkey
                      ORDER BY ts, o_orderstatus, o_orderpriority)
        ORDER BY o_custkey, version
    """,
    "scale_zorder_census": _zorder_census_oracle_sql(),
}


# compaction plan: sort-desc census, cumulative-quota integer binning
ORACLES["maintenance_compaction_plan"] = """
    WITH census AS (
        SELECT l_orderkey % 200 AS file_id, count(*) AS n_rows
        FROM lineitem GROUP BY 1
    ),
    planned AS (
        SELECT file_id, n_rows,
               CAST((sum(n_rows) OVER (
                        ORDER BY n_rows DESC, file_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_rows) // 8192 AS BIGINT) AS bin
        FROM census
    )
    SELECT bin, count(*) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           min(n_rows) AS min_file_rows, max(n_rows) AS max_file_rows
    FROM planned GROUP BY 1 ORDER BY 1
"""
