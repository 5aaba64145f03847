"""DuckDB oracle SQL (ANSI) — parity family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    INTERVAL_START,
    INTERVAL_END,
)

ORACLES: dict[str, str] = {
    "interval_query": f"""
        SELECT ts, CAST(value AS DOUBLE) AS value
        FROM events
        WHERE ts >= TIMESTAMP '{INTERVAL_START}' AND ts <= TIMESTAMP '{INTERVAL_END}'
        ORDER BY ts
    """,
    "interval_count": f"""
        SELECT count(*) AS cnt FROM events
        WHERE ts >= TIMESTAMP '{INTERVAL_START}' AND ts <= TIMESTAMP '{INTERVAL_END}'
    """,
    "ingest_accounting": """
        SELECT source, count(*) AS rows_inserted,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source ORDER BY source
    """,
    "json_props_agg": """
        SELECT event_type, count(*) AS n_events, count(k) AS n_valid,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM (
            SELECT event_type,
                   TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        ) GROUP BY event_type ORDER BY event_type
    """,
}

# CSV round trip: the oracle is arithmetic on the source table plus
# the literal injected bad-line count — independent of the CSV path
ORACLES["source_csv_roundtrip"] = """
    SELECT count(*) + 3 AS n_rows,
           count(*) AS n_valid,
           CAST(3 AS BIGINT) AS n_corrupt,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(user_id) AS BIGINT) AS sum_user_id,
           count(DISTINCT event_type) AS n_types
    FROM events
"""
