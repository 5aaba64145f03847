"""DuckDB oracle SQL (ANSI) — sampling family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _NORM_SQL,
    _WS_PAIRS_SQL,
)

ORACLES: dict[str, str] = {
    "sample_split_assign": """
        SELECT split, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT CASE WHEN b < 80 THEN 'train'
                        WHEN b < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, n_chars
            FROM (
                SELECT lang, n_chars,
                       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                            AS INT) % 100 AS b
                FROM documents
            )
        )
        GROUP BY split, lang ORDER BY split, lang
    """,
    "sample_stratified_exact": """
        SELECT doc_id, lang, rn
        FROM (
            SELECT doc_id, lang,
                   row_number() OVER (
                     PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        )
        WHERE rn <= 20
        ORDER BY lang, rn
    """,
    "sample_chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w FROM documents
        ), s AS (
            SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 24)) AS chunk_start
            FROM t
        )
        SELECT doc_id,
               chunk_start // 24 AS chunk_id,
               chunk_start,
               least(32, len(w) - chunk_start) AS chunk_tokens,
               array_to_string(w[chunk_start + 1 : chunk_start + 32], ' ') AS chunk_text
        FROM s ORDER BY doc_id, chunk_id
    """,
    "sample_pack_sequences": """
        WITH toks AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ), binned AS (
            SELECT doc_id, lang, n_tokens,
                   CAST(FLOOR(COALESCE(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 2048.0) AS BIGINT) AS bin
            FROM toks
        )
        SELECT lang, bin, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM binned GROUP BY lang, bin ORDER BY lang, bin
    """,
    "sample_quota_by_source": """
        WITH q(source, quota) AS (
            VALUES ('src0', 30), ('src1', 10), ('src2', 5), ('src3', 0)
        ), ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (
                     PARTITION BY source
                     ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS rn
            FROM documents
        )
        SELECT doc_id, ranked.source, rn
        FROM ranked LEFT JOIN q ON ranked.source = q.source
        WHERE rn <= COALESCE(quota, 8)
        ORDER BY ranked.source, rn
    """,
    "sample_epoch_repeat": """
        WITH e(source, n_epochs) AS (
            VALUES ('src0', 3), ('src1', 2), ('src2', 0)
        ), rep AS (
            SELECT doc_id, d.source,
                   unnest(generate_series(1, COALESCE(e.n_epochs, 1))) AS epoch
            FROM documents d LEFT JOIN e ON d.source = e.source
            WHERE COALESCE(e.n_epochs, 1) >= 1
        )
        SELECT source, count(*) AS n_rows,
               count(DISTINCT doc_id) AS n_docs,
               max(epoch) AS max_epoch
        FROM rep GROUP BY source ORDER BY source
    """,
    "sample_temperature_mix": """
        WITH counts AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ), weighted AS (
            SELECT source, n_docs, pow(CAST(n_docs AS DOUBLE), 0.5) AS w
            FROM counts
        ), totals AS (
            SELECT sum(w) AS tw, sum(n_docs) AS tn FROM weighted
        )
        -- the 1e-9 snap before floor mirrors the Spark twin: equal
        -- source sizes put the quotient exactly on an integer, where
        -- the engines' tw summation order would otherwise flip floor
        SELECT source, n_docs,
               round(n_docs / tn, 4) AS raw_share,
               round(w / tw, 4) AS tempered_share,
               CAST(floor(floor(1000.0 * w / tw * 1e9 + 0.5) / 1e9)
                    AS BIGINT) AS target_docs,
               round(CAST(floor(floor(1000.0 * w / tw * 1e9 + 0.5) / 1e9)
                          AS DOUBLE) / n_docs, 2) AS repeat_factor
        FROM weighted, totals ORDER BY source
    """,
    "sample_pps_systematic": """
        -- systematic PPS over the md5-ordered weight line; the stride
        -- boundary test is integer DIV — bit-exact across engines
        WITH keyed AS (
            SELECT doc_id, source, greatest(n_chars, 1) AS w,
                   sum(greatest(n_chars, 1)) OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING
                   ) AS cum,
                   sum(greatest(n_chars, 1)) OVER (
                       PARTITION BY source
                   ) AS total_w
            FROM documents
        )
        SELECT doc_id, source, CAST(w AS BIGINT) AS w,
               CAST((cum * 25) // total_w - ((cum - w) * 25) // total_w
                    AS BIGINT) AS n_picks,
               CAST(((cum - w) * 25) // total_w AS BIGINT) AS first_pick
        FROM keyed
        WHERE (cum * 25) // total_w - ((cum - w) * 25) // total_w > 0
        ORDER BY source, first_pick
    """,
    # deterministic contrastive negatives: the md5 rank line is shared
    # with the sampling family's convention; rank ordering uses the
    # 15-hex numeric projection + doc_id tiebreak on BOTH engines
    "sample_negative_pairs": """
        WITH ranked AS (
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS
                                VARCHAR)), 1, 15)) AS BIGINT), doc_id) AS r,
                   count(*) OVER () AS n
            FROM documents
        ), probes AS (
            SELECT a.doc_id, j.j AS neg_idx,
                   ((a.r - 1 + greatest(1, (a.n * j.j) // 4)) % a.n) + 1
                       AS pr
            FROM ranked a, (SELECT unnest([1, 2, 3]) AS j) j
            WHERE a.n >= 2
        )
        SELECT p.doc_id, p.neg_idx, b.doc_id AS neg_doc_id
        FROM probes p JOIN ranked b ON b.r = p.pr
        ORDER BY p.doc_id, p.neg_idx
    """,
    "sample_token_length_hist": """
        WITH t AS (
            SELECT source,
                   len(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS n_tokens
            FROM documents
        )
        SELECT source,
               CASE WHEN n_tokens <= 0 THEN -1
                    WHEN n_tokens < 2 THEN 0
                    WHEN n_tokens < 4 THEN 1
                    WHEN n_tokens < 8 THEN 2
                    WHEN n_tokens < 16 THEN 3
                    WHEN n_tokens < 32 THEN 4
                    WHEN n_tokens < 64 THEN 5
                    WHEN n_tokens < 128 THEN 6
                    WHEN n_tokens < 256 THEN 7
                    WHEN n_tokens < 512 THEN 8
                    WHEN n_tokens < 1024 THEN 9
                    WHEN n_tokens < 2048 THEN 10
                    WHEN n_tokens < 4096 THEN 11
                    WHEN n_tokens < 8192 THEN 12
                    WHEN n_tokens < 16384 THEN 13
                    WHEN n_tokens < 32768 THEN 14
                    WHEN n_tokens < 65536 THEN 15
                    WHEN n_tokens < 131072 THEN 16
                    WHEN n_tokens < 262144 THEN 17
                    WHEN n_tokens < 524288 THEN 18
                    WHEN n_tokens < 1048576 THEN 19
                    ELSE 20 END AS bucket,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(min(n_tokens) AS BIGINT) AS min_tokens,
               CAST(max(n_tokens) AS BIGINT) AS max_tokens
        FROM t GROUP BY source, bucket ORDER BY source, bucket
    """,
    "sample_shuffle_shards": """
        -- deterministic training-order shuffle: md5(seed:doc_id) order
        -- key, 16-bit-prefix shard assignment, position within shard —
        -- no global sort on either engine.
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                   AS pos
        FROM (
            SELECT doc_id,
                   md5('seed0:' || CAST(doc_id AS VARCHAR)) AS k,
                   CAST(('0x' || substr(
                        md5('seed0:' || CAST(doc_id AS VARCHAR)), 1, 4))
                        AS INT) % 8 AS shard
            FROM documents
        ) ORDER BY shard, pos
    """,
    "sample_leakage_safe_split": f"""
        WITH RECURSIVE {_WS_PAIRS_SQL}, edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ), closure(src, reach) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT c.src, e.dst FROM closure c JOIN edges e ON c.reach = e.src
        ), comps AS (
            SELECT src AS doc_id, least(src, min(reach)) AS comp
            FROM closure GROUP BY src
        ), assigned AS (
            SELECT d.doc_id, d.n_chars, COALESCE(c.comp, d.doc_id) AS comp
            FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id
        ), bucketed AS (
            SELECT comp, n_chars,
                   CAST(('0x' || substr(md5(CAST(comp AS VARCHAR)), 1, 4))
                        AS INT) % 100 AS b
            FROM assigned
        )
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs, count(DISTINCT comp) AS n_components,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM bucketed
        GROUP BY split ORDER BY split
    """,
}

ORACLES["sample_temporal_split"] = """
    SELECT split, event_type, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(day) AS first_day, max(day) AS last_day
    FROM (
        SELECT CASE
                   WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
                   WHEN ts < TIMESTAMP '2024-01-20' + INTERVAL 2 DAY
                       THEN 'embargo'
                   ELSE 'test' END AS split,
               event_type, user_id, date_trunc('day', ts) AS day
        FROM events
    )
    GROUP BY split, event_type ORDER BY split, event_type
"""

ORACLES["sample_undersample_balance"] = """
    WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS m FROM counts),
    ranked AS (
        SELECT lang, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN rn <= m.m THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn > m.m THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN rn <= m.m THEN n_chars END) AS BIGINT)
               AS kept_chars
    FROM ranked, m GROUP BY lang ORDER BY lang
"""

ORACLES["sample_group_kfold"] = """
    SELECT fold, count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM (
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                    AS INT) % 5 AS fold,
               user_id
        FROM events
    )
    GROUP BY fold ORDER BY fold
"""


# curriculum schedule: literal length bands, md5 line within band,
# round-robin interleave (band_rank-1)*n_bands + band
ORACLES["sample_curriculum_order"] = """
    WITH banded AS (
        SELECT doc_id,
               CASE WHEN n_chars < 500 THEN 0
                    WHEN n_chars < 1000 THEN 1
                    WHEN n_chars < 2000 THEN 2
                    WHEN n_chars < 4000 THEN 3
                    ELSE 4 END AS band,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, band,
               row_number() OVER (
                   PARTITION BY band ORDER BY h, doc_id) AS band_rank
        FROM banded
    )
    SELECT doc_id, band, band_rank,
           (band_rank - 1) * 5 + band AS schedule_pos
    FROM ranked ORDER BY schedule_pos
"""


# uniform-mixture importance weights: one division chain of exact
# counts, shared round-6
ORACLES["sample_importance_weights"] = """
    WITH counts AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ),
    totals AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS total, count(*) AS k
        FROM counts
    )
    SELECT source, n_docs,
           floor((CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS actual_share,
           floor((1.0 / CAST(k AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS target_share,
           floor((CAST(total AS DOUBLE)
                  / (CAST(k AS DOUBLE) * CAST(n_docs AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS weight
    FROM counts CROSS JOIN totals ORDER BY source
"""
