"""DuckDB oracle SQL (ANSI) — dedup family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _NORM_SQL,
    _WS_PAIRS_SQL,
    _SAMP_DOCS_SQL,
    _SAMP_VECS_SQL,
    _GRAMS_SQL,
)

ORACLES: dict[str, str] = {
    "dedup_component_survivors": f"""
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
        ), ranked AS (
            SELECT comp, doc_id, n_chars,
                   row_number() OVER (PARTITION BY comp
                       ORDER BY n_chars DESC, doc_id ASC) AS rn,
                   count(*) OVER (PARTITION BY comp) AS n_members
            FROM assigned
        )
        SELECT comp, doc_id AS survivor_doc_id, n_chars AS survivor_chars,
               n_members
        FROM ranked WHERE rn = 1 ORDER BY comp
    """,
    # corpus-internal duplicate-5-gram coverage: same gram construction
    # as the decontamination oracle, document frequency >= 2 instead of
    # train membership
    "dedup_ngram_coverage": f"""
        WITH norm AS (
            SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
            FROM documents
        ), grams AS (
            SELECT doc_id,
                   CASE WHEN len(w) >= 5
                        THEN list_distinct(list_transform(range(1, len(w) - 4 + 1),
                                 i -> array_to_string(w[i:i+4], ' ')))
                        ELSE CAST([] AS VARCHAR[]) END AS g
            FROM norm
        ), eg AS (
            SELECT doc_id, unnest(g) AS gram FROM grams
        ), shared_g AS (
            SELECT gram FROM eg GROUP BY gram HAVING count(*) >= 2
        ), hits AS (
            SELECT e.doc_id, count(*) AS n_shared
            FROM eg e JOIN shared_g USING (gram) GROUP BY e.doc_id
        )
        SELECT g.doc_id, len(g.g) AS n_ngrams,
               COALESCE(h.n_shared, 0) AS n_shared,
               round(CAST(COALESCE(h.n_shared, 0) AS DOUBLE) / len(g.g), 4)
                   AS dup_frac
        FROM grams g LEFT JOIN hits h USING (doc_id)
        WHERE len(g.g) > 0 ORDER BY g.doc_id
    """,
    "dedup_paragraphs": """
        -- C4-style paragraph-level exact dedup: fixed 20-word windows,
        -- first corpus occurrence wins (ordered by doc_id, position),
        -- surviving text reassembled in position order per document.
        -- First occurrence is an argmin over the (doc_id, idx) TUPLE —
        -- mirroring the operator's struct-min exactly; a packed
        -- doc_id*K+idx long key would silently diverge once a document
        -- exceeds K paragraphs or the product overflows (round-8
        -- advice).
        WITH paras AS (
            SELECT doc_id, idx,
                   array_to_string(ws[(idx*20+1):(idx*20+20)], ' ') AS para
            FROM (
                SELECT doc_id, ws,
                       unnest(generate_series(
                           0,
                           CAST(ceil(len(ws)/20.0) AS BIGINT) - 1)) AS idx
                FROM (SELECT doc_id, string_split(text, ' ') AS ws
                      FROM documents)
            )
        ), firsts AS (
            SELECT para, min(ROW(doc_id, idx)) AS first_occ
            FROM paras GROUP BY para
        )
        SELECT p.doc_id, count(*) AS n_paras,
               CAST(sum(CASE WHEN ROW(p.doc_id, p.idx) <> f.first_occ
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped,
               coalesce(string_agg(
                   CASE WHEN ROW(p.doc_id, p.idx) = f.first_occ
                        THEN p.para END,
                   ' ' ORDER BY p.idx), '') AS clean_text
        FROM paras p JOIN firsts f USING (para)
        GROUP BY p.doc_id ORDER BY p.doc_id
    """,
    "dedup_exact": """
        SELECT keep_doc_id, n_copies FROM (
            SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        ) WHERE n_copies > 1 ORDER BY keep_doc_id
    """,
    "dedup_exact_survivors": """
        WITH kept AS (
            SELECT lang, text, min(doc_id) AS keep_doc_id, count(*) AS n_copies
            FROM documents GROUP BY lang, text
        )
        SELECT lang, count(*) AS distinct_docs,
               CAST(sum(n_copies) AS BIGINT) AS total_docs
        FROM kept GROUP BY lang ORDER BY lang
    """,
    "dedup_ngram_jaccard": f"""
        WITH ws AS (
            SELECT doc_id, lang, n_chars,
                   list_distinct(string_split({_NORM_SQL}, ' ')) AS wset
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.wset, b.wset))), 4) AS jaccard
            FROM ws a JOIN ws b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
        )
        SELECT doc_a, doc_b, jaccard FROM pairs
        WHERE jaccard >= 0.6 ORDER BY doc_a, doc_b
    """,
    # asymmetric containment C(A->B) = |A∩B|/|A| — doc_a is the
    # contained (smaller word set) side, ties by doc_id; both sides
    # need >= 5 distinct words; NO length band (asymmetric sizes are
    # the point).  The engine's prefix-filter blocking is lossless, so
    # the naive same-language ordered join IS the oracle.
    "dedup_ngram_containment": f"""
        WITH ws AS (
            SELECT doc_id, lang,
                   list_distinct(string_split({_NORM_SQL}, ' ')) AS wset
            FROM documents
        ), sized AS (
            SELECT doc_id, lang, wset, len(wset) AS wsize
            FROM ws WHERE len(wset) >= 5
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
                       / a.wsize, 4) AS containment
            FROM sized a JOIN sized b
              ON a.lang = b.lang
             AND (a.wsize < b.wsize
                  OR (a.wsize = b.wsize AND a.doc_id < b.doc_id))
        )
        SELECT doc_a, doc_b, containment FROM pairs
        WHERE containment >= 0.7 ORDER BY doc_a, doc_b
    """,
    "dedup_incremental_jaccard": f"""
        -- incremental dedup: the blocked asymmetric join is lossless,
        -- so the naive new-batch x (base + earlier batch) join is the
        -- oracle (same shape as dedup_ngram_jaccard's)
        WITH ws AS (
            SELECT doc_id, lang, n_chars,
                   list_distinct(string_split({_NORM_SQL}, ' ')) AS wset,
                   doc_id % 5 = 0 AS is_new
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS new_doc, b.doc_id AS dup_of,
                   b.is_new AS dup_in_batch,
                   round(CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.wset, b.wset))), 4)
                       AS jaccard
            FROM ws a JOIN ws b
              ON a.is_new AND (NOT b.is_new OR b.doc_id < a.doc_id)
             AND a.lang = b.lang
             AND abs(a.n_chars - b.n_chars)
                 <= 0.2 * greatest(a.n_chars, b.n_chars)
        )
        SELECT new_doc, dup_of, dup_in_batch, jaccard FROM pairs
        WHERE jaccard >= 0.6 ORDER BY new_doc, dup_of
    """,
    "dedup_components": f"""
        WITH RECURSIVE {_WS_PAIRS_SQL}, edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ), closure(src, reach) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT c.src, e.dst FROM closure c JOIN edges e ON c.reach = e.src
        )
        SELECT src AS doc_id, least(src, min(reach)) AS comp
        FROM closure GROUP BY src ORDER BY doc_id
    """,
    "dedup_cross_split_contamination": f"""
        WITH fp AS (
            SELECT source, md5({_NORM_SQL}) AS fingerprint FROM documents
        ), per_split AS (
            SELECT fingerprint, source, count(*) AS n
            FROM fp GROUP BY fingerprint, source
        )
        SELECT fingerprint, count(DISTINCT source) AS n_splits,
               CAST(sum(n) AS BIGINT) AS n_docs
        FROM per_split GROUP BY fingerprint
        HAVING count(DISTINCT source) > 1 ORDER BY fingerprint
    """,
    "dedup_ngram_decontaminate": f"""
        WITH norm AS (
            SELECT doc_id, CAST(substr(source, 4) AS INT) % 2 = 0 AS is_train,
                   string_split({_NORM_SQL}, ' ') AS w
            FROM documents
        ), grams AS (
            SELECT doc_id, is_train,
                   CASE WHEN len(w) >= 5
                        THEN list_distinct(list_transform(range(1, len(w) - 4 + 1),
                                 i -> array_to_string(w[i:i+4], ' ')))
                        ELSE CAST([] AS VARCHAR[]) END AS g
            FROM norm
        ), train AS (
            SELECT DISTINCT unnest(g) AS gram FROM grams WHERE is_train
        ), eval_g AS (
            SELECT doc_id, unnest(g) AS gram FROM grams WHERE NOT is_train
        ), hits AS (
            SELECT e.doc_id, count(*) AS n_hit
            FROM eval_g e JOIN train t USING (gram) GROUP BY e.doc_id
        )
        SELECT g.doc_id, len(g.g) AS n_ngrams,
               COALESCE(h.n_hit, 0) AS n_contaminated,
               round(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / len(g.g), 4)
                   AS contaminated_frac
        FROM grams g LEFT JOIN hits h USING (doc_id)
        WHERE NOT g.is_train AND len(g.g) > 0
        ORDER BY g.doc_id
    """,
    "dedup_embedding_cosine": """
        SELECT vec_a, vec_b, cosine_sim FROM (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        ) WHERE cosine_sim >= 0.3 ORDER BY vec_a, vec_b
    """,
}

ORACLES["dedup_minhash_lsh_check"] = f"""
    WITH sh AS ({_GRAMS_SQL}),
    truth AS (
        SELECT 1 FROM sh a JOIN sh b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
        WHERE round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.grams, b.grams))), 4) >= 0.6
    )
    SELECT (SELECT count(*) FROM ({_SAMP_DOCS_SQL})) AS n_sample_docs,
           (SELECT count(*) FROM truth) AS n_truth_pairs,
           CAST((SELECT count(*) FROM truth) >= 5 AS INT) AS truth_sufficient,
           1 AS recall_ok
"""

# simhash truth is hash-geometry (not ANSI-reproducible), so the oracle
# asserts truth_sufficient as a literal — 17 truth pairs on the 500-doc
# fixture, so a fixture regression below the 5-pair power floor turns red.
ORACLES["dedup_simhash_check"] = f"""
    SELECT count(*) AS n_sample_docs, 1 AS twin_ok,
           1 AS truth_sufficient, 1 AS recall_ok
    FROM ({_SAMP_DOCS_SQL})
"""

ORACLES["dedup_embedding_lsh_check"] = f"""
    WITH samp AS ({_SAMP_VECS_SQL}),
    truth AS (
        SELECT 1 FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id IN (SELECT vec_id FROM samp)
          AND b.vec_id IN (SELECT vec_id FROM samp)
          AND round(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
    )
    SELECT (SELECT count(*) FROM samp) AS n_sample_vecs,
           (SELECT count(*) FROM truth) AS n_truth_pairs,
           CAST((SELECT count(*) FROM truth) >= 5 AS INT) AS truth_sufficient,
           1 AS recall_ok
"""

# component-size histogram: transitive closure labels (singletons keep
# their own id via COALESCE) -> per-component sizes -> histogram; the
# checker swaps in the union-find py-oracle past the closure bound
ORACLES["dedup_component_size_hist"] = f"""
    WITH RECURSIVE {_WS_PAIRS_SQL}, edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), closure(src, reach) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT c.src, e.dst FROM closure c JOIN edges e ON c.reach = e.src
    ), labels AS (
        SELECT src AS doc_id, least(src, min(reach)) AS comp
        FROM closure GROUP BY src
    ), assigned AS (
        SELECT d.doc_id, coalesce(l.comp, d.doc_id) AS comp
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ), sizes AS (
        SELECT comp, count(*) AS sz FROM assigned GROUP BY comp
    )
    SELECT CAST(sz AS BIGINT) AS component_size,
           count(*) AS n_components,
           CAST(sz * count(*) AS BIGINT) AS n_docs,
           CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY sz ORDER BY component_size
"""
