"""Constants and SQL generators shared across the per-family oracle
modules (and by the registry's Spark-side query callables / the
external checker, which import the names from here via registry)."""

from __future__ import annotations

INTERVAL_START = "2024-01-05 00:00:00"
INTERVAL_END = "2024-01-20 00:00:00"
KNN_QUERY_IDS = [0, 1, 2, 3, 4]
_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_EN_STOP = "('the','a','of','and','is')"
# SQL-literal spelling of KNN_QUERY_IDS for the kNN oracles — derived,
# never hand-synced
_KNN_IDS_SQL = "({})".format(", ".join(str(i) for i in KNN_QUERY_IDS))
# The normative near-dup pair definition (jaccard >= 0.6 within the 20%
# length band, same language) as a shared CTE body — the ONE source of
# truth for every connected-components-family oracle here AND for the
# external checker's bounded union-find oracle
# (tools/check_correctness.py imports it); a threshold or blocking-band
# tweak lands everywhere at once instead of drifting across copies.
_WS_PAIRS_SQL = f"""ws AS (
            SELECT doc_id, lang, n_chars,
                   list_distinct(string_split({_NORM_SQL}, ' ')) AS wset
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ws a JOIN ws b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 0.2 * greatest(a.n_chars, b.n_chars)
            WHERE round(CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.wset, b.wset))), 4) >= 0.6
        )"""
_ASOF_TOLERANCE_S = 7 * 86400  # 7 days
# Shared per-doc word-entropy CTE body (round-8 simplify pass: the same
# computation backs both the text_word_entropy oracle and the
# pipeline_quality_gate oracle — one definition, no drift).  + 0.0
# collapses IEEE -0.0 from single-distinct-word docs.
_ENTROPY_CTE_SQL = """
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               count(*) AS n_unique,
               round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 0.0, 4)
                   AS entropy
        FROM (
            SELECT doc_id, w, count(*) AS c,
                   sum(count(*)) OVER (PARTITION BY doc_id) AS n
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY doc_id, w
        ) GROUP BY doc_id
"""
def _ewma_oracle_sql(alpha: float = 0.3, k: int = 8) -> str:
    """Generated twin of ``windows.ewma_smooth``: the same truncated
    FIR tap chain in exact DECIMAL arithmetic — value recovered at
    DECIMAL(18,2), weights as the identical terminating-decimal
    literals the operator computes, round(6) in decimal space, double
    only at the output edge (the ``money_sum`` oracle pattern)."""
    from decimal import Decimal

    a = Decimal(repr(alpha))
    one_minus = Decimal(1) - a
    terms = []
    for j in range(k):
        weight = a * one_minus**j
        # j = 0 still coalesces: a NULL value must contribute 0 to the
        # smoothed series exactly as a missing lag does (operator parity)
        lagged = "v" if j == 0 else f"lag(v, {j}) OVER w"
        terms.append(f"coalesce({lagged}, CAST(0 AS DECIMAL(18,2))) * {weight}")
    chain = "\n                 + ".join(terms)
    return f"""
        SELECT event_id, user_id, ts, value,
               CAST(round({chain}, 6) AS DOUBLE) AS ewma,
               CAST(round(v - ({chain}), 6) AS DOUBLE) AS deviation
        FROM (SELECT *, CAST(value AS DECIMAL(18,2)) AS v FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """
def _zorder_census_oracle_sql(bits: int = 16, bucket_bits: int = 6) -> str:
    """Twin of ``scale.zorder_pruning_stats`` over lineitem: the Morton
    interleave expression comes from the SAME builder
    (``scale.zorder_expr_sql`` is dialect-portable by construction), so
    engine and oracle cannot drift.  DuckDB ``//`` and Spark ``DIV``
    are both exact integer floor for the non-negative z."""
    from parcial_bigdata_spark.operators.scale import zorder_expr_sql

    z = zorder_expr_sql("l_partkey", "l_suppkey", bits)
    n_buckets = 1 << bucket_bits
    return f"""
        WITH zt AS (SELECT l_partkey, l_suppkey, {z} AS z FROM lineitem),
        m AS (SELECT max(z) + 1 AS zbound FROM zt)
        SELECT CAST(z * {n_buckets} // zbound AS BIGINT) AS z_bucket,
               count(*) AS n_rows,
               min(l_partkey) AS min_l_partkey,
               max(l_partkey) AS max_l_partkey,
               min(l_suppkey) AS min_l_suppkey,
               max(l_suppkey) AS max_l_suppkey
        FROM zt, m
        GROUP BY 1 ORDER BY 1
    """
def _pagerank_oracle_sql(iterations: int) -> str:
    """Unrolled DuckDB twin of ``graph.pagerank`` over the
    part↔supplier sourcing graph: one CTE per power-iteration round,
    same association everywhere — the teleport constant is written as
    ``(1.0 - 0.85)`` because that is the double the operator computes
    driver-side (a ``0.15`` literal is 1 ulp away)."""
    rounds = []
    prev = "r0"
    for i in range(1, iterations + 1):
        rounds.append(
            f""", r{i} AS (
            SELECT nodes.node,
                   (1.0 - 0.85) / (SELECT n FROM nn)
                   + 0.85 * coalesce(s.in_sum, 0.0) AS rank
            FROM nodes LEFT JOIN (
                SELECT e.dst AS node,
                       sum({prev}.rank / deg.out_deg) AS in_sum
                FROM e JOIN deg USING (src)
                       JOIN {prev} ON {prev}.node = e.src
                GROUP BY e.dst
            ) s USING (node)
        )"""
        )
        prev = f"r{i}"
    return f"""
        WITH e AS (
            SELECT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                   's' || CAST(l_suppkey AS VARCHAR) AS dst
            FROM lineitem
            UNION
            SELECT 's' || CAST(l_suppkey AS VARCHAR),
                   'p' || CAST(l_partkey AS VARCHAR)
            FROM lineitem
        ), nodes AS (
            SELECT src AS node FROM e UNION SELECT dst FROM e
        ), nn AS (
            SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        ), deg AS (
            SELECT src, count(*) AS out_deg FROM e GROUP BY src
        ), r0 AS (
            SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
        ){"".join(rounds)}
        SELECT node, round(rank, 6) AS rank FROM {prev}
        WHERE node LIKE 's%' ORDER BY node
    """
def _bpe_ctes_sql(n_merges: int) -> str:
    """Unrolled DuckDB twin of ``text.bpe_train_merges``: the same
    double-space segmentation encoding and literal-replace greedy merge
    application, one CTE trio (pair counts → winner → applied vocab)
    per merge rank.  Generated, so the stage count always matches the
    registry query's n_merges.  Every CTE is MATERIALIZED: DuckDB
    inlines plain CTEs, and v{k} referencing v{k-1} from two consumers
    would blow the inlined plan up exponentially in the merge count
    (the un-materialized form hung at n=8)."""
    ctes = ["""v0 AS MATERIALIZED (
            SELECT CAST(count(*) AS BIGINT) AS wc,
                   '  ' || array_to_string(
                       list_transform(range(1, length(word) + 1),
                                      i -> substring(word, i, 1)), '  ')
                   || '  ' AS seg
            FROM (SELECT unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
        )"""]
    for k in range(1, n_merges + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
            SELECT t[i] AS pair_left, t[i+1] AS pair_right,
                   CAST(sum(wc) AS BIGINT) AS cnt
            FROM (
                SELECT wc, t, unnest(range(1, len(t))) AS i
                FROM (SELECT wc,
                             list_filter(string_split(seg, '  '),
                                         x -> x <> '') AS t
                      FROM v{k-1})
            ) GROUP BY 1, 2
        )""")
        ctes.append(f"""w{k} AS MATERIALIZED (
            SELECT pair_left, pair_right, cnt FROM p{k}
            ORDER BY cnt DESC, pair_left, pair_right LIMIT 1
        )""")
        ctes.append(f"""v{k} AS MATERIALIZED (
            SELECT wc, replace(seg,
                (SELECT ' ' || pair_left || '  ' || pair_right || ' '
                 FROM w{k}),
                (SELECT ' ' || pair_left || pair_right || ' '
                 FROM w{k})) AS seg
            FROM v{k-1}
        )""")
    return "WITH " + ",\n        ".join(ctes)
def _bm25_oracle_sql(
    terms: list[str], k1: float = 1.2, b: float = 0.75, top_n: int = 20
) -> str:
    """BM25 oracle mirroring text_ops.bm25_search's expression tree
    exactly (same operand association → bit-identical doubles before the
    round(4); 1.2 + 1.0 folds to the same double 2.2 in both engines)."""
    tf_defs = ",\n                   ".join(
        f"len(list_filter(string_split({_NORM_SQL}, ' '), "
        f"x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"ln((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5) + 1.0)"
        f" * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1.0))"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1} * (1.0 - {b}"
        f" + {b} * CAST(dl AS DOUBLE) / avgdl))"
        for i in range(len(terms))
    )
    return f"""
        WITH per_doc AS (
            SELECT doc_id,
                   len(string_split({_NORM_SQL}, ' ')) AS dl,
                   {tf_defs}
            FROM documents
        ), stats AS (
            SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_defs}
            FROM per_doc
        )
        SELECT * FROM (
            SELECT doc_id, round({contribs}, 4) AS bm25_score
            FROM per_doc, stats
        ) WHERE bm25_score > 0
        ORDER BY bm25_score DESC, doc_id LIMIT {top_n}
    """
def _bpe_oracle_sql(n_merges: int) -> str:
    """Merge listing: rank / pair / merged token / support count."""
    finals = "\n            UNION ALL ".join(
        f"SELECT {k} AS rank, pair_left, pair_right, "
        f"pair_left || pair_right AS merged, cnt AS pair_count FROM w{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        _bpe_ctes_sql(n_merges)
        + "\n        SELECT * FROM (" + finals + ") ORDER BY rank"
    )
def _bpe_encode_oracle_sql(n_merges: int) -> str:
    """Corpus-wide ENCODE twin: apply the learned merges to every word
    of every document (the same nested-replace greedy application the
    engine runs row-locally) and report per-source token accounting."""
    seg0 = (
        "'  ' || array_to_string(list_transform("
        "range(1, length(word) + 1), i -> substring(word, i, 1)), '  ') "
        "|| '  '"
    )
    seg = seg0
    for k in range(1, n_merges + 1):
        seg = (
            f"replace({seg},\n                 "
            f"(SELECT ' ' || pair_left || '  ' || pair_right || ' ' FROM w{k}),\n                 "
            f"(SELECT ' ' || pair_left || pair_right || ' ' FROM w{k}))"
        )
    tokens = f"len(list_filter(string_split({seg}, '  '), x -> x <> ''))"
    return (
        _bpe_ctes_sql(n_merges)
        + f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(nw) AS BIGINT) AS ws_tokens,
               CAST(sum(nt) AS BIGINT) AS bpe_tokens
        FROM (
            SELECT doc_id, source, count(*) AS nw,
                   CAST(sum({tokens}) AS BIGINT) AS nt
            FROM (SELECT doc_id, source,
                         unnest(string_split(text, ' ')) AS word
                  FROM documents)
            WHERE word <> ''
            GROUP BY doc_id, source
        ) GROUP BY source ORDER BY source"""
    )

def _expectations_oracle() -> str:
    """Generated from profiling.ORDERS_EXPECTATIONS — one source of
    truth for rule ids and predicate strings, so a rule edit can never
    drift between the Spark gate and its oracle.  Each rule's violation
    count re-evaluates the SAME SQL predicate under the same explicit
    NULL rule (NOT coalesce(pred, FALSE))."""
    from parcial_bigdata_spark.operators.profiling import ORDERS_EXPECTATIONS

    parts = []
    for rid, pred in ORDERS_EXPECTATIONS:
        esc = pred.replace("'", "''")
        parts.append(
            f"SELECT '{rid}' AS rule_id, '{esc}' AS rule, "
            f"(SELECT count(*) FROM orders) AS n_rows, "
            f"(SELECT count(*) FROM orders "
            f" WHERE NOT coalesce(({pred}), FALSE)) AS n_violations"
        )
    body = " UNION ALL ".join(parts)
    return (
        "SELECT rule_id, rule, n_rows, n_violations, "
        "n_violations = 0 AS passed "
        f"FROM ({body}) ORDER BY rule_id"
    )

# LSH kNN's hyperplanes are seeded numpy draws — deterministic — so they
# inline into the oracle as full-precision DOUBLE[] literals (repr round-
# trips the exact bits).  Bucket assignment and both rankings then
# replicate exactly; a sign flip would need a query·plane dot within
# ~1e-15 of zero, which the O(1)-magnitude dots never approach.
def _lsh_oracle() -> str:
    from parcial_bigdata_spark.operators.similarity import _hyperplanes

    def bucket_expr(col: str) -> str:
        terms = []
        for i, p in enumerate(_hyperplanes(64, 6, 42)):
            arr = "[" + ", ".join(repr(v) for v in p) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product({col}, {arr}) > 0"
                f" THEN {2 ** i} ELSE 0 END)"
            )
        return " + ".join(terms)

    return f"""
        WITH b AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                   {bucket_expr("CAST(embedding AS DOUBLE[])")} AS bucket
            FROM embeddings
        ), q AS (
            SELECT vec_id AS query_id, emb AS qvec, bucket AS qbucket
            FROM b WHERE vec_id IN {_KNN_IDS_SQL}
        )
        SELECT query_id, rnk, vec_id, sim FROM (
            SELECT q.query_id, b.vec_id,
                   round(list_cosine_similarity(q.qvec, b.emb), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(q.qvec, b.emb), 6)
                                    DESC,
                                b.vec_id ASC) AS rnk
            FROM q JOIN b ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
        ) WHERE rnk <= 10 ORDER BY query_id, rnk
    """

def _kmeans_oracle(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd twin of train_spherical_kmeans: the FIXED iteration
    count is what makes the iterative algorithm SQL-expressible — one
    assign/recenter CTE pair per round, same rounded-cosine argmax and
    per-position mean as the Spark side."""

    def assign(cent: str, out: str, keep_sim: bool) -> str:
        sim_col = ", s" if keep_sim else ""
        return f"""
    {out} AS (
        SELECT vec_id, v, cluster{sim_col} FROM (
            SELECT e.vec_id, e.v, c.cluster,
                   round(list_cosine_similarity(e.v, c.centroid), 6) AS s,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, c.centroid), 6) DESC,
                                c.cluster ASC) AS rn
            FROM e, {cent} c
        ) WHERE rn = 1
    )"""

    def recenter(asg: str, out: str) -> str:
        return f"""
    {out} AS (
        SELECT cluster, list(m ORDER BY i) AS centroid FROM (
            SELECT a.cluster, t.i, avg(a.v[t.i]) AS m
            FROM {asg} a, (SELECT unnest(range(1, {dim + 1})) AS i) t
            GROUP BY a.cluster, t.i
        ) GROUP BY cluster
    )"""

    ctes = [
        f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS centroid
        FROM e ORDER BY vec_id LIMIT {k}
    )"""
    ]
    for r in range(1, iters + 1):
        ctes.append(assign(f"c{r - 1}", f"a{r}", keep_sim=False))
        ctes.append(recenter(f"a{r}", f"c{r}"))
    ctes.append(assign(f"c{iters}", "final", keep_sim=True))
    return f"""
    WITH {",".join(ctes)}
    SELECT cluster, count(*) AS n_vecs, round(avg(s), 4) AS avg_sim
    FROM final GROUP BY cluster ORDER BY cluster
    """

# Constant-SIZE audit samples (round-5 verdict item 5): the 1000 ids
# with the smallest md5 — identical on both engines (Spark md5(CAST(id
# AS STRING)) ≡ DuckDB md5(CAST(id AS VARCHAR)), both lowercase hex),
# so the truth sweep is O(1000²) at any corpus size.
_SAMP_DOCS_SQL = (
    "SELECT doc_id FROM documents WHERE doc_id IS NOT NULL "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1000"
)

_SAMP_VECS_SQL = (
    "SELECT vec_id FROM embeddings WHERE vec_id IS NOT NULL "
    "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1000"
)

# Shingle semantics mirror operators/dedup.shingles(): max(len-2, 1)
# windows; the last windows of a short doc shrink (xxhash64 skips the
# NULL padding on the Spark side; string join skips it here), so the
# distinct-gram sets correspond 1:1 to the distinct hash sets.
_GRAMS_SQL = f"""
    SELECT doc_id, lang, n_chars,
           list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 1)),
               i -> w[i] || COALESCE(' ' || w[i+1], '')
                         || COALESCE(' ' || w[i+2], '')
           )) AS grams
    FROM (SELECT doc_id, lang, n_chars,
                 string_split({_NORM_SQL}, ' ') AS w
          FROM documents WHERE doc_id IN ({_SAMP_DOCS_SQL}))
"""
