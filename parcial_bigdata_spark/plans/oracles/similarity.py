"""DuckDB oracle SQL (ANSI) — similarity family.

Split out of plans/registry.py (round-10 verdict item 8) so a family
edit no longer touches a 5.5k-line file; aggregated back into the
single ORACLES dict by plans/oracles/__init__.  Same aliases, same
rounding as the Spark twins in the registry.
"""

from parcial_bigdata_spark.plans.oracles._shared import (
    _KNN_IDS_SQL,
    _lsh_oracle,
    _kmeans_oracle,
)

ORACLES: dict[str, str] = {
    "embedding_norm_stats": """
        SELECT label, count(*) AS n_vecs,
               round(avg(nrm), 4) AS avg_norm,
               round(min(nrm), 4) AS min_norm,
               round(max(nrm), 4) AS max_norm
        FROM (
            SELECT label,
                   sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x * x))) AS nrm
            FROM embeddings
        ) GROUP BY label ORDER BY label
    """,
    # affine int8 quantization: every step is elementwise double math
    # in list order on both engines, so codes and stats are
    # bit-identical (floor(+0.5), never round() — half-even vs
    # half-away differs across engines)
    "embedding_scalar_quantization": """
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), s AS (
            SELECT vec_id, label, v,
                   list_aggregate(v, 'min') AS vmin,
                   (list_aggregate(v, 'max') - list_aggregate(v, 'min'))
                       / 255 AS scale
            FROM v
        ), e AS (
            SELECT vec_id, label, v, scale,
                   CASE WHEN scale > 0 THEN
                       list_transform(v, x -> abs(x - (vmin +
                           floor((x - vmin) / scale + 0.5) * scale)))
                   ELSE list_transform(v, x -> 0.0) END AS errs
            FROM s
        )
        SELECT vec_id, label, len(v) AS n_dims, round(scale, 6) AS scale,
               round(sqrt(list_aggregate(list_transform(errs, x -> x * x),
                                         'sum') / len(v)), 6) AS rmse,
               round(list_aggregate(errs, 'max'), 6) AS max_err
        FROM e ORDER BY vec_id
    """,
    "embedding_centroid_dispersion": """
        WITH x AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), pos AS (
            SELECT vec_id, label, t.i, v[t.i] AS val
            FROM x, unnest(range(1, len(v) + 1)) AS t(i)
        ), cent AS (
            SELECT label, i, avg(val) AS c FROM pos GROUP BY label, i
        ), d AS (
            SELECT p.vec_id, p.label,
                   sqrt(sum((p.val - c.c) * (p.val - c.c))) AS dist
            FROM pos p JOIN cent c ON p.label = c.label AND p.i = c.i
            GROUP BY p.vec_id, p.label
        )
        SELECT label, count(*) AS n_vecs,
               round(avg(dist), 6) AS avg_dist,
               round(max(dist), 6) AS max_dist
        FROM d GROUP BY label ORDER BY label
    """,
    "knn_cosine_brute_force": f"""
        SELECT query_id, rnk, vec_id, sim FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[])), 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(
                                    CAST(q.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])), 6) DESC,
                                e.vec_id ASC) AS rnk
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id IN {_KNN_IDS_SQL}
        ) WHERE rnk <= 10 ORDER BY query_id, rnk
    """,
}

# IVF is deterministic given the cluster column, and its probe ranking
# orders by csim ROUNDED to 6 (cluster-id tie-break), so the whole query
# is engine-stable and exactly SQL-expressible: centroids via a lateral
# element-index unnest, probes via the same rounded ranking.
ORACLES["knn_cosine_ivf"] = f"""
    WITH cent AS (
        SELECT label AS cluster, list(m ORDER BY i) AS centroid
        FROM (
            -- fixture embeddings are 64-dim at every SF (TESTDATA
            -- contract); DuckDB's generate_series cannot take a subquery
            -- bound in FROM, so the index range is the constant 1..64
            SELECT label, t.i, avg(embedding[t.i]) AS m
            FROM embeddings, (SELECT unnest(range(1, 65)) AS i) t
            GROUP BY label, t.i
        )
        GROUP BY label
    ), q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id IN {_KNN_IDS_SQL}
    ), probes AS (
        SELECT query_id, qvec, cluster FROM (
            SELECT q.query_id, q.qvec, c.cluster,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round(list_cosine_similarity(
                                    q.qvec, c.centroid), 6) DESC,
                                c.cluster ASC) AS crnk
            FROM q, cent c
        ) WHERE crnk <= 2
    )
    SELECT query_id, rnk, vec_id, sim FROM (
        SELECT p.query_id, e.vec_id,
               round(list_cosine_similarity(
                   p.qvec, CAST(e.embedding AS DOUBLE[])), 6) AS sim,
               row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY round(list_cosine_similarity(
                                p.qvec, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                            e.vec_id ASC) AS rnk
        FROM probes p JOIN embeddings e ON e.label = p.cluster
        WHERE e.vec_id <> p.query_id
    ) WHERE rnk <= 10 ORDER BY query_id, rnk
"""

ORACLES["knn_cosine_lsh"] = _lsh_oracle()

ORACLES["embedding_kmeans_train"] = _kmeans_oracle()

# isotropy histogram: the md5 rank-line pairing is a pure function of
# the corpus; cosines round at 6 BEFORE bucketing so the bucket edges
# are deterministic cross-engine
ORACLES["embedding_pair_cosine_hist"] = """
    WITH ranked AS (
        SELECT vec_id, embedding,
               row_number() OVER (
                   ORDER BY CAST(('0x' || substr(md5(CAST(vec_id AS
                            VARCHAR)), 1, 15)) AS BIGINT), vec_id) AS r,
               count(*) OVER () // 2 AS half
        FROM embeddings
    ),
    pairs AS (
        SELECT round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 6) AS c
        FROM ranked a JOIN ranked b
          ON b.r = a.r + a.half AND a.r <= a.half
    )
    SELECT bucket, count(*) AS n_pairs,
           min(c) AS min_cos, max(c) AS max_cos
    FROM (
        SELECT c, CAST(least(greatest(floor((c + 1) * 5), 0), 9) AS INT)
                   AS bucket
        FROM pairs
    )
    GROUP BY bucket ORDER BY bucket
"""

# per-dimension moments: values round onto the 1e-18 decimal grid first
# (exact decimal sums are order-insensitive), then mean/var come out of
# the two exact sums with the identical IEEE op sequence
ORACLES["embedding_dim_stats"] = """
    WITH pos AS (
        SELECT t.i AS dim, CAST(v[t.i] AS DOUBLE) AS val
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             unnest(range(1, len(v) + 1)) AS t(i)
    ),
    agg AS (
        SELECT dim, count(*) AS n_values,
               sum(CAST(val AS DECIMAL(38,18))) AS s,
               sum(CAST(val * val AS DECIMAL(38,18))) AS q,
               min(val) AS min_val, max(val) AS max_val
        FROM pos GROUP BY dim
    )
    SELECT dim, n_values,
           floor((CAST(s AS DOUBLE) / n_values) * 1e6 + 0.5) / 1e6
               AS mean_val,
           floor((CAST(q AS DOUBLE) / n_values
                  - (CAST(s AS DOUBLE) / n_values)
                    * (CAST(s AS DOUBLE) / n_values)) * 1e6 + 0.5) / 1e6
               AS var_val,
           min_val, max_val
    FROM agg ORDER BY dim
"""


# diagonal-covariance Mahalanobis: decimal-grid moments (the
# embedding_dim_stats technique), per-vector term sums re-gridded to
# DECIMAL(38,18) so the sum is order-free, top-n cut on the EXACT sum
ORACLES["embedding_mahalanobis_outliers"] = """
    WITH pos AS (
        SELECT vec_id, t.i AS dim, CAST(v[t.i] AS DOUBLE) AS val
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
             unnest(range(1, len(v) + 1)) AS t(i)
    ),
    agg AS (
        SELECT dim, count(*) AS n,
               sum(CAST(val AS DECIMAL(38,18))) AS s,
               sum(CAST(val * val AS DECIMAL(38,18))) AS q
        FROM pos GROUP BY dim
    ),
    stats AS (
        SELECT dim,
               CAST(s AS DOUBLE) / n AS mu,
               CAST(q AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
                   AS var
        FROM agg
    ),
    scored AS (
        SELECT p.vec_id, count(*) AS n_dims_used,
               sum(CAST((p.val - st.mu) * (p.val - st.mu) / st.var
                        AS DECIMAL(38,18))) AS d2
        FROM pos p JOIN stats st ON st.dim = p.dim
        WHERE st.var > 1e-12
        GROUP BY p.vec_id
    )
    SELECT vec_id, n_dims_used,
           floor(CAST(d2 AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mahalanobis_sq
    FROM scored
    ORDER BY d2 DESC, vec_id LIMIT 20
"""


def _jl_proj_sql(j: int) -> str:
    """One JL projected coordinate: the same ±1 sign matrix (bit 16 of
    (i·2654435761 + j·40503) mod 2^32, 0-based dim i) and the same
    ascending sequential fold as the Spark F.aggregate."""
    c = j * 40503
    return (
        "list_sum(list_transform(v, (x, i) -> x * ("
        f"CASE WHEN ((((i - 1) * 2654435761 + {c}) % 4294967296) "
        "// 65536) % 2 = 0 THEN 1.0 ELSE -1.0 END)))"
    )


_JL_PROJ_LIST = ", ".join(_jl_proj_sql(j) for j in range(8))
_JL_DPROJ = " + ".join(
    f"(a.p[{j + 1}] - b.p[{j + 1}]) * (a.p[{j + 1}] - b.p[{j + 1}])"
    for j in range(8)
)

# JL sign-projection distance-preservation histogram: identical int64
# sign matrix, identical ascending folds, floor(ratio*10) buckets
ORACLES["embedding_random_projection"] = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), proj AS (
        SELECT vec_id, v, [{_JL_PROJ_LIST}] AS p FROM e
    ), pairs AS (
        SELECT a.v AS va, b.v AS vb,
               list_sum(list_transform(a.v,
                   (x, i) -> (x - b.v[i]) * (x - b.v[i]))) AS d_orig,
               {_JL_DPROJ} AS d_proj
        FROM proj a JOIN proj b
          ON b.vec_id = a.vec_id + 1 AND a.vec_id % 2 = 0
    )
    SELECT CASE WHEN d_orig <= 0 THEN -1
                ELSE least(CAST(floor(sqrt((d_proj / 8.0) / d_orig) * 10)
                                AS BIGINT), 19)
           END AS ratio_bucket,
           count(*) AS n_pairs
    FROM pairs GROUP BY 1 ORDER BY 1
"""

# PCA trace audit: the covariance trace from the same exact-decimal
# moment pipeline, emitted twice — the Spark twin's second column is
# the numpy eigenvalue sum, so the hash match IS the
# trace == sum(eigenvalues) invariant at 6 dp.
ORACLES["embedding_pca_trace_audit"] = """
    WITH pos AS (
        SELECT t.i AS dim, CAST(v[t.i] AS DOUBLE) AS val
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             unnest(range(1, len(v) + 1)) AS t(i)
    ),
    agg AS (
        SELECT dim, count(*) AS n,
               sum(CAST(val AS DECIMAL(38,18))) AS s,
               sum(CAST(val * val AS DECIMAL(38,18))) AS q
        FROM pos GROUP BY dim
    )
    SELECT CAST(count(*) AS INTEGER) AS n_dims,
           floor(sum(CAST(q AS DOUBLE) / n
                     - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                 * 1e6 + 0.5) / 1e6 AS trace,
           floor(sum(CAST(q AS DOUBLE) / n
                     - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                 * 1e6 + 0.5) / 1e6 AS sum_eigenvalues
    FROM agg
"""
