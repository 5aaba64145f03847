"""Record linkage: distributed fuzzy (edit-distance) join.

Beyond-reference capability (SURVEY.md §2.11 — the reference joins
nothing fuzzily): entity resolution against a canonical dimension is a
standard step in assembling a training corpus (mapping dirty source
names onto a clean vocabulary) and in classic warehouse dedup.

Design: the q-gram COUNT-FILTER join (Gravano et al., VLDB'01 — the
same lossless-blocking family as the Bayardo prefix filter used by
``dedup.ngram_near_duplicates``).  Two strings with edit distance ≤ k
differ by ≤ k edit operations and each operation destroys at most q
q-grams, so they must share at least

    max(len_a, len_b) − q + 1 − q·k

q-grams (counting multiplicity).  The join therefore:

1. explodes each side into (q-gram, count) rows — row-local;
2. equi-joins on the gram and sums ``least(count_l, count_r)`` per
   candidate pair — the multiset-intersection size, a plain
   shuffle-join + groupBy that AQE can skew-split (a hot gram is the
   same shape as a hot LSH bucket);
3. keeps pairs meeting the count bound and the |len diff| ≤ k band,
   then verifies with one exact ``levenshtein`` per surviving pair.

Strings too short for the bound to bite (len < q·(k+1): the threshold
is ≤ 0 there, and a string shorter than q has no grams at all) take a
separate TINY path: a banded equi-join on candidate lengths (each left
row emits its k+1 admissible right-lengths — bounded fan-out, no cross
join).  The band |len diff| ≤ k means every pair missed by the gram
path has BOTH endpoints tiny, so gram path (max len ≥ q·(k+1)) and
tiny path (max len < q·(k+1)) partition the candidate space — the
union is lossless and duplicate-free.  Result: EXACTLY the pairs with
levenshtein ≤ k, so a plain SQL join with the same predicate is the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_counts(df: DataFrame, keys: list[str], sstr: str, q: int) -> DataFrame:
    """(*keys, gram, cnt) — per-string q-gram multiset, computed with
    row-local HOFs (no UDF)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({sstr}) - {q - 1}, 0)), "
        f"i -> substring({sstr}, i, {q}))"
    )
    return (
        df.select(*keys, F.explode(grams).alias("__gram"))
        .groupBy(*keys, "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str | None = None,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (left row, right string) pairs with
    ``levenshtein(left_col, right_col) <= max_dist`` — exact semantics,
    blocked as described in the module docstring so no all-pairs join
    ever forms.  Returns left_id (if given), left_col, right_col,
    edit_dist.  Null strings never match (no identity under edit
    distance).

    SET semantics on BOTH sides: ``right`` is deduplicated on
    ``right_col`` and ``left`` on its key columns, so each distinct
    (left keys, right string) pair appears exactly once.  Without the
    up-front dedupe the two blocking paths would disagree on duplicate
    left rows — the gram path's candidate groupBy collapses them while
    the tiny path emits one pair per input row (round-8 advice).
    Callers who need per-row multiplicity should pass a unique
    ``left_id`` (the dedupe is then a no-op on content and the output
    is per-row).
    """
    if max_dist < 1:
        raise ValueError("fuzzy_join: max_dist must be >= 1")
    if q < 1:
        raise ValueError("fuzzy_join: q must be >= 1")
    if left_col not in left.columns:
        raise ValueError(f"fuzzy_join: left is missing column {left_col!r}")
    if right_col not in right.columns:
        raise ValueError(f"fuzzy_join: right is missing column {right_col!r}")

    lkeys = list(dict.fromkeys(([left_id] if left_id else []) + [left_col]))
    L = (
        left.select(*lkeys)
        .where(F.col(left_col).isNotNull())
        .distinct()
        .withColumn("__llen", F.length(left_col))
    )
    R = (
        right.select(right_col)
        .where(F.col(right_col).isNotNull())
        .distinct()
        .withColumn("__rlen", F.length(right_col))
    )
    tiny_cut = q * (max_dist + 1)
    band = F.abs(F.col("__llen") - F.col("__rlen")) <= max_dist

    # gram path: pairs where the longer string has >= tiny_cut chars
    lg = _gram_counts(
        L.where(F.col("__llen") >= q), lkeys + ["__llen"], left_col, q
    ).withColumnRenamed("__cnt", "__lcnt")
    rg = _gram_counts(
        R.where(F.col("__rlen") >= q), [right_col, "__rlen"], right_col, q
    ).withColumnRenamed("__cnt", "__rcnt")
    threshold = (
        F.greatest(F.col("__llen"), F.col("__rlen")) - F.lit(q - 1 + q * max_dist)
    )
    gram_pairs = (
        lg.join(rg, "__gram")
        .groupBy(*lkeys, "__llen", right_col, "__rlen")
        .agg(F.sum(F.least("__lcnt", "__rcnt")).alias("__common"))
        .where(
            (F.greatest(F.col("__llen"), F.col("__rlen")) >= tiny_cut)
            & band
            & (F.col("__common") >= threshold)
        )
        .drop("__common")
    )

    # tiny path: both strings shorter than tiny_cut — banded-length
    # equi-join (each left row fans out to its 2k+1 admissible right
    # lengths; the tiny slice of any real corpus is small)
    lt = L.where(F.col("__llen") < tiny_cut).withColumn(
        "__rlen",
        F.explode(
            F.sequence(
                F.greatest(F.col("__llen") - max_dist, F.lit(0)),
                F.col("__llen") + max_dist,
            )
        ),
    )
    tiny_pairs = lt.join(
        R.where(F.col("__rlen") < tiny_cut), "__rlen"
    ).select(*lkeys, "__llen", right_col, "__rlen")

    dist = F.levenshtein(F.col(left_col), F.col(right_col))
    return (
        gram_pairs.unionByName(tiny_pairs)
        .withColumn("edit_dist", dist)
        .where(F.col("edit_dist") <= max_dist)
        .select(*lkeys, right_col, "edit_dist")
    )
