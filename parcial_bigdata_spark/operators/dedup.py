"""Deduplication operators over ``documents`` / ``embeddings``.

Training-data-pipeline extensions (BASELINE.json north star): exact
dedup, n-gram Jaccard near-dup, MinHash+LSH, SimHash, and embedding-
cosine near-dup.  Design rule at 100 TB: NEVER compare all pairs —
every near-dup operator first buckets candidates (blocking key, LSH
band, SimHash chunk, cluster label) so the quadratic step runs only
inside small buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parcial_bigdata_spark.functions.vector import cosine
from parcial_bigdata_spark.operators.text import normalized


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy on the content: one row per duplicated
    text with the surviving (minimum) doc_id and the duplicate count.
    Deterministic — unlike dropDuplicates, which keeps an arbitrary row."""
    return (
        documents.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")
    )


def dedup_exact_survivors(documents: DataFrame) -> DataFrame:
    """The kept-rows side of exact dedup: min doc_id per distinct text,
    with per-language accounting of rows in vs rows out."""
    kept = documents.groupBy("lang", "text").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("distinct_docs"),
            F.sum("n_copies").alias("total_docs"),
        )
        .orderBy("lang")
    )


def _word_sets(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_distinct(F.split(normalized(F.col("text")), " ")).alias("wset"),
    )


def jaccard_pairs(documents: DataFrame, threshold: float = 0.8, length_slack: float = 0.2) -> DataFrame:
    """Exact n-gram (word-set) Jaccard near-dup with cheap blocking.

    Candidate pairs are restricted to same-language documents whose
    lengths differ by ≤ ``length_slack`` (a true near-dup pair above
    ``threshold`` necessarily satisfies a length bound, so the block is
    lossless for Jaccard ≥ t when slack ≥ (1-t)/t... we keep a generous
    slack).  The pairwise step is a self-join on the blocking key only;
    at scale the MinHash/LSH variant (below) replaces it with banded
    bucketing.
    """
    a = _word_sets(documents).alias("a")
    b = _word_sets(documents).alias("b")
    inter = F.size(F.array_intersect(F.col("a.wset"), F.col("b.wset")))
    union = F.size(F.array_union(F.col("a.wset"), F.col("b.wset")))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.col("a.n_chars") - F.col("b.n_chars"))
                <= length_slack * F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------- MinHash/LSH

N_HASHES = 16
BAND_SIZE = 4  # 4 bands × 4 rows


def shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """k-word shingles of the normalized text (distinct per doc)."""
    w = F.split(normalized(F.col("text")), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    return documents.select("doc_id", F.array_distinct(sh).alias("shingles"))


def minhash_signatures(documents: DataFrame, k: int = 3) -> DataFrame:
    """MinHash signature (N_HASHES perms) per document.

    One explode + one groupBy with N_HASHES partial-min aggregates: the
    shuffle carries one row per doc, not per shingle.  Permutation j is
    xxhash64(shingle, j) — seedable, JVM-side, no Python.
    """
    ex = shingles(documents, k).select("doc_id", F.explode("shingles").alias("sh"))
    aggs = [F.min(F.xxhash64("sh", F.lit(j))).alias(f"h{j}") for j in range(N_HASHES)]
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_candidates(documents: DataFrame, k: int = 3) -> DataFrame:
    """LSH banding: docs agreeing on any band of the signature become
    candidate pairs.  Join is equi on (band_id, band_hash) — each bucket
    is tiny, so the pair step never goes quadratic in the corpus."""
    sig = minhash_signatures(documents, k)
    n_bands = N_HASHES // BAND_SIZE
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.xxhash64(*[F.col(f"h{i * BAND_SIZE + r}") for r in range(BAND_SIZE)]).alias(
                    "band_hash"
                ),
            )
            for i in range(n_bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_duplicates(documents: DataFrame, threshold: float = 0.7, k: int = 3) -> DataFrame:
    """Full MinHash+LSH near-dup: banded candidates, then exact shingle-
    Jaccard verification of ONLY the candidates.  (Approximate recall by
    design → no SQL oracle; the exact ``jaccard_pairs`` operator is the
    oracle-checked ground truth.)"""
    cand = minhash_candidates(documents, k)
    sh = shingles(documents, k)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------------------- SimHash

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # pairs within hamming ≤ SIMHASH_CHUNKS-1 share ≥1 chunk


def simhash(documents: DataFrame) -> DataFrame:
    """64-bit SimHash of the word multiset, pure built-ins.

    Per doc: hash each word (xxhash64), and for each bit position sum
    +1/-1 contributions; fingerprint bit = sign.  Explode+groupBy keeps
    it one shuffle with map-side partials (64 small int sums per doc).
    """
    w = documents.select(
        "doc_id", F.explode(F.split(normalized(F.col("text")), " ")).alias("word")
    ).withColumn("wh", F.xxhash64("word"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("wh"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = w.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_near_duplicates(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup via chunk blocking: split the 64-bit fingerprint
    into SIMHASH_CHUNKS 16-bit chunks; any pair with hamming ≤ 3 agrees
    on ≥1 chunk (pigeonhole) → equi-join per chunk, verify bit_count."""
    fp = simhash(documents)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
            )
            for i in range(SIMHASH_CHUNKS)
        ]
    )
    blocked = fp.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


# ------------------------------------------------------ Embedding near-dup

def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-dup, blocked by the cluster label so the
    pairwise cosine runs only within blocks (at scale the block key comes
    from coarse quantization / IVF assignment)."""
    cols = ["vec_id", "embedding", block_col]
    a = embeddings.select(*cols).alias("a")
    b = embeddings.select(*cols).alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
