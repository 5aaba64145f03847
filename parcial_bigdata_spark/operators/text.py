"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline extensions (BASELINE.json north star): quality
scoring, token counting, language-ID heuristic, document fingerprinting.
Everything is built-in string/regex/array expressions — codegen'd,
shuffle-free until the final small aggregate — so the same plan streams
through 100 TB of text at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single other glyphs.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def words(text: Column | str) -> Column:
    return F.split(text, " ")


def normalized(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse all
    non-alphanumeric runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def quality_metrics(documents: DataFrame) -> DataFrame:
    """Per-language quality profile: length, word stats, punctuation and
    stopword ratios — the usual pre-training quality filters."""
    w = words(F.col("text"))
    n_words = F.size(w)
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0))
    stop_hits = F.size(F.filter(w, lambda t: t.isin(*LANG_MARKERS["en"])))
    per_doc = documents.select(
        "lang",
        n_chars.alias("chars"),
        n_words.alias("nw"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (stop_hits.cast("double") / n_words).alias("stop_ratio"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("chars"), 2).alias("avg_chars"),
            F.round(F.avg("nw"), 2).alias("avg_words"),
            F.round(F.avg("punct_ratio"), 4).alias("avg_punct_ratio"),
            F.round(F.avg("stop_ratio"), 4).alias("avg_stop_ratio"),
            F.round(F.avg("avg_word_len"), 4).alias("avg_word_len"),
        )
        .orderBy("lang")
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish regex token counts, aggregated per source —
    the 'how many tokens is this corpus' accounting query."""
    ws_tokens = F.size(words(F.col("text")))
    re_tokens = F.size(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0))
    return (
        documents.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws_tokens).alias("ws_tokens"),
            F.sum(re_tokens).alias("regex_tokens"),
        )
        .orderBy("source")
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Marker-lexicon language ID: score = hit-ratio per language, argmax
    with a confidence floor.  Confusion-matrix output against the labeled
    ``lang`` column."""
    w = words(normalized(F.col("text")))
    n_words = F.size(w)

    def _hits(markers: list[str]):
        # closure factory: a default-arg lambda would make PySpark treat
        # the extra parameter as a lambda variable
        return lambda t: t.isin(*markers)

    scores = [
        (F.size(F.filter(w, _hits(markers))).cast("double") / n_words).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = documents.select("doc_id", "lang", n_words.alias("nw"), *scores)
    langs = list(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best_score < 0.05, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best_score, F.lit(l))
    predicted = scored.select("doc_id", "lang", pred.alias("predicted_lang"))
    return (
        predicted.groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def quality_pass_rates(
    documents: DataFrame,
    min_chars: int = 120,
    max_word_len: float = 12.0,
) -> DataFrame:
    """Quality-gate pass rates per language: the pre-training corpus
    filter (length + average-word-length gates) reported as kept/total —
    the accounting view a data pipeline emits alongside the filtered
    corpus itself."""
    n_words = F.size(F.split(F.col("text"), " "))
    awl = F.length("text").cast("double") / n_words
    passes = (F.col("n_chars") >= min_chars) & (awl <= max_word_len)
    return (
        documents.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(passes, 1).otherwise(0)).alias("n_pass"),
            F.round(
                F.sum(F.when(passes, 1).otherwise(0)) / F.count("*"), 4
            ).alias("pass_rate"),
        )
        .orderBy("lang")
    )


def top_words_per_lang(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-k words per language: explode → per-(lang, word) count (one
    shuffle with map-side partials) → per-lang row_number top-k.  The
    vocabulary-building primitive for corpus analysis; word counts are
    the high-cardinality agg, the top-k window only sees |vocab| rows."""
    from pyspark.sql import Window

    w = documents.select(
        "lang", F.explode(F.split(normalized(F.col("text")), " ")).alias("word")
    ).where(F.col("word") != "")
    counts = w.groupBy("lang", "word").agg(F.count("*").alias("n"))
    rnk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word").asc())
    )
    return (
        counts.withColumn("rnk", rnk)
        .where(F.col("rnk") <= k)
        .select("lang", "rnk", "word", "n")
        .orderBy("lang", "rnk")
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Deterministic content fingerprint: md5 of the normalized text.
    The join key for exact-dedup across shards/snapshots at scale (hash
    once, compare 16 bytes instead of full text)."""
    return documents.select(
        "doc_id",
        F.md5(normalized(F.col("text"))).alias("fingerprint"),
        "lang",
        "source",
    ).orderBy("doc_id")
