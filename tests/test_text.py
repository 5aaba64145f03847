"""Text-analysis operators: golden counts on the documents fixture."""

from __future__ import annotations

from parcial_bigdata_spark.operators import text


def test_token_counts_golden(documents):
    out = {r.source: (r.n_docs, r.ws_tokens, r.regex_tokens)
           for r in text.token_counts(documents).collect()}
    # fixture: web = docs 1,2,4 (10+10+10 ws tokens), book = docs 3,5 (10+8)
    assert out["web"] == (3, 30, 30)
    assert out["book"] == (2, 18, 18)


def test_quality_metrics_shape(documents):
    out = {r.lang: r for r in text.quality_metrics(documents).collect()}
    assert out["en"].n_docs == 4 and out["es"].n_docs == 1
    # no punctuation in fixture texts
    assert out["en"].avg_punct_ratio == 0.0
    # every word in fixture is ≥ 3 chars, space-separated
    assert out["en"].avg_word_len > 3


def test_language_id_flags_english_markers(documents, spark):
    rows = [
        (10, "the cat is on the mat and the dog is here", "en", "web", 42),
        (11, "el perro y el gato de la casa que ladra", "es", "web", 39),
        (12, "zzz qqq xxx www yyy", "xx", "web", 19),
    ]
    extra = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.lang, r.predicted_lang): r.n_docs
           for r in text.language_id(extra).collect()}
    assert out[("en", "en")] == 1
    assert out[("es", "es")] == 1
    assert out[("xx", "und")] == 1  # below confidence floor


def test_fingerprints_ignore_case_and_punct(spark):
    rows = [
        (1, "Hello, World!", "en", "web", 13),
        (2, "hello world", "en", "web", 11),
        (3, "different text", "en", "web", 14),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r.fingerprint for r in text.fingerprints(docs).collect()}
    assert out[1] == out[2]  # normalization collapses case + punctuation
    assert out[1] != out[3]
    assert len(out[1]) == 32  # md5 hex
