"""Text-analysis operator tests."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import text


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog", "en"),
            (2, "der hund und die katze ist nicht", "de"),
            (3, "zzz qqq www", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r.doc_id: r.lang_pred for r in text.language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "unknown"}


def test_quality_bounds(tables):
    rows = text.text_quality(tables["documents"]).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.alpha_ratio <= 1.0
        assert r.n_chars > 0


def test_quality_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = text.text_quality(df).collect()[0]
    assert r.alpha_ratio == 0.0 and r.punct_ratio == 0.0


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "hello, world 42!")], "doc_id long, text string"
    )
    r = text.token_stats(df).collect()[0]
    assert r.ws_tokens == 3
    # hello , world 42 !  -> 5 regex tokens
    assert r.regex_tokens == 5


def test_fingerprints_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in text.doc_fingerprints(df).collect()}
    assert rows[1].fp_raw != rows[2].fp_raw
    assert rows[1].fp_norm == rows[2].fp_norm


def test_ngram_counts_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b"), (2, "a b x")], "doc_id long, text string"
    )
    rows = {r.ngram: r.cnt for r in text.ngram_counts(df, n=2, min_count=1).collect()}
    assert rows["a b"] == 3  # twice in doc 1, once in doc 2
    assert rows["b c"] == 1
    assert "b x" in rows


def test_ngram_counts_short_docs_empty(spark):
    df = spark.createDataFrame([(1, "one")], "doc_id long, text string")
    assert text.ngram_counts(df, n=2, min_count=1).count() == 0


def test_remove_stopwords(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat")], "doc_id long, text string"
    )
    r = text.remove_stopwords(df).collect()[0]
    assert list(r.tokens) == ["cat", "hat"]
    assert r.clean_text == "cat hat"
    assert r.n_tokens == 2
