"""Word-frequency pipeline unit tests — edge cases per SURVEY.md §5:
empty text, consecutive spaces (empty tokens are KEPT, matching the
reference's literal-space split, demo-etl-2a-notebook.py:53)."""

from __future__ import annotations

from training_etl_demo_2_spark.operators.wordcount import top_k_words, word_counts


def test_basic_counts(spark):
    df = spark.createDataFrame(
        [("a b a",), ("b c",)], "text string"
    )
    got = {(r.word, r.cnt) for r in word_counts(df).collect()}
    assert got == {("a", 2), ("b", 2), ("c", 1)}


def test_empty_tokens_kept(spark):
    # "a  b" splits to ["a", "", "b"] on a literal single space
    df = spark.createDataFrame([("a  b",)], "text string")
    got = {(r.word, r.cnt) for r in word_counts(df).collect()}
    assert got == {("a", 1), ("", 1), ("b", 1)}


def test_empty_string_row(spark):
    df = spark.createDataFrame([("",)], "text string")
    got = [(r.word, r.cnt) for r in word_counts(df).collect()]
    assert got == [("", 1)]


def test_ordering_and_topk(spark):
    df = spark.createDataFrame([("z z y y x",)], "text string")
    rows = [(r.word, r.cnt) for r in word_counts(df).collect()]
    # count desc, then word asc tie-break
    assert rows == [("y", 2), ("z", 2), ("x", 1)]
    assert [r.word for r in top_k_words(df, 2).collect()] == ["y", "z"]


def test_on_documents_table(tables):
    wc = word_counts(tables["documents"])
    rows = wc.collect()
    assert len(rows) > 0
    assert rows[0].cnt == max(r.cnt for r in rows)


def test_salted_equals_plain(tables):
    from training_etl_demo_2_spark.operators.wordcount import word_counts_salted

    plain = {(r.word, r.cnt) for r in word_counts(tables["documents"]).collect()}
    salted = {
        (r.word, r.cnt) for r in word_counts_salted(tables["documents"]).collect()
    }
    assert plain == salted
