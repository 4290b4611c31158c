"""Differential pin for the composed shingle hash (optimization r10;
r11 moved it to ``word_ngram_hashes_composed`` and reverted the default
to the string fold — see the r11 A/B notes on the functions).

``word_ngram_hashes_composed(tokens, n)`` must be BIT-IDENTICAL to the
``transform(word_ngrams(tokens, n), rolling_hash)`` formulation (which
is also what ``word_ngram_hashes`` now computes) on every input — the whole dedup/text shingle family (and its DuckDB twins, which
replay the character fold) rides on that equality. The cases are chosen
adversarially against the composition math:

* empty tokens (consecutive separators) — the pw=31^0=1 / phantom-""
  round-trip documented on the function
* a token longer than the 256-entry power table — the folded fallback
* non-ASCII characters — ascii() = codepoint and length() = codepoints
  must segment identically in the per-token and whole-string folds
* n = 1 (no composition at all) through n = 5
* docs shorter than n tokens — the empty-array guard on both paths
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from training_etl_demo_2_spark.functions import (
    rolling_hash,
    word_ngram_hashes,
    word_ngram_hashes_composed,
    word_ngrams,
)

CASES = [
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "one",
    "",
    "  leading and  double  spaces ",
    "tail space ",
    " x",
    "same same same same",
    "punct, marks! and? digits 123 mixed-up",
    "w" * 300 + " short tail tokens here",  # > _POW_TABLE_SIZE chars
    "café naïve résumé tokens",
    "日本語 テスト 混在 ascii mix",
    "x " * 50,
]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_composed_equals_string_fold(spark, n):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               ["doc_id", "text"])
    toks = F.split(F.col("text"), " ")
    out = df.select(
        "doc_id",
        F.transform(word_ngrams(toks, n), lambda s: rolling_hash(s)).alias(
            "via_strings"
        ),
        word_ngram_hashes_composed(toks, n).alias("via_compose"),
    ).collect()
    for r in out:
        assert r.via_compose == r.via_strings, (
            f"doc {r.doc_id} n={n}: {r.via_compose} != {r.via_strings}"
        )


def test_composed_equals_string_fold_on_fixture(spark, tables):
    """The real corpus (sf0.001, 500 docs) hashes identically at the
    default shingle width."""
    toks = F.split(F.col("text"), " ")
    mism = (
        tables["documents"]
        .select(
            F.transform(
                word_ngrams(toks, 3), lambda s: rolling_hash(s)
            ).alias("a"),
            word_ngram_hashes_composed(toks, 3).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert mism == 0


@pytest.mark.parametrize("n", [1, 3])
def test_default_is_string_fold(spark, n):
    """word_ngram_hashes (the r11 default) equals the explicit
    string-fold composition it documents."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               ["doc_id", "text"])
    toks = F.split(F.col("text"), " ")
    out = df.select(
        F.transform(word_ngrams(toks, n), lambda s: rolling_hash(s)).alias(
            "a"
        ),
        word_ngram_hashes(toks, n).alias("b"),
    ).collect()
    for r in out:
        assert r.a == r.b
