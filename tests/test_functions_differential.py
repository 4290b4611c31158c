"""Differential tests for the shared scalar primitives: the Spark
column expressions and the DuckDB SQL fragments generated from the same
constants must agree on adversarial inputs (empty strings, repeated
separators, unicode, long runs) — these primitives underpin every dedup
and fingerprint oracle comparison."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from training_etl_demo_2_spark.functions import (
    normalize_text,
    rolling_hash,
    word_ngrams,
)
from training_etl_demo_2_spark.operators.oracle import NORMALIZE, ROLLING_HASH

EDGE_TEXTS = [
    "",
    " ",
    "  ",
    "a",
    "a b",
    "a  b",  # double space -> empty token
    "the quick brown fox jumps over the lazy dog",
    "same same same same",
    "Tabs\tand\nnewlines mixed",
    "MiXeD CaSe WORDS here",
    "punctuation, galore! (yes?) -- dashes...",
    "digits 123 456 789 0",
    "x" * 300,
    ("repeat " * 50).strip(),
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_rolling_hash_matches_duckdb(spark, duck):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, t string")
    got = {
        r.i: r.h
        for r in df.select("i", rolling_hash(F.col("t")).alias("h")).collect()
    }
    expr = ROLLING_HASH.format(s="t")
    for i, t in enumerate(EDGE_TEXTS):
        want = duck.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert got[i] == want, f"hash mismatch on {t!r}: spark={got[i]} duck={want}"


def test_normalize_matches_duckdb(spark, duck):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, t string")
    got = {
        r.i: r.n
        for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()
    }
    expr = NORMALIZE.format(s="t")
    for i, t in enumerate(EDGE_TEXTS):
        want = duck.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [t]).fetchone()[0]
        assert got[i] == want, f"normalize mismatch on {t!r}"


def test_word_ngrams_matches_python_reference(spark):
    def ref(text, n):
        toks = text.split(" ")
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "i long, t string")
    for n in (2, 3):
        got = {
            r.i: list(r.g)
            for r in df.select(
                "i", word_ngrams(F.split(F.col("t"), " "), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(EDGE_TEXTS):
            assert got[i] == ref(t, n), f"ngrams({n}) mismatch on {t!r}"


def test_rolling_hash_property_random_ascii(spark, duck):
    """Property check (hypothesis): on arbitrary printable-ASCII
    strings — not just the curated edge list — the Spark fold and the
    DuckDB list_reduce produce identical hashes. Examples are batched
    into one DataFrame per draw so the property runs at Spark speed."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.characters(min_codepoint=32, max_codepoint=126)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=80), min_size=1, max_size=40))
    def prop(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string"
        )
        got = {
            r.i: r.h
            for r in df.select(
                "i", rolling_hash(F.col("t")).alias("h")
            ).collect()
        }
        expr = ROLLING_HASH.format(s="t")
        for i, t in enumerate(texts):
            want = duck.execute(
                f"SELECT {expr} FROM (SELECT ? AS t)", [t]
            ).fetchone()[0]
            assert got[i] == want, f"hash mismatch on {t!r}"

    prop()
