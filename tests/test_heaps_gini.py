"""Planted tests for the Heaps'-law vocabulary-growth fit and the
per-source doc-length Gini coefficient."""

from __future__ import annotations

import math

from training_etl_demo_2_spark.operators import text


def _docs(spark, rows):
    # rows: (doc_id, text, source, n_chars)
    return spark.createDataFrame(
        [(i, tx, "en", s, n) for (i, tx, s, n) in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def test_heaps_exact_power_law_recovered(spark):
    # Construct a corpus whose cumulative curve lies EXACTLY on
    # V = N^0.5: after doc i, N_i = i^2 tokens and V_i = i types.
    # Doc i contributes 2i-1 tokens (i^2 - (i-1)^2) of which exactly
    # one is a new type ("t{i}") and the rest repeat type "t1".
    rows = []
    for i in range(1, 21):
        words = [f"t{i}"] + ["t1"] * (2 * i - 2)
        rows.append((i, " ".join(words), "s", 1))
    out = text.heaps_law_fit(_docs(spark, rows)).collect()[0]
    assert out["n_points"] == 20
    # log V_i = 0.5 * log N_i exactly -> slope 0.5, r2 = 1, K = 1
    assert abs(out["beta_r6"] - 0.5) < 1e-4
    assert out["r2_r6"] > 0.999999 - 1e-6
    assert abs(out["k_r2"] - 1.0) < 0.01


def test_heaps_saturated_vocab_slope_near_zero(spark):
    # Same single word repeated: V_i = 1 forever -> ln V = 0 for all
    # points -> slope 0.
    rows = [(i, "same same same", "s", 1) for i in range(1, 11)]
    out = text.heaps_law_fit(_docs(spark, rows)).collect()[0]
    assert out["beta_r6"] == 0.0


def test_gini_uniform_lengths_is_zero(spark):
    rows = [(i, "t", "u", 100) for i in range(10)]
    out = text.gini_doc_length(_docs(spark, rows)).collect()[0]
    assert out["gini_r6"] == 0.0


def test_gini_concentrated_matches_closed_form(spark):
    # one doc holds nearly everything: lengths [1]*9 + [991]
    # sorted asc ranks 1..10, S = sum(i*x) = 45 + 10*991 = 9955
    # G = 2*9955/(10*1000) - 11/10 = 1.991 - 1.1 = 0.891
    rows = [(i, "t", "c", 1) for i in range(9)]
    rows.append((9, "t", "c", 991))
    out = text.gini_doc_length(_docs(spark, rows)).collect()[0]
    assert out["n_docs"] == 10 and out["total_chars"] == 1000
    assert abs(out["gini_r6"] - 0.891) < 1e-9


def test_gini_tie_order_invariant(spark):
    # permuting doc_ids among tied lengths cannot change G
    rows_a = [(i, "t", "s", v) for i, v in enumerate([5, 5, 5, 20, 20])]
    rows_b = [(4 - i, "t", "s", v) for i, v in enumerate([5, 5, 5, 20, 20])]
    ga = text.gini_doc_length(_docs(spark, rows_a)).collect()[0]["gini_r6"]
    gb = text.gini_doc_length(_docs(spark, rows_b)).collect()[0]["gini_r6"]
    assert ga == gb
