"""Planted tests for vocabulary-richness estimators, PMI
collocations, and term burstiness."""

from __future__ import annotations

import math

from training_etl_demo_2_spark.operators import text


def _docs(spark, rows):
    # rows: (doc_id, text, source)
    return spark.createDataFrame(
        [(i, tx, "en", s, len(tx)) for (i, tx, s) in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def test_vocab_richness_hand_computed(spark):
    # src a: tokens -> x x x y z  => N=5, V=3, f1=2 (y,z), f2=0
    # chao1 = 3 + 2*1/(2*1) = 4.0 ; p0 = 2/5 = 0.4
    df = _docs(spark, [(1, "x x x y", "a"), (2, "z", "a")])
    out = {r["source"]: r.asDict() for r in text.vocab_richness(df).collect()}
    a = out["a"]
    assert (a["n_tokens"], a["vocab"], a["f1"], a["f2"]) == (5, 3, 2, 0)
    assert a["chao1_r4"] == 4.0
    assert a["gt_unseen_r6"] == 0.4


def test_vocab_richness_no_singletons(spark):
    # every type seen twice: f1=0 -> chao1 == vocab, unseen mass 0
    df = _docs(spark, [(1, "a b a b", "s")])
    r = text.vocab_richness(df).collect()[0]
    assert r["f1"] == 0 and r["chao1_r4"] == r["vocab"] == 2
    assert r["gt_unseen_r6"] == 0.0


def test_pmi_perfect_collocation_beats_chance(spark):
    # "new york" always adjacent; "of the" co-occur but independently
    # scattered. PMI(new,york) = ln(p12/(p1*p2)) with c12=c1=c2 ->
    # maximal among pairs.
    rows = [(i, "new york " + "of the and of the and", "s") for i in range(6)]
    df = _docs(spark, rows)
    out = text.bigram_pmi_collocations(df, min_count=2, top_n=10).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    # hand-check the top PMI: 8 tokens/doc -> c12=6, n_bi=6*7=42,
    # c1=c2=6, n_uni=6*8=48
    pmi = math.log((6 / 42) / ((6 / 48) * (6 / 48)))
    assert out[0]["pmi_nano"] == math.floor(pmi * 1e9 + 0.5)


def test_pmi_min_count_floor_prunes(spark):
    # a pair seen once is pruned by the floor
    df = _docs(spark, [(1, "rare pair", "s"), (2, "rare thing", "s")])
    out = text.bigram_pmi_collocations(df, min_count=2, top_n=10).collect()
    assert out == []


def test_burstiness_clumped_term_ranks_first(spark):
    # "bursty" occurs 9 times in one doc of 10; "flat" once per doc.
    # VMR(flat) = 0 (constant 1 across all docs ... with zeros none):
    # flat: every doc has exactly 1 -> var 0 -> VMR 0.
    # bursty: counts [9,0,...,0]: mean .9, E[x^2]=8.1, var=7.29, VMR=8.1
    rows = [(0, "flat " + " ".join(["bursty"] * 9), "s")]
    rows += [(i, "flat", "s") for i in range(1, 10)]
    df = _docs(spark, rows)
    out = text.term_burstiness(df, min_docs=1, top_n=10).collect()
    assert out[0]["term"] == "bursty"
    assert out[0]["vmr_nano"] == math.floor(8.1 * 1e9 + 0.5)
    flat = [r for r in out if r["term"] == "flat"][0]
    assert flat["vmr_nano"] == 0
    assert flat["df_t"] == 10 and flat["c_total"] == 10


def test_burstiness_min_docs_floor(spark):
    df = _docs(spark, [(1, "solo solo", "s"), (2, "pair", "s"), (3, "pair", "s")])
    out = text.term_burstiness(df, min_docs=2, top_n=10).collect()
    assert {r["term"] for r in out} == {"pair"}
