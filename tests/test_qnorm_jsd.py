"""Planted tests for cross-source quantile normalization and the
Jensen-Shannon source-divergence screen."""

from __future__ import annotations

import math

from training_etl_demo_2_spark.operators import curation, text


def _docs(spark, rows):
    # rows: (doc_id, text, source, n_chars)
    return {
        "documents": spark.createDataFrame(
            [(i, tx, "en", s, n) for (i, tx, s, n) in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


def test_qnorm_maps_to_pooled_order_stats(spark):
    # source a: lengths 1..10, source b: 101..110. Pooled sorted:
    # [1..10, 101..110]. Each source has n_s=10 of N=20, so rank r
    # maps to pooled index 2r: a -> [2,4,6,8,10,102,104,106,108,110].
    rows = [(i, "t", "a", i + 1) for i in range(10)]
    rows += [(10 + i, "t", "b", 101 + i) for i in range(10)]
    out = curation.quantile_normalize_lengths(_docs(spark, rows)).collect()
    a_norm = sorted(r["x_norm"] for r in out if r["source"] == "a")
    b_norm = sorted(r["x_norm"] for r in out if r["source"] == "b")
    expected = [2, 4, 6, 8, 10, 102, 104, 106, 108, 110]
    assert a_norm == expected
    # equal ranks map to the SAME pooled stats: b matches a exactly
    assert b_norm == expected


def test_qnorm_identity_when_single_source(spark):
    # one source: rank r of n maps to pooled index r -> x_norm == x
    rows = [(i, "t", "only", 50 + 3 * i) for i in range(25)]
    out = curation.quantile_normalize_lengths(_docs(spark, rows)).collect()
    assert all(r["x_norm"] == r["x"] for r in out)
    assert len(out) == 25


def test_jsd_disjoint_vs_identical_vocab(spark):
    # src "same" shares the rest's vocabulary with the same relative
    # frequencies -> JSD ~ 0. src "alien" has a disjoint vocabulary ->
    # JSD = ln 2 (within nano rounding).
    common = "alpha beta gamma delta"
    rows = [(i, common, "bg", len(common)) for i in range(20)]
    rows += [(100 + i, common, "same", len(common)) for i in range(10)]
    alien = "zeta eta theta iota"
    rows += [(200 + i, alien, "alien", len(alien)) for i in range(10)]
    out = {
        r["source"]: r.asDict()
        for r in text.js_divergence_by_source(
            _docs(spark, rows)["documents"]
        ).collect()
    }
    # "same" vs rest: rest includes alien docs, so not exactly 0 but
    # far below the alien's divergence
    assert out["alien"]["jsd_nano"] > out["same"]["jsd_nano"] * 3
    # alien vocab is fully disjoint from the rest -> JSD == ln 2
    assert abs(out["alien"]["jsd_nano"] / 1e9 - math.log(2)) < 1e-6
    assert abs(out["alien"]["jsd_bits_r6"] - 1.0) < 1e-5
    assert out["alien"]["n_terms_in_source"] == 4


def test_jsd_identical_split_is_zero(spark):
    # two sources with IDENTICAL unigram distributions -> JSD exactly 0
    # for both (every term has p == q -> both logs are ln 1).
    t0 = "one two three two one"
    rows = [(i, t0, "a", len(t0)) for i in range(6)]
    rows += [(50 + i, t0, "b", len(t0)) for i in range(6)]
    out = {
        r["source"]: r.asDict()
        for r in text.js_divergence_by_source(
            _docs(spark, rows)["documents"]
        ).collect()
    }
    assert out["a"]["jsd_nano"] == 0 and out["b"]["jsd_nano"] == 0
