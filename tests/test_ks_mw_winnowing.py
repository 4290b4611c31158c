"""Planted-fixture tests for the KS drift screen, the Mann-Whitney
U/AUC operator, and winnowing fingerprints."""

from __future__ import annotations

import math

from training_etl_demo_2_spark.operators import dedup, validation


def _docs_tbl(spark, rows):
    # rows: (doc_id, lang, source, n_chars)
    return {
        "documents": spark.createDataFrame(
            [(i, "t", lg, s, n) for i, (lg, s, n) in enumerate(rows)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


# ---------------------------------------------------------------------------
# ks_drift_by_source
# ---------------------------------------------------------------------------


def test_ks_shifted_source_drifts_identical_does_not(spark):
    # src_same draws from the SAME values as the rest; src_far is
    # disjointly shifted, so its D must be 1.0 and flagged.
    rows = []
    for v in range(10, 60):
        rows += [("en", "bg0", v), ("en", "bg1", v), ("en", "src_same", v)]
    rows += [("en", "src_far", v) for v in range(500, 550)]
    out = {
        r["source"]: r.asDict()
        for r in validation.ks_drift_by_source(_docs_tbl(spark, rows)).collect()
    }
    assert out["src_far"]["ks_d_r6"] == 1.0 and out["src_far"]["drifted"] == 1
    assert out["src_same"]["ks_d_r6"] < 0.35  # rest includes src_far's tail
    # exact D check for src_same: CDFs computed by hand
    n_s, n_r = 50, 150
    d_best = 0.0
    vals = sorted({v for (_, _, v) in rows})
    for x in vals:
        cs = sum(1 for (_, s, v) in rows if s == "src_same" and v <= x)
        cr = sum(1 for (_, s, v) in rows if s != "src_same" and v <= x)
        d_best = max(d_best, abs(cs / n_s - cr / n_r))
    assert abs(out["src_same"]["ks_d_r6"] - round(d_best, 6)) < 1e-9


def test_ks_critical_value_formula(spark):
    rows = [("en", "a", v) for v in range(100)] + [
        ("en", "b", v) for v in range(100)
    ]
    out = {
        r["source"]: r.asDict()
        for r in validation.ks_drift_by_source(_docs_tbl(spark, rows)).collect()
    }
    # identical samples: D == 0, never drifted
    assert out["a"]["ks_d_r6"] == 0.0 and out["a"]["drifted"] == 0
    assert out["a"]["n_source"] == 100 and out["a"]["n_rest"] == 100


# ---------------------------------------------------------------------------
# mannwhitney_auc
# ---------------------------------------------------------------------------


def test_mw_perfect_separation_and_ties(spark):
    # src "sep": every en doc longer than every non-en -> AUC 1.0
    rows = [("en", "sep", 100 + i) for i in range(5)]
    rows += [("de", "sep", 10 + i) for i in range(5)]
    # src "tie": all docs the SAME length -> midranks equal, AUC 0.5
    rows += [("en", "tie", 50)] * 3 + [("fr", "tie", 50)] * 3
    # src "nopos": no en docs -> NULL auc
    rows += [("zh", "nopos", 40), ("zh", "nopos", 41)]
    out = {
        r["source"]: r.asDict()
        for r in validation.mannwhitney_auc(_docs_tbl(spark, rows)).collect()
    }
    assert out["sep"]["auc_r6"] == 1.0 and out["sep"]["u2"] == 2 * 25
    assert out["tie"]["auc_r6"] == 0.5
    assert out["nopos"]["auc_r6"] is None and out["nopos"]["n_pos"] == 0


def test_mw_against_pairwise_definition(spark):
    # AUC == P(len_en > len_other) + 0.5 P(equal), checked pairwise
    en = [30, 42, 42, 55]
    de = [30, 35, 42, 60, 61]
    rows = [("en", "s", v) for v in en] + [("de", "s", v) for v in de]
    out = validation.mannwhitney_auc(_docs_tbl(spark, rows)).collect()[0]
    wins = sum(1 for a in en for b in de if a > b)
    ties = sum(1 for a in en for b in de if a == b)
    auc = (wins + 0.5 * ties) / (len(en) * len(de))
    assert abs(out["auc_r6"] - round(auc, 6)) < 1e-9
    assert out["u2"] == 2 * wins + ties


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------


def _raw_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_winnowing_guarantee_shared_run(spark):
    # MOSS guarantee: a shared run of >= w+k-1 tokens must share at
    # least one fingerprint, wherever it sits in each doc.
    k, w = dedup.WIN_K, dedup.WIN_W
    shared = " ".join(f"s{i}g{i * 7}" for i in range(k + w - 1 + 10))
    d0 = "aa bb cc dd ee " + shared + " ff gg"
    d1 = shared + " zz yy xx ww vv uu tt"
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.winnowing_fingerprints(_raw_docs(spark, [d0, d1])).collect()
    }
    assert out[0]["n_shared_fp"] >= 1 and out[1]["n_shared_fp"] >= 1


def test_winnowing_density_and_disjoint(spark):
    k, w = dedup.WIN_K, dedup.WIN_W
    t0 = " ".join(f"aq{i}z{i * 3 + 1}" for i in range(200))
    t1 = " ".join(f"bk{i}m{i * 5 + 2}" for i in range(200))
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.winnowing_fingerprints(_raw_docs(spark, [t0, t1])).collect()
    }
    for r in out.values():
        # expected density 2/(w+1); allow wide slack but pin the order
        n_windows = r["n_grams"] - w + 1
        assert r["n_fp"] <= n_windows
        assert r["n_fp"] >= n_windows * 2 // (w + 1) // 3
    assert all(r["n_shared_fp"] == 0 for r in out.values())


def test_winnowing_short_doc_no_window(spark):
    # fewer than w grams -> no full window -> zero fingerprints
    k, w = dedup.WIN_K, dedup.WIN_W
    short = " ".join(f"t{i}" for i in range(k + w - 2))  # w-1 grams
    out = dedup.winnowing_fingerprints(_raw_docs(spark, [short])).collect()
    assert out[0]["n_fp"] == 0 and out[0]["n_grams"] == w - 1
