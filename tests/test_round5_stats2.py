"""Planted tests for one-way ANOVA/Bartlett, the event-type
cross-correlation function, A/B power analysis, and the Unicode-script
mismatch audit."""

from __future__ import annotations

import math

from training_etl_demo_2_spark.operators import behavior, temporal, text, validation


def _docs(spark, rows):
    # rows: (doc_id, n_chars, source)  -- text unused by ANOVA
    return {
        "documents": spark.createDataFrame(
            [(i, "x", "en", s, n) for (i, n, s) in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


def _docs_text(spark, rows):
    # rows: (doc_id, text, lang)
    return {
        "documents": spark.createDataFrame(
            [(i, tx, lg, "s", len(tx)) for (i, tx, lg) in rows],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
    }


def _events(spark, rows):
    # rows: (user_id, event_type, ts)
    return {
        "events": spark.createDataFrame(
            [(u, et, ts, 1.0, "s", "{}") for u, et, ts in rows],
            "user_id long, event_type string, ts string, value double, "
            "session_id string, props string",
        )
    }


# ---------------------------------------------------------------------------
# anova_bartlett_sources
# ---------------------------------------------------------------------------


def test_anova_hand_computed(spark):
    # A: 10,12,14 (mean 12, var 4); B: 20,22,24 (mean 22, var 4)
    # SSB = 3*25 + 3*25 = 150; SSW = 2*4 + 2*4 = 16
    # F = (150/1)/(16/4) = 37.5; eta2 = 150/166; Bartlett = 0 (equal v)
    rows = [(1, 10, "a"), (2, 12, "a"), (3, 14, "a"),
            (4, 20, "b"), (5, 22, "b"), (6, 24, "b")]
    out = validation.anova_bartlett_sources(_docs(spark, rows)).collect()[0]
    assert out["n_docs"] == 6 and out["k_sources"] == 2
    assert out["df_between"] == 1 and out["df_within"] == 4
    assert abs(out["f_r6"] - 37.5) < 1e-6
    assert abs(out["eta2_r6"] - 150.0 / 166.0) < 1e-5
    assert abs(out["bartlett_chi2_r6"]) < 1e-6
    assert out["n_zero_var_sources"] == 0


def test_anova_zero_variance_source_nulls_bartlett(spark):
    rows = [(1, 10, "a"), (2, 10, "a"),  # zero variance
            (3, 20, "b"), (4, 24, "b")]
    out = validation.anova_bartlett_sources(_docs(spark, rows)).collect()[0]
    assert out["n_zero_var_sources"] == 1
    assert out["bartlett_chi2_r6"] is None
    assert out["f_r6"] is not None  # ANOVA itself still defined


def test_anova_singleton_source_excluded(spark):
    rows = [(1, 10, "a"), (2, 12, "a"), (3, 999, "single"),
            (4, 20, "b"), (5, 22, "b")]
    out = validation.anova_bartlett_sources(_docs(spark, rows)).collect()[0]
    # 'single' (n=1) contributes nothing
    assert out["n_docs"] == 4 and out["k_sources"] == 2


# ---------------------------------------------------------------------------
# ccf_event_types
# ---------------------------------------------------------------------------


def test_ccf_shifted_impulse_peaks_at_lag(spark):
    # type a: 5 events at hour 3, 1 event every other hour 0..9
    # type b: same shape shifted +2 hours (spike at hour 5)
    # -> pair (a,b) CCF peaks at lag +2 with r = 1 (identical shape)
    rows = []
    for h in range(10):
        na = 5 if h == 3 else 1
        nb = 5 if h == 5 else 1
        for i in range(na):
            rows.append((100 + i, "a", f"2024-01-01 {h:02d}:30:00"))
        for i in range(nb):
            rows.append((200 + i, "b", f"2024-01-01 {h:02d}:30:00"))
    out = temporal.ccf_event_types(_events(spark, rows), max_lag=4).collect()
    assert all(r["type_a"] == "a" and r["type_b"] == "b" for r in out)
    assert len(out) == 9  # lags -4..4
    by_lag = {r["lag"]: r for r in out}
    peak = max(out, key=lambda r: r["ccf_r6"])
    assert peak["lag"] == 2
    assert abs(by_lag[2]["ccf_r6"] - 1.0) < 0.05  # same shape, n-2 overlap
    # overlap bookkeeping: n_pairs = n - |lag| on the shared 10h grid
    assert by_lag[0]["n_pairs"] == 10
    assert by_lag[4]["n_pairs"] == 6
    assert by_lag[-4]["n_pairs"] == 6


def test_ccf_symmetry_convention(spark):
    # b follows a by +2 -> positive-lag peak; swapping the NAMES so the
    # leader sorts SECOND must flip the peak sign of the lag
    rows = []
    for h in range(10):
        nz = 5 if h == 3 else 1  # "z" leads now (sorts after "b")
        nb = 5 if h == 5 else 1
        for i in range(nz):
            rows.append((100 + i, "z", f"2024-01-01 {h:02d}:30:00"))
        for i in range(nb):
            rows.append((200 + i, "b", f"2024-01-01 {h:02d}:30:00"))
    out = temporal.ccf_event_types(_events(spark, rows), max_lag=4).collect()
    peak = max(out, key=lambda r: r["ccf_r6"])
    assert (peak["type_a"], peak["type_b"]) == ("b", "z")
    assert peak["lag"] == -2


# ---------------------------------------------------------------------------
# ab_power_mde
# ---------------------------------------------------------------------------


def _ab_events(spark, n_users, conv_every):
    rows = []
    for u in range(n_users):
        rows.append((u, "view", "2024-01-01 10:00:00"))
        if conv_every and u % conv_every == 0:
            rows.append((u, "purchase", "2024-01-01 11:00:00"))
    return _events(spark, rows)


def test_ab_power_formula_reproduced_from_outputs(spark):
    out = behavior.ab_power_mde(_ab_events(spark, 1000, 10)).collect()[0]
    n_a, n_b, c = out["n_a"], out["n_b"], out["n_conv_total"]
    assert n_a + n_b == 1000 and c == 100
    z = behavior.AB_Z_ALPHA + behavior.AB_Z_POWER
    p = c / 1000.0
    mde = z * math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    assert abs(out["mde_abs_r6"] - mde) < 1e-6
    assert abs(out["mde_rel_r6"] - mde / p) < 1e-6
    p2 = p * (1.0 + behavior.AB_TARGET_REL_LIFT)
    n_req = math.ceil(
        z * z * (p * (1 - p) + p2 * (1 - p2)) / ((p2 - p) * (p2 - p))
    )
    assert out["n_per_arm_10pct"] == n_req
    assert out["powered_for_10pct"] == int(min(n_a, n_b) >= n_req)
    assert out["p_pool_bp"] == 1000


def test_ab_power_mde_shrinks_with_traffic(spark):
    small = behavior.ab_power_mde(_ab_events(spark, 400, 10)).collect()[0]
    big = behavior.ab_power_mde(_ab_events(spark, 4000, 10)).collect()[0]
    assert big["mde_abs_r6"] < small["mde_abs_r6"]


def test_ab_power_zero_conversions(spark):
    out = behavior.ab_power_mde(_ab_events(spark, 100, 0)).collect()[0]
    assert out["n_conv_total"] == 0
    assert out["mde_rel_r6"] is None
    assert out["n_per_arm_10pct"] is None
    assert out["powered_for_10pct"] == 0


# ---------------------------------------------------------------------------
# script_mismatch_audit
# ---------------------------------------------------------------------------


def test_script_exact_class_counts(spark):
    # "ab1 好" -> 5 chars: latin 2, digit 1, space 1, cjk 1
    out = text.script_mismatch_audit(
        _docs_text(spark, [(1, "ab1 好", "en")])
    ).collect()[0]
    assert out["n_chars"] == 5
    assert out["latin_bp"] == 4000
    assert out["digit_bp"] == 2000
    assert out["space_bp"] == 2000
    assert out["cjk_bp"] == 2000
    assert out["cyr_bp"] == 0
    # latin-dominant (2 >= 1), expected latin for 'en' -> no mismatch
    assert out["n_mismatched"] == 0


def test_script_mislabeled_docs_flagged(spark):
    rows = [
        (1, "你好世界你好", "zh"),      # CJK-dominant, expected cjk: ok
        (2, "plain ascii text", "zh"),  # latin-dominant under zh: flag
        (3, "привет мир", "en"),        # cyr-dominant under en: flag
        (4, "привет мир", "ru"),        # cyr under ru: ok
    ]
    out = {
        r["lang"]: r
        for r in text.script_mismatch_audit(_docs_text(spark, rows)).collect()
    }
    assert out["zh"]["n_docs"] == 2 and out["zh"]["n_mismatched"] == 1
    assert out["en"]["n_mismatched"] == 1
    assert out["ru"]["n_mismatched"] == 0


def test_script_empty_text_not_flagged(spark):
    # dominant 'none' (no letters at all) is unclassifiable, not a
    # mismatch
    out = text.script_mismatch_audit(
        _docs_text(spark, [(1, "12345", "zh")])
    ).collect()[0]
    assert out["n_mismatched"] == 0
    assert out["digit_bp"] == 10000
