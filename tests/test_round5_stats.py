"""Planted-case tests for the round-5 statistics / segmentation /
audit operators (ACF, forecast eval, Theil-Sen, Welch, MI, t-closeness,
jackknife, DP counts, Spearman, RFM, k-fold, embedding QA, encoding
advisor)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import (
    behavior,
    curation,
    maintenance,
    similarity,
    temporal,
    validation,
)

TS = dt.datetime.fromisoformat


def _events_hourly(spark, counts, start="2026-01-01T00:00:00"):
    """One 'view' row per unit of count at each consecutive hour."""
    t0 = TS(start)
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h), eid % 7, "view", 1.0, "{}")
            )
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_acf_alternating_series(spark):
    """x = 2,0,2,0,2,0,2 (n=7 — the calendar ends at the last OBSERVED
    hour): c = 7x−8 = [6,−8,…], den = 336, lag1 = −288/336, lag2 =
    236/336 exactly."""
    ev = _events_hourly(spark, [2, 0, 2, 0, 2, 0, 2])
    out = {r.lag: r for r in temporal.acf_hourly({"events": ev}).collect()}
    assert out[1].acf_r6 == pytest.approx(-288 / 336, abs=1e-6)
    assert out[1].n_pairs == 6
    assert out[2].acf_r6 == pytest.approx(236 / 336, abs=1e-6)


def test_acf_counts_gaps_as_zero(spark):
    """An absent hour enters the series as 0 (gap-filled), shifting
    the mean — the series 2,(gap),2 has c = [4,−8,4]."""
    t0 = TS("2026-01-01T00:00:00")
    rows = [
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0, 2, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=2), 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 2, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.lag: r for r in temporal.acf_hourly({"events": ev}).collect()}
    # c = [4,-8,4]; den = 96; lag1: 4*-8 + -8*4 = -64 -> -2/3
    assert out[1].acf_r6 == pytest.approx(-0.666667)
    assert out[2].acf_r6 == pytest.approx(0.166667)  # 4*4/96


def test_seasonal_forecast_eval_periodic_series(spark):
    """A weekly-periodic series with ONE train-window anomaly: test
    error is exactly 0 (MASE=0, sMAPE=0) while the train MAE is
    positive (so MASE is defined)."""
    season = temporal.FCEVAL_SEASON
    n = 3 * season  # 504 hours
    counts = [1 + (h % season < 10) for h in range(n)]
    # anomaly in the FIRST season: scored in train (as the lag source
    # of hour 168+5) but never feeds a test-window prediction
    counts[5] += 3
    ev = _events_hourly(spark, counts)
    out = temporal.seasonal_forecast_eval({"events": ev}).collect()
    assert len(out) == 1
    r = out[0]
    assert r.event_type == "view"
    assert r.n_test == season
    # anomaly perturbs exactly 2 train terms (as target and as lag)
    assert r.mae_test_r6 > 0 or r.mae_test_r6 == 0.0
    assert r.mase_r6 is not None
    # the last 168 hours repeat the previous season exactly
    assert r.mae_test_r6 == 0.0
    assert r.mase_r6 == 0.0
    assert r.smape_r6 == 0.0


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_theil_sen_robust_to_outlier(spark):
    """Revenue exactly linear at 5 cents/day except one blowout day:
    the Theil-Sen median slope stays 5.0; OLS does not."""
    rows = []
    for i in range(11):
        price = 1.00 + 0.05 * i
        if i == 10:
            price += 1000.0  # endpoint outlier (asymmetric leverage)
        rows.append(
            (i, 1, "O", price, TS(f"2026-01-{i + 1:02d}T00:00:00"), "1-URGENT")
        )
    out = temporal.theil_sen_trend({"orders": _orders(spark, rows)}).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 11
    assert r.n_pairs == 55
    assert r.theil_sen_cents_per_day_r4 == 5.0
    assert r.ols_cents_per_day_r4 != 5.0


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


def test_welch_separated_sources(spark):
    """Source b sits 20 chars above source a with tiny variance: t is
    large-negative (a-b), significant, one row per unordered pair."""
    rows = []
    for i, x in enumerate([10, 12, 14, 16, 18]):
        rows.append((i, "t", "en", "a", x))
    for i, x in enumerate([30, 32, 34, 36, 38]):
        rows.append((10 + i, "t", "en", "b", x))
    out = validation.welch_ttest_sources({"documents": _docs(spark, rows)})
    rs = out.collect()
    assert len(rs) == 1
    r = rs[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.mean_diff_r6 == -20.0
    assert r.t_r6 < -5
    assert r.significant == 1


def test_mutual_info_extremes(spark):
    """lang == source → NMI = 1 and Cramér's V = 1; a fully
    independent grid → all three are 0."""
    dep = [(i, "t", f"s{i % 3}", f"s{i % 3}", 10) for i in range(9)]
    r = validation.mutual_info_lang_source(
        {"documents": _docs(spark, dep)}
    ).collect()[0]
    assert r.nmi_r6 == pytest.approx(1.0)
    assert r.cramers_v_r6 == pytest.approx(1.0)
    ind = [
        (4 * a + b, "t", f"l{a}", f"s{b}", 10)
        for a in range(2)
        for b in range(2)
    ]
    r2 = validation.mutual_info_lang_source(
        {"documents": _docs(spark, ind)}
    ).collect()[0]
    assert r2.mi_nats_r6 == 0.0
    assert r2.cramers_v_r6 == 0.0


def _cust(spark, rows):
    return spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )


def test_t_closeness_concentrated_group(spark):
    """Global bands are 50/50; the (1, 'A') group is all band-0 →
    TVD = 0.5 > 0.3 (violated); the (2, 'A') group mirrors it."""
    rows = [(i, f"c{i}", 1, 500.0, "A") for i in range(4)]
    rows += [(10 + i, f"d{i}", 2, 1500.0, "A") for i in range(4)]
    out = validation.t_closeness_audit({"customer": _cust(spark, rows)})
    rs = {(r.c_nationkey, r.c_mktsegment): r for r in out.collect()}
    assert rs[(1, "A")].tvd_r6 == 0.5
    assert rs[(1, "A")].t_violated == 1
    assert rs[(2, "A")].tvd_r6 == 0.5


def test_t_closeness_representative_group_passes(spark):
    """A group whose band distribution equals the global one has
    TVD = 0."""
    rows = []
    k = 0
    for nation in (1, 2):
        for bal in (500.0, 1500.0):
            rows.append((k, f"c{k}", nation, bal, "A"))
            k += 1
    out = validation.t_closeness_audit({"customer": _cust(spark, rows)})
    for r in out.collect():
        assert r.tvd_r6 == 0.0
        assert r.t_violated == 0


def test_jackknife_identical_sources(spark):
    """Sources with identical means → every leave-one-out mean equals
    the global mean → SE exactly 0."""
    rows = [(0, "t", "en", "a", 10), (1, "t", "en", "a", 20),
            (2, "t", "en", "b", 10), (3, "t", "en", "b", 20)]
    r = validation.jackknife_source_mean(
        {"documents": _docs(spark, rows)}
    ).collect()[0]
    assert r.mean_r6 == 15.0
    assert r.se_jack_r6 == 0.0
    assert r.n_sources == 2


def test_dp_noisy_counts_bounded_and_deterministic(spark):
    docs = _docs(
        spark,
        [(i, "t", f"l{i % 2}", f"s{i % 3}", 10) for i in range(60)],
    )
    true = {
        (r.lang, r.source): r.c
        for r in docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    out1 = {
        (r.lang, r.source): r.n_dp
        for r in validation.dp_noisy_counts({"documents": docs}).collect()
    }
    out2 = {
        (r.lang, r.source): r.n_dp
        for r in validation.dp_noisy_counts({"documents": docs}).collect()
    }
    assert out1 == out2  # seeded determinism
    assert set(out1) == set(true)
    for key, n_dp in out1.items():
        assert n_dp >= 0
        assert abs(n_dp - true[key]) <= validation.DP_K
    # the mechanism must actually perturb SOMETHING at these seeds
    assert any(out1[k] != true[k] for k in true)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


def test_spearman_monotone_nonlinear(spark):
    """price = qty³ is nonlinear but perfectly monotone → Spearman
    ρ = 1 exactly; constant discount → undefined (NULL) pairs."""
    rows = [
        (i, 1, 1, 1, float(i + 1), (i + 1) ** 3 / 100.0, 0.05, 0.0,
         "N", "O", TS("2026-01-01T00:00:00"))
        for i in range(10)
    ]
    r = validation.spearman_lineitem(
        {"lineitem": _lineitem(spark, rows)}
    ).collect()[0]
    assert r.rho_qty_price_c == 1.0
    assert r.rho_qty_disc_pct is None
    assert r.rho_price_c_disc_pct is None


def test_spearman_ties_midrank(spark):
    """All-tied quantity against distinct price: zero variance in the
    midranks → NULL, not a crash."""
    rows = [
        (i, 1, 1, 1, 5.0, (i + 1) * 1.0, 0.01 * i, 0.0, "N", "O",
         TS("2026-01-01T00:00:00"))
        for i in range(4)
    ]
    r = validation.spearman_lineitem(
        {"lineitem": _lineitem(spark, rows)}
    ).collect()[0]
    assert r.rho_qty_price_c is None
    assert r.rho_price_c_disc_pct == 1.0


def test_rfm_distinct_quintiles(spark):
    """5 customers, one order each, distinct recency/monetary: the
    diagonal (r, f, m) cells with custkey breaking frequency ties."""
    rows = [
        (i, i, "O", 100.0 * i + 100.0,
         TS(f"2026-01-{i + 1:02d}T00:00:00"), "1-URGENT")
        for i in range(1, 6)
    ]
    out = behavior.rfm_segments({"orders": _orders(spark, rows)}).collect()
    cells = {(r.r_q, r.f_q, r.m_q): r for r in out}
    # custkey 5 ordered last (recency 0) and highest monetary
    assert set(cells) == {(4, 0, 0), (3, 1, 1), (2, 2, 2), (1, 3, 3),
                          (0, 4, 4)}
    for r in out:
        assert r.n_customers == 1
    assert cells[(0, 4, 4)].avg_monetary_r2 == 600.0


def test_stratified_kfold_exact_balance(spark):
    """10 docs in each of 2 strata, k=5 → every (fold, lang) cell has
    exactly 2 docs."""
    rows = [(i, "t", "en", "a", 10) for i in range(10)]
    rows += [(100 + i, "t", "de", "a", 10) for i in range(10)]
    out = curation.stratified_kfold({"documents": _docs(spark, rows)})
    rs = out.collect()
    assert len(rs) == 10
    assert all(r.n_docs == 2 for r in rs)
    assert {(r.fold, r.lang) for r in rs} == {
        (f, l) for f in range(5) for l in ("en", "de")
    }


def test_embedding_norm_audit_planted(spark):
    emb = spark.createDataFrame(
        [
            (1, [3.0, 4.0], 0),
            (2, [0.0, 0.0], 0),
            (3, [1.0, 0.0, 0.0], 1),  # odd dimension
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        r.label: r
        for r in similarity.embedding_norm_audit(
            {"embeddings": emb}
        ).collect()
    }
    assert out[0].n_vecs == 2
    assert out[0].n_zero == 1
    assert out[0].max_norm_r6 == pytest.approx(5.0, abs=1e-4)
    assert out[0].n_dims_seen == 1
    assert out[1].n_dims_seen == 1
    assert out[1].n_zero == 0


def test_dictionary_encode_audit_flags(spark):
    li = _lineitem(
        spark,
        [
            (i, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, ["N", "R", "A"][i % 3], "O",
             TS("2026-01-01T00:00:00"))
            for i in range(100)
        ],
    )
    orders = _orders(
        spark, [(i, 1, "O", 1.0, TS("2026-01-01T00:00:00"), "1-URGENT")
                for i in range(100)]
    )
    cust = _cust(
        spark,
        [(i, f"Customer#{i:09d}", 1, 0.0, "BUILDING") for i in range(100)],
    )
    out = maintenance.dictionary_encode_audit(
        {"lineitem": li, "orders": orders, "customer": cust}
    )
    rs = {(r.table_name, r.column_name): r for r in out.collect()}
    assert rs[("lineitem", "l_returnflag")].n_distinct == 3
    assert rs[("lineitem", "l_returnflag")].dict_recommended == 1
    assert rs[("customer", "c_name")].n_distinct == 100
    assert rs[("customer", "c_name")].dict_recommended == 0
    assert rs[("customer", "c_mktsegment")].dict_recommended == 1


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, TS(t), u, e, 1.0, "{}") for i, (u, e, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _nation(spark):
    return spark.createDataFrame(
        [(1, "ALPHA", 0), (2, "BETA", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def test_wilson_conversion_ci_planted(spark):
    """Nation ALPHA: 2 active users, 1 converts — p̂=0.5 with the
    hand-computed Wilson bounds; BETA has activity but no purchase."""
    cust = _cust(
        spark,
        [(1, "a", 1, 0.0, "B"), (2, "b", 1, 0.0, "B"), (3, "c", 2, 0.0, "B")],
    )
    ev = _events(
        spark,
        [
            (1, "view", "2026-01-01 10:00:00"),
            (1, "purchase", "2026-01-01 11:00:00"),
            (2, "view", "2026-01-01 10:00:00"),
            (3, "view", "2026-01-01 10:00:00"),
        ],
    )
    out = {
        r.nation: r
        for r in behavior.wilson_conversion_ci(
            {"events": ev, "customer": cust, "nation": _nation(spark)}
        ).collect()
    }
    z = behavior.WILSON_Z
    n, p = 2.0, 0.5
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * ((p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5) / denom
    r = out["ALPHA"]
    assert r.n_users == 2 and r.n_conv == 1
    assert r.p_hat_r6 == 0.5
    assert r.wilson_lo_r6 == pytest.approx(center - half, abs=1e-6)
    assert r.wilson_hi_r6 == pytest.approx(center + half, abs=1e-6)
    assert out["BETA"].n_conv == 0
    assert out["BETA"].wilson_lo_r6 == 0.0  # Wilson lower bound at p̂=0


def test_ols_trend_by_nation_linear(spark):
    """One nation with perfectly linear daily revenue: slope exactly
    5 cents/day, r² = 1."""
    cust = _cust(spark, [(1, "a", 1, 0.0, "B")])
    rows = [
        (i, 1, "O", 1.00 + 0.05 * i, TS(f"2026-01-{i + 1:02d}T00:00:00"),
         "1-URGENT")
        for i in range(10)
    ]
    out = validation.ols_trend_by_nation(
        {"orders": _orders(spark, rows), "customer": cust,
         "nation": _nation(spark)}
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.nation == "ALPHA"
    assert r.slope_cents_per_day_r4 == 5.0
    assert r.r2_r6 == 1.0


def test_dup_factor_by_source_normalized(spark):
    """'Hello  World' and 'hello world' share a fingerprint: source a
    has 4 docs / 2 distinct → factor 2.0, share 0.5."""
    from training_etl_demo_2_spark.operators import dedup as dd

    rows = [
        (1, "Hello  World", "en", "a", 11),
        (2, "hello world", "en", "a", 11),
        (3, "other text", "en", "a", 10),
        (4, "other  TEXT", "en", "a", 10),
        (5, "unique", "en", "b", 6),
    ]
    out = {
        r.source: r
        for r in dd.dup_factor_by_source(
            {"documents": _docs(spark, rows)}
        ).collect()
    }
    assert out["a"].n_docs == 4 and out["a"].n_distinct == 2
    assert out["a"].dup_factor_r4 == 2.0
    assert out["a"].dup_share_r6 == 0.5
    assert out["b"].dup_factor_r4 == 1.0
    assert out["b"].dup_share_r6 == 0.0


def test_broadcast_plan_advisor_model(spark, tables):
    """Fixture dims are all broadcastable at sf0.001; the byte model
    is exact: nation = rows·(16+16) + Σ length(n_name)."""
    out = {
        r.table_name: r
        for r in maintenance.broadcast_plan_advisor(tables).collect()
    }
    nat = tables["nation"]
    n_rows = nat.count()
    str_bytes = nat.agg(F.sum(F.length("n_name"))).collect()[0][0]
    assert out["nation"].n_rows == n_rows
    assert out["nation"].est_bytes == n_rows * 32 + str_bytes
    assert out["nation"].broadcastable == 1
    assert out["region"].broadcastable == 1
    assert set(out) == {t for t, _, _ in maintenance.BROADCAST_TABLES}


def test_seasonal_residual_anomalies_spike(spark):
    """5 days of a 3-level hour-of-day pattern (per-hour residuals
    are mostly ±1, so the global MAD is 1) and ONE +30 spike: exactly
    that hour is flagged."""
    counts = []
    for d in range(5):
        for h in range(24):
            c = 3 + ((d + h) % 3)
            if d == 2 and h == 10:
                c += 30
            counts.append(c)
    ev = _events_hourly(spark, counts)
    out = temporal.seasonal_residual_anomalies({"events": ev}).collect()
    assert [r.hour for r in out] == ["2026-01-03 10:00:00"]
    assert out[0].n_events >= 33
