"""Cohort retention and ordered-funnel semantics on constructed cases."""

from __future__ import annotations

import datetime as dt

from training_etl_demo_2_spark.operators import behavior

TS = dt.datetime.fromisoformat


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, TS(t), u, e, 1.0, "{}") for i, (u, e, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_stage_order(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", "2024-01-01T10:00"),
            (1, "click", "2024-01-01T11:00"),
            (1, "purchase", "2024-01-01T12:00"),
            # user 2: click BEFORE first view, nothing after -> stops at view
            (2, "click", "2024-01-01T09:00"),
            (2, "view", "2024-01-01T10:00"),
            # user 3: view+purchase but no click -> stops at view
            (3, "view", "2024-01-01T10:00"),
            (3, "purchase", "2024-01-01T11:00"),
        ],
    )
    out = {r.stage: r.n_users for r in behavior.event_funnel(ev).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_counts_reuse_of_later_event(spark):
    # click precedes view, but a SECOND click after the view rescues stage 2
    ev = _events(
        spark,
        [
            (1, "click", "2024-01-01T09:00"),
            (1, "view", "2024-01-01T10:00"),
            (1, "click", "2024-01-01T11:00"),
        ],
    )
    out = {r.stage: r.n_users for r in behavior.event_funnel(ev).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_cohort_retention_offsets(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01T10:00"),
            (1, "view", "2024-01-03T10:00"),   # offset 2
            (2, "view", "2024-01-01T12:00"),   # same cohort day
            (3, "view", "2024-01-02T12:00"),   # its own cohort
            (1, "view", "2024-03-01T10:00"),   # beyond horizon: dropped
        ],
    )
    out = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in behavior.cohort_retention(ev, horizon_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_session_event_paths_respects_boundaries(spark):
    """Paths never span a session gap; counts reflect order."""
    import datetime as dt

    from training_etl_demo_2_spark.operators.behavior import (
        session_event_paths,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: a->b->c twice in one session, then a gap, then a->b->c again
    ts = base
    eid = 0
    for seq in range(2):
        for et in "abc":
            rows.append((eid, ts, 1, et, 1.0, "{}")); eid += 1
            ts += dt.timedelta(minutes=1)
    ts += dt.timedelta(hours=2)  # session break
    for et in "abc":
        rows.append((eid, ts, 1, et, 1.0, "{}")); eid += 1
        ts += dt.timedelta(minutes=1)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.path: r.cnt for r in session_event_paths({"events": df}).collect()}
    # session 1 types: a b c a b c -> 'a b c' twice... plus session 2 once
    assert out["a b c"] == 3
    # the gap kills the cross-boundary path 'b c a' would otherwise gain
    assert out.get("c a b", 0) == 1  # only inside session 1


def test_event_type_pmi_planted(spark):
    """Types planted to always co-occur get positive PMI = ln(N/ (n_a n_b / n_ab...));
    with 2 sessions where (a,b) share both and c appears alone in one:
    pmi(a,b) = ln(2*2/(2*2)) = 0 when always together across all sessions;
    a type pair that never co-occurs is absent from the output."""
    import datetime as dt

    from training_etl_demo_2_spark.operators.behavior import event_type_pmi

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    # user 1: one session containing a and b; user 2: same
    for uid in (1, 2):
        for ty in ("a", "b"):
            rows.append((eid, t0, uid, ty, 1.0))
            eid += 1
    # user 3: a session containing only c and a
    rows.append((eid, t0, 3, "c", 1.0)); eid += 1
    rows.append((eid, t0, 3, "a", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {(r.type_a, r.type_b): r for r in event_type_pmi({"events": df}).collect()}
    # N=3 sessions; n_a=3, n_b=2, n_c=1; n_ab=2, n_ac=1; (b,c) never co-occur
    import math

    assert set(out) == {("a", "b"), ("a", "c")}
    ab = out[("a", "b")]
    assert ab.n_ab == 2 and abs(ab.pmi - round(math.log(2 * 3 / (3 * 2)), 6)) < 1e-9
    ac = out[("a", "c")]
    assert ac.n_ab == 1 and abs(ac.pmi - round(math.log(1 * 3 / (3 * 1)), 6)) < 1e-9


def test_funnel_latency_in_order_and_values(spark):
    """Latency uses the FIRST in-order stage times: u1 converts
    view@0s -> click@10s -> purchase@70s (click before the view does
    not count); u2 clicks but never purchases after."""
    ev = _events(
        spark,
        [
            (1, "click", "2026-01-01 00:00:30"),  # pre-view click: ignored? no —
            (1, "view", "2026-01-01 00:01:00"),
            (1, "click", "2026-01-01 00:01:10"),
            (1, "purchase", "2026-01-01 00:02:20"),
            (2, "view", "2026-01-01 00:00:00"),
            (2, "click", "2026-01-01 00:00:05"),
        ],
    )
    rows = {r.to_stage: r for r in behavior.funnel_latency(ev).collect()}
    # view->click: u1 10s (first click AFTER first view), u2 5s
    assert rows["click"].n_users == 2
    assert rows["click"].p50_s == 7.5
    assert rows["click"].mean_s == 7.5
    # click->purchase: only u1, 70s from its in-order click at 00:01:10
    assert rows["purchase"].n_users == 1
    assert rows["purchase"].p50_s == 70.0
    assert rows["purchase"].from_stage == "click"


def test_kaplan_meier_censoring_and_product(spark):
    """3 users: A churned at 2 days, B churned at 5, C censored (active
    at the edge). KM: S(2) = 1 - 1/3; S(5) = (2/3)·(1 - 1/2) = 1/3 —
    the censored user leaves the risk set without an event."""
    ev = _events(
        spark,
        [
            (1, "view", "2026-01-01 00:00:00"),
            (1, "view", "2026-01-03 00:00:00"),   # A: 2-day lifetime, old
            (2, "view", "2026-01-01 00:00:00"),
            (2, "view", "2026-01-06 00:00:00"),   # B: 5-day lifetime, old
            (3, "view", "2026-01-10 00:00:00"),
            (3, "view", "2026-01-20 00:00:00"),   # C: at the edge -> censored
        ],
    )
    rows = {r.duration_days: r for r in behavior.kaplan_meier_churn(ev).collect()}
    assert set(rows) == {2, 5}
    assert rows[2].n_risk == 3 and rows[2].n_events == 1
    assert abs(rows[2].surv - (2 / 3)) < 1e-6
    # duration 10 (C) is censored-only: present in the risk set at t=5
    # (10 >= 5), so n_risk(5) counts B and C
    assert rows[5].n_risk == 2 and rows[5].n_events == 1
    assert abs(rows[5].surv - (1 / 3)) < 1e-6


def test_decayed_engagement_recency_weighting(spark):
    """Same total raw value: the recent user outscores the stale one;
    an event AT the edge contributes its full value."""
    ev = _events(
        spark,
        [
            (1, "view", "2026-01-31 00:00:00"),   # at the edge: weight 1
            (2, "view", "2026-01-01 00:00:00"),   # 30 days old: ~e^-30/7
            (3, "view", "2026-01-31 00:00:00"),
        ],
    )
    out = {r.user_id: r for r in behavior.decayed_engagement(ev).collect()}
    assert out[1].score == 1.0
    assert 0 < out[2].score < 0.02       # e^(-30/7) ≈ 0.0137
    assert out[1].score > out[2].score


def test_linear_attribution_splits_credit(spark):
    """Purchase with 2 prior clicks in the hour: each click gets 0.5;
    a click outside the window and a click AT the purchase instant get
    nothing."""
    ev = _events(
        spark,
        [
            (1, "click", "2026-01-01 10:10:00"),   # in window
            (1, "click", "2026-01-01 10:50:00"),   # in window
            (1, "click", "2026-01-01 09:00:00"),   # > 1h before: out
            (1, "click", "2026-01-01 11:00:00"),   # at purchase ts: out
            (1, "purchase", "2026-01-01 11:00:00"),
            (2, "click", "2026-01-01 10:30:00"),   # other user: out
        ],
    )
    rows = {r.click_hour: r for r in behavior.linear_attribution(ev).collect()}
    assert set(rows) == {"2026-01-01 10:00"}
    r = rows["2026-01-01 10:00"]
    assert r.n_credit_events == 2
    assert r.credit == 1.0


def test_linear_attribution_overlapping_windows(spark):
    """One click inside TWO purchases' windows yields two credit
    events: 1.0 (sole click of p1) + 0.5 (one of two clicks of p2)."""
    ev = _events(
        spark,
        [
            (1, "click", "2026-01-01 10:30:00"),   # in both windows
            (1, "purchase", "2026-01-01 10:45:00"),
            (1, "click", "2026-01-01 11:10:00"),   # only in p2's window
            (1, "purchase", "2026-01-01 11:15:00"),
        ],
    )
    rows = {r.click_hour: r for r in behavior.linear_attribution(ev).collect()}
    assert rows["2026-01-01 10:00"].n_credit_events == 2
    assert rows["2026-01-01 10:00"].credit == 1.5
    assert rows["2026-01-01 11:00"].n_credit_events == 1
    assert rows["2026-01-01 11:00"].credit == 0.5


def test_markov_attribution_removal_effect(spark):
    """Planted chain: 2 users convert via view, 1 user clicks and
    never converts. Removing 'view' kills ALL conversion paths
    (RE=1); removing 'click' kills none (RE=0) — a channel that only
    appears on doomed journeys earns zero credit even though it
    touches a third of the users."""
    ev = _events(
        spark,
        [
            (1, "view", "2026-01-01 10:00:00"),
            (1, "purchase", "2026-01-01 11:00:00"),
            (2, "click", "2026-01-01 10:00:00"),
            (3, "view", "2026-01-01 10:00:00"),
            (3, "purchase", "2026-01-01 11:00:00"),
        ],
    )
    rows = {r.channel: r for r in behavior.markov_attribution(ev).collect()}
    assert set(rows) == {"view", "click"}
    assert rows["view"].re_r6 == 1.0
    assert rows["click"].re_r6 == 0.0
    # 2 conversions, all credit to view
    assert rows["view"].attributed_r4 == 2.0
    assert rows["click"].attributed_r4 == 0.0


def test_markov_attribution_truncates_at_first_purchase(spark):
    """Touches after the first purchase are not part of the journey:
    the post-purchase 'error' event must not become a channel."""
    ev = _events(
        spark,
        [
            (1, "view", "2026-01-01 10:00:00"),
            (1, "purchase", "2026-01-01 11:00:00"),
            (1, "error", "2026-01-01 12:00:00"),
        ],
    )
    rows = {r.channel for r in behavior.markov_attribution(ev).collect()}
    assert rows == {"view"}


def test_nelson_aalen_hand_computed(spark):
    """3 users churn at duration 0 (single-day lifetimes, long before
    the edge), 1 user survives at the edge (censored): H(0) = 3/4,
    se = sqrt(3/16), surv = exp(-0.75); KM comparability: same
    duration relation."""
    import datetime

    from training_etl_demo_2_spark.operators import behavior

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # users 1-3: one event each on day 0 (churned: edge is day 30)
    for u in (1, 2, 3):
        rows.append((u, base))
    # user 4: active from day 0 to day 30 (the edge -> censored)
    rows.append((4, base))
    rows.append((4, base + datetime.timedelta(days=30)))
    ev = spark.createDataFrame(
        [(i, ts, u, "e", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = behavior.nelson_aalen_churn(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["duration_days"] == 0
    assert r["n_risk"] == 4 and r["n_events"] == 3
    assert abs(r["cum_hazard_r6"] - 0.75) < 1e-6
    assert abs(r["se_r6"] - (3 / 16) ** 0.5) < 1e-6
    import math

    assert abs(r["surv_fh_r6"] - math.exp(-0.75)) < 1e-6


def test_nelson_aalen_monotone_hazard(spark, tables):
    from training_etl_demo_2_spark.operators import behavior

    out = behavior.nelson_aalen_churn(tables["events"]).collect()
    hz = [r["cum_hazard_r6"] for r in out]
    assert hz == sorted(hz)  # cumulative hazard never decreases
    assert all(r["n_events"] > 0 for r in out)


def test_ipw_removes_planted_activity_confounding(spark):
    """Construction with ZERO true effect but heavy confounding:
    high-activity units (always purchase) are 80% treated, low-activity
    units (never purchase) 20% treated. Naive uplift reads 0.6; the
    exact IPW arms both reweight to 0.5 vs 0.5, so the adjusted uplift
    must sit near 0 (propensity fit is 3 Newton steps, not exact)."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators import behavior

    rows = []
    uid = 0
    day = datetime(2024, 1, 1)

    def unit(treated: bool, high: bool):
        nonlocal uid
        uid += 1
        evs = []
        if treated:
            evs.append("click")
        if high:
            evs.append("purchase")
            evs += ["view"] * (6 - len(evs) - 1) + ["view"]
        else:
            evs += ["view"] * (2 - len(evs))
        for e in evs:
            rows.append((uid, day, e))

    for _ in range(80):
        unit(True, True)
    for _ in range(20):
        unit(False, True)
    for _ in range(20):
        unit(True, False)
    for _ in range(80):
        unit(False, False)
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = behavior.ipw_click_uplift({"events": ev}).collect()[0]
    assert out.n_units == 200 and out.n_treat == 100
    assert out.naive_uplift_r6 > 0.4, out
    assert abs(out.ipw_uplift_r6) < 0.15, out
    assert abs(out.ipw_uplift_r6) < abs(out.naive_uplift_r6) / 3


def test_shapley_efficiency_and_null_player(spark):
    """On a corpus observing the relevant coalitions: (a) efficiency —
    channel credits sum to v(grand) − v(∅) when the full lattice is
    observed (construct all 16 coalitions); (b) null player — a channel
    whose presence never changes conversion gets ~0 credit."""
    from datetime import datetime

    from training_etl_demo_2_spark.operators import behavior

    rows = []
    uid = 0
    day = datetime(2024, 2, 1)
    # all 16 coalitions, 2 users each; conversion iff 'click' in set
    for s in range(16):
        for _ in range(2):
            uid += 1
            touched = [
                ch
                for i, ch in enumerate(behavior.SHAPLEY_CHANNELS)
                if s & (1 << i)
            ]
            for chn in touched or []:
                rows.append((uid, day, chn))
            if not touched:
                rows.append((uid, day, "other"))  # keeps the user visible
            if "click" in touched:
                rows.append((uid, day, "purchase"))
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    out = {
        r.channel: r.shapley_r6
        for r in behavior.shapley_attribution({"events": ev}).collect()
    }
    assert set(out) == set(behavior.SHAPLEY_CHANNELS)
    # v(grand)=1 (click present), v(empty)=0 -> credits sum to 1
    assert abs(sum(out.values()) - 1.0) < 1e-5, out
    # click is the only driver; the rest are null players
    assert abs(out["click"] - 1.0) < 1e-5
    for ch in ("view", "signup", "error"):
        assert abs(out[ch]) < 1e-5
