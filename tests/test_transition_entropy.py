"""Planted tests for conditional transition entropy."""

from __future__ import annotations

import datetime

from training_etl_demo_2_spark.operators import behavior


def _events(spark, rows):
    # rows: (event_id, user_id, event_type, minute)
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    return spark.createDataFrame(
        [
            (e, base + datetime.timedelta(minutes=m), u, et, 1.0, "{}")
            for (e, u, et, m) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_deterministic_chain_zero_entropy(spark):
    # a -> b -> a -> b ... : every state has exactly one successor
    rows = []
    for i in range(8):
        rows.append((i, 1, "a" if i % 2 == 0 else "b", i))
    out = {
        r["from_type"]: r
        for r in behavior.transition_entropy(_events(spark, rows)).collect()
    }
    assert out["a"]["entropy_bits_r6"] == 0.0
    assert out["a"]["entropy_norm_r6"] == 0.0
    assert out["b"]["entropy_bits_r6"] == 0.0
    assert out["__overall__"]["entropy_bits_r6"] == 0.0
    assert out["a"]["n_dest"] == 1


def test_uniform_branching_one_bit(spark):
    # from 'a' go to 'b' and 'c' equally often -> H(a) = 1 bit, norm 1
    rows = []
    eid = 0
    for u in range(4):
        dest = "b" if u % 2 == 0 else "c"
        rows.append((eid, u, "a", 0)); eid += 1
        rows.append((eid, u, dest, 1)); eid += 1
    out = {
        r["from_type"]: r
        for r in behavior.transition_entropy(_events(spark, rows)).collect()
    }
    assert abs(out["a"]["entropy_bits_r6"] - 1.0) < 1e-6
    assert abs(out["a"]["entropy_norm_r6"] - 1.0) < 1e-6
    assert out["a"]["n_out"] == 4 and out["a"]["n_dest"] == 2
    # only 'a' has outgoing transitions -> overall == H(a)
    assert abs(out["__overall__"]["entropy_bits_r6"] - 1.0) < 1e-6


def test_overall_is_weighted_mix(spark):
    # 'a' (4 transitions, 1 bit) + 'b' (4 transitions, 0 bits)
    # -> H(next|current) = 0.5 bits
    rows = []
    eid = 0
    for u in range(4):
        dest = "b" if u % 2 == 0 else "c"
        rows.append((eid, u, "a", 0)); eid += 1
        rows.append((eid, u, dest, 1)); eid += 1
    for u in range(10, 14):
        rows.append((eid, u, "b", 0)); eid += 1
        rows.append((eid, u, "d", 1)); eid += 1
    out = {
        r["from_type"]: r
        for r in behavior.transition_entropy(_events(spark, rows)).collect()
    }
    assert abs(out["__overall__"]["entropy_bits_r6"] - 0.5) < 1e-6
    assert out["__overall__"]["n_out"] == 8


def test_overdispersion_poissonish_vs_bursty(spark):
    from training_etl_demo_2_spark.operators import validation

    # near-equal counts per user -> dispersion ~ 0 (underdispersed)
    even = [(i, i % 50, "e", i % 7) for i in range(500)]
    out_even = validation.event_overdispersion(
        {"events": _events(spark, even)}
    ).collect()[0]
    assert out_even["dispersion_r6"] < 1.0
    assert out_even["overdispersed"] == 0
    # whales: user 0 fires 300 of 400 events -> massive dispersion
    bursty = [(i, 0 if i < 300 else i, "e", i % 7) for i in range(400)]
    out_b = validation.event_overdispersion(
        {"events": _events(spark, bursty)}
    ).collect()[0]
    assert out_b["dispersion_r6"] > 10.0
    assert out_b["overdispersed"] == 1
    assert out_b["n_events"] == 400


def test_dau_mau_stickiness_hand_computed(spark):
    from training_etl_demo_2_spark.operators import relational_ext

    # day 1: users {1,2}; day 15: users {2,3,4} (inside day-1's 28d
    # window). DAU(d1)=2, MAU(d1)=2 (only day-1 users so far) -> 10000
    # DAU(d15)=3, MAU(d15)=|{1,2,3,4}|=4 -> 7500
    rows = [
        (1, 1, "e", 0), (2, 2, "e", 1),
    ]
    rows15 = [(3, 2, "e", 0), (4, 3, "e", 1), (5, 4, "e", 2)]
    import datetime

    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    data = [
        (e, base + datetime.timedelta(minutes=m), u, et, 1.0, "{}")
        for (e, u, et, m) in rows
    ] + [
        (e, base + datetime.timedelta(days=14, minutes=m), u, et, 1.0, "{}")
        for (e, u, et, m) in rows15
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r["day"]: r
        for r in relational_ext.dau_mau_stickiness(
            {"events": ev}
        ).collect()
    }
    assert set(out) == {"2024-01-01", "2024-01-15"}
    assert out["2024-01-01"]["dau"] == 2
    assert out["2024-01-01"]["mau"] == 2
    assert out["2024-01-01"]["stickiness_bp"] == 10000
    assert out["2024-01-15"]["dau"] == 3
    assert out["2024-01-15"]["mau"] == 4
    assert out["2024-01-15"]["stickiness_bp"] == 7500


def test_dau_mau_window_expires(spark):
    from training_etl_demo_2_spark.operators import relational_ext

    import datetime

    base = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # second burst 40 days later: the first cohort is OUTSIDE the 28d
    # window -> MAU = DAU on both days
    data = [
        (1, base, 1, "e", 1.0, "{}"),
        (2, base + datetime.timedelta(days=40), 2, "e", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = relational_ext.dau_mau_stickiness({"events": ev}).collect()
    assert all(r["stickiness_bp"] == 10000 for r in out)


def test_dose_response_buckets_and_wilson(spark):
    import math

    from training_etl_demo_2_spark.operators import behavior

    # 10 users with 1 click (2 convert), 5 users with 20 clicks
    # (5 convert), 3 users with 0 clicks (0 convert)
    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, u, "click", eid % 59)); eid += 1
        if u < 2:
            rows.append((eid, u, "purchase", eid % 59)); eid += 1
    for u in range(100, 105):
        for _ in range(20):
            rows.append((eid, u, "click", eid % 59)); eid += 1
        rows.append((eid, u, "purchase", eid % 59)); eid += 1
    for u in range(200, 203):
        rows.append((eid, u, "view", eid % 59)); eid += 1
    out = {
        r["min_clicks"]: r
        for r in behavior.conversion_dose_response(
            {"events": _events(spark, rows)}
        ).collect()
    }
    assert set(out) == {0, 1, 16}
    assert out[0]["n_users"] == 3 and out[0]["n_converted"] == 0
    assert out[1]["n_users"] == 10 and out[1]["n_converted"] == 2
    assert out[16]["n_users"] == 5 and out[16]["n_converted"] == 5
    assert out[1]["conv_bp"] == 2000
    assert out[16]["conv_bp"] == 10000
    # Wilson interval sanity: inside [0,1], contains the point rate
    for r in out.values():
        p = r["n_converted"] / r["n_users"]
        assert 0.0 <= r["wilson_lo_r6"] <= p <= r["wilson_hi_r6"] <= 1.0
    # hand-check the 1-click bucket's Wilson bounds
    z = behavior.WILSON_Z
    n, p = 10, 0.2
    center = (p + z * z / (2 * n)) / (1 + z * z / n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / (
        1 + z * z / n
    )
    assert abs(out[1]["wilson_lo_r6"] - (center - half)) < 1e-6
    assert abs(out[1]["wilson_hi_r6"] - (center + half)) < 1e-6
