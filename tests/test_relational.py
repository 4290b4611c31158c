"""Relational operator tests on sf0.001 + plan-shape assertions
(broadcast joins actually broadcast, filters actually push down)."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import relational


def test_q1_groups(tables):
    rows = relational.q1_pricing_summary(tables).collect()
    assert 1 <= len(rows) <= 6
    for r in rows:
        assert r.count_order > 0 and r.sum_qty > 0


def test_q6_scalar(tables):
    rows = relational.q6_forecast_revenue(tables).collect()
    assert len(rows) == 1


def test_q3_topk_deterministic(tables):
    a = [tuple(r) for r in relational.q3_shipping_priority(tables).collect()]
    b = [tuple(r) for r in relational.q3_shipping_priority(tables).collect()]
    assert a == b and len(a) <= 10


def test_q5_broadcast_in_plan(tables):
    df = relational.q5_region_revenue(tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_q6_filter_pushdown(tables):
    df = relational.q6_forecast_revenue(tables)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_window_topk(tables):
    rows = relational.top_orders_per_customer(tables, k=2).collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r.o_custkey, []).append(r.rnk)
    for ranks in per_cust.values():
        assert ranks == sorted(ranks) and len(ranks) <= 2


def test_rollup_has_grand_total(tables):
    rows = relational.orders_rollup(tables).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert grand[0].n_orders == tables["orders"].count()


def test_sessionize_gap(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=10), 1, "view", 1.0, "{}"),
        (3, base + dt.timedelta(minutes=50), 1, "view", 1.0, "{}"),  # new session
        (4, base, 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = relational.sessionize_events({"events": df}).collect()
    sess = {(r.user_id, r.session_seq): r.n_events for r in out}
    assert sess == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_snapshot_diff_classifies_all_change_types(spark):
    from training_etl_demo_2_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "C", 30.0)],
        "k long, status string, price double",
    )
    new = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 25.0), (4, "D", 40.0)],
        "k long, status string, price double",
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert out == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged -> absent


def test_snapshot_diff_null_safe(spark):
    from training_etl_demo_2_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "k long, v string")
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k").collect()}
    assert out == {1: "changed", 2: "changed"}
