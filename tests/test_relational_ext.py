"""Tests for relational_ext: correlated predicates, pivot/cube,
percentiles, moving frames — semantics + plan-shape checks on sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import relational_ext as rx


def test_q4_semi_join_counts_bounded(tables):
    rows = rx.q4_order_priority(tables).collect()
    total_orders = tables["orders"].count()
    assert 0 < sum(r.n_orders for r in rows) <= total_orders
    # semi join must not duplicate orders
    plan = rx.q4_order_priority(tables)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_idle_customers_anti_semantics(tables):
    res = rx.idle_customers(tables)
    rows = res.collect()
    # every counted customer must have above-avg balance; spot-check via recompute
    thr = (
        tables["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    recent_cust = {
        r.o_custkey
        for r in tables["orders"]
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    eligible = tables["customer"].filter(F.col("c_acctbal") > thr).collect()
    expected = sum(1 for c in eligible if c.c_custkey not in recent_cust)
    assert sum(r.n_customers for r in rows) == expected


def test_q17_scalar_shape(tables):
    rows = rx.q17_small_quantity_revenue(tables).collect()
    assert len(rows) == 1


def test_q14_share_bounds(tables):
    r = rx.q14_promo_revenue(tables).collect()[0]
    if r.n_rows > 0:
        assert 0.0 <= r.promo_share_pct <= 100.0


def test_q18_having_threshold(tables):
    rows = rx.q18_large_orders(tables, min_qty=150.0).collect()
    assert all(r.sum_qty > 150.0 for r in rows)
    assert len(rows) <= 20
    prices = [r.totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_pivot_row_conservation(tables):
    rows = rx.status_by_segment_pivot(tables).collect()
    assert sum(r.n_f + r.n_o + r.n_p for r in rows) == tables["orders"].count()


def test_cube_grand_total(tables):
    rows = rx.orders_cube_by_year(tables).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.order_year is None]
    assert len(grand) == 1
    assert grand[0].n_orders == tables["orders"].count()


def test_percentiles_ordered(tables):
    for r in rx.event_value_percentiles(tables).collect():
        assert r.p25 <= r.p50 <= r.p75 <= r.max_value


def test_moving_avg_window(tables):
    rows = rx.daily_revenue_trend(tables).collect()
    assert len(rows) > 7
    # trailing avg of a 1-row frame equals the day's revenue
    assert abs(rows[0].mavg7 - rows[0].revenue) < 0.01
    # manual recompute of one mid-series point
    i = len(rows) // 2
    window = [r.revenue for r in rows[max(0, i - 6) : i + 1]]
    assert abs(rows[i].mavg7 - sum(window) / len(window)) < 0.02


def test_priority_mix_share(tables):
    for r in rx.priority_mix_by_year(tables).collect():
        assert 0.0 <= r.urgent_share <= 1.0
        assert r.n_urgent_high <= r.n_orders


def test_q7_no_domestic_trade(tables):
    rows = rx.q7_nation_volume(tables).collect()
    assert all(r.supp_nation != r.cust_nation for r in rows)
    assert all(r.ship_year in (1996, 1997) for r in rows)


def test_q10_topk_ordered(tables):
    rows = rx.q10_returned_items(tables).collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_suppliers_per_brand_bounds(tables):
    n_supp = tables["supplier"].count()
    for r in rx.suppliers_per_brand(tables).collect():
        assert 0 < r.n_suppliers <= n_supp


def test_top_part_per_brand_is_max(tables):
    from pyspark.sql import functions as F

    got = {r.p_brand: r.retailprice for r in rx.top_part_per_brand(tables).collect()}
    want = {
        r.p_brand: round(r.mx, 2)
        for r in tables["part"]
        .groupBy("p_brand")
        .agg(F.max("p_retailprice").alias("mx"))
        .collect()
    }
    assert got == want


def test_promo_heavy_threshold(tables):
    rows = rx.promo_heavy_suppliers(tables, min_qty=10.0).collect()
    assert all(r.promo_qty > 10.0 for r in rows)


def test_events_props_parsed(tables):
    rows = rx.events_props_stats(tables).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.max_k >= r.avg_k >= 0
        assert r.sum_k <= r.max_k * r.n


def test_priorities_per_status_sorted_sets(tables):
    for r in rx.priorities_per_status(tables).collect():
        parts = r.priorities.split(",")
        assert parts == sorted(set(parts))
        assert len(parts) >= 1


def test_q19_disjunction(tables):
    rows = rx.q19_disjunctive_revenue(tables).collect()
    assert len(rows) == 1


def test_session_window_equals_lag_based(tables):
    from training_etl_demo_2_spark.operators.relational import sessionize_events

    lag = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in sessionize_events(tables).collect()
    }
    sw = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in rx.sessionize_events_window(tables).collect()
    }
    assert lag == sw


def test_q8_shares_sum_to_one(tables):
    from collections import defaultdict

    by_year = defaultdict(float)
    for r in rx.q8_market_share(tables).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        by_year[r.order_year] += r.mkt_share
    for year, total in by_year.items():
        assert abs(total - 1.0) < 1e-4, (year, total)


def test_q11_share_threshold(tables):
    rows = rx.q11_important_parts(tables, fraction=0.0005).collect()
    assert all(r.value_share > 0.0005 for r in rows)


def test_q15_top_is_max(tables):
    rows = rx.q15_top_suppliers(tables).collect()
    assert len(rows) >= 1
    revs = {r.revenue for r in rows}
    assert len(revs) == 1  # ties all share the max revenue


def test_nation_participation_full_outer(tables):
    rows = rx.nation_participation(tables).collect()
    assert sum(r.n_customers for r in rows) == tables["customer"].count()
    assert sum(r.n_suppliers for r in rows) == tables["supplier"].count()
    assert all(r.nationkey is not None for r in rows)


def test_q13_covers_all_customers(tables):
    rows = rx.q13_customer_distribution(tables).collect()
    assert sum(r.n_customers for r in rows) == tables["customer"].count()


def test_events_hourly_gapfilled_zero_fills(spark):
    """A type with a 3-hour hole gets explicit zero rows for the
    missing hours; the dense grid spans exactly [min, max] per type."""
    import datetime as dt

    from training_etl_demo_2_spark.operators.relational_ext import (
        events_hourly_gapfilled,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=4), 1, "click", 2.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = events_hourly_gapfilled({"events": df}).collect()
    clicks = sorted(
        (r.hour, r.n_events) for r in out if r.event_type == "click"
    )
    assert len(clicks) == 5  # 00:00 .. 04:00 dense
    assert [n for _, n in clicks] == [1, 0, 0, 0, 1]
    views = [r for r in out if r.event_type == "view"]
    assert len(views) == 1  # single-hour range: no padding beyond it


def test_revenue_trailing_7d_window_math(spark):
    """RANGE frame sums calendar days, not rows: a gap day must still
    fall out of the frame after 7 calendar days."""
    import datetime as dt

    from training_etl_demo_2_spark.operators.relational_ext import (
        revenue_trailing_7d,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1), 100.0),
        (2, dt.datetime(2024, 1, 2), 10.0),
        (3, dt.datetime(2024, 1, 9), 1.0),  # day 1 is now out of range
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    out = {r.day: r.revenue_7d for r in revenue_trailing_7d({"orders": df}).collect()}
    assert out["2024-01-01"] == 100.0
    assert out["2024-01-02"] == 110.0
    # Jan 9 frame covers Jan 3..9 -> only its own 1.0 (Jan 2 excluded)
    assert out["2024-01-09"] == 1.0


def test_events_hourly_forecast_mean_of_days(spark):
    import datetime as dt

    from training_etl_demo_2_spark.operators.relational_ext import (
        events_hourly_forecast,
    )

    rows = []
    eid = 0
    # type 'a', hour 10: 2 events day1, 4 events day2 -> forecast 3.0
    for day, n in ((1, 2), (2, 4)):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 10, 5), 1, "a", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = events_hourly_forecast({"events": df}).collect()
    assert len(out) == 1
    assert out[0].hour == 10 and out[0].forecast == 3.0


def test_ols_trend_recovers_planted_slope(spark):
    """A planted exact line y = 2.5*x + 10 (in value units) recovers
    slope 25000 t4/hour and intercept 100000 t4 exactly."""
    import datetime

    from training_etl_demo_2_spark.operators.relational_ext import (
        _OLS_EPOCH_S,
        events_value_trend_ols,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(48):
        rows.append(
            (h, base + datetime.timedelta(hours=h), 1, "m",
             2.5 * h + 10.0, "{}")
        )
    # a constant-x group: slope must be NULL (zero denominator guard)
    rows.append((100, base, 1, "const", 5.0, "{}"))
    rows.append((101, base, 2, "const", 7.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.event_type: r for r in events_value_trend_ols({"events": df}).collect()}
    assert out["m"].n == 48
    assert out["m"].slope_t4_per_hour == 25000.0
    assert out["m"].intercept_t4 == 100000.0
    assert out["const"].slope_t4_per_hour is None
    assert out["const"].intercept_t4 is None


def test_part_affinity_lift_and_prune(spark):
    """Planted baskets: the always-together pair has lift > 1 and tops
    the list; items below min support never appear."""
    from training_etl_demo_2_spark.operators.relational_ext import part_affinity

    rows = []
    # parts 1,2 co-occur in 4 baskets; part 3 rides in 2 of them;
    # part 99 appears once (below min_support=3)
    for okey in range(4):
        rows += [(okey, 1), (okey, 2)]
    rows += [(0, 3), (1, 3), (2, 99)]
    li = spark.createDataFrame(
        [(o, p, 1) for o, p in rows],
        "l_orderkey long, l_partkey long, l_linenumber int",
    )
    out = part_affinity({"lineitem": li}, min_support=3, k=10).collect()
    got = {(r.pa, r.pb): r for r in out}
    assert set(got) == {(1, 2)}          # 99 pruned; (1,3)/(2,3) c=2 < 3
    r = got[(1, 2)]
    assert r.c == 4
    assert r.lift == 1.0                  # 4*4/(4*4): perfectly coupled


def test_part_affinity_degenerate_basket_capped(spark):
    """A basket over AFFINITY_MAX_BASKET is excluded entirely — from
    pairing, support, and the order count — so its items can't flood
    the pair expansion or skew the lift denominator; normal baskets
    are untouched."""
    from training_etl_demo_2_spark.operators.relational_ext import part_affinity

    rows = []
    for okey in range(4):  # the same planted (1, 2) pair
        rows += [(okey, 1), (okey, 2)]
    # one degenerate basket holding 50 distinct parts (cap set to 10)
    rows += [(7, p) for p in range(100, 150)]
    li = spark.createDataFrame(
        [(o, p, 1) for o, p in rows],
        "l_orderkey long, l_partkey long, l_linenumber int",
    )
    out = part_affinity(
        {"lineitem": li}, min_support=3, k=10, max_basket=10, log_drops=True
    ).collect()
    got = {(r.pa, r.pb): r for r in out}
    assert set(got) == {(1, 2)}  # no pair from the degenerate basket
    r = got[(1, 2)]
    assert r.c == 4
    # n_orders counts only surviving baskets (4), so lift is exactly 1.0
    assert r.lift == 1.0
