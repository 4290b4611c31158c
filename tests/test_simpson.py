"""Planted tests for the Simpson's-paradox flip audit."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import validation


def _tables(spark, series):
    # series: {nation_name: [(day_str, price)]}
    nations, customers, orders = [], [], []
    for i, name in enumerate(sorted(series)):
        nations.append((i, name))
        customers.append((100 + i, i))
    k = 0
    for i, name in enumerate(sorted(series)):
        for day, price in series[name]:
            orders.append((k, 100 + i, float(price), day))
            k += 1
    return {
        "nation": spark.createDataFrame(
            nations, "n_nationkey long, n_name string"
        ),
        "customer": spark.createDataFrame(
            customers, "c_custkey long, c_nationkey long"
        ),
        "orders": spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderdate string",
        ),
    }


def test_simpson_flip_detected(spark):
    # ALPHA rises hard, BRAVO falls gently -> global rises, BRAVO flips
    t = _tables(
        spark,
        {
            "ALPHA": [("1995-01-01", 100), ("1995-01-02", 200),
                      ("1995-01-03", 300)],
            "BRAVO": [("1995-01-01", 50), ("1995-01-02", 45),
                      ("1995-01-03", 40)],
        },
    )
    out = validation.simpson_flip_audit(t).collect()[0]
    assert out["n_nations"] == 2
    assert out["global_trend_sign"] == 1
    assert out["n_up"] == 1 and out["n_down"] == 1
    assert out["n_flipped"] == 1
    assert out["simpson_flag"] == 1


def test_simpson_no_flip_when_aligned(spark):
    t = _tables(
        spark,
        {
            "ALPHA": [("1995-01-01", 100), ("1995-01-02", 200)],
            "BRAVO": [("1995-01-01", 10), ("1995-01-02", 20)],
        },
    )
    out = validation.simpson_flip_audit(t).collect()[0]
    assert out["n_flipped"] == 0
    assert out["simpson_flag"] == 0
    assert out["global_trend_sign"] == 1


def test_simpson_flat_group_not_a_flip(spark):
    t = _tables(
        spark,
        {
            "ALPHA": [("1995-01-01", 100), ("1995-01-02", 200)],
            "BRAVO": [("1995-01-01", 10), ("1995-01-02", 10)],
        },
    )
    out = validation.simpson_flip_audit(t).collect()[0]
    assert out["n_flat"] == 1
    assert out["n_flipped"] == 0


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------


def _value_events(spark, values):
    return {
        "events": spark.createDataFrame(
            [(i, "e", "2024-01-01 00:00:00", float(v), "{}")
             for i, v in enumerate(values)],
            "event_id long, event_type string, ts string, value double, "
            "props string",
        )
    }


def test_hill_recovers_pareto_alpha(spark):
    # x_i = 1000 * i^(-1/2) is an exact alpha=2 power tail; the Hill
    # mean at k is (1/a)*(ln(k+1) - ln(k!)/k) -> alpha_hat ~ 1.02*a
    # at k=100
    from training_etl_demo_2_spark.operators import validation as v

    values = [1000.0 * (i ** -0.5) for i in range(1, 1101)]
    out = {r["k"]: r for r in v.hill_tail_index(
        _value_events(spark, values)
    ).collect()}
    assert set(out) == {100, 500, 1000}
    for k in (100, 500, 1000):
        assert abs(out[k]["hill_alpha_r6"] - 2.0) / 2.0 < 0.05
    # thresholds descend with k
    assert out[100]["threshold_value_r4"] > out[1000]["threshold_value_r4"]


def test_hill_short_series_drops_high_k(spark):
    from training_etl_demo_2_spark.operators import validation as v

    values = [100.0 * (i ** -0.5) for i in range(1, 301)]
    out = v.hill_tail_index(_value_events(spark, values)).collect()
    assert [r["k"] for r in out] == [100]


def test_hill_light_tail_large_alpha(spark):
    # near-constant values -> tiny log excess -> huge alpha estimate
    from training_etl_demo_2_spark.operators import validation as v

    values = [50.0 + 0.001 * (i % 7) for i in range(1200)]
    out = {r["k"]: r for r in v.hill_tail_index(
        _value_events(spark, values)
    ).collect()}
    assert out[100]["hill_alpha_r6"] is None or out[100]["hill_alpha_r6"] > 50
