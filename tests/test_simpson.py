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
