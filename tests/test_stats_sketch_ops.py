"""Planted tests for the explicit-register HLL, the deterministic
Poisson bootstrap CI, and the CUSUM changepoint scan."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import sketches, temporal, validation


def _events(spark, rows):
    # rows: (user_id, event_type)
    return {
        "events": spark.createDataFrame(
            [(u, et, "2024-01-01 00:00:00", 1.0, "s", "{}") for u, et in rows],
            "user_id long, event_type string, ts string, value double, "
            "session_id string, props string",
        )
    }


def _orders(spark, prices, start_day=0):
    import datetime

    base = datetime.date(1995, 1, 1)
    return {
        "orders": spark.createDataFrame(
            [
                (
                    i,
                    1,
                    "O",
                    float(p),
                    str(base + datetime.timedelta(days=(start_day + i) if isinstance(start_day, int) else 0)),
                    "1-URGENT",
                )
                for i, p in enumerate(prices)
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
        )
    }


# ---------------------------------------------------------------------------
# hll_user_estimate
# ---------------------------------------------------------------------------


def test_hll_estimate_accuracy_and_registers(spark):
    # 5000 distinct users in one type; RSE for m=1024 is ~3.2%, so 5
    # sigma is a safe determinstic bound for ONE fixed hash seed.
    rows = [(u, "click") for u in range(5000)]
    out = sketches.hll_user_estimate(_events(spark, rows)).collect()[0]
    assert out["exact_users"] == 5000
    assert abs(out["est_r6"] - 5000) / 5000 < 0.16
    assert 0 <= out["v_empty"] < sketches.HLL_M
    # register sum identity: every register contributes at least 2^1
    top = sketches.HLL_RHO_BITS + 1
    assert out["s_int"] <= sketches.HLL_M * (1 << top)


def test_hll_repeated_rows_do_not_change_registers(spark):
    # HLL is insensitive to duplication: 3x-duplicated stream gives the
    # IDENTICAL register state and estimate.
    users = list(range(700))
    once = sketches.hll_user_estimate(
        _events(spark, [(u, "view") for u in users])
    ).collect()[0]
    thrice = sketches.hll_user_estimate(
        _events(spark, [(u, "view") for u in users * 3])
    ).collect()[0]
    assert once["s_int"] == thrice["s_int"]
    assert once["est_r6"] == thrice["est_r6"]


def test_hll_small_range_correction_branch(spark):
    # 30 users in 1024 registers -> many empties -> linear-counting
    # branch; estimate must be very close for tiny cardinalities.
    import math

    out = sketches.hll_user_estimate(
        _events(spark, [(u, "err") for u in range(30)])
    ).collect()[0]
    v = out["v_empty"]
    assert v > 900
    expected = sketches.HLL_M * math.log(sketches.HLL_M / v)
    assert abs(out["est_r6"] - round(expected, 6)) < 1e-6
    assert abs(out["est_r6"] - 30) < 5


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    prices = [100.0 + (i % 50) for i in range(2000)]
    t = _orders(spark, prices)
    a = validation.bootstrap_mean_ci(t).collect()[0]
    b = validation.bootstrap_mean_ci(t).collect()[0]
    assert a == b  # no RNG state anywhere
    assert a["n_boot"] == validation.BOOT_B
    assert a["ci_lo_r6"] <= a["mean_r6"] <= a["ci_hi_r6"]
    # CI half-width should be in the right ballpark: sd/sqrt(n) of the
    # planted uniform(0..49) offset is ~14.4/44.7 ~ 0.32 -> 95% ~ 1.27
    assert 0.3 < a["ci_width_r6"] < 3.0


def test_bootstrap_ci_narrows_with_n(spark):
    small = validation.bootstrap_mean_ci(
        _orders(spark, [100.0 + (i % 50) for i in range(200)])
    ).collect()[0]
    large = validation.bootstrap_mean_ci(
        _orders(spark, [100.0 + (i % 50) for i in range(3200)])
    ).collect()[0]
    # 16x the data -> ~4x narrower; allow slack for bootstrap noise
    assert large["ci_width_r6"] < small["ci_width_r6"] / 2


# ---------------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------------


def test_cusum_finds_planted_shift(spark):
    import datetime

    base = datetime.date(1995, 1, 1)
    rows = []
    for d in range(100):
        price = 100.0 if d < 60 else 900.0
        rows.append(
            (
                d,
                1,
                "O",
                price,
                str(base + datetime.timedelta(days=d)),
                "1-URGENT",
            )
        )
    t = {
        "orders": spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
        )
    }
    out = temporal.cusum_changepoint(t).collect()[0]
    # |S_t| peaks on the LAST day of the first regime
    assert out["cp_day"] == str(base + datetime.timedelta(days=59))
    assert out["shift_detected"] == 1
    assert out["n_days"] == 100


def test_cusum_constant_series_no_shift(spark):
    t = _orders(spark, [250.0] * 80)
    out = temporal.cusum_changepoint(t).collect()[0]
    assert out["cusum_stat_r6"] == 0.0 and out["shift_detected"] == 0
