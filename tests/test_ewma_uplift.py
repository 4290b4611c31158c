"""Planted tests for the EWMA hourly smoother and the A/B uplift
bootstrap CI."""

from __future__ import annotations

from training_etl_demo_2_spark.operators import behavior, temporal


def _events(spark, rows):
    # rows: (user_id, event_type, ts)
    return {
        "events": spark.createDataFrame(
            [(u, et, ts, 1.0, "s", "{}") for u, et, ts in rows],
            "user_id long, event_type string, ts string, value double, "
            "session_id string, props string",
        )
    }


def test_ewma_constant_series_is_identity(spark):
    # constant hourly counts -> EWMA == the constant at every hour
    rows = []
    for h in range(30):
        for i in range(5):
            rows.append((i, "view", f"2024-01-01 {h % 24:02d}:00:00"))
    # 30 buckets wrap the day; use distinct days to keep 30 hours
    rows = []
    for h in range(30):
        day = 1 + h // 24
        for i in range(5):
            rows.append((i, "view", f"2024-01-{day:02d} {h % 24:02d}:00:00"))
    out = temporal.ewma_hourly_smooth(_events(spark, rows)).collect()
    assert len(out) == 30
    assert all(abs(r["ewma_r6"] - 5.0) < 1e-9 for r in out)


def test_ewma_hand_computed_prefix(spark):
    # counts 10, 20, 40 -> hand-compute the truncated-kernel values
    rows = []
    counts = [10, 20, 40]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((i, "click", f"2024-01-01 {h:02d}:00:00"))
    out = {
        r["hour"]: r["ewma_r6"]
        for r in temporal.ewma_hourly_smooth(_events(spark, rows)).collect()
    }
    w = temporal.EWMA_W
    assert abs(out["2024-01-01 00:00:00"] - 10.0) < 1e-9
    e1 = (20 * w[0] + 10 * w[1]) / (w[0] + w[1])
    assert abs(out["2024-01-01 01:00:00"] - round(e1, 6)) < 1e-9
    e2 = (40 * w[0] + 20 * w[1] + 10 * w[2]) / (w[0] + w[1] + w[2])
    assert abs(out["2024-01-01 02:00:00"] - round(e2, 6)) < 1e-9


def test_uplift_ci_null_on_aa_and_detects_effect(spark):
    from training_etl_demo_2_spark.operators.sketches import HLL_P1, HLL_P2

    def mix(x, seed):
        a1, a2, a3, b = seed
        x1 = (x % HLL_P1) * a1 % HLL_P1
        x1 ^= x1 >> 7
        x2 = (x1 % HLL_P2) * a2 % HLL_P2
        x2 ^= x2 >> 11
        return (x2 * a3 + b) % HLL_P1

    ts = "2024-01-01 00:00:00"
    # exact null: EVERY user converts -> every resample's uplift is
    # identically 0 -> CI == [0, 0], never significant. (A sampled
    # "A/A" rule like u % 4 == 0 carries a FIXED hash-vs-rule
    # correlation — this fixture's seed gives a genuine 2.2-sigma
    # imbalance that both the z-test and the bootstrap rightly flag.)
    rows = []
    for u in range(3000):
        rows.append((u, "view", ts))
        rows.append((u, "purchase", ts))
    aa = behavior.ab_uplift_bootstrap_ci(_events(spark, rows)).collect()[0]
    assert aa["significant"] == 0
    assert aa["ci_lo_r6"] == 0.0 == aa["ci_hi_r6"]
    assert aa["uplift_r6"] == 0.0
    assert aa["n_boot"] == behavior.AB_BOOT_B
    # planted uplift: A converts at ~50%, B at ~10%
    rows = []
    for u in range(3000):
        rows.append((u, "view", ts))
        in_a = mix(u, behavior.AB_SEED) % 2 == 0
        if (in_a and u % 2 == 0) or (not in_a and u % 10 == 0):
            rows.append((u, "purchase", ts))
    eff = behavior.ab_uplift_bootstrap_ci(_events(spark, rows)).collect()[0]
    assert eff["significant"] == 1
    assert eff["ci_lo_r6"] > 0.2  # true uplift ~0.4
    assert eff["ci_lo_r6"] <= eff["uplift_r6"] <= eff["ci_hi_r6"]
