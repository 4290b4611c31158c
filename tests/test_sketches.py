"""HLL sketch aggregates: error bounds vs exact, and merge consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.operators import sketches


def test_approx_user_stats_error_bound(tables):
    approx = {
        r["event_type"]: r
        for r in sketches.approx_user_stats(tables).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        # lgK=12 -> ~1.6% RSE; allow 5 sigma-ish headroom on small groups
        assert abs(approx[et]["approx_users"] - ex) <= max(3, 0.08 * ex)
        assert abs(approx[et]["approx_users_hllpp"] - ex) <= max(3, 0.08 * ex)


def test_daily_sketch_union_consistency(tables):
    daily = sketches.daily_user_sketches(tables)
    est = sketches.union_user_estimate(daily).first()["approx_users_total"]
    exact = tables["events"].agg(F.countDistinct("user_id")).first()[0]
    assert abs(est - exact) <= max(3, 0.08 * exact)
    # unioning a subset never exceeds the full union's support
    some = sketches.union_user_estimate(daily.limit(2)).first()[
        "approx_users_total"
    ]
    assert some <= est + max(3, 0.05 * est)
