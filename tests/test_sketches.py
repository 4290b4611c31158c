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


def test_histogram_quantiles_within_one_bin_of_exact(spark, tables):
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators import sketches

    est = {
        (r.event_type, r.q): r.q_est
        for r in sketches.events_histogram_quantiles(tables).collect()
    }
    exact = {
        r.event_type: dict(zip((0.25, 0.5, 0.75, 0.95), r.qv))
        for r in tables["events"]
        .groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.25, 0.5, 0.75, 0.95], 10000
            ).alias("qv")
        )
        .collect()
    }
    assert est, "no estimates produced"
    for (etype, q), v in est.items():
        assert abs(v - exact[etype][q]) <= sketches.HIST_BIN_WIDTH, (
            etype, q, v, exact[etype][q]
        )


def test_histogram_blocks_merge_like_full_scan(spark, tables):
    """Quantiles from per-day blocks == quantiles from one global
    histogram: the mergeability contract."""
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators import sketches

    daily = sketches.daily_value_histograms(tables["events"])
    from_blocks = sketches.histogram_quantiles(daily)
    global_hist = (
        tables["events"]
        .groupBy(
            F.lit("all").alias("day"),
            "event_type",
            F.floor(F.col("value") / sketches.HIST_BIN_WIDTH)
            .cast("long")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from_global = sketches.histogram_quantiles(global_hist)
    a = sorted(tuple(r) for r in from_blocks.collect())
    b = sorted(tuple(r) for r in from_global.collect())
    assert a == b


def test_cms_estimate_upper_bounds_true_count(spark):
    """CMS guarantee: est >= true for every queried item; with planted
    collisions (vocab >> width would be needed to break exactness here,
    so instead check the bound survives a skewed stream)."""
    from training_etl_demo_2_spark.operators.sketches import cms_word_estimates

    rows = [(i, "alpha " * 50 + "beta " * 5 + f"rare{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.word: r for r in cms_word_estimates(df, k=10).collect()}
    assert "alpha" in out and out["alpha"].true_cnt == 40 * 50
    for r in out.values():
        assert r.cms_est >= r.true_cnt  # the one-sided CMS error bound


def test_cms_join_estimate_upper_bounds_truth(tables):
    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.operators.sketches import (
        cms_join_size_estimate,
    )

    row = cms_join_size_estimate(
        tables["orders"],
        tables["customer"].filter(F.col("c_acctbal") < 0),
        "o_custkey",
        "c_custkey",
    ).collect()[0]
    assert row.true_join_size > 0
    assert row.est_join_size >= row.true_join_size  # CMS bound
    # with W=1024 buckets vs a few hundred keys, inflation stays small
    assert row.est_join_size <= 3 * row.true_join_size
