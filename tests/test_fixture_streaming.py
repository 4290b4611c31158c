"""Gate-facing streaming queries: the incremental plan replayed with
availableNow must equal the batch aggregation over the same fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from training_etl_demo_2_spark.streaming import fixture_queries


def test_stream_hourly_equals_batch(spark, sf_dir, tables):
    got = fixture_queries.stream_hourly_stats(spark, sf_dir)
    batch = (
        tables["events"]
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("value_t4"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert got.count() > 0


def test_stream_user_nation_equals_batch(spark, sf_dir, tables):
    got = fixture_queries.stream_user_nation_stats(spark, sf_dir)
    dim = (
        tables["customer"]
        .join(
            tables["nation"], F.col("c_nationkey") == F.col("n_nationkey")
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    batch = (
        tables["events"]
        .join(dim, on="user_id")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("value_t4"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    assert got.count() > 0


def test_stream_exact_dedup_equals_batch(spark, sf_dir):
    """Replayed streaming fingerprint groups == batch exact dedup."""
    from training_etl_demo_2_spark.operators.dedup import exact_dedup_groups
    from training_etl_demo_2_spark.streaming.fixture_queries import (
        stream_exact_dedup_groups,
    )
    from training_etl_demo_2_spark.io import load_tables

    got = {
        (r.keep_id, r.n_copies)
        for r in stream_exact_dedup_groups(spark, sf_dir).collect()
    }
    want = {
        (r.keep_id, r.n_copies)
        for r in exact_dedup_groups(load_tables(spark, sf_dir)["documents"]).collect()
    }
    assert got == want and len(got) > 0


def test_stream_cusum_equals_batch_closed_form(spark, sf_dir, tables):
    from pyspark.sql import Window

    from training_etl_demo_2_spark.streaming.stateful import (
        CUSUM_H_T4,
        CUSUM_SLACK_T4,
        CUSUM_TARGET_T4,
    )

    got = fixture_queries.stream_cusum_alarm(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    y = (
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
        - F.lit(CUSUM_TARGET_T4)
        - F.lit(CUSUM_SLACK_T4)
    )
    cur = tables["events"].select(
        "event_id",
        "event_type",
        "ts",
        F.sum(y).over(w).cast("long").alias("p"),
    )
    scanned = cur.select(
        "event_id",
        "event_type",
        "p",
        F.min("p").over(w).cast("long").alias("mp"),
    )
    s = F.col("p") - F.least(F.col("mp"), F.lit(0).cast("long"))
    batch = scanned.filter(s > CUSUM_H_T4).select(
        "event_id", "event_type", s.alias("s_t4")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # the recursion never goes negative and alarms exceed the threshold
    assert all(r["s_t4"] > CUSUM_H_T4 for r in got.collect())


def test_cusum_state_survives_restart(spark, tmp_path):
    """State-recovery drill: deliver 10 hot events, stop, deliver 10
    more, restart on the SAME checkpoint. The CUSUM crosses its
    threshold only DURING THE SECOND RUN and only if the carried
    prefix-sum state survived the restart — a fresh state would leave
    run 2 at 4.0M < 5M and emit nothing."""
    import datetime
    import os

    from training_etl_demo_2_spark.streaming.stateful import (
        CUSUM_H_T4,
        cusum_alarm_stream,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def slab(i0, n):
        # value=100 -> y = +400_000/event; threshold 5M crosses at
        # event 13 overall
        return spark.createDataFrame(
            [
                (
                    i0 + i,
                    base + datetime.timedelta(minutes=i0 + i),
                    7,
                    "hot",
                    100.0,
                    "{}",
                )
                for i in range(n)
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    src = os.path.join(str(tmp_path), "src")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    slab(0, 10).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    got = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        out = cusum_alarm_stream(stream)

        def sink(batch_df, _bid):
            got.extend(map(tuple, batch_df.collect()))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run_once()
    assert got == []  # 10 events x 400k = 4.0M < 5M: silent
    slab(10, 10).coalesce(1).write.mode("append").parquet(src)
    run_once()
    # with carried state S crosses 5M at overall event 13 (id 12):
    # alarms for ids 12..19, strictly increasing S
    assert [r[0] for r in sorted(got)] == list(range(12, 20))
    assert all(r[1] == "hot" and r[2] > CUSUM_H_T4 for r in got)
    svals = [r[2] for r in sorted(got)]
    assert svals == sorted(svals)


def test_funnel_loss_outer_join_semantics(spark, sf_dir):
    """Left-outer stream-stream join: matched set equals the inner
    tier's, every emitted null row is genuinely unmatched in batch,
    and the withheld tail is exactly the clicks younger than the
    min-of-inputs final watermark."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from training_etl_demo_2_spark.io import load_tables
    from training_etl_demo_2_spark.streaming import fixture_queries

    out = fixture_queries.stream_click_funnel_loss(spark, sf_dir).collect()
    matched = {r.click_id for r in out if r.matched == 1}
    nulls = {r.click_id for r in out if r.matched == 0}
    assert matched.isdisjoint(nulls)

    ev = load_tables(spark, sf_dir)["events"]
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    j = c.join(
        p,
        F.expr("cu = pu AND pts > cts AND pts <= cts + INTERVAL 1 hour"),
        "left",
    ).collect()
    bmatched = {r.cid for r in j if r.pid is not None}
    assert matched == bmatched
    maxc = max(r.cts for r in j)
    maxp = ev.filter(F.col("event_type") == "purchase").agg(
        F.max("ts")
    ).collect()[0][0]
    wm = min(maxc, maxp) - timedelta(hours=2)
    expect_nulls = {
        r.cid
        for r in j
        if r.pid is None and r.cts + timedelta(hours=1) < wm
    }
    assert nulls == expect_nulls
    assert nulls  # the rule actually fires on the fixture
