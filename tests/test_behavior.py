"""Cohort retention and ordered-funnel semantics on constructed cases."""

from __future__ import annotations

import datetime as dt

from training_etl_demo_2_spark.operators import behavior

TS = dt.datetime.fromisoformat


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, TS(t), u, e, 1.0, "{}") for i, (u, e, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_stage_order(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, "view", "2024-01-01T10:00"),
            (1, "click", "2024-01-01T11:00"),
            (1, "purchase", "2024-01-01T12:00"),
            # user 2: click BEFORE first view, nothing after -> stops at view
            (2, "click", "2024-01-01T09:00"),
            (2, "view", "2024-01-01T10:00"),
            # user 3: view+purchase but no click -> stops at view
            (3, "view", "2024-01-01T10:00"),
            (3, "purchase", "2024-01-01T11:00"),
        ],
    )
    out = {r.stage: r.n_users for r in behavior.event_funnel(ev).collect()}
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_counts_reuse_of_later_event(spark):
    # click precedes view, but a SECOND click after the view rescues stage 2
    ev = _events(
        spark,
        [
            (1, "click", "2024-01-01T09:00"),
            (1, "view", "2024-01-01T10:00"),
            (1, "click", "2024-01-01T11:00"),
        ],
    )
    out = {r.stage: r.n_users for r in behavior.event_funnel(ev).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_cohort_retention_offsets(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01T10:00"),
            (1, "view", "2024-01-03T10:00"),   # offset 2
            (2, "view", "2024-01-01T12:00"),   # same cohort day
            (3, "view", "2024-01-02T12:00"),   # its own cohort
            (1, "view", "2024-03-01T10:00"),   # beyond horizon: dropped
        ],
    )
    out = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in behavior.cohort_retention(ev, horizon_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }
